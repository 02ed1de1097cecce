from meatmodeler_tpu.io.ply import read_ply, write_ply  # noqa: F401
from meatmodeler_tpu.io.video import FrameSource  # noqa: F401
