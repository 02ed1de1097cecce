"""meatmodeler_tpu — a TPU-native (JAX/XLA/Pallas) Structure-from-Motion and
volume-estimation framework with the capabilities of skyepurchase/MeatModeler.

Public API mirrors the reference's entry points:
  * ``process(video, path, ...)`` — end-to-end video -> point cloud + volume
    (``processor.py:294``), fixing the reference's broken promise of a return
    value (``processor.py:303``: docstring promises a cloud, returns None).
  * ``adjust_points(...)`` / ``adjust_pose(...)`` — the bundle-adjuster entry
    points (``bundleAdjuster.py:160, 214``).
  * ``Track`` — compatibility view over the SoA track store (``track.py:1``).
"""

__version__ = "0.1.0"

from meatmodeler_tpu.config import (  # noqa: F401
    DEFAULT_CONFIG,
    PipelineConfig,
)
