from meatmodeler_tpu.utils.profiling import Metrics, logger, trace  # noqa: F401
