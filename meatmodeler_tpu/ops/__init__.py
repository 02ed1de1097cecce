from meatmodeler_tpu.ops import clahe, color  # noqa: F401
