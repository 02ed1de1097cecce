from meatmodeler_tpu.geometry import so3, projection  # noqa: F401
