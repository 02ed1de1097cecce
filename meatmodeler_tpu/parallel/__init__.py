from meatmodeler_tpu.parallel.sharded import (  # noqa: F401
    make_mesh,
    match_descriptors_tp,
    preprocess_sharded,
    solve_ba_batch,
)
