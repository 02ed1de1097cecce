from meatmodeler_tpu.solvers.bundle_adjust import (  # noqa: F401
    BAProblem,
    BAResult,
    adjust_points,
    adjust_pose,
    pose_only_refine,
    solve_ba,
)
