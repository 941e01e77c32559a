from genpc_tpu.registration.icp import (  # noqa: F401
    icp, kabsch, icp_with_scaling, coarse_scale_sweep, iterative_scale_search,
)
from genpc_tpu.registration.fusion import remove_close_points, fuse_clouds  # noqa: F401
from genpc_tpu.registration.pose_optim import object_pose_optimization  # noqa: F401
