from genpc_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, sharded_chamfer_l1, batched_pose_step,
)
