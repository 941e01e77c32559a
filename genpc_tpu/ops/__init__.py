from genpc_tpu.ops.chamfer import chamfer_nn, chamfer_distances  # noqa: F401
from genpc_tpu.ops.fps import farthest_point_sample, fps_indices  # noqa: F401
from genpc_tpu.ops.emd import emd_auction  # noqa: F401
from genpc_tpu.ops.knn import knn, ball_query  # noqa: F401
from genpc_tpu.ops.voxel import voxel_down_sample  # noqa: F401
from genpc_tpu.ops.outliers import remove_statistical_outliers  # noqa: F401
from genpc_tpu.ops.hpr import hidden_point_removal, visible_points_zbuffer  # noqa: F401
