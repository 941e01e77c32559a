from genpc_tpu.geometry.cameras import (  # noqa: F401
    Camera, create_cameras, fibonacci_sphere, look_at_rotation,
    calculate_up_vector, transform_points, rescale_uvs, orbit_camera,
    OrbitCamera,
)
from genpc_tpu.geometry.transforms import (  # noqa: F401
    rotation_6d_to_matrix, matrix_to_rotation_6d, axis_angle_to_matrix,
    get_rotate_matrix, build_transform, invert_se3, apply_transform,
)
from genpc_tpu.geometry.normalize import normalize_points  # noqa: F401
