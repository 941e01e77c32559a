from genpc_tpu.io.ply import load_ply, save_ply, load_xyz  # noqa: F401
from genpc_tpu.io.glb import load_glb, save_glb, glb_to_points, Mesh  # noqa: F401
