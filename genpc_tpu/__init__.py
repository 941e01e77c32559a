"""genpc_tpu — a TPU-native zero-shot point-cloud completion framework.

A from-scratch JAX/XLA/Pallas rebuild of the GenPC pipeline (CVPR 2025,
"Zero-shot Point Cloud Completion via 3D Generative Priors"):

    partial cloud -> depth prompting (viewpoint select + depth render +
    inpaint) -> depth-conditioned image generation -> image-to-3D ->
    differentiable pose/scale registration -> fusion -> CD/EMD eval.

Design stance (vs. the CUDA/torch reference at liannuaa/GenPC):
  * Functional core: every numeric path is jit-compiled XLA; Pallas kernels
    for the hot pairwise-distance ops (Chamfer NN, EMD auction bid phase).
  * Stages exchange typed in-memory artifacts (device-resident), with
    optional persistence to a workspace dir for per-stage resume parity
    with the reference's file handoff.
  * Object-level data parallelism over a jax.sharding.Mesh; large-N
    pairwise ops shard the point dimension ("sp") with shard_map.
  * Host code only for file IO and orchestration; a C++ native extension
    accelerates host-side preprocessing (PLY parse, bucket FPS).
"""

__version__ = "0.1.0"

from genpc_tpu import runtime as _runtime  # noqa: F401  (compilation cache)
from genpc_tpu.config import Config, load_config  # noqa: F401
