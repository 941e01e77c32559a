from genpc_tpu.pipeline.artifacts import ObjectArtifacts, Workspace  # noqa: F401
from genpc_tpu.pipeline.depth_prompting import DepthPrompting  # noqa: F401
from genpc_tpu.pipeline.scale_adapter import ScaleAdapter  # noqa: F401
from genpc_tpu.pipeline.registration import reg  # noqa: F401
