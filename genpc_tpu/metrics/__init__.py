from genpc_tpu.metrics.losses import (  # noqa: F401
    CompletionLoss, chamfer_l1, chamfer_l2, chamfer_partial_l1,
    chamfer_partial_l2, emd_loss, apml_loss,
)
