from genpc_tpu.models.backends import (  # noqa: F401
    get_depth2image, get_image23d, get_rembg,
)
