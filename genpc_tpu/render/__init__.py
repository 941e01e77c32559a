from genpc_tpu.render.splat import paint_pixels, raw_depth_images  # noqa: F401
from genpc_tpu.render.inpaint import diffusion_inpaint, inpaint_image  # noqa: F401
from genpc_tpu.render.point_renderer import render_points, RenderCamera  # noqa: F401
