import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genpc_tpu.render.splat import paint_pixels, raw_depth_images, uvs_to_pixels
from genpc_tpu.render.inpaint import diffusion_inpaint, inpaint_image
from genpc_tpu.render.point_renderer import (
    RenderCamera, render_points, soft_mask, hard_mask)


def test_paint_pixels_basic_and_flip():
    img = jnp.zeros((3, 8, 8))
    coords = jnp.array([[1, 2]])
    cols = jnp.array([[1.0, 0.5, 0.25]])
    out = np.asarray(paint_pixels(img, coords, cols, point_size=1))
    # written at (1,2) then flipped vertically -> row 8-1-1 = 6
    np.testing.assert_allclose(out[:, 6, 2], [1.0, 0.5, 0.25])
    assert out.sum() == out[:, 6, 2].sum()


def test_paint_pixels_brush():
    img = jnp.zeros((3, 16, 16))
    out = np.asarray(paint_pixels(img, jnp.array([[8, 8]]),
                                  jnp.array([[1.0, 1.0, 1.0]]), point_size=2))
    # 3x3 brush -> 9 pixels painted per channel
    assert (out[0] > 0).sum() == 9


def test_paint_pixels_oob_dropped():
    img = jnp.zeros((3, 8, 8))
    out = np.asarray(paint_pixels(img, jnp.array([[0, 0]]),
                                  jnp.array([[1.0, 1, 1]]), point_size=3))
    assert np.isfinite(out).all()
    assert (out[0] > 0).sum() == 9  # only the in-bounds quarter of 5x5


def test_raw_depth_encoding():
    # nearest point must be brightest: 0.1 + 0.8*(1-d̂)
    pix = jnp.array([[2, 2], [10, 10]])
    depth = jnp.array([1.0, 2.0])
    cols = jnp.ones((2, 3)) * 0.5
    img, raw, m1, m2 = raw_depth_images(pix, depth, cols, res=16,
                                        point_size=1, mask_pixel_rate=3)
    raw = np.asarray(raw)
    near = raw[0, 16 - 1 - 2, 2]
    far = raw[0, 16 - 1 - 10, 10]
    np.testing.assert_allclose(near, 0.9, atol=1e-6)
    np.testing.assert_allclose(far, 0.1, atol=1e-6)
    # hole mask 1 = dilated ring minus splat: nonzero, excludes the points
    m1 = np.asarray(m1)
    assert m1.max() == 1.0
    assert m1[0, 16 - 1 - 2, 2] == 0.0


def test_uvs_to_pixels_swap_clip():
    uv = jnp.array([[0.1, 0.9], [1.5, -0.2]])
    pix = np.asarray(uvs_to_pixels(uv, 100))
    np.testing.assert_array_equal(pix[0], [90, 10])  # (row=v*res, col=u*res)
    np.testing.assert_array_equal(pix[1], [0, 99])   # clipped


def test_diffusion_inpaint_fills_hole():
    img = jnp.ones((3, 32, 32)) * 0.8
    hole = jnp.zeros((32, 32)).at[10:20, 10:20].set(1.0)
    img = img.at[:, 10:20, 10:20].set(0.0)
    out = np.asarray(diffusion_inpaint(img, hole, iters=300))
    # hole relaxes to the surrounding value
    assert abs(out[:, 15, 15].mean() - 0.8) < 0.02
    # known pixels untouched
    np.testing.assert_allclose(out[:, 0, 0], 0.8, atol=1e-6)


def test_inpaint_cv2_backend_parity():
    img = jnp.ones((3, 32, 32)) * 0.5
    hole = jnp.zeros((32, 32)).at[12:18, 12:18].set(1.0)
    img = img.at[:, 12:18, 12:18].set(0.0)
    out_jax = np.asarray(inpaint_image(img, hole, backend="jax"))
    out_cv2 = np.asarray(inpaint_image(img, hole, backend="cv2"))
    assert abs(out_jax[:, 15, 15].mean() - out_cv2[:, 15, 15].mean()) < 0.1


def test_render_points_visibility_and_center():
    cam = RenderCamera.default(64)
    pts = jnp.array([[0.0, 0.0, 0.0]])
    cols = jnp.array([[1.0, 0.0, 0.0]])
    img = np.asarray(render_points(pts, cols, 0.05, cam))
    # center pixel is red-ish, corners are background
    c = img[32, 32]
    assert c[0] > 0.5 and c[1] < 0.1
    assert img[0, 0].max() < 1e-3


def test_render_points_occlusion():
    cam = RenderCamera.default(64)
    # red point nearer (z=1), green point behind it (z=-1), same x,y
    pts = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
    cols = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    img = np.asarray(render_points(pts, cols, 0.05, cam))
    c = img[32, 32]
    assert c[0] > 10 * c[1]  # near point dominates (gamma=1e-2)


def test_render_points_y_up():
    cam = RenderCamera.default(64)
    pts = jnp.array([[0.0, 0.5, 0.0]])
    img = np.asarray(render_points(pts, jnp.ones((1, 3)), 0.05, cam))
    ys, xs = np.nonzero(img.sum(-1) > 0.1)
    assert ys.mean() < 32  # +y renders in the upper half


def test_render_points_differentiable():
    cam = RenderCamera.default(32)
    target = render_points(jnp.array([[0.2, 0.0, 0.0]]),
                           jnp.ones((1, 3)), 0.08, cam)

    def loss(offset):
        img = render_points(jnp.array([[0.0, 0.0, 0.0]]) + offset,
                            jnp.ones((1, 3)), 0.08, cam)
        return jnp.mean((img - target) ** 2)

    g = jax.grad(loss)(jnp.zeros((1, 3)))
    assert np.isfinite(np.asarray(g)).all()
    assert abs(float(g[0, 0])) > 0  # x gradient pulls toward the target


def test_masks():
    img = jnp.zeros((8, 8, 3)).at[2:4, 2:4, :].set(1.0)
    hm = np.asarray(hard_mask(img))
    sm = np.asarray(soft_mask(img))
    assert hm[2, 2] == 1.0 and hm[0, 0] == 0.0
    assert sm[2, 2] > 0.9 and sm[0, 0] < 0.2


def test_deterministic_render_matches_scatter():
    """The sorted segment-sum accumulation must agree with scatter-add
    (same math, fixed order) in value and gradient."""
    import jax
    import jax.numpy as jnp
    from genpc_tpu.render.point_renderer import RenderCamera, render_points
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.normal(size=(512, 3)) * 0.3, jnp.float32)
    cols = jnp.asarray(rng.random((512, 3)), jnp.float32)
    cam = RenderCamera.default(64)
    img_s = render_points(pts, cols, 0.02, cam, deterministic=False)
    img_d = render_points(pts, cols, 0.02, cam, deterministic=True)
    np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_d),
                               atol=1e-5)

    def loss(p, det):
        return render_points(p, cols, 0.02, cam, deterministic=det).sum()

    g_s = jax.grad(lambda p: loss(p, False))(pts)
    g_d = jax.grad(lambda p: loss(p, True))(pts)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_d), atol=1e-3)


@pytest.mark.slow
def test_pose_optim_repeatable():
    """Repeated pose optimizations on the same inputs must agree exactly
    (the deterministic render kills the round-1 +-1 CD wobble source)."""
    from genpc_tpu.registration.pose_optim import object_pose_optimization
    rng = np.random.default_rng(5)
    partial = rng.normal(size=(256, 3)).astype(np.float32) * 0.2
    complete = np.concatenate([partial, partial * 0.9 + 0.05])
    col_p = np.full((256, 3), 0.7, np.float32)
    col_c = np.full((512, 3), 0.6, np.float32)
    T1 = object_pose_optimization(complete, col_c, partial, col_p,
                                  iters=20, render_size=64)
    T2 = object_pose_optimization(complete, col_c, partial, col_p,
                                  iters=20, render_size=64)
    np.testing.assert_array_equal(T1, T2)
