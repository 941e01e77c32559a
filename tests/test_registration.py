import jax.numpy as jnp
import numpy as np
import pytest

from genpc_tpu.geometry.transforms import get_rotate_matrix
from genpc_tpu.registration.icp import (
    icp, icp_with_scaling, coarse_scale_sweep, iterative_scale_search, kabsch)
from genpc_tpu.registration.fusion import fuse_clouds, remove_close_points
from genpc_tpu.registration.pose_optim import object_pose_optimization


def _shape_cloud(n=800, seed=0):
    """An asymmetric L-shaped slab — registrable without symmetry ambiguity."""
    rng = np.random.default_rng(seed)
    a = rng.random((n // 2, 3)) * np.array([1.0, 0.2, 0.3])
    b = rng.random((n // 2, 3)) * np.array([0.25, 0.8, 0.3]) + np.array([0, 0.2, 0])
    return np.concatenate([a, b]).astype(np.float32)


def test_kabsch_exact_recovery():
    src = jnp.asarray(_shape_cloud(200))
    R = jnp.asarray(get_rotate_matrix("z", 25), jnp.float32)
    t = jnp.array([0.3, -0.1, 0.2])
    tgt = src @ R.T + t
    R2, t2 = kabsch(src, tgt, jnp.ones(src.shape[0]))
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t), atol=1e-5)


def test_icp_recovers_small_transform():
    src = _shape_cloud(600)
    R = get_rotate_matrix("y", 8)
    t = np.array([0.03, -0.02, 0.04])
    tgt = (src @ R.T + t).astype(np.float32)
    T, fitness, rmse = icp(src, tgt, max_correspondence_distance=0.2)
    moved = src @ np.asarray(T)[:3, :3].T + np.asarray(T)[:3, 3]
    err = np.abs(moved - tgt).max()
    assert err < 0.02
    assert float(fitness) > 0.99


def test_icp_with_scaling():
    src = _shape_cloud(600)
    tgt = (src * 0.9).astype(np.float32)  # pure shrink
    T, fit, rmse = icp_with_scaling(src, tgt, scale=0.9,
                                    max_correspondence_distance=0.2)
    moved = src @ np.asarray(T)[:3, :3].T + np.asarray(T)[:3, 3]
    assert np.abs(moved - tgt).max() < 0.05


def test_coarse_scale_sweep_finds_scale():
    src = _shape_cloud(500)
    # target = complete cloud that is 1/1.2 the source scale: the sweep
    # looks for s so that ICP(src -> tgt) with scale s fits best
    tgt = (src * (1.0 / 1.2)).astype(np.float32)
    best_scale, T, loss = coarse_scale_sweep(src, tgt,
                                             scales=np.linspace(1.5, 0.8, 11))
    # applying inv(T) to tgt must land on src (reference scoring path)
    inv = np.linalg.inv(T)
    back = tgt @ inv[:3, :3].T + inv[:3, 3]
    assert np.abs(back - src).mean() < 0.05
    assert loss < 0.05


def test_iterative_scale_search_grid():
    src = _shape_cloud(400)
    true = np.array([1.1, 0.9, 1.0])
    tgt = (src * true).astype(np.float32)
    S, loss, T = iterative_scale_search(
        src, tgt, scale_ranges=((0.8, 1.2), (0.8, 1.2), (0.8, 1.2)),
        scale_steps=5, cd_inv_weight=0.5)
    got = np.diag(S)[:3]
    np.testing.assert_allclose(got, true, atol=0.11)  # grid resolution 0.1
    assert loss < 0.05


def test_remove_close_points():
    src = np.zeros((1, 3), np.float32)
    tgt = np.array([[0.001, 0, 0], [1.0, 0, 0]], np.float32)
    kept, _ = remove_close_points(src, tgt, distance_threshold=1e-4)
    # squared-distance threshold: 0.001² = 1e-6 < 1e-4 -> dropped
    assert len(kept) == 1 and kept[0, 0] == 1.0


def test_fuse_clouds_pipeline():
    rng = np.random.default_rng(0)
    src = rng.random((3000, 3)).astype(np.float32)
    tgt = rng.random((5000, 3)).astype(np.float32) + np.array([0.5, 0, 0])
    pts, cols = fuse_clouds(src, tgt,
                            source_colors=np.ones_like(src) * 0.5,
                            target_colors=np.ones_like(tgt) * 0.7,
                            num_points=2000)
    assert len(pts) <= 2000
    assert cols is not None and len(cols) == len(pts)


@pytest.mark.slow
def test_pose_optimization_recovers_rotation():
    # complete cloud = L-shape; partial = its points rotated 90° about y.
    # the optimizer must rotate complete to match the partial render+CD.
    comp = _shape_cloud(500, seed=1)
    comp = comp - comp.mean(0)  # center
    R = get_rotate_matrix("y", 90)
    partial = (comp @ R.T).astype(np.float32)
    cols = np.ones_like(comp) * 0.7
    T = object_pose_optimization(comp, cols, partial, cols,
                                 radius=0.03, lr=0.01, iters=60,
                                 render_size=64)
    # applying T to complete should land near partial (up to CD tolerance)
    moved = comp @ T[:3, :3].T + T[:3, 3]
    from genpc_tpu.metrics.losses import chamfer_l1
    cd_after = float(chamfer_l1(moved, partial))
    cd_before = float(chamfer_l1(comp, partial))
    assert cd_after < cd_before * 0.6


@pytest.mark.slow
def test_pose_optimization_start_pruning_matches_unpruned():
    """Pruning to the best coarse-phase start (pose_prune_starts=1) must
    recover the same rotation the all-starts fine phase does — the basin
    ranking is decided by the coarse search, the full-res phase only
    polishes (batched_runner._bpose_prune / pose_optim._prune_starts)."""
    import jax.numpy as jnp
    from genpc_tpu.metrics.losses import chamfer_l1
    from genpc_tpu.parallel.batched_runner import batched_pose_optim

    comp = _shape_cloud(256, seed=3)
    comp = comp - comp.mean(0)
    R = get_rotate_matrix("y", 90)
    partial = (comp @ R.T).astype(np.float32)
    cols = np.full_like(comp, 0.7)
    args = (jnp.asarray(comp)[None], jnp.asarray(cols)[None],
            jnp.asarray(partial)[None], jnp.asarray(cols)[None],
            jnp.float32(0.03), jnp.float32(0.01))
    cd_before = float(chamfer_l1(comp, partial))
    cds = {}
    for prune in (0, 1):
        T = np.asarray(batched_pose_optim(
            *args, 50, 64, chunk=25, coarse_frac=0.7, prune_to=prune))[0]
        moved = comp @ T[:3, :3].T + T[:3, 3]
        cds[prune] = float(chamfer_l1(moved, partial))
    assert cds[1] < cd_before * 0.6
    # pruned must not be meaningfully worse than polishing all starts
    assert cds[1] <= cds[0] * 1.25 + 1e-3


def test_similarity_icp_recovers_similarity():
    """Umeyama ICP recovers a scale+rotation+translation from a
    near-aligned start (the final-refine regime)."""
    from genpc_tpu.registration.icp import similarity_icp
    from genpc_tpu.geometry.transforms import get_rotate_matrix
    r = np.random.default_rng(0)
    tgt = r.normal(size=(512, 3)).astype(np.float32) * 0.3
    R = get_rotate_matrix("y", 8.0)[:3, :3]
    c = 1.04
    t = np.array([0.02, -0.03, 0.01], np.float32)
    src = (tgt @ (c * R).T + t).astype(np.float32)
    # recover src -> tgt
    T = np.asarray(similarity_icp(jnp.asarray(src), jnp.asarray(tgt), 0.2))
    moved = src @ T[:3, :3].T + T[:3, 3]
    assert np.abs(moved - tgt).max() < 1e-3


def test_affine_icp_cancels_rotated_frame_anisotropy():
    """The registration chain's aligned-input residual composes to
    R1·diag(s)·R2 — outside anisotropic_icp's R·diag(s) model.  The
    general-affine refine (cfg.final_refine='affine') must cancel it
    essentially exactly; the anisotropic model must at least not beat
    it (STATUS r3 honest-gap #3)."""
    from genpc_tpu.geometry.transforms import get_rotate_matrix
    from genpc_tpu.registration.icp import affine_icp, anisotropic_icp
    r = np.random.default_rng(2)
    tgt = r.normal(size=(512, 3)).astype(np.float32) * 0.3
    R1 = get_rotate_matrix("y", 9.0)[:3, :3]
    R2 = get_rotate_matrix("x", -7.0)[:3, :3]
    A = R1 @ np.diag([1.08, 0.94, 1.03]).astype(np.float32) @ R2
    t = np.array([0.015, -0.02, 0.01], np.float32)
    src = (tgt @ A.T + t).astype(np.float32)

    def resid(T):
        moved = src @ np.asarray(T)[:3, :3].T + np.asarray(T)[:3, 3]
        return float(np.abs(moved - tgt).max())

    r_affine = resid(affine_icp(jnp.asarray(src), jnp.asarray(tgt), 0.2))
    r_aniso = resid(anisotropic_icp(jnp.asarray(src), jnp.asarray(tgt),
                                    0.2))
    assert r_affine < 1e-3
    assert r_affine <= r_aniso + 1e-6
    # the batched dispatch (cfg.final_refine='affine') must vmap cleanly
    from genpc_tpu.parallel.batched_runner import batched_similarity_refine
    Tb = np.asarray(batched_similarity_refine(
        jnp.asarray(src)[None], jnp.asarray(tgt)[None], mode="affine"))
    assert resid(Tb[0]) < 1e-3


def _mk_cloud_pair(rng, n=1024):
    """A synthetic 'partial' (half of an ASYMMETRIC torus-ish shell) +
    its aligned 'complete' cloud.  The ring radius and tube radius both
    vary with theta and the tube is z-sheared, so the shape has no
    rotational or mirror symmetry — registration has a unique basin
    (a symmetric shape lets the stack land in a flipped optimum that a
    CD-based test cannot distinguish)."""
    theta = rng.uniform(0, 2 * np.pi, 4 * n)
    phi = rng.uniform(0, 2 * np.pi, 4 * n)
    ring = 0.3 + 0.06 * np.cos(theta) + 0.03 * np.sin(2 * theta)
    tube = 0.1 + 0.04 * np.sin(theta)
    pts = np.stack([(ring + tube * np.cos(phi)) * np.cos(theta),
                    (ring + tube * np.cos(phi)) * np.sin(theta),
                    tube * np.sin(phi) + 0.08 * np.sin(theta)],
                   axis=1).astype(np.float32)
    complete = pts[:2 * n]
    partial = complete[complete[:, 0] > 0][:n]
    return partial, complete


def _reg_test_cfg(**kw):
    from genpc_tpu.config import load_config
    base = dict(save=False, output_path="/tmp/test_ws",
                trust_aligned_completion=False, glb_sample_points=2048,
                pose_complete_points=512, pose_partial_points=512,
                icp_points=1024, pose_iters=40, pose_render_size=64,
                fused_points=4096, fine_scale_steps=5,
                generative_model="synthetic")
    base.update(kw)
    return load_config(**base)


def _cd(a, b):
    from genpc_tpu.metrics.losses import chamfer_l1
    return float(chamfer_l1(jnp.asarray(a, jnp.float32),
                            jnp.asarray(b, jnp.float32)))


@pytest.mark.slow
def test_registration_recovers_misalignment():
    """VERDICT r2 #4: a deliberately mis-posed/mis-scaled completion must
    be recovered by the full stack to near the aligned-path quality."""
    from genpc_tpu.geometry.transforms import get_rotate_matrix
    from genpc_tpu.pipeline.artifacts import ObjectArtifacts
    from genpc_tpu.pipeline.registration import reg
    rng = np.random.default_rng(1)
    partial, complete = _mk_cloud_pair(rng)

    R = (get_rotate_matrix("y", 25.0) @ get_rotate_matrix("x", -12.0)
         )[:3, :3]
    scales = np.array([1.1, 0.95, 1.05], np.float32)
    mis = (complete * scales) @ R.T + np.array([0.05, -0.04, 0.06])

    art = ObjectArtifacts(flag="mis", xyz=partial,
                          rgb=np.full_like(partial, 0.5))
    art.color_xyz = partial
    art.color_rgb = np.full_like(partial, 0.5)
    art.complete_xyz = mis.astype(np.float32)
    art.complete_rgb = np.full_like(mis, 0.5).astype(np.float32)

    cfg = _reg_test_cfg()
    reg(cfg, art, diff_init=True, reg_fine_xyz=True, verbose=False)

    cd_recovered = _cd(art.fused_xyz, complete)
    cd_mis = _cd(mis, complete)
    # recovered fusion must be close to the true complete cloud and far
    # better than leaving the mis-posed completion in place
    assert cd_recovered < 0.3 * cd_mis
    assert cd_recovered < 0.025


@pytest.mark.slow
def test_reg_on_aligned_matches_fast_path():
    """VERDICT r2 #4: on an ALREADY-ALIGNED completion the full stack
    (with the final similarity snap) must not lose to the skip path."""
    from genpc_tpu.pipeline.artifacts import ObjectArtifacts
    from genpc_tpu.pipeline.registration import reg
    from genpc_tpu.registration.fusion import fuse_clouds
    rng = np.random.default_rng(2)
    partial, complete = _mk_cloud_pair(rng)

    def mk_art():
        art = ObjectArtifacts(flag="al", xyz=partial,
                              rgb=np.full_like(partial, 0.5))
        art.color_xyz = partial
        art.color_rgb = np.full_like(partial, 0.5)
        art.complete_xyz = complete.astype(np.float32)
        art.complete_rgb = np.full_like(complete, 0.5).astype(np.float32)
        return art

    fused_fast, _ = fuse_clouds(partial, complete,
                                np.full_like(partial, 0.5),
                                np.full_like(complete, 0.5),
                                num_points=4096)
    cd_fast = _cd(fused_fast, complete)

    art = mk_art()
    cfg = _reg_test_cfg()
    reg(cfg, art, diff_init=True, reg_fine_xyz=True, verbose=False)
    cd_reg = _cd(art.fused_xyz, complete)

    art2 = mk_art()
    reg(_reg_test_cfg(final_icp_refine=False), art2, diff_init=True,
        reg_fine_xyz=True, verbose=False)
    cd_noref = _cd(art2.fused_xyz, complete)

    # the anisotropic final snap must recover most of the chain's
    # residual (the fine grid's unregistered-score quirk + out-of-order
    # undo leave an affine error; registration/icp.py:anisotropic_icp)
    assert cd_reg < 0.45 * cd_noref
    # and land near the skip path at this toy scale (bench asserts the
    # real-data criterion reg-on <= fast-path; VERDICT r2 #4)
    assert cd_reg <= cd_fast + 3.5e-3
