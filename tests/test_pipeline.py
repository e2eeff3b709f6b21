"""End-to-end pipeline test: tiny model -> pair graph -> inference ->
MST init -> alignment solve -> SceneResult getters/savers."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from align3r_tpu.models.config import TINY_TEST
from align3r_tpu.models.align3r import init_align3r
from align3r_tpu.pipeline import reconstruct_scene
from align3r_tpu.models.raft import RAFTConfig, init_raft


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = TINY_TEST
    params = init_align3r(jax.random.PRNGKey(0), cfg)
    # tame the random-init head so raw |xyz| stays in a realistic range
    # (trained checkpoints emit d <= ~10; random init emits ~50-150)
    for h in ("head1", "head2"):
        hc = dict(params[h])
        hc["head_conv3"] = {
            "kernel": params[h]["head_conv3"]["kernel"] * 0.01,
            "bias": params[h]["head_conv3"]["bias"] * 0.0,
        }
        params = dict(params, **{h: hc})
    n, H, W = 4, 32, 48
    rng = np.random.default_rng(0)
    imgs = np.clip(rng.standard_normal((n, H, W, 3)) * 0.3, -1, 1).astype(np.float32)
    priors = rng.uniform(0, 1, (n, H, W, 3)).astype(np.float32)
    return cfg, params, imgs, priors


def test_reconstruct_prior_variant(tiny_setup, tmp_path):
    cfg, params, imgs, priors = tiny_setup
    scene = reconstruct_scene(imgs, priors, params, cfg,
                              scene_graph="complete", variant="prior",
                              niter=30, lr=0.05, schedule="cosine",
                              batch_size=4)
    n = imgs.shape[0]
    assert scene.get_im_poses().shape == (n, 4, 4)
    assert scene.get_depthmaps().shape == (n, 32, 48)
    assert scene.get_focals().shape == (n,)
    assert scene.get_intrinsics().shape == (n, 3, 3)
    assert scene.get_pts3d().shape == (n, 32, 48, 3)
    assert np.isfinite(scene.losses).all()
    # savers produce artifacts
    traj = scene.save_tum_poses(tmp_path / "traj.txt")
    assert traj.shape == (n, 7)
    scene.save_intrinsics(tmp_path / "K.txt")
    scene.save_focals(tmp_path / "f.txt")
    scene.save_depth_maps(tmp_path / "depth")
    scene.save_conf_maps(tmp_path / "conf")
    scene.save_dynamic_masks(tmp_path / "dyn")
    scene.save_rgb_imgs(tmp_path / "rgb")
    assert (tmp_path / "depth" / "frame_0000.npy").exists()
    assert (tmp_path / "depth" / "frame_0003.png").exists()


def test_reconstruct_mono_mode(tiny_setup):
    cfg, params, imgs, priors = tiny_setup
    mono = np.random.default_rng(1).uniform(1, 3, (4, 32 * 48)).astype(np.float32)
    scene = reconstruct_scene(imgs, priors, params, cfg,
                              scene_graph="complete", variant="prior",
                              mono_depths=mono, niter=20, lr=0.05,
                              batch_size=4, conf_clamp=10.0)
    assert "scalemaps" in scene.params
    assert np.isfinite(scene.losses).all()


def test_reconstruct_flow_variant_with_raft(tiny_setup):
    cfg, params, imgs, priors = tiny_setup
    raft_cfg = RAFTConfig(dim=32, radius=2, corr_levels=2, initial_dim=16,
                          block_dims=(16, 24, 32), n_blocks=(1, 1, 1),
                          num_refine=1, iters=2)
    raft_params = init_raft(jax.random.PRNGKey(5), raft_cfg)
    # patch compute_raft_flows to the tiny config via iters arg path
    import align3r_tpu.pipeline as P

    def tiny_flows(rp, imgs01, edges, chunk=12, iters=2, **kw):
        from align3r_tpu.models.raft import raft_forward
        ei = np.array([e[0] for e in edges]); ej = np.array([e[1] for e in edges])
        a = jnp.asarray(imgs01[ei] * 255); b = jnp.asarray(imgs01[ej] * 255)
        f = raft_forward(rp, a, b, raft_cfg, iters=1)
        g = raft_forward(rp, b, a, raft_cfg, iters=1)
        return np.asarray(f), np.asarray(g)

    orig = P.compute_raft_flows
    P.compute_raft_flows = tiny_flows
    try:
        scene = reconstruct_scene(
            imgs, priors, params, cfg, scene_graph="swin-1-noncyclic",
            variant="flow", raft_params=raft_params, use_self_mask=True,
            niter=20, lr=0.01,
            scene_kw=dict(shared_focal=True, flow_loss_weight=0.01,
                          temporal_smoothing_weight=0.01,
                          flow_loss_start_epoch=0.0, flow_loss_thre=-1))
    finally:
        P.compute_raft_flows = orig
    assert scene.dynamic_masks is not None
    assert scene.dynamic_masks.shape == (4, 32, 48)
    assert np.isfinite(scene.losses).all()
    assert scene.params["im_focals"].shape == (1,)  # shared focal


def test_sam2_mask_refine_wiring(tiny_setup):
    """--sam2_mask_refine routes the self-supervised motion masks through
    refine_motion_mask_w_sam2 (reference cloud_opt_flow/optimizer.py:237-312)
    and the refined masks are the ones the scene uses."""
    cfg, params, imgs, priors = tiny_setup
    raft_cfg = RAFTConfig(dim=32, radius=2, corr_levels=2, initial_dim=16,
                          block_dims=(16, 24, 32), n_blocks=(1, 1, 1),
                          num_refine=1, iters=2)
    raft_params = init_raft(jax.random.PRNGKey(5), raft_cfg)
    import align3r_tpu.pipeline as P
    import align3r_tpu.models.sam2_refine as R

    def tiny_flows(rp, imgs01, edges, chunk=12, iters=2, **kw):
        from align3r_tpu.models.raft import raft_forward
        ei = np.array([e[0] for e in edges]); ej = np.array([e[1] for e in edges])
        a = jnp.asarray(imgs01[ei] * 255); b = jnp.asarray(imgs01[ej] * 255)
        f = raft_forward(rp, a, b, raft_cfg, iters=1)
        g = raft_forward(rp, b, a, raft_cfg, iters=1)
        return np.asarray(f), np.asarray(g)

    calls = []

    def fake_refine(images01, masks, params=None, cfg=None, **kw):
        calls.append(images01.shape)
        return ~np.asarray(masks).astype(bool)   # marker: inversion

    orig_flows, orig_refine = P.compute_raft_flows, R.refine_motion_mask_w_sam2
    P.compute_raft_flows = tiny_flows
    R.refine_motion_mask_w_sam2 = fake_refine
    kw = dict(scene_graph="swin-1-noncyclic", variant="flow",
              raft_params=raft_params, use_self_mask=True, niter=5, lr=0.01,
              scene_kw=dict(shared_focal=True, flow_loss_weight=0.01,
                            flow_loss_start_epoch=0.0, flow_loss_thre=-1))
    try:
        plain = reconstruct_scene(imgs, priors, params, cfg, **kw)
        refined = reconstruct_scene(imgs, priors, params, cfg,
                                    sam2_mask_refine=True, **kw)
    finally:
        P.compute_raft_flows = orig_flows
        R.refine_motion_mask_w_sam2 = orig_refine
    assert calls == [(4, 32, 48, 3)]
    assert (np.asarray(refined.dynamic_masks)
            == ~np.asarray(plain.dynamic_masks).astype(bool)).all()


def test_sam2_refine_fallback_cleanup():
    """Without local SAM2 weights, refinement degrades to connected-component
    cleanup (islands/holes below min_area removed)."""
    from align3r_tpu.models.sam2_refine import refine_motion_mask_w_sam2
    m = np.zeros((2, 24, 24), bool)
    m[:, 4:16, 4:16] = True
    m[:, 8, 8] = False           # 1-px hole -> filled
    m[:, 20, 20] = True          # 1-px island -> removed
    imgs = np.random.default_rng(0).uniform(0, 1, (2, 24, 24, 3))
    out = refine_motion_mask_w_sam2(imgs, m, min_area=4)
    assert out[0, 8, 8] and not out[0, 20, 20]


def test_reconstruct_hierarchical(tiny_setup):
    """Keyframe coarse solve + anchored per-clip solves cover every frame."""
    from align3r_tpu.pipeline import reconstruct_scene_hierarchical
    cfg, params, imgs, priors = tiny_setup
    # extend to 7 frames so clip_size=3 gives 3 clips
    rng = np.random.default_rng(9)
    imgs7 = np.concatenate([imgs, imgs[:3]])
    priors7 = np.concatenate([priors, priors[:3]])
    results, poses, depths = reconstruct_scene_hierarchical(
        imgs7, priors7, params, cfg, clip_size=3, coarse_niter=10, niter=10,
        variant="prior", batch_size=4, lr=0.05)
    assert poses.shape == (7, 4, 4)
    assert depths.shape == (7, 32, 48)
    assert np.isfinite(poses).all() and np.isfinite(depths).all()
    # every frame got a real pose (not left at zero)
    assert (np.abs(poses).sum(axis=(1, 2)) > 0).all()


def test_preset_helpers():
    from align3r_tpu.alignment.scene import (
        init_params, default_masks, SceneConfig, preset_pose, preset_focal)
    cfg = SceneConfig(imshape=(8, 10), n_imgs=3, n_edges=4)
    params = init_params(cfg)
    masks = default_masks(cfg, params)
    T = np.eye(4, dtype=np.float32)[None].repeat(2, 0)
    T[1, :3, 3] = [1, 2, 3]
    params, masks = preset_pose(params, masks, np.array([0, 1]), T)
    assert float(np.abs(np.asarray(masks["im_poses"][:2])).sum()) == 0
    assert float(np.asarray(masks["im_poses"][2]).sum()) > 0
    from align3r_tpu.alignment.scene import get_im_poses
    P = np.asarray(get_im_poses(params))
    np.testing.assert_allclose(P[1], T[1], atol=1e-4)
    params, masks = preset_focal(params, masks, cfg, 0, 123.0)
    from align3r_tpu.alignment.scene import get_focals
    assert abs(float(np.asarray(get_focals(params, cfg))[0]) - 123.0) < 0.1
