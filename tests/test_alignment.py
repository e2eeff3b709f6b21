import numpy as np
import jax
import jax.numpy as jnp
import pytest

from align3r_tpu.geometry import pose_vec_to_matrix
from align3r_tpu.alignment.scene import (
    build_scene, default_masks, global_alignment_loop, get_im_poses,
    get_focals, get_depthmaps_raw, pairwise_pts_loss, depth_to_pts3d,
)
from align3r_tpu.alignment.init_poses import mst_init, estimate_focal_weiszfeld
from align3r_tpu.alignment.schedules import schedule_array
from align3r_tpu.geometry.core import xy_grid, closed_form_pose_inverse, geotrf


H, W, FOCAL = 16, 24, 40.0


def synth_scene(n=4, seed=0):
    """Ground-truth scene: smooth depths, small camera motion."""
    rng = np.random.default_rng(seed)
    grid = np.asarray(xy_grid(W, H))
    depths = []
    poses = [np.eye(4, dtype=np.float32)]
    for k in range(n):
        d = 2.0 + 0.3 * np.sin(grid[..., 0] / 5 + k) + 0.2 * np.cos(grid[..., 1] / 4)
        depths.append(d.astype(np.float32))
    for k in range(1, n):
        th = 0.03 * k
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                              [-np.sin(th), 0, np.cos(th)]], np.float32)
        T[:3, 3] = [0.1 * k, 0.02 * k, 0.05 * k]
        poses.append(T)
    return np.stack(depths), np.stack(poses)


def unproject(depth, focal):
    grid = np.asarray(xy_grid(W, H))
    x = depth * (grid[..., 0] - W / 2) / focal
    y = depth * (grid[..., 1] - H / 2) / focal
    return np.stack([x, y, depth], -1).astype(np.float32)


def make_output(depths, poses, edges):
    """Perfect pairwise predictions for the given edges."""
    E = len(edges)
    cam_pts = np.stack([unproject(d, FOCAL) for d in depths])
    pred1 = np.zeros((E, H, W, 3), np.float32)
    pred2 = np.zeros((E, H, W, 3), np.float32)
    for k, (i, j) in enumerate(edges):
        pred1[k] = cam_pts[i]
        rel = np.linalg.inv(poses[i]) @ poses[j]
        pred2[k] = np.asarray(geotrf(jnp.asarray(rel), jnp.asarray(cam_pts[j])))
    conf = np.full((E, H, W), 8.0, np.float32)
    return {
        "view1": {"idx": np.array([e[0] for e in edges])},
        "view2": {"idx": np.array([e[1] for e in edges])},
        "pred1": {"pts3d": jnp.asarray(pred1), "conf": jnp.asarray(conf)},
        "pred2": {"pts3d_in_other_view": jnp.asarray(pred2), "conf": jnp.asarray(conf)},
    }


def sym_edges(n):
    e = [(i, j) for i in range(n) for j in range(n) if i != j and abs(i - j) <= 2]
    return e


def test_schedule_array():
    lrs = schedule_array("cosine", 10, 0.1, 1e-6)
    assert lrs[0] == pytest.approx(0.1)
    assert np.all(np.diff(lrs) < 0)
    lin = schedule_array("linear", 10, 0.1, 0.0)
    assert lin[0] == pytest.approx(0.1) and lin[-1] == pytest.approx(0.01)
    cyc = schedule_array("cycle", 10, 0.1, 0.0, num_cycles=2)
    assert cyc[5] == pytest.approx(0.1)  # restarts


def test_focal_estimation():
    d, _ = synth_scene(1)
    pts = unproject(d[0], FOCAL)
    f = estimate_focal_weiszfeld(pts)
    assert abs(f - FOCAL) / FOCAL < 0.02


def test_mst_init_recovers_geometry():
    depths, poses = synth_scene(4)
    edges = sym_edges(4)
    out = make_output(depths, poses, edges)
    cfg, data, params = build_scene(out)
    params = mst_init(params, data, cfg,
                      np.asarray(out["pred1"]["conf"]),
                      np.asarray(out["pred2"]["conf"]))
    # with perfect predictions the init loss should be ~0
    loss = float(pairwise_pts_loss(params, data, cfg))
    assert loss < 5e-2, loss
    # relative poses recovered up to global sim3 gauge
    P = np.asarray(get_im_poses(params))
    rel_est = np.linalg.inv(P[0]) @ P[2]
    rel_gt = np.linalg.inv(poses[0]) @ poses[2]
    # rotation must match
    np.testing.assert_allclose(rel_est[:3, :3], rel_gt[:3, :3], atol=0.05)
    # translation direction must match (scale is gauge)
    t_e, t_g = rel_est[:3, 3], rel_gt[:3, 3]
    cos = t_e @ t_g / (np.linalg.norm(t_e) * np.linalg.norm(t_g))
    assert cos > 0.99
    # focals recovered
    f = np.asarray(get_focals(params, cfg))
    np.testing.assert_allclose(f, FOCAL, rtol=0.05)


def test_alignment_loop_reduces_loss():
    depths, poses = synth_scene(4, seed=1)
    edges = sym_edges(4)
    out = make_output(depths, poses, edges)
    # perturb predictions so the MST init is imperfect and the solve has work
    rng = np.random.default_rng(0)
    for k, v in (("pred1", "pts3d"), ("pred2", "pts3d_in_other_view")):
        arr = np.asarray(out[k][v])
        out[k][v] = jnp.asarray(arr + 0.02 * rng.standard_normal(arr.shape).astype(np.float32))
    cfg, data, params = build_scene(out)
    params = mst_init(params, data, cfg,
                      np.asarray(out["pred1"]["conf"]),
                      np.asarray(out["pred2"]["conf"]))
    masks = default_masks(cfg, params)
    params2, losses = global_alignment_loop(params, masks, data, cfg,
                                            lr=0.01, niter=50, schedule="cosine")
    losses = np.asarray(losses)
    assert losses[-1] <= losses[0] + 1e-6
    assert np.isfinite(losses).all()
    # principal points stayed frozen (optimize_pp=False)
    np.testing.assert_array_equal(np.asarray(params2["im_pp"]),
                                  np.asarray(params["im_pp"]))


def test_alignment_from_scratch_converges():
    """Without MST init (random init), the loop should still reduce loss a lot."""
    depths, poses = synth_scene(3, seed=2)
    edges = sym_edges(3)
    out = make_output(depths, poses, edges)
    cfg, data, params = build_scene(out)
    masks = default_masks(cfg, params)
    params2, losses = global_alignment_loop(params, masks, data, cfg,
                                            lr=0.05, niter=150, schedule="cosine")
    assert np.asarray(losses)[-1] < 0.5 * np.asarray(losses)[0]


def test_mono_scalemap_mode():
    """if_use_mono: depth parameterised as mono*exp(scalemap)+shift."""
    depths, poses = synth_scene(3, seed=3)
    edges = sym_edges(3)
    out = make_output(depths, poses, edges)
    mono = depths.reshape(3, -1) * 0.5  # mono priors at wrong scale
    cfg, data, params = build_scene(out, mono_depths=mono)
    assert cfg.if_use_mono and "scalemaps" in params and "im_depthmaps" not in params
    d0 = np.asarray(get_depthmaps_raw(params, data, cfg))
    np.testing.assert_allclose(d0, mono, rtol=1e-5)  # identity at init
    masks = default_masks(cfg, params)
    params2, losses = global_alignment_loop(params, masks, data, cfg,
                                            lr=0.05, niter=100)
    assert np.asarray(losses)[-1] < np.asarray(losses)[0]


def test_row_freeze_mask():
    """Anchored rows (init_priors-style) must not move during the solve."""
    depths, poses = synth_scene(3, seed=4)
    edges = sym_edges(3)
    out = make_output(depths, poses, edges)
    cfg, data, params = build_scene(out)
    masks = default_masks(cfg, params)
    masks["im_poses"] = masks["im_poses"].at[0].set(0.0)  # freeze frame-0 pose
    p0_before = np.asarray(params["im_poses"][0])
    params2, _ = global_alignment_loop(params, masks, data, cfg, lr=0.05, niter=30)
    np.testing.assert_array_equal(np.asarray(params2["im_poses"][0]), p0_before)
    assert not np.allclose(np.asarray(params2["im_poses"][1]),
                           np.asarray(params["im_poses"][1]))


def test_batched_alignment_matches_sequential():
    """vmapped multi-scene solve == per-scene solves."""
    from align3r_tpu.alignment.batched import batched_alignment
    scenes = []
    for seed in (20, 21):
        depths, poses = synth_scene(3, seed=seed)
        out = make_output(depths, poses, sym_edges(3))
        cfg, data, params = build_scene(out)
        masks = default_masks(cfg, params)
        scenes.append((cfg, data, params, masks))
    cfg = scenes[0][0]
    solved, losses = batched_alignment(
        [s[2] for s in scenes], [s[3] for s in scenes],
        [s[1] for s in scenes], cfg, lr=0.05, niter=40)
    assert losses.shape == (2, 40)
    for k, (c, d, p, m) in enumerate(scenes):
        p_seq, l_seq = global_alignment_loop(p, m, d, c, lr=0.05, niter=40,
                                             schedule="cosine")
        np.testing.assert_allclose(losses[k], np.asarray(l_seq), rtol=2e-4,
                                   atol=1e-5)


def test_alignment_scan_step_offset_and_state_threading():
    """Phase 2 of a mixed-precision solve must see GLOBAL step indices
    (flow_forward's flow-loss gate is step-driven) and continue the same
    Adam moments — a restarted counter silently disabled the flow term for
    most of the fp32 polish (code-review r3 finding #1)."""
    from align3r_tpu.alignment.scene import _alignment_scan
    depths, poses = synth_scene(3)
    edges = sym_edges(3)
    cfg, data, params = build_scene(make_output(depths, poses, edges))
    masks = {k: jnp.ones_like(v) for k, v in params.items()}
    lrs = jnp.full((10,), 1e-3)

    def spy_loss(p, data, cfg, step):
        # zero-gradient loss that records the step index it was given
        return jnp.sum(p["im_poses"]) * 0.0 + step * 1.0

    p1, l1, st = _alignment_scan(params, masks, data, lrs[:6], cfg, spy_loss)
    p2, l2, _ = _alignment_scan(p1, masks, data, lrs[6:], cfg, spy_loss,
                                step0=6, opt_state=st)
    np.testing.assert_array_equal(np.asarray(jnp.concatenate([l1, l2])),
                                  np.arange(10, dtype=np.float32))


def test_batched_alignment_rejects_unknown_precision():
    from align3r_tpu.alignment.batched import batched_alignment
    depths, poses = synth_scene(3)
    edges = sym_edges(3)
    cfg, data, params = build_scene(make_output(depths, poses, edges))
    masks = {k: jnp.ones_like(v) for k, v in params.items()}
    with pytest.raises(ValueError):
        batched_alignment([params], [masks], [data], cfg, niter=4,
                          precision="Mixed")


def test_mst_init_disconnected_graph_terminates():
    """scipy returns a spanning FOREST for a disconnected pairwise graph;
    the MST walk must seed each component instead of spinning forever
    (code-review r3 finding #3). Each component gets its own gauge, so we
    only assert termination + every view placed."""
    depths, poses = synth_scene(6)
    # two components: {0,1,2} and {3,4,5} — no cross edges
    edges = [(i, j) for i in range(3) for j in range(3) if i != j] + \
            [(i, j) for i in range(3, 6) for j in range(3, 6) if i != j]
    out = make_output(depths, poses, edges)
    cfg, data, params = build_scene(out)
    params = mst_init(params, data, cfg,
                      np.asarray(out["pred1"]["conf"]),
                      np.asarray(out["pred2"]["conf"]))
    P = np.asarray(get_im_poses(params))
    assert P.shape == (6, 4, 4) and np.isfinite(P).all()
    # within-component relative poses still recovered (component 2)
    rel_est = np.linalg.inv(P[3]) @ P[5]
    rel_gt = np.linalg.inv(poses[3]) @ poses[5]
    # allow scale gauge per component: compare rotations
    from scipy.spatial.transform import Rotation as R
    ang = R.from_matrix(rel_est[:3, :3] @ rel_gt[:3, :3].T).magnitude()
    assert ang < 0.05, ang
