"""TRUE reference-oracle parity for the global-alignment SOLVER.

Round-2 verdict item #2: model-forward parity is oracle-true, but the
alignment solve was only tested by synthetic ground-truth recovery — a
shared misreading of the reference optimizer could hide there.  This test
runs the reference's actual torch `PointCloudOptimizer` (both the prior
variant `dust3r/cloud_opt/optimizer.py` and the flow variant
`dust3r/cloud_opt_flow/optimizer.py`) for 300 CPU Adam iterations on a
tiny synthetic scene, then runs the JAX `lax.scan` solve from BIT-IDENTICAL
initial parameters, and asserts the two land on the same poses / focals /
depths and track the same loss curve.

Reference behaviour under test:
- base_opt.py:424-464 (global_alignment_loop: Adam betas (0.9, 0.9),
  cosine LR schedule with t = iter/niter)
- optimizer.py:223-241 (forward: per-edge L1 with conf-log weights,
  normalised by total areas), 189-199 (depth_to_pts3d), 137-160
  (focal/pp decode)
- base_opt.py:184-229 (pose decode: XYZW quat + signed_expm1 translation;
  pairwise Sim3 with product-normalised log-scale)
- cloud_opt_flow/optimizer.py:500-557 (flow-variant forward with temporal
  smoothing + shared focal), 559-572 (relative_pose_loss)

The reference's unimportable deps (roma/wandb/torchvision/evo/sam2) are
stubbed by reference_import.install_reference_dep_stubs; roma is the only
stub with math on the solve path and is cross-checked against scipy here.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_import import (reference_available, reference_on_path,
                              install_reference_dep_stubs)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")

N_IMGS, H, W = 3, 12, 16
A = H * W
NITER = 300


@pytest.fixture(scope="module")
def ref():
    install_reference_dep_stubs()
    with reference_on_path():
        import dust3r.cloud_opt.base_opt as prior_base
        import dust3r.cloud_opt.optimizer as prior_opt
        import dust3r.cloud_opt_flow.base_opt as flow_base
        import dust3r.cloud_opt_flow.optimizer as flow_opt
        yield {"prior_base": prior_base, "prior_opt": prior_opt,
               "flow_base": flow_base, "flow_opt": flow_opt}


def test_roma_stub_matches_scipy():
    """The roma stub is the one fake dependency whose math the reference
    solve actually executes — pin it to scipy."""
    from scipy.spatial.transform import Rotation
    install_reference_dep_stubs()
    import sys
    roma = sys.modules.get("roma")
    if roma is None or not hasattr(roma, "_quat_to_R"):
        pytest.skip("real roma installed; stub not in play")
    q = torch.randn(7, 4, generator=torch.Generator().manual_seed(3))
    q = q / q.norm(dim=-1, keepdim=True)
    R_stub = roma._quat_to_R(q).numpy()
    R_scipy = Rotation.from_quat(q.numpy()).as_matrix()
    np.testing.assert_allclose(R_stub, R_scipy, atol=1e-6)
    # and the round trip
    q_back = roma.rotmat_to_unitquat(torch.from_numpy(R_scipy.astype(np.float32)))
    R_back = roma._quat_to_R(q_back).numpy()
    np.testing.assert_allclose(R_back, R_scipy, atol=1e-5)


def _synthetic_scene(seed=0):
    """Consistent multi-view observations: smooth GT depths, small-motion GT
    poses, pred_j expressed in cam i via the GT relative pose, mild noise.
    Returns the engine-style output dict (numpy)."""
    rng = np.random.default_rng(seed)
    focal = 1.2 * max(H, W)
    xx, yy = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    grid = np.stack([xx, yy], -1)  # (H, W, 2), xy order
    pp = np.array([W / 2, H / 2], np.float32)

    def unproject(depth):
        return np.concatenate(
            [depth[..., None] * (grid - pp) / focal, depth[..., None]], -1)

    depths, poses = [], []
    for i in range(N_IMGS):
        base = 2.0 + 0.5 * np.sin(xx / W * 2 * np.pi + i) \
            + 0.3 * np.cos(yy / H * np.pi)
        depths.append(base.astype(np.float32))
        angle = 0.08 * i
        Rm = np.array([[np.cos(angle), 0, np.sin(angle)],
                       [0, 1, 0],
                       [-np.sin(angle), 0, np.cos(angle)]], np.float32)
        t = np.array([0.25 * i, 0.02 * i, 0.05 * i], np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3], T[:3, 3] = Rm, t
        poses.append(T)

    edges = [(i, j) for i in range(N_IMGS) for j in range(N_IMGS) if i != j]
    E = len(edges)
    pred1_pts = np.zeros((E, H, W, 3), np.float32)
    pred2_pts = np.zeros((E, H, W, 3), np.float32)
    conf1 = np.zeros((E, H, W), np.float32)
    conf2 = np.zeros((E, H, W), np.float32)
    for e, (i, j) in enumerate(edges):
        rel = np.linalg.inv(poses[i]) @ poses[j]  # cam j -> cam i
        pts_i = unproject(depths[i])
        pts_j = unproject(depths[j]) @ rel[:3, :3].T + rel[:3, 3]
        pred1_pts[e] = pts_i + rng.normal(0, 0.01, pts_i.shape)
        pred2_pts[e] = pts_j + rng.normal(0, 0.01, pts_j.shape)
        conf1[e] = 1.5 + 4.0 * rng.random((H, W))
        conf2[e] = 1.5 + 4.0 * rng.random((H, W))
    idx_i = np.array([i for i, j in edges], np.int64)
    idx_j = np.array([j for i, j in edges], np.int64)
    return {
        "view1": {"idx": idx_i},
        "view2": {"idx": idx_j},
        "pred1": {"pts3d": pred1_pts, "conf": conf1},
        "pred2": {"pts3d_in_other_view": pred2_pts, "conf": conf2},
    }


def _to_torch_views(out):
    t = torch.from_numpy
    view1 = {"idx": list(out["view1"]["idx"])}
    view2 = {"idx": list(out["view2"]["idx"])}
    pred1 = {"pts3d": t(out["pred1"]["pts3d"]).clone(),
             "conf": t(out["pred1"]["conf"]).clone()}
    pred2 = {"pts3d_in_other_view":
             t(out["pred2"]["pts3d_in_other_view"]).clone(),
             "conf": t(out["pred2"]["conf"]).clone()}
    return view1, view2, pred1, pred2


def _copy_ref_init_to_params(net, params, shared_focal=False):
    """Overwrite the JAX param dict with the reference's raw initial
    parameter values (same parameterisation by design).

    NB the explicit numpy copy: on the CPU backend jnp.asarray can alias
    the numpy view of a torch tensor zero-copy, and the reference loop's
    in-place Adam updates would then silently rewrite the 'initial' JAX
    params."""
    g = lambda x: jnp.asarray(np.array(x.detach().numpy(), copy=True))
    params = dict(params)
    params["pw_poses"] = g(net.pw_poses)
    params["im_poses"] = g(net.im_poses)
    params["im_depthmaps"] = g(net.im_depthmaps)
    f = g(net.im_focals).reshape(-1)
    params["im_focals"] = f[:1] if shared_focal else f
    params["im_pp"] = g(net.im_pp)
    params["pw_adaptors"] = g(net.pw_adaptors)
    return params


def _run_ref_loop(module, net, niter=NITER):
    """Reference global_alignment_loop, re-driven iter-by-iter so the loss
    curve is recorded (base_opt.py:444-447 non-verbose branch)."""
    params = [p for p in net.parameters() if p.requires_grad]
    optimizer = torch.optim.Adam(params, lr=0.01, betas=(0.9, 0.9))
    losses = []
    for n in range(niter):
        loss, _ = module.global_alignment_iter(
            net, n, niter, 0.01, 1e-6, optimizer, "cosine")
        losses.append(loss)
    return np.array(losses)


def _max_pose_err(P_ref, P_jax):
    P_ref = np.asarray(P_ref)
    P_jax = np.asarray(P_jax)
    return np.abs(P_ref - P_jax).max()


def test_prior_variant_solve_parity(ref):
    from align3r_tpu.alignment.scene import (
        build_scene, default_masks, global_alignment_loop, get_im_poses,
        get_focals, get_depthmaps_raw, pairwise_pts_loss)

    out = _synthetic_scene()
    view1, view2, pred1, pred2 = _to_torch_views(out)

    torch.manual_seed(11)
    net = ref["prior_opt"].PointCloudOptimizer(
        view1, view2, pred1, pred2, False,
        [torch.zeros(H, W) for _ in range(N_IMGS)], verbose=False)

    cfg, data, params = build_scene(out)
    params = _copy_ref_init_to_params(net, params)
    masks = default_masks(cfg, params)

    # identical loss at identical params before any optimization
    with torch.no_grad():
        l_ref0 = float(net())
    l_jax0 = float(pairwise_pts_loss(params, data, cfg))
    assert abs(l_ref0 - l_jax0) < 1e-5 * max(1.0, abs(l_ref0)), \
        f"initial loss mismatch: ref {l_ref0} vs jax {l_jax0}"

    ref_losses = _run_ref_loop(ref["prior_base"], net)
    params_out, jax_losses = global_alignment_loop(
        params, masks, data, cfg, lr=0.01, niter=NITER, schedule="cosine",
        lr_min=1e-6, precision="fp32")
    jax_losses = np.asarray(jax_losses)

    # loss curves track (fp32 drift accumulates over 300 iters)
    np.testing.assert_allclose(jax_losses[0], ref_losses[0], rtol=1e-5)
    np.testing.assert_allclose(jax_losses[50], ref_losses[50], rtol=1e-3)
    np.testing.assert_allclose(jax_losses[-1], ref_losses[-1], rtol=2e-3)

    # final state matches: poses, focals, depths
    with torch.no_grad():
        P_ref = net.get_im_poses().numpy()
        f_ref = net.get_focals().numpy().reshape(-1)
        d_ref = net.get_depthmaps(raw=True).numpy()
    P_jax = np.asarray(get_im_poses(params_out))
    f_jax = np.asarray(get_focals(params_out, cfg))
    d_jax = np.asarray(get_depthmaps_raw(params_out, data, cfg))
    assert _max_pose_err(P_ref, P_jax) < 5e-3, _max_pose_err(P_ref, P_jax)
    np.testing.assert_allclose(f_jax, f_ref, rtol=5e-3)
    np.testing.assert_allclose(d_jax, d_ref, rtol=5e-2, atol=5e-3)


def test_flow_variant_solve_parity(ref):
    """Flow-variant optimizer: shared focal + temporal smoothing loss
    (the flow/RAFT term needs checkpoints the container doesn't have and is
    exercised by its own unit tests against goem_opt oracles)."""
    from align3r_tpu.alignment.scene import (
        build_scene, default_masks, global_alignment_loop, get_im_poses,
        get_focals, get_depthmaps_raw)
    from align3r_tpu.alignment.flow import flow_forward

    out = _synthetic_scene(seed=5)
    view1, view2, pred1, pred2 = _to_torch_views(out)

    torch.manual_seed(13)
    net = ref["flow_opt"].PointCloudOptimizer(
        view1, view2, pred1, pred2, shared_focal=True,
        temporal_smoothing_weight=0.01, translation_weight=0.1,
        flow_loss_weight=0.0, depth_regularize_weight=0.0,
        num_total_iter=NITER, verbose=False)

    cfg, data, params = build_scene(out, cfg_kw=dict(
        shared_focal=True, temporal_smoothing_weight=0.01,
        translation_weight=0.1, num_total_iter=NITER))
    params = _copy_ref_init_to_params(net, params, shared_focal=True)
    masks = default_masks(cfg, params)

    with torch.no_grad():
        l_ref0 = float(net(epoch=0))
    l_jax0 = float(flow_forward(params, data, cfg, 0))
    assert abs(l_ref0 - l_jax0) < 1e-5 * max(1.0, abs(l_ref0)), \
        f"initial loss mismatch: ref {l_ref0} vs jax {l_jax0}"

    ref_losses = _run_ref_loop(ref["flow_base"], net)
    params_out, jax_losses = global_alignment_loop(
        params, masks, data, cfg, lr=0.01, niter=NITER, schedule="cosine",
        lr_min=1e-6, loss_fn=flow_forward, precision="fp32")
    jax_losses = np.asarray(jax_losses)

    np.testing.assert_allclose(jax_losses[0], ref_losses[0], rtol=1e-5)
    np.testing.assert_allclose(jax_losses[-1], ref_losses[-1], rtol=2e-3)

    with torch.no_grad():
        P_ref = net.get_im_poses().numpy()
        f_ref = net.get_focals().numpy().reshape(-1)
        d_ref = net.get_depthmaps(raw=True).numpy()
    P_jax = np.asarray(get_im_poses(params_out))
    f_jax = np.asarray(get_focals(params_out, cfg))
    d_jax = np.asarray(get_depthmaps_raw(params_out, data, cfg))
    assert _max_pose_err(P_ref, P_jax) < 5e-3, _max_pose_err(P_ref, P_jax)
    np.testing.assert_allclose(f_jax, f_ref, rtol=5e-3)
    np.testing.assert_allclose(d_jax, d_ref, rtol=5e-2, atol=5e-3)


def _synthetic_flow_inputs(seed=21):
    """Smooth synthetic flows + dynamic masks: what get_flow /
    get_motion_mask_from_pairs would have produced (no RAFT checkpoint is
    needed to test the loss TERM — the reference precomputes flow into
    buffers, cloud_opt_flow/optimizer.py:104-111, and forward:520-542 only
    reads them)."""
    rng = np.random.default_rng(seed)
    edges = [(i, j) for i in range(N_IMGS) for j in range(N_IMGS) if i != j]
    E = len(edges)
    xx, yy = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    flow_ij = np.stack([
        np.stack([1.5 * np.sin(xx / W * 2 * np.pi + e),
                  0.8 * np.cos(yy / H * np.pi + 0.3 * e)], -1)
        for e in range(E)]).astype(np.float32)
    flow_ji = -flow_ij + rng.normal(0, 0.1, flow_ij.shape).astype(np.float32)
    dyn = (rng.random((N_IMGS, H, W)) < 0.25)
    init_depth = np.stack([2.0 + 0.4 * np.sin(xx / W * 4 + i)
                           for i in range(N_IMGS)]).astype(np.float32)
    return flow_ij, flow_ji, dyn, init_depth


def _inject_flow_ref(net, flow_ij, flow_ji, dyn, init_depth, weight):
    """Install the precomputed-flow buffers on the reference net exactly as
    its ctor would have (flow_(ij|ji): (E,2,H,W); dynamic_masks: list of
    (H,W) bool; init_depthmap: list of (H,W))."""
    net.flow_loss_weight = weight
    net.flow_ij = torch.from_numpy(
        flow_ij.transpose(0, 3, 1, 2).copy())
    net.flow_ji = torch.from_numpy(
        flow_ji.transpose(0, 3, 1, 2).copy())
    net.dynamic_masks = [torch.from_numpy(d.copy()) for d in dyn]
    net.init_depthmap = [torch.from_numpy(d.reshape(-1).copy())
                         for d in init_depth]


def _flow_scene(ref, seed, *, weight, thre, start_epoch, depth_reg=0.0):
    import dataclasses
    from align3r_tpu.alignment.scene import build_scene, default_masks

    out = _synthetic_scene(seed=seed)
    view1, view2, pred1, pred2 = _to_torch_views(out)
    flow_ij, flow_ji, dyn, init_depth = _synthetic_flow_inputs(seed + 100)

    torch.manual_seed(13)
    net = ref["flow_opt"].PointCloudOptimizer(
        view1, view2, pred1, pred2, shared_focal=True,
        temporal_smoothing_weight=0.01, translation_weight=0.1,
        flow_loss_weight=0.0,          # ctor path needs a RAFT ckpt; the
        depth_regularize_weight=depth_reg,  # buffers are injected below
        num_total_iter=NITER, flow_loss_start_epoch=start_epoch,
        flow_loss_thre=thre, verbose=False)
    _inject_flow_ref(net, flow_ij, flow_ji, dyn, init_depth, weight)

    cfg, data, params = build_scene(out, cfg_kw=dict(
        shared_focal=True, temporal_smoothing_weight=0.01,
        translation_weight=0.1, num_total_iter=NITER,
        flow_loss_weight=weight, flow_loss_start_epoch=start_epoch,
        flow_loss_thre=thre, depth_regularize_weight=depth_reg))
    data = dataclasses.replace(
        data,
        flow_ij=jnp.asarray(flow_ij), flow_ji=jnp.asarray(flow_ji),
        dynamic_masks=jnp.asarray(dyn.astype(np.float32)),
        init_depth=jnp.asarray(init_depth.reshape(N_IMGS, -1)))
    params = _copy_ref_init_to_params(net, params, shared_focal=True)
    masks = default_masks(cfg, params)
    return net, cfg, data, params, masks


def test_flow_term_gate_parity(ref):
    """Pointwise gate parity of the flow-loss TERM (r3 verdict Missing #2):
    identical params, four gate corners — before/after the start epoch,
    threshold off/huge/binding. NB the reference's flow_loss_flag
    (optimizer.py:46,542) is WRITE-ONLY — its gate is per-step, exactly
    like ours."""
    from align3r_tpu.alignment.flow import flow_forward

    for thre in (0.0, 1e6, 1e-3):
        net, cfg, data, params, _ = _flow_scene(
            ref, seed=7, weight=0.01, thre=thre, start_epoch=0.1)
        for epoch in (0, 29, 30, 150, NITER - 1):
            with torch.no_grad():
                l_ref = float(net(epoch=epoch))
            l_jax = float(flow_forward(params, data, cfg, epoch))
            assert abs(l_ref - l_jax) < 1e-4 * max(1.0, abs(l_ref)), \
                (thre, epoch, l_ref, l_jax)


def test_flow_term_solve_parity(ref):
    """300 reference-torch-Adam iters vs the JAX scan solve with the flow
    loss ACTIVE (thre=0 -> never gated once past the start epoch) plus the
    mask-weighted depth regulariser — the last solver terms that had never
    been run head-to-head against the reference (r3 verdict next #3)."""
    from align3r_tpu.alignment.scene import (
        global_alignment_loop, get_im_poses, get_focals, get_depthmaps_raw)
    from align3r_tpu.alignment.flow import flow_forward

    net, cfg, data, params, masks = _flow_scene(
        ref, seed=7, weight=0.01, thre=0.0, start_epoch=0.1, depth_reg=0.05)

    with torch.no_grad():
        l_ref0 = float(net(epoch=0))
    l_jax0 = float(flow_forward(params, data, cfg, 0))
    assert abs(l_ref0 - l_jax0) < 1e-5 * max(1.0, abs(l_ref0))

    ref_losses = _run_ref_loop(ref["flow_base"], net)
    params_out, jax_losses = global_alignment_loop(
        params, masks, data, cfg, lr=0.01, niter=NITER, schedule="cosine",
        lr_min=1e-6, loss_fn=flow_forward, precision="fp32")
    jax_losses = np.asarray(jax_losses)

    np.testing.assert_allclose(jax_losses[0], ref_losses[0], rtol=1e-5)
    # iter 50 straddles the flow-loss activation at iter 30
    np.testing.assert_allclose(jax_losses[50], ref_losses[50], rtol=1e-3)
    np.testing.assert_allclose(jax_losses[-1], ref_losses[-1], rtol=2e-3)

    with torch.no_grad():
        P_ref = net.get_im_poses().numpy()
        f_ref = net.get_focals().numpy().reshape(-1)
        d_ref = net.get_depthmaps(raw=True).numpy()
    P_jax = np.asarray(get_im_poses(params_out))
    f_jax = np.asarray(get_focals(params_out, cfg))
    d_jax = np.asarray(get_depthmaps_raw(params_out, data, cfg))
    assert _max_pose_err(P_ref, P_jax) < 5e-3, _max_pose_err(P_ref, P_jax)
    np.testing.assert_allclose(f_jax, f_ref, rtol=5e-3)
    np.testing.assert_allclose(d_jax, d_ref, rtol=5e-2, atol=5e-3)


def test_flow_gate_is_per_step_not_latched(ref):
    """The reference sets flow_loss_flag when gating (optimizer.py:542) but
    NEVER READS it — its gate is per-step. Probe: evaluate once with a
    binding threshold (flow gated, flag set True on the net), then loosen
    the threshold on the SAME net object and evaluate again: the flow term
    comes back, proving the flag is inert. Our stateless per-step gate must
    match both evaluations."""
    from align3r_tpu.alignment.flow import flow_forward
    import dataclasses

    net, cfg, data, params, _ = _flow_scene(
        ref, seed=7, weight=0.01, thre=1e-3, start_epoch=0.0)
    with torch.no_grad():
        l_ref_gated = float(net(epoch=NITER))        # fl >> 1e-3 -> gated
    assert bool(net.flow_loss_flag), "expected the reference flag to set"
    net.flow_loss_thre = 1e6                          # loosen on same net
    with torch.no_grad():
        l_ref_loose = float(net(epoch=NITER))         # latch would gate
    assert l_ref_loose > l_ref_gated + 1e-6, \
        "reference gate is latched?! (flag became load-bearing)"

    l_jax_gated = float(flow_forward(params, data, cfg, NITER))
    cfg_loose = dataclasses.replace(cfg, flow_loss_thre=1e6)
    l_jax_loose = float(flow_forward(params, data, cfg_loose, NITER))
    assert abs(l_ref_gated - l_jax_gated) < 1e-4 * max(1.0, abs(l_ref_gated))
    assert abs(l_ref_loose - l_jax_loose) < 1e-4 * max(1.0, abs(l_ref_loose))


def test_flow_solve_parity_with_binding_threshold(ref):
    """Short solve where the threshold BINDS at init (gate off, no flow
    gradient) — both stacks must agree on every step's gating decision for
    the curves to track."""
    from align3r_tpu.alignment.scene import global_alignment_loop
    from align3r_tpu.alignment.flow import flow_forward

    # raw flow-term magnitude at init (difference of weighted/unweighted)
    net, cfg, data, params, masks = _flow_scene(
        ref, seed=7, weight=0.01, thre=0.0, start_epoch=0.0)
    net2, _, _, _, _ = _flow_scene(
        ref, seed=7, weight=0.0, thre=0.0, start_epoch=0.0)
    with torch.no_grad():
        fl0 = (float(net(epoch=0)) - float(net2(epoch=0))) / 0.01

    net, cfg, data, params, masks = _flow_scene(
        ref, seed=7, weight=0.01, thre=0.8 * fl0, start_epoch=0.0)
    ref_losses = _run_ref_loop(ref["flow_base"], net, niter=120)
    _, jax_losses = global_alignment_loop(
        params, masks, data, cfg, lr=0.01, niter=120, schedule="cosine",
        lr_min=1e-6, loss_fn=flow_forward, precision="fp32")
    np.testing.assert_allclose(np.asarray(jax_losses), ref_losses, rtol=2e-3)
