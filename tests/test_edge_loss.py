"""Fused Pallas edge-residual kernel vs the reference XLA loss path.

The kernel (ops/edge_loss.py) must reproduce `pairwise_pts_loss`
(reference /root/reference/dust3r/cloud_opt/optimizer.py:223-241) exactly
when packed at fp32, including gradients through poses, depths, focals,
principal points and adaptors — and the full fused solve must recover the
same solution as the fp32 solve on a synthetic scene.

Runs in Pallas interpret mode on CPU (conftest forces the cpu platform).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from align3r_tpu.alignment.scene import (
    SceneConfig, build_scene, default_masks, global_alignment_loop,
    init_params, pack_scene, pairwise_pts_loss, _pairwise_pts_loss_fused,
)
from align3r_tpu.inference.pairs import make_pairs
from align3r_tpu.ops import edge_loss as el


def _synthetic_scene(n=4, H=16, W=24, seed=0, graph="complete", **cfg_kw):
    pairs = make_pairs(n, graph, symmetrize=True)
    E = len(pairs)
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    output = {
        "view1": {"idx": np.array([p[0] for p in pairs])},
        "view2": {"idx": np.array([p[1] for p in pairs])},
        "pred1": {"pts3d": jax.random.normal(ks[0], (E, H, W, 3)),
                  "conf": 1 + jax.random.uniform(ks[1], (E, H, W))},
        "pred2": {"pts3d_in_other_view": jax.random.normal(ks[2], (E, H, W, 3)),
                  "conf": 1 + jax.random.uniform(ks[3], (E, H, W))},
    }
    return build_scene(output, cfg_kw)


def test_pack_unpack_roundtrip():
    pts = jax.random.normal(jax.random.PRNGKey(0), (5, 200, 3))
    packed = el.pack_points(pts, la=16, dtype=jnp.float32)
    assert packed.shape == (5, 3, 16, 128)
    np.testing.assert_allclose(np.asarray(el.unpack_points(packed, 200)),
                               np.asarray(pts), rtol=0, atol=0)


def test_packed_pts3d_matches_pack_of_depth_to_pts3d():
    """depth_to_pts3d_packed (channel-major build, no relayout) must equal
    pack_points(depth_to_pts3d(...)) — incl. under mono scalemaps and
    per-image principal points."""
    from align3r_tpu.alignment.scene import (depth_to_pts3d,
                                             depth_to_pts3d_packed,
                                             _edge_meta, build_scene)
    cfg0, data0, params0 = _synthetic_scene()
    pairs = make_pairs(4, "complete", symmetrize=True)
    E, H, W = len(pairs), 16, 24
    ks = jax.random.split(jax.random.PRNGKey(5), 5)
    output = {
        "view1": {"idx": np.array([p[0] for p in pairs])},
        "view2": {"idx": np.array([p[1] for p in pairs])},
        "pred1": {"pts3d": jax.random.normal(ks[0], (E, H, W, 3)),
                  "conf": 1 + jax.random.uniform(ks[1], (E, H, W))},
        "pred2": {"pts3d_in_other_view": jax.random.normal(ks[2], (E, H, W, 3)),
                  "conf": 1 + jax.random.uniform(ks[3], (E, H, W))},
    }
    mono = 1 + jax.random.uniform(ks[4], (4, H * W))
    cfg1, data1, params1 = build_scene(output, mono_depths=mono)
    for cfg, data, params in ((cfg0, data0, params0),
                              (cfg1, data1, params1)):
        meta = _edge_meta(cfg)
        ref = el.pack_points(depth_to_pts3d(params, data, cfg), meta.la,
                             jnp.float32)
        got = depth_to_pts3d_packed(params, data, cfg, meta.la)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("impl", ["streamed", "fast"])
def test_pack_scene_impls_match_dense_oracle(impl):
    """Both pack implementations must equal the dense oracle
    (concat -> pack -> perm-gather -> valid-mask) bit-for-bit, for both the
    single-chunk and the image-chunked kernel. 'streamed' scans gather
    chunks (no full-scene fp32 transient — the r4 one-shot pack OOMed
    16 GB HBM at n=300 bench scale); 'fast' (the default) lane-packs in
    natural order and reorders with the Pallas row-permute kernel
    (gather-free; the streamed gathers ran at ~6-10 GB/s on TPU)."""
    from align3r_tpu.alignment.scene import _edge_meta
    for n, graph in ((4, "complete"), (300, "swin-1")):
        cfg, data, params = _synthetic_scene(n=n, H=8, W=16, graph=graph)
        meta = _edge_meta(cfg)
        assert (meta.nc > 0) == (n == 300), meta
        got = pack_scene(data, cfg, dtype=jnp.float32, impl=impl)
        E, A = data.ei.shape[0], data.grid.shape[0]
        pred = jnp.concatenate([data.pred_i, data.pred_j], axis=0)
        w = jnp.concatenate([data.weight_i, data.weight_j], axis=0) / (E * A)
        dense_p = el.pack_points(pred, meta.la, jnp.float32)
        dense_w = el.pack_scalars(w, meta.la, jnp.float32)
        perm = np.asarray(got.packed_perm)
        # dummy/pad slots: perm -> 0 with weight exactly 0
        valid = np.zeros(meta.e2, bool)
        if meta.nc:
            slots = np.full(meta.e2, -1, np.int64)
            # reconstruct validity: a slot is real iff its packed weight
            # row is nonzero OR it maps to a genuinely zero-weight term;
            # simpler: recompute the layout
            from align3r_tpu.alignment.scene import _chunk_layout
            idx_np = np.concatenate([np.asarray(data.ei, np.int64),
                                     np.asarray(data.ej, np.int64)])
            slots, perm2, _, _, _ = _chunk_layout(idx_np, meta)
            np.testing.assert_array_equal(perm, perm2)
            valid = slots >= 0
        else:
            valid[:2 * E] = True
        exp_p = np.asarray(dense_p)[perm]
        exp_w = (np.asarray(dense_w)[perm]
                 * valid[:, None, None].astype(np.float32))
        np.testing.assert_array_equal(np.asarray(got.packed_pred), exp_p)
        # weights carry one fp32 division; XLA jit and eager lower x/const
        # differently on CPU (~1e-7 rel), so exact-equality is for layout
        # (zeros stay exactly zero), values to fp32 division tolerance
        gw = np.asarray(got.packed_w)
        np.testing.assert_array_equal(gw == 0, exp_w == 0)
        np.testing.assert_allclose(gw, exp_w, rtol=3e-7, atol=0)


def test_fast_pack_bit_identical_to_streamed():
    """The gather-free pack must be BIT-identical to the streamed pack —
    including the dummy-slot convention (term-0 points, exactly-zero
    weight) — at both kernel scales and in both storage dtypes, so
    flipping the default can never move a solve trajectory."""
    for n, graph in ((4, "complete"), (300, "swin-1")):
        cfg, data, params = _synthetic_scene(n=n, H=8, W=16, graph=graph)
        for dt in (jnp.float32, jnp.bfloat16):
            a = pack_scene(data, cfg, dtype=dt, impl="streamed")
            b = pack_scene(data, cfg, dtype=dt, impl="fast")
            np.testing.assert_array_equal(np.asarray(a.packed_pred),
                                          np.asarray(b.packed_pred))
            np.testing.assert_array_equal(np.asarray(a.packed_w),
                                          np.asarray(b.packed_w))
            np.testing.assert_array_equal(np.asarray(a.packed_idx),
                                          np.asarray(b.packed_idx))
            np.testing.assert_array_equal(np.asarray(a.packed_perm),
                                          np.asarray(b.packed_perm))


def test_pack_impl_resolution():
    from align3r_tpu.alignment.scene import _resolve_pack_impl
    assert _resolve_pack_impl("auto") in ("fast", "streamed")
    assert _resolve_pack_impl("streamed") == "streamed"
    with pytest.raises(ValueError):
        _resolve_pack_impl("bogus")


def test_fused_loss_and_grads_match_fp32():
    cfg, data, params = _synthetic_scene()
    data_p = pack_scene(data, cfg, dtype=jnp.float32)
    ref = float(pairwise_pts_loss(params, data, cfg))
    fused = float(_pairwise_pts_loss_fused(params, data_p, cfg))
    assert abs(ref - fused) < 1e-5 * max(1.0, abs(ref))

    g_ref = jax.grad(pairwise_pts_loss)(params, data, cfg)
    g_f = jax.grad(_pairwise_pts_loss_fused)(params, data_p, cfg)
    for k in g_ref:
        a, b = np.asarray(g_ref[k]), np.asarray(g_f[k])
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=3e-6 * scale, err_msg=k)


def test_fused_loss_adaptors_and_mono():
    """Adaptors enabled + mono scalemap depth parameterisation."""
    pairs = make_pairs(3, "complete", symmetrize=True)
    E, H, W = len(pairs), 16, 24
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    output = {
        "view1": {"idx": np.array([p[0] for p in pairs])},
        "view2": {"idx": np.array([p[1] for p in pairs])},
        "pred1": {"pts3d": jax.random.normal(ks[0], (E, H, W, 3)),
                  "conf": 1 + jax.random.uniform(ks[1], (E, H, W))},
        "pred2": {"pts3d_in_other_view": jax.random.normal(ks[2], (E, H, W, 3)),
                  "conf": 1 + jax.random.uniform(ks[3], (E, H, W))},
    }
    mono = 1 + jax.random.uniform(ks[4], (3, H * W))
    cfg, data, params = build_scene(output, {"allow_pw_adaptors": True}, mono_depths=mono)
    params["pw_adaptors"] = 0.1 * jax.random.normal(jax.random.PRNGKey(9), (E, 2))
    data_p = pack_scene(data, cfg, dtype=jnp.float32)
    ref = float(pairwise_pts_loss(params, data, cfg))
    fused = float(_pairwise_pts_loss_fused(params, data_p, cfg))
    assert abs(ref - fused) < 1e-5 * max(1.0, abs(ref))
    g_ref = jax.grad(pairwise_pts_loss)(params, data, cfg)
    g_f = jax.grad(_pairwise_pts_loss_fused)(params, data_p, cfg)
    for k in ("scalemaps", "shifts", "pw_adaptors", "im_poses"):
        a, b = np.asarray(g_ref[k]), np.asarray(g_f[k])
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=3e-6 * scale, err_msg=k)


def test_fused_loss_bf16_pack_close():
    """bf16-packed observations with fp32 in-kernel compute stay close to
    the fp32 loss (input quantisation only)."""
    cfg, data, params = _synthetic_scene(seed=2)
    data_p = pack_scene(data, cfg, dtype=jnp.bfloat16)
    ref = float(pairwise_pts_loss(params, data, cfg))
    fused = float(_pairwise_pts_loss_fused(params, data_p, cfg))
    assert abs(ref - fused) / abs(ref) < 5e-3


def test_fused_padding_edges_and_area():
    """A not a multiple of 128*rb and 2E not a multiple of eb."""
    cfg, data, params = _synthetic_scene(n=3, H=10, W=13, graph="complete")
    assert (2 * cfg.n_edges) % 8 != 0 or (10 * 13) % 128 != 0
    data_p = pack_scene(data, cfg, dtype=jnp.float32)
    ref = float(pairwise_pts_loss(params, data, cfg))
    fused = float(_pairwise_pts_loss_fused(params, data_p, cfg))
    assert abs(ref - fused) < 1e-5 * max(1.0, abs(ref))
    g_ref = jax.grad(pairwise_pts_loss)(params, data, cfg)
    g_f = jax.grad(_pairwise_pts_loss_fused)(params, data_p, cfg)
    for k in g_ref:
        a, b = np.asarray(g_ref[k]), np.asarray(g_f[k])
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=3e-6 * scale, err_msg=k)


def test_fused_loss_vmaps_over_scenes():
    """The batched multi-scene path vmaps the fused kernel (pallas batching
    rule adds a scene grid dim); values and grads must match per-scene."""
    from align3r_tpu.alignment.batched import stack_scenes, stack_params
    scenes = [_synthetic_scene(n=3, H=12, W=16, seed=s) for s in (0, 1)]
    packed = [(c, pack_scene(d, c, dtype=jnp.float32), p) for c, d, p in scenes]
    cfg = packed[0][0]
    ds = stack_scenes([d for _, d, _ in packed])
    ps = stack_params([p for _, _, p in packed])
    v = jax.vmap(lambda p, d: _pairwise_pts_loss_fused(p, d, cfg))(ps, ds)
    g = jax.vmap(lambda p, d: jax.grad(_pairwise_pts_loss_fused)(p, d, cfg))(ps, ds)
    for s, (c, d, p) in enumerate(packed):
        ref = float(_pairwise_pts_loss_fused(p, d, c))
        assert abs(float(v[s]) - ref) < 1e-6 * max(1.0, abs(ref))
        g_ref = jax.grad(_pairwise_pts_loss_fused)(p, d, c)
        for k in g_ref:
            np.testing.assert_allclose(np.asarray(g[k])[s], np.asarray(g_ref[k]),
                                       atol=1e-6, err_msg=k)


def test_fused_fallback_large_scene():
    """Image count no longer disables the fused path (the chunked kernel
    covers it); only an edge count beyond the per-term pose-gradient
    accumulator's VMEM bound falls back to xla."""
    import dataclasses as dc
    from align3r_tpu.alignment.scene import resolve_fast_impl
    cfg, _, _ = _synthetic_scene(n=3, H=12, W=16)
    many_imgs = dc.replace(cfg, n_imgs=512, fast_impl="fused")
    assert resolve_fast_impl(many_imgs) == "fused"
    many_edges = dc.replace(cfg, n_edges=20000, fast_impl="fused")
    with pytest.warns(UserWarning, match="n_edges"):
        assert resolve_fast_impl(many_edges) == "xla"
    small = dc.replace(cfg, fast_impl="fused")
    assert resolve_fast_impl(small) == "fused"


@pytest.mark.slow
def test_fused_solve_matches_fp32_solution():
    """Short fused-fast solve reaches the same loss basin as pure fp32."""
    cfg, data, params = _synthetic_scene(n=3, H=12, W=16)
    masks = default_masks(cfg, params)
    niter = 60
    p_ref, l_ref = global_alignment_loop(params, masks, data, cfg,
                                         niter=niter, precision="fp32")
    fused_cfg = dataclasses.replace(cfg, fast_impl="fused")
    data_p = pack_scene(data, cfg, dtype=jnp.float32)
    p_f, l_f = global_alignment_loop(params, masks, data_p, fused_cfg,
                                     niter=niter, precision="mixed")
    final_ref = float(pairwise_pts_loss(p_ref, data, cfg))
    final_f = float(pairwise_pts_loss(p_f, data, cfg))
    assert abs(final_ref - final_f) < 5e-3 * max(1.0, abs(final_ref))


def test_fused_rb8_large_scene_matches_fp32():
    """Image-heavy scene (129 <= n <= 256) now stays on the fused path via
    rb=8 row blocks instead of silently losing it to the XLA fallback."""
    import dataclasses as dc
    from align3r_tpu.alignment.scene import resolve_fast_impl
    # sliding-window graph keeps E small while n is large
    cfg, data, params = _synthetic_scene(n=150, H=8, W=16, graph="swin-1")
    assert resolve_fast_impl(dc.replace(cfg, fast_impl="fused")) == "fused"
    rb, eb, nc = el.choose_blocks(cfg.n_imgs)
    assert rb == 8 and nc == 0, (rb, nc)
    data_p = pack_scene(data, cfg, dtype=jnp.float32)
    ref = float(pairwise_pts_loss(params, data, cfg))
    fused = float(_pairwise_pts_loss_fused(params, data_p, cfg))
    assert abs(ref - fused) < 1e-5 * max(1.0, abs(ref)), (ref, fused)
    g_ref = jax.grad(pairwise_pts_loss)(params, data, cfg)
    g_f = jax.grad(_pairwise_pts_loss_fused)(params, data_p, cfg)
    for k in ("im_poses", "im_focals", "pw_poses"):
        a, b = np.asarray(g_ref[k]), np.asarray(g_f[k])
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=3e-6 * scale, err_msg=k)


def test_fused_chunked_large_scene_matches_fp32():
    """n > 256 now runs the image-CHUNKED fused kernel (terms sorted by
    image, per-chunk eb-aligned tiles, resident blocks per chunk) instead
    of losing the fused path: loss and grads must match the plain fp32
    XLA path exactly."""
    import dataclasses as dc
    from align3r_tpu.alignment.scene import resolve_fast_impl, _edge_meta
    cfg, data, params = _synthetic_scene(n=300, H=8, W=16, graph="swin-1")
    assert resolve_fast_impl(dc.replace(cfg, fast_impl="fused")) == "fused"
    meta = _edge_meta(cfg)
    assert meta.nc and meta.n_chunks >= 2, meta
    data_p = pack_scene(data, cfg, dtype=jnp.float32)
    assert data_p.packed_chunk is not None
    # chunk ids per e-tile are monotone and first-flags mark each chunk once
    ch = np.asarray(data_p.packed_chunk)
    fi = np.asarray(data_p.packed_first)
    assert (np.diff(ch) >= 0).all()
    assert fi.sum() == meta.n_chunks and (fi[np.r_[True, np.diff(ch) > 0]] == 1).all()
    ref = float(pairwise_pts_loss(params, data, cfg))
    fused = float(_pairwise_pts_loss_fused(params, data_p, cfg))
    assert abs(ref - fused) < 1e-5 * max(1.0, abs(ref)), (ref, fused)
    g_ref = jax.grad(pairwise_pts_loss)(params, data, cfg)
    g_f = jax.grad(_pairwise_pts_loss_fused)(params, data_p, cfg)
    for k in g_ref:
        a, b = np.asarray(g_ref[k]), np.asarray(g_f[k])
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=3e-6 * scale, err_msg=k)


def test_fused_chunked_denser_graph_and_bf16():
    """Chunked kernel on a denser graph + bf16 packing stays close to fp32
    (input quantisation only)."""
    cfg, data, params = _synthetic_scene(n=280, H=8, W=16, graph="swin-2")
    data_p = pack_scene(data, cfg, dtype=jnp.bfloat16)
    ref = float(pairwise_pts_loss(params, data, cfg))
    fused = float(_pairwise_pts_loss_fused(params, data_p, cfg))
    assert abs(ref - fused) / max(abs(ref), 1e-6) < 5e-3, (ref, fused)


def test_fused_chunked_solve_loop():
    """The full mixed-precision solve loop (lax.scan over the chunked
    kernel, then the fp32-repack polish phase) runs end to end on an
    n>256 scene and reduces the loss."""
    import dataclasses as dc
    cfg, data, params = _synthetic_scene(n=272, H=8, W=16, graph="swin-1")
    fused_cfg = dc.replace(cfg, fast_impl="fused")
    data_p = pack_scene(data, cfg, dtype=jnp.bfloat16)
    masks = default_masks(cfg, params)
    p, losses = global_alignment_loop(params, masks, data_p, fused_cfg,
                                      niter=5, precision="mixed")
    losses = np.asarray(losses)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_fused_chunked_vmaps_over_scenes():
    """batched.py's vmap over stacked scenes must also work when the
    scenes pack CHUNKED (pallas batching rule + scalar-prefetched index
    maps): per-scene values and grads match the unbatched kernel."""
    from align3r_tpu.alignment.batched import stack_scenes, stack_params
    scenes = [_synthetic_scene(n=300, H=8, W=16, seed=s, graph="swin-1")
              for s in (0, 1)]
    cfg = scenes[0][0]
    packed = [(c, pack_scene(d, c, dtype=jnp.float32), p)
              for c, d, p in scenes]
    ds = stack_scenes([d for _, d, _ in packed])
    ps = stack_params([p for _, _, p in packed])
    v = jax.vmap(lambda p, d: _pairwise_pts_loss_fused(p, d, cfg))(ps, ds)
    for s, (c, d, p) in enumerate(packed):
        ref = float(_pairwise_pts_loss_fused(p, d, c))
        assert abs(float(v[s]) - ref) < 1e-6 * max(1.0, abs(ref))
    g = jax.vmap(lambda p, d: jax.grad(_pairwise_pts_loss_fused)(p, d, cfg))(ps, ds)
    g0 = jax.grad(_pairwise_pts_loss_fused)(packed[0][2], packed[0][1], cfg)
    np.testing.assert_allclose(np.asarray(g["im_poses"])[0],
                               np.asarray(g0["im_poses"]), atol=1e-6)
