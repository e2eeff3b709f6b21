import numpy as np
import jax
import jax.numpy as jnp

from align3r_tpu.inference.pairs import make_pairs, filter_pairs_seq, hierarchical_pairs
from align3r_tpu.inference.engine import inference
from align3r_tpu.models.config import TINY_TEST
from align3r_tpu.models.align3r import init_align3r, apply_align3r


def test_make_pairs_complete():
    p = make_pairs(4, "complete", symmetrize=False)
    assert p == [(1, 0), (2, 0), (2, 1), (3, 0), (3, 1), (3, 2)]
    ps = make_pairs(4, "complete", symmetrize=True)
    assert len(ps) == 12 and (0, 1) in ps


def test_make_pairs_swinstride():
    # swinstride-5 noncyclic: offsets 1,3,5,7,9 within bounds
    p = make_pairs(12, "swinstride-5-noncyclic", symmetrize=False)
    for (i, j) in p:
        assert i < j and (j - i) in (1, 3, 5, 7, 9)
    assert (0, 1) in p and (0, 9) in p and (0, 11) not in p
    # cyclic wraps around
    pc = make_pairs(12, "swinstride-5", symmetrize=False)
    assert any(abs(i - j) > 9 for i, j in pc)  # wrapped edges exist


def test_make_pairs_logwin_oneref():
    p = make_pairs(10, "logwin-3-noncyclic", symmetrize=False)
    for (i, j) in p:
        assert (j - i) in (1, 2, 4)
    p1 = make_pairs(5, "oneref-2", symmetrize=False)
    assert p1 == [(2, 0), (2, 1), (2, 3), (2, 4)]


def test_filter_pairs_seq():
    p = [(0, 1), (0, 5), (2, 3)]
    assert filter_pairs_seq(p, 2) == [(0, 1), (2, 3)]
    # cyclic distance: (0,5) with n=6 has cyclic distance 1
    assert filter_pairs_seq(p, 1, cyclic=True) == [(0, 1), (0, 5), (2, 3)]


def test_hierarchical_pairs():
    keyframes, key_edges, clips = hierarchical_pairs(25, clip_size=10)
    assert keyframes == [0, 10, 20]
    assert (10, 0) in key_edges or (0, 10) in [tuple(sorted(e)) for e in key_edges]
    assert clips[0] == list(range(0, 11))
    assert clips[1] == list(range(10, 21))
    assert clips[2] == list(range(20, 25))


def test_inference_engine_matches_direct_forward():
    """Engine output for an edge must equal the plain two-view forward
    (shared unique-image encoding is exact, not an approximation)."""
    cfg = TINY_TEST
    params = init_align3r(jax.random.PRNGKey(0), cfg)
    n, H, W = 4, 32, 48
    key = jax.random.PRNGKey(1)
    imgs = jax.random.normal(key, (n, H, W, 3))
    priors = jax.random.uniform(jax.random.PRNGKey(2), (n, H, W, 3))

    pairs = make_pairs(n, "swin-1-noncyclic", symmetrize=True)
    out = inference(pairs, params, cfg, imgs, priors, batch_size=4,
                    dtype=jnp.float32, head_dtype=jnp.float32)

    E = len(pairs)
    assert out["pred1"]["pts3d"].shape == (E, H, W, 3)
    assert out["pred2"]["pts3d_in_other_view"].shape == (E, H, W, 3)
    assert out["pred1"]["conf"].shape == (E, H, W)

    # compare edge (i, j) against the direct forward
    k = pairs.index((1, 0))
    v1 = {"img": imgs[1:2], "pred_depth": priors[1:2]}
    v2 = {"img": imgs[0:1], "pred_depth": priors[0:1]}
    r1, r2 = apply_align3r(params, v1, v2, cfg, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out["pred1"]["pts3d"][k]),
                               np.asarray(r1["pts3d"][0]), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["pred2"]["conf"][k]),
                               np.asarray(r2["conf"][0]), atol=2e-4, rtol=1e-3)


def test_inference_engine_padding_last_batch():
    cfg = TINY_TEST
    params = init_align3r(jax.random.PRNGKey(0), cfg)
    n, H, W = 3, 32, 32
    imgs = jax.random.normal(jax.random.PRNGKey(3), (n, H, W, 3))
    priors = jax.random.uniform(jax.random.PRNGKey(4), (n, H, W, 3))
    pairs = make_pairs(n, "complete", symmetrize=False)  # 3 edges, batch 2 -> pad
    out = inference(pairs, params, cfg, imgs, priors, batch_size=2, dtype=jnp.float32)
    assert out["pred1"]["pts3d"].shape[0] == 3
    assert np.isfinite(np.asarray(out["pred1"]["pts3d"])).all()


def test_engine_retraces_on_head_group_flip():
    """head_group is a trace-time module default inside the fused sites,
    invisible to jax.jit's cache keys; the engine passes it as a static
    discriminator so a flipped knob RETRACES instead of silently re-running
    a stale executable (the r4 tune_engine sweep bug). Numerics must be
    invariant (the knob only reschedules the kernel)."""
    from align3r_tpu.inference.engine import _decode_all_jit, _encode_all_jit
    from align3r_tpu.ops import fused_site as fs
    cfg = TINY_TEST
    params = init_align3r(jax.random.PRNGKey(0), cfg)
    n, H, W = 3, 32, 32
    imgs = jax.random.normal(jax.random.PRNGKey(3), (n, H, W, 3))
    priors = jax.random.uniform(jax.random.PRNGKey(4), (n, H, W, 3))
    pairs = make_pairs(n, "complete", symmetrize=False)

    old = fs._DEFAULT_HEAD_GROUP
    try:
        fs._DEFAULT_HEAD_GROUP = 1
        out1 = inference(pairs, params, cfg, imgs, priors, batch_size=2,
                         dtype=jnp.float32)
        # 3 edges at bs=2 -> a 2-batch tail SCAN (_decode_all_jit)
        n0 = (_decode_all_jit._cache_size(), _encode_all_jit._cache_size())
        fs._DEFAULT_HEAD_GROUP = 2
        out2 = inference(pairs, params, cfg, imgs, priors, batch_size=2,
                         dtype=jnp.float32)
        n1 = (_decode_all_jit._cache_size(), _encode_all_jit._cache_size())
    finally:
        fs._DEFAULT_HEAD_GROUP = old
    assert n1[0] > n0[0] and n1[1] > n0[1], (n0, n1)
    np.testing.assert_array_equal(np.asarray(out1["pred1"]["pts3d"]),
                                  np.asarray(out2["pred1"]["pts3d"]))


def test_engine_scan_chunk_path_matches_per_batch():
    """With >= 8 batches the engine runs full groups through the one-scan
    decode dispatch; results must equal the per-batch path (same program,
    different batching)."""
    cfg = TINY_TEST
    params = init_align3r(jax.random.PRNGKey(0), cfg)
    n, H, W = 5, 32, 48
    imgs = jax.random.normal(jax.random.PRNGKey(11), (n, H, W, 3))
    priors = jax.random.uniform(jax.random.PRNGKey(12), (n, H, W, 3))
    pairs = make_pairs(n, "complete", symmetrize=False)  # 10 edges
    a = inference(pairs, params, cfg, imgs, priors, batch_size=1,
                  dtype=jnp.float32, head_dtype=jnp.float32)  # scan(8)+2 tail
    b = inference(pairs, params, cfg, imgs, priors, batch_size=16,
                  dtype=jnp.float32, head_dtype=jnp.float32)  # 1 tail batch
    np.testing.assert_allclose(np.asarray(a["pred1"]["pts3d"]),
                               np.asarray(b["pred1"]["pts3d"]),
                               atol=2e-4, rtol=1e-3)


def test_engine_fused_attn_matches_default():
    """attn_impl='fused' (Pallas site kernels) through the engine equals the
    default path in fp32."""
    cfg = TINY_TEST
    params = init_align3r(jax.random.PRNGKey(0), cfg)
    n, H, W = 3, 32, 48
    imgs = jax.random.normal(jax.random.PRNGKey(5), (n, H, W, 3))
    priors = jax.random.uniform(jax.random.PRNGKey(6), (n, H, W, 3))
    pairs = make_pairs(n, "complete", symmetrize=False)
    a = inference(pairs, params, cfg, imgs, priors, batch_size=3,
                  dtype=jnp.float32, head_dtype=jnp.float32)
    b = inference(pairs, params, cfg, imgs, priors, batch_size=3,
                  dtype=jnp.float32, head_dtype=jnp.float32,
                  attn_impl="fused")
    np.testing.assert_allclose(np.asarray(a["pred1"]["pts3d"]),
                               np.asarray(b["pred1"]["pts3d"]),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(a["pred2"]["conf"]),
                               np.asarray(b["pred2"]["conf"]),
                               atol=5e-4, rtol=1e-3)


def test_engine_fused_encoder_matches_default():
    """encode_attn_impl='fused' (encoder attention via the Pallas site)
    equals the default encoder path in fp32."""
    cfg = TINY_TEST
    params = init_align3r(jax.random.PRNGKey(0), cfg)
    n, H, W = 3, 32, 48
    imgs = jax.random.normal(jax.random.PRNGKey(9), (n, H, W, 3))
    priors = jax.random.uniform(jax.random.PRNGKey(10), (n, H, W, 3))
    pairs = make_pairs(n, "complete", symmetrize=False)
    a = inference(pairs, params, cfg, imgs, priors, batch_size=3,
                  dtype=jnp.float32, head_dtype=jnp.float32)
    b = inference(pairs, params, cfg, imgs, priors, batch_size=3,
                  dtype=jnp.float32, head_dtype=jnp.float32,
                  encode_attn_impl="fused")
    np.testing.assert_allclose(np.asarray(a["pred1"]["pts3d"]),
                               np.asarray(b["pred1"]["pts3d"]),
                               atol=5e-4, rtol=1e-3)


def test_engine_stacked_heads_match():
    """stacked_heads=True (one vmapped grouped-conv program for both DPT
    heads) must be numerically identical to the two-call path."""
    cfg = TINY_TEST
    params = init_align3r(jax.random.PRNGKey(0), cfg)
    n, H, W = 3, 32, 48
    imgs = jax.random.normal(jax.random.PRNGKey(7), (n, H, W, 3))
    priors = jax.random.uniform(jax.random.PRNGKey(8), (n, H, W, 3))
    pairs = make_pairs(n, "complete", symmetrize=False)
    a = inference(pairs, params, cfg, imgs, priors, batch_size=3,
                  dtype=jnp.float32, head_dtype=jnp.float32)
    b = inference(pairs, params, cfg, imgs, priors, batch_size=3,
                  dtype=jnp.float32, head_dtype=jnp.float32,
                  stacked_heads=True)
    np.testing.assert_allclose(np.asarray(a["pred1"]["pts3d"]),
                               np.asarray(b["pred1"]["pts3d"]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a["pred2"]["conf"]),
                               np.asarray(b["pred2"]["conf"]),
                               atol=1e-5, rtol=1e-5)


def test_bf16_head_option_close_to_fp32():
    """head_dtype=bf16 fast path stays close to the fp32 default."""
    import jax
    import jax.numpy as jnp
    from align3r_tpu.models.config import TINY_TEST
    from align3r_tpu.models.align3r import init_align3r
    from align3r_tpu.inference.engine import inference as engine_inference
    params = init_align3r(jax.random.PRNGKey(0), TINY_TEST)
    rng = np.random.default_rng(0)
    H, W = TINY_TEST.img_size
    imgs = jnp.asarray(rng.standard_normal((3, H, W, 3)), jnp.float32) * 0.2
    priors = jnp.asarray(rng.uniform(0, 1, (3, H, W, 3)), jnp.float32)
    pairs = [(0, 1), (1, 2)]
    o32 = engine_inference(pairs, params, TINY_TEST, imgs, priors,
                           batch_size=2, head_dtype=jnp.float32)
    o16 = engine_inference(pairs, params, TINY_TEST, imgs, priors,
                           batch_size=2, head_dtype=jnp.bfloat16)
    a = np.asarray(o32["pred1"]["pts3d"])
    b = np.asarray(o16["pred1"]["pts3d"])
    rel = np.abs(a - b) / (np.abs(a) + 1e-3)
    assert np.median(rel) < 0.02
    assert np.isfinite(b).all()


def test_engine_pipeline_heads_match_xla():
    """head_conv_impl='pipeline' (fused Pallas DPT residual units + final
    trio, ops/dpt_pipeline.py) must match the XLA head through the full
    engine path (interpret mode on CPU)."""
    cfg = TINY_TEST
    params = init_align3r(jax.random.PRNGKey(0), cfg)
    n, H, W = 3, 32, 48
    imgs = jax.random.normal(jax.random.PRNGKey(7), (n, H, W, 3)) * 0.3
    priors = jax.random.uniform(jax.random.PRNGKey(8), (n, H, W, 3))
    pairs = [(0, 1), (1, 2)]
    a = inference(pairs, params, cfg, imgs, priors, batch_size=2,
                  dtype=jnp.float32, head_dtype=jnp.float32)
    b = inference(pairs, params, cfg, imgs, priors, batch_size=2,
                  dtype=jnp.float32, head_dtype=jnp.float32,
                  head_conv_impl="pipeline")
    np.testing.assert_allclose(np.asarray(a["pred1"]["pts3d"]),
                               np.asarray(b["pred1"]["pts3d"]),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(a["pred2"]["conf"]),
                               np.asarray(b["pred2"]["conf"]),
                               atol=1e-4, rtol=1e-3)


def test_inference_dp_sharded_matches_unsharded():
    """mesh= runs encode/decode dp-sharded via shard_map (each shard runs
    its kernels on its slice of images / pairs); outputs must match the
    single-device engine bit-for-fp32-tolerance."""
    from align3r_tpu.parallel.mesh import make_mesh
    cfg = TINY_TEST
    params = init_align3r(jax.random.PRNGKey(0), cfg)
    n, H, W = 5, 32, 48
    imgs = jax.random.normal(jax.random.PRNGKey(1), (n, H, W, 3))
    priors = jax.random.uniform(jax.random.PRNGKey(2), (n, H, W, 3))
    pairs = make_pairs(n, "complete", symmetrize=True)   # 20 edges
    kw = dict(batch_size=8, encode_chunk=8, dtype=jnp.float32,
              head_dtype=jnp.float32)
    ref = inference(pairs, params, cfg, imgs, priors, **kw)
    mesh = make_mesh(n_data=8)
    out = inference(pairs, params, cfg, imgs, priors, mesh=mesh, **kw)
    for side, key in (("pred1", "pts3d"), ("pred2", "pts3d_in_other_view"),
                      ("pred1", "conf"), ("pred2", "conf")):
        np.testing.assert_allclose(np.asarray(out[side][key]),
                                   np.asarray(ref[side][key]),
                                   atol=1e-5, rtol=1e-5, err_msg=f"{side}.{key}")

    import pytest as _pytest
    with _pytest.raises(ValueError):
        inference(pairs, params, cfg, imgs, priors, mesh=mesh,
                  batch_size=6, dtype=jnp.float32)


def test_inference_tp_sharded_matches_unsharded():
    """A 2-D ('data','model') mesh runs the engine tensor-parallel (qkv/fc1
    column-, proj/fc2 row-sharded over 'model' via GSPMD; XLA attention
    path) — outputs must match the single-device engine."""
    from align3r_tpu.parallel.mesh import make_mesh
    cfg = TINY_TEST
    params = init_align3r(jax.random.PRNGKey(0), cfg)
    n, H, W = 5, 32, 48
    imgs = jax.random.normal(jax.random.PRNGKey(1), (n, H, W, 3))
    priors = jax.random.uniform(jax.random.PRNGKey(2), (n, H, W, 3))
    pairs = make_pairs(n, "complete", symmetrize=True)   # 20 edges
    kw = dict(batch_size=4, encode_chunk=4, dtype=jnp.float32,
              head_dtype=jnp.float32, attn_impl="xla",
              encode_attn_impl="xla")
    ref = inference(pairs, params, cfg, imgs, priors, **kw)
    mesh = make_mesh(n_data=2, n_model=4)
    out = inference(pairs, params, cfg, imgs, priors, mesh=mesh, **kw)
    for side, key in (("pred1", "pts3d"), ("pred2", "pts3d_in_other_view"),
                      ("pred1", "conf"), ("pred2", "conf")):
        np.testing.assert_allclose(np.asarray(out[side][key]),
                                   np.asarray(ref[side][key]),
                                   atol=1e-4, rtol=1e-4,
                                   err_msg=f"{side}.{key}")

    import pytest as _pytest
    with _pytest.raises(ValueError, match="divide the head counts"):
        # TINY_TEST has 4 enc / 4 dec heads: model=8 cannot split them
        inference(pairs, params, cfg, imgs, priors,
                  mesh=make_mesh(n_data=1, n_model=8), **kw)


def test_inference_tp_guards_and_warns():
    """The tp guard must check BOTH head counts (a 'model' size dividing
    only the smaller one silently loses the head-aligned Megatron layout,
    ADVICE r4 #1), and an explicitly-requested fused attn_impl must warn
    when the tp path swaps in XLA attention (ADVICE r4 #4)."""
    import warnings
    import pytest
    from align3r_tpu.models.config import Align3RConfig
    from align3r_tpu.parallel.mesh import make_mesh

    # enc=4 heads, dec=2 heads: model=4 divides enc but NOT dec
    cfg = Align3RConfig(img_size=(32, 32), enc_embed_dim=64, enc_depth=2,
                        enc_num_heads=4, dec_embed_dim=32, dec_depth=12,
                        dec_num_heads=2)
    params = init_align3r(jax.random.PRNGKey(0), cfg)
    n, H, W = 3, 32, 32
    imgs = jax.random.normal(jax.random.PRNGKey(1), (n, H, W, 3))
    priors = jax.random.uniform(jax.random.PRNGKey(2), (n, H, W, 3))
    pairs = [(0, 1), (1, 2)]
    kw = dict(batch_size=2, encode_chunk=2, dtype=jnp.float32,
              head_dtype=jnp.float32)
    with pytest.raises(ValueError, match="divide the head counts"):
        inference(pairs, params, cfg, imgs, priors,
                  mesh=make_mesh(n_data=2, n_model=4), **kw)

    # model=2 divides both: runs, but an explicit fused request must warn
    with pytest.warns(UserWarning, match="XLA attention"):
        out = inference(pairs, params, cfg, imgs, priors,
                        mesh=make_mesh(n_data=2, n_model=2),
                        attn_impl="fused", **kw)
    assert np.isfinite(np.asarray(out["pred1"]["pts3d"])).all()
