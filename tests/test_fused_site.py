"""Fused qkv+RoPE+attention+proj Pallas site == existing XLA site math.

Oracle: blocks.apply_attention / apply_cross_attention (themselves oracle-
tested against the torch reference in test_rope_blocks.py). The fused site
(ops/fused_site.py) must match in fp32 to near-machine precision and in
bf16 to rounding tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from align3r_tpu.models import blocks as B
from align3r_tpu.models import nn
from align3r_tpu.models.rope import make_grid_positions
from align3r_tpu.ops.fused_site import attention_site, supported

G, Bb, H, D = 2, 3, 4, 16
C = H * D
GH, GW = 4, 8
N = GH * GW


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (G, Bb, N, C))
    y = jax.random.normal(ks[1], (G, Bb, N, C))
    attn = [B.init_attention(k, C) for k in jax.random.split(ks[2], G)]
    cross = [B.init_cross_attention(k, C) for k in jax.random.split(ks[3], G)]
    pos = make_grid_positions(GH, GW)
    return x, y, attn, cross, pos


def _stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _self_args(attn):
    p = _stack(attn)
    qkv_k, qkv_b = p["qkv"]["kernel"], p["qkv"]["bias"]
    wq, wk, wv = (qkv_k[:, :, i * C:(i + 1) * C] for i in range(3))
    bq, bk, bv = (qkv_b[:, i * C:(i + 1) * C] for i in range(3))
    return wq, wk, wv, p["proj"]["kernel"], bq, bk, bv, p["proj"]["bias"]


def _cross_args(cross):
    p = _stack(cross)
    z = jnp.zeros((G, C), p["projq"]["kernel"].dtype)
    return (p["projq"]["kernel"], p["projk"]["kernel"], p["projv"]["kernel"],
            p["proj"]["kernel"], p["projq"].get("bias", z),
            p["projk"].get("bias", z), p["projv"].get("bias", z),
            p["proj"]["bias"])


def test_supported(setup):
    x, *_ = setup
    assert supported(x, H)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5), (jnp.bfloat16, 0.08)])
def test_self_site_matches_xla(setup, dtype, tol):
    x, _, attn, _, pos = setup
    xd = x.astype(dtype)
    posb = jnp.broadcast_to(pos[None], (Bb, N, 2))
    ref = jnp.stack([
        B.apply_attention(attn[g], xd[g], posb, H, rope_base=100.0,
                          attn_impl="xla")
        for g in range(G)])
    out = attention_site(xd, xd, *_self_args(attn), pos, H, rope_base=100.0)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=tol, rtol=tol)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5), (jnp.bfloat16, 0.08)])
def test_cross_site_matches_xla(setup, dtype, tol):
    x, y, _, cross, pos = setup
    xd, yd = x.astype(dtype), y.astype(dtype)
    posb = jnp.broadcast_to(pos[None], (Bb, N, 2))
    ref = jnp.stack([
        B.apply_cross_attention(cross[g], xd[g], yd[g], yd[g], posb, posb, H,
                                rope_base=100.0, attn_impl="xla")
        for g in range(G)])
    wq, wk, wv, wo, bq, bk, bv, bo = _cross_args(cross)
    out = attention_site(xd, yd, wq, wk, wv, wo, bq, bk, bv, bo, pos, H,
                         rope_base=100.0)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=tol, rtol=tol)


@pytest.mark.parametrize("hg", [2, 4])
def test_head_group_matches_per_head(setup, hg):
    """head_group>1 (batched multi-head logits/softmax/pv, the r4 decode
    scheduling experiment) must be numerically identical to the per-head
    schedule — same op set, same fp32 accumulation, only issue order
    differs."""
    x, y, attn, cross, pos = setup
    ref = attention_site(x, x, *_self_args(attn), pos, H, rope_base=100.0)
    out = attention_site(x, x, *_self_args(attn), pos, H, rope_base=100.0,
                         head_group=hg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    wq, wk, wv, wo, bq, bk, bv, bo = _cross_args(cross)
    refc = attention_site(x, y, wq, wk, wv, wo, bq, bk, bv, bo, pos, H,
                          rope_base=100.0)
    outc = attention_site(x, y, wq, wk, wv, wo, bq, bk, bv, bo, pos, H,
                          rope_base=100.0, head_group=hg)
    np.testing.assert_array_equal(np.asarray(outc), np.asarray(refc))


def test_decode_pair_fused_matches_auto():
    """Whole stacked decoder with attn_impl='fused' vs the default path."""
    from align3r_tpu.models.config import Align3RConfig
    from align3r_tpu.models.align3r import (init_align3r, encode_images,
                                            embed_point_cloud, decode_pair)
    cfg = Align3RConfig(img_size=(32, 48), patch_size=16, enc_embed_dim=64,
                        enc_depth=2, enc_num_heads=2, dec_embed_dim=48,
                        dec_depth=8, dec_num_heads=2)
    params = init_align3r(jax.random.PRNGKey(0), cfg)
    Bi, Hh, Ww = 2, 32, 48
    img = jax.random.normal(jax.random.PRNGKey(1), (2 * Bi, Hh, Ww, 3))
    feats, pos = encode_images(params, img, cfg, dtype=jnp.float32)
    pc = jax.random.normal(jax.random.PRNGKey(2), (2 * Bi, Hh, Ww, 3))
    pct, pcp = embed_point_cloud(params, pc, cfg, dtype=jnp.float32)
    args = (feats[:Bi], pos[:Bi], feats[Bi:], pos[Bi:], pct, pcp)
    h1a, h2a = decode_pair(params, *args, cfg, dtype=jnp.float32,
                           attn_impl="xla")
    h1b, h2b = decode_pair(params, *args, cfg, dtype=jnp.float32,
                           attn_impl="fused")
    for a, b in zip(h1a + h2a, h1b + h2b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


def test_fused_gradients_match_xla():
    """Gradients through decode_pair(attn_impl='fused') — the custom-VJP
    diff wrappers (kernel forward, XLA-recompute backward) — must match the
    plain XLA path's gradients in fp32."""
    from align3r_tpu.models.config import Align3RConfig
    from align3r_tpu.models.align3r import (init_align3r, encode_images,
                                            embed_point_cloud, decode_pair)
    cfg = Align3RConfig(img_size=(32, 48), patch_size=16, enc_embed_dim=64,
                        enc_depth=2, enc_num_heads=2, dec_embed_dim=48,
                        dec_depth=6, dec_num_heads=2)
    params = init_align3r(jax.random.PRNGKey(0), cfg)
    Bi, Hh, Ww = 1, 32, 48
    img = jax.random.normal(jax.random.PRNGKey(1), (2 * Bi, Hh, Ww, 3))
    feats, pos = encode_images(params, img, cfg, dtype=jnp.float32)
    pc = jax.random.normal(jax.random.PRNGKey(2), (2 * Bi, Hh, Ww, 3))
    pct, pcp = embed_point_cloud(params, pc, cfg, dtype=jnp.float32)
    args = (feats[:Bi], pos[:Bi], feats[Bi:], pos[Bi:], pct, pcp)

    def loss(params, impl):
        h1, h2 = decode_pair(params, *args, cfg, dtype=jnp.float32,
                             attn_impl=impl)
        return sum(jnp.sum(h * h) for h in h1 + h2)

    g_x = jax.grad(lambda p: loss(p, "xla"))(params)
    g_f = jax.grad(lambda p: loss(p, "fused"))(params)
    flat_x = jax.tree.leaves(g_x)
    flat_f = jax.tree.leaves(g_f)
    for a, b in zip(flat_x, flat_f):
        scale = max(float(jnp.abs(a).max()), 1.0)
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale, atol=2e-5)


def test_no_rope(setup):
    x, _, attn, _, pos = setup
    posb = jnp.broadcast_to(pos[None], (Bb, N, 2))
    ref = jnp.stack([
        B.apply_attention(attn[g], x[g], posb, H, rope_base=None,
                          attn_impl="xla")
        for g in range(G)])
    wq, wk, wv, wo, bq, bk, bv, bo = _self_args(attn)
    out = attention_site(x, x, wq, wk, wv, wo, bq, bk, bv, bo, pos, H,
                         rope_base=None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_mlp_fblocked_matches_whole():
    """The F-blocked MLP site (streamed weight blocks + fp32 accumulator)
    must match the whole-F kernel and the XLA twin exactly in fp32."""
    from align3r_tpu.ops import fused_site as fs
    key = jax.random.PRNGKey(9)
    G, Bz, N, C, F = 2, 2, 32, 128, 512
    x = jax.random.normal(key, (G, Bz, N, C))
    w1 = jax.random.normal(jax.random.fold_in(key, 1), (G, C, F)) * 0.05
    b1 = jax.random.normal(jax.random.fold_in(key, 2), (G, F)) * 0.1
    w2 = jax.random.normal(jax.random.fold_in(key, 3), (G, F, C)) * 0.05
    b2 = jax.random.normal(jax.random.fold_in(key, 4), (G, C)) * 0.1
    ln = (jnp.ones((G, C)), jnp.zeros((G, C)))
    lnp = jnp.stack(ln, axis=1).astype(jnp.float32)

    whole = fs._mlp_call(x, w1, b1.astype(jnp.float32)[:, None, :], w2,
                         b2.astype(jnp.float32)[:, None, :], lnp,
                         True, True, True)
    for nf in (2, 4):
        blocked = fs._mlp_call_fblocked(
            x, w1, b1.astype(jnp.float32)[:, None, :], w2,
            b2.astype(jnp.float32)[:, None, :], lnp, True, True, True, nf)
        np.testing.assert_allclose(np.asarray(blocked), np.asarray(whole),
                                   atol=1e-5, rtol=1e-5)
    xla = fs._mlp_xla(x, w1, b1, w2, b2, lnp, True, True)
    np.testing.assert_allclose(np.asarray(whole), np.asarray(xla),
                               atol=1e-4, rtol=1e-4)


def test_mlp_fblocks_selection():
    """ViT-L encoder shapes must now pass the gate via F-blocking."""
    from align3r_tpu.ops.fused_site import mlp_fblocks, mlp_supported
    x_enc = jnp.zeros((1, 1, 576, 1024), jnp.bfloat16)
    assert mlp_supported(x_enc, 4096)
    assert mlp_fblocks(x_enc, 4096) >= 2
    x_dec = jnp.zeros((2, 8, 576, 768), jnp.bfloat16)
    assert mlp_fblocks(x_dec, 3072) == 1  # decoder still whole-F


def test_mlp_site_fblocked_via_public_api_and_grads():
    """mlp_site routes through the blocked kernel when the gate demands it,
    and mlp_site_diff gradients still match the XLA path."""
    from align3r_tpu.ops import fused_site as fs
    key = jax.random.PRNGKey(10)
    G, Bz, N, C, F = 1, 1, 32, 128, 512
    x = jax.random.normal(key, (G, Bz, N, C))
    w1 = jax.random.normal(jax.random.fold_in(key, 1), (G, C, F)) * 0.05
    b1 = jnp.zeros((G, F))
    w2 = jax.random.normal(jax.random.fold_in(key, 3), (G, F, C)) * 0.05
    b2 = jnp.zeros((G, C))
    old_gate = fs._MLP_VMEM_GATE
    fs._MLP_VMEM_GATE = fs._mlp_working_set(N, C, F, 1) - 1  # force nf>=2
    try:
        assert fs.mlp_fblocks(x, F) >= 2
        got = fs.mlp_site(x, w1, b1, w2, b2, residual=True, interpret=True)
        ref = fs._mlp_xla(x, w1, b1, w2, b2,
                          jnp.zeros((G, 2, C), jnp.float32), False, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)

        def loss_f(w1, w2):
            return jnp.sum(fs.mlp_site_diff(x, w1, b1, w2, b2,
                                            residual=True) ** 2)

        def loss_x(w1, w2):
            return jnp.sum(fs._mlp_xla(x, w1, b1, w2, b2,
                                       jnp.zeros((G, 2, C), jnp.float32),
                                       False, True) ** 2)

        g1f, g2f = jax.grad(loss_f, argnums=(0, 1))(w1, w2)
        g1x, g2x = jax.grad(loss_x, argnums=(0, 1))(w1, w2)
        np.testing.assert_allclose(np.asarray(g1f), np.asarray(g1x),
                                   atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(g2f), np.asarray(g2x),
                                   atol=1e-3, rtol=1e-3)
    finally:
        fs._MLP_VMEM_GATE = old_gate
