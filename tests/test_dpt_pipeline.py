"""Fused DPT residual-unit Pallas kernel vs the XLA head implementation.

The kernel must reproduce dpt_head._residual_conv_unit / the conv-heavy
prefix of _fusion exactly (fp32) / to bf16 tolerance (bf16 storage), across
strip boundaries (halo DMA), image borders (SAME-pad re-establishment) and
batch. Reference semantics: croco/models/dpt_block.py:80-139, 144-229.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from align3r_tpu.models import nn
from align3r_tpu.models.dpt_head import _residual_conv_unit
from align3r_tpu.ops.dpt_pipeline import fused_res_unit, fused_fusion_pre


def _unit(key, C, scale=0.2):
    k1, k2 = jax.random.split(key)
    mk = lambda k: {
        "kernel": jax.random.normal(k, (3, 3, C, C)) * scale / np.sqrt(9 * C),
        "bias": jax.random.normal(jax.random.fold_in(k, 7), (C,)) * 0.1,
    }
    return {"conv1": mk(k1), "conv2": mk(k2)}


@pytest.mark.parametrize("B,H,W,C", [(2, 12, 16, 128), (1, 9, 16, 128),
                                     (2, 18, 32, 256)])
def test_res_unit_matches_xla_fp32(B, H, W, C):
    key = jax.random.PRNGKey(0)
    u = _unit(key, C)
    x = jax.random.normal(jax.random.fold_in(key, 1), (B, H, W, C))
    ref = _residual_conv_unit(u, x)
    got = fused_res_unit(x, u, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_res_unit_with_base_fp32():
    key = jax.random.PRNGKey(1)
    C = 128
    u = _unit(key, C)
    x = jax.random.normal(jax.random.fold_in(key, 1), (2, 12, 16, C))
    base = jax.random.normal(jax.random.fold_in(key, 2), (2, 12, 16, C))
    # base + full residual unit (the fusion block's x + res1(skip))
    ref = base + _residual_conv_unit(u, x)
    got = fused_res_unit(x, u, base=base, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("th", [4, 8, 12])
def test_strip_boundaries_exact(th):
    """FORCE multiple strips (th override) so the halo DMA, seam rows and
    out-of-image masking are actually exercised (auto _pick_th would choose
    TH=H at CPU test shapes and never split)."""
    key = jax.random.PRNGKey(2)
    C = 128
    H, W = 24, 16
    assert H % th == 0 and H // th > 1
    u = _unit(key, C)
    x = jax.random.normal(jax.random.fold_in(key, 3), (1, H, W, C))
    ref = _residual_conv_unit(u, x)
    got = fused_res_unit(x, u, interpret=True, th=th)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_res_unit_grads_match_xla_twin():
    """custom_vjp: primal runs the kernel; backward replays the XLA twin.
    Gradients must match jax.grad of the XLA implementation."""
    key = jax.random.PRNGKey(4)
    C = 128
    u = _unit(key, C)
    x = jax.random.normal(jax.random.fold_in(key, 1), (1, 8, 16, C))

    def loss_fused(u, x):
        return jnp.sum(fused_res_unit(x, u, interpret=True) ** 2)

    def loss_xla(u, x):
        return jnp.sum(_residual_conv_unit(u, x) ** 2)

    gu_f, gx_f = jax.grad(loss_fused, argnums=(0, 1))(u, x)
    gu_x, gx_x = jax.grad(loss_xla, argnums=(0, 1))(u, x)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_x),
                               atol=1e-4, rtol=1e-4)
    for cname in ("conv1", "conv2"):
        np.testing.assert_allclose(np.asarray(gu_f[cname]["kernel"]),
                                   np.asarray(gu_x[cname]["kernel"]),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gu_f[cname]["bias"]),
                                   np.asarray(gu_x[cname]["bias"]),
                                   atol=1e-4, rtol=1e-4)


def test_apply_dpt_head_pipeline_matches_xla():
    """Full head with conv_impl='pipeline' vs the XLA head (fp32).
    C=256 refinenets satisfy the kernel's lane constraint."""
    from align3r_tpu.models.dpt_head import init_dpt_head, apply_dpt_head
    key = jax.random.PRNGKey(5)
    nh, nw = 4, 8
    dims = [96, 48, 48, 48]
    p = init_dpt_head(key, dims, 4)
    # tame the exp postprocess under random init
    p["head_conv3"]["kernel"] = p["head_conv3"]["kernel"] * 0.01
    p["head_conv3"]["bias"] = p["head_conv3"]["bias"] * 0.01
    toks = [jax.random.normal(jax.random.fold_in(key, i), (2, nh * nw, c)) * 0.3
            for i, c in enumerate(dims)]
    kw = dict(grid_hw=(nh, nw), img_hw=(nh * 16, nw * 16),
              depth_mode=("exp", -np.inf, np.inf),
              conf_mode=("exp", 1.0, np.inf))
    ref = apply_dpt_head(p, toks, **kw)
    # on CPU the kernel auto-selects interpret mode
    got = apply_dpt_head(p, toks, conv_impl="pipeline", **kw)
    np.testing.assert_allclose(np.asarray(got["pts3d"]),
                               np.asarray(ref["pts3d"]), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got["conf"]),
                               np.asarray(ref["conf"]), atol=1e-4, rtol=1e-3)


def test_fusion_pre_matches_head_chain_bf16():
    """res2(x + res1(skip)) at bf16 storage — the real engine dtype."""
    key = jax.random.PRNGKey(3)
    C = 256
    B, H, W = 2, 18, 32
    r = {"res1": _unit(jax.random.fold_in(key, 1), C),
         "res2": _unit(jax.random.fold_in(key, 2), C)}
    x = jax.random.normal(jax.random.fold_in(key, 3), (B, H, W, C))
    skip = jax.random.normal(jax.random.fold_in(key, 4), (B, H, W, C))
    xb, sb = x.astype(jnp.bfloat16), skip.astype(jnp.bfloat16)

    def xla_chain(x, skip):
        t = x + _residual_conv_unit(r["res1"], skip)
        return _residual_conv_unit(r["res2"], t)

    ref = xla_chain(x, skip)  # fp32 reference
    got = fused_fusion_pre(xb, r, skip=sb, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               atol=0.15, rtol=0.1)
    # and bf16-vs-bf16 against the XLA chain at the same storage dtype
    ref_b = xla_chain(xb.astype(jnp.float32), sb.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref_b), atol=0.15, rtol=0.1)


# ------------------------------------------------- fused final head trio

def _conv_p(key, cin, cout, k=3, scale=0.15):
    return {"kernel": jax.random.normal(key, (k, k, cin, cout))
            * scale / np.sqrt(k * k * cin),
            "bias": jax.random.normal(jax.random.fold_in(key, 3),
                                      (cout,)) * 0.05}


def _xla_tail(x, p1, p2, p3):
    B, H, W, _ = x.shape
    h = nn.conv2d(p1, x)
    h = nn.bilinear_resize_mxu(h, H * 2, W * 2, align_corners=True)
    h = jax.nn.relu(nn.conv2d(p2, h))
    return nn.conv2d(p3, h.astype(jnp.float32))


@pytest.mark.parametrize("B,H,W", [(1, 8, 16), (2, 12, 8)])
def test_head_trio_matches_xla_fp32(B, H, W):
    from align3r_tpu.ops.dpt_pipeline import fused_head_final
    key = jax.random.PRNGKey(11)
    C1, C2, CO = 128, 128, 4
    p1 = _conv_p(jax.random.fold_in(key, 1), C1, C2)
    p2 = _conv_p(jax.random.fold_in(key, 2), C2, C2)
    p3 = _conv_p(jax.random.fold_in(key, 3), C2, CO, k=1)
    x = jax.random.normal(jax.random.fold_in(key, 4), (B, H, W, C1)) * 0.5
    ref = _xla_tail(x, p1, p2, p3)
    got = fused_head_final(x, p1, p2, p3, TH=8, interpret=True)
    assert got.shape == ref.shape and got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_head_trio_bf16_storage():
    from align3r_tpu.ops.dpt_pipeline import fused_head_final
    key = jax.random.PRNGKey(12)
    C1, C2, CO = 256, 128, 4
    p1 = _conv_p(jax.random.fold_in(key, 1), C1, C2)
    p2 = _conv_p(jax.random.fold_in(key, 2), C2, C2)
    p3 = _conv_p(jax.random.fold_in(key, 3), C2, CO, k=1)
    x = jax.random.normal(jax.random.fold_in(key, 4), (1, 16, 16, C1)) * 0.5
    ref = _xla_tail(x.astype(jnp.bfloat16), p1, p2, p3)  # bf16 XLA tail
    got = fused_head_final(x.astype(jnp.bfloat16), p1, p2, p3, TH=16,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref, np.float32),
                               atol=0.05, rtol=0.05)


def test_head_trio_strip_count_and_bands():
    """Band construction: several strip sizes over a non-tiny H."""
    from align3r_tpu.ops.dpt_pipeline import _head_trio_prep
    for Hin, TH in [(144, 16), (72, 16), (36, 8), (8, 4)]:
        bands, ah, KH = _head_trio_prep(Hin, TH)
        SH = 2 * Hin // TH
        assert ah.shape == (SH, TH + 2, KH)
        assert int(bands.max()) + KH <= Hin
        # each in-range output row's interpolation weights must sum to 1
        import numpy as np_
        s_mid = SH // 2
        w = np_.asarray(ah[s_mid]).sum(axis=1)
        np_.testing.assert_allclose(w, 1.0, atol=1e-6)
