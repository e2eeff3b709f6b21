"""DPT regression head (pts3d + confidence), functional, fp32, NHWC.

Behavioural reference: /root/reference/dust3r/heads/dpt_head.py:20-116 and
/root/reference/croco/models/dpt_block.py (make_scratch:20-77,
ResidualConvUnit_custom:80-139, FeatureFusionBlock_custom:144-229,
DPTOutputAdapter:264-457). Configuration used by Align3R:
hooks [0, 6, 9, 12] over [encoder_out, dec_1..dec_12], dim_tokens
[enc_dim, dec, dec, dec], layer_dims [96, 192, 384, 768], feature_dim 256,
last_dim 128, num_channels 3+has_conf, head_type 'regression'.

The reassemble stage upsamples/downsamples the four hooked token maps to
strides {4, 2, 1, 1/2} of the patch grid, projects each to 256ch, then fuses
coarse-to-fine through four RefineNet blocks (each: residual conv units +
2x bilinear upsample align_corners=True + 1x1 out conv), ending with the
regression head at 2x patch-grid -> full resolution.
"""
from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp

from align3r_tpu.models import nn
from align3r_tpu.models.postprocess import postprocess

LAYER_DIMS = [96, 192, 384, 768]
FEATURE_DIM = 256


def init_dpt_head(key, dim_tokens: Sequence[int], num_channels: int,
                  feature_dim: int = FEATURE_DIM, last_dim: int = FEATURE_DIM // 2,
                  layer_dims: Sequence[int] = tuple(LAYER_DIMS), dtype=jnp.float32):
    keys = iter(jax.random.split(key, 40))
    ld = list(layer_dims)
    p = {}
    # reassemble (act_postprocess): per-hook projection + resample
    p["act1_conv"] = nn.conv2d_init(next(keys), dim_tokens[0], ld[0], 1, dtype=dtype)
    p["act1_up"] = nn.conv_transpose2d_init(next(keys), ld[0], ld[0], 4, dtype=dtype)
    p["act2_conv"] = nn.conv2d_init(next(keys), dim_tokens[1], ld[1], 1, dtype=dtype)
    p["act2_up"] = nn.conv_transpose2d_init(next(keys), ld[1], ld[1], 2, dtype=dtype)
    p["act3_conv"] = nn.conv2d_init(next(keys), dim_tokens[2], ld[2], 1, dtype=dtype)
    p["act4_conv"] = nn.conv2d_init(next(keys), dim_tokens[3], ld[3], 1, dtype=dtype)
    p["act4_down"] = nn.conv2d_init(next(keys), ld[3], ld[3], 3, dtype=dtype)  # stride 2
    # scratch projections to feature_dim (3x3, no bias)
    for i in range(4):
        p[f"layer{i + 1}_rn"] = nn.conv2d_init(next(keys), ld[i], feature_dim, 3,
                                               bias=False, dtype=dtype)
    # 4 refinenets, each with two residual conv units + out conv
    for r in range(1, 5):
        rn = {}
        for unit in ("res1", "res2"):
            rn[unit] = {
                "conv1": nn.conv2d_init(next(keys), feature_dim, feature_dim, 3, dtype=dtype),
                "conv2": nn.conv2d_init(next(keys), feature_dim, feature_dim, 3, dtype=dtype),
            }
        rn["out_conv"] = nn.conv2d_init(next(keys), feature_dim, feature_dim, 1, dtype=dtype)
        p[f"refinenet{r}"] = rn
    # regression head
    p["head_conv1"] = nn.conv2d_init(next(keys), feature_dim, feature_dim // 2, 3, dtype=dtype)
    p["head_conv2"] = nn.conv2d_init(next(keys), feature_dim // 2, last_dim, 3, dtype=dtype)
    p["head_conv3"] = nn.conv2d_init(next(keys), last_dim, num_channels, 1, dtype=dtype)
    return p


def _residual_conv_unit(p, x):
    out = jax.nn.relu(x)
    out = nn.conv2d(p["conv1"], out)
    out = jax.nn.relu(out)
    out = nn.conv2d(p["conv2"], out)
    return out + x


def _fusion(p, x, skip=None, resize=nn.bilinear_resize, conv_impl="xla"):
    if conv_impl == "pipeline":
        from align3r_tpu.ops.dpt_pipeline import fused_fusion_pre, supported
        if supported(x) and (skip is None or supported(skip)):
            x = fused_fusion_pre(x, p, skip=skip)
        else:
            conv_impl = "xla"
    if conv_impl == "xla":
        if skip is not None:
            x = x + _residual_conv_unit(p["res1"], skip)
        x = _residual_conv_unit(p["res2"], x)
    B, H, W, C = x.shape
    x = resize(x, H * 2, W * 2, align_corners=True)
    return nn.conv2d(p["out_conv"], x)


def apply_dpt_head(p, hook_tokens: List[jnp.ndarray], grid_hw, img_hw,
                   depth_mode=None, conf_mode=None, dtype=jnp.float32,
                   resize_impl: str = "auto", conv_impl: str = "xla"):
    """hook_tokens: 4 arrays (B, N, C_hook) at hooks [0, 2l/4, 3l/4, l];
    grid_hw: (nh, nw) patch grid; img_hw: (H, W) output resolution.
    Runs in fp32 by default (reference forces heads out of autocast,
    dust3r/model.py:252-254); dtype=jnp.bfloat16 is the fast path — the
    conv pyramid runs bf16 (fp32 MXU accumulation either way) and the
    final regression conv + postprocess exponentials stay fp32.
    conv_impl='pipeline' fuses each refinenet residual-unit chain into a
    Pallas program (ops/dpt_pipeline.py; differentiable via XLA-recompute
    VJP); 'xla' is the reference-structured graph.
    Returns dict(pts3d, conf).
    """
    nh, nw = grid_hw
    H, W = img_hw
    # Pipelined v5e A/B per 8-image batch (tool/profile_decode.py --which
    # heads): fp32+gather 23.3 ms, fp32+mxu 43.7, bf16+mxu 11.7, bf16+gather
    # 23.4 — the constant-matrix ('mxu') resize only pays off in bf16, so
    # 'auto' picks it by dtype. (An earlier synced measurement picked mxu
    # for fp32; per-call tunnel latency had swamped the signal.)
    if resize_impl == "auto":
        resize_impl = "mxu" if dtype == jnp.bfloat16 else "gather"
    resize = nn.bilinear_resize if resize_impl == "gather" else nn.bilinear_resize_mxu
    maps = [t.astype(dtype).reshape(t.shape[0], nh, nw, t.shape[-1])
            for t in hook_tokens]

    l1 = nn.conv_transpose2d(p["act1_up"], nn.conv2d(p["act1_conv"], maps[0]))
    l2 = nn.conv_transpose2d(p["act2_up"], nn.conv2d(p["act2_conv"], maps[1]))
    l3 = nn.conv2d(p["act3_conv"], maps[2])
    l4 = nn.conv2d(p["act4_down"], nn.conv2d(p["act4_conv"], maps[3]),
                   stride=2, padding=[(1, 1), (1, 1)])

    l1 = nn.conv2d(p["layer1_rn"], l1)
    l2 = nn.conv2d(p["layer2_rn"], l2)
    l3 = nn.conv2d(p["layer3_rn"], l3)
    l4 = nn.conv2d(p["layer4_rn"], l4)

    fuse = functools.partial(_fusion, resize=resize, conv_impl=conv_impl)
    path4 = fuse(p["refinenet4"], l4)[:, :l3.shape[1], :l3.shape[2], :]
    path3 = fuse(p["refinenet3"], path4, l3)
    path2 = fuse(p["refinenet2"], path3, l2)
    path1 = fuse(p["refinenet1"], path2, l1)

    if conv_impl == "pipeline":
        from align3r_tpu.ops.dpt_pipeline import (fused_head_final,
                                                  head_trio_supported)
        if head_trio_supported(path1):
            out = fused_head_final(path1, p["head_conv1"], p["head_conv2"],
                                   p["head_conv3"])[:, :H, :W, :]
            if depth_mode is None:
                return out
            return postprocess(out, depth_mode, conf_mode)
    x = nn.conv2d(p["head_conv1"], path1)
    x = resize(x, x.shape[1] * 2, x.shape[2] * 2, align_corners=True)
    x = jax.nn.relu(nn.conv2d(p["head_conv2"], x))
    out = nn.conv2d(p["head_conv3"], x.astype(jnp.float32))
    out = out[:, :H, :W, :]
    if depth_mode is None:
        return out
    return postprocess(out, depth_mode, conf_mode)


def apply_dpt_heads_stacked(p1, p2, hooks1, hooks2, grid_hw, img_hw,
                            depth_mode=None, conf_mode=None,
                            dtype=jnp.float32, resize_impl: str = "auto"):
    """Run BOTH downstream heads as one vmapped program.

    XLA lowers the vmapped convolutions to grouped convs (one kernel per
    conv site covering both heads) instead of two separate head programs —
    half the op count, twice the per-matmul batch. Numerics identical to
    two apply_dpt_head calls. Returns (res1, res2).
    """
    ps = jax.tree.map(lambda a, b: jnp.stack([a, b]), p1, p2)
    hooks = [jnp.stack([a, b]) for a, b in zip(hooks1, hooks2)]
    fn = functools.partial(apply_dpt_head, grid_hw=grid_hw, img_hw=img_hw,
                           depth_mode=depth_mode, conf_mode=conf_mode,
                           dtype=dtype, resize_impl=resize_impl)
    out = jax.vmap(lambda p, h: fn(p, h))(ps, hooks)
    res1 = jax.tree.map(lambda t: t[0], out)
    res2 = jax.tree.map(lambda t: t[1], out)
    return res1, res2
