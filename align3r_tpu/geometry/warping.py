"""Depth-based warping, flow-consistency masks and image warping (pure jnp).

Behavioural reference: /root/reference/dust3r/utils/goem_opt.py
(depth_regularization_si_weighted:15-36, WarpImage:38-69,
warp_by_disp:195-236, unproject_depth:239-244, DepthBasedWarping:429-526,
OccMask:575-619) and cloud_opt_flow/optimizer.py smooth_L1_loss_fn:18-24.

Conventions: images/flows are NHWC here (reference is NCHW); flow channels
are (dx, dy). grid_sample equivalents use align_corners=True with zero
padding, matching torch defaults used by the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(img, x, y):
    """Sample img (B, H, W, C) at float pixel coords x, y (B, H', W').

    Equivalent to torch F.grid_sample(align_corners=True, padding_mode='zeros')
    with unnormalised coordinates: out-of-bounds samples contribute zero.
    """
    B, H, W, C = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    xs = [x0, x0 + 1]
    ys = [y0, y0 + 1]
    out = 0.0
    for yy in ys:
        for xx in xs:
            wgt = (1 - jnp.abs(x - xx)) * (1 - jnp.abs(y - yy))
            inb = (xx >= 0) & (xx <= W - 1) & (yy >= 0) & (yy <= H - 1)
            xi = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
            yi = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
            gathered = jnp.take_along_axis(
                img.reshape(B, H * W, C),
                (yi * W + xi).reshape(B, -1, 1), axis=1).reshape(x.shape + (C,))
            out = out + gathered * (wgt * inb)[..., None]
    return out


def base_grid(H, W, batch=None, dtype=jnp.float32):
    xx = jax.lax.broadcasted_iota(dtype, (H, W), 1)
    yy = jax.lax.broadcasted_iota(dtype, (H, W), 0)
    g = jnp.stack([xx, yy], axis=-1)
    if batch is not None:
        g = jnp.broadcast_to(g[None], (batch, H, W, 2))
    return g


def warp_image(img, flow_2_1):
    """Backward-warp: out[p] = img[p + flow_2_1[p]] (WarpImage:58-69).
    img: (B, H, W, C); flow_2_1: (B, H, W, 2)."""
    B, H, W, _ = flow_2_1.shape
    g = base_grid(H, W, B) + flow_2_1
    return bilinear_sample(img, g[..., 0], g[..., 1])


def occ_mask(flow_1_2, flow_2_1, th: float = 3.0):
    """Forward-backward consistency mask (OccMask:575-619).
    flows: (B, H, W, 2). Returns (B, H, W) bool: True = valid (non-occluded)."""
    B, H, W, _ = flow_1_2.shape
    g = base_grid(H, W, B)
    target = g + flow_1_2
    oob = ((target[..., 0] < 0) | (target[..., 0] > W - 1) |
           (target[..., 1] < 0) | (target[..., 1] > H - 1))
    sampled = bilinear_sample(flow_2_1, target[..., 0], target[..., 1])
    inconsistency = jnp.abs((sampled + flow_1_2).sum(-1))
    return (inconsistency < th) & (~oob)


def warp_by_disp(src_R, src_t, tgt_R, tgt_t, K, inv_K, src_disp):
    """Ego-motion flow field from disparity + relative pose
    (goem_opt.py:195-236, use_depth=False).

    src_R/tgt_R: (B, 3, 3); src_t/tgt_t: (B, 3, 1); K/inv_K: (B, 3, 3);
    src_disp: (B, H, W). Returns flow (B, H, W, 3): (dx, dy, dnorm).
    """
    B, H, W = src_disp.shape
    g = base_grid(H, W)
    coord = jnp.concatenate([g.reshape(-1, 2), jnp.ones((H * W, 1))], axis=-1).T  # (3, HW)
    rel_R = jnp.einsum("bij,bjk->bik", jnp.swapaxes(tgt_R, 1, 2), src_R)
    rel_t = jnp.einsum("bij,bjk->bik", jnp.swapaxes(tgt_R, 1, 2), src_t - tgt_t)
    H_mat = K @ rel_R @ inv_K                                    # (B, 3, 3)
    flat_disp = src_disp.reshape(B, 1, H * W)
    tgt_coord = H_mat @ coord[None] + flat_disp * (K @ rel_t)    # (B, 3, HW)
    tgt_coord = tgt_coord / (tgt_coord[:, -1:, :] + 1e-6)
    return (tgt_coord - coord[None]).reshape(B, 3, H, W).transpose(0, 2, 3, 1)


def unproject_depth_RT(depth, inv_K, R, t):
    """(B, H, W) depth -> world xyz (B, H, W, 3): R @ K^-1 @ u * d + t
    (goem_opt.py:239-244)."""
    B, H, W = depth.shape
    g = base_grid(H, W)
    coord = jnp.concatenate([g.reshape(-1, 2), jnp.ones((H * W, 1))], axis=-1).T
    xyz = depth.reshape(B, 1, H * W) * (R @ inv_K @ coord[None]) + t
    return xyz.reshape(B, 3, H, W).transpose(0, 2, 3, 1)


def get_relative_transform(src_R, src_t, tgt_R, tgt_t):
    rel_R = jnp.einsum("bij,bjk->bik", jnp.swapaxes(tgt_R, 1, 2), src_R)
    rel_t = jnp.einsum("bij,bjk->bik", jnp.swapaxes(tgt_R, 1, 2), src_t - tgt_t)
    return rel_R, rel_t


def smooth_l1_flow_loss(estimate, gt, mask, beta: float = 1.0,
                        per_pixel_thre: float = 50.0):
    """Masked smooth-L1 with per-pixel outlier gating
    (cloud_opt_flow/optimizer.py:18-24). estimate/gt: (..., 2); mask: (...)
    broadcastable over the channel dim."""
    m = mask.astype(estimate.dtype)[..., None]
    diff = estimate * m - gt * m
    a = jnp.abs(diff)
    raw = jnp.where(a < beta, 0.5 * diff * diff / beta, a - 0.5 * beta)
    if per_pixel_thre > 0:
        pm = (raw < per_pixel_thre) * m
    else:
        pm = m
    return (raw * pm).sum() / jnp.clip(pm.sum(), 1.0)


def depth_regularization_si_weighted(depth_pred, depth_init,
                                     pixel_wise_weight=None,
                                     pixel_wise_weight_scale: float = 1.0,
                                     pixel_wise_weight_bias: float = 1.0,
                                     eps: float = 1e-6,
                                     pixel_weight_normalize: bool = False):
    """Scale-invariant log-depth regularisation (goem_opt.py:15-36).
    depth_*: (B, H, W). pixel_wise_weight: optional (B, H, W) — the flow
    optimizer passes the dynamic masks here (optimizer.py:550), giving
    dynamic pixels weight scale+bias (=2) and static pixels bias (=1).
    Returns scalar."""
    dp = jnp.clip(depth_pred, eps)
    di = jnp.clip(depth_init, eps)
    lp, li = jnp.log(dp), jnp.log(di)
    B, H, W = dp.shape
    scale = (li - lp).sum(axis=(1, 2), keepdims=True) / (H * W)
    if pixel_wise_weight is not None:
        w = pixel_wise_weight.astype(lp.dtype)
        if pixel_weight_normalize:
            norm = jax.lax.stop_gradient(w).reshape(B, -1).max(axis=1)
            w = w / (norm[:, None, None] + eps)
        w = w * pixel_wise_weight_scale + pixel_wise_weight_bias
    else:
        w = 1.0
    si = (w * (lp - li + scale) ** 2).sum(axis=(1, 2)) / (H * W)
    return si.mean()
