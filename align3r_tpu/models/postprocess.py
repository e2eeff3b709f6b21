"""Head output activations: raw channels -> pts3d + confidence.

Behavioural reference: /root/reference/dust3r/heads/postprocess.py:10-58.
Operates NHWC, fp32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

INF = float("inf")


def reg_dense_depth(xyz: jnp.ndarray, mode):
    """xyz: (..., 3) raw head output -> 3D points.

    'exp' mode: unit direction x expm1(||xyz||) (unbounded).
    """
    name, vmin, vmax = mode
    if name == "linear":
        if vmin == -INF and vmax == INF:
            return xyz
        return jnp.clip(xyz, vmin, vmax)
    from align3r_tpu.geometry.core import safe_norm
    d = safe_norm(xyz, axis=-1, keepdims=True)
    unit = xyz / jnp.clip(d, 1e-8)
    if name == "square":
        return unit * jnp.square(d)
    if name == "exp":
        # clamp the exponent: beyond ~40 the fp32 squared-norms used by every
        # downstream loss overflow. Trained checkpoints emit d <= ~10; the
        # clamp only matters for from-scratch training stability (the
        # reference always starts from a DUSt3R checkpoint and never hits it).
        return unit * jnp.expm1(jnp.minimum(d, 40.0))
    raise ValueError(f"bad depth mode {name!r}")


def reg_dense_conf(x: jnp.ndarray, mode):
    """x: (...,) raw conf channel -> confidence."""
    name, vmin, vmax = mode
    if name == "exp":
        # exponent clamp: exp overflows fp32 past ~88 (vmax is inf for the
        # released conf_mode so the reference's clip gives no protection)
        return vmin + jnp.clip(jnp.exp(jnp.minimum(x, 80.0)), max=vmax - vmin)
    if name == "sigmoid":
        return (vmax - vmin) * jax.nn.sigmoid(x) + vmin
    raise ValueError(f"bad conf mode {name!r}")


def postprocess(out: jnp.ndarray, depth_mode, conf_mode):
    """out: (B, H, W, C) raw head output (C = 3 or 4). Returns dict."""
    res = {"pts3d": reg_dense_depth(out[..., :3], depth_mode)}
    if conf_mode is not None:
        res["conf"] = reg_dense_conf(out[..., 3], conf_mode)
    return res
