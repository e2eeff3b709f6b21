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
    d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    unit = xyz / jnp.clip(d, 1e-8)
    if name == "square":
        return unit * jnp.square(d)
    if name == "exp":
        return unit * jnp.expm1(d)
    raise ValueError(f"bad depth mode {name!r}")


def reg_dense_conf(x: jnp.ndarray, mode):
    """x: (...,) raw conf channel -> confidence."""
    name, vmin, vmax = mode
    if name == "exp":
        return vmin + jnp.clip(jnp.exp(x), max=vmax - vmin)
    if name == "sigmoid":
        return (vmax - vmin) * jax.nn.sigmoid(x) + vmin
    raise ValueError(f"bad conf mode {name!r}")


def postprocess(out: jnp.ndarray, depth_mode, conf_mode):
    """out: (B, H, W, C) raw head output (C = 3 or 4). Returns dict."""
    res = {"pts3d": reg_dense_depth(out[..., :3], depth_mode)}
    if conf_mode is not None:
        res["conf"] = reg_dense_conf(out[..., 3], conf_mode)
    return res
