"""Minimal functional NN layer library (param pytrees + pure apply fns).

We deliberately avoid a module framework: params are plain nested dicts of
jnp arrays, which keeps torch-checkpoint conversion, pjit sharding specs and
lax.scan layer-stacking trivial. Conventions:

- Dense kernels are stored (in_dim, out_dim) — i.e. y = x @ kernel + bias.
  (Torch Linear stores (out, in); the converter transposes.)
- Conv kernels are stored HWIO (torch OIHW; the converter transposes).
- LayerNorm eps defaults to 1e-6 (croco norm_layer partial(LayerNorm, eps=1e-6)).
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- initialisers

def xavier_uniform(key, shape, fan_in, fan_out, dtype=jnp.float32):
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -a, a)


def dense_init(key, in_dim: int, out_dim: int, bias: bool = True, dtype=jnp.float32):
    p = {"kernel": xavier_uniform(key, (in_dim, out_dim), in_dim, out_dim, dtype)}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def dense(p, x):
    y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def layernorm_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layernorm(p, x, eps: float = 1e-6):
    # fp32 statistics regardless of activation dtype (matches torch LN behaviour)
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def conv2d_init(key, in_ch: int, out_ch: int, kernel: int | tuple, bias: bool = True,
                dtype=jnp.float32, zero: bool = False):
    """Torch Conv2d default init (kaiming_uniform a=sqrt(5) == U(±1/sqrt(fan_in))).

    The reference xavier-inits only nn.Linear (croco.py:129-134); convs keep
    the torch default. Matching it matters: xavier is sqrt(3) wider per layer,
    which compounds through the ~15-conv DPT head and overflows the expm1
    pts3d activation at random init.
    """
    kh, kw = (kernel, kernel) if isinstance(kernel, int) else kernel
    fan_in = in_ch * kh * kw
    if zero:
        k = jnp.zeros((kh, kw, in_ch, out_ch), dtype)
    else:
        b = 1.0 / math.sqrt(fan_in)
        k = jax.random.uniform(key, (kh, kw, in_ch, out_ch), dtype, -b, b)
    p = {"kernel": k}
    if bias:
        p["bias"] = jnp.zeros((out_ch,), dtype)
    return p


def conv2d(p, x, stride: int | tuple = 1, padding="SAME"):
    """x: (B, H, W, C) NHWC; kernel HWIO."""
    s = (stride, stride) if isinstance(stride, int) else stride
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), window_strides=s, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def conv_transpose2d_init(key, in_ch: int, out_ch: int, stride: int, dtype=jnp.float32):
    """ConvTranspose2d with kernel_size == stride (the only case DPT uses).
    Kernel stored (in, s, s, out); equivalent to a dense + depth-to-space."""
    b = 1.0 / math.sqrt(in_ch)
    k = jax.random.uniform(key, (in_ch, stride, stride, out_ch), dtype, -b, b)
    return {"kernel": k, "bias": jnp.zeros((out_ch,), dtype)}


def conv_transpose2d(p, x):
    """x: (B, H, W, Cin); kernel (Cin, s, s, Cout) -> (B, H*s, W*s, Cout).

    Exact ConvTranspose2d(kernel=s, stride=s, pad=0) semantics:
    out[b, i*s+di, j*s+dj, o] = Σ_c x[b,i,j,c]·K[c,di,dj,o] + bias[o].
    Implemented as one matmul + reshape (MXU-friendly, no gather).
    """
    K = p["kernel"].astype(x.dtype)
    Cin, s, _, Cout = K.shape
    B, H, W, _ = x.shape
    y = jnp.einsum("bhwc,cdko->bhdwko", x, K)
    y = y.reshape(B, H * s, W * s, Cout)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def conv1d_init(key, in_ch: int, out_ch: int, kernel: int = 1, bias: bool = True,
                dtype=jnp.float32, zero: bool = False):
    """1x1 conv over tokens == dense; stored as dense (in, out)."""
    assert kernel == 1
    if zero:
        p = {"kernel": jnp.zeros((in_ch, out_ch), dtype)}
        if bias:
            p["bias"] = jnp.zeros((out_ch,), dtype)
        return p
    return dense_init(key, in_ch, out_ch, bias, dtype)


def gelu(x):
    # torch nn.GELU default is the exact erf formulation
    return jax.nn.gelu(x, approximate=False)


def bilinear_resize(x, out_h: int, out_w: int, align_corners: bool = True):
    """NHWC bilinear resize matching torch F.interpolate semantics.

    align_corners=True  -> scale = (in-1)/(out-1), src = dst*scale
    align_corners=False -> src = (dst+0.5)*in/out - 0.5 (half-pixel), clamped.
    """
    B, H, W, C = x.shape
    dtype = x.dtype
    xf = x.astype(jnp.float32)

    def coords(in_size, out_size):
        d = jnp.arange(out_size, dtype=jnp.float32)
        if align_corners:
            if out_size == 1:
                return jnp.zeros((1,), jnp.float32)
            return d * ((in_size - 1) / max(out_size - 1, 1))
        return jnp.clip((d + 0.5) * (in_size / out_size) - 0.5, 0.0, in_size - 1)

    def interp_axis(arr, in_size, out_size, axis):
        c = coords(in_size, out_size)
        lo = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, in_size - 1)
        hi = jnp.clip(lo + 1, 0, in_size - 1)
        w = (c - lo.astype(jnp.float32))
        a = jnp.take(arr, lo, axis=axis)
        b = jnp.take(arr, hi, axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = out_size
        w = w.reshape(shape)
        return a * (1 - w) + b * w

    y = interp_axis(xf, H, out_h, 1)
    y = interp_axis(y, W, out_w, 2)
    return y.astype(dtype)


def _interp_matrix(in_size: int, out_size: int, align_corners: bool):
    """(out, in) bilinear interpolation matrix (two nonzeros per row)."""
    import numpy as np
    d = np.arange(out_size, dtype=np.float64)
    if align_corners:
        c = d * ((in_size - 1) / max(out_size - 1, 1)) if out_size > 1 else np.zeros(1)
    else:
        c = np.clip((d + 0.5) * (in_size / out_size) - 0.5, 0.0, in_size - 1)
    lo = np.clip(np.floor(c).astype(np.int64), 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    w = c - lo
    m = np.zeros((out_size, in_size), np.float32)
    m[np.arange(out_size), lo] += (1 - w)
    m[np.arange(out_size), hi] += w
    return m


def bilinear_resize_mxu(x, out_h: int, out_w: int, align_corners: bool = True):
    """Same semantics as bilinear_resize but as two constant-matrix matmuls
    (runs on the MXU instead of gather chains on the VPU — an A/B candidate
    for the DPT-head upsamples; see tool/profile_decode.py)."""
    B, H, W, C = x.shape
    dtype = x.dtype
    mh = jnp.asarray(_interp_matrix(H, out_h, align_corners))
    mw = jnp.asarray(_interp_matrix(W, out_w, align_corners))
    y = jnp.einsum("oh,bhwc->bowc", mh, x.astype(jnp.float32))
    y = jnp.einsum("ow,bhwc->bhoc", mw, y)   # (B, out_h, out_w, C)
    return y.astype(dtype)


def stack_layers(param_list: Sequence[dict]):
    """Stack per-layer param pytrees along a new leading axis (for lax.scan)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *param_list)


def layer_slice(stacked, i):
    return jax.tree.map(lambda x: x[i], stacked)
