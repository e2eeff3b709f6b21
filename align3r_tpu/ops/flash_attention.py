"""Pallas TPU fused RoPE2D + attention kernel.

Replaces the reference's curope CUDA extension + separate softmax attention
(/root/reference/croco/models/curope/kernels.cu:17-108 and
croco/models/blocks.py:94-112) with ONE kernel: rotary embedding is applied
to q/k tiles in VMEM and attention never materialises the (N, N) probability
matrix in HBM.

Design for Align3R shapes (N ≈ 576 tokens, D = 64, 12-16 heads): the full
k/v for one (batch, head) is at most a few hundred KB, so the kernel holds
k/v entirely in VMEM and runs a single-pass softmax per q tile — no online
max/sum bookkeeping needed (flash-style streaming only pays off when k/v
exceed VMEM, i.e. N >> 4k).

Grid: (B, H, N/TQ). Softmax statistics in fp32; matmuls accumulate fp32 on
the MXU. Sequence padding is masked via an in-kernel iota comparison.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 128  # q tile


def _rot_half_per_half(t):
    """RoPE2D rotation helper on the last axis: within each D/2 half,
    NeoX-style rotate ((-b, a))."""
    D = t.shape[-1]
    h, q = D // 2, D // 4
    a = t[..., :q]
    b = t[..., q:h]
    c = t[..., h:h + q]
    d = t[..., h + q:]
    return jnp.concatenate([-b, a, -d, c], axis=-1)


def _attn_kernel(n_valid_ref, q_ref, k_ref, v_ref, qcos_ref, qsin_ref,
                 kcos_ref, ksin_ref, out_ref, *, scale):
    q = q_ref[0, 0]          # (TQ, D)
    k = k_ref[0, 0]          # (N, D)
    v = v_ref[0, 0]          # (N, D)
    qc, qs = qcos_ref[0], qsin_ref[0]      # (TQ, D)
    kc, ks = kcos_ref[0], ksin_ref[0]      # (N, D)
    q = q * qc + _rot_half_per_half(q) * qs
    k = k * kc + _rot_half_per_half(k) * ks
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # (TQ, N)
    n_valid = n_valid_ref[0]
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < n_valid, logits, -1e30)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[0, 0] = (out / denom).astype(out_ref.dtype)


def supported(q, k, v) -> bool:
    """Whether `auto` dispatch should pick this kernel.

    Currently returns False: measured on v5e at Align3R shapes (N=576, D=64,
    B*H=256) the kernel runs ~30x slower than XLA's fused attention — the
    D=64 lane layout forces Mosaic relayouts and the in-kernel rotation
    concats are sublane shuffles, while XLA already keeps these small blocks
    fused. The kernel stays available via attn_impl='pallas' (numerics match
    bf16-exactly). The planned qkv/rope/proj fusion rework landed as
    ops/fused_site.py (transposed (C, N) layout, sublane head slicing) —
    prefer attn_impl='fused' for whole-site fusion; this file remains the
    historical flash-style variant."""
    return False


def shapes_ok(q, k, v) -> bool:
    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    return (jax.default_backend() in ("tpu", "axon")
            and D % 4 == 0 and D <= 256 and Nk <= 4096 and q.dtype == k.dtype)


def _pad_n(x, n, axis):
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _flash_call(q, k, v, qcos, qsin, kcos, ksin, n_valid, interpret=False):
    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    scale = D ** -0.5
    nq_tiles = Nq // TQ

    # PrefetchScalarGridSpec index maps receive the scalar-prefetch ref as a
    # trailing argument
    def qmap(b, h, iq, _s):
        return (b, h, iq, 0)

    def kmap(b, h, iq, _s):
        return (b, h, 0, 0)

    in_specs = [
        pl.BlockSpec((1, 1, TQ, D), qmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Nk, D), kmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Nk, D), kmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TQ, D), lambda b, h, iq, _s: (b, iq, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TQ, D), lambda b, h, iq, _s: (b, iq, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Nk, D), lambda b, h, iq, _s: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Nk, D), lambda b, h, iq, _s: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [q, k, v, qcos, qsin, kcos, ksin]

    kernel = functools.partial(_attn_kernel, scale=scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H, nq_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, TQ, D), qmap, memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Nq, D), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * Nq * Nk * D,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * H * Nq * Nk,
        ),
    )(jnp.asarray([n_valid], jnp.int32), *args)


def flash_attention(q, k, v, qcos=None, qsin=None, kcos=None, ksin=None,
                    interpret: bool | None = None):
    """Fused (optional RoPE) + attention.

    q: (B, H, Nq, D); k/v: (B, H, Nk, D); cos/sin: (B, N, D) full-D layout
    [y-half | x-half] as produced by `rope2d_cos_sin`. Returns (B, H, Nq, D).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    if qcos is None:  # no rotary: identity rotation
        qcos = jnp.ones((B, Nq, D), q.dtype)
        qsin = jnp.zeros((B, Nq, D), q.dtype)
        kcos = jnp.ones((B, Nk, D), q.dtype)
        ksin = jnp.zeros((B, Nk, D), q.dtype)
    Nq_p = -(-Nq // TQ) * TQ
    Nk_p = -(-Nk // TQ) * TQ
    qp = _pad_n(q, Nq_p, 2)
    kp = _pad_n(k, Nk_p, 2)
    vp = _pad_n(v, Nk_p, 2)
    qcos = _pad_n(qcos, Nq_p, 1)
    qsin = _pad_n(qsin, Nq_p, 1)
    kcos = _pad_n(kcos, Nk_p, 1)
    ksin = _pad_n(ksin, Nk_p, 1)
    out = _flash_call(qp, kp, vp, qcos, qsin, kcos, ksin, Nk, interpret=interpret)
    return out[:, :, :Nq]


def rope2d_cos_sin(positions, D: int, base: float = 100.0, dtype=jnp.float32):
    """Full-D cos/sin for RoPE2D: first D/2 lanes keyed by y, last D/2 by x.

    positions: (B, N, 2). Matches align3r_tpu.models.rope semantics so that
    t*cos + rot_half_per_half(t)*sin == apply_rope2d(t, positions).
    """
    from align3r_tpu.models.rope import rope_cos_sin
    half = D // 2
    cy, sy = rope_cos_sin(positions[..., 0], half, base, dtype)
    cx, sx = rope_cos_sin(positions[..., 1], half, base, dtype)
    return (jnp.concatenate([cy, cx], axis=-1), jnp.concatenate([sy, sx], axis=-1))
