"""Pallas TPU attention kernel for small sequences (Align3R shapes).

Replaces the reference's separate curope + softmax-attention HBM round trips
(/root/reference/croco/models/blocks.py:94-112): at N≈576 tokens the XLA
path materialises the (B, H, N, N) fp32 logits and bf16 probs in HBM every
layer — measured 2.0 ms (8 TF/s) at (16, 12, 576, 64) on v5e, ~15x off
speed-of-light, and the decoder spends ~2/3 of its time there.

Design: sequences this small fit entirely in VMEM, so no flash-style
streaming or online softmax is needed (the stock pallas flash_attention
kernel measures SLOWER here, 3.5 ms, because its 128-tile grid and segment
masking are built for long sequences). One grid step processes G heads:
q/k/v blocks (G, N, D) resident in VMEM, logits (G, N, N) in fp32 registers/
VMEM, one batched MXU matmul pair per step, nothing but the output returns
to HBM. RoPE is applied OUTSIDE the kernel (XLA fuses the rotation into the
qkv-projection epilogue; measured end-to-end neutral, CLAUDE.md perf notes).

No padding, no masking: N is the true token count (multiple of 16 for bf16
sublanes — every /16-patch grid satisfies this), D ≤ 128 rides the lane pad.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[:]                                   # (G, Nq, D)
    k = k_ref[:]                                   # (G, Nk, D)
    v = v_ref[:]                                   # (G, Nk, D)
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale           # (G, Nq, Nk)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                   # (G, Nq, D)
    o_ref[:] = (out / s).astype(o_ref.dtype)


def _kernel_unrolled(q_ref, k_ref, v_ref, o_ref, *, scale, group):
    """Per-head unrolled body: G independent dot->softmax->dot chains give
    the Mosaic scheduler freedom to overlap head i's softmax (VPU) with head
    i+1's matmuls (MXU), instead of one batched dot stalling on one batched
    exp."""
    for g in range(group):
        q = q_ref[g]                               # (Nq, D)
        k = k_ref[g]
        v = v_ref[g]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale       # (Nq, Nk)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        s = jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[g] = (out / s).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group", "interpret", "unroll"))
def _call(q, k, v, group: int, interpret: bool, unroll: bool = True):
    BH, Nq, D = q.shape
    Nk = k.shape[1]
    grid = (BH // group,)
    blk = lambda n: pl.BlockSpec((group, n, D), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    kern = (functools.partial(_kernel_unrolled, scale=D ** -0.5, group=group)
            if unroll else functools.partial(_kernel, scale=D ** -0.5))
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[blk(Nq), blk(Nk), blk(Nk)],
        out_specs=blk(Nq),
        out_shape=jax.ShapeDtypeStruct((BH, Nq, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            # the unrolled g-loop can keep `group` fp32 logits+exp buffers
            # live at once — near-gate shapes exceed the 16 MB scoped default
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * BH * Nq * Nk * D,
            bytes_accessed=(q.size + k.size + v.size) * 2 * q.dtype.itemsize,
            transcendentals=BH * Nq * Nk,
        ),
    )(q, k, v)


def supported(q, k, v) -> bool:
    """Shapes the kernel handles well: small sequences wholly resident in
    VMEM, bf16-aligned sublanes."""
    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    # double-buffered (group=4) q/k/v/out blocks + up to 4 live fp32
    # logits+exp pairs (the g loop is unrolled); gate well under the 64 MB
    # vmem_limit the pallas_call sets
    vmem = (2 * 4 * 2 * (Nq + Nk) * D * q.dtype.itemsize
            + 4 * 8 * Nq * Nk)
    return (Nq % 16 == 0 and Nk % 16 == 0 and D <= 128 and D % 8 == 0
            and q.dtype == k.dtype == v.dtype
            and Nq * Nk >= 128 * 128          # tiny shapes: XLA wins
            and vmem < 32 * 1024 * 1024)


def small_attention(q, k, v, group: int = 4, interpret: bool | None = None,
                    unroll: bool = True):
    """Fused softmax attention for small N. q: (B, H, Nq, D); k/v:
    (B, H, Nk, D). fp32 softmax, output in q.dtype. Matches xla_attention
    numerics (same fp32 accumulation points).

    Differentiable: the backward is the VJP of the numerically-equivalent
    XLA attention (recompute-style) — without this, any differentiated
    forward that dispatched here (training on TPU under attn_impl="auto")
    failed with a Pallas linearization error. `interpret` is resolved
    internally (kept in the signature for API compatibility).
    """
    del interpret
    return _small_vjp(q, k, v, group, unroll)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _small_vjp(q, k, v, group, unroll):
    return _forward(q, k, v, group, unroll)


def _forward(q, k, v, group, unroll):
    interpret = jax.default_backend() not in ("tpu", "axon")
    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    BH = B * H
    g = group
    while BH % g:
        g //= 2
    qf = q.reshape(BH, Nq, D)
    kf = k.reshape(BH, Nk, D)
    vf = v.reshape(BH, Nk, D)
    out = _call(qf, kf, vf, g, interpret, unroll)
    return out.reshape(B, H, Nq, D)


def _xla_equiv(q, k, v):
    """The XLA computation small_attention matches (ops.attention
    xla_attention's fp32 accumulation points), used only for the VJP."""
    D = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * D ** -0.5
    m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    p = jnp.exp(logits - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bhkd->bhqd", (p / s).astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _small_fwd(q, k, v, group, unroll):
    return _forward(q, k, v, group, unroll), (q, k, v)


def _small_bwd(group, unroll, res, g):
    q, k, v = res
    _, vjp = jax.vjp(_xla_equiv, q, k, v)
    return vjp(g)


_small_vjp.defvjp(_small_fwd, _small_bwd)
