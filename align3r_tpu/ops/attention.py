"""Attention dispatch: Pallas small_attention kernel, stock flash, or XLA.

The XLA path is the semantic reference (softmax attention with fp32
accumulation, reference croco/models/blocks.py:94-112). On TPU, 'auto'
resolves to ops/small_attention.py (VMEM-resident logits — Align3R
sequences are short); the stock Pallas flash kernel is the long-sequence
fallback. Whole-site fusion (LN+qkv+RoPE+attn+proj) lives in
ops/fused_site.py and is dispatched at the block level, not here.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def xla_attention(q, k, v):
    """q, k, v: (B, H, N, D). Softmax in fp32, output in q.dtype."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


# What 'auto' resolves to on the TPU backend. The XLA path materialises the
# (B, H, N, N) fp32 logits in HBM (several GB per ViT-L decode batch across
# 24 attention sites). Measured at Align3R decode shapes (16, 12, 576, 64)
# on v5e: xla 2.26 ms, stock pallas flash (tuned blocks) 1.76 ms, in-repo
# small_attention g=2 unrolled 1.72 ms -> 'small' wins (VMEM-resident
# logits, no padding); see tool/profile_decode.py --which attn.
DEFAULT_TPU_IMPL = "small"


def flash_ok(q, k, v) -> bool:
    B, H, Nq, D = q.shape
    return (jax.default_backend() in ("tpu", "axon") and D in (64, 128, 256)
            and q.dtype == k.dtype == v.dtype and Nq == k.shape[2])


def stock_flash_attention(q, k, v):
    """Stock JAX Pallas TPU flash attention with padding to 128-multiples.

    q, k, v: (B, H, N, D). Sequence padded with an out-of-segment id so pad
    keys are masked; pad-query rows are sliced away.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as fa, BlockSizes, SegmentIds)
    B, H, N, D = q.shape
    Np = -(-N // 128) * 128
    scale = D ** -0.5
    if Np != N:
        pad = ((0, 0), (0, 0), (0, Np - N), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        ids = (jnp.arange(Np) < N).astype(jnp.int32)[None].repeat(B, 0)
        seg = SegmentIds(q=ids, kv=ids)
    else:
        seg = None
    blk = max(b for b in (512, 256, 128) if Np % b == 0)
    bs = BlockSizes(block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
                    block_q_major_dkv=blk, block_k_major_dkv=blk,
                    block_k_dkv=blk, block_q_dkv=blk,
                    block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk)
    out = fa(q, k, v, segment_ids=seg, sm_scale=scale, block_sizes=bs)
    return out[:, :, :N].astype(q.dtype)


def attention(q, k, v, impl: str = "auto"):
    """Dispatch attention implementation.

    impl: 'auto' | 'xla' | 'small' | 'flash'. 'auto' resolves to
    DEFAULT_TPU_IMPL ('small', the VMEM-resident small_attention kernel) on
    TPU when shapes allow, else XLA. 'flash' is the stock JAX Pallas TPU
    kernel (fwd+bwd), kept as the long-sequence fallback.
    """
    if impl == "auto":
        from align3r_tpu.ops.small_attention import supported as small_ok
        if jax.default_backend() in ("tpu", "axon") and small_ok(q, k, v):
            impl = DEFAULT_TPU_IMPL
        elif flash_ok(q, k, v):
            impl = "flash"
        else:
            impl = "xla"
    if impl == "xla":
        return xla_attention(q, k, v)
    if impl == "small":
        from align3r_tpu.ops.small_attention import small_attention
        return small_attention(q, k, v, group=2, unroll=True)
    if impl == "flash":
        if not flash_ok(q, k, v):
            return xla_attention(q, k, v)
        return stock_flash_attention(q, k, v)
    raise ValueError(f"unknown attention impl {impl!r}")
