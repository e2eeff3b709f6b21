"""Attention dispatch: Pallas fused RoPE-attention kernel or pure-XLA path.

The XLA path is the semantic reference (softmax attention with fp32
accumulation, reference croco/models/blocks.py:94-112). The Pallas kernel in
ops/rope_attention.py fuses RoPE application with flash-style attention for
the TPU hot path; `attention()` picks automatically.
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


def attention(q, k, v, impl: str = "auto"):
    """Dispatch attention implementation.

    impl: 'auto' | 'xla' | 'pallas'. 'auto' uses the Pallas flash kernel on
    TPU when shapes allow, else XLA.
    """
    if impl == "xla":
        return xla_attention(q, k, v)
    if impl in ("auto", "pallas"):
        try:
            from align3r_tpu.ops.flash_attention import flash_attention, supported
            if impl == "pallas" or supported(q, k, v):
                return flash_attention(q, k, v)
        except ImportError:
            pass
        if impl == "pallas":
            raise RuntimeError("pallas flash attention unavailable for these shapes")
        return xla_attention(q, k, v)
    raise ValueError(f"unknown attention impl {impl!r}")
