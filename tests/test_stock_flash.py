"""Stock JAX Pallas TPU flash attention vs the XLA reference path.

On TPU attn_impl='auto' resolves to the small_attention kernel
(ops.attention.DEFAULT_TPU_IMPL='small'); the stock flash kernel is the
long-sequence fallback when small_attention's VMEM residency doesn't hold.
The XLA path materialises (B, H, N, N) fp32 logits in HBM (reference
semantics croco/models/blocks.py:94-112); flash streams them through VMEM.
Numerics must match fwd + bwd, including the N -> 128-multiple padding
with segment-id masking.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from align3r_tpu.ops.attention import (attention, stock_flash_attention,
                                       xla_attention)


@pytest.mark.parametrize("n", [576, 512, 130])
def test_stock_flash_matches_xla(n):
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (2, 3, n, 64))
               for i in range(3))
    ref = xla_attention(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = stock_flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_stock_flash_grads_match_xla():
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (1, 2, 576, 64))
               for i in range(3))

    def ref_loss(q, k, v):
        return jnp.sum(xla_attention(q, k, v) ** 2)

    def flash_loss(q, k, v):
        return jnp.sum(stock_flash_attention(q, k, v) ** 2)

    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        g_f = jax.grad(flash_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_f):
        scale = max(float(jnp.abs(a).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-4 * scale)


def test_auto_dispatch_falls_back_on_cpu():
    """conftest forces the cpu platform, so 'auto' must stay on XLA."""
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (1, 2, 64, 64))
               for i in range(3))
    out = attention(q, k, v, impl="auto")
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(xla_attention(q, k, v)), atol=1e-6)
