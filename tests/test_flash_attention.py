"""Fused RoPE-attention kernel vs the pure-jnp reference path (interpret mode
on CPU; the same kernel compiles with Mosaic on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from align3r_tpu.models.rope import apply_rope2d, make_grid_positions
from align3r_tpu.ops.attention import xla_attention
from align3r_tpu.ops.flash_attention import (
    flash_attention, rope2d_cos_sin, _rot_half_per_half)


def rope_ref(q, pos, base=100.0):
    return apply_rope2d(q, pos, base)


def test_fullD_cos_sin_rotation_equivalence():
    """t*cos + rot_half_per_half(t)*sin must equal apply_rope2d."""
    rng = np.random.default_rng(0)
    B, H, N, D = 2, 3, 10, 16
    t = jnp.asarray(rng.standard_normal((B, H, N, D)).astype(np.float32))
    pos = jnp.asarray(rng.integers(0, 9, (B, N, 2)))
    cos, sin = rope2d_cos_sin(pos, D)
    fused = t * cos[:, None] + _rot_half_per_half(t) * sin[:, None]
    np.testing.assert_allclose(np.asarray(fused),
                               np.asarray(apply_rope2d(t, pos)), atol=1e-5)


@pytest.mark.parametrize("N,D", [(64, 16), (130, 32), (576, 64)])
def test_flash_matches_xla(N, D):
    rng = np.random.default_rng(1)
    B, H = 1, 2
    q = jnp.asarray(rng.standard_normal((B, H, N, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, N, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, N, D)).astype(np.float32))
    out = flash_attention(q, k, v, interpret=True)
    ref = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_with_rope_matches_reference_path():
    rng = np.random.default_rng(2)
    B, H, D = 2, 4, 32
    h_, w_ = 9, 14  # N = 126, not a multiple of the tile: exercises padding
    N = h_ * w_
    pos = make_grid_positions(h_, w_, batch=B)
    q = jnp.asarray(rng.standard_normal((B, H, N, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, N, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, N, D)).astype(np.float32))
    qc, qs = rope2d_cos_sin(pos, D)
    out = flash_attention(q, k, v, qc, qs, qc, qs, interpret=True)
    ref = xla_attention(rope_ref(q, pos), rope_ref(k, pos), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_cross_attention_different_kv_length():
    rng = np.random.default_rng(3)
    B, H, D = 1, 2, 16
    q = jnp.asarray(rng.standard_normal((B, H, 70, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, 150, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, 150, D)).astype(np.float32))
    out = flash_attention(q, k, v, interpret=True)
    ref = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestSmallAttention:
    """ops/small_attention: the VMEM-resident kernel for Align3R shapes."""

    def test_matches_xla(self):
        import jax, jax.numpy as jnp
        from align3r_tpu.ops.small_attention import small_attention
        from align3r_tpu.ops.attention import xla_attention
        k = jax.random.PRNGKey(0)
        for (B, H, Nq, Nk, D), g in [((2, 3, 576, 576, 64), 4),
                                     ((1, 2, 64, 128, 32), 4),
                                     ((1, 3, 144, 144, 64), 2)]:
            q = jax.random.normal(k, (B, H, Nq, D), jnp.float32)
            kk = jax.random.normal(jax.random.PRNGKey(1), (B, H, Nk, D))
            v = jax.random.normal(jax.random.PRNGKey(2), (B, H, Nk, D))
            a = small_attention(q, kk, v, group=g)
            b = xla_attention(q, kk, v)
            assert float(jnp.abs(a - b).max()) < 1e-5, (B, H, Nq, Nk, D)

    def test_bf16(self):
        import jax, jax.numpy as jnp
        from align3r_tpu.ops.small_attention import small_attention
        from align3r_tpu.ops.attention import xla_attention
        k = jax.random.PRNGKey(3)
        q = jax.random.normal(k, (1, 4, 128, 64), jnp.bfloat16)
        a = small_attention(q, q, q)
        b = xla_attention(q, q, q)
        assert a.dtype == jnp.bfloat16
        assert float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max()) < 2e-2

    def test_supported_gate(self):
        import jax, jax.numpy as jnp
        from align3r_tpu.ops.small_attention import supported
        mk = lambda n, d: jnp.zeros((1, 1, n, d), jnp.bfloat16)
        assert supported(mk(576, 64), mk(576, 64), mk(576, 64))
        assert not supported(mk(48, 16), mk(48, 16), mk(48, 16))      # tiny: XLA
        assert not supported(mk(8192, 64), mk(8192, 64), mk(8192, 64))  # VMEM


def test_small_attention_grad_matches_xla():
    """small_attention must be differentiable (training on TPU dispatches
    here under attn_impl='auto') with gradients equal to the XLA path's."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from align3r_tpu.ops.small_attention import small_attention
    from align3r_tpu.ops.attention import xla_attention
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (2, 2, 64, 16))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 64, 16))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 64, 16))

    gs = jax.grad(lambda q, k, v: jnp.sum(small_attention(q, k, v) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lambda q, k, v: jnp.sum(xla_attention(q, k, v) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gs, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)
