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
