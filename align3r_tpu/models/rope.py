"""2D rotary position embedding (RoPE2D), pure jnp.

Semantics match the reference torch fallback
(/root/reference/croco/models/pos_embed.py:110-157) and the curope CUDA kernel
(croco/models/curope/kernels.cu:17-108): the head dim is split in two halves;
the first half is rotated by the token's y coordinate, the second by its x
coordinate. Within each half, rotation is GPT-NeoX style: freqs of length
D/4 duplicated, rotate_half = (-x2, x1).

Instead of the reference's cached cos/sin embedding tables indexed by integer
positions, we compute cos/sin directly from the (possibly float) position
tensor — shape-static, fusible, and identical numerically for integer
positions.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def rope_cos_sin(pos1d: jnp.ndarray, half_dim: int, base: float = 100.0, dtype=jnp.float32):
    """cos/sin tables for 1D positions.

    pos1d: (..., N) positions. Returns cos, sin of shape (..., N, half_dim)
    where the frequency layout is cat(f, f) with f = base^(-2i/half_dim),
    i in [0, half_dim/2).
    """
    D = half_dim
    inv_freq = 1.0 / (base ** (jnp.arange(0, D, 2, dtype=jnp.float32) / D))  # (D/2,)
    freqs = pos1d[..., None].astype(jnp.float32) * inv_freq  # (..., N, D/2)
    freqs = jnp.concatenate([freqs, freqs], axis=-1)  # (..., N, D)
    return jnp.cos(freqs).astype(dtype), jnp.sin(freqs).astype(dtype)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope1d(tokens: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """tokens: (B, H, N, D); cos/sin: (B, N, D) broadcast over heads."""
    cos = cos[:, None]
    sin = sin[:, None]
    return tokens * cos + _rotate_half(tokens) * sin


@functools.lru_cache(maxsize=8)
def _rope_rotation_matrix(D: int):
    """Constant (D, D) matrix M with (t @ M) == rotate_half applied within
    each D/2 half: out[i] = -t[i+q] for the first quarter of each half and
    out[i] = t[i-q] for the second (q = D//4).

    TPU rationale: jnp.split/concatenate on the last (lane) axis forces
    relayouts of the whole (B, H, N, D) tensor when the rope application is
    dispatched standalone; a constant DxD matmul does the permutation on
    the MXU with no lane shuffles.  Inside the fully fused encoder/decoder
    program XLA absorbs either form (measured ~equal end-to-end on v5e);
    the matmul form keeps standalone/microkernel uses fast too."""
    q = D // 4
    m = np.zeros((D, D), np.float32)
    for h in (0, 2 * q):                      # the y-half and the x-half
        for i in range(q):
            m[h + q + i, h + i] = -1.0        # out[:q] = -in[q:2q]
            m[h + i, h + q + i] = 1.0         # out[q:2q] = in[:q]
    return m


def apply_rope2d(tokens: jnp.ndarray, positions: jnp.ndarray, base: float = 100.0):
    """RoPE2D on attention heads.

    tokens: (B, H, N, D) with D % 4 == 0; positions: (B, N, 2) as (y, x).
    Returns rotated tokens, same shape/dtype.
    """
    D = tokens.shape[-1]
    assert D % 4 == 0, f"head dim {D} must be divisible by 4 for RoPE2D"
    half = D // 2
    dtype = tokens.dtype
    cos_y, sin_y = rope_cos_sin(positions[..., 0], half, base, dtype)
    cos_x, sin_x = rope_cos_sin(positions[..., 1], half, base, dtype)
    cos = jnp.concatenate([cos_y, cos_x], axis=-1)[:, None]   # (B, 1, N, D)
    sin = jnp.concatenate([sin_y, sin_x], axis=-1)[:, None]
    rot = jnp.asarray(_rope_rotation_matrix(D), dtype)
    rotated = jax.lax.dot_general(
        tokens, rot, (((tokens.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=dtype)
    return tokens * cos + rotated * sin


def make_grid_positions(h: int, w: int, batch: int | None = None, dtype=jnp.int32):
    """Token (y, x) positions for an h x w patch grid, row-major.

    Returns (h*w, 2) or (batch, h*w, 2). Matches PositionGetter
    (reference croco/models/blocks.py:195-208, cartesian_prod(y, x)).
    """
    ys = jax.lax.broadcasted_iota(dtype, (h, w), 0)
    xs = jax.lax.broadcasted_iota(dtype, (h, w), 1)
    pos = jnp.stack([ys, xs], axis=-1).reshape(h * w, 2)
    if batch is not None:
        pos = jnp.broadcast_to(pos[None], (batch, h * w, 2))
    return pos


# ------------------------------------------- sincos tables (pos_embed='cosine')

def sincos_pos_embed_1d(dim: int, pos):
    """MAE-style 1D sincos table at positions `pos` (...,) -> (..., dim)
    (reference croco/models/pos_embed.py:46-61)."""
    omega = 1.0 / 10000.0 ** (jnp.arange(dim // 2, dtype=jnp.float32)
                              / (dim / 2.0))
    out = pos.astype(jnp.float32)[..., None] * omega
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=-1)


def sincos_pos_embed(positions, dim: int):
    """2D sincos table at token positions (..., 2) of (y, x) ints ->
    (..., dim).  First half encodes x, second half y: the reference builds
    the grid with w first (croco/models/pos_embed.py:31 meshgrid(grid_w,
    grid_h); emb = [emb(grid[0]=x), emb(grid[1]=y)])."""
    return jnp.concatenate([sincos_pos_embed_1d(dim // 2, positions[..., 1]),
                            sincos_pos_embed_1d(dim // 2, positions[..., 0])],
                           axis=-1)


def interpolate_pos_embed(table, old_hw, new_hw):
    """Bicubic grid resize of a stored (old_h*old_w, D) table to
    (new_h*new_w, D) (reference croco/models/pos_embed.py:69-98; only needed
    when loading cosine checkpoints at a different resolution)."""
    t = jnp.asarray(table).reshape(old_hw[0], old_hw[1], -1)
    t = jax.image.resize(t, (new_hw[0], new_hw[1], t.shape[-1]), "cubic")
    return t.reshape(new_hw[0] * new_hw[1], -1)
