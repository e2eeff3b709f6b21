"""Grouped dual-stream decoder == two-calls-per-layer reference structure.

decode_pair(stacked=True) runs dec_blocks/dec_blocks2 as one grouped
computation per layer (blocks.apply_decoder_block_stacked); it must be
bit-exact vs the unstacked path (reference structure
/root/reference/dust3r/model.py:216-233) in fp32.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from align3r_tpu.models.config import Align3RConfig
from align3r_tpu.models.align3r import (init_align3r, encode_images,
                                        embed_point_cloud, decode_pair)


@pytest.fixture(scope="module")
def setup():
    cfg = Align3RConfig(img_size=(32, 48), patch_size=16, enc_embed_dim=64,
                        enc_depth=2, enc_num_heads=2, dec_embed_dim=48,
                        dec_depth=8, dec_num_heads=2)
    params = init_align3r(jax.random.PRNGKey(0), cfg)
    B, H, W = 2, 32, 48
    img = jax.random.normal(jax.random.PRNGKey(1), (2 * B, H, W, 3))
    feats, pos = encode_images(params, img, cfg, dtype=jnp.float32)
    pc = jax.random.normal(jax.random.PRNGKey(2), (2 * B, H, W, 3))
    pct, pcp = embed_point_cloud(params, pc, cfg, dtype=jnp.float32)
    return cfg, params, (feats[:B], pos[:B], feats[B:], pos[B:], pct, pcp)


def test_stacked_decoder_bitexact_fp32(setup):
    cfg, params, args = setup
    h1a, h2a = decode_pair(params, *args, cfg, dtype=jnp.float32, stacked=False)
    h1b, h2b = decode_pair(params, *args, cfg, dtype=jnp.float32, stacked=True)
    for i, (a, b) in enumerate(zip(h1a + h2a, h1b + h2b)):
        d = float(jnp.abs(a - b).max())
        assert d < 1e-5 * max(float(jnp.abs(a).max()), 1.0), (i, d)


def test_stacked_decoder_bf16_close(setup):
    """bf16 activations: same math modulo reduction-order rounding."""
    cfg, params, args = setup
    h1a, _ = decode_pair(params, *args, cfg, dtype=jnp.bfloat16, stacked=False)
    h1b, _ = decode_pair(params, *args, cfg, dtype=jnp.bfloat16, stacked=True)
    for a, b in zip(h1a, h1b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=0.15, rtol=0.1)


def test_prestacked_params_bitexact(setup):
    """stack_decoder_params (engine one-time prep) must not change results:
    fp32 compute with fp32-prestacked kernels is bit-exact; the engine's
    bf16 prestack matches the plain bf16 path exactly (the inline path casts
    kernels to bf16 at use anyway)."""
    from align3r_tpu.models.align3r import stack_decoder_params
    cfg, params, args = setup
    h1a, h2a = decode_pair(params, *args, cfg, dtype=jnp.float32, stacked=True)
    pf = stack_decoder_params(params, dtype=jnp.float32)
    h1b, h2b = decode_pair(pf, *args, cfg, dtype=jnp.float32, stacked=True)
    for a, b in zip(h1a + h2a, h1b + h2b):
        assert float(jnp.abs(a - b).max()) == 0.0

    h1c, _ = decode_pair(params, *args, cfg, dtype=jnp.bfloat16, stacked=True)
    pb = stack_decoder_params(params, dtype=jnp.bfloat16)
    h1d, _ = decode_pair(pb, *args, cfg, dtype=jnp.bfloat16, stacked=True)
    for a, b in zip(h1c, h1d):
        assert float(jnp.abs(a - b).max()) == 0.0


def test_stacked_decoder_remat(setup):
    cfg, params, args = setup
    h1a, _ = decode_pair(params, *args, cfg, dtype=jnp.float32, stacked=True)
    h1b, _ = decode_pair(params, *args, cfg, dtype=jnp.float32, stacked=True,
                         remat=True)
    for a, b in zip(h1a, h1b):
        assert float(jnp.abs(a - b).max()) < 1e-6
