"""Linear (pixel-shuffle) prediction head — the DPT head's lightweight
alternative (unused by released checkpoints, kept for API parity).

Behavioural reference: /root/reference/dust3r/heads/linear_head.py:12-41:
one Linear from the last decoder tokens to (3+conf)·P² per-patch values,
pixel-shuffled to full resolution, then the standard postprocess.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from align3r_tpu.models import nn
from align3r_tpu.models.postprocess import postprocess


def init_linear_head(key, dec_embed_dim: int, patch_size: int,
                     has_conf: bool = True, dtype=jnp.float32):
    out = (3 + int(has_conf)) * patch_size ** 2
    return {"proj": nn.dense_init(key, dec_embed_dim, out, dtype=dtype)}


def apply_linear_head(p, tokens, grid_hw, img_hw, patch_size: int,
                      depth_mode=None, conf_mode=None):
    """tokens: (B, N, D) LAST decoder layer (hook -1); grid_hw = (nh, nw)."""
    nh, nw = grid_hw
    H, W = img_hw
    B, N, _ = tokens.shape
    feat = nn.dense(p["proj"], tokens.astype(jnp.float32))  # (B, N, C*P*P)
    C = feat.shape[-1] // (patch_size ** 2)
    # pixel shuffle: (B, nh, nw, C, P, P) -> (B, nh*P, nw*P, C)
    feat = feat.reshape(B, nh, nw, C, patch_size, patch_size)
    feat = feat.transpose(0, 1, 4, 2, 5, 3).reshape(B, nh * patch_size,
                                                    nw * patch_size, C)
    out = feat[:, :H, :W, :]
    if depth_mode is None:
        return out
    return postprocess(out, depth_mode, conf_mode)
