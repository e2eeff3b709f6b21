"""The Align3R two-view network (AsymmetricCroCo3DStereo), TPU-native.

Behavioural reference: /root/reference/dust3r/model.py:65-257 and
/root/reference/croco/models/croco.py:21-208. Two shared-weight ViT encoders,
two cross-attending decoders, DPT heads, plus the Align3R monocular-prior
branch: a dedicated point-cloud patch embed (model.py:112), dec_depth//2-2
extra encoder-style blocks `dec_blocks_pc` (croco.py:78-80) and zero-init 1x1
convs injecting prior tokens into both decoder streams at the embed layer and
after each of the first len(dec_blocks_pc) decoder layers (model.py:209-226).

TPU-first design choices vs the reference:
- functional param pytree; per-layer params stacked for `lax.scan` (one
  compiled block body per depth instead of 24/12 unrolled HLO copies);
- encoder/decoder run in bf16, heads in fp32 (mirrors the reference's AMP
  boundary, model.py:252-254);
- landscape-only static shapes: portrait images are pre-transposed on the
  host and outputs swapped back (replaces ManyAR_PatchEmbed's dynamic
  boolean indexing, dust3r/patch_embed.py:32-70, and transpose_to_landscape,
  dust3r/utils/misc.py:54-100);
- images and priors are NHWC.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from align3r_tpu.models import nn
from align3r_tpu.models import blocks as B
from align3r_tpu.models.config import Align3RConfig
from align3r_tpu.models.dpt_head import init_dpt_head, apply_dpt_head

Params = Dict[str, Any]


# ------------------------------------------------------------------- init

def init_align3r(key, cfg: Align3RConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 64))
    nxt = lambda: next(keys)
    D_ENC, D_DEC = cfg.enc_embed_dim, cfg.dec_embed_dim

    enc_blocks = [B.init_block(nxt(), D_ENC, cfg.enc_num_heads, cfg.mlp_ratio, dtype)
                  for _ in range(cfg.enc_depth)]
    dec_blocks = [B.init_decoder_block(nxt(), D_DEC, cfg.dec_num_heads, cfg.mlp_ratio,
                                       cfg.norm_im2_in_dec, dtype)
                  for _ in range(cfg.dec_depth)]
    dec_blocks2 = [B.init_decoder_block(nxt(), D_DEC, cfg.dec_num_heads, cfg.mlp_ratio,
                                        cfg.norm_im2_in_dec, dtype)
                   for _ in range(cfg.dec_depth)]
    pc_blocks = [B.init_block(nxt(), D_DEC, cfg.dec_num_heads, cfg.mlp_ratio, dtype)
                 for _ in range(cfg.n_pc_blocks)]
    zero_convs = [nn.conv1d_init(nxt(), D_DEC, D_DEC, zero=True, dtype=dtype)
                  for _ in range(cfg.n_zero_convs)]

    params: Params = {
        "patch_embed": B.init_patch_embed(nxt(), cfg.patch_size, 3, D_ENC, dtype),
        "patch_embed_point_cloud": B.init_patch_embed(nxt(), cfg.patch_size, 3, D_DEC, dtype),
        "enc_blocks": nn.stack_layers(enc_blocks),
        "enc_norm": nn.layernorm_init(D_ENC, dtype),
        "decoder_embed": nn.dense_init(nxt(), D_ENC, D_DEC, dtype=dtype),
        "dec_blocks": nn.stack_layers(dec_blocks),
        "dec_blocks2": nn.stack_layers(dec_blocks2),
        "dec_blocks_pc": nn.stack_layers(pc_blocks),
        "dec_norm": nn.layernorm_init(D_DEC, dtype),
        "zero_convs": nn.stack_layers(zero_convs),
    }
    if cfg.head_type == "dpt":
        nch = 3 + (1 if cfg.conf_mode is not None else 0)
        params["head1"] = init_dpt_head(nxt(), cfg.dpt_dim_tokens(), nch, dtype=dtype)
        params["head2"] = init_dpt_head(nxt(), cfg.dpt_dim_tokens(), nch, dtype=dtype)
    else:
        raise NotImplementedError(cfg.head_type)
    return params


def _ckpt(fn, remat):
    """Rematerialisation wrapper for a per-layer block function.

    remat: False (save all activations) | True / 'full' (recompute the whole
    block in the backward — the reference fine-tune's memory posture) |
    'dots' (save weight-matmul outputs, recompute only elementwise/LN/softmax
    and the batched attention dots — trades ~1x forward FLOPs of backward
    recompute for a few MB of saved (B, N, D) activations per layer; only
    the trainable decoder blocks have a live backward, so the encoder's
    choice is moot under the fine-tune freeze list)."""
    if not remat or remat == "none":
        return fn
    if remat is True or remat == "full":
        return jax.checkpoint(fn)
    if remat == "dots":
        return jax.checkpoint(
            fn, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    raise ValueError(f"unknown remat mode {remat!r}")


# ---------------------------------------------------------------- encoder

def encode_images(params: Params, imgs: jnp.ndarray, cfg: Align3RConfig,
                  dtype=jnp.bfloat16, attn_impl: str = "auto",
                  remat: bool | str = False, unroll: int = 1):
    """ViT encoder over a batch of images.

    imgs: (B, H, W, 3) NHWC, landscape. Returns (tokens (B, N, D) fp32,
    positions (B, N, 2) int32).
    Reference: dust3r/model.py:151-163 (_encode_image).
    """
    x, pos = B.apply_patch_embed(params["patch_embed"], imgs.astype(dtype), cfg.patch_size)
    if cfg.pos_embed == "cosine":  # croco.py:147-148 (RoPE adds nothing here)
        from align3r_tpu.models.rope import sincos_pos_embed
        x = x + sincos_pos_embed(pos, cfg.enc_embed_dim).astype(x.dtype)

    block_fn = functools.partial(B.apply_block, num_heads=cfg.enc_num_heads,
                                 rope_base=cfg.effective_rope_base,
                                 attn_impl=attn_impl)
    block_fn = _ckpt(block_fn, remat)

    def body(carry, layer_params):
        return block_fn(layer_params, carry, pos), None

    x, _ = jax.lax.scan(body, x, params["enc_blocks"], unroll=unroll)
    x = nn.layernorm(params["enc_norm"], x)
    return x.astype(jnp.float32), pos


def embed_point_cloud(params: Params, prior_pc: jnp.ndarray, cfg: Align3RConfig,
                      dtype=jnp.bfloat16):
    """Patch-embed the normalised prior pointclouds. prior_pc: (B, H, W, 3)."""
    tok, pos = B.apply_patch_embed(params["patch_embed_point_cloud"],
                                   prior_pc.astype(dtype), cfg.patch_size)
    return tok, pos


# ---------------------------------------------------------------- decoder

def _zero_conv(p, x):
    return nn.dense(p, x)


def decode_pair(params: Params, feat1, pos1, feat2, pos2, pc_tokens, pc_pos,
                cfg: Align3RConfig, dtype=jnp.bfloat16, attn_impl: str = "auto",
                remat: bool | str = False, stacked: bool = True, unroll: int = 1):
    """Dual cross-attending decoder with prior injection.

    feat1/feat2: (B, N, D_enc) encoder outputs; pc_tokens: (2B, N, D_dec)
    stacked prior tokens for [view1; view2]. Returns per-view hook lists
    [enc_out, dec_6, dec_9, dec_norm(dec_12)] in fp32 (hooks cfg.dpt_hooks()).
    Reference: dust3r/model.py:201-233.

    stacked=True (default) executes both streams as one grouped computation
    per layer (blocks.apply_decoder_block_stacked): half the ops in the
    decode program, same math; stacked=False is the two-calls-per-layer
    reference structure kept for A/B parity tests.
    """
    n_pc = cfg.n_pc_blocks
    hooks = cfg.dpt_hooks()  # [0, 6, 9, 12] for dec_depth 12
    B_ = feat1.shape[0]

    f1 = nn.dense(params["decoder_embed"], feat1.astype(dtype))
    f2 = nn.dense(params["decoder_embed"], feat2.astype(dtype))
    if cfg.pos_embed == "cosine":  # croco.py:192-194 (not added to priors)
        from align3r_tpu.models.rope import sincos_pos_embed
        f1 = f1 + sincos_pos_embed(pos1, cfg.dec_embed_dim).astype(f1.dtype)
        f2 = f2 + sincos_pos_embed(pos2, cfg.dec_embed_dim).astype(f2.dtype)
    pc = pc_tokens.astype(dtype)
    pc1, pc2 = pc[:B_], pc[B_:]

    zc = params["zero_convs"]
    f1 = f1 + _zero_conv(nn.layer_slice(zc, 0), pc1)
    f2 = f2 + _zero_conv(nn.layer_slice(zc, 0), pc2)

    dec_fn = functools.partial(B.apply_decoder_block, num_heads=cfg.dec_num_heads,
                               rope_base=cfg.effective_rope_base,
                               attn_impl=attn_impl)
    pc_fn = functools.partial(B.apply_block, num_heads=cfg.dec_num_heads,
                              rope_base=cfg.effective_rope_base,
                              attn_impl=attn_impl)
    dec_fn = _ckpt(dec_fn, remat)
    pc_fn = _ckpt(pc_fn, remat)

    take = lambda tree, lo, hi: jax.tree.map(lambda x: x[lo:hi], tree)

    if stacked:
        dec_s_fn = functools.partial(B.apply_decoder_block_stacked,
                                     num_heads=cfg.dec_num_heads,
                                     rope_base=cfg.effective_rope_base,
                                     attn_impl=attn_impl)
        dec_s_fn = _ckpt(dec_s_fn, remat)
        # per-layer params stacked over the stream axis: (L, 2, ...).
        # stack_decoder_params pre-computes this once per weight set; the
        # inline fallback re-copies the decoder weights inside every decode
        # program (measured ~7% of decode device time at ViT-L).
        dec_lg = params.get("dec_blocks_lg")
        if dec_lg is None:
            dec_lg = jax.tree.map(lambda a, b: jnp.stack([a, b], axis=1),
                                  params["dec_blocks"], params["dec_blocks2"])
        f = jnp.stack([f1, f2])                        # (2, B, N, D)
        pos_s = jnp.stack([pos1, pos2])                # (2, B, N, 2)
        # pc is already (2B, N, D) from the slice above — no re-concat

        def body_pc_s(carry, layer):
            f, pc = carry
            p_dec_s, p_pc, p_zc = layer
            nf = dec_s_fn(p_dec_s, f, pos_s)
            pc = pc_fn(p_pc, pc, pc_pos)
            inj = _zero_conv(p_zc, pc)                 # (2B, N, D)
            nf = nf + inj.reshape(2, B_, *inj.shape[1:])
            return (nf, pc), None

        def body_plain_s(carry, p_dec_s):
            return dec_s_fn(p_dec_s, carry, pos_s), None

        # Segmented scans with cut points at the prior-branch boundary and at
        # every DPT hook: only hook-layer activations leave the loop. The
        # previous single-ys form accumulated EVERY layer's (2,B,N,D) output
        # via dynamic-update-slice (~19% of decode device time at ViT-L) just
        # to slice out 3 of 12 layers afterwards.
        cuts = sorted({n_pc, *hooks[1:]})
        cuts = [c for c in cuts if 0 < c <= cfg.dec_depth]
        captured = {}
        lo = 0
        for hi in cuts:
            if hi <= n_pc:
                seg = (take(dec_lg, lo, hi),
                       take(params["dec_blocks_pc"], lo, hi),
                       take(zc, lo + 1, hi + 1))
                (f, pc), _ = jax.lax.scan(body_pc_s, (f, pc), seg,
                                          unroll=unroll)
            else:
                f, _ = jax.lax.scan(body_plain_s, f, take(dec_lg, lo, hi),
                                    unroll=unroll)
            captured[hi] = f
            lo = hi
        ymap1 = {h: captured[h][0] for h in hooks[1:]}
        ymap2 = {h: captured[h][1] for h in hooks[1:]}
    else:
        def body_pc(carry, layer):
            f1, f2, pc1, pc2 = carry
            p_dec, p_dec2, p_pc, p_zc = layer
            nf1 = dec_fn(p_dec, f1, f2, pos1, pos2)
            nf2 = dec_fn(p_dec2, f2, f1, pos2, pos1)
            # prior branch update + zero-conv injection (model.py:223-226)
            pc_cat = jnp.concatenate([pc1, pc2], axis=0)
            pc_cat = pc_fn(p_pc, pc_cat, pc_pos)
            npc1, npc2 = pc_cat[:B_], pc_cat[B_:]
            nf1 = nf1 + _zero_conv(p_zc, npc1)
            nf2 = nf2 + _zero_conv(p_zc, npc2)
            return (nf1, nf2, npc1, npc2), (nf1, nf2)

        def body_plain(carry, layer):
            f1, f2 = carry
            p_dec, p_dec2 = layer
            nf1 = dec_fn(p_dec, f1, f2, pos1, pos2)
            nf2 = dec_fn(p_dec2, f2, f1, pos2, pos1)
            return (nf1, nf2), (nf1, nf2)

        # segment A: layers [0, n_pc) with prior injection
        segA = (take(params["dec_blocks"], 0, n_pc),
                take(params["dec_blocks2"], 0, n_pc),
                params["dec_blocks_pc"], take(zc, 1, n_pc + 1))
        (f1, f2, _, _), (ys1a, ys2a) = jax.lax.scan(body_pc, (f1, f2, pc1, pc2), segA)
        # segment B: remaining layers
        segB = (take(params["dec_blocks"], n_pc, cfg.dec_depth),
                take(params["dec_blocks2"], n_pc, cfg.dec_depth))
        (f1, f2), (ys1b, ys2b) = jax.lax.scan(body_plain, (f1, f2), segB)

        ys1 = jnp.concatenate([ys1a, ys1b], axis=0)  # (dec_depth, B, N, D)
        ys2 = jnp.concatenate([ys2a, ys2b], axis=0)
        ymap1 = {h: ys1[h - 1] for h in hooks[1:]}
        ymap2 = {h: ys2[h - 1] for h in hooks[1:]}

    def hook_list(enc_feat, ymap):
        out = [enc_feat.astype(jnp.float32)]
        for h in hooks[1:-1]:
            out.append(ymap[h].astype(jnp.float32))
        final = nn.layernorm(params["dec_norm"], ymap[hooks[-1]])
        out.append(final.astype(jnp.float32))
        return out

    return hook_list(feat1, ymap1), hook_list(feat2, ymap2)


# stack_decoder_params cache: repeated per-video engine calls pass the SAME
# raw params dict, and restacking discards + rebuilds the full decoder weight
# set each time. Keyed on (id(params), dtype); the cache value pins the
# original dict so its id cannot be recycled. SINGLE entry: caching more
# would pin evicted models' full weight sets in HBM (a ViT-L set is ~3 GB
# on a 16 GB chip); loading a new checkpoint evicts the old one.
_STACK_CACHE: dict = {}
_STACK_CACHE_SIZE = 1


def stack_decoder_params(params: Params, dtype=jnp.bfloat16) -> Params:
    """One-time decode prep: adds 'dec_blocks_lg', the two decoder streams'
    per-layer params stacked over a stream axis ((L, 2, ...) leaves), with
    matmul kernels pre-cast to the compute dtype.

    decode_pair's grouped path needs this interleaved layout; building it
    inside the jitted decode program re-copies the full decoder weight set
    (~900 MB fp32 at ViT-L) every call. Pre-casting kernels to bf16 also
    halves their HBM read traffic per layer; numerics are unchanged because
    the block functions cast kernels to the activation dtype at use anyway
    (LayerNorm params and biases stay fp32).

    Results are memoised on the identity of `params` (mutating a cached
    params dict in place and re-calling is not supported — reload instead).
    """
    if "dec_blocks_lg" in params:
        return params
    ck = (id(params), jnp.dtype(dtype).name)
    hit = _STACK_CACHE.get(ck)
    if hit is not None and hit[0] is params:
        return hit[1]

    def cast_kernels(node):
        if isinstance(node, dict):
            return {k: (v.astype(dtype) if k == "kernel" else cast_kernels(v))
                    for k, v in node.items()}
        return node

    lg = jax.tree.map(lambda a, b: jnp.stack([a, b], axis=1),
                      params["dec_blocks"], params["dec_blocks2"])
    out = dict(params)
    out["dec_blocks_lg"] = cast_kernels(lg)
    while len(_STACK_CACHE) >= _STACK_CACHE_SIZE:
        _STACK_CACHE.pop(next(iter(_STACK_CACHE)))
    _STACK_CACHE[ck] = (params, out)
    return out


# ---------------------------------------------------------------- forward

def apply_align3r(params: Params, view1: Dict[str, jnp.ndarray],
                  view2: Dict[str, jnp.ndarray], cfg: Align3RConfig,
                  dtype=jnp.bfloat16, attn_impl: str = "auto",
                  remat: bool | str = False,
                  head_dtype=jnp.float32) -> Tuple[Dict, Dict]:
    """Full two-view forward.

    view*: dicts with 'img' (B, H, W, 3) and 'pred_depth' (B, H, W, 3)
    (the normalised monocular-prior pointcloud). Returns
    (res1{pts3d, conf}, res2{pts3d_in_other_view, conf}); view2's points are
    expressed in view1's camera frame (reference dust3r/model.py:241-257).
    """
    img1, img2 = view1["img"], view2["img"]
    Bsz, H, W, _ = img1.shape
    # shared-weight encoder over both views in one batch (model.py:165-175)
    feats, pos = encode_images(params, jnp.concatenate([img1, img2], axis=0),
                               cfg, dtype, attn_impl, remat)
    feat1, feat2 = feats[:Bsz], feats[Bsz:]
    pos1, pos2 = pos[:Bsz], pos[Bsz:]

    pc = jnp.concatenate([view1["pred_depth"], view2["pred_depth"]], axis=0)
    pc_tokens, pc_pos = embed_point_cloud(params, pc, cfg, dtype)

    hooks1, hooks2 = decode_pair(params, feat1, pos1, feat2, pos2,
                                 pc_tokens, pc_pos, cfg, dtype, attn_impl, remat)

    grid = (H // cfg.patch_size, W // cfg.patch_size)
    # head_dtype=fp32 is the reference AMP boundary (model.py:252-254);
    # bf16 runs the conv pyramid at half the HBM traffic with the final
    # regression conv + postprocess pinned fp32 (the engine's default) —
    # a real lever on the BANDWIDTH-bound train step (r5 roofline)
    res1 = apply_dpt_head(params["head1"], hooks1, grid, (H, W),
                          cfg.depth_mode, cfg.conf_mode, dtype=head_dtype)
    res2 = apply_dpt_head(params["head2"], hooks2, grid, (H, W),
                          cfg.depth_mode, cfg.conf_mode, dtype=head_dtype)
    res2["pts3d_in_other_view"] = res2.pop("pts3d")
    return res1, res2
