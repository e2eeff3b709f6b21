"""SAM2 video model: memory attention + memory encoder + tracking loop.

Behavioural reference: the reference repo drives video mask propagation
through SAM2's torch video predictor (reference sam2/sam2/modeling/sam2_base.py
prepare_memory_conditioned_features / _encode_new_memory and
sam2/modeling/memory_attention.py, memory_encoder.py; exposed via
viser/viser_utils.py get_sam_mask).  Numerics are verified against the
locally installed HF `transformers.models.sam2_video` implementation at tiny
random configs (see tests/test_sam2_video.py).

TPU-first design: HF concatenates a *variable* number of memory frames and
object pointers per tracked frame, which would retrace/recompile under jit at
every new sequence length.  We instead keep a FIXED-CAPACITY memory bank
(1 conditioning slot + `num_maskmem-1` rolling recent slots + a circular
object-pointer buffer) with validity masks, and mask invalid tokens out of
the cross-attention softmax — numerically identical to excluding them, and
the whole per-frame tracking step compiles exactly once.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import nn
from .sam2 import (SAM2Config, sam2_encode_image, sam2_decode_heads,
                   sine_pos_embedding, _lin_t, _c2d_t, _ln_t, _attn_t,
                   _ffn_t, convert_hf_sam2, config_from_hf_sam2)

NO_OBJ_SCORE = -1024.0


@dataclasses.dataclass(frozen=True)
class SAM2VideoConfig:
    """Video additions over the image SAM2Config (HF Sam2VideoConfig,
    configuration_sam2_video.py:280-388)."""
    image: SAM2Config = SAM2Config()
    num_maskmem: int = 7
    sigmoid_scale_for_mem_enc: float = 20.0
    sigmoid_bias_for_mem_enc: float = -10.0
    max_object_pointers: int = 16
    enable_occlusion_spatial_embedding: bool = True
    enable_temporal_pos_encoding_for_object_pointers: bool = True
    multimask_output_for_tracking: bool = True
    # memory attention
    ma_hidden_size: int = 256
    ma_num_layers: int = 4
    ma_num_heads: int = 1
    ma_downsample_rate: int = 1
    ma_ff_hidden_size: int = 2048
    ma_rope_theta: float = 10000.0
    ma_rope_feat_sizes: Tuple[int, int] = (64, 64)
    # memory encoder
    me_hidden_size: int = 256
    mem_dim: int = 64
    mask_downsampler_embed_dim: int = 256
    mask_downsampler_kernel: int = 3
    mask_downsampler_stride: int = 2
    mask_downsampler_padding: int = 1
    mask_downsampler_total_stride: int = 16
    fuser_num_layers: int = 2
    fuser_embed_dim: int = 256
    fuser_intermediate_dim: int = 1024
    fuser_kernel: int = 7
    fuser_padding: int = 3

    @property
    def num_ptr_splits(self) -> int:
        c = self.image.fpn_hidden_size
        return c // self.mem_dim if self.mem_dim < c else 1


# ------------------------------------------------------- 2D axial RoPE

def rotate_pairwise(x):
    """(-x1, x0) interleaved rotation (modeling_sam2_video.py:730-747 —
    NeoX-style *pairwise*, not Llama half-tensor)."""
    x = x.reshape(x.shape[:-1] + (-1, 2))
    return jnp.stack([-x[..., 1], x[..., 0]], axis=-1).reshape(
        x.shape[:-2] + (-1,))


def rope_2d_cos_sin(dim: int, end_x: int, end_y: int, theta: float = 10000.0):
    """Axial 2D rotary tables (modeling_sam2_video.py:695-728).
    Returns (cos, sin), each (end_x*end_y, dim); positions enumerate the
    feature map row-major (x fastest)."""
    assert dim % 4 == 0, "head dim must be divisible by 4 for axial RoPE"
    freqs = 1.0 / theta ** (np.arange(0, dim, 4)[: dim // 4].astype(np.float64)
                            / dim)
    idx = np.arange(end_x * end_y)
    fx = np.outer(idx % end_x, freqs)
    fy = np.outer(idx // end_x, freqs)
    t = np.concatenate([fx, fy], axis=-1)
    t = np.repeat(t, 2, axis=-1)
    return jnp.asarray(np.cos(t), jnp.float32), jnp.asarray(np.sin(t),
                                                            jnp.float32)


def _rope(x, cos, sin):
    xf = x.astype(jnp.float32)
    return xf * cos + rotate_pairwise(xf) * sin


def rope_attention(p, q, k, v, cos, sin, num_heads: int,
                   num_k_exclude_rope: int = 0, rope_k_repeat: bool = False,
                   k_valid=None):
    """Sam2VideoRoPEAttention (modeling_sam2_video.py:796-868).
    q (B, Sq, Cq); k/v (B, Sk, Ckv).  The last `num_k_exclude_rope` key
    tokens (object pointers) skip RoPE.  `k_valid` (B, Sk) masks padded
    memory tokens out of the softmax (our fixed-capacity extension; pass
    None for exact HF behaviour)."""
    B, Sq = q.shape[:2]
    qq = nn.dense(p["q"], q)
    kk = nn.dense(p["k"], k)
    vv = nn.dense(p["v"], v)
    D = qq.shape[-1] // num_heads

    def heads(t):
        return t.reshape(B, -1, num_heads, D).transpose(0, 2, 1, 3)

    qq, kk, vv = heads(qq), heads(kk), heads(vv)
    Sk = kk.shape[2]
    n_rot = Sk - num_k_exclude_rope
    qq = _rope(qq, cos, sin)
    if n_rot > 0:
        cos_k, sin_k = cos, sin
        if rope_k_repeat and n_rot != Sq:
            rep = n_rot // Sq
            cos_k = jnp.tile(cos, (rep, 1))
            sin_k = jnp.tile(sin, (rep, 1))
        k_rot = _rope(kk[:, :, :n_rot], cos_k, sin_k)
        kk = jnp.concatenate([k_rot.astype(kk.dtype),
                              kk[:, :, n_rot:].astype(jnp.float32)], axis=2)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qq, kk.astype(jnp.float32))
    logits = logits / math.sqrt(D)
    if k_valid is not None:
        logits = jnp.where(k_valid[:, None, None, :], logits, -1e30)
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, vv.astype(jnp.float32))
    out = out.transpose(0, 2, 1, 3).reshape(B, Sq, num_heads * D)
    return nn.dense(p["o"], out.astype(q.dtype))


# ---------------------------------------------------- memory attention

def memory_attention_layer(p, queries, memory, mem_pos, cos, sin,
                           cfg: SAM2VideoConfig, num_k_exclude_rope: int = 0,
                           k_valid=None):
    """Pre-LN self-attn + image->memory cross-attn + MLP
    (modeling_sam2_video.py:869-919).  relu MLP (HF default act)."""
    H = cfg.ma_num_heads
    x = nn.layernorm(p["ln1"], queries, eps=1e-5)
    queries = queries + rope_attention(p["self_attn"], x, x, x, cos, sin, H)
    x = nn.layernorm(p["ln2"], queries, eps=1e-5)
    queries = queries + rope_attention(
        p["cross_attn"], x, memory + mem_pos, memory, cos, sin, H,
        num_k_exclude_rope=num_k_exclude_rope, rope_k_repeat=True,
        k_valid=k_valid)
    x = nn.layernorm(p["ln3"], queries, eps=1e-5)
    x = nn.dense(p["fc2"], jax.nn.relu(nn.dense(p["fc1"], x)))
    return queries + x


def memory_attention(p, cur_feats, cur_pos, memory, mem_pos,
                     cfg: SAM2VideoConfig, num_obj_ptr_tokens: int = 0,
                     k_valid=None):
    """Sam2VideoMemoryAttention (modeling_sam2_video.py:920-975), batch-first:
    cur_feats/cur_pos (B, S, C); memory/mem_pos (B, M, mem_dim)."""
    cos, sin = rope_2d_cos_sin(
        cfg.ma_hidden_size // (cfg.ma_downsample_rate * cfg.ma_num_heads),
        *cfg.ma_rope_feat_sizes, cfg.ma_rope_theta)
    x = cur_feats + 0.1 * cur_pos
    for lp in p["layers"]:
        x = memory_attention_layer(lp, x, memory, mem_pos, cos, sin, cfg,
                                   num_k_exclude_rope=num_obj_ptr_tokens,
                                   k_valid=k_valid)
    return nn.layernorm(p["ln"], x, eps=1e-5)


# ------------------------------------------------------ memory encoder

def _depthwise_conv2d(p, x, padding: int):
    """torch depthwise Conv2d (groups=C); kernel stored HWIO with I=1."""
    out = jax.lax.conv_general_dilated(
        x, p["kernel"], window_strides=(1, 1),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])
    return out + p["bias"]


def memory_fuser_block(p, x, cfg: SAM2VideoConfig):
    """ConvNeXt-style CX block (modeling_sam2_video.py:977-1012); NHWC."""
    r = _depthwise_conv2d(p["dwconv"], x, cfg.fuser_padding)
    r = nn.layernorm(p["ln"], r, eps=1e-6)
    r = nn.dense(p["pw2"], nn.gelu(nn.dense(p["pw1"], r)))
    return x + p["scale"] * r


def mask_downsampler(p, masks, cfg: SAM2VideoConfig):
    """Strided conv+LN+GELU pyramid then 1x1 projection
    (modeling_sam2_video.py:1027-1074).  masks (B, H, W, 1)."""
    s, pad = cfg.mask_downsampler_stride, cfg.mask_downsampler_padding
    x = masks
    for lp in p["layers"]:
        x = nn.conv2d(lp["conv"], x, stride=s, padding=[(pad, pad)] * 2)
        x = nn.gelu(nn.layernorm(lp["ln"], x, eps=1e-6))
    return nn.conv2d(p["final"], x, padding="VALID")


def memory_encoder(p, vision_feats, masks, cfg: SAM2VideoConfig):
    """Sam2VideoMemoryEncoder (modeling_sam2_video.py:1075-1107).
    vision_feats (B, h, w, hidden); masks (B, H, W, 1) at image size.
    Returns (features (B, h, w, mem_dim), pos (h, w, mem_dim))."""
    m = mask_downsampler(p["mask_downsampler"], masks, cfg)
    x = nn.conv2d(p["feature_projection"], vision_feats, padding="VALID") + m
    for lp in p["fuser"]:
        x = memory_fuser_block(lp, x, cfg)
    x = nn.conv2d(p["projection"], x, padding="VALID")
    pos = sine_pos_embedding(x.shape[1], x.shape[2], cfg.mem_dim // 2)
    return x, pos


def get_1d_sine_pe(pos, dim: int, temperature: float = 10000.0):
    """modeling_sam2_video.py:1546-1557; pos (...,) -> (..., dim)."""
    pe_dim = dim // 2
    dim_t = jnp.arange(pe_dim, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / pe_dim)
    v = pos[..., None] / dim_t
    return jnp.concatenate([jnp.sin(v), jnp.cos(v)], axis=-1)


# -------------------------------------------------------- memory bank

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MemoryBank:
    """Fixed-capacity tracking state (one object, forward tracking).

    cond_feat   (K, B, HW, mem_dim)  conditioning-frame spatial memories
    cond_valid  (K,) bool
    cond_count  () int32   number of conditioning frames inserted so far
    recent_feat (R, B, HW, mem_dim)  recent[r] = frame at temporal offset r+1
    recent_valid (R,) bool
    ptr         (P, B, C)   object pointers (circular over all frames)
    ptr_frame   (P,) int32  absolute frame index of each pointer
    ptr_valid   (P,) bool
    ptr_is_cond (P,) bool   cond pointers ignore the recency window (HF keeps
                            them regardless of temporal offset)
    ptr_count   () int32
    """
    cond_feat: jnp.ndarray
    cond_valid: jnp.ndarray
    cond_count: jnp.ndarray
    recent_feat: jnp.ndarray
    recent_valid: jnp.ndarray
    ptr: jnp.ndarray
    ptr_frame: jnp.ndarray
    ptr_valid: jnp.ndarray
    ptr_is_cond: jnp.ndarray
    ptr_count: jnp.ndarray


def init_memory_bank(cfg: SAM2VideoConfig, batch: int, hw: int,
                     num_cond_slots: int = 1) -> MemoryBank:
    R = cfg.num_maskmem - 1
    P = cfg.max_object_pointers
    C = cfg.image.fpn_hidden_size
    return MemoryBank(
        cond_feat=jnp.zeros((num_cond_slots, batch, hw, cfg.mem_dim),
                            jnp.float32),
        cond_valid=jnp.zeros((num_cond_slots,), bool),
        cond_count=jnp.int32(0),
        recent_feat=jnp.zeros((R, batch, hw, cfg.mem_dim), jnp.float32),
        recent_valid=jnp.zeros((R,), bool),
        ptr=jnp.zeros((P, batch, C), jnp.float32),
        ptr_frame=jnp.full((P,), -10 ** 6, jnp.int32),
        ptr_valid=jnp.zeros((P,), bool),
        ptr_is_cond=jnp.zeros((P,), bool),
        ptr_count=jnp.int32(0))


def update_memory_bank(bank: MemoryBank, mem_feat, ptr, frame_idx,
                       is_cond: bool) -> MemoryBank:
    """Insert the just-encoded frame.  Conditioning frames fill a circular
    cond slot; tracked frames roll into the recent buffer.  Both append a
    pointer to the circular pointer buffer (HF keeps the num_maskmem-1 /
    max_ptrs-1 most recent non-cond entries, sam2_base semantics, stride 1;
    cond entries persist via ptr_is_cond)."""
    pslot = bank.ptr_count % bank.ptr.shape[0]
    updates = dict(
        ptr=bank.ptr.at[pslot].set(ptr),
        ptr_frame=bank.ptr_frame.at[pslot].set(frame_idx),
        ptr_valid=bank.ptr_valid.at[pslot].set(True),
        ptr_is_cond=bank.ptr_is_cond.at[pslot].set(is_cond),
        ptr_count=bank.ptr_count + 1)
    if is_cond:
        cslot = bank.cond_count % bank.cond_feat.shape[0]
        return dataclasses.replace(
            bank, cond_feat=bank.cond_feat.at[cslot].set(mem_feat),
            cond_valid=bank.cond_valid.at[cslot].set(True),
            cond_count=bank.cond_count + 1, **updates)
    recent = jnp.roll(bank.recent_feat, 1, axis=0).at[0].set(mem_feat)
    rvalid = jnp.roll(bank.recent_valid, 1, axis=0).at[0].set(True)
    return dataclasses.replace(bank, recent_feat=recent, recent_valid=rvalid,
                               **updates)


def prepare_memory_conditioned_features(params, cfg: SAM2VideoConfig,
                                        cur_feats, cur_pos, bank: MemoryBank,
                                        frame_idx, max_ptr_use):
    """Cross-attend current features to the memory bank
    (modeling_sam2_video.py:2291-2394 _prepare_memory_conditioned_features +
    2146-2280 helpers), fixed shapes.  cur_feats/cur_pos (B, HW, C);
    frame_idx traced scalar; max_ptr_use = min(num_frames, max_ptrs)."""
    B, HW, C = cur_feats.shape
    R = cfg.num_maskmem - 1
    K = bank.cond_feat.shape[0]
    pos = sine_pos_embedding(*cfg.ma_rope_feat_sizes[::-1],
                             cfg.mem_dim // 2).reshape(HW, cfg.mem_dim)
    tpe = params["memory_temporal_pe"].reshape(cfg.num_maskmem, 1, cfg.mem_dim)

    # spatial memory: cond frames (temporal offset 0 -> index -1), then
    # recent oldest->newest (offset r+1 -> temporal index r)
    order = jnp.arange(R - 1, -1, -1)
    spatial = jnp.concatenate(
        [bank.cond_feat.transpose(1, 0, 2, 3),
         bank.recent_feat[order].transpose(1, 0, 2, 3)],
        axis=1)                                           # (B, K+R, HW, D)
    spos = jnp.concatenate(
        [jnp.broadcast_to((pos + tpe[-1])[None], (K, HW, cfg.mem_dim)),
         pos[None] + tpe[order]], axis=0)                 # (K+R, HW, D)
    svalid = jnp.concatenate([bank.cond_valid, bank.recent_valid[order]])
    spatial = spatial.reshape(B, (K + R) * HW, cfg.mem_dim)
    spos = jnp.broadcast_to(spos[None], (B, K + R, HW, cfg.mem_dim)
                            ).reshape(B, (K + R) * HW, cfg.mem_dim)
    svalid = jnp.broadcast_to(svalid[None, :, None],
                              (B, K + R, HW)).reshape(B, (K + R) * HW)

    # object pointers: offsets relative to the current frame; eligible when
    # 0 <= offset (cond) / 1 <= offset <= max_ptr_use-1 (tracked)
    offsets = (frame_idx - bank.ptr_frame).astype(jnp.float32)
    pvalid = bank.ptr_valid & (bank.ptr_frame >= 0) & (offsets >= 0)
    pvalid = pvalid & (bank.ptr_is_cond | (offsets <= max_ptr_use - 1))
    if cfg.enable_temporal_pos_encoding_for_object_pointers:
        norm = offsets / jnp.maximum(max_ptr_use - 1, 1).astype(jnp.float32)
        ppos = nn.dense(params["tpe_proj"], get_1d_sine_pe(norm, C))
    else:
        ppos = jnp.zeros((offsets.shape[0], cfg.mem_dim), jnp.float32)
    S = cfg.num_ptr_splits
    P = bank.ptr.shape[0]
    ptr = bank.ptr.transpose(1, 0, 2).reshape(B, P, S, cfg.mem_dim)
    ptr = ptr.reshape(B, P * S, cfg.mem_dim)
    ppos = jnp.broadcast_to(jnp.repeat(ppos, S, axis=0)[None],
                            (B, P * S, cfg.mem_dim))
    pvalid = jnp.broadcast_to(jnp.repeat(pvalid, S)[None], (B, P * S))

    memory = jnp.concatenate([spatial, ptr], axis=1)
    mem_pos = jnp.concatenate([spos, ppos], axis=1)
    k_valid = jnp.concatenate([svalid, pvalid], axis=1)
    return memory_attention(params["memory_attention"], cur_feats, cur_pos,
                            memory, mem_pos, cfg,
                            num_obj_ptr_tokens=P * S, k_valid=k_valid)


# ------------------------------------------------------- per-frame step

def encode_new_memory(params, cfg: SAM2VideoConfig, top_feats,
                      high_res_masks, object_score_logits,
                      is_mask_from_pts: bool):
    """modeling_sam2_video.py:2540-2577 _encode_new_memory.
    top_feats (B, h, w, C); high_res_masks (B, H, W, 1) logits at image
    size.  Returns (B, HW, mem_dim) bf16-rounded like HF."""
    if is_mask_from_pts:
        m = (high_res_masks > 0).astype(jnp.float32)
    else:
        m = jax.nn.sigmoid(high_res_masks)
    m = m * cfg.sigmoid_scale_for_mem_enc + cfg.sigmoid_bias_for_mem_enc
    feats, _pos = memory_encoder(params["memory_encoder"], top_feats, m, cfg)
    if cfg.enable_occlusion_spatial_embedding:
        appearing = (object_score_logits > 0).astype(jnp.float32)
        feats = feats + ((1.0 - appearing)[:, None, None]
                         * params["occlusion_embed"].reshape(1, 1, 1, -1))
    feats = feats.astype(jnp.bfloat16).astype(jnp.float32)
    return feats.reshape(feats.shape[0], -1, cfg.mem_dim)


def _object_pointer(params, sam_tokens, iou, object_score_logits,
                    multimask: bool):
    """SAM output token -> pointer with occlusion mixing
    (modeling_sam2_video.py:2024-2043)."""
    tok = sam_tokens[:, 0, 0]
    if multimask and sam_tokens.shape[2] > 1:
        best = jnp.argmax(iou[:, 0], axis=-1)
        tok = jnp.take_along_axis(sam_tokens[:, 0], best[:, None, None],
                                  axis=1)[:, 0]
    from .sam2 import _ffn
    ptr = _ffn(params["obj_ptr_proj"], tok, 3)
    lam = (object_score_logits > 0).astype(jnp.float32)  # (B, 1)
    return lam * ptr + (1 - lam) * params["no_object_ptr"]


def _upsample_to_image(masks, size: int):
    """bilinear align_corners=False (F.interpolate) to (size, size)."""
    B = masks.shape[0]
    x = masks.reshape((-1,) + masks.shape[-2:] + (1,))
    x = nn.bilinear_resize(x, size, size, align_corners=False)
    return x.reshape(masks.shape[:-2] + (size, size))


def sam2_video_frame(params, cfg: SAM2VideoConfig, pixel_values,
                     bank: MemoryBank, frame_idx, num_frames,
                     init_mask=None, init_points=None, init_labels=None):
    """One tracking step (HF _run_single_frame_inference).  `init_mask`
    (B, H, W, 1) binary at image size marks a mask-conditioned frame
    (HF _use_mask_as_output semantics); `init_points` (B, P, N, 2) +
    `init_labels` mark a point-conditioned frame (no-memory embedding +
    SAM head with point prompts); tracked frames pass neither.
    Returns (low-res mask logits (B, 1, g4, g4), object_score_logits,
    updated bank)."""
    img = cfg.image
    s0, s1, top, top_pos = sam2_encode_image(params["image"], pixel_values,
                                             img)
    B, h, w, C = top.shape
    is_cond = init_mask is not None or init_points is not None
    if init_points is not None:
        # point-conditioned frame: no-memory embedding, point prompts,
        # multimask when 0<=n_pts<=1 (HF _use_multimask with is_init=True)
        cond_top = top + params["image"]["no_memory_embedding"].reshape(
            1, 1, 1, -1)
        multi = init_points.shape[2] <= 1
        masks, iou, obj_logits, tokens = sam2_decode_heads(
            params["image"], cond_top, s0, s1, None, img,
            multimask_output=multi, input_points=init_points,
            input_labels=init_labels)
        obj_logits = obj_logits[:, 0]
        masks = jnp.where(obj_logits[:, :, None, None] > 0, masks[:, 0],
                          NO_OBJ_SCORE)
        high_res = _upsample_to_image(masks, img.image_size)
        if multi:
            best = jnp.argmax(iou[:, 0], axis=-1)
            low_res = jnp.take_along_axis(masks, best[:, None, None, None],
                                          axis=1)
            high_res = jnp.take_along_axis(high_res,
                                           best[:, None, None, None], axis=1)
        else:
            low_res, high_res = masks[:, :1], high_res[:, :1]
        ptr = _object_pointer(params, tokens, iou, obj_logits, multi)
        high_res = high_res[:, 0][..., None]
    elif is_cond:
        # mask-as-output path: +20/-10 logits, pointer from the SAM head fed
        # the 4x-downsampled mask prompt (modeling_sam2_video.py:2052-2097)
        # HF _use_mask_as_output: the SAM head sees the RAW backbone top
        # features (no no-memory embedding, no memory conditioning)
        high_res = init_mask * 20.0 - 10.0
        prompt = nn.conv2d(params["mask_downsample"], init_mask, stride=4,
                           padding="VALID")
        _m, iou, obj, tokens = sam2_decode_heads(
            params["image"], top, s0, s1, prompt, img,
            multimask_output=False)
        lam = jnp.any(init_mask.reshape(B, -1) > 0, axis=1,
                      keepdims=True).astype(jnp.float32)
        obj_logits = 20.0 * lam - 10.0
        from .sam2 import _ffn
        ptr = _ffn(params["obj_ptr_proj"], tokens[:, 0, 0], 3)
        ptr = lam * ptr + (1 - lam) * params["no_object_ptr"]
        # antialiased bilinear downsample (F.interpolate antialias=True)
        low_res = jax.image.resize(
            high_res[..., 0], (B, img.image_size // 4, img.image_size // 4),
            "linear")[:, None]
    else:
        max_ptr_use = jnp.minimum(num_frames, cfg.max_object_pointers)
        cond = prepare_memory_conditioned_features(
            params, cfg, top.reshape(B, h * w, C),
            top_pos.reshape(B, h * w, C), bank, frame_idx, max_ptr_use)
        multi = cfg.multimask_output_for_tracking
        masks, iou, obj_logits, tokens = sam2_decode_heads(
            params["image"], cond.reshape(B, h, w, C), s0, s1, None, img,
            multimask_output=multi)
        obj_logits = obj_logits[:, 0]
        masks = jnp.where(obj_logits[:, :, None, None] > 0, masks[:, 0],
                          NO_OBJ_SCORE)
        high_res = _upsample_to_image(masks, img.image_size)
        if multi:
            best = jnp.argmax(iou[:, 0], axis=-1)
            low_res = jnp.take_along_axis(
                masks, best[:, None, None, None], axis=1)
            high_res = jnp.take_along_axis(
                high_res, best[:, None, None, None], axis=1)
        else:
            low_res, high_res = masks[:, :1], high_res[:, :1]
        ptr = _object_pointer(params, tokens, iou, obj_logits, multi)
        high_res = high_res[:, 0][..., None]

    mem = encode_new_memory(params, cfg, top, high_res, obj_logits,
                            is_mask_from_pts=is_cond)
    bank = update_memory_bank(bank, mem, ptr, frame_idx, is_cond=is_cond)
    return low_res, obj_logits, bank


def propagate_video(params, cfg: SAM2VideoConfig, frames, seed_masks,
                    num_cond_slots: Optional[int] = None):
    """Track one object through `frames` (T, H, W, 3 — SAM2-normalised at
    image_size) given binary conditioning masks.  `seed_masks` is either a
    single (H, W, 1) mask on frame 0 or a dict {frame_idx: (H, W, 1)}.
    Host loop over two once-compiled steps (cond / tracked) — HF
    propagate_in_video_iterator re-traces per memory length instead.
    Returns (T, g4, g4) mask logits."""
    T = frames.shape[0]
    if not isinstance(seed_masks, dict):
        seed_masks = {0: seed_masks}
    g4 = cfg.image.image_size // 4
    hw = (cfg.image.image_size // 16) ** 2
    K = num_cond_slots if num_cond_slots is not None else \
        max(1, min(len(seed_masks), 8))
    bank = init_memory_bank(cfg, 1, hw, num_cond_slots=K)

    cond_fn = jax.jit(lambda pv, b, i, m: sam2_video_frame(
        params, cfg, pv, b, i, T, init_mask=m))
    step_fn = jax.jit(lambda pv, b, i: sam2_video_frame(
        params, cfg, pv, b, i, T))

    out = np.zeros((T, g4, g4), np.float32)
    start = min(seed_masks)
    out[:start] = -10.0
    for t in range(start, T):
        if t in seed_masks:
            low, _obj, bank = cond_fn(frames[t:t + 1], bank, jnp.int32(t),
                                      seed_masks[t][None])
        else:
            low, _obj, bank = step_fn(frames[t:t + 1], bank, jnp.int32(t))
        out[t] = np.asarray(low[0, 0])
    return out


SAM2_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
SAM2_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess_sam2_frames(images01: np.ndarray, size: int) -> jnp.ndarray:
    """(T, H, W, 3) in [0,1] -> normalised (T, size, size, 3) (HF
    Sam2VideoProcessor: bilinear resize + imagenet normalise)."""
    x = jnp.asarray(np.asarray(images01, np.float32))
    x = nn.bilinear_resize(x, size, size, align_corners=False)
    return (x - SAM2_MEAN) / SAM2_STD


def refine_motion_masks(params, cfg: SAM2VideoConfig, images01, masks,
                        num_cond_slots: int = 8):
    """Reference refine_motion_mask_w_sam2 (cloud_opt_flow/optimizer.py:
    237-312), JAX-native: seed SAM2 video tracking with the motion masks on
    odd frames and collect propagated masks on even frames, then swap roles;
    OR the propagated masks into the input masks.

    images01 (T, H, W, 3) in [0,1]; masks (T, H, W) bool.
    Returns refined (T, H, W) bool."""
    masks = np.asarray(masks).astype(bool)
    T, H, W = masks.shape
    frames = preprocess_sam2_frames(images01, cfg.image.image_size)
    refined = masks.copy()
    for parity in (1, 0):
        seeds = {t: jnp.asarray(
            np.asarray(nn.bilinear_resize(
                jnp.asarray(masks[t][None, ..., None], jnp.float32),
                cfg.image.image_size, cfg.image.image_size,
                align_corners=False)) [0] > 0.5, jnp.float32)
            for t in range(parity, T, 2) if masks[t].any()}
        if not seeds:
            continue
        logits = propagate_video(params, cfg, frames, seeds,
                                 num_cond_slots=num_cond_slots)
        for t in range(1 - parity, T, 2):
            if t < min(seeds):
                continue
            up = nn.bilinear_resize(
                jnp.asarray(logits[t][None, ..., None]), H, W,
                align_corners=False)
            refined[t] |= np.asarray(up[0, ..., 0]) > 0
    return refined


# ----------------------------------------------------------- converter

def load_hf_sam2_video(model_name_or_path: str):
    """Locally-cached HF SAM2 video checkpoint -> (params, cfg)."""
    from transformers import Sam2VideoModel
    model = Sam2VideoModel.from_pretrained(model_name_or_path)
    cfg = config_from_hf_sam2_video(model.config)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return convert_hf_sam2_video(sd, cfg), cfg


def config_from_hf_sam2_video(hf) -> SAM2VideoConfig:
    img = config_from_hf_sam2(hf)
    img = dataclasses.replace(img, image_size=hf.image_size)
    return SAM2VideoConfig(
        image=img, num_maskmem=hf.num_maskmem,
        sigmoid_scale_for_mem_enc=hf.sigmoid_scale_for_mem_enc,
        sigmoid_bias_for_mem_enc=hf.sigmoid_bias_for_mem_enc,
        max_object_pointers=hf.max_object_pointers_in_encoder,
        enable_occlusion_spatial_embedding=hf.enable_occlusion_spatial_embedding,
        enable_temporal_pos_encoding_for_object_pointers=(
            hf.enable_temporal_pos_encoding_for_object_pointers),
        multimask_output_for_tracking=hf.multimask_output_for_tracking,
        ma_hidden_size=hf.memory_attention_hidden_size,
        ma_num_layers=hf.memory_attention_num_layers,
        ma_num_heads=hf.memory_attention_num_attention_heads,
        ma_downsample_rate=hf.memory_attention_downsample_rate,
        ma_ff_hidden_size=hf.memory_attention_feed_forward_hidden_size,
        ma_rope_theta=hf.memory_attention_rope_theta,
        ma_rope_feat_sizes=tuple(hf.memory_attention_rope_feat_sizes),
        me_hidden_size=hf.memory_encoder_hidden_size,
        mem_dim=hf.memory_encoder_output_channels,
        mask_downsampler_embed_dim=hf.mask_downsampler_embed_dim,
        mask_downsampler_kernel=hf.mask_downsampler_kernel_size,
        mask_downsampler_stride=hf.mask_downsampler_stride,
        mask_downsampler_padding=hf.mask_downsampler_padding,
        mask_downsampler_total_stride=hf.mask_downsampler_total_stride,
        fuser_num_layers=hf.memory_fuser_num_layers,
        fuser_embed_dim=hf.memory_fuser_embed_dim,
        fuser_intermediate_dim=hf.memory_fuser_intermediate_dim,
        fuser_kernel=hf.memory_fuser_kernel_size,
        fuser_padding=hf.memory_fuser_padding)


def _dw_t(sd, name):
    """torch depthwise Conv2d (C,1,k,k) -> HWIO (k,k,1,C)."""
    return {"kernel": np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 1, 0),
            "bias": np.asarray(sd[f"{name}.bias"])}


def convert_hf_sam2_video(sd: Dict[str, np.ndarray],
                          cfg: SAM2VideoConfig) -> Dict:
    """HF Sam2VideoModel state dict -> our pytree (memory components; the
    image subtree reuses convert_hf_sam2 — HF shares key names)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    ma_layers = []
    for i in range(cfg.ma_num_layers):
        q = f"memory_attention.layers.{i}"
        ma_layers.append({
            "self_attn": _attn_t(sd, f"{q}.self_attn"),
            "cross_attn": _attn_t(sd, f"{q}.cross_attn_image"),
            "fc1": _lin_t(sd, f"{q}.linear1"),
            "fc2": _lin_t(sd, f"{q}.linear2"),
            "ln1": _ln_t(sd, f"{q}.layer_norm1"),
            "ln2": _ln_t(sd, f"{q}.layer_norm2"),
            "ln3": _ln_t(sd, f"{q}.layer_norm3")})
    n_ds_layers = int(math.log2(cfg.mask_downsampler_total_stride)
                      / math.log2(cfg.mask_downsampler_stride))
    me = "memory_encoder"
    mem_encoder = {
        "mask_downsampler": {
            "layers": [{"conv": _c2d_t(sd, f"{me}.mask_downsampler.layers.{i}.conv"),
                        "ln": _ln_t(sd, f"{me}.mask_downsampler.layers.{i}.layer_norm")}
                       for i in range(n_ds_layers)],
            "final": _c2d_t(sd, f"{me}.mask_downsampler.final_conv")},
        "feature_projection": _c2d_t(sd, f"{me}.feature_projection"),
        "fuser": [{"dwconv": _dw_t(sd, f"{me}.memory_fuser.layers.{i}.depthwise_conv"),
                   "ln": _ln_t(sd, f"{me}.memory_fuser.layers.{i}.layer_norm"),
                   "pw1": _lin_t(sd, f"{me}.memory_fuser.layers.{i}.pointwise_conv1"),
                   "pw2": _lin_t(sd, f"{me}.memory_fuser.layers.{i}.pointwise_conv2"),
                   "scale": np.asarray(sd[f"{me}.memory_fuser.layers.{i}.scale"])}
                  for i in range(cfg.fuser_num_layers)],
        "projection": _c2d_t(sd, f"{me}.projection")}
    params = {
        "image": convert_hf_sam2(sd, cfg.image),
        "memory_attention": {"layers": ma_layers,
                             "ln": _ln_t(sd, "memory_attention.layer_norm")},
        "memory_encoder": mem_encoder,
        "memory_temporal_pe": np.asarray(sd["memory_temporal_positional_encoding"]),
        "no_object_ptr": np.asarray(sd["no_object_pointer"]),
        "mask_downsample": _c2d_t(sd, "mask_downsample"),
        "obj_ptr_proj": _ffn_t(sd, "object_pointer_proj", 1),
    }
    if cfg.enable_temporal_pos_encoding_for_object_pointers:
        params["tpe_proj"] = _lin_t(
            sd, "temporal_positional_encoding_projection_layer")
    if cfg.enable_occlusion_spatial_embedding:
        params["occlusion_embed"] = np.asarray(
            sd["occlusion_spatial_embedding_parameter"])
    return jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32) if isinstance(x, np.ndarray)
        else x, params, is_leaf=lambda x: isinstance(x, np.ndarray))
