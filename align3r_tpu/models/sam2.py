"""SAM2 image model (Hiera encoder + FPN neck + prompt encoder + mask
decoder) in JAX.

Role in the pipeline: mask refinement for dynamic-object masks
(/root/reference/dust3r/cloud_opt_flow/optimizer.py:237-312 uses the SAM2
VIDEO predictor; pose_test.py:44 defaults it OFF). This module ports the
image-level model — prompt-with-mask segmentation per frame; the video
memory-attention loop stays on the torch integration path
(models/sam2_refine.py) until the round-2 port.

Architecture matched against the local HF implementation
(transformers/models/sam2/modeling_sam2.py), the numeric oracle in tests:
- Hiera: conv patch embed, interpolated background pos embed + tiled window
  pos embed, multi-scale blocks with window attention and query pooling
  (modeling_sam2.py:278-650)
- Neck: lateral 1x1 convs + nearest top-down FPN + normalised sine pos
  encodings (195-245)
- Prompt encoder: gaussian positional embedding, 3-conv mask embedding,
  no-mask/point embeddings (699-845)
- Mask decoder: two-way transformer, upscaling with skip feats s0/s1,
  hypernetwork mask heads, IoU + object-score heads, dynamic multimask via
  stability (908-1275)
NHWC throughout.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from align3r_tpu.models import nn
from align3r_tpu.ops.attention import xla_attention


# ------------------------------------------------------------------ config

@dataclasses.dataclass(frozen=True)
class HieraConfig:
    hidden_size: int = 96
    num_heads_per_stage: Tuple[int, ...] = (1, 2, 4, 8)
    blocks_per_stage: Tuple[int, ...] = (1, 2, 7, 2)
    embed_dim_per_stage: Tuple[int, ...] = (96, 192, 384, 768)
    window_size_per_stage: Tuple[int, ...] = (8, 4, 14, 7)
    global_attention_blocks: Tuple[int, ...] = (5, 7, 9)
    query_stride: Tuple[int, int] = (2, 2)
    num_query_pool_stages: int = 3
    patch_kernel: int = 7
    patch_stride: int = 4
    patch_padding: int = 3
    window_pos_bg_size: Tuple[int, int] = (14, 14)
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-6


@dataclasses.dataclass(frozen=True)
class SAM2Config:
    hiera: HieraConfig = HieraConfig()
    backbone_channel_list: Tuple[int, ...] = (768, 384, 192, 96)
    fpn_hidden_size: int = 256
    fpn_top_down_levels: Tuple[int, ...] = (2, 3)
    num_feature_levels: int = 3
    image_size: int = 1024
    patch_size: int = 16                      # prompt-encoder grid divisor
    prompt_hidden_size: int = 256
    mask_input_channels: int = 16
    decoder_hidden_size: int = 256
    decoder_num_heads: int = 8
    decoder_mlp_dim: int = 2048
    decoder_layers: int = 2
    decoder_downsample_rate: int = 2
    num_multimask_outputs: int = 3
    iou_head_hidden_dim: int = 256
    iou_head_depth: int = 3
    stability_delta: float = 0.05
    stability_thresh: float = 0.98
    layer_norm_eps: float = 1e-6

    @property
    def embed_grid(self):
        g = self.image_size // self.patch_size
        return (g, g)


# ------------------------------------------------------------- Hiera trunk

def _window_partition(x, ws):
    B, H, W, C = x.shape
    ph, pw = (-H) % ws, (-W) % ws
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws, ws, C), (Hp, Wp)


def _window_unpartition(win, ws, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = win.shape[0] // (Hp * Wp // ws // ws)
    x = win.reshape(B, Hp // ws, Wp // ws, ws, ws, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, Hp, Wp, -1)[:, :H, :W]


def _max_pool(x, stride):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, stride, stride, 1),
        (1, stride, stride, 1), "VALID")


def _ms_attention(p, x, num_heads, query_stride):
    B, H, W, _ = x.shape
    qkv = nn.dense(p["qkv"], x.reshape(B, H * W, -1))
    q, k, v = jnp.split(qkv, 3, axis=-1)
    if query_stride is not None:
        q = _max_pool(q.reshape(B, H, W, -1), query_stride[0])
        H, W = q.shape[1:3]
        q = q.reshape(B, H * W, -1)
    D = q.shape[-1] // num_heads
    def heads(t):
        return t.reshape(B, -1, num_heads, D).transpose(0, 2, 1, 3)
    out = xla_attention(heads(q), heads(k), heads(v))
    out = out.transpose(0, 2, 1, 3).reshape(B, H, W, num_heads * D)
    return nn.dense(p["proj"], out)


def hiera_forward(p, pixel_values, cfg: HieraConfig):
    """pixel_values (B, H, W, 3). Returns per-stage outputs (B, h, w, C)."""
    x = nn.conv2d(p["patch_embed"], pixel_values, stride=cfg.patch_stride,
                  padding=[(cfg.patch_padding,) * 2] * 2)
    h, w = x.shape[1:3]
    bg = jax.image.resize(p["pos_embed"], (1, h, w, cfg.hidden_size), "bicubic")
    win = p["pos_embed_window"]
    reps = [1, h // win.shape[1], w // win.shape[2], 1]
    x = x + bg + jnp.tile(win, reps)

    stage_ends = np.cumsum(cfg.blocks_per_stage) - 1
    outputs = []
    total = 0
    for stage_idx, n_blocks in enumerate(cfg.blocks_per_stage):
        for block_idx in range(n_blocks):
            bp = p["blocks"][total]
            dim_out = cfg.embed_dim_per_stage[stage_idx]
            heads_n = cfg.num_heads_per_stage[stage_idx]
            ws = (cfg.window_size_per_stage[stage_idx - 1]
                  if stage_idx > 0 and block_idx == 0
                  else cfg.window_size_per_stage[stage_idx])
            if total in cfg.global_attention_blocks:
                ws = 0
            qs = (cfg.query_stride
                  if 0 < stage_idx <= cfg.num_query_pool_stages and block_idx == 0
                  else None)
            residual = x
            hid = nn.layernorm(bp["norm1"], x, eps=cfg.layer_norm_eps)
            if "proj" in bp:  # dim change at stage boundary
                residual = nn.dense(bp["proj"], hid)
                if qs is not None:
                    residual = _max_pool(residual, qs[0])
            H0, W0 = hid.shape[1:3]
            if ws > 0:
                hid, pad_hw = _window_partition(hid, ws)
            att = _ms_attention(bp["attn"], hid, heads_n, qs)
            ws_out = ws
            if qs is not None:
                ws_out = ws // qs[0] if ws > 0 else 0
                Hr, Wr = residual.shape[1:3]
                pad_hw = (Hr + (-Hr) % ws_out if ws_out else Hr,
                          Wr + (-Wr) % ws_out if ws_out else Wr)
                H0, W0 = Hr, Wr
            if ws > 0:
                att = _window_unpartition(att, ws_out, pad_hw, (H0, W0))
            x = residual + att
            hid = nn.layernorm(bp["norm2"], x, eps=cfg.layer_norm_eps)
            hid = nn.dense(bp["mlp_out"], nn.gelu(nn.dense(bp["mlp_in"], hid)))
            x = x + hid
            if total in stage_ends:
                outputs.append(x)
            total += 1
    return outputs


# -------------------------------------------------------------------- neck

def sine_pos_embedding(h, w, num_pos_feats, temperature=10000.0, scale=None):
    """Normalised sine embedding (modeling_sam2.py:149-192). (h, w, 2F)."""
    scale = 2 * math.pi if scale is None else scale
    y = (jnp.arange(1, h + 1, dtype=jnp.float32)[:, None]
         / (h + 1e-6) * scale)
    x = (jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
         / (w + 1e-6) * scale)
    y = jnp.broadcast_to(y, (h, w))
    x = jnp.broadcast_to(x, (h, w))
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    def interleave(v):
        return jnp.stack([jnp.sin(v[..., 0::2]), jnp.cos(v[..., 1::2])],
                         axis=-1).reshape(v.shape[:-1] + (-1,))
    return jnp.concatenate([interleave(py), interleave(px)], axis=-1)


def vision_neck(p, stage_outputs, cfg: SAM2Config):
    """FPN over the reversed stage list. Returns (feats, pos) coarse->fine
    appended (i = deepest first reversed at the caller)."""
    n = len(p["convs"]) - 1
    feats, poss = [], []
    prev = None
    for i in range(n, -1, -1):
        lat = nn.conv2d(p["convs"][n - i], stage_outputs[i], padding="VALID")
        if i in cfg.fpn_top_down_levels and i != n and prev is not None:
            up = jax.image.resize(prev, (prev.shape[0], lat.shape[1],
                                         lat.shape[2], prev.shape[3]),
                                  "nearest")
            prev = lat + up
        else:
            prev = lat
        pos = sine_pos_embedding(prev.shape[1], prev.shape[2],
                                 cfg.fpn_hidden_size // 2)
        feats.append(prev)
        poss.append(jnp.broadcast_to(pos[None], prev.shape[:3] + (cfg.fpn_hidden_size,)))
    return feats, poss


# ----------------------------------------------------------- prompt encoder

def gaussian_pos_encode(coords01, pe_matrix):
    """coords in [0,1] -> (..., 2F) (Sam2PositionalEmbedding)."""
    c = 2 * coords01 - 1
    c = c @ pe_matrix
    c = 2 * np.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def embed_point_prompts(params, points, labels, image_size: int,
                        pad: bool = True):
    """Sparse point-prompt tokens (modeling_sam2.py Sam2PromptEncoder
    _embed_points).  points (B, P, N, 2) pixel (x, y); labels (B, P, N):
    1 positive, 0 negative, -1 padding.  Returns (B, P, N(+1), C)."""
    pts = jnp.asarray(points, jnp.float32) + 0.5  # centre of pixel
    lab = jnp.asarray(labels, jnp.int32)
    if pad:  # trailing not-a-point slot (omitted when boxes accompany)
        pts = jnp.pad(pts, ((0, 0), (0, 0), (0, 1), (0, 0)))
        lab = jnp.pad(lab, ((0, 0), (0, 0), (0, 1)), constant_values=-1)
    emb = gaussian_pos_encode(pts / image_size, params["pe_matrix"])
    emb = jnp.where(lab[..., None] == -1, params["not_a_point_embed"], emb)
    emb = emb + (params["point_embed"][jnp.clip(lab, 0)]
                 * (lab >= 0)[..., None])
    return emb


def embed_box_prompts(params, boxes, image_size: int):
    """Box corners as sparse tokens (modeling_sam2.py _embed_boxes).
    boxes (B, n, 4) pixel (x1, y1, x2, y2) -> (B, n, 3, C)."""
    b = jnp.asarray(boxes, jnp.float32) + 0.5
    coords = b.reshape(b.shape[0], b.shape[1], 2, 2)
    coords = jnp.pad(coords, ((0, 0), (0, 0), (0, 1), (0, 0)))
    emb = gaussian_pos_encode(coords / image_size, params["pe_matrix"])
    emb = emb.at[:, :, 0].add(params["point_embed"][2])
    emb = emb.at[:, :, 1].add(params["point_embed"][3])
    emb = emb.at[:, :, 2].set(params["not_a_point_embed"][0])
    return emb


def embed_mask_prompt(p, masks, eps=1e-6):
    """masks (B, H, W, 1) at mask_input_size -> dense embeddings."""
    x = nn.conv2d(p["conv1"], masks, stride=2, padding="VALID")
    x = nn.layernorm(p["ln1"], x, eps=eps)
    x = nn.gelu(x)
    x = nn.conv2d(p["conv2"], x, stride=2, padding="VALID")
    x = nn.layernorm(p["ln2"], x, eps=eps)
    x = nn.gelu(x)
    return nn.conv2d(p["conv3"], x, padding="VALID")


# -------------------------------------------------------------- mask decoder

def _attn(p, q, k, v, num_heads):
    """Sam2Attention: q/k/v projections to internal dim, o_proj out.
    q/k/v: (B, P, N, C)."""
    B, P = q.shape[:2]
    qq = nn.dense(p["q"], q)
    kk = nn.dense(p["k"], k)
    vv = nn.dense(p["v"], v)
    D = qq.shape[-1] // num_heads
    def heads(t):
        return t.reshape(B * P, -1, num_heads, D).transpose(0, 2, 1, 3)
    out = xla_attention(heads(qq), heads(kk), heads(vv))
    out = out.transpose(0, 2, 1, 3).reshape(B, P, -1, num_heads * D)
    return nn.dense(p["o"], out)


def _ffn(p, x, n_layers, sigmoid_output=False, act=jax.nn.relu):
    x = act(nn.dense(p["in"], x))
    for lp in p.get("mid", []):
        x = act(nn.dense(lp, x))
    x = nn.dense(p["out"], x)
    return jax.nn.sigmoid(x) if sigmoid_output else x


def two_way_transformer(p, tokens, image_emb, image_pe, cfg: SAM2Config):
    """tokens (B, P, T, C); image_emb/pe (B, N, C) flattened."""
    queries = tokens
    keys = image_emb[:, None]
    pe = image_pe[:, None]
    H = cfg.decoder_num_heads
    for i, lp in enumerate(p["layers"]):
        if i == 0:
            q = _attn(lp["self_attn"], queries, queries, queries, H)
            queries = q
        else:
            q_in = queries + tokens
            queries = queries + _attn(lp["self_attn"], q_in, q_in, queries, H)
        queries = nn.layernorm(lp["ln1"], queries, eps=1e-5)
        q_in = queries + tokens
        k_in = keys + pe
        queries = queries + _attn(lp["cross_t2i"], q_in, k_in, keys, H)
        queries = nn.layernorm(lp["ln2"], queries, eps=1e-5)
        queries = queries + _ffn(lp["mlp"], queries, 2)
        queries = nn.layernorm(lp["ln3"], queries, eps=1e-5)
        q_in = queries + tokens
        k_in = keys + pe
        keys = keys + _attn(lp["cross_i2t"], k_in, q_in, queries, H)
        keys = nn.layernorm(lp["ln4"], keys, eps=1e-5)
    q_in = queries + tokens
    k_in = keys + pe
    queries = queries + _attn(p["final_attn"], q_in, k_in, keys, H)
    queries = nn.layernorm(p["ln_final"], queries, eps=1e-5)
    return queries, keys


def mask_decoder(p, image_emb, image_pe, sparse, dense, hires, cfg: SAM2Config,
                 multimask_output: bool = False):
    """image_emb (B, h, w, C); sparse (B, P, S, C); dense (B, h, w, C);
    hires: [s0 (B, 4h, 4w, C/8), s1 (B, 2h, 2w, C/4)].
    Returns (masks (B, P, M, 4h*2, 4w*2), iou, obj_logits,
    sam_tokens (B, P, M', C)) where sam_tokens is the mask-token slice HF's
    Sam2MaskDecoder returns (multimask -> tokens 1:; else token 0 only)."""
    B, h, w, C = image_emb.shape
    P = sparse.shape[1]
    n_mask_tokens = cfg.num_multimask_outputs + 1
    out_tokens = jnp.concatenate([p["obj_score_token"], p["iou_token"],
                                  p["mask_tokens"]], axis=0)
    out_tokens = jnp.broadcast_to(out_tokens[None, None],
                                  (B, P, out_tokens.shape[0], C))
    tokens = jnp.concatenate([out_tokens, sparse], axis=2)

    # flatten (batch, point_batch) -> leading axis, point dim 1 (HF layout)
    emb = jnp.repeat((image_emb + dense).reshape(B, h * w, C), P, axis=0)
    pe = jnp.repeat(image_pe.reshape(B, h * w, C), P, axis=0)

    queries, keys = two_way_transformer(
        p["transformer"], tokens.reshape(B * P, 1, tokens.shape[2], C),
        emb, pe, cfg)
    queries = queries.reshape(B, P, -1, C)
    keys = keys.reshape(B, P, h * w, C)

    iou_tok = queries[:, :, 1]
    mask_toks = queries[:, :, 2:2 + n_mask_tokens]

    src = keys.reshape(B * P, h, w, C)
    s0 = jnp.repeat(hires[0], P, axis=0)
    s1 = jnp.repeat(hires[1], P, axis=0)
    up = nn.conv_transpose2d(p["upscale_conv1"], src) + s1
    up = nn.gelu(nn.layernorm(p["upscale_ln"], up))
    up = nn.gelu(nn.conv_transpose2d(p["upscale_conv2"], up) + s0)

    hyper = jnp.stack([_ffn(p["hyper_mlps"][i], mask_toks[:, :, i], 3)
                       for i in range(n_mask_tokens)], axis=2)  # (B,P,M,C/8)
    hh, ww = up.shape[1:3]
    upf = up.reshape(B, P, hh * ww, -1)
    masks = jnp.einsum("bpmc,bpnc->bpmn", hyper, upf).reshape(B, P, -1, hh, ww)
    iou = _ffn(p["iou_head"], iou_tok, cfg.iou_head_depth, sigmoid_output=True)
    obj = _ffn(p["obj_head"], queries[:, :, 0], 3)

    if multimask_output:
        masks = masks[:, :, 1:]
        iou = iou[:, :, 1:]
        sam_tokens = mask_toks[:, :, 1:]
    else:
        masks, iou = _dynamic_multimask(masks, iou, cfg)
        sam_tokens = mask_toks[:, :, 0:1]
    return masks, iou, obj, sam_tokens


def _stability(mask_logits, delta):
    flat = mask_logits.reshape(mask_logits.shape[:-2] + (-1,))
    ai = (flat > delta).sum(-1).astype(jnp.float32)
    au = (flat > -delta).sum(-1).astype(jnp.float32)
    return jnp.where(au > 0, ai / au, 1.0)


def _dynamic_multimask(all_masks, all_iou, cfg: SAM2Config):
    """Single-mask output with stability-based fallback to the best
    multimask (modeling_sam2.py:1208-1250)."""
    multi = all_masks[:, :, 1:]
    multi_iou = all_iou[:, :, 1:]
    best = jnp.argmax(multi_iou, axis=-1)
    bm = jnp.take_along_axis(
        multi, best[..., None, None, None], axis=2)
    bi = jnp.take_along_axis(multi_iou, best[..., None], axis=-1)
    single = all_masks[:, :, 0:1]
    single_iou = all_iou[:, :, 0:1]
    stable = _stability(single[:, :, 0], cfg.stability_delta) \
        >= cfg.stability_thresh
    masks = jnp.where(stable[..., None, None, None], single, bm)
    iou = jnp.where(stable[..., None], single_iou, bi)
    return masks, iou


# ------------------------------------------------------------------ model

def sam2_encode_image(params, pixel_values, cfg: SAM2Config = SAM2Config()):
    """Vision trunk + neck + skip projections (HF get_image_features,
    modeling_sam2.py). Returns (s0, s1, top, top_pos) with top RAW — the
    no-memory embedding is NOT added (the video model conditions `top` on
    memory instead; the image path adds it in sam2_image_forward)."""
    stage_outputs = hiera_forward(params["hiera"], pixel_values, cfg.hiera)
    feats, poss = vision_neck(params["neck"], stage_outputs, cfg)
    feats = feats[-cfg.num_feature_levels:][::-1]  # fine -> coarse
    poss = poss[-cfg.num_feature_levels:][::-1]
    s0 = nn.conv2d(params["conv_s0"], feats[0], padding="VALID")
    s1 = nn.conv2d(params["conv_s1"], feats[1], padding="VALID")
    return s0, s1, feats[2], poss[2]


def sam2_decode_heads(params, top, s0, s1, input_masks=None,
                      cfg: SAM2Config = SAM2Config(),
                      multimask_output: bool = False, input_points=None,
                      input_labels=None, input_boxes=None):
    """Prompt encoder + mask decoder on already-conditioned top-level
    features `top` (B, g, g, C).  Prompts: optional points (B, P, N, 2) with
    labels, boxes (B, n, 4), mask logits; with no sparse prompt a single
    not-a-point token stands in (HF pads an empty point set the same way).
    Returns (masks, iou, obj_logits, sam_tokens)."""
    B, g = top.shape[0], top.shape[1]
    # image-wide positional embedding (gaussian on the unit grid)
    ys = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    grid = jnp.stack(jnp.meshgrid(ys, ys, indexing="ij"), -1)[..., ::-1]  # (x,y)
    img_pe = gaussian_pos_encode(grid, params["pe_matrix"])
    img_pe = jnp.broadcast_to(img_pe[None], (B, g, g, img_pe.shape[-1]))

    sparse = None
    if input_points is not None:
        sparse = embed_point_prompts(params, input_points, input_labels,
                                     cfg.image_size,
                                     pad=(input_boxes is None))
    if input_boxes is not None:
        box_emb = embed_box_prompts(params, input_boxes, cfg.image_size)
        sparse = box_emb if sparse is None else \
            jnp.concatenate([sparse, box_emb], axis=2)
    if sparse is None:
        sparse = jnp.broadcast_to(params["not_a_point_embed"][None, None],
                                  (B, 1, 1, cfg.prompt_hidden_size))
    if input_masks is not None:
        dense = embed_mask_prompt(params["mask_embed"], input_masks,
                                  cfg.layer_norm_eps)
    else:
        dense = jnp.broadcast_to(params["no_mask_embed"].reshape(1, 1, 1, -1),
                                 top.shape)
    return mask_decoder(params["decoder"], top, img_pe, sparse, dense,
                        [s0, s1], cfg, multimask_output)


def sam2_image_forward(params, pixel_values, input_masks=None,
                       cfg: SAM2Config = SAM2Config(),
                       multimask_output: bool = False, input_points=None,
                       input_labels=None, input_boxes=None):
    """pixel_values (B, S, S, 3) processor-normalised; input_masks optional
    (B, 4g, 4g, 1) logits/binary at the mask input size; input_points
    (B, P, N, 2) pixel xy + input_labels (B, P, N); input_boxes (B, n, 4).
    Returns (low-res mask logits (B, P, M, 4g, 4g), iou, obj_logits)."""
    s0, s1, top, _pos = sam2_encode_image(params, pixel_values, cfg)
    top = top + params["no_memory_embedding"].reshape(1, 1, 1, -1)
    masks, iou, obj, _tokens = sam2_decode_heads(
        params, top, s0, s1, input_masks, cfg, multimask_output,
        input_points=input_points, input_labels=input_labels,
        input_boxes=input_boxes)
    return masks, iou, obj


# --------------------------------------------------------------- converter

def _c2d_t(sd, name):
    p = {"kernel": np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{name}.bias"])
    return p


def _ct2d_t(sd, name):
    return {"kernel": np.asarray(sd[f"{name}.weight"]).transpose(0, 2, 3, 1),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _lin_t(sd, name):
    return {"kernel": np.asarray(sd[f"{name}.weight"]).T,
            "bias": np.asarray(sd[f"{name}.bias"])}


def _ln_t(sd, name):
    return {"scale": np.asarray(sd[f"{name}.weight"]),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _attn_t(sd, pfx):
    return {"q": _lin_t(sd, f"{pfx}.q_proj"), "k": _lin_t(sd, f"{pfx}.k_proj"),
            "v": _lin_t(sd, f"{pfx}.v_proj"), "o": _lin_t(sd, f"{pfx}.o_proj")}


def _ffn_t(sd, pfx, n_mid):
    p = {"in": _lin_t(sd, f"{pfx}.proj_in"), "out": _lin_t(sd, f"{pfx}.proj_out")}
    if n_mid > 0:
        p["mid"] = [_lin_t(sd, f"{pfx}.layers.{i}") for i in range(n_mid)]
    return p


def config_from_hf_sam2(hf) -> SAM2Config:
    v = hf.vision_config
    b = v.backbone_config
    pe = hf.prompt_encoder_config
    md = hf.mask_decoder_config
    hiera = HieraConfig(
        hidden_size=b.hidden_size,
        num_heads_per_stage=tuple(b.num_attention_heads_per_stage),
        blocks_per_stage=tuple(b.blocks_per_stage),
        embed_dim_per_stage=tuple(b.embed_dim_per_stage),
        window_size_per_stage=tuple(b.window_size_per_stage),
        global_attention_blocks=tuple(b.global_attention_blocks),
        query_stride=tuple(b.query_stride),
        num_query_pool_stages=b.num_query_pool_stages,
        patch_kernel=b.patch_kernel_size, patch_stride=b.patch_stride,
        patch_padding=b.patch_padding,
        window_pos_bg_size=tuple(b.window_positional_embedding_background_size),
        mlp_ratio=b.mlp_ratio, layer_norm_eps=b.layer_norm_eps)
    return SAM2Config(
        hiera=hiera,
        backbone_channel_list=tuple(v.backbone_channel_list),
        fpn_hidden_size=v.fpn_hidden_size,
        fpn_top_down_levels=tuple(v.fpn_top_down_levels),
        num_feature_levels=v.num_feature_levels,
        image_size=pe.image_size, patch_size=pe.patch_size,
        prompt_hidden_size=pe.hidden_size,
        mask_input_channels=pe.mask_input_channels,
        decoder_hidden_size=md.hidden_size,
        decoder_num_heads=md.num_attention_heads,
        decoder_mlp_dim=md.mlp_dim, decoder_layers=md.num_hidden_layers,
        decoder_downsample_rate=md.attention_downsample_rate,
        num_multimask_outputs=md.num_multimask_outputs,
        iou_head_hidden_dim=md.iou_head_hidden_dim,
        iou_head_depth=md.iou_head_depth,
        stability_delta=md.dynamic_multimask_stability_delta,
        stability_thresh=md.dynamic_multimask_stability_thresh)


def convert_hf_sam2(sd: Dict[str, np.ndarray], cfg: SAM2Config) -> Dict:
    """HF Sam2Model state dict -> our pytree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    bb = "vision_encoder.backbone"
    blocks = []
    n_blocks = sum(cfg.hiera.blocks_per_stage)
    for i in range(n_blocks):
        q = f"{bb}.blocks.{i}"
        b = {"norm1": _ln_t(sd, f"{q}.layer_norm1"),
             "norm2": _ln_t(sd, f"{q}.layer_norm2"),
             "attn": {"qkv": _lin_t(sd, f"{q}.attn.qkv"),
                      "proj": _lin_t(sd, f"{q}.attn.proj")},
             "mlp_in": _lin_t(sd, f"{q}.mlp.proj_in"),
             "mlp_out": _lin_t(sd, f"{q}.mlp.proj_out")}
        if f"{q}.proj.weight" in sd:
            b["proj"] = _lin_t(sd, f"{q}.proj")
        blocks.append(b)
    hiera = {
        "patch_embed": _c2d_t(sd, f"{bb}.patch_embed.projection"),
        "pos_embed": np.asarray(sd[f"{bb}.pos_embed"]).transpose(0, 2, 3, 1),
        "pos_embed_window": np.asarray(sd[f"{bb}.pos_embed_window"])
        .transpose(0, 2, 3, 1),
        "blocks": blocks,
    }
    neck = {"convs": [_c2d_t(sd, f"vision_encoder.neck.convs.{i}")
                      for i in range(len(cfg.backbone_channel_list))]}
    dec_pfx = "mask_decoder"
    layers = []
    for i in range(cfg.decoder_layers):
        q = f"{dec_pfx}.transformer.layers.{i}"
        layers.append({
            "self_attn": _attn_t(sd, f"{q}.self_attn"),
            "cross_t2i": _attn_t(sd, f"{q}.cross_attn_token_to_image"),
            "cross_i2t": _attn_t(sd, f"{q}.cross_attn_image_to_token"),
            "ln1": _ln_t(sd, f"{q}.layer_norm1"),
            "ln2": _ln_t(sd, f"{q}.layer_norm2"),
            "ln3": _ln_t(sd, f"{q}.layer_norm3"),
            "ln4": _ln_t(sd, f"{q}.layer_norm4"),
            "mlp": _ffn_t(sd, f"{q}.mlp", 0),
        })
    n_mask_tokens = cfg.num_multimask_outputs + 1
    decoder = {
        "obj_score_token": np.asarray(sd[f"{dec_pfx}.obj_score_token.weight"]),
        "iou_token": np.asarray(sd[f"{dec_pfx}.iou_token.weight"]),
        "mask_tokens": np.asarray(sd[f"{dec_pfx}.mask_tokens.weight"]),
        "transformer": {
            "layers": layers,
            "final_attn": _attn_t(sd, f"{dec_pfx}.transformer.final_attn_token_to_image"),
            "ln_final": _ln_t(sd, f"{dec_pfx}.transformer.layer_norm_final_attn"),
        },
        "upscale_conv1": _ct2d_t(sd, f"{dec_pfx}.upscale_conv1"),
        "upscale_conv2": _ct2d_t(sd, f"{dec_pfx}.upscale_conv2"),
        "upscale_ln": _ln_t(sd, f"{dec_pfx}.upscale_layer_norm"),
        "hyper_mlps": [_ffn_t(sd, f"{dec_pfx}.output_hypernetworks_mlps.{i}", 1)
                       for i in range(n_mask_tokens)],
        "iou_head": _ffn_t(sd, f"{dec_pfx}.iou_prediction_head",
                           cfg.iou_head_depth - 2),
        "obj_head": _ffn_t(sd, f"{dec_pfx}.pred_obj_score_head", 1),
    }
    params = {
        "hiera": hiera,
        "neck": neck,
        "decoder": decoder,
        "conv_s0": _c2d_t(sd, f"{dec_pfx}.conv_s0"),
        "conv_s1": _c2d_t(sd, f"{dec_pfx}.conv_s1"),
        "pe_matrix": np.asarray(sd["shared_image_embedding.positional_embedding"]),
        "no_memory_embedding": np.asarray(sd["no_memory_embedding"]),
        "no_mask_embed": np.asarray(sd["prompt_encoder.no_mask_embed.weight"]),
        "not_a_point_embed": np.asarray(sd["prompt_encoder.not_a_point_embed.weight"]),
        "point_embed": np.asarray(sd["prompt_encoder.point_embed.weight"]),
        "mask_embed": {
            "conv1": _c2d_t(sd, "prompt_encoder.mask_embed.conv1"),
            "conv2": _c2d_t(sd, "prompt_encoder.mask_embed.conv2"),
            "conv3": _c2d_t(sd, "prompt_encoder.mask_embed.conv3"),
            "ln1": _ln_t(sd, "prompt_encoder.mask_embed.layer_norm1"),
            "ln2": _ln_t(sd, "prompt_encoder.mask_embed.layer_norm2"),
        },
    }
    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params,
                        is_leaf=lambda x: isinstance(x, np.ndarray))


def load_hf_sam2(model_name_or_path: str):
    from transformers import Sam2Model
    model = Sam2Model.from_pretrained(model_name_or_path)
    cfg = config_from_hf_sam2(model.config)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return convert_hf_sam2(sd, cfg), cfg
