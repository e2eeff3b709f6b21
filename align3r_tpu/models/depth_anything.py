"""Depth Anything V2 (DINOv2 ViT + DPT decoder) in JAX, with HF converter.

Role in the pipeline: the 'depthanything' monocular prior
(/root/reference/tool/demo.py:100-118 uses the HF
transformers depth-estimation pipeline with
depth-anything/Depth-Anything-V2-Large-hf; the prior is consumed through
pixel_to_pointcloud with pseudo-focal 200, image_pose.py:300-302).

Architecture matched against the local HF implementations
(transformers/models/dinov2/modeling_dinov2.py,
transformers/models/depth_anything/modeling_depth_anything.py), which serve
as the numeric oracle in tests (tiny random configs — no downloads).
NHWC, functional params, bf16-capable.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from align3r_tpu.models import nn
from align3r_tpu.ops.attention import xla_attention


@dataclasses.dataclass(frozen=True)
class DAConfig:
    # backbone (DINOv2)
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    out_indices: Tuple[int, ...] = (5, 12, 18, 24)  # hidden_states indices (1-based layers)
    # neck / head (DepthAnything)
    reassemble_factors: Tuple[float, ...] = (4, 2, 1, 0.5)
    neck_hidden_sizes: Tuple[int, ...] = (256, 512, 1024, 1024)
    fusion_hidden_size: int = 256
    head_hidden_size: int = 32
    max_depth: float = 1.0
    depth_estimation_type: str = "relative"


DA_V2_LARGE = DAConfig()


# ---------------------------------------------------------------- backbone

def _interp_pos_embed(pos, h, w):
    """Interpolate patch position embeddings to (h, w) (Dinov2Embeddings)."""
    cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    n0 = patch_pos.shape[1]
    g0 = int(round(n0 ** 0.5))
    if (h, w) == (g0, g0):
        return pos
    grid = patch_pos.reshape(1, g0, g0, -1)
    grid = jax.image.resize(grid, (1, h, w, grid.shape[-1]), method="bicubic")
    return jnp.concatenate([cls_pos, grid.reshape(1, h * w, -1)], axis=1)


def dinov2_hidden_states(p, pixel_values, cfg, collect=None):
    """DINOv2 trunk. pixel_values: (B, H, W, 3) normalised.

    Returns ({layer_index: hidden_state (B, 1+N, C)}, (ph, pw)) — index 0 is
    the embedding output, index L the last layer output, all WITHOUT the
    final layernorm (HF Dinov2 hidden_states convention). `collect` limits
    which indices are kept (None = all).
    """
    B, H, W, _ = pixel_values.shape
    ph, pw = H // cfg.patch_size, W // cfg.patch_size
    x = nn.conv2d(p["patch_embed"], pixel_values, stride=cfg.patch_size,
                  padding="VALID")
    x = x.reshape(B, ph * pw, cfg.hidden_size)
    cls = jnp.broadcast_to(p["cls_token"].astype(x.dtype), (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + _interp_pos_embed(p["pos_embed"], ph, pw).astype(x.dtype)

    keep = set(range(cfg.num_layers + 1)) if collect is None else set(collect)
    collected = {}
    if 0 in keep:
        collected[0] = x
    for li in range(cfg.num_layers):
        blk = jax.tree.map(lambda a: a[li], p["layers"])
        h = nn.layernorm(blk["norm1"], x, eps=cfg.layer_norm_eps)
        qkv = jnp.concatenate([nn.dense(blk["q"], h), nn.dense(blk["k"], h),
                               nn.dense(blk["v"], h)], axis=-1)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        D = cfg.hidden_size // cfg.num_heads
        def heads(t):
            return t.reshape(B, -1, cfg.num_heads, D).transpose(0, 2, 1, 3)
        att = xla_attention(heads(q), heads(k), heads(v))
        att = att.transpose(0, 2, 1, 3).reshape(B, -1, cfg.hidden_size)
        att = nn.dense(blk["attn_out"], att)
        x = x + att * blk["ls1"].astype(x.dtype)
        h = nn.layernorm(blk["norm2"], x, eps=cfg.layer_norm_eps)
        h = nn.dense(blk["fc2"], nn.gelu(nn.dense(blk["fc1"], h)))
        x = x + h * blk["ls2"].astype(x.dtype)
        if li + 1 in keep:
            collected[li + 1] = x
    return collected, (ph, pw)


def dinov2_forward(p, pixel_values, cfg: DAConfig):
    """Backbone mode: hidden states at cfg.out_indices with the final
    layernorm applied (Dinov2Backbone.forward, apply_layernorm=True)."""
    collected, (ph, pw) = dinov2_hidden_states(p, pixel_values, cfg,
                                               collect=cfg.out_indices)
    out = [nn.layernorm(p["final_norm"], collected[i], eps=cfg.layer_norm_eps)
           for i in cfg.out_indices]
    return out, (ph, pw)


# -------------------------------------------------------------------- neck

def _pre_act_residual(p, x):
    h = nn.conv2d(p["conv1"], jax.nn.relu(x))
    h = nn.conv2d(p["conv2"], jax.nn.relu(h))
    return h + x


def _fusion_layer(p, x, residual=None, size=None):
    if residual is not None:
        if residual.shape[1:3] != x.shape[1:3]:
            residual = nn.bilinear_resize(residual, x.shape[1], x.shape[2],
                                          align_corners=False)
        x = x + _pre_act_residual(p["res1"], residual)
    x = _pre_act_residual(p["res2"], x)
    th, tw = (x.shape[1] * 2, x.shape[2] * 2) if size is None else size
    x = nn.bilinear_resize(x, th, tw, align_corners=True)
    return nn.conv2d(p["projection"], x)


def depth_anything_forward(params, pixel_values, cfg: DAConfig = DA_V2_LARGE):
    """pixel_values: (B, H, W, 3) (HF-preprocessed: /255, imagenet norm).
    Returns predicted relative depth (B, H, W)."""
    hidden, (ph, pw) = dinov2_forward(params["backbone"], pixel_values, cfg)
    feats = []
    for i, hs in enumerate(hidden):
        t = hs[:, 1:].astype(jnp.float32).reshape(-1, ph, pw, cfg.hidden_size)
        rl = params["neck"]["reassemble"][i]
        t = nn.conv2d(rl["projection"], t)
        f = cfg.reassemble_factors[i]
        if f > 1:
            t = nn.conv_transpose2d(rl["resize"], t)
        elif f < 1:
            t = nn.conv2d(rl["resize"], t, stride=int(1 / f),
                          padding=[(1, 1), (1, 1)])
        t = nn.conv2d(params["neck"]["convs"][i], t)
        feats.append(t)

    # fusion: coarse-to-fine (DepthAnythingFeatureFusionStage)
    rev = feats[::-1]
    fused = None
    for idx, (f, lp) in enumerate(zip(rev, params["neck"]["fusion"])):
        size = rev[idx + 1].shape[1:3] if idx != len(rev) - 1 else None
        if fused is None:
            fused = _fusion_layer(lp, f, None, size=size)
        else:
            fused = _fusion_layer(lp, fused, f, size=size)

    h = params["head"]
    x = nn.conv2d(h["conv1"], fused)
    x = nn.bilinear_resize(x, ph * cfg.patch_size, pw * cfg.patch_size,
                           align_corners=True)
    x = jax.nn.relu(nn.conv2d(h["conv2"], x))
    x = nn.conv2d(h["conv3"], x)
    if cfg.depth_estimation_type == "relative":
        x = jax.nn.relu(x)
    else:
        x = jax.nn.sigmoid(x)
    return (x * cfg.max_depth)[..., 0]


# --------------------------------------------------------------- converter

def _c2d(sd, name):
    p = {"kernel": np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{name}.bias"])
    return p


def _ct2d(sd, name):
    p = {"kernel": np.asarray(sd[f"{name}.weight"]).transpose(0, 2, 3, 1)}
    if f"{name}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{name}.bias"])
    return p


def _lin(sd, name):
    return {"kernel": np.asarray(sd[f"{name}.weight"]).T,
            "bias": np.asarray(sd[f"{name}.bias"])}


def _ln(sd, name):
    return {"scale": np.asarray(sd[f"{name}.weight"]),
            "bias": np.asarray(sd[f"{name}.bias"])}


def convert_hf_depth_anything(sd: Dict[str, np.ndarray], cfg: DAConfig) -> Dict:
    """HF DepthAnythingForDepthEstimation state dict -> our pytree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    bb = "backbone"
    layers = []
    for i in range(cfg.num_layers):
        pfx = f"{bb}.encoder.layer.{i}"
        layers.append({
            "norm1": _ln(sd, f"{pfx}.norm1"),
            "q": _lin(sd, f"{pfx}.attention.attention.query"),
            "k": _lin(sd, f"{pfx}.attention.attention.key"),
            "v": _lin(sd, f"{pfx}.attention.attention.value"),
            "attn_out": _lin(sd, f"{pfx}.attention.output.dense"),
            "ls1": np.asarray(sd[f"{pfx}.layer_scale1.lambda1"]),
            "norm2": _ln(sd, f"{pfx}.norm2"),
            "fc1": _lin(sd, f"{pfx}.mlp.fc1"),
            "fc2": _lin(sd, f"{pfx}.mlp.fc2"),
            "ls2": np.asarray(sd[f"{pfx}.layer_scale2.lambda1"]),
        })
    backbone = {
        "patch_embed": _c2d(sd, f"{bb}.embeddings.patch_embeddings.projection"),
        "cls_token": np.asarray(sd[f"{bb}.embeddings.cls_token"])[0],
        "pos_embed": np.asarray(sd[f"{bb}.embeddings.position_embeddings"]),
        "layers": jax.tree.map(lambda *xs: np.stack(xs), *layers),
        "final_norm": _ln(sd, f"{bb}.layernorm"),
    }
    reassemble = []
    for i, f in enumerate(cfg.reassemble_factors):
        pfx = f"neck.reassemble_stage.layers.{i}"
        rl = {"projection": _c2d(sd, f"{pfx}.projection")}
        if f > 1:
            rl["resize"] = _ct2d(sd, f"{pfx}.resize")
        elif f < 1:
            rl["resize"] = _c2d(sd, f"{pfx}.resize")
        reassemble.append(rl)
    fusion = []
    for i in range(len(cfg.neck_hidden_sizes)):
        pfx = f"neck.fusion_stage.layers.{i}"
        fusion.append({
            "projection": _c2d(sd, f"{pfx}.projection"),
            "res1": {"conv1": _c2d(sd, f"{pfx}.residual_layer1.convolution1"),
                     "conv2": _c2d(sd, f"{pfx}.residual_layer1.convolution2")},
            "res2": {"conv1": _c2d(sd, f"{pfx}.residual_layer2.convolution1"),
                     "conv2": _c2d(sd, f"{pfx}.residual_layer2.convolution2")},
        })
    params = {
        "backbone": backbone,
        "neck": {
            "reassemble": reassemble,
            "convs": [_c2d(sd, f"neck.convs.{i}")
                      for i in range(len(cfg.neck_hidden_sizes))],
            "fusion": fusion,
        },
        "head": {"conv1": _c2d(sd, "head.conv1"),
                 "conv2": _c2d(sd, "head.conv2"),
                 "conv3": _c2d(sd, "head.conv3")},
    }
    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)


def config_from_hf(hf_config) -> DAConfig:
    bc = hf_config.backbone_config
    out_idx = tuple(int(s.replace("stage", "")) for s in hf_config.backbone_config.out_features) \
        if hasattr(bc, "out_features") and bc.out_features else (5, 12, 18, 24)
    return DAConfig(
        hidden_size=bc.hidden_size, num_layers=bc.num_hidden_layers,
        num_heads=bc.num_attention_heads,
        mlp_ratio=bc.mlp_ratio if hasattr(bc, "mlp_ratio") else 4.0,
        patch_size=hf_config.patch_size,
        out_indices=out_idx,
        reassemble_factors=tuple(hf_config.reassemble_factors),
        neck_hidden_sizes=tuple(hf_config.neck_hidden_sizes),
        fusion_hidden_size=hf_config.fusion_hidden_size,
        head_hidden_size=hf_config.head_hidden_size,
        max_depth=hf_config.max_depth or 1.0,
        depth_estimation_type=hf_config.depth_estimation_type,
    )


def load_hf_depth_anything(model_name_or_path: str):
    """Load weights via transformers (local path or hub cache)."""
    from transformers import AutoModelForDepthEstimation
    model = AutoModelForDepthEstimation.from_pretrained(model_name_or_path)
    cfg = config_from_hf(model.config)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return convert_hf_depth_anything(sd, cfg), cfg


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess(images_01: np.ndarray, cfg: DAConfig = DA_V2_LARGE,
               target: int = 518):
    """[0,1] RGB (B, H, W, 3) -> normalised, resized to multiples of 14."""
    B, H, W, _ = images_01.shape
    s = target / min(H, W)
    nh = int(round(H * s / cfg.patch_size)) * cfg.patch_size
    nw = int(round(W * s / cfg.patch_size)) * cfg.patch_size
    import jax.image
    x = jax.image.resize(jnp.asarray(images_01), (B, nh, nw, 3), "bilinear")
    return (x - IMAGENET_MEAN) / IMAGENET_STD
