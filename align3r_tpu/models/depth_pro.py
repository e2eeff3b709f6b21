"""Apple Depth Pro in JAX — the metric monocular prior with focal estimate.

Role in the pipeline: the 'depthpro' prior
(/root/reference/third_party/ml-depth-pro/src/depth_pro/depth_pro.py:72-120;
consumed at dust3r/utils/image_pose.py:285-302 as depth + focallength_px).

Architecture matched against the local HF implementation
(transformers/models/depth_pro/modeling_depth_pro.py, the oracle in tests):
a multi-scale DINOv2 patch encoder over overlapping crops at ratios
(0.25, 0.5, 1), a global DINOv2 image encoder, upsample+projection neck,
DPT-style fusion, depth head, and an optional FOV head that yields
focal_px = 0.5 * W / tan(0.5 * fov_deg).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from align3r_tpu.models import nn
from align3r_tpu.models.depth_anything import (
    DAConfig, dinov2_hidden_states, _ln, _lin, _c2d, _ct2d)


@dataclasses.dataclass(frozen=True)
class ViTCfg:
    hidden_size: int
    num_layers: int
    num_heads: int
    patch_size: int
    image_size: int
    layer_norm_eps: float = 1e-6


@dataclasses.dataclass(frozen=True)
class DepthProConfig:
    patch_model: ViTCfg = ViTCfg(1024, 24, 16, 14, 384)
    image_model: ViTCfg = ViTCfg(1024, 24, 16, 14, 384)
    fov_model: ViTCfg = ViTCfg(1024, 24, 16, 14, 384)
    patch_size: int = 384                      # crop size fed to the patch ViT
    scaled_images_ratios: Tuple[float, ...] = (0.25, 0.5, 1.0)
    scaled_images_overlap_ratios: Tuple[float, ...] = (0.0, 0.5, 0.25)
    scaled_images_feature_dims: Tuple[int, ...] = (1024, 1024, 512)
    intermediate_hook_ids: Tuple[int, ...] = (11, 5)
    intermediate_feature_dims: Tuple[int, ...] = (256, 256)
    fusion_hidden_size: int = 256
    merge_padding_value: int = 3
    num_fov_head_layers: int = 2
    use_fov_model: bool = True
    image_size: int = 1536                     # full input resolution


def _vit_as_da(v: ViTCfg) -> DAConfig:
    return DAConfig(hidden_size=v.hidden_size, num_layers=v.num_layers,
                    num_heads=v.num_heads, patch_size=v.patch_size,
                    layer_norm_eps=v.layer_norm_eps)


def _resize(x, h, w):
    """torch F.interpolate(bilinear, align_corners=False) equivalent."""
    return nn.bilinear_resize(x, h, w, align_corners=False)


def split_to_patches(x, patch: int, overlap: float):
    """(B, S, S, C) -> (nP*B, patch, patch, C), window-major then batch
    (modeling_depth_pro.py split_to_patches: unfold column order)."""
    B, H, W, C = x.shape
    if H == W == patch:
        return x
    stride = int(patch * (1 - overlap))
    outs = []
    for i in range(0, H - patch + 1, stride):
        for j in range(0, W - patch + 1, stride):
            outs.append(x[:, i:i + patch, j:j + patch, :])
    return jnp.concatenate(outs, axis=0)


def _reshape_features(hs):
    """(nB, L, C) -> (nB, s, s, C), dropping leading special tokens."""
    nB, L, C = hs.shape
    s = int(math.isqrt(L))
    return hs[:, -(s * s):, :].reshape(nB, s, s, C)


def merge_patches(patches, batch_size: int, padding: int):
    """(nP*B, s, s, C) window-major -> (B, S, S, C) with overlap cropping."""
    nB, s, _, C = patches.shape
    npb = nB // batch_size
    side = int(math.isqrt(npb))
    if nB == batch_size:
        return patches
    if npb < 4:
        padding = 0
    padding = min(s // 4, padding)
    rows = []
    i = 0
    for h in range(side):
        cols = []
        for w in range(side):
            box = patches[batch_size * i: batch_size * (i + 1)]
            top = padding if h != 0 else 0
            bottom = padding if h != side - 1 else 0
            left = padding if w != 0 else 0
            right = padding if w != side - 1 else 0
            box = box[:, top: s - bottom, left: s - right, :]
            cols.append(box)
            i += 1
        rows.append(jnp.concatenate(cols, axis=2))
    return jnp.concatenate(rows, axis=1)


def _reconstruct(hs, batch_size, padding, out_hw):
    f = _reshape_features(hs)
    f = merge_patches(f, batch_size, padding)
    return _resize(f, out_hw[0], out_hw[1])


# ------------------------------------------------------------------ encoder

def _encode_scales(params, pixel_values, cfg: DepthProConfig):
    """Patch + image encoder features (DepthProEncoder.forward)."""
    B, H, W, _ = pixel_values.shape
    pm = _vit_as_da(cfg.patch_model)
    out_size = cfg.image_model.image_size // cfg.image_model.patch_size
    exp = int(math.log2(W / out_size))
    base_h, base_w = H // 2 ** exp, W // 2 ** exp
    n_scales = len(cfg.scaled_images_ratios)

    scaled_feats = []
    inter_feats_raw = {h: [] for h in cfg.intermediate_hook_ids}
    for i, r in enumerate(cfg.scaled_images_ratios):
        img = _resize(pixel_values, int(H * r), int(W * r))
        patches = split_to_patches(img, cfg.patch_size,
                                   cfg.scaled_images_overlap_ratios[i])
        want = [cfg.patch_model.num_layers]
        if i == n_scales - 1:
            want += [h + 1 for h in cfg.intermediate_hook_ids]
        hs, _ = dinov2_hidden_states(params["patch_encoder"], patches, pm,
                                     collect=want)
        last = nn.layernorm(params["patch_encoder"]["final_norm"],
                            hs[cfg.patch_model.num_layers], eps=pm.layer_norm_eps)
        pad = int(cfg.merge_padding_value * (1 / r))
        feats = _reconstruct(last, B, pad, (base_h * 2 ** i, base_w * 2 ** i))
        scaled_feats.append(feats)
        if i == n_scales - 1:
            for hid in cfg.intermediate_hook_ids:
                pad = int(cfg.merge_padding_value * (1 / cfg.scaled_images_ratios[-1]))
                inter_feats_raw[hid] = _reconstruct(
                    hs[hid + 1], B, pad,
                    (base_h * 2 ** (n_scales - 1), base_w * 2 ** (n_scales - 1)))

    # global image encoder
    im = _vit_as_da(cfg.image_model)
    img_small = _resize(pixel_values, cfg.image_model.image_size,
                        cfg.image_model.image_size)
    hs, _ = dinov2_hidden_states(params["image_encoder"], img_small, im,
                                 collect=[cfg.image_model.num_layers])
    last = nn.layernorm(params["image_encoder"]["final_norm"],
                        hs[cfg.image_model.num_layers], eps=im.layer_norm_eps)
    image_feats = _reconstruct(last, B, 0, (base_h, base_w))

    inter = [inter_feats_raw[h] for h in cfg.intermediate_hook_ids]
    return [image_feats, *scaled_feats, *inter]


# --------------------------------------------------------------------- neck

def _upsample_block(p, x, n_layers: int):
    if "proj" in p:
        x = nn.conv2d(p["proj"], x)
    for i in range(n_layers):
        x = nn.conv_transpose2d(p[f"up{i}"], x)
    return x


def _neck(params, features, cfg: DepthProConfig):
    n_scales = len(cfg.scaled_images_ratios)
    features = list(features)
    features[0] = _upsample_block(params["image_block"], features[0], 1)
    for i in range(n_scales):
        features[i + 1] = _upsample_block(params["scaled"][i], features[i + 1], 1)
    for i in range(len(cfg.intermediate_feature_dims)):
        features[n_scales + i + 1] = _upsample_block(
            params["intermediate"][i], features[n_scales + i + 1], 2 + i)
    glob = jnp.concatenate([features[1], features[0]], axis=-1)
    glob = nn.conv2d(params["fuse_image_with_low_res"], glob)
    feats = [glob, *features[2:]]
    out = []
    for i, f in enumerate(feats):
        pr = params["projection"][i]
        out.append(f if pr is None else nn.conv2d(pr, f))
    return out


# ------------------------------------------------------------------- fusion

def _pre_act_res(p, x):
    h = nn.conv2d(p["conv1"], jax.nn.relu(x))
    h = nn.conv2d(p["conv2"], jax.nn.relu(h))
    return h + x


def _fusion_layer(p, x, residual=None, deconv=True):
    if residual is not None:
        x = x + _pre_act_res(p["res1"], residual)
    x = _pre_act_res(p["res2"], x)
    if deconv:
        x = nn.conv_transpose2d(p["deconv"], x)
    return nn.conv2d(p["projection"], x)


def _fusion_stage(params, feats):
    fused = None
    for i, f in enumerate(feats[:-1]):
        lp = params[i]
        fused = _fusion_layer(lp, f) if fused is None else \
            _fusion_layer(lp, fused, f)
    return _fusion_layer(params[len(feats) - 1], fused, feats[-1], deconv=False)


# ------------------------------------------------------------------ forward

def depth_pro_forward(params, pixel_values, cfg: DepthProConfig = DepthProConfig()):
    """pixel_values: (B, S, S, 3) normalised ((x/255 - 0.5)/0.5 per the HF
    processor). Returns (canonical inverse depth-ish predicted_depth
    (B, S, S), fov_deg (B,) or None)."""
    feats = _encode_scales(params["encoder"], pixel_values, cfg)
    feats = _neck(params["neck"], feats, cfg)
    fused = _fusion_stage(params["fusion"], feats)

    h = params["head"]
    x = nn.conv2d(h["conv1"], fused)
    x = nn.conv_transpose2d(h["up"], x)
    x = jax.nn.relu(nn.conv2d(h["conv2"], x))
    x = jax.nn.relu(nn.conv2d(h["conv3"], x))
    depth = x[..., 0]

    fov = None
    if cfg.use_fov_model and "fov" in params:
        fov = _fov_forward(params["fov"], pixel_values,
                           jax.lax.stop_gradient(feats[0]), cfg)
    return depth, fov


def _fov_forward(params, pixel_values, global_features, cfg: DepthProConfig):
    B, H, W, _ = pixel_values.shape
    fv = _vit_as_da(cfg.fov_model)
    out_size = cfg.image_model.image_size // cfg.image_model.patch_size
    exp = int(math.log2(W / out_size))
    base_h, base_w = H // 2 ** exp, W // 2 ** exp

    img = _resize(pixel_values, cfg.fov_model.image_size, cfg.fov_model.image_size)
    hs, _ = dinov2_hidden_states(params["encoder"], img, fv,
                                 collect=[cfg.fov_model.num_layers])
    last = nn.layernorm(params["encoder"]["final_norm"],
                        hs[cfg.fov_model.num_layers], eps=fv.layer_norm_eps)
    last = nn.dense(params["neck"], last)
    fov_feats = _reconstruct(last, B, 0, (base_h, base_w))

    g = jax.nn.relu(nn.conv2d(params["conv"], global_features, stride=2,
                              padding=[(1, 1), (1, 1)]))
    x = fov_feats + g
    # head: downsampling convs then a full-reduction conv
    x = _resize(x, out_size, out_size)
    for i in range(cfg.num_fov_head_layers):
        x = jax.nn.relu(nn.conv2d(params["head"][i], x, stride=2,
                                  padding=[(1, 1), (1, 1)]))
    x = nn.conv2d(params["head"][cfg.num_fov_head_layers], x, padding="VALID")
    return x.reshape(B)


def fov_to_focal_px(fov_deg, width):
    return 0.5 * width / jnp.tan(0.5 * jnp.deg2rad(fov_deg))


def postprocess_depth(predicted_depth, fov_deg, width):
    """HF post_process_depth_estimation: depth = W / (2 tan(fov/2) * inv_depth)
    -> metric depth; focal_px returned alongside."""
    if fov_deg is None:
        return 1.0 / jnp.clip(predicted_depth, 1e-4, 1e4), None
    focal = fov_to_focal_px(fov_deg, width)
    depth = width / (2.0 * jnp.tan(0.5 * jnp.deg2rad(fov_deg))
                     * jnp.clip(predicted_depth, 1e-4, 1e4))
    return depth, focal


# --------------------------------------------------------------- converter

def _vit_params(sd, pfx, n_layers):
    layers = []
    for i in range(n_layers):
        q = f"{pfx}.encoder.layer.{i}"
        layers.append({
            "norm1": _ln(sd, f"{q}.norm1"),
            "q": _lin(sd, f"{q}.attention.attention.query"),
            "k": _lin(sd, f"{q}.attention.attention.key"),
            "v": _lin(sd, f"{q}.attention.attention.value"),
            "attn_out": _lin(sd, f"{q}.attention.output.dense"),
            "ls1": np.asarray(sd[f"{q}.layer_scale1.lambda1"]),
            "norm2": _ln(sd, f"{q}.norm2"),
            "fc1": _lin(sd, f"{q}.mlp.fc1"),
            "fc2": _lin(sd, f"{q}.mlp.fc2"),
            "ls2": np.asarray(sd[f"{q}.layer_scale2.lambda1"]),
        })
    return {
        "patch_embed": _c2d(sd, f"{pfx}.embeddings.patch_embeddings.projection"),
        "cls_token": np.asarray(sd[f"{pfx}.embeddings.cls_token"])[0],
        "pos_embed": np.asarray(sd[f"{pfx}.embeddings.position_embeddings"]),
        "layers": jax.tree.map(lambda *xs: np.stack(xs), *layers),
        "final_norm": _ln(sd, f"{pfx}.layernorm"),
    }


def _upsample_params(sd, pfx, n_up, use_proj):
    p = {}
    li = 0
    if use_proj:
        p["proj"] = _c2d(sd, f"{pfx}.layers.{li}")
        li += 1
    for i in range(n_up):
        p[f"up{i}"] = _ct2d(sd, f"{pfx}.layers.{li}")
        li += 1
    return p


def convert_hf_depth_pro(sd: Dict[str, np.ndarray], cfg: DepthProConfig) -> Dict:
    sd = {k: np.asarray(v) for k, v in sd.items()}
    n_scales = len(cfg.scaled_images_ratios)
    enc = {
        "patch_encoder": _vit_params(sd, "depth_pro.encoder.patch_encoder.model",
                                     cfg.patch_model.num_layers),
        "image_encoder": _vit_params(sd, "depth_pro.encoder.image_encoder.model",
                                     cfg.image_model.num_layers),
    }
    neck_pfx = "depth_pro.neck"
    neck = {
        "image_block": _upsample_params(sd, f"{neck_pfx}.feature_upsample.image_block", 1, False),
        "scaled": [_upsample_params(sd, f"{neck_pfx}.feature_upsample.scaled_images.{i}", 1, True)
                   for i in range(n_scales)],
        "intermediate": [_upsample_params(sd, f"{neck_pfx}.feature_upsample.intermediate.{i}", 2 + i, True)
                         for i in range(len(cfg.intermediate_feature_dims))],
        "fuse_image_with_low_res": _c2d(sd, f"{neck_pfx}.fuse_image_with_low_res"),
        "projection": [],
    }
    combined = list(cfg.scaled_images_feature_dims) + list(cfg.intermediate_feature_dims)
    for i, ch in enumerate(combined):
        key = f"{neck_pfx}.feature_projection.projections.{i}.weight"
        neck["projection"].append(_c2d(sd, f"{neck_pfx}.feature_projection.projections.{i}")
                                  if key in sd else None)
    n_fusion = len(combined)
    fusion = []
    for i in range(n_fusion):
        pfx = (f"fusion_stage.intermediate.{i}" if i < n_fusion - 1
               else "fusion_stage.final")
        fl = {
            "res1": {"conv1": _c2d(sd, f"{pfx}.residual_layer1.convolution1"),
                     "conv2": _c2d(sd, f"{pfx}.residual_layer1.convolution2")},
            "res2": {"conv1": _c2d(sd, f"{pfx}.residual_layer2.convolution1"),
                     "conv2": _c2d(sd, f"{pfx}.residual_layer2.convolution2")},
            "projection": _c2d(sd, f"{pfx}.projection"),
        }
        if f"{pfx}.deconv.weight" in sd:
            fl["deconv"] = _ct2d(sd, f"{pfx}.deconv")
        fusion.append(fl)
    head = {
        "conv1": _c2d(sd, "head.layers.0"),
        "up": _ct2d(sd, "head.layers.1"),
        "conv2": _c2d(sd, "head.layers.2"),
        "conv3": _c2d(sd, "head.layers.4"),
    }
    params = {"encoder": enc, "neck": neck, "fusion": fusion, "head": head}
    if cfg.use_fov_model and "fov_model.conv.weight" in sd:
        fov = {
            "encoder": _vit_params(sd, "fov_model.fov_encoder.model",
                                   cfg.fov_model.num_layers),
            "neck": _lin(sd, "fov_model.fov_encoder.neck"),
            "conv": _c2d(sd, "fov_model.conv"),
            "head": [],
        }
        for i in range(cfg.num_fov_head_layers + 1):
            fov["head"].append(_c2d(sd, f"fov_model.head.layers.{2 * i}"))
        params["fov"] = fov
    return jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32) if isinstance(x, np.ndarray) else x,
        params, is_leaf=lambda x: x is None or isinstance(x, np.ndarray))


def config_from_hf_depth_pro(hf_config) -> DepthProConfig:
    def vit(c):
        return ViTCfg(c.hidden_size, c.num_hidden_layers, c.num_attention_heads,
                      c.patch_size, c.image_size)
    return DepthProConfig(
        patch_model=vit(hf_config.patch_model_config),
        image_model=vit(hf_config.image_model_config),
        fov_model=vit(hf_config.fov_model_config),
        patch_size=hf_config.patch_size,
        scaled_images_ratios=tuple(hf_config.scaled_images_ratios),
        scaled_images_overlap_ratios=tuple(hf_config.scaled_images_overlap_ratios),
        scaled_images_feature_dims=tuple(hf_config.scaled_images_feature_dims),
        intermediate_hook_ids=tuple(hf_config.intermediate_hook_ids),
        intermediate_feature_dims=tuple(hf_config.intermediate_feature_dims),
        fusion_hidden_size=hf_config.fusion_hidden_size,
        merge_padding_value=hf_config.merge_padding_value,
        num_fov_head_layers=hf_config.num_fov_head_layers,
        use_fov_model=hf_config.use_fov_model,
        image_size=hf_config.image_size or 1536,
    )


def load_hf_depth_pro(model_name_or_path: str, use_fov_model=True):
    from transformers import DepthProForDepthEstimation
    model = DepthProForDepthEstimation.from_pretrained(
        model_name_or_path, use_fov_model=use_fov_model)
    cfg = config_from_hf_depth_pro(model.config)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return convert_hf_depth_pro(sd, cfg), cfg
