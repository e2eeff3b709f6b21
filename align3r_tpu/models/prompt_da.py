"""Prompt Depth Anything (PromptDA) in JAX — prompt-conditioned depth
upsampling used by the refine pipeline.

Role in the pipeline: /root/reference/tool/depth_test.py:615,535-549
(`PromptDA.from_pretrained('depth-anything/promptda_vitl')`,
`rescale_depth_maps`): the optimised low-res aligned depth is fed as the
prompt and the model returns metric full-resolution depth.

Architecture matched against the local HF implementation
(transformers/models/prompt_depth_anything/modeling_prompt_depth_anything.py)
which is the numeric oracle in tests: DepthAnything's DINOv2+DPT with a
3-conv prompt encoder injected into every fusion layer, min-max prompt
normalisation outside and denormalisation of the sigmoid output.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from align3r_tpu.models import nn
from align3r_tpu.models.depth_anything import (
    DAConfig, dinov2_forward, _pre_act_residual, convert_hf_depth_anything,
    config_from_hf, _c2d)


def _prompt_layer(p, prompt):
    h = jax.nn.relu(nn.conv2d(p["conv1"], prompt))
    h = jax.nn.relu(nn.conv2d(p["conv2"], h))
    return nn.conv2d(p["conv3"], h)


def _fusion_layer(p, x, residual=None, size=None, prompt=None):
    if residual is not None:
        if residual.shape[1:3] != x.shape[1:3]:
            residual = nn.bilinear_resize(residual, x.shape[1], x.shape[2],
                                          align_corners=False)
        x = x + _pre_act_residual(p["res1"], residual)
    x = _pre_act_residual(p["res2"], x)
    if prompt is not None:
        pr = nn.bilinear_resize(prompt, x.shape[1], x.shape[2],
                                align_corners=False)
        x = x + _prompt_layer(p["prompt"], pr)
    th, tw = (x.shape[1] * 2, x.shape[2] * 2) if size is None else size
    x = nn.bilinear_resize(x, th, tw, align_corners=True)
    return nn.conv2d(p["projection"], x)


def prompt_da_forward(params, pixel_values, prompt_depth=None,
                      cfg: DAConfig = None):
    """pixel_values: (B, H, W, 3); prompt_depth: (B, h, w, 1) metric depths.
    Returns (B, H, W) metric depth (prompt given) or relative depth."""
    hidden, (ph, pw) = dinov2_forward(params["backbone"], pixel_values, cfg)

    if prompt_depth is not None:
        B = prompt_depth.shape[0]
        dmin = prompt_depth.reshape(B, -1).min(axis=1)[:, None, None, None]
        dmax = prompt_depth.reshape(B, -1).max(axis=1)[:, None, None, None]
        prompt = (prompt_depth - dmin) / (dmax - dmin)
    else:
        prompt = None

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

    rev = feats[::-1]
    fused = None
    for idx, (f, lp) in enumerate(zip(rev, params["neck"]["fusion"])):
        size = rev[idx + 1].shape[1:3] if idx != len(rev) - 1 else None
        if fused is None:
            fused = _fusion_layer(lp, f, None, size=size, prompt=prompt)
        else:
            fused = _fusion_layer(lp, fused, f, size=size, prompt=prompt)

    h = params["head"]
    x = nn.conv2d(h["conv1"], fused)
    x = nn.bilinear_resize(x, ph * cfg.patch_size, pw * cfg.patch_size,
                           align_corners=True)
    x = jax.nn.relu(nn.conv2d(h["conv2"], x))
    x = nn.conv2d(h["conv3"], x)
    x = jax.nn.relu(x) if cfg.depth_estimation_type == "relative" \
        else jax.nn.sigmoid(x)
    depth = (x * cfg.max_depth)[..., 0]
    if prompt_depth is not None:
        depth = depth * (dmax[..., 0] - dmin[..., 0]) + dmin[..., 0]
    return depth


def convert_hf_prompt_da(sd: Dict[str, np.ndarray], cfg: DAConfig) -> Dict:
    """HF PromptDepthAnythingForDepthEstimation state dict -> pytree
    (DepthAnything layout + per-fusion prompt encoders)."""
    params = convert_hf_depth_anything(sd, cfg)
    sd = {k: np.asarray(v) for k, v in sd.items()}
    for i, fl in enumerate(params["neck"]["fusion"]):
        pfx = f"neck.fusion_stage.layers.{i}.prompt_depth_layer"
        fl["prompt"] = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.float32),
            {"conv1": _c2d(sd, f"{pfx}.convolution1"),
             "conv2": _c2d(sd, f"{pfx}.convolution2"),
             "conv3": _c2d(sd, f"{pfx}.convolution3")})
    return params


def load_hf_prompt_da(model_name_or_path: str):
    from transformers import AutoModelForDepthEstimation
    model = AutoModelForDepthEstimation.from_pretrained(model_name_or_path)
    cfg = config_from_hf(model.config)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return convert_hf_prompt_da(sd, cfg), cfg


def rescale_depth_maps(params, cfg, images_01: np.ndarray,
                       depthmaps: np.ndarray, batch: int = 2) -> np.ndarray:
    """Full-resolution refinement of optimised depths (reference
    depth_test.py:535-549): image resized to the /14 grid, low-res depth as
    prompt, output resized back to the original resolution."""
    from align3r_tpu.models.depth_anything import IMAGENET_MEAN, IMAGENET_STD
    n, H, W, _ = images_01.shape
    nw = round(W / 14) * 14
    nh = round(H * (nw / W) / 14) * 14
    out = []
    fwd = jax.jit(lambda x, p: prompt_da_forward(params, x, p, cfg))
    for s in range(0, n, batch):
        e = min(s + batch, n)
        img = jax.image.resize(jnp.asarray(images_01[s:e]), (e - s, nh, nw, 3),
                               "bicubic")
        img = (img - IMAGENET_MEAN) / IMAGENET_STD
        pr = jnp.asarray(depthmaps[s:e])[..., None]
        d = fwd(img, pr)
        d = jax.image.resize(d, (e - s, H, W), "bilinear")
        out.append(np.asarray(d))
    return np.concatenate(out)
