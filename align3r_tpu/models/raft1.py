"""Classic RAFT (RAFT1) in JAX — the non-'M' checkpoint path.

Behavioural reference: /root/reference/third_party/RAFT/core/raft.py
(RAFT:26-146), extractor.py (ResidualBlock:8-58, BasicEncoder:119-185),
corr.py (CorrBlock:63-111: pyramid via avg_pool2d of the level-0 volume),
update.py (BasicMotionEncoder:81-98, SepConvGRU:33-60, FlowHead:6-14,
BasicUpdateBlock:134-156). third_party/raft.py:39-56 selects this model
when the checkpoint path has no 'M' (e.g. raft-sintel.pth), else RAFT2.

fnet uses InstanceNorm (per-sample stats even at eval — implemented
directly); cnet uses BatchNorm (folded at conversion). 12-32 GRU iterations
run as a lax.scan.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from align3r_tpu.models import nn
from align3r_tpu.models.raft import (
    affine, conv, _coords_grid, _unfold9, pad_to_8, lookup_corr, RAFTConfig)


@dataclasses.dataclass(frozen=True)
class RAFT1Config:
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    iters: int = 20

    @property
    def corr_channel(self):
        return self.corr_levels * (2 * self.corr_radius + 1) ** 2


def instance_norm(x, eps: float = 1e-5):
    """InstanceNorm2d (affine=False default in reference ResidualBlock
    usage — torch InstanceNorm2d(planes) has affine=False): per-sample,
    per-channel spatial normalisation."""
    mu = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def _norm(p, x, kind):
    if kind == "instance":
        return instance_norm(x)
    if kind == "none":
        return x
    return affine(p, x)  # folded batch norm


def residual_block(p, x, stride, kind):
    y = jax.nn.relu(_norm(p.get("norm1"), conv(p["conv1"], x, stride,
                                               padding=[(1, 1), (1, 1)]), kind))
    y = jax.nn.relu(_norm(p.get("norm2"), conv(p["conv2"], y), kind))
    if "down_conv" in p:
        x = _norm(p.get("norm3"), conv(p["down_conv"], x, stride,
                                       padding="VALID"), kind)
    return jax.nn.relu(x + y)


def basic_encoder(p, x, kind):
    """BasicEncoder: conv7 s2 -> 3 stages (64, 96, 128) of 2 residual blocks
    -> conv1x1 to output_dim (extractor.py:119-185)."""
    x = jax.nn.relu(_norm(p.get("norm1"), conv(p["conv1"], x, 2,
                                               padding=[(3, 3), (3, 3)]), kind))
    for li, stride in zip((1, 2, 3), (1, 2, 2)):
        for bi in range(2):
            x = residual_block(p[f"layer{li}"][bi], x, stride if bi == 0 else 1,
                               kind)
    return conv(p["conv2"], x)


def build_corr_pyramid_raft1(fmap1, fmap2, num_levels: int):
    """Level-0 all-pairs volume, then avg_pool2d over the target dims
    (corr.py:63-77). Volume dtype follows the fmaps (fp32 accumulation
    inside the matmul either way)."""
    B, h, w, C = fmap1.shape
    c = jnp.einsum("bnc,bmc->bnm", fmap1.reshape(B, h * w, C),
                   fmap2.reshape(B, h * w, C),
                   preferred_element_type=jnp.float32) / np.sqrt(C)
    corr = c.astype(fmap1.dtype).reshape(B, h * w, h, w)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        B2, N, hh, ww = pyramid[-1].shape
        x = pyramid[-1].reshape(B2 * N, hh, ww, 1)
        x = jax.lax.reduce_window(x, jnp.zeros((), x.dtype), jax.lax.add,
                                  (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4
        pyramid.append(x.reshape(B2, N, hh // 2, ww // 2))
    return pyramid


def sep_conv_gru(p, h, x):
    """SepConvGRU (update.py:33-60): horizontal (1,5) then vertical (5,1)."""
    def gru(h, x, pz, pr, pq, pad):
        hx = jnp.concatenate([h, x], -1)
        z = jax.nn.sigmoid(conv(pz, hx, padding=pad))
        r = jax.nn.sigmoid(conv(pr, hx, padding=pad))
        q = jnp.tanh(conv(pq, jnp.concatenate([r * h, x], -1), padding=pad))
        return (1 - z) * h + z * q

    h = gru(h, x, p["convz1"], p["convr1"], p["convq1"], [(0, 0), (2, 2)])
    h = gru(h, x, p["convz2"], p["convr2"], p["convq2"], [(2, 2), (0, 0)])
    return h


def motion_encoder1(p, flow, corr):
    cor = jax.nn.relu(conv(p["convc1"], corr))
    cor = jax.nn.relu(conv(p["convc2"], cor))
    flo = jax.nn.relu(conv(p["convf1"], flow, padding=[(3, 3), (3, 3)]))
    flo = jax.nn.relu(conv(p["convf2"], flo))
    out = jax.nn.relu(conv(p["conv"], jnp.concatenate([cor, flo], -1)))
    return jnp.concatenate([out, flow], -1)


def upsample_flow(flow, mask):
    """Convex 8x upsampling (raft.py:75-87)."""
    B, h, w, _ = flow.shape
    m = jax.nn.softmax(mask.reshape(B, h, w, 9, 8, 8), axis=3)
    up = _unfold9(8 * flow)
    f = jnp.einsum("bhwkuv,bhwkc->bhuwvc", m, up)
    return f.reshape(B, h * 8, w * 8, 2)


def raft1_forward(params, image1, image2, cfg: RAFT1Config = RAFT1Config(),
                  iters: int | None = None, compute_dtype=jnp.float32):
    """image1/2: (B, H, W, 3) in [0, 255]. Returns final flow (B, H, W, 2).

    compute_dtype=bfloat16 runs the conv/GRU stacks and the correlation
    volume at the MXU bf16 rate; positional state stays fp32 (coords, the
    accumulated flow, the convex-upsample softmax, and all matmul
    accumulators) — mirrors the reference's mixed_precision autocast
    (third_party/RAFT/core/raft.py:101, cloud_opt_flow/optimizer.py:250).
    """
    iters = cfg.iters if iters is None else iters
    cd = compute_dtype
    image1 = (2 * (image1 / 255.0) - 1.0).astype(cd)
    image2 = (2 * (image2 / 255.0) - 1.0).astype(cd)
    image1, pads = pad_to_8(image1)
    image2, _ = pad_to_8(image2)
    B, H, W, _ = image1.shape

    f1 = basic_encoder(params["fnet"], image1, "instance")
    f2 = basic_encoder(params["fnet"], image2, "instance")
    pyramid = build_corr_pyramid_raft1(f1, f2, cfg.corr_levels)

    cnet = basic_encoder(params["cnet"], image1, "batch")
    net, inp = jnp.split(cnet, [cfg.hidden_dim], axis=-1)
    net = jnp.tanh(net)
    inp = jax.nn.relu(inp)

    h, w = H // 8, W // 8
    grid = _coords_grid(B, h, w)
    lk_cfg = RAFTConfig(radius=cfg.corr_radius, corr_levels=cfg.corr_levels)

    def body(carry, _):
        net, flow = carry
        coords1 = jax.lax.stop_gradient(grid + flow)
        corr = lookup_corr(pyramid, coords1, lk_cfg)
        motion = motion_encoder1(params["update_block"]["encoder"],
                                 jax.lax.stop_gradient(flow).astype(cd),
                                 corr.astype(cd))
        x = jnp.concatenate([inp, motion], -1)
        net2 = sep_conv_gru(params["update_block"]["gru"], net, x)
        fh = params["update_block"]["flow_head"]
        delta = conv(fh["conv2"], jax.nn.relu(conv(fh["conv1"], net2)))
        flow2 = jax.lax.stop_gradient(flow) + delta.astype(jnp.float32)
        return (net2, flow2), None

    (net, flow8), _ = jax.lax.scan(body, (net, jnp.zeros((B, h, w, 2))),
                                   None, length=iters)
    # upsample mask depends only on the FINAL hidden state: computing it
    # once here (instead of as a per-iteration scan output) avoids
    # materialising an (iters, B, h, w, 576) buffer just to read [-1]
    mk = params["update_block"]["mask"]
    mask = 0.25 * conv(mk["conv2"], jax.nn.relu(conv(mk["conv1"], net)))
    flow_up = upsample_flow(flow8, mask.astype(jnp.float32))
    t, b, l, r = pads
    return flow_up[:, t:H - b, l:W - r]


# --------------------------------------------------------------- converter

def _c(sd, name):
    p = {"kernel": np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{name}.bias"])
    return p


def _bn(sd, name, eps=1e-5):
    w = np.asarray(sd[f"{name}.weight"])
    b = np.asarray(sd[f"{name}.bias"])
    mean = np.asarray(sd[f"{name}.running_mean"])
    var = np.asarray(sd[f"{name}.running_var"])
    scale = w / np.sqrt(var + eps)
    return {"scale": scale, "bias": b - mean * scale}


def convert_raft1_state_dict(sd: Dict[str, np.ndarray],
                             cfg: RAFT1Config = RAFT1Config()) -> Dict:
    sd = {k[7:] if k.startswith("module.") else k: np.asarray(v)
          for k, v in sd.items()}

    def enc(pfx, kind):
        p = {"conv1": _c(sd, f"{pfx}.conv1"), "conv2": _c(sd, f"{pfx}.conv2")}
        if kind == "batch":
            p["norm1"] = _bn(sd, f"{pfx}.norm1")
        for li in (1, 2, 3):
            blocks = []
            for bi in range(2):
                q = f"{pfx}.layer{li}.{bi}"
                b = {"conv1": _c(sd, f"{q}.conv1"), "conv2": _c(sd, f"{q}.conv2")}
                if kind == "batch":
                    b["norm1"] = _bn(sd, f"{q}.norm1")
                    b["norm2"] = _bn(sd, f"{q}.norm2")
                if f"{q}.downsample.0.weight" in sd:
                    b["down_conv"] = _c(sd, f"{q}.downsample.0")
                    if kind == "batch":
                        b["norm3"] = _bn(sd, f"{q}.norm3")
                blocks.append(b)
            p[f"layer{li}"] = blocks
        return p

    ub = "update_block"
    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), {
        "fnet": enc("fnet", "instance"),
        "cnet": enc("cnet", "batch"),
        "update_block": {
            "encoder": {k: _c(sd, f"{ub}.encoder.{k}")
                        for k in ("convc1", "convc2", "convf1", "convf2", "conv")},
            "gru": {k: _c(sd, f"{ub}.gru.{k}")
                    for k in ("convz1", "convr1", "convq1",
                              "convz2", "convr2", "convq2")},
            "flow_head": {"conv1": _c(sd, f"{ub}.flow_head.conv1"),
                          "conv2": _c(sd, f"{ub}.flow_head.conv2")},
            "mask": {"conv1": _c(sd, f"{ub}.mask.0"),
                     "conv2": _c(sd, f"{ub}.mask.2")},
        },
    }, is_leaf=lambda x: isinstance(x, np.ndarray))


def load_raft_auto(path: str):
    """Mirror third_party/raft.py:39-56: 'M' in the filename -> SEA-RAFT
    (raft.py converter), else classic RAFT1."""
    import os
    import torch
    if "M" in os.path.basename(path):
        from align3r_tpu.models.raft import load_raft_checkpoint, SPRING_M
        return load_raft_checkpoint(path), "raft2"
    sd = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    return convert_raft1_state_dict(sd), "raft1"
