"""SEA-RAFT (RAFT2) optical flow in JAX — inference path.

Behavioural reference: /root/reference/third_party/RAFT/core/raft.py
(RAFT2:152-291), extractor.py (ResNetFPN:270-345), layer.py (BasicBlock:
110-135, ConvNextBlock:39-73), update.py (BasicMotionEncoder2:120-139,
BasicUpdateBlock2:158-174), corr.py (CorrBlock2:11-61), utils/utils.py
(InputPadder:11-28, bilinear_sampler). Config: spring-M
(configs/congif_spring_M.json: resnet34 blocks, dims [64,128,256], dim=128,
radius=4) — the Tartan-C-T432x960-M checkpoint the pipeline loads
(cloud_opt_flow/optimizer.py:124).

The reference runs RAFT frozen (eval) only, so BatchNorms are folded into
per-channel affines at conversion time and the whole forward is a pure
function: NHWC, jit/vmap-friendly, the 20-step GRU refinement as a
lax.scan.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from align3r_tpu.models import nn
from align3r_tpu.geometry.warping import bilinear_sample


@dataclasses.dataclass(frozen=True)
class RAFTConfig:
    dim: int = 128
    radius: int = 4
    corr_levels: int = 4
    initial_dim: int = 64
    block_dims: Tuple[int, ...] = (64, 128, 256)
    n_blocks: Tuple[int, ...] = (3, 4, 6)   # resnet34
    num_refine: int = 2                      # ConvNext blocks in the update
    iters: int = 20                          # optimizer.py get_flow uses 20

    @property
    def corr_channel(self) -> int:
        return self.corr_levels * (2 * self.radius + 1) ** 2


SPRING_M = RAFTConfig()


# ------------------------------------------------------------- primitives

def affine(p, x):
    """Folded BatchNorm / plain affine: per-channel scale+bias."""
    return x * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def conv(p, x, stride=1, padding="SAME"):
    return nn.conv2d(p, x, stride=stride, padding=padding)


def basic_block(p, x, stride=1):
    # explicit (1,1) padding: torch Conv2d(stride=2, padding=1) pads
    # symmetrically, which differs from XLA 'SAME' at stride 2
    y = jax.nn.relu(affine(p["bn1"], conv(p["conv1"], x, stride,
                                          padding=[(1, 1), (1, 1)])))
    y = jax.nn.relu(affine(p["bn2"], conv(p["conv2"], y)))
    if "downsample" in p:
        x = affine(p["bn3"], conv(p["down_conv"], x, stride, padding="VALID"))
    return jax.nn.relu(x + y)


def resnet_fpn(p, x, cfg: RAFTConfig):
    """1/8-resolution feature extractor (extractor.py:270-345)."""
    x = jax.nn.relu(affine(p["bn1"], conv(p["conv1"], x, stride=2,
                                          padding=[(3, 3), (3, 3)])))
    for li, (n, stride) in enumerate(zip(cfg.n_blocks, (1, 2, 2)), start=1):
        for bi in range(n):
            x = basic_block(p[f"layer{li}"][bi], x, stride if bi == 0 else 1)
    return conv(p["final_conv"], x)


def conv_next_block(p, x):
    """ConvNeXt block with final projection (layer.py:39-73). x: NHWC."""
    inp = x
    dim = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, p["dwconv"]["kernel"].astype(x.dtype), (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=dim)
    y = y + p["dwconv"]["bias"].astype(x.dtype)
    y = nn.layernorm(p["norm"], y)
    y = nn.dense(p["pwconv1"], y)
    y = nn.gelu(y)
    y = nn.dense(p["pwconv2"], y)
    y = y * p["gamma"].astype(x.dtype)
    return conv(p["final"], inp + y)


def motion_encoder(p, flow, corr):
    """BasicMotionEncoder2 (update.py:120-139). flow: (B,h,w,2); corr (B,h,w,C)."""
    cor = jax.nn.relu(conv(p["convc1"], corr))
    cor = jax.nn.relu(conv(p["convc2"], cor))
    flo = jax.nn.relu(conv(p["convf1"], flow, padding=[(3, 3), (3, 3)]))
    flo = jax.nn.relu(conv(p["convf2"], flo))
    out = jax.nn.relu(conv(p["conv"], jnp.concatenate([cor, flo], -1)))
    return jnp.concatenate([out, flow], -1)


def update_block(p, net, context, corr, flow, cfg: RAFTConfig):
    motion = motion_encoder(p["encoder"], flow, corr)
    inp = jnp.concatenate([context, motion], -1)
    for i in range(cfg.num_refine):
        net = conv_next_block(p["refine"][i], jnp.concatenate([net, inp], -1))
    return net


def flow_head(p, net):
    return conv(p["conv2"], jax.nn.relu(conv(p["conv1"], net)))


def upsample_weight(p, net):
    return 0.25 * conv(p["conv2"], jax.nn.relu(conv(p["conv1"], net)))


# ------------------------------------------------------------- correlation

def build_corr_pyramid(fmap1, fmap2, cfg: RAFTConfig) -> List[jnp.ndarray]:
    """All-pairs correlation at corr_levels scales of fmap2 (corr.py:11-23).
    fmap*: (B, h, w, C). Returns list of (B, h1*w1, h2_l, w2_l) in the fmap
    dtype (fp32 accumulation inside the matmul either way)."""
    B, h1, w1, C = fmap1.shape
    f1 = fmap1.reshape(B, h1 * w1, C)
    pyramid = []
    f2 = fmap2
    for lvl in range(cfg.corr_levels):
        B2, h2, w2, _ = f2.shape
        c = jnp.einsum("bnc,bmc->bnm", f1, f2.reshape(B, h2 * w2, C),
                       preferred_element_type=jnp.float32)
        # divide BEFORE the cast: a numpy float64 scalar would silently
        # promote a bf16 volume back to fp32
        c = (c / np.sqrt(C)).astype(fmap1.dtype)
        pyramid.append(c.reshape(B, h1 * w1, h2, w2))
        # F.interpolate(scale=0.5, bilinear, align_corners=False)
        f2 = nn.bilinear_resize(f2, max(h2 // 2, 1), max(w2 // 2, 1),
                                align_corners=False)
    return pyramid


def lookup_corr(pyramid, coords, cfg: RAFTConfig, impl: str = "onehot"):
    """Sample each level in a (2r+1)^2 window around coords/2^i
    (corr.py:25-51, dilation 1). coords: (B, h1, w1, 2) absolute level-0
    coords. Returns (B, h1, w1, corr_channel).

    impl="onehot" (default): bilinear sampling as two separable matmuls
    with hat-function weight matrices — sample[i,j] = sum_hw
    Wy[j,h] corr[h,w] Wx[i,w], where Wy[j,h] = relu(1 - |cy + d[j] - h|).
    Exactly the zero-padded bilinear the gather form computes (out-of-range
    rows get all-zero hat weights), but it runs on the MXU instead of as
    XLA gathers, which are the reason the gather form measured ~650 ms per
    image on v5e (the whole 20-iter solve now runs in a few ms of lookups).
    impl="gather" keeps the original form for parity tests.

    Reference quirk (corr.py:36-44): window channel (i, j) samples
    (x + d[i], y + d[j]); checkpoint conv weights depend on this order.
    """
    r = cfg.radius
    B, h1, w1, _ = coords.shape
    d = jnp.arange(-r, r + 1, dtype=jnp.float32)
    if impl == "gather":
        dyx = jnp.stack(jnp.meshgrid(d, d, indexing="ij"), axis=-1)
        out = []
        for i, corr in enumerate(pyramid):
            Bc, N, h2, w2 = corr.shape
            cimg = corr.reshape(Bc * N, h2, w2, 1)
            centr = coords.reshape(Bc * N, 1, 1, 2) / (2 ** i)
            cl = centr + dyx[None]  # (x + d[i], y + d[j])
            sampled = bilinear_sample(cimg, cl[..., 0], cl[..., 1])
            out.append(sampled.reshape(B, h1, w1, -1))
        return jnp.concatenate(out, axis=-1)

    cx = coords[..., 0].reshape(B, h1 * w1)
    cy = coords[..., 1].reshape(B, h1 * w1)
    out = []
    for i, corr in enumerate(pyramid):
        _, N, h2, w2 = corr.shape
        cyl = cy / (2 ** i)
        cxl = cx / (2 ** i)
        hg = jnp.arange(h2, dtype=jnp.float32)
        wg = jnp.arange(w2, dtype=jnp.float32)
        # (B, N, 9, h2) / (B, N, 9, w2) hat-function bilinear weights;
        # computed in fp32 (sub-pixel positions), then cast to the corr
        # dtype so a bf16 pyramid keeps the matmuls at the MXU bf16 rate
        wy = jax.nn.relu(1.0 - jnp.abs(
            cyl[:, :, None, None] + d[None, None, :, None] - hg))
        wx = jax.nn.relu(1.0 - jnp.abs(
            cxl[:, :, None, None] + d[None, None, :, None] - wg))
        wy = wy.astype(corr.dtype)
        wx = wx.astype(corr.dtype)
        tmp = jnp.einsum("bnjh,bnhw->bnjw", wy, corr,
                         preferred_element_type=jnp.float32)
        smp = jnp.einsum("bnjw,bniw->bnij", tmp.astype(corr.dtype), wx,
                         preferred_element_type=jnp.float32)
        out.append(smp.astype(jnp.float32).reshape(B, h1, w1, -1))
    return jnp.concatenate(out, axis=-1)


# ----------------------------------------------------------------- forward

def _coords_grid(B, h, w):
    x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    return jnp.broadcast_to(jnp.stack([x, y], -1)[None], (B, h, w, 2))


def _unfold9(x):
    """3x3 patch extraction: (B, h, w, C) -> (B, h, w, 9, C), zero pad."""
    B, h, w, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    pats = [xp[:, dy:dy + h, dx:dx + w] for dy in range(3) for dx in range(3)]
    return jnp.stack(pats, axis=3)


def upsample_data(flow, info, mask):
    """Convex-combination 8x upsampling (raft.py:188-205).
    flow: (B,h,w,2); info: (B,h,w,C); mask: (B,h,w,576)."""
    B, h, w, _ = flow.shape
    m = jax.nn.softmax(mask.reshape(B, h, w, 9, 8, 8), axis=3)
    up_f = _unfold9(8 * flow)          # (B,h,w,9,2)
    up_i = _unfold9(info)
    f = jnp.einsum("bhwkuv,bhwkc->bhuwvc", m, up_f).reshape(B, h * 8, w * 8, 2)
    i = jnp.einsum("bhwkuv,bhwkc->bhuwvc", m, up_i).reshape(B, h * 8, w * 8, info.shape[-1])
    return f, i


def pad_to_8(img):
    """InputPadder 'sintel' mode: symmetric replicate pad to /8 (utils.py:11-28)."""
    H, W = img.shape[1:3]
    ph = (-H) % 8
    pw = (-W) % 8
    pad = ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0))
    return jnp.pad(img, pad, mode="edge"), (ph // 2, ph - ph // 2, pw // 2, pw - pw // 2)


def raft_forward(params, image1, image2, cfg: RAFTConfig = SPRING_M,
                 iters: int | None = None, compute_dtype=jnp.float32):
    """image1/2: (B, H, W, 3) in [0, 255]. Returns final flow (B, H, W, 2)
    at full resolution (test-mode path of raft.py:207-291).

    compute_dtype=bfloat16 runs the conv stacks (fnet/cnet/update block) and
    the correlation matmuls at the MXU bf16 rate; everything positional stays
    fp32: coords, the accumulated flow field, the hat-function sample
    positions, softmax in the convex upsample, and all matmul accumulators
    (preferred_element_type). This mirrors the reference's torch.cuda.amp
    usage (RAFT eval under autocast) rather than a blanket half cast.
    """
    iters = cfg.iters if iters is None else iters
    cd = compute_dtype
    image1 = (2 * (image1 / 255.0) - 1.0).astype(cd)
    image2 = (2 * (image2 / 255.0) - 1.0).astype(cd)
    image1, pads = pad_to_8(image1)
    image2, _ = pad_to_8(image2)
    B, H, W, _ = image1.shape

    cnet = resnet_fpn(params["cnet"], jnp.concatenate([image1, image2], -1), cfg)
    cnet = conv(params["init_conv"], cnet)
    net, context = jnp.split(cnet, 2, axis=-1)

    fu = flow_head(params["flow_head"], net)
    flow_8x = fu[..., :2].astype(jnp.float32)

    fmap1 = resnet_fpn(params["fnet"], image1, cfg)
    fmap2 = resnet_fpn(params["fnet"], image2, cfg)
    pyramid = build_corr_pyramid(fmap1, fmap2, cfg)

    h, w = H // 8, W // 8
    grid = _coords_grid(B, h, w)

    def body(carry, _):
        net, flow_8x = carry
        coords2 = jax.lax.stop_gradient(grid + flow_8x)
        corr = lookup_corr(pyramid, coords2, cfg)
        net2 = update_block(params["update_block"], net, context,
                            corr.astype(cd),
                            jax.lax.stop_gradient(flow_8x).astype(cd), cfg)
        fu = flow_head(params["flow_head"], net2)
        flow2 = jax.lax.stop_gradient(flow_8x) + fu[..., :2].astype(jnp.float32)
        return (net2, flow2), None

    (net, flow_8x), _ = jax.lax.scan(body, (net, flow_8x), None, length=iters)

    wgt = upsample_weight(params["upsample_weight"], net).astype(jnp.float32)
    fu = flow_head(params["flow_head"], net).astype(jnp.float32)
    flow_up, info_up = upsample_data(flow_8x, fu[..., 2:], wgt)
    t, b, l, r = pads
    return flow_up[:, t:H - b, l:W - r]


# --------------------------------------------------------------- converter

def _bn_fold(sd, name, eps=1e-5):
    w = np.asarray(sd[f"{name}.weight"])
    b = np.asarray(sd[f"{name}.bias"])
    mean = np.asarray(sd[f"{name}.running_mean"])
    var = np.asarray(sd[f"{name}.running_var"])
    scale = w / np.sqrt(var + eps)
    return {"scale": scale, "bias": b - mean * scale}


def _c(sd, name):
    p = {"kernel": np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{name}.bias"])
    return p


def _lin(sd, name):
    return {"kernel": np.asarray(sd[f"{name}.weight"]).T,
            "bias": np.asarray(sd[f"{name}.bias"])}


def convert_raft2_state_dict(sd: Dict[str, np.ndarray],
                             cfg: RAFTConfig = SPRING_M) -> Dict:
    """Torch RAFT2 state dict -> our param pytree (BNs folded)."""
    sd = {k[7:] if k.startswith("module.") else k: np.asarray(v)
          for k, v in sd.items()}

    def fpn(pfx):
        p = {"conv1": _c(sd, f"{pfx}.conv1"), "bn1": _bn_fold(sd, f"{pfx}.bn1"),
             "final_conv": _c(sd, f"{pfx}.final_conv")}
        for li, n in enumerate(cfg.n_blocks, start=1):
            blocks = []
            for bi in range(n):
                b = {"conv1": _c(sd, f"{pfx}.layer{li}.{bi}.conv1"),
                     "conv2": _c(sd, f"{pfx}.layer{li}.{bi}.conv2"),
                     "bn1": _bn_fold(sd, f"{pfx}.layer{li}.{bi}.bn1"),
                     "bn2": _bn_fold(sd, f"{pfx}.layer{li}.{bi}.bn2")}
                if f"{pfx}.layer{li}.{bi}.downsample.0.weight" in sd:
                    b["downsample"] = True
                    b["down_conv"] = _c(sd, f"{pfx}.layer{li}.{bi}.downsample.0")
                    b["bn3"] = _bn_fold(sd, f"{pfx}.layer{li}.{bi}.bn3")
                blocks.append(b)
            p[f"layer{li}"] = blocks
        return p

    def convnext(pfx):
        return {
            "dwconv": _c(sd, f"{pfx}.dwconv"),
            "norm": {"scale": np.asarray(sd[f"{pfx}.norm.weight"]),
                     "bias": np.asarray(sd[f"{pfx}.norm.bias"])},
            "pwconv1": _lin(sd, f"{pfx}.pwconv1"),
            "pwconv2": _lin(sd, f"{pfx}.pwconv2"),
            "gamma": np.asarray(sd[f"{pfx}.gamma"]),
            "final": _c(sd, f"{pfx}.final"),
        }

    params = {
        "cnet": fpn("cnet"),
        "fnet": fpn("fnet"),
        "init_conv": _c(sd, "init_conv"),
        "flow_head": {"conv1": _c(sd, "flow_head.0"), "conv2": _c(sd, "flow_head.2")},
        "upsample_weight": {"conv1": _c(sd, "upsample_weight.0"),
                            "conv2": _c(sd, "upsample_weight.2")},
        "update_block": {
            "encoder": {k: _c(sd, f"update_block.encoder.{k}")
                        for k in ("convc1", "convc2", "convf1", "convf2", "conv")},
            "refine": [convnext(f"update_block.refine.{i}")
                       for i in range(cfg.num_refine)],
        },
    }
    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params,
                        is_leaf=lambda x: isinstance(x, (np.ndarray, bool)))


def load_raft_checkpoint(path: str, cfg: RAFTConfig = SPRING_M):
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    return convert_raft2_state_dict(sd, cfg)


# ----------------------------------------------------------- random init

def init_raft(key, cfg: RAFTConfig = SPRING_M) -> Dict:
    """Random init (for tests; real use converts the Tartan checkpoint)."""
    keys = iter(jax.random.split(key, 200))
    nxt = lambda: next(keys)

    def aff(c):
        return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}

    def cv(i, o, k):
        return nn.conv2d_init(nxt(), i, o, k)

    def block(i, o, stride):
        b = {"conv1": cv(i, o, 3), "conv2": cv(o, o, 3), "bn1": aff(o), "bn2": aff(o)}
        if stride != 1 or i != o:
            b["downsample"] = True
            b["down_conv"] = cv(i, o, 1)
            b["bn3"] = aff(o)
        return b

    def fpn(in_dim, out_dim):
        p = {"conv1": cv(in_dim, cfg.initial_dim, 7), "bn1": aff(cfg.initial_dim),
             "final_conv": cv(cfg.block_dims[-1], out_dim, 1)}
        ip = cfg.initial_dim
        for li, (n, stride, dim) in enumerate(zip(cfg.n_blocks, (1, 2, 2),
                                                  cfg.block_dims), start=1):
            blocks = [block(ip if bi == 0 else dim, dim, stride if bi == 0 else 1)
                      for bi in range(n)]
            p[f"layer{li}"] = blocks
            ip = dim
        return p

    D = cfg.dim
    def convnext(dim, out):
        return {"dwconv": {"kernel": jax.random.normal(nxt(), (7, 7, 1, dim)) * 0.02,
                           "bias": jnp.zeros((dim,))},
                "norm": {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
                "pwconv1": nn.dense_init(nxt(), dim, 4 * out),
                "pwconv2": nn.dense_init(nxt(), 4 * out, dim),
                "gamma": jnp.full((dim,), 1e-6),
                "final": cv(dim, out, 1)}

    return {
        "cnet": fpn(6, 2 * D),
        "fnet": fpn(3, 2 * D),
        "init_conv": cv(2 * D, 2 * D, 3),
        "flow_head": {"conv1": cv(D, 2 * D, 3), "conv2": cv(2 * D, 6, 3)},
        "upsample_weight": {"conv1": cv(D, 2 * D, 3), "conv2": cv(2 * D, 64 * 9, 1)},
        "update_block": {
            "encoder": {"convc1": cv(cfg.corr_channel, 2 * D, 1),
                        "convc2": cv(2 * D, D + D // 2, 3),
                        "convf1": cv(2, D, 7),
                        "convf2": cv(D, D // 2, 3),
                        "conv": cv(2 * D, D - 2, 3)},
            "refine": [convnext(2 * D + D, D) for _ in range(cfg.num_refine)],
        },
    }
