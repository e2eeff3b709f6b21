"""Torch checkpoint <-> jnp param pytree conversion.

Behavioural reference: the reference's state-dict layout
(/root/reference/dust3r/model.py load_model:27-43, load_state_dict
dec_blocks2 duplication:114-121; croco/models/croco.py module tree;
dust3r/heads/dpt_head.py act_postprocess dedup:26-32).

Layout transforms:
  Linear          (out, in)          -> kernel (in, out)
  Conv2d          (out, in, kh, kw)  -> kernel (kh, kw, in, out)   [HWIO]
  ConvTranspose2d (in, out, kh, kw)  -> kernel (in, kh, kw, out)
  Conv1d k=1      (out, in, 1)       -> kernel (in, out)
  LayerNorm       weight/bias        -> scale/bias
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from align3r_tpu.models.config import Align3RConfig, parse_model_string


def _t(x):
    return np.asarray(x)


def _linear(sd, name):
    p = {"kernel": _t(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        p["bias"] = _t(sd[f"{name}.bias"])
    return p


def _conv2d(sd, name):
    p = {"kernel": _t(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        p["bias"] = _t(sd[f"{name}.bias"])
    return p


def _convT2d(sd, name):
    p = {"kernel": _t(sd[f"{name}.weight"]).transpose(0, 2, 3, 1)}
    if f"{name}.bias" in sd:
        p["bias"] = _t(sd[f"{name}.bias"])
    return p


def _conv1d(sd, name):
    p = {"kernel": _t(sd[f"{name}.weight"])[:, :, 0].T}
    if f"{name}.bias" in sd:
        p["bias"] = _t(sd[f"{name}.bias"])
    return p


def _ln(sd, name):
    return {"scale": _t(sd[f"{name}.weight"]), "bias": _t(sd[f"{name}.bias"])}


def _enc_block(sd, pfx):
    return {
        "norm1": _ln(sd, f"{pfx}.norm1"),
        "attn": {"qkv": _linear(sd, f"{pfx}.attn.qkv"),
                 "proj": _linear(sd, f"{pfx}.attn.proj")},
        "norm2": _ln(sd, f"{pfx}.norm2"),
        "mlp": {"fc1": _linear(sd, f"{pfx}.mlp.fc1"),
                "fc2": _linear(sd, f"{pfx}.mlp.fc2")},
    }


def _dec_block(sd, pfx, norm_mem=True):
    p = {
        "norm1": _ln(sd, f"{pfx}.norm1"),
        "attn": {"qkv": _linear(sd, f"{pfx}.attn.qkv"),
                 "proj": _linear(sd, f"{pfx}.attn.proj")},
        "cross_attn": {"projq": _linear(sd, f"{pfx}.cross_attn.projq"),
                       "projk": _linear(sd, f"{pfx}.cross_attn.projk"),
                       "projv": _linear(sd, f"{pfx}.cross_attn.projv"),
                       "proj": _linear(sd, f"{pfx}.cross_attn.proj")},
        "norm2": _ln(sd, f"{pfx}.norm2"),
        "norm3": _ln(sd, f"{pfx}.norm3"),
        "mlp": {"fc1": _linear(sd, f"{pfx}.mlp.fc1"),
                "fc2": _linear(sd, f"{pfx}.mlp.fc2")},
    }
    if norm_mem:
        p["norm_y"] = _ln(sd, f"{pfx}.norm_y")
    return p


def _dpt_head(sd, pfx):
    """downstream_head{k}.dpt.* -> our DPT param dict.

    Sequential indices: act_postprocess.{0,1}: [conv1x1, convT];
    act_postprocess.2: [conv1x1]; act_postprocess.3: [conv1x1, conv3x3 s2];
    head: [0]=conv3x3, [2]=conv3x3, [4]=conv1x1 (1=Interpolate, 3=ReLU).
    """
    p = {
        "act1_conv": _conv2d(sd, f"{pfx}.act_postprocess.0.0"),
        "act1_up": _convT2d(sd, f"{pfx}.act_postprocess.0.1"),
        "act2_conv": _conv2d(sd, f"{pfx}.act_postprocess.1.0"),
        "act2_up": _convT2d(sd, f"{pfx}.act_postprocess.1.1"),
        "act3_conv": _conv2d(sd, f"{pfx}.act_postprocess.2.0"),
        "act4_conv": _conv2d(sd, f"{pfx}.act_postprocess.3.0"),
        "act4_down": _conv2d(sd, f"{pfx}.act_postprocess.3.1"),
        "head_conv1": _conv2d(sd, f"{pfx}.head.0"),
        "head_conv2": _conv2d(sd, f"{pfx}.head.2"),
        "head_conv3": _conv2d(sd, f"{pfx}.head.4"),
    }
    for k in range(1, 5):
        p[f"layer{k}_rn"] = _conv2d(sd, f"{pfx}.scratch.layer{k}_rn")
        rn = {}
        for unit, ours in (("resConfUnit1", "res1"), ("resConfUnit2", "res2")):
            rn[ours] = {
                "conv1": _conv2d(sd, f"{pfx}.scratch.refinenet{k}.{unit}.conv1"),
                "conv2": _conv2d(sd, f"{pfx}.scratch.refinenet{k}.{unit}.conv2"),
            }
        rn["out_conv"] = _conv2d(sd, f"{pfx}.scratch.refinenet{k}.out_conv")
        p[f"refinenet{k}"] = rn
    return p


def _stack(blocks):
    import jax
    return jax.tree.map(lambda *xs: np.stack(xs), *blocks)


def convert_state_dict(sd: Dict[str, np.ndarray], cfg: Align3RConfig) -> Dict:
    """Reference state dict (numpy/torch tensors) -> our param pytree."""
    sd = {k: _t(v) for k, v in sd.items()}
    # dec_blocks2 duplication rule (model.py:114-121)
    if not any(k.startswith("dec_blocks2") for k in sd):
        for k in list(sd.keys()):
            if k.startswith("dec_blocks."):
                sd[k.replace("dec_blocks.", "dec_blocks2.", 1)] = sd[k]

    params = {
        "patch_embed": {"proj": _conv2d(sd, "patch_embed.proj")},
        "patch_embed_point_cloud": {"proj": _conv2d(sd, "patch_embed_point_cloud.proj")},
        "enc_blocks": _stack([_enc_block(sd, f"enc_blocks.{i}")
                              for i in range(cfg.enc_depth)]),
        "enc_norm": _ln(sd, "enc_norm"),
        "decoder_embed": _linear(sd, "decoder_embed"),
        "dec_blocks": _stack([_dec_block(sd, f"dec_blocks.{i}", cfg.norm_im2_in_dec)
                              for i in range(cfg.dec_depth)]),
        "dec_blocks2": _stack([_dec_block(sd, f"dec_blocks2.{i}", cfg.norm_im2_in_dec)
                               for i in range(cfg.dec_depth)]),
        "dec_blocks_pc": _stack([_enc_block(sd, f"dec_blocks_pc.{i}")
                                 for i in range(cfg.n_pc_blocks)]),
        "dec_norm": _ln(sd, "dec_norm"),
        "zero_convs": _stack([_conv1d(sd, f"zero_convs.{i}.0")
                              for i in range(cfg.n_zero_convs)]),
        "head1": _dpt_head(sd, "downstream_head1.dpt"),
        "head2": _dpt_head(sd, "downstream_head2.dpt"),
    }
    import jax.numpy as jnp
    return _tree_to_jnp(params)


def _tree_to_jnp(tree):
    import jax
    import jax.numpy as jnp
    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), tree)


def load_torch_checkpoint(path: str, cfg: Align3RConfig | None = None
                          ) -> Tuple[Dict, Align3RConfig]:
    """Load a reference .pth checkpoint (reference model.py:27-43)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if cfg is None:
        if "args" in ckpt and hasattr(ckpt["args"], "model"):
            cfg = parse_model_string(ckpt["args"].model)
        else:
            cfg = Align3RConfig()
    sd = ckpt.get("model", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    return convert_state_dict(sd, cfg), cfg


# ----------------------------------------------------------------- export

def export_state_dict(params: Dict, cfg: Align3RConfig) -> Dict[str, np.ndarray]:
    """Our pytree -> reference-layout state dict (torch-compat checkpoint
    export, inverse of convert_state_dict)."""
    import jax
    sd: Dict[str, np.ndarray] = {}

    def put_linear(name, p):
        sd[f"{name}.weight"] = np.asarray(p["kernel"]).T
        if "bias" in p:
            sd[f"{name}.bias"] = np.asarray(p["bias"])

    def put_conv2d(name, p):
        sd[f"{name}.weight"] = np.asarray(p["kernel"]).transpose(3, 2, 0, 1)
        if "bias" in p:
            sd[f"{name}.bias"] = np.asarray(p["bias"])

    def put_convT(name, p):
        sd[f"{name}.weight"] = np.asarray(p["kernel"]).transpose(0, 3, 1, 2)
        sd[f"{name}.bias"] = np.asarray(p["bias"])

    def put_conv1d(name, p):
        sd[f"{name}.weight"] = np.asarray(p["kernel"]).T[:, :, None]
        sd[f"{name}.bias"] = np.asarray(p["bias"])

    def put_ln(name, p):
        sd[f"{name}.weight"] = np.asarray(p["scale"])
        sd[f"{name}.bias"] = np.asarray(p["bias"])

    def put_enc_block(pfx, p):
        put_ln(f"{pfx}.norm1", p["norm1"])
        put_linear(f"{pfx}.attn.qkv", p["attn"]["qkv"])
        put_linear(f"{pfx}.attn.proj", p["attn"]["proj"])
        put_ln(f"{pfx}.norm2", p["norm2"])
        put_linear(f"{pfx}.mlp.fc1", p["mlp"]["fc1"])
        put_linear(f"{pfx}.mlp.fc2", p["mlp"]["fc2"])

    def put_dec_block(pfx, p):
        put_enc_block(pfx, p)
        put_ln(f"{pfx}.norm3", p["norm3"])
        if "norm_y" in p:
            put_ln(f"{pfx}.norm_y", p["norm_y"])
        for k in ("projq", "projk", "projv", "proj"):
            put_linear(f"{pfx}.cross_attn.{k}", p["cross_attn"][k])

    def layer(tree, i):
        import jax
        return jax.tree.map(lambda x: x[i], tree)

    put_conv2d("patch_embed.proj", params["patch_embed"]["proj"])
    put_conv2d("patch_embed_point_cloud.proj", params["patch_embed_point_cloud"]["proj"])
    for i in range(cfg.enc_depth):
        put_enc_block(f"enc_blocks.{i}", layer(params["enc_blocks"], i))
    put_ln("enc_norm", params["enc_norm"])
    put_linear("decoder_embed", params["decoder_embed"])
    for i in range(cfg.dec_depth):
        put_dec_block(f"dec_blocks.{i}", layer(params["dec_blocks"], i))
        put_dec_block(f"dec_blocks2.{i}", layer(params["dec_blocks2"], i))
    for i in range(cfg.n_pc_blocks):
        put_enc_block(f"dec_blocks_pc.{i}", layer(params["dec_blocks_pc"], i))
    put_ln("dec_norm", params["dec_norm"])
    for i in range(cfg.n_zero_convs):
        put_conv1d(f"zero_convs.{i}.0", layer(params["zero_convs"], i))
    for hk, pfx in (("head1", "downstream_head1.dpt"), ("head2", "downstream_head2.dpt")):
        h = params[hk]
        put_conv2d(f"{pfx}.act_postprocess.0.0", h["act1_conv"])
        put_convT(f"{pfx}.act_postprocess.0.1", h["act1_up"])
        put_conv2d(f"{pfx}.act_postprocess.1.0", h["act2_conv"])
        put_convT(f"{pfx}.act_postprocess.1.1", h["act2_up"])
        put_conv2d(f"{pfx}.act_postprocess.2.0", h["act3_conv"])
        put_conv2d(f"{pfx}.act_postprocess.3.0", h["act4_conv"])
        put_conv2d(f"{pfx}.act_postprocess.3.1", h["act4_down"])
        put_conv2d(f"{pfx}.head.0", h["head_conv1"])
        put_conv2d(f"{pfx}.head.2", h["head_conv2"])
        put_conv2d(f"{pfx}.head.4", h["head_conv3"])
        for k in range(1, 5):
            put_conv2d(f"{pfx}.scratch.layer{k}_rn", h[f"layer{k}_rn"])
            # the reference registers the same conv under a second name via
            # ModuleList aliasing (croco/models/dpt_block.py:70-73) — a torch
            # state_dict carries both keys, so the export must too
            put_conv2d(f"{pfx}.scratch.layer_rn.{k - 1}", h[f"layer{k}_rn"])
            for unit, ours in (("resConfUnit1", "res1"), ("resConfUnit2", "res2")):
                put_conv2d(f"{pfx}.scratch.refinenet{k}.{unit}.conv1",
                           h[f"refinenet{k}"][ours]["conv1"])
                put_conv2d(f"{pfx}.scratch.refinenet{k}.{unit}.conv2",
                           h[f"refinenet{k}"][ours]["conv2"])
            put_conv2d(f"{pfx}.scratch.refinenet{k}.out_conv",
                       h[f"refinenet{k}"]["out_conv"])
    return sd
