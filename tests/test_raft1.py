import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as F
import pytest

from align3r_tpu.models.raft1 import (
    RAFT1Config, instance_norm, sep_conv_gru, build_corr_pyramid_raft1,
    raft1_forward, convert_raft1_state_dict)


def test_instance_norm_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 6, 8, 5)).astype(np.float32)
    ours = np.asarray(instance_norm(jnp.asarray(x)))
    t = tnn.InstanceNorm2d(5)(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(ours, t.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_sep_conv_gru_matches_torch():
    torch.manual_seed(0)
    hd, idim = 8, 12
    convs = {}
    for name, k, pad in (("convz1", (1, 5), (0, 2)), ("convr1", (1, 5), (0, 2)),
                         ("convq1", (1, 5), (0, 2)), ("convz2", (5, 1), (2, 0)),
                         ("convr2", (5, 1), (2, 0)), ("convq2", (5, 1), (2, 0))):
        convs[name] = tnn.Conv2d(hd + idim, hd, k, padding=pad)
    p = {name: {"kernel": jnp.asarray(c.weight.detach().numpy().transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(c.bias.detach().numpy())}
         for name, c in convs.items()}
    rng = np.random.default_rng(1)
    h = rng.standard_normal((1, 6, 7, hd)).astype(np.float32)
    x = rng.standard_normal((1, 6, 7, idim)).astype(np.float32)
    ours = np.asarray(sep_conv_gru(p, jnp.asarray(h), jnp.asarray(x)))

    th = torch.from_numpy(h).permute(0, 3, 1, 2)
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    hx = torch.cat([th, tx], 1)
    z = torch.sigmoid(convs["convz1"](hx))
    r = torch.sigmoid(convs["convr1"](hx))
    q = torch.tanh(convs["convq1"](torch.cat([r * th, tx], 1)))
    th = (1 - z) * th + z * q
    hx = torch.cat([th, tx], 1)
    z = torch.sigmoid(convs["convz2"](hx))
    r = torch.sigmoid(convs["convr2"](hx))
    q = torch.tanh(convs["convq2"](torch.cat([r * th, tx], 1)))
    th = (1 - z) * th + z * q
    np.testing.assert_allclose(ours, th.permute(0, 2, 3, 1).detach().numpy(),
                               atol=1e-5)


def test_corr_pyramid_avgpool_matches_torch():
    rng = np.random.default_rng(2)
    f1 = rng.standard_normal((1, 4, 6, 8)).astype(np.float32)
    f2 = rng.standard_normal((1, 4, 6, 8)).astype(np.float32)
    pyr = build_corr_pyramid_raft1(jnp.asarray(f1), jnp.asarray(f2), 3)
    c0 = torch.from_numpy(np.asarray(pyr[0])).reshape(24, 1, 4, 6)
    exp1 = F.avg_pool2d(c0, 2, stride=2).squeeze(1).numpy()
    np.testing.assert_allclose(np.asarray(pyr[1]).reshape(24, 2, 3), exp1,
                               atol=1e-5)


def _tiny_sd(cfg):
    """Reference-layout RAFT1 state dict from torch modules."""
    torch.manual_seed(3)
    sd = {}

    def add_conv(name, i, o, k, pad=None):
        c = tnn.Conv2d(i, o, k)
        sd[f"{name}.weight"] = c.weight.detach().numpy()
        sd[f"{name}.bias"] = c.bias.detach().numpy()

    def add_bn(name, c):
        bn = tnn.BatchNorm2d(c)
        with torch.no_grad():
            bn.running_mean.normal_(0, 0.1)
            bn.running_var.uniform_(0.8, 1.2)
        for a in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{name}.{a}"] = getattr(bn, a).detach().numpy()

    def add_enc(pfx, out_dim, kind):
        add_conv(f"{pfx}.conv1", 3, 64, 7)
        if kind == "batch":
            add_bn(f"{pfx}.norm1", 64)
        dims = {1: (64, 64), 2: (64, 96), 3: (96, 128)}
        for li, (i, o) in dims.items():
            for bi in range(2):
                ii = i if bi == 0 else o
                q = f"{pfx}.layer{li}.{bi}"
                add_conv(f"{q}.conv1", ii, o, 3)
                add_conv(f"{q}.conv2", o, o, 3)
                if kind == "batch":
                    add_bn(f"{q}.norm1", o)
                    add_bn(f"{q}.norm2", o)
                if bi == 0 and (li > 1 or ii != o):
                    add_conv(f"{q}.downsample.0", ii, o, 1)
                    if kind == "batch":
                        add_bn(f"{q}.norm3", o)
        add_conv(f"{pfx}.conv2", 128, out_dim, 1)

    add_enc("fnet", 256, "instance")
    add_enc("cnet", cfg.hidden_dim + cfg.context_dim, "batch")
    cp = cfg.corr_channel
    add_conv("update_block.encoder.convc1", cp, 256, 1)
    add_conv("update_block.encoder.convc2", 256, 192, 3)
    add_conv("update_block.encoder.convf1", 2, 128, 7)
    add_conv("update_block.encoder.convf2", 128, 64, 3)
    add_conv("update_block.encoder.conv", 256, 126, 3)
    for name, k in (("convz1", (1, 5)), ("convr1", (1, 5)), ("convq1", (1, 5)),
                    ("convz2", (5, 1)), ("convr2", (5, 1)), ("convq2", (5, 1))):
        c = tnn.Conv2d(cfg.hidden_dim + 256, cfg.hidden_dim, k)
        sd[f"update_block.gru.{name}.weight"] = c.weight.detach().numpy()
        sd[f"update_block.gru.{name}.bias"] = c.bias.detach().numpy()
    add_conv("update_block.flow_head.conv1", cfg.hidden_dim, 256, 3)
    add_conv("update_block.flow_head.conv2", 256, 2, 3)
    add_conv("update_block.mask.0", 128, 256, 3)
    add_conv("update_block.mask.2", 256, 576, 1)
    return sd


def test_raft1_forward_runs():
    cfg = RAFT1Config(iters=2)
    params = convert_raft1_state_dict(_tiny_sd(cfg), cfg)
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 48, 64, 3)) * 255
    flow = raft1_forward(params, img, img, cfg, iters=2)
    assert flow.shape == (1, 48, 64, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_raft1_bf16_compute_close_to_fp32():
    """compute_dtype=bfloat16 (the TPU default via the pipeline's
    device-conditional autocast mirror) keeps flow close to fp32: positional
    state stays fp32, so the error is conv-stack rounding only."""
    cfg = RAFT1Config(iters=4)
    params = convert_raft1_state_dict(_tiny_sd(cfg), cfg)
    img1 = jax.random.uniform(jax.random.PRNGKey(1), (1, 48, 64, 3)) * 255
    img2 = jax.random.uniform(jax.random.PRNGKey(2), (1, 48, 64, 3)) * 255
    f32 = np.asarray(raft1_forward(params, img1, img2, cfg, iters=4))
    f16 = np.asarray(raft1_forward(params, img1, img2, cfg, iters=4,
                                   compute_dtype=jnp.bfloat16))
    assert f16.dtype == np.float32
    assert np.isfinite(f16).all()
    scale = np.abs(f32).mean() + 1e-3
    rel = np.abs(f16 - f32).mean() / scale
    assert rel < 0.15, (rel, scale)
