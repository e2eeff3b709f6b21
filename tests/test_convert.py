"""Checkpoint conversion tests: layout roundtrip + torch-oracle numeric parity
for every layer type the converter touches."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import pytest

from align3r_tpu.models.config import TINY_TEST
from align3r_tpu.models.align3r import init_align3r, apply_align3r
from align3r_tpu.models.convert import (
    convert_state_dict, export_state_dict, _linear, _conv2d, _convT2d, _conv1d, _ln)
from align3r_tpu.models import nn as jnn

torch.manual_seed(0)


def sd_of(mod, prefix="m"):
    return {f"{prefix}.{k}": v.detach().numpy() for k, v in mod.state_dict().items()}


def test_linear_parity():
    m = tnn.Linear(8, 12)
    p = _linear(sd_of(m), "m")
    x = torch.randn(3, 8)
    np.testing.assert_allclose(jnn.dense(p, jnp.asarray(x.numpy())),
                               m(x).detach().numpy(), atol=1e-5)


def test_conv2d_parity_stride1_and_2():
    m = tnn.Conv2d(4, 6, 3, padding=1)
    p = _conv2d(sd_of(m), "m")
    x = torch.randn(2, 4, 9, 11)
    ours = jnn.conv2d(p, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    theirs = m(x).permute(0, 2, 3, 1).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)
    # stride 2 with padding 1 (DPT act4_down)
    m2 = tnn.Conv2d(4, 6, 3, stride=2, padding=1)
    p2 = _conv2d(sd_of(m2), "m")
    ours2 = jnn.conv2d(p2, jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
                       stride=2, padding=[(1, 1), (1, 1)])
    theirs2 = m2(x).permute(0, 2, 3, 1).detach().numpy()
    assert ours2.shape == theirs2.shape
    np.testing.assert_allclose(np.asarray(ours2), theirs2, atol=1e-5)


def test_conv_transpose_parity():
    for k in (2, 4):
        m = tnn.ConvTranspose2d(5, 7, k, stride=k)
        p = _convT2d(sd_of(m), "m")
        x = torch.randn(1, 5, 6, 8)
        ours = jnn.conv_transpose2d(p, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
        theirs = m(x).permute(0, 2, 3, 1).detach().numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_conv1d_zero_conv_parity():
    m = tnn.Conv1d(6, 6, 1)
    p = _conv1d(sd_of(m), "m")
    x = torch.randn(2, 6, 10)  # (B, C, N) tokens transposed, as in model.py:209
    theirs = m(x).permute(0, 2, 1).detach().numpy()
    ours = jnn.dense(p, jnp.asarray(x.permute(0, 2, 1).numpy()))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_layernorm_parity():
    m = tnn.LayerNorm(16, eps=1e-6)
    with torch.no_grad():
        m.weight.mul_(1.7).add_(0.1)
        m.bias.add_(0.3)
    p = _ln(sd_of(m), "m")
    x = torch.randn(4, 16)
    np.testing.assert_allclose(np.asarray(jnn.layernorm(p, jnp.asarray(x.numpy()))),
                               m(x).detach().numpy(), atol=1e-5)


def test_gelu_parity():
    x = torch.linspace(-4, 4, 101)
    theirs = tnn.GELU()(x).numpy()
    ours = np.asarray(jnn.gelu(jnp.asarray(x.numpy())))
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_roundtrip_export_convert():
    cfg = TINY_TEST
    params = init_align3r(jax.random.PRNGKey(0), cfg)
    sd = export_state_dict(params, cfg)
    params2 = convert_state_dict(sd, cfg)
    flat1 = jax.tree.leaves_with_path(params)
    flat2 = dict(jax.tree.leaves_with_path(params2))
    assert len(flat1) == len(flat2)
    for path, leaf in flat1:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat2[path]),
                                      err_msg=str(path))


def test_dec_blocks2_duplication_rule():
    cfg = TINY_TEST
    params = init_align3r(jax.random.PRNGKey(1), cfg)
    sd = export_state_dict(params, cfg)
    # drop dec_blocks2 keys: converter must duplicate dec_blocks
    sd = {k: v for k, v in sd.items() if not k.startswith("dec_blocks2")}
    params2 = convert_state_dict(sd, cfg)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(params2["dec_blocks2"])[0]),
        np.asarray(jax.tree.leaves(params2["dec_blocks"])[0]))
    # and the model still runs
    v1 = {"img": jnp.zeros((1, 32, 32, 3)), "pred_depth": jnp.zeros((1, 32, 32, 3))}
    r1, _ = apply_align3r(params2, v1, v1, cfg, dtype=jnp.float32)
    assert np.isfinite(np.asarray(r1["pts3d"])).all()


def test_bilinear_upsample_matches_torch_in_dpt_context():
    """The DPT fusion path uses align_corners=True 2x upsampling."""
    x = torch.randn(1, 3, 5, 7)
    theirs = tnn.functional.interpolate(x, scale_factor=2, mode="bilinear",
                                        align_corners=True)
    ours = jnn.bilinear_resize(jnp.asarray(x.permute(0, 2, 3, 1).numpy()), 10, 14,
                               align_corners=True)
    np.testing.assert_allclose(np.asarray(ours),
                               theirs.permute(0, 2, 3, 1).numpy(), atol=1e-5)
