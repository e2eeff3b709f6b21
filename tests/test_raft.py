import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as F
import pytest

from align3r_tpu.models.raft import (
    RAFTConfig, SPRING_M, init_raft, raft_forward, build_corr_pyramid,
    lookup_corr, upsample_data, _unfold9, basic_block, conv_next_block,
    convert_raft2_state_dict, pad_to_8)

TINY = RAFTConfig(dim=32, radius=2, corr_levels=3, initial_dim=16,
                  block_dims=(16, 24, 32), n_blocks=(1, 1, 1), num_refine=1,
                  iters=3)


def test_raft_forward_shapes_and_finite():
    params = init_raft(jax.random.PRNGKey(0), TINY)
    img1 = jax.random.uniform(jax.random.PRNGKey(1), (1, 40, 56, 3)) * 255
    img2 = jax.random.uniform(jax.random.PRNGKey(2), (1, 40, 56, 3)) * 255
    flow = raft_forward(params, img1, img2, TINY)
    assert flow.shape == (1, 40, 56, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_raft_nondivisible_input_padding():
    params = init_raft(jax.random.PRNGKey(0), TINY)
    img = jax.random.uniform(jax.random.PRNGKey(3), (1, 37, 51, 3)) * 255
    flow = raft_forward(params, img, img, TINY, iters=1)
    assert flow.shape == (1, 37, 51, 2)


def test_corr_pyramid_values():
    """Level-0 correlation = <f1[p], f2[q]>/sqrt(C)."""
    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.standard_normal((1, 4, 5, 8)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((1, 4, 5, 8)).astype(np.float32))
    pyr = build_corr_pyramid(f1, f2, TINY)
    assert len(pyr) == TINY.corr_levels
    c = np.asarray(pyr[0]).reshape(20, 4, 5)
    expect = np.einsum("nc,hwc->nhw", np.asarray(f1).reshape(20, 8),
                       np.asarray(f2)[0]) / np.sqrt(8)
    np.testing.assert_allclose(c, expect, atol=1e-5)


def test_lookup_corr_center_identity():
    """Sampling at integer grid coords at level 0 returns the exact corr value
    at the window center channel."""
    rng = np.random.default_rng(1)
    f1 = jnp.asarray(rng.standard_normal((1, 4, 4, 8)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((1, 4, 4, 8)).astype(np.float32))
    cfg = RAFTConfig(radius=1, corr_levels=1)
    pyr = build_corr_pyramid(f1, f2, cfg)
    coords = jnp.broadcast_to(
        jnp.stack(jnp.meshgrid(jnp.arange(4.0), jnp.arange(4.0), indexing="xy"),
                  -1)[None], (1, 4, 4, 2))
    out = np.asarray(lookup_corr(pyr, coords, cfg))  # (1,4,4,9)
    # center channel (i=1, j=1) -> k=4: corr at (x, y) itself
    c0 = np.asarray(pyr[0]).reshape(16, 4, 4)
    for y in range(4):
        for x in range(4):
            np.testing.assert_allclose(out[0, y, x, 4], c0[y * 4 + x, y, x],
                                       atol=1e-5)


def test_unfold9_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 5, 6, 3)).astype(np.float32)
    ours = np.asarray(_unfold9(jnp.asarray(x)))  # (B,h,w,9,C)
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    unf = F.unfold(t, [3, 3], padding=1).view(2, 3, 9, 5, 6)
    oracle = unf.permute(0, 3, 4, 2, 1).numpy()
    np.testing.assert_allclose(ours, oracle, atol=1e-6)


def test_upsample_data_matches_torch():
    rng = np.random.default_rng(3)
    B, h, w = 1, 3, 4
    flow = rng.standard_normal((B, h, w, 2)).astype(np.float32)
    info = rng.standard_normal((B, h, w, 4)).astype(np.float32)
    mask = rng.standard_normal((B, h, w, 576)).astype(np.float32)
    f_ours, i_ours = upsample_data(*map(jnp.asarray, (flow, info, mask)))

    tf = torch.from_numpy(flow).permute(0, 3, 1, 2)
    ti = torch.from_numpy(info).permute(0, 3, 1, 2)
    tm = torch.from_numpy(mask).permute(0, 3, 1, 2)
    m = torch.softmax(tm.view(B, 1, 9, 8, 8, h, w), dim=2)
    uf = F.unfold(8 * tf, [3, 3], padding=1).view(B, 2, 9, 1, 1, h, w)
    ui = F.unfold(ti, [3, 3], padding=1).view(B, 4, 9, 1, 1, h, w)
    of = torch.sum(m * uf, dim=2).permute(0, 1, 4, 2, 5, 3).reshape(B, 2, 8 * h, 8 * w)
    oi = torch.sum(m * ui, dim=2).permute(0, 1, 4, 2, 5, 3).reshape(B, 4, 8 * h, 8 * w)
    np.testing.assert_allclose(np.asarray(f_ours), of.permute(0, 2, 3, 1).numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(i_ours), oi.permute(0, 2, 3, 1).numpy(), atol=1e-5)


class TorchBasicBlock(tnn.Module):
    """Oracle implementing the documented BasicBlock (layer.py:110-135)."""
    def __init__(self, i, o, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(i, o, 3, stride=stride, padding=1)
        self.conv2 = tnn.Conv2d(o, o, 3, padding=1)
        self.bn1 = tnn.BatchNorm2d(o)
        self.bn2 = tnn.BatchNorm2d(o)
        self.down = tnn.Conv2d(i, o, 1, stride=stride) if (stride != 1 or i != o) else None
        self.bn3 = tnn.BatchNorm2d(o) if self.down is not None else None

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        if self.down is not None:
            x = self.bn3(self.down(x))
        return torch.relu(x + y)


def _fold_bn(bn):
    eps = bn.eps
    scale = (bn.weight / torch.sqrt(bn.running_var + eps)).detach().numpy()
    bias = (bn.bias - bn.running_mean * bn.weight /
            torch.sqrt(bn.running_var + eps)).detach().numpy()
    return {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}


def _conv_p(c):
    return {"kernel": jnp.asarray(c.weight.detach().numpy().transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(c.bias.detach().numpy())}


def test_basic_block_parity_with_folded_bn():
    torch.manual_seed(0)
    m = TorchBasicBlock(6, 10, stride=2).eval()
    with torch.no_grad():  # make BN stats non-trivial
        for bn in (m.bn1, m.bn2, m.bn3):
            bn.running_mean.normal_(0, 0.3)
            bn.running_var.uniform_(0.5, 2.0)
    p = {"conv1": _conv_p(m.conv1), "conv2": _conv_p(m.conv2),
         "bn1": _fold_bn(m.bn1), "bn2": _fold_bn(m.bn2),
         "downsample": True, "down_conv": _conv_p(m.down), "bn3": _fold_bn(m.bn3)}
    x = torch.randn(1, 6, 8, 10)
    ours = np.asarray(basic_block(p, jnp.asarray(x.permute(0, 2, 3, 1).numpy()), stride=2))
    theirs = m(x).permute(0, 2, 3, 1).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_convert_raft2_roundtrip_keys():
    """Converter consumes a reference-layout state dict (built from torch
    modules) without missing keys and produces a runnable param tree."""
    torch.manual_seed(1)
    cfg = TINY
    sd = {}
    def add_conv(name, i, o, k):
        c = tnn.Conv2d(i, o, k)
        sd[f"{name}.weight"] = c.weight.detach().numpy()
        sd[f"{name}.bias"] = c.bias.detach().numpy()
    def add_bn(name, c):
        bn = tnn.BatchNorm2d(c)
        for attr in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{name}.{attr}"] = getattr(bn, attr).detach().numpy()
    def add_fpn(pfx, in_dim, out_dim):
        add_conv(f"{pfx}.conv1", in_dim, cfg.initial_dim, 7)
        add_bn(f"{pfx}.bn1", cfg.initial_dim)
        ip = cfg.initial_dim
        for li, (n, dim) in enumerate(zip(cfg.n_blocks, cfg.block_dims), start=1):
            for bi in range(n):
                i = ip if bi == 0 else dim
                add_conv(f"{pfx}.layer{li}.{bi}.conv1", i, dim, 3)
                add_conv(f"{pfx}.layer{li}.{bi}.conv2", dim, dim, 3)
                add_bn(f"{pfx}.layer{li}.{bi}.bn1", dim)
                add_bn(f"{pfx}.layer{li}.{bi}.bn2", dim)
                if li > 1 and bi == 0 or i != dim:
                    add_conv(f"{pfx}.layer{li}.{bi}.downsample.0", i, dim, 1)
                    add_bn(f"{pfx}.layer{li}.{bi}.bn3", dim)
            ip = dim
        add_conv(f"{pfx}.final_conv", cfg.block_dims[-1], out_dim, 1)
    D = cfg.dim
    add_fpn("cnet", 6, 2 * D)
    add_fpn("fnet", 3, 2 * D)
    add_conv("init_conv", 2 * D, 2 * D, 3)
    add_conv("flow_head.0", D, 2 * D, 3)
    add_conv("flow_head.2", 2 * D, 6, 3)
    add_conv("upsample_weight.0", D, 2 * D, 3)
    add_conv("upsample_weight.2", 2 * D, 576, 1)
    add_conv("update_block.encoder.convc1", cfg.corr_channel, 2 * D, 1)
    add_conv("update_block.encoder.convc2", 2 * D, D + D // 2, 3)
    add_conv("update_block.encoder.convf1", 2, D, 7)
    add_conv("update_block.encoder.convf2", D, D // 2, 3)
    add_conv("update_block.encoder.conv", 2 * D, D - 2, 3)
    for i in range(cfg.num_refine):
        pfx = f"update_block.refine.{i}"
        dwc = tnn.Conv2d(3 * D, 3 * D, 7, groups=3 * D)
        sd[f"{pfx}.dwconv.weight"] = dwc.weight.detach().numpy()
        sd[f"{pfx}.dwconv.bias"] = dwc.bias.detach().numpy()
        sd[f"{pfx}.norm.weight"] = np.ones(3 * D, np.float32)
        sd[f"{pfx}.norm.bias"] = np.zeros(3 * D, np.float32)
        lin1 = tnn.Linear(3 * D, 4 * D)
        lin2 = tnn.Linear(4 * D, 3 * D)
        sd[f"{pfx}.pwconv1.weight"] = lin1.weight.detach().numpy()
        sd[f"{pfx}.pwconv1.bias"] = lin1.bias.detach().numpy()
        sd[f"{pfx}.pwconv2.weight"] = lin2.weight.detach().numpy()
        sd[f"{pfx}.pwconv2.bias"] = lin2.bias.detach().numpy()
        sd[f"{pfx}.gamma"] = np.full(3 * D, 1e-6, np.float32)
        add_conv(f"{pfx}.final", 3 * D, D, 1)

    params = convert_raft2_state_dict(sd, cfg)
    img = jax.random.uniform(jax.random.PRNGKey(5), (1, 24, 32, 3)) * 255
    flow = raft_forward(params, img, img, cfg, iters=2)
    assert flow.shape == (1, 24, 32, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_dwconv_groups_parity():
    """Depthwise conv in ConvNext vs torch groups conv."""
    torch.manual_seed(2)
    dim = 12
    m = tnn.Conv2d(dim, dim, 7, padding=3, groups=dim)
    x = torch.randn(1, dim, 9, 11)
    kernel = jnp.asarray(m.weight.detach().numpy().transpose(2, 3, 1, 0))
    y = jax.lax.conv_general_dilated(
        jnp.asarray(x.permute(0, 2, 3, 1).numpy()), kernel, (1, 1),
        [(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=dim) + jnp.asarray(m.bias.detach().numpy())
    np.testing.assert_allclose(np.asarray(y), m(x).permute(0, 2, 3, 1).detach().numpy(),
                               atol=1e-5)


def test_lookup_corr_onehot_matches_gather():
    """The MXU one-hot lookup must equal the gather-form bilinear lookup."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from align3r_tpu.models.raft import lookup_corr, RAFTConfig
    cfg = RAFTConfig()
    B, h1, w1 = 2, 6, 8
    N = h1 * w1
    key = jax.random.PRNGKey(0)
    pyramid = []
    h2, w2 = h1, w1
    for lvl in range(cfg.corr_levels):
        pyramid.append(jax.random.normal(jax.random.fold_in(key, lvl),
                                         (B, N, max(h2, 1), max(w2, 1))))
        h2, w2 = h2 // 2, w2 // 2
    coords = jax.random.uniform(jax.random.PRNGKey(1), (B, h1, w1, 2),
                                minval=-2.0, maxval=10.0)
    a = lookup_corr(pyramid, coords, cfg, impl="gather")
    b = lookup_corr(pyramid, coords, cfg, impl="onehot")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)


def test_raft_bf16_compute_close_to_fp32():
    """compute_dtype=bfloat16 keeps flow close to the fp32 path: positions,
    accumulated flow, and matmul accumulators stay fp32, so the error is the
    conv-stack rounding, not a systematic drift."""
    params = init_raft(jax.random.PRNGKey(0), TINY)
    img1 = jax.random.uniform(jax.random.PRNGKey(1), (1, 40, 56, 3)) * 255
    img2 = jax.random.uniform(jax.random.PRNGKey(2), (1, 40, 56, 3)) * 255
    f32 = np.asarray(raft_forward(params, img1, img2, TINY, iters=4))
    f16 = np.asarray(raft_forward(params, img1, img2, TINY, iters=4,
                                  compute_dtype=jnp.bfloat16))
    assert f16.dtype == np.float32
    assert np.isfinite(f16).all()
    scale = np.abs(f32).mean() + 1e-3
    rel = np.abs(f16 - f32).mean() / scale
    assert rel < 0.15, (rel, scale)
