import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F
import pytest


def test_linear_head_matches_torch_pixel_shuffle():
    from align3r_tpu.models.linear_head import init_linear_head, apply_linear_head
    D, P, nh, nw = 24, 4, 3, 5
    p = init_linear_head(jax.random.PRNGKey(0), D, P, has_conf=True)
    tokens = jax.random.normal(jax.random.PRNGKey(1), (2, nh * nw, D))
    raw = apply_linear_head(p, tokens, (nh, nw), (nh * P, nw * P), P)
    # torch oracle: Linear -> transpose -> view(B, C*P*P, nh, nw) -> pixel_shuffle
    W = torch.from_numpy(np.asarray(p["proj"]["kernel"])).T
    b = torch.from_numpy(np.asarray(p["proj"]["bias"]))
    t = torch.from_numpy(np.asarray(tokens))
    feat = (t @ W.T + b)
    feat = feat.transpose(-1, -2).reshape(2, -1, nh, nw)
    out = F.pixel_shuffle(feat, P).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(raw), out, atol=1e-5)


def test_silog_irmse_match_torch():
    from align3r_tpu.eval.depth_metrics import i_rmse, silog_rmse
    rng = np.random.default_rng(0)
    pred = rng.uniform(1, 5, (3, 8, 10)).astype(np.float32)
    gt = rng.uniform(1, 5, (3, 8, 10)).astype(np.float32)
    mask = rng.random((3, 8, 10)) > 0.2

    tp, tg = torch.from_numpy(pred.copy()), torch.from_numpy(gt.copy())
    tm = torch.from_numpy(mask)
    diff = 1.0 / tp - 1.0 / tg
    diff[~tm] = 0
    n = tm.sum((-1, -2))
    exp_irmse = torch.sqrt((diff ** 2).sum((-1, -2)) / n).mean().item()
    assert i_rmse(pred, gt, mask) == pytest.approx(exp_irmse, rel=1e-6)

    diff = torch.log(tp) - torch.log(tg)
    diff[~tm] = 0
    first = (diff ** 2).sum((-1, -2)) / n
    second = diff.sum((-1, -2)) ** 2 / n ** 2
    exp_silog = (torch.sqrt((first - second).mean()) * 100).item()
    assert silog_rmse(pred, gt, mask) == pytest.approx(exp_silog, rel=1e-5)


def test_pw_adaptors_identity_when_frozen():
    from align3r_tpu.alignment.scene import (
        SceneConfig, init_params, default_masks, get_adaptors)
    cfg = SceneConfig(imshape=(8, 10), n_imgs=3, n_edges=4)
    params = init_params(cfg)
    # zero adaptors -> exp(0) = 1 everywhere (no effect on the loss)
    a = np.asarray(get_adaptors(params, cfg))
    np.testing.assert_allclose(a, 1.0, atol=1e-6)
    masks = default_masks(cfg, params)
    assert float(np.asarray(masks["pw_adaptors"]).sum()) == 0  # frozen
    cfg2 = SceneConfig(imshape=(8, 10), n_imgs=3, n_edges=4,
                       allow_pw_adaptors=True)
    masks2 = default_masks(cfg2, init_params(cfg2))
    assert float(np.asarray(masks2["pw_adaptors"]).sum()) > 0


def test_tool_metric_functions_and_cli(tmp_path):
    """tool/metric.py batched metrics agree with per-image loops, CLI runs."""
    import subprocess, sys
    sys.path.insert(0, "tool")
    import metric
    rng = np.random.default_rng(0)
    pred = rng.uniform(1, 10, (3, 8, 10))
    gt = rng.uniform(1, 10, (3, 8, 10))
    valid = rng.random((3, 8, 10)) > 0.3

    # per-image loop oracle
    def loop(fn):
        vals = []
        for p, g, v in zip(pred, gt, valid):
            vals.append(fn(p[v], g[v]))
        return np.mean(vals)

    assert np.isclose(metric.abs_relative_difference(pred, gt, valid),
                      loop(lambda p, g: (np.abs(p - g) / g).mean()))
    assert np.isclose(metric.rmse_linear(pred, gt, valid),
                      loop(lambda p, g: np.sqrt(((p - g) ** 2).mean())))
    assert np.isclose(metric.delta1_acc(pred, gt, valid),
                      loop(lambda p, g: (np.maximum(p / g, g / p) < 1.25)
                           .mean()))
    assert np.isclose(metric.i_rmse(pred, gt, valid),
                      loop(lambda p, g: np.sqrt(((1 / p - 1 / g) ** 2)
                                                .mean())))
    # identical inputs -> zero errors, perfect deltas
    assert metric.abs_relative_difference(gt, gt, valid) == 0
    assert metric.delta3_acc(gt, gt, valid) == 1.0
    assert metric.silog_rmse(gt, gt, valid) < 1e-5

    np.save(tmp_path / "p.npy", pred)
    np.save(tmp_path / "g.npy", gt)
    r = subprocess.run([sys.executable, "tool/metric.py",
                        str(tmp_path / "p.npy"), str(tmp_path / "g.npy")],
                       capture_output=True, text=True)
    assert r.returncode == 0 and "AbsRel" in r.stdout
