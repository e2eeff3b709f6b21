"""Drive tool/pose_test.py end-to-end on synthetic fixtures.

Covers (VERDICT r1 #7): the scannet dataset entry runs to metrics (replica
matrix-row GT poses, reference eval_metadata.py:44-55), and the hierarchical
mode (reference pose_test.py:300-549) runs on >= 25 synthetic frames.
"""
import os
import sys

import numpy as np
import PIL.Image
import pytest
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from align3r_tpu.models.config import TINY_TEST
from align3r_tpu.models.align3r import init_align3r


def _tiny_model(*_a, **_k):
    cfg = TINY_TEST
    params = init_align3r(jax.random.PRNGKey(0), cfg)
    for h in ("head1", "head2"):
        hc = dict(params[h])
        hc["head_conv3"] = {
            "kernel": params[h]["head_conv3"]["kernel"] * 0.01,
            "bias": params[h]["head_conv3"]["bias"] * 0.0,
        }
        params = dict(params, **{h: hc})
    return params, cfg


def _make_scannet_fixture(root, n_frames):
    """./data/scannetv2/scene0/color_30/*.png + pose_30.txt (replica rows)."""
    seq_dir = os.path.join(root, "data", "scannetv2", "scene0", "color_30")
    os.makedirs(seq_dir)
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (48, 64, 3))
    rows = []
    for i in range(n_frames):
        img = np.clip(base + 10 * np.sin(np.arange(64) / 5 + i)[None, :, None],
                      0, 255).astype(np.uint8)
        PIL.Image.fromarray(img).save(os.path.join(seq_dir, f"{i:06d}.png"))
        T = np.eye(4)
        T[:3, 3] = [0.1 * i, 0.02 * i, 0.01 * i * i]
        c, s = np.cos(0.05 * i), np.sin(0.05 * i)
        T[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        rows.append(T[:3].reshape(-1))
    np.savetxt(os.path.join(root, "data", "scannetv2", "scene0", "pose_30.txt"),
               np.stack(rows))


def _run_pose_test(monkeypatch, tmp_path, extra_args, n_frames):
    _make_scannet_fixture(str(tmp_path), n_frames)
    monkeypatch.chdir(tmp_path)
    import tool.demo
    monkeypatch.setattr(tool.demo, "load_model", _tiny_model)
    import tool.pose_test as PT
    out = str(tmp_path / "out")
    argv = ["pose_test", "--eval_dataset", "scannet", "--output_dir", out,
            "--image_size", "64", "--niter", "5", "--batch_size", "4",
            "--lr", "0.05"] + extra_args
    monkeypatch.setattr(sys, "argv", argv)
    PT.main()
    return out


def test_pose_test_scannet_runs_to_metrics(monkeypatch, tmp_path):
    out = _run_pose_test(monkeypatch, tmp_path, [], n_frames=6)
    assert os.path.exists(os.path.join(out, "scene0", "pred_traj.txt"))
    results = os.path.join(out, "_results_0.txt")
    assert os.path.exists(results), "metrics were not produced"
    vals = dict(l.split() for l in open(results))
    assert np.isfinite(float(vals["ate"]))
    # per-sequence failures would have been swallowed into the error log
    err = os.path.join(out, "_error_log_0.txt")
    assert not os.path.exists(err), open(err).read() if os.path.exists(err) else ""


@pytest.mark.slow
def test_pose_test_hierarchical_25_frames(monkeypatch, tmp_path):
    out = _run_pose_test(monkeypatch, tmp_path,
                         ["--hierarchical", "--clip_size", "8"], n_frames=25)
    traj = np.loadtxt(os.path.join(out, "scene0", "pred_traj.txt"))
    assert traj.shape == (25, 8), traj.shape  # ts + tum7 per frame
    assert np.isfinite(traj).all()
    # per-frame depth artifacts from the stitched clips
    assert os.path.exists(os.path.join(out, "scene0", "frame_0024.npy"))
    results = os.path.join(out, "_results_0.txt")
    assert os.path.exists(results)
    err = os.path.join(out, "_error_log_0.txt")
    assert not os.path.exists(err), open(err).read() if os.path.exists(err) else ""
