"""Drive tool/depth_test.py end-to-end on a synthetic PointOdyssey-layout
fixture: *_rgb.jpg frames, *_depth.pfm native-resolution GT, cached
monocular-prior npz. Verifies the reference protocol (VERDICT r1 #4):
predictions are upsampled to GT resolution (never GT downsized), the
PointOdyssey/FlyingThings3D pfm protocol runs to metrics, and sequence
discovery walks bottom-level dirs.
"""
import os
import sys

import numpy as np
import PIL.Image
import pytest
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_pose_tool import _tiny_model


def _make_po_fixture(root, n_frames=4, gt_hw=(96, 128)):
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "datasets_preprocess"))
    from datasets_preprocess.common import write_pfm
    seq_dir = os.path.join(root, "data", "PointOdyssey_proc", "val", "seqA")
    os.makedirs(seq_dir)
    rng = np.random.default_rng(0)
    H, W = gt_hw
    for i in range(n_frames):
        img = rng.uniform(0, 255, (48, 64, 3)).astype(np.uint8)
        PIL.Image.fromarray(img).save(os.path.join(seq_dir, f"{i:04d}_rgb.jpg"))
        depth = 2.0 + 0.5 * np.sin(np.arange(W) / 7)[None, :] \
            + 0.1 * i + np.zeros((H, W), np.float32)
        write_pfm(os.path.join(seq_dir, f"{i:04d}_depth.pfm"),
                  depth.astype(np.float32))
        np.savez(os.path.join(seq_dir, f"{i:04d}_rgb_pred_depth_depthpro.npz"),
                 depth=depth[::2, ::2].astype(np.float32),
                 focallength_px=np.float32(100.0))
    return seq_dir


def test_depth_test_pointodyssey_gt_resolution(monkeypatch, tmp_path):
    _make_po_fixture(str(tmp_path))
    monkeypatch.chdir(tmp_path)
    import tool.demo
    monkeypatch.setattr(tool.demo, "load_model", _tiny_model)
    import tool.depth_test as DT
    out = str(tmp_path / "out")
    monkeypatch.setattr(sys, "argv", [
        "depth_test", "--eval_dataset", "PointOdyssey", "--output_dir", out,
        "--image_size", "64", "--niter", "5", "--batch_size", "4",
        "--no_promptda"])
    DT.main()
    # per-seq depths saved at MODEL resolution
    d = np.load(os.path.join(out, "seqA_depths.npy"))
    assert d.shape[0] == 4 and d.shape[1] < 96  # model res < GT res
    metrics = os.path.join(out, "_metrics_0.txt")
    assert os.path.exists(metrics), "metrics not produced"
    vals = {l.split(":")[0]: float(l.split(":")[1]) for l in open(metrics)}
    assert np.isfinite(vals["Abs Rel"]) and vals["valid_pixels"] > 0
    # evaluation happened at GT resolution: every GT pixel below depth_max
    # is valid -> count = n * H * W at NATIVE res
    assert vals["valid_pixels"] == 4 * 96 * 128


def test_bottom_level_sequence_discovery(tmp_path):
    from align3r_tpu.eval.metadata import DatasetMeta
    for s in ("A/0001", "A/0002", "B/0003"):
        os.makedirs(tmp_path / s)
    meta = DatasetMeta(img_path=str(tmp_path), full_seq=True, bottom_level=True)
    assert meta.sequences() == ["A/0001", "A/0002", "B/0003"]
    meta20 = DatasetMeta(img_path=str(tmp_path), full_seq=True,
                         bottom_level=True, seq_stride=2)
    assert meta20.sequences() == ["A/0001", "B/0003"]


def test_upsample_predictions_bilinear():
    import tool.depth_test as DT
    d = np.arange(12, dtype=np.float32).reshape(1, 3, 4)
    up = DT.upsample_predictions(d, ["x"], (6, 8), promptda=None)
    assert up.shape == (1, 6, 8)
    assert abs(float(up.mean()) - float(d.mean())) < 0.3
