"""Preprocess converter roundtrip: process_frame output loads through the
training dataset class with a consistent unprojection."""
import numpy as np
import PIL.Image
import pytest

from datasets_preprocess.common import process_frame, write_pfm
from align3r_tpu.training.data.datasets import read_pfm, PointodysseyDatasets


def test_process_frame_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    H, W = 120, 160
    rgb = PIL.Image.fromarray(rng.integers(0, 255, (H, W, 3), np.uint8))
    depth = rng.uniform(1, 10, (H, W)).astype(np.float32)
    K = np.array([[100, 0, W / 2], [0, 100, H / 2], [0, 0, 1]], np.float32)
    pose = np.eye(4, dtype=np.float32)
    out = tmp_path / "seq"
    process_frame(str(out), "0001", rgb, depth, K, pose, img_size=128)

    assert (out / "0001_rgb.jpg").exists()
    d = read_pfm(str(out / "0001_depth.pfm"))
    img = PIL.Image.open(out / "0001_rgb.jpg")
    assert d.shape == img.size[::-1]
    meta = np.load(out / "0001_metadata.npz")
    K2 = meta["camera_intrinsics"]
    # principal point stays centred after pp-centred crop + rescale
    assert abs(K2[0, 2] - img.size[0] / 2) < 1.5
    assert abs(K2[1, 2] - img.size[1] / 2) < 1.5
    # depth values preserved (nearest resize of a smooth map)
    assert 0.9 < d.mean() / depth.mean() < 1.1


def test_preprocessed_output_feeds_dataset(tmp_path):
    """Converter output is directly consumable by the dataset pipeline."""
    rng = np.random.default_rng(1)
    H, W = 120, 160
    root = tmp_path / "po" / "scene_x"
    for k in range(3):
        rgb = PIL.Image.fromarray(rng.integers(0, 255, (H, W, 3), np.uint8))
        depth = rng.uniform(1, 10, (H, W)).astype(np.float32)
        K = np.array([[100, 0, W / 2], [0, 100, H / 2], [0, 0, 1]], np.float32)
        process_frame(str(root), f"{k:04d}", rgb, depth, K,
                      np.eye(4, dtype=np.float32), img_size=128)
        # prior cache alongside (as infer scripts would produce)
        np.savez(str(root / f"{k:04d}_rgb_pred_depth_depthpro.npz"),
                 depth=depth, focallength_px=np.float32(100.0))
    ds = PointodysseyDatasets(split="train", ROOT=str(tmp_path / "po"),
                              resolution=(96, 64), seed=1)
    views = ds[0]
    assert views[0]["pts3d"].shape == (64, 96, 3)
    assert views[0]["valid_mask"].any()
