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


def test_spring_tartanair_vkitti_converters(tmp_path):
    """The three sequence converters drive process_frame end to end from
    their raw on-disk layouts."""
    import cv2
    rng = np.random.default_rng(2)
    H, W = 60, 80

    # --- spring: frame_left pngs + half... (2x) res h5 disparity + cam_data
    h5py = pytest.importorskip("h5py")
    spring = tmp_path / "spring" / "train" / "0001"
    (spring / "frame_left").mkdir(parents=True)
    (spring / "disp1_left").mkdir()
    (spring / "cam_data").mkdir()
    n = 2
    np.savetxt(spring / "cam_data" / "extrinsics.txt",
               np.tile(np.eye(4, dtype=np.float32).reshape(1, 16), (n, 1)))
    np.savetxt(spring / "cam_data" / "intrinsics.txt",
               np.tile(np.array([[100.0, 100.0, W / 2, H / 2]]), (n, 1)))
    for k in range(n):
        PIL.Image.fromarray(rng.integers(0, 255, (H, W, 3), np.uint8)).save(
            spring / "frame_left" / f"frame_left_{k:04d}.png")
        with h5py.File(spring / "disp1_left" /
                       f"disp1_left_{k:04d}.dsp5", "w") as f:
            f["disparity"] = rng.uniform(5, 50, (2 * H, 2 * W)) \
                .astype(np.float32)
    from datasets_preprocess.preprocess_spring import convert_sequence
    convert_sequence(str(spring), str(tmp_path / "spring_out"), img_size=64)
    assert read_pfm(str(tmp_path / "spring_out" / "0001_depth.pfm")).min() > 0

    # --- tartanair: image_left pngs + depth_left npy + NED pose txt
    ta = tmp_path / "ta" / "seqP001"
    (ta / "image_left").mkdir(parents=True)
    (ta / "depth_left").mkdir()
    poses = np.zeros((n, 7), np.float32)
    poses[:, 6] = 1.0  # identity quaternion
    poses[:, 0] = np.arange(n)  # NED x = forward
    np.savetxt(ta / "pose_left.txt", poses)
    for k in range(n):
        # fixed TartanAir resolution (K assumes 640x480)
        PIL.Image.fromarray(
            rng.integers(0, 255, (480, 640, 3), np.uint8)).save(
            ta / "image_left" / f"{k:06d}_left.png")
        np.save(ta / "depth_left" / f"{k:06d}_left_depth.npy",
                rng.uniform(1, 10, (480, 640)).astype(np.float32))
    from datasets_preprocess.preprocess_tartanair import (convert_sequence
                                                          as conv_ta, ned2cam)
    conv_ta(str(ta), str(tmp_path / "ta_out"), "left", img_size=64)
    meta = np.load(tmp_path / "ta_out" / "000001_metadata.npz")
    # NED forward motion becomes camera +z
    np.testing.assert_allclose(meta["camera_pose"][:3, 3], [0, 0, 1],
                               atol=1e-6)
    assert np.allclose(ned2cam(poses[0]), np.eye(4))

    # --- vkitti: cm-scaled 16-bit depth pngs + textgt intrinsic/extrinsic
    vk = tmp_path / "vk"
    img_dir = vk / "rgb" / "Camera_0"
    dep_dir = vk / "depth" / "Camera_0"
    img_dir.mkdir(parents=True)
    dep_dir.mkdir(parents=True)
    rows_e, rows_i = [], []
    for k in range(n):
        PIL.Image.fromarray(rng.integers(0, 255, (H, W, 3), np.uint8)).save(
            img_dir / f"rgb_{k:05d}.jpg")
        d_cm = (rng.uniform(1, 10, (H, W)) * 100).astype(np.uint16)
        cv2.imwrite(str(dep_dir / f"depth_{k:05d}.png"), d_cm)
        rows_e.append(f"{k} 0 " + " ".join(
            map(str, np.eye(4).reshape(-1).tolist())))
        rows_i.append(f"{k} 0 100.0 100.0 {W / 2} {H / 2}")
    (vk / "extrinsic.txt").write_text("frame cam pose\n" + "\n".join(rows_e))
    (vk / "intrinsic.txt").write_text("frame cam K\n" + "\n".join(rows_i))
    from datasets_preprocess.preprocess_vkitti import (read_textgt,
                                                       convert_camera)
    poses0, _ = read_textgt(str(vk / "extrinsic.txt"), 16)
    intris0, _ = read_textgt(str(vk / "intrinsic.txt"), 4)
    convert_camera(str(img_dir), str(dep_dir), poses0, intris0,
                   str(tmp_path / "vk_out"), img_size=64)
    d = read_pfm(str(tmp_path / "vk_out" / "00001_depth.pfm"))
    assert 0.5 < d.mean() < 12  # cm -> m conversion applied


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
