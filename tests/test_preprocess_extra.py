"""Synthetic-raw-fixture tests for the DUSt3R-era preprocess converters
(blendedMVS, StaticThings3D, MegaDepth, WildRGB-D, CO3D, ARKitScenes,
ScanNet++, Waymo crop stage): each converter parses its raw layout and
emits the uniform *_rgb.jpg/_depth.pfm/_mask.png/_metadata.npz frames."""
import gzip
import json
import os
import os.path as osp
import sys

import numpy as np
import PIL.Image
import pytest

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__)))))

from datasets_preprocess.common import write_pfm
from align3r_tpu.training.data.datasets import read_pfm


def _check_frames(out_dir, n_expected=None):
    pfm = sorted(f for f in os.listdir(out_dir) if f.endswith("_depth.pfm"))
    assert pfm, f"no frames written in {out_dir}"
    if n_expected is not None:
        assert len(pfm) == n_expected, (len(pfm), n_expected)
    stem = pfm[0][:-10]
    d = read_pfm(osp.join(out_dir, stem + "_depth.pfm"))
    img = PIL.Image.open(osp.join(out_dir, stem + "_rgb.jpg"))
    assert d.shape == img.size[::-1]
    meta = np.load(osp.join(out_dir, stem + "_metadata.npz"))
    assert meta["camera_intrinsics"].shape == (3, 3)
    assert meta["camera_pose"].shape == (4, 4)
    assert np.isfinite(meta["camera_pose"]).all()
    return d, meta


def test_blendedmvs_converter(tmp_path):
    rng = np.random.default_rng(0)
    seq = tmp_path / ("0" * 24)
    for sub in ("cams", "blended_images", "rendered_depth_maps"):
        (seq / sub).mkdir(parents=True)
    H, W = 60, 80
    for i in range(2):
        name = f"{i:08d}"
        with open(seq / "cams" / f"{name}_cam.txt", "w") as f:
            f.write("extrinsic\n")
            T = np.eye(4)
            T[:3, 3] = [0.1 * i, 0, 0]
            for r in T:
                f.write(" ".join(str(v) for v in r) + "\n")
            f.write("\nintrinsic\n")
            K = [[90, 0, W / 2], [0, 90, H / 2], [0, 0, 1]]
            for r in K:
                f.write(" ".join(str(v) for v in r) + "\n")
        PIL.Image.fromarray(rng.integers(0, 255, (H, W, 3), np.uint8)).save(
            seq / "blended_images" / f"{name}.jpg")
        write_pfm(str(seq / "rendered_depth_maps" / f"{name}.pfm"),
                  rng.uniform(1, 5, (H, W)).astype(np.float32))
    from datasets_preprocess.preprocess_blendedmvs import convert_sequence
    convert_sequence(str(seq), str(tmp_path / "out"), img_size=64)
    d, meta = _check_frames(str(tmp_path / "out"), 2)
    assert 0.5 < d[d > 0].mean() < 6


def test_staticthings3d_converter(tmp_path):
    rng = np.random.default_rng(1)
    root = tmp_path / "st3d"
    rel = osp.join("TRAIN", "A", "0000")
    H, W = 54, 96

    def wfloat3(path, arr):
        arr = np.asarray(arr, np.float32)
        os.makedirs(osp.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(b"float\n")
            f.write(f"{arr.ndim}\n".encode())
            for d in reversed(arr.shape):
                f.write(f"{d}\n".encode())
            arr.tofile(f)

    for n in range(6, 8):
        num = f"{n:04d}"
        K = np.array([[80, 0, W / 2], [0, 80, H / 2], [0, 0, 1]], np.float32)
        wfloat3(str(root / "intrinsics" / rel / f"{num}.float3"), K)
        for cam in ("left",):
            w2c = np.eye(4, dtype=np.float32)
            wfloat3(str(root / "poses" / rel / cam / f"{num}.float3"), w2c)
            wfloat3(str(root / "depths" / rel / cam / f"{num}.float3"),
                    rng.uniform(2, 8, (H, W)))
            p = root / "frames_cleanpass" / rel / cam
            p.mkdir(parents=True, exist_ok=True)
            PIL.Image.fromarray(rng.integers(0, 255, (H, W, 3), np.uint8)
                                ).save(p / f"{num}.png")
    from datasets_preprocess.preprocess_staticthings3d import convert_sequence
    convert_sequence(str(root), rel, str(tmp_path / "out"),
                     cameras=("left",), frames=range(6, 8), img_size=64)
    _check_frames(str(tmp_path / "out" / rel / "left"), 2)


def test_megadepth_converter(tmp_path):
    h5py = pytest.importorskip("h5py")
    rng = np.random.default_rng(2)
    scene = tmp_path / "0001"
    sparse = scene / "sparse" / "manhattan" / "0"
    sparse.mkdir(parents=True)
    H, W = 48, 64
    with open(sparse / "cameras.txt", "w") as f:
        f.write("# header\n# header\n# header\n")
        f.write(f"1 SIMPLE_RADIAL {W} {H} 70 {W/2} {H/2} 0.0\n")
    with open(sparse / "images.txt", "w") as f:
        f.write("# h\n# h\n# h\n# h\n")
        for i, name in enumerate(["im0.jpg", "im1.jpg"]):
            f.write(f"{i+1} 1 0 0 0 {0.1*i} 0 0 1 {name}\n")
            f.write("0 0 -1\n")
    dense = scene / "dense0"
    (dense / "imgs").mkdir(parents=True)
    (dense / "depths").mkdir()
    for name in ("im0", "im1"):
        PIL.Image.fromarray(rng.integers(0, 255, (H, W, 3), np.uint8)).save(
            dense / "imgs" / f"{name}.jpg")
        with h5py.File(dense / "depths" / f"{name}.h5", "w") as h:
            h["depth"] = rng.uniform(1, 9, (H, W)).astype(np.float32)
    from datasets_preprocess.preprocess_megadepth import convert_subscene
    convert_subscene(str(scene), "0", str(tmp_path / "out"), img_size=64)
    _check_frames(str(tmp_path / "out"), 2)


def test_wildrgbd_converter(tmp_path):
    import cv2
    rng = np.random.default_rng(3)
    scene = tmp_path / "scene"
    for sub in ("rgb", "depth", "masks"):
        (scene / sub).mkdir(parents=True)
    H, W = 48, 64
    K = np.array([[75, 0, W / 2], [0, 75, H / 2], [0, 0, 1]], np.float32)
    with open(scene / "metadata", "w") as f:
        json.dump({"K": K.T.reshape(-1).tolist(), "w": W, "h": H}, f)
    rows = []
    n = 3
    for i in range(n):
        PIL.Image.fromarray(rng.integers(0, 255, (H, W, 3), np.uint8)).save(
            scene / "rgb" / f"{i:05d}.png")
        cv2.imwrite(str(scene / "depth" / f"{i:05d}.png"),
                    (rng.uniform(500, 3000, (H, W))).astype(np.uint16))
        rows.append(np.concatenate([[i], np.eye(4).reshape(-1)]))
    np.savetxt(scene / "cam_poses.txt", np.stack(rows))
    from datasets_preprocess.preprocess_wildrgbd import convert_sequence
    convert_sequence(str(scene), str(tmp_path / "out"), img_size=64,
                     num_frames=3)
    d, _ = _check_frames(str(tmp_path / "out"), 3)
    assert 0.3 < d[d > 0].mean() < 3.5  # millimetres converted to metres


def test_co3d_converter(tmp_path):
    rng = np.random.default_rng(4)
    cat = tmp_path / "chair"
    seq = "seqA"
    (cat / "set_lists").mkdir(parents=True)
    H, W = 48, 64
    frames, frame_ann = [], []
    img_dir = cat / seq / "images"
    depth_dir = cat / seq / "depths"
    mask_dir = cat / seq / "masks"
    for p in (img_dir, depth_dir, mask_dir):
        p.mkdir(parents=True)
    for i in range(2):
        fp = f"chair/{seq}/images/frame{i:06d}.jpg"
        PIL.Image.fromarray(rng.integers(0, 255, (H, W, 3), np.uint8)).save(
            tmp_path / fp)
        depth = rng.uniform(1, 4, (H, W)).astype(np.float16)
        dpath = f"chair/{seq}/depths/frame{i:06d}.png"
        PIL.Image.fromarray(depth.view(np.uint16)).save(tmp_path / dpath)
        PIL.Image.fromarray(np.full((H, W), 255, np.uint8)).save(
            tmp_path / f"chair/{seq}/masks/frame{i:06d}.png")
        frames.append([seq, i, fp])
        frame_ann.append({
            "sequence_name": seq, "frame_number": i,
            "viewpoint": {"R": np.eye(3).tolist(), "T": [0.1 * i, 0, 0],
                          "focal_length": [2.0, 2.0],
                          "principal_point": [0.0, 0.0]},
            "image": {"size": [H, W]},
            "depth": {"path": dpath, "scale_adjustment": 1.0}})
    with open(cat / "set_lists" / "set_lists_fewview_train.json", "w") as f:
        json.dump({"train_known": frames}, f)
    with gzip.open(cat / "frame_annotations.jgz", "wt") as f:
        json.dump(frame_ann, f)
    with gzip.open(cat / "sequence_annotations.jgz", "wt") as f:
        json.dump([{"sequence_name": seq, "viewpoint_quality_score": 1.0}], f)
    from datasets_preprocess.preprocess_co3d import prepare_sequences
    seqs = prepare_sequences("chair", str(tmp_path), str(tmp_path / "out"),
                             img_size=64, split="train")
    assert seqs == [seq]
    _check_frames(str(tmp_path / "out" / "chair" / seq), 2)


def test_arkitscenes_converter(tmp_path):
    import cv2
    rng = np.random.default_rng(5)
    scene = tmp_path / "41069021"
    for sub in ("lowres_wide", "lowres_depth", "lowres_wide_intrinsics"):
        (scene / sub).mkdir(parents=True)
    H, W = 48, 64
    ts_list = [1.0, 2.0, 3.0]
    with open(scene / "lowres_wide.traj", "w") as f:
        for t in ts_list:
            f.write(f"{t} 0 0 0 {0.05*t} 0 0\n")
    for t in ts_list:
        name = f"41069021_{t:.3f}.png"
        PIL.Image.fromarray(rng.integers(0, 255, (H, W, 3), np.uint8)).save(
            scene / "lowres_wide" / name)
        cv2.imwrite(str(scene / "lowres_depth" / name),
                    rng.uniform(800, 2500, (H, W)).astype(np.uint16))
        np.savetxt(scene / "lowres_wide_intrinsics" / f"41069021_{t:.3f}.pincam",
                   [[W, H, 70, 70, W / 2, H / 2]])
    from datasets_preprocess.preprocess_arkitscenes import convert_scene
    convert_scene(str(scene), str(tmp_path / "out"), img_size=64)
    _check_frames(str(tmp_path / "out"), 3)


def test_scannetpp_converter(tmp_path):
    import cv2
    rng = np.random.default_rng(6)
    base = tmp_path / "scene0" / "iphone"
    (base / "colmap").mkdir(parents=True)
    (base / "rgb").mkdir()
    (base / "depth").mkdir()
    H, W = 48, 64
    with open(base / "colmap" / "cameras.txt", "w") as f:
        f.write(f"1 OPENCV {W} {H} 70 70 {W/2} {H/2} 0.01 0.0 0.0 0.0\n")
    with open(base / "colmap" / "images.txt", "w") as f:
        for i in range(2):
            f.write(f"{i+1} 1 0 0 0 {0.1*i} 0 0 1 frame_{i:06d}.jpg\n")
            f.write("\n")
    for i in range(2):
        PIL.Image.fromarray(rng.integers(0, 255, (H, W, 3), np.uint8)).save(
            base / "rgb" / f"frame_{i:06d}.jpg")
        cv2.imwrite(str(base / "depth" / f"frame_{i:06d}.png"),
                    rng.uniform(1000, 4000, (H, W)).astype(np.uint16))
    from datasets_preprocess.preprocess_scannetpp import convert_scene
    n = convert_scene(str(tmp_path / "scene0"), str(tmp_path / "out"),
                      img_size=64)
    assert n == 2
    _check_frames(str(tmp_path / "out"), 2)


def test_waymo_crop_stage(tmp_path):
    rng = np.random.default_rng(7)
    seq = tmp_path / "tmp" / "seq0.tfrecord"
    seq.mkdir(parents=True)
    H, W = 48, 64
    calib = [[1, {"width": W, "height": H,
                  "intrinsics": [70, 70, W / 2, H / 2, 0, 0, 0, 0, 0],
                  "extrinsics": np.eye(4).reshape(-1).tolist()}]]
    with open(seq / "calib.json", "w") as f:
        json.dump(calib, f)
    pts_cam = np.stack([rng.uniform(-1, 1, 40), rng.uniform(-1, 1, 40),
                        rng.uniform(2, 9, 40)], axis=1)
    # vehicle frame = inv(AXES) @ cam (extrinsics identity)
    from datasets_preprocess.preprocess_waymo import AXES
    pts_car = pts_cam @ np.linalg.inv(AXES)[:3, :3].T
    pix = (pts_cam[:, :2] / pts_cam[:, 2:3]) * 70 + np.array([W / 2, H / 2])
    PIL.Image.fromarray(rng.integers(0, 255, (H, W, 3), np.uint8)).save(
        seq / "00000_1.jpg")
    np.savez(seq / "00000_1.npz", pose=np.eye(4), pixels=pix.astype(np.int16),
             pts3d=pts_car, timestamp=0.0)
    from datasets_preprocess.preprocess_waymo import crop_sequence
    n = crop_sequence(str(seq), str(tmp_path / "out"), resolution=64)
    assert n == 1
    d, meta = _check_frames(str(tmp_path / "out"), 1)
    assert (d > 0).sum() >= 10          # sparse LiDAR hits present
    assert 1.5 < d[d > 0].mean() < 10   # depths preserved
