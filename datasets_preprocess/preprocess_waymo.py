#!/usr/bin/env python
"""Waymo Open Dataset -> preprocessed training layout.

Behavioural reference: /root/reference/datasets_preprocess/
preprocess_waymo.py:47-250 — two stages: (1) tfrecord extraction (needs
tensorflow + waymo_open_dataset, import-gated here) dumps per-frame
`NNNNN_<cam>.jpg` + npz(pose=car2world, pixels, pts3d (vehicle frame),
timestamp) and a calib.json of per-camera (width, height, 9 intrinsics
[f f cx cy k1 k2 p1 p2 k3], cam2car 4x4); (2) the crop stage projects the
LiDAR points through the axes swap [[0,-1,0],[0,0,-1],[1,0,0]] @ car2cam
into a sparse depth map at the rescaled resolution, with
cam2world = car2world @ cam2car @ inv(axes). Stage 2 runs without
tensorflow and is what we test; we emit the uniform
*_rgb.jpg/_depth.pfm/_mask.png/_metadata.npz layout (sparse depth: mask is
the hit mask).
"""
import argparse
import json
import os
import os.path as osp
import sys
from glob import glob

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import PIL.Image

from datasets_preprocess.common import save_frame
from align3r_tpu.training.data import cropping

AXES = np.array([[0, -1, 0, 0],
                 [0, 0, -1, 0],
                 [1, 0, 0, 0],
                 [0, 0, 0, 1]], np.float64)


def extract_frames(waymo_dir, tmp_dir):
    """Stage 1: tfrecords -> per-frame jpg + npz (requires tensorflow and
    waymo_open_dataset; reference extract_frames_one_seq:106-168)."""
    try:
        import tensorflow.compat.v1 as tf  # noqa
        from waymo_open_dataset import dataset_pb2  # noqa
        from waymo_open_dataset.utils import frame_utils  # noqa
    except ImportError as e:
        raise SystemExit(
            "waymo extraction needs tensorflow + waymo_open_dataset "
            f"(pip install waymo-open-dataset-tf-2-12-0): {e}")
    for rec in sorted(glob(osp.join(waymo_dir, "*.tfrecord"))):
        seq = osp.basename(rec)
        out_dir = osp.join(tmp_dir, seq)
        os.makedirs(out_dir, exist_ok=True)
        calib = None
        dataset = tf.data.TFRecordDataset(rec, compression_type="")
        for f_idx, data in enumerate(dataset):
            frame = dataset_pb2.Frame()
            frame.ParseFromString(bytearray(data.numpy()))
            if calib is None:
                calib = [(cam.name, dict(width=cam.width, height=cam.height,
                                         intrinsics=list(cam.intrinsic),
                                         extrinsics=list(cam.extrinsic.transform)))
                         for cam in frame.context.camera_calibrations]
                with open(osp.join(out_dir, "calib.json"), "w") as f:
                    json.dump(calib, f)
            content = frame_utils.parse_range_image_and_camera_projection(frame)
            range_images, camera_projections, _, top_pose = content
            points, cp_points = frame_utils.convert_range_image_to_point_cloud(
                frame, range_images, camera_projections, top_pose)
            points_all = np.concatenate(points, axis=0)
            cp_all = np.concatenate(cp_points, axis=0)
            for image in frame.images:
                m = cp_all[:, 0] == image.name
                rgb = tf.image.decode_jpeg(image.image).numpy()
                PIL.Image.fromarray(rgb).save(
                    osp.join(out_dir, f"{f_idx:05d}_{image.name}.jpg"))
                np.savez(osp.join(out_dir, f"{f_idx:05d}_{image.name}.npz"),
                         pose=np.asarray(image.pose.transform).reshape(4, 4),
                         pixels=cp_all[m, 1:3].astype(np.int16),
                         pts3d=points_all[m],
                         timestamp=image.pose_timestamp)


def crop_sequence(tmp_seq_dir, out_dir, resolution=512):
    """Stage 2 (no tensorflow): sparse LiDAR depth + rescale + save."""
    with open(osp.join(tmp_seq_dir, "calib.json")) as f:
        calib = json.load(f)
    cams = {}
    for cam_idx, info in calib:
        f1, f2, cx, cy = info["intrinsics"][:4]
        cams[str(cam_idx)] = dict(
            K=np.array([[f1, 0, cx], [0, f2, cy], [0, 0, 1]], np.float64),
            cam_to_car=np.asarray(info["extrinsics"]).reshape(4, 4),
            wh=(info["width"], info["height"]))
    n_done = 0
    for jpg in sorted(glob(osp.join(tmp_seq_dir, "*.jpg"))):
        stem = osp.splitext(osp.basename(jpg))[0]
        cam_idx = stem.split("_")[-1]
        data = np.load(jpg[:-3] + "npz")
        cal = cams[cam_idx]
        rgb = PIL.Image.open(jpg).convert("RGB")
        W, H = rgb.size
        # vehicle-frame points -> camera frame (reference crop_one_seq)
        T = AXES @ np.linalg.inv(cal["cam_to_car"])
        pts = data["pts3d"] @ T[:3, :3].T + T[:3, 3]
        out_res = (resolution, 1) if W > H else (1, resolution)
        rgb_s, _, _, K2 = cropping.rescale_image_depthmap(rgb, None, None,
                                                          cal["K"], out_res)
        W2, H2 = rgb_s.size
        scaleK = K2 @ np.linalg.inv(cal["K"])
        pix = data["pixels"].astype(np.float64) @ scaleK[:2, :2].T + scaleK[:2, 2]
        pix = pix.round().astype(np.int32)
        depth = np.zeros((H2, W2), np.float32)
        x = pix[:, 0].clip(0, W2 - 1)
        y = pix[:, 1].clip(0, H2 - 1)
        depth[y, x] = pts[:, 2]
        mask = (depth > 0).astype(np.float32)
        cam2world = data["pose"] @ cal["cam_to_car"] @ np.linalg.inv(AXES)
        save_frame(out_dir, stem, rgb_s, depth, mask,
                   np.asarray(K2, np.float32), cam2world.astype(np.float32))
        n_done += 1
    return n_done


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--waymo_dir", required=True)
    p.add_argument("--output_dir", default="data/waymo_proc")
    p.add_argument("--img_size", type=int, default=512)
    p.add_argument("--skip_extract", action="store_true",
                   help="tmp extraction already exists")
    args = p.parse_args()
    tmp = osp.join(args.output_dir, "tmp")
    if not args.skip_extract:
        extract_frames(args.waymo_dir, tmp)
    for seq_dir in sorted(glob(osp.join(tmp, "*"))):
        if not osp.isdir(seq_dir):
            continue
        out = osp.join(args.output_dir, osp.basename(seq_dir))
        n = crop_sequence(seq_dir, out, args.img_size)
        print("done", osp.basename(seq_dir), n, "frames")


if __name__ == "__main__":
    main()
