#!/usr/bin/env python
"""Virtual KITTI 2 -> preprocessed training layout.

Behavioural reference: /root/reference/datasets_preprocess/
preprocess_vikitti.py:1-183 — 16-bit depth png in centimetres (/100),
validity < 600 m, per-frame intrinsic rows (frame cam fx fy cx cy) and
extrinsic rows (frame cam + flattened 4x4) from textgt, both cameras
emitted as separate scene{N}_{left,right} sequences, pp-centred crop +
rescale into *_rgb.jpg/_depth.pfm/_mask.png/_metadata.npz.
"""
import argparse
import os
import os.path as osp
import sys
from glob import glob

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import PIL.Image

from datasets_preprocess.common import process_frame


def read_textgt(cam_file, n_vals):
    """Rows 'frame camID v...' -> ([cam0 rows], [cam1 rows]) float arrays."""
    out = ([], [])
    with open(cam_file) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 2 + n_vals or not parts[1] in ("0", "1"):
                continue
            out[int(parts[1])].append(
                np.asarray(parts[2:2 + n_vals], np.float32))
    return out


def convert_camera(img_dir, depth_dir, poses, intris, out_dir, img_size):
    imgs = sorted(glob(osp.join(img_dir, "*")))
    depths = sorted(glob(osp.join(depth_dir, "*")))
    import cv2
    for img_f, depth_f, pose, intri in zip(imgs, depths, poses, intris):
        rgb = PIL.Image.open(img_f).convert("RGB")
        depth = cv2.imread(depth_f, cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)
        depth = depth.astype(np.float32) / 100.0
        fx, fy, cx, cy = intri
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
        frame_id = osp.splitext(osp.basename(img_f))[0][4:]  # strip 'rgb_'
        process_frame(out_dir, frame_id, rgb, depth,
                      K, pose.reshape(4, 4), img_size, max_depth=600.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", default="../data/vkitti_2.0.3")
    p.add_argument("--output_dir", default="../data/vkitti_2.0.3_proc")
    p.add_argument("--img_size", type=int, default=512)
    args = p.parse_args()
    assert args.data_dir != args.output_dir
    image_paths = sorted(glob(osp.join(args.data_dir, "vkitti_2.0.3_rgb",
                                       "*/*/*/*")))
    camera_paths = sorted(glob(osp.join(args.data_dir, "vkitti_2.0.3_textgt",
                                        "*/*")))
    for scene_label, (image_path, camera_path) in enumerate(
            zip(image_paths, camera_paths)):
        depth_path = image_path.replace("rgb", "depth")
        poses = read_textgt(osp.join(camera_path, "extrinsic.txt"), 16)
        intris = read_textgt(osp.join(camera_path, "intrinsic.txt"), 4)
        for cam, label in ((0, "left"), (1, "right")):
            out = osp.join(args.output_dir,
                           f"scene{scene_label:0>4d}_{label}")
            convert_camera(osp.join(image_path, f"Camera_{cam}"),
                           osp.join(depth_path, f"Camera_{cam}"),
                           poses[cam], intris[cam], out, args.img_size)
            print("done", out)


if __name__ == "__main__":
    main()
