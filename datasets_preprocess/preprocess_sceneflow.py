#!/usr/bin/env python
"""SceneFlow (FlyingThings3D / Driving / Monkaa) -> preprocessed layout.

Behavioural reference: /root/reference/datasets_preprocess/
preprocess_Flythings3D.py / preprocess_Driving.py / preprocess_Monkaa.py —
depth = fx / disparity (fx = 1050 for FlyingThings/Monkaa, 450 for the
15mm Driving subset), camera_data.txt left-camera poses, pp-centred crop +
rescale into *_rgb.jpg/_depth.pfm/_mask.png/_metadata.npz.
"""
import argparse
import os
import os.path as osp
import re
import sys
from glob import glob

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import PIL.Image

from datasets_preprocess.common import process_frame
from align3r_tpu.training.data.datasets import read_pfm


def read_camera_data(path):
    """camera_data.txt: 'Frame N' then L/R rows of 4x4 cam2world (row-major)."""
    poses = []
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    for i, ln in enumerate(lines):
        if ln.startswith("L "):
            vals = [float(x) for x in ln[2:].split()]
            poses.append(np.asarray(vals, np.float32).reshape(4, 4))
    return poses


def convert_sequence(img_dir, out_dir, fx, img_size):
    disp_dir = img_dir.replace("frames_finalpass", "disparity") \
        .replace("frames_cleanpass", "disparity")
    cam_file = osp.join(osp.dirname(img_dir.rstrip("/").replace(
        "frames_finalpass", "camera_data").replace("frames_cleanpass",
                                                   "camera_data")),
        "camera_data.txt")
    imgs = sorted(glob(osp.join(img_dir, "*.png")))
    disps = sorted(glob(osp.join(disp_dir, "*.pfm")))
    poses = read_camera_data(cam_file) if osp.exists(cam_file) else \
        [np.eye(4, dtype=np.float32)] * len(imgs)
    H0, W0 = None, None
    for img_f, disp_f, pose in zip(imgs, disps, poses):
        rgb = PIL.Image.open(img_f).convert("RGB")
        disp = read_pfm(disp_f).astype(np.float32)
        disp[~np.isfinite(disp)] = 1e-3
        disp[disp <= 0] = 1e-3
        depth = fx / disp
        W, H = rgb.size
        K = np.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1]], np.float32)
        frame_id = osp.splitext(osp.basename(img_f))[0]
        process_frame(out_dir, frame_id, rgb, depth, K, pose, img_size)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", default="../data/SceneFlow")
    p.add_argument("--subset", choices=["FlyingThings3D", "Driving", "Monkaa"],
                   required=True)
    p.add_argument("--img_size", type=int, default=512)
    args = p.parse_args()
    root = osp.join(args.input, args.subset)
    out_root = osp.join(args.input, args.subset + "_proc")
    pattern = {
        "FlyingThings3D": "frames_finalpass/*/*/*/left",
        "Driving": "frames_finalpass/*/*/*/left",
        "Monkaa": "frames_finalpass/*/left",
    }[args.subset]
    for img_dir in sorted(glob(osp.join(root, pattern))):
        fx = 450.0 if "15mm" in img_dir else 1050.0
        rel = osp.relpath(osp.dirname(img_dir), root)
        rel = rel.replace("frames_finalpass" + os.sep, "")
        convert_sequence(img_dir, osp.join(out_root, rel), fx, args.img_size)
        print("done", rel)


if __name__ == "__main__":
    main()
