#!/usr/bin/env python
"""Spring stereo-video -> preprocessed training layout.

Behavioural reference: /root/reference/datasets_preprocess/
preprocess_Spring.py:1-116 — left-eye frames with half-resolution h5
disparity (key 'disparity', nearest-upsampled to RGB size), depth = fx /
disparity (NaN/<=0 -> 1e-3), per-frame intrinsics (fx fy cx cy rows) and
flattened 4x4 extrinsics right-multiplied by the blender->opencv flip,
pp-centred crop + rescale into *_rgb.jpg/_depth.pfm/_mask.png/_metadata.npz.
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

BLENDER2OPENCV = np.float32([[1, 0, 0, 0], [0, -1, 0, 0],
                             [0, 0, -1, 0], [0, 0, 0, 1]])


def load_disparity(path, size):
    import h5py
    import cv2
    disp = np.array(h5py.File(path, "r")["disparity"]).astype(np.float32)
    disp = cv2.resize(disp, size, interpolation=cv2.INTER_NEAREST)
    disp[~np.isfinite(disp)] = 1e-3
    disp[disp <= 0] = 1e-3
    return disp


def convert_sequence(seq_dir, out_dir, img_size):
    extrinsics = np.loadtxt(osp.join(seq_dir, "cam_data", "extrinsics.txt"))
    intrinsics = np.loadtxt(osp.join(seq_dir, "cam_data", "intrinsics.txt"))
    imgs = sorted(glob(osp.join(seq_dir, "frame_left", "*")))
    disps = sorted(glob(osp.join(seq_dir, "disp1_left", "*")))
    for img_f, disp_f, i in zip(imgs, disps, range(len(extrinsics))):
        rgb = PIL.Image.open(img_f).convert("RGB")
        disp = load_disparity(disp_f, rgb.size)
        fx, fy, cx, cy = intrinsics[i][:4]
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
        pose = extrinsics[i].reshape(4, 4).astype(np.float32) @ BLENDER2OPENCV
        depth = fx / disp
        frame_id = osp.splitext(osp.basename(img_f))[0][-4:]
        process_frame(out_dir, frame_id, rgb, depth, K, pose, img_size)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", default="../data/spring")
    p.add_argument("--split", default="train")
    p.add_argument("--img_size", type=int, default=512)
    args = p.parse_args()
    data_dir = osp.join(args.input, args.split)
    out_root = osp.join(args.input + "_proc", args.split)
    for seq in sorted(os.listdir(data_dir)):
        seq_dir = osp.join(data_dir, seq)
        if not osp.isdir(seq_dir):
            continue
        convert_sequence(seq_dir, osp.join(out_root, seq), args.img_size)
        print("done", seq)


if __name__ == "__main__":
    main()
