#!/usr/bin/env python
"""TartanAir (Easy subsets, left+right cams) -> preprocessed layout.

Behavioural reference: /root/reference/datasets_preprocess/
preprocess_Tartanair.py:1-170 — fixed pinhole K (f=320, pp=(320,240)),
NED-frame pose txt (tx ty tz qx qy qz qw) conjugated into the camera frame
by the axis permutation T=[[0,1,0],[0,0,1],[1,0,0]], .npy depths, <400
validity, pp-centred crop + rescale into the *_rgb.jpg/_depth.pfm/
_mask.png/_metadata.npz layout.
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

K_TARTANAIR = np.array([[320.0, 0, 320.0], [0, 320.0, 240.0], [0, 0, 1]],
                       np.float32)
NED2CAM = np.array([[0, 1, 0, 0], [0, 0, 1, 0], [1, 0, 0, 0], [0, 0, 0, 1]],
                   np.float32)


def pose_vec_to_matrix(vec):
    """(tx ty tz qx qy qz qw) -> 4x4 (scipy quat convention, xyzw)."""
    from scipy.spatial.transform import Rotation
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = Rotation.from_quat(vec[3:7]).as_matrix()
    m[:3, 3] = vec[:3]
    return m


def ned2cam(vec):
    return NED2CAM @ pose_vec_to_matrix(vec) @ NED2CAM.T


def convert_sequence(seq_dir, out_dir, cam, img_size):
    imgs = sorted(glob(osp.join(seq_dir, f"image_{cam}", "*.png")))
    depths = sorted(glob(osp.join(seq_dir, f"depth_{cam}", "*.npy")))
    poses = np.loadtxt(osp.join(seq_dir, f"pose_{cam}.txt"))
    for img_f, depth_f, vec in zip(imgs, depths, poses):
        rgb = PIL.Image.open(img_f).convert("RGB")
        depth = np.load(depth_f).astype(np.float32)
        frame_id = osp.basename(img_f)[:6]
        process_frame(out_dir, frame_id, rgb, depth, K_TARTANAIR.copy(),
                      ned2cam(vec), img_size)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", default="../data/Tartanair")
    p.add_argument("--difficulty", default="Easy")
    p.add_argument("--img_size", type=int, default=512)
    args = p.parse_args()
    out_root = args.input.rstrip("/") + "_proc"
    for scene in sorted(os.listdir(args.input)):
        lvl_dir = osp.join(args.input, scene, args.difficulty)
        if not osp.isdir(lvl_dir):
            continue
        for seq in sorted(os.listdir(lvl_dir)):
            for cam in ("left", "right"):
                out = osp.join(out_root,
                               f"{scene}_{args.difficulty}_{seq}_{cam}")
                convert_sequence(osp.join(lvl_dir, seq), out, cam,
                                 args.img_size)
                print("done", out)


if __name__ == "__main__":
    main()
