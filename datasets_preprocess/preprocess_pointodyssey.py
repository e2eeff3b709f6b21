#!/usr/bin/env python
"""PointOdyssey raw -> preprocessed layout.

Behavioural reference: /root/reference/datasets_preprocess/
preprocess_PointOdyssey.py — per sequence: 16-bit depth pngs scaled by
1000/65535, anno.npz intrinsics/extrinsics, blender->opencv conversion of
the pose, pp-centred crop + rescale, *_rgb.jpg/_depth.pfm/_mask.png/
_metadata.npz outputs.
"""
import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import PIL.Image

from datasets_preprocess.common import process_frame

BLENDER2OPENCV = np.float32([[1, 0, 0, 0], [0, -1, 0, 0],
                             [0, 0, -1, 0], [0, 0, 0, 1]])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", default="../data/PointOdyssey")
    p.add_argument("--output", default=None)
    p.add_argument("--splits", nargs="+", default=["train", "val"])
    p.add_argument("--img_size", type=int, default=512)
    args = p.parse_args()
    out_root = args.output or (args.input.rstrip("/") + "_proc")

    import cv2
    for split in args.splits:
        data_dir = osp.join(args.input, split)
        for seq in sorted(os.listdir(data_dir)):
            if "." in seq:
                continue
            seq_dir = osp.join(data_dir, seq)
            anno = np.load(osp.join(seq_dir, "anno.npz"))
            intr = anno["intrinsics"].astype(np.float32)
            extr = anno["extrinsics"].astype(np.float32)
            rgbs = sorted(os.listdir(osp.join(seq_dir, "rgbs")))
            depths = sorted(os.listdir(osp.join(seq_dir, "depths")))
            out_dir = osp.join(out_root, split, seq)
            for rgbf, depf, i in zip(rgbs, depths, range(len(extr))):
                rgb = PIL.Image.open(osp.join(seq_dir, "rgbs", rgbf)).convert("RGB")
                d16 = cv2.imread(osp.join(seq_dir, "depths", depf),
                                 cv2.IMREAD_ANYDEPTH)
                depth = d16.astype(np.float32) / 65535.0 * 1000.0
                K = intr[i][:3, :3]
                pose = extr[i].reshape(4, 4) @ BLENDER2OPENCV
                frame_id = rgbf.split(".")[0][-4:]
                process_frame(out_dir, frame_id, rgb, depth, K, pose,
                              args.img_size)
            print("done", seq)


if __name__ == "__main__":
    main()
