#!/usr/bin/env python
"""TUM-dynamics test prep: subsample rgb/depth/groundtruth to 50 frames.

Behavioural reference: /root/reference/datasets_preprocess/prepare_tum.py —
copies frames[30:80] of rgb/ and depth/ into rgb_50/ and depth_50/, and
rows 30:80 of groundtruth.txt into groundtruth_50.txt per sequence.
"""
import argparse
import glob
import os
import shutil

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="../data/tum")
    p.add_argument("--start", type=int, default=30)
    p.add_argument("--count", type=int, default=50)
    args = p.parse_args()
    lo, hi = args.start, args.start + args.count
    for d in sorted(glob.glob(os.path.join(args.root, "*/"))):
        for sub in ("rgb", "depth"):
            frames = sorted(glob.glob(os.path.join(d, sub, "*.png")))[lo:hi]
            new = os.path.join(d, f"{sub}_{args.count}")
            os.makedirs(new, exist_ok=True)
            for f in frames:
                shutil.copy(f, new)
        gt_file = os.path.join(d, "groundtruth.txt")
        if os.path.exists(gt_file):
            gt = np.loadtxt(gt_file)
            np.savetxt(os.path.join(d, f"groundtruth_{args.count}.txt"), gt[lo:hi])
        print("prepared", d)


if __name__ == "__main__":
    main()
