#!/usr/bin/env python
"""BlendedMVS -> preprocessed training layout.

Behavioural reference: /root/reference/datasets_preprocess/
preprocess_blendedMVS.py:36-110 — per sequence (24-char hash dirs):
cams/<img>_cam.txt holds a world2cam 4x4 (after 'extrinsic') and a 3x3 K
(after 'intrinsic'); images in blended_images/<img>.jpg; depth in
rendered_depth_maps/<img>.pfm. We emit the uniform
*_rgb.jpg/_depth.pfm/_mask.png/_metadata.npz layout.
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
from align3r_tpu.training.data.datasets import read_pfm


def load_cam_txt(path):
    """(K (3,3), cam2world (4,4)) from the BlendedMVS cam file format:
    line 'extrinsic', 4 rows w2c, blank, 'intrinsic', 3 rows K."""
    with open(path) as f:
        lines = [l.strip() for l in f if l.strip()]
    i_ext = lines.index("extrinsic") + 1
    w2c = np.array([[float(v) for v in lines[i_ext + r].split()]
                    for r in range(4)], np.float32)
    i_int = lines.index("intrinsic") + 1
    K = np.array([[float(v) for v in lines[i_int + r].split()]
                  for r in range(3)], np.float32)
    return K, np.linalg.inv(w2c)


def convert_sequence(seq_dir, out_dir, img_size=512):
    cams = sorted(glob(osp.join(seq_dir, "cams", "*_cam.txt")))
    for cam_f in cams:
        img_id = osp.basename(cam_f)[:-8]
        img_f = osp.join(seq_dir, "blended_images", img_id + ".jpg")
        pfm_f = osp.join(seq_dir, "rendered_depth_maps", img_id + ".pfm")
        if not (osp.exists(img_f) and osp.exists(pfm_f)):
            continue
        K, c2w = load_cam_txt(cam_f)
        rgb = PIL.Image.open(img_f).convert("RGB")
        depth = np.ascontiguousarray(read_pfm(pfm_f))
        process_frame(out_dir, img_id, rgb, depth, K, c2w, img_size)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--blendedmvs_dir", required=True)
    p.add_argument("--output_dir", default="data/blendedmvs_proc")
    p.add_argument("--img_size", type=int, default=512)
    args = p.parse_args()
    seqs = [f for f in sorted(os.listdir(args.blendedmvs_dir)) if len(f) == 24]
    assert seqs, f"no sequences at {args.blendedmvs_dir}"
    for seq in seqs:
        convert_sequence(osp.join(args.blendedmvs_dir, seq),
                         osp.join(args.output_dir, seq), args.img_size)
        print("done", seq)


if __name__ == "__main__":
    main()
