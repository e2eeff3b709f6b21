#!/usr/bin/env python
"""WildRGB-D -> preprocessed training layout.

Behavioural reference: /root/reference/datasets_preprocess/
preprocess_wildrgbd.py:43-165 — per category/sequence: 'metadata' JSON with
column-major K ("K", reshape(3,3).T) and w/h; cam_poses.txt rows
[frame_id, 16 c2w values]; frames rgb/%05d.png, depth/%05d.png (uint16 mm),
masks/%05d.png; sequence lists from camera_eval_list.json/nvs_list.json;
output_num_frames frames sampled uniformly. Depth is in millimetres
(/1000). We emit the uniform *_rgb.jpg/_depth.pfm/_mask.png/_metadata.npz
layout.
"""
import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import PIL.Image

from datasets_preprocess.common import process_frame


def get_set_list(category_dir, split):
    seqs = set()
    for listfile in ("camera_eval_list.json", "nvs_list.json"):
        p = osp.join(category_dir, listfile)
        if osp.exists(p):
            with open(p) as f:
                data = json.load(f)
            seqs.update(data.get(split, []))
    return sorted(seqs)


def convert_sequence(scene_dir, out_dir, img_size=512, num_frames=100):
    import cv2
    with open(osp.join(scene_dir, "metadata")) as f:
        metadata = json.load(f)
    K = np.array(metadata["K"], np.float32).reshape(3, 3).T
    rows = np.genfromtxt(osp.join(scene_dir, "cam_poses.txt"))
    rows = rows.reshape(-1, 17)
    c2w = rows[:, 1:].reshape(-1, 4, 4).astype(np.float32)
    n = len(c2w)
    picks = np.round(np.linspace(0, n - 1, min(num_frames, n))).astype(int)
    for fid in picks:
        rgb_f = osp.join(scene_dir, "rgb", f"{fid:05d}.png")
        depth_f = osp.join(scene_dir, "depth", f"{fid:05d}.png")
        if not (osp.exists(rgb_f) and osp.exists(depth_f)):
            continue
        rgb = PIL.Image.open(rgb_f).convert("RGB")
        depth = cv2.imread(depth_f, cv2.IMREAD_UNCHANGED).astype(np.float32) / 1000.0
        process_frame(out_dir, f"{fid:05d}", rgb, depth, K.copy(),
                      c2w[fid], img_size)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wildrgbd_dir", required=True)
    p.add_argument("--output_dir", default="data/wildrgbd_proc")
    p.add_argument("--img_size", type=int, default=512)
    p.add_argument("--split", default="train")
    p.add_argument("--num_frames", type=int, default=100)
    p.add_argument("--max_sequences_per_object", type=int, default=50)
    args = p.parse_args()
    for category in sorted(os.listdir(args.wildrgbd_dir)):
        cat_dir = osp.join(args.wildrgbd_dir, category)
        if not osp.isdir(cat_dir):
            continue
        seqs = get_set_list(cat_dir, args.split)[:args.max_sequences_per_object]
        for seq in seqs:
            scene = osp.join(cat_dir, seq)
            if not osp.isdir(scene):
                continue
            convert_sequence(scene, osp.join(args.output_dir, category, seq),
                             args.img_size, args.num_frames)
            print("done", category, seq)


if __name__ == "__main__":
    main()
