#!/usr/bin/env python
"""MegaDepth -> preprocessed training layout.

Behavioural reference: /root/reference/datasets_preprocess/
preprocess_megadepth.py:32-165 — per scene/subscene: COLMAP text models in
<scene>/sparse/manhattan/<subscene>/{cameras.txt,images.txt} (SIMPLE_RADIAL
cameras: width height focal cx cy k0; images: qw qx qy qz tx ty tz cam name),
undistorted images in <scene>/dense<subscene>/imgs/, MVS depths in
dense<subscene>/depths/<img>.h5 ('/depth'). Intrinsics are rectified with
cv2.getOptimalNewCameraMatrix (alpha=0, centred pp) before the crop. We emit
the uniform *_rgb.jpg/_depth.pfm/_mask.png/_metadata.npz layout.
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


def colmap_qt_to_w2c(qw, qx, qy, qz, tx, ty, tz):
    q = np.array([qw, qx, qy, qz], np.float64)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)]])
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = [tx, ty, tz]
    return T.astype(np.float32)


def load_colmap_text(sparse_dir):
    """({img_name: w2c 4x4}, {img_name: ((W, H), K, dist)})."""
    cams = {}
    with open(osp.join(sparse_dir, "cameras.txt")) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            p = line.split()
            width, height, focal, cx, cy = [float(v) for v in p[2:7]]
            k0 = float(p[7]) if len(p) > 7 else 0.0
            K = np.array([[focal, 0, cx], [0, focal, cy], [0, 0, 1]], np.float32)
            cams[int(p[0])] = ((int(width), int(height)), K, (k0, 0, 0, 0))
    poses, intr = {}, {}
    with open(osp.join(sparse_dir, "images.txt")) as f:
        rows = [l for l in f.read().splitlines()
                if l.strip() and not l.startswith("#")]
    for image_row in rows[::2]:
        p = image_row.split()
        name = p[-1]
        poses[name] = colmap_qt_to_w2c(*[float(v) for v in p[1:8]])
        intr[name] = cams[int(p[-2])]
    return poses, intr


def convert_subscene(scene_dir, subscene, out_dir, img_size=512):
    import cv2
    import h5py
    sparse = osp.join(scene_dir, "sparse", "manhattan", subscene)
    poses, intr = load_colmap_text(sparse)
    dense = osp.join(scene_dir, "dense" + subscene)
    for name, w2c in sorted(poses.items()):
        img_f = osp.join(dense, "imgs", name)
        h5_f = osp.join(dense, "depths", osp.splitext(name)[0] + ".h5")
        if not (osp.exists(img_f) and osp.exists(h5_f)):
            continue
        rgb = PIL.Image.open(img_f).convert("RGB")
        with h5py.File(h5_f, "r") as h:
            depth = np.asarray(h["depth"], np.float32)
        (size_pre, K_pre, dist) = intr[name]
        K = cv2.getOptimalNewCameraMatrix(
            K_pre, np.asarray(dist, np.float64), size_pre, alpha=0,
            newImgSize=rgb.size, centerPrincipalPoint=True)[0]
        process_frame(out_dir, osp.splitext(name)[0], rgb, depth,
                      np.asarray(K, np.float32), np.linalg.inv(w2c), img_size)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--megadepth_dir", required=True)
    p.add_argument("--output_dir", default="data/megadepth_proc")
    p.add_argument("--img_size", type=int, default=512)
    args = p.parse_args()
    for scene in sorted(os.listdir(args.megadepth_dir)):
        man = osp.join(args.megadepth_dir, scene, "sparse", "manhattan")
        if not osp.isdir(man):
            continue
        for subscene in sorted(os.listdir(man)):
            out = osp.join(args.output_dir, scene, subscene)
            convert_subscene(osp.join(args.megadepth_dir, scene), subscene,
                             out, args.img_size)
            print("done", scene, subscene)


if __name__ == "__main__":
    main()
