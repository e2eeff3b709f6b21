#!/usr/bin/env python
"""StaticThings3D -> preprocessed training layout.

Behavioural reference: /root/reference/datasets_preprocess/
preprocess_staticthings3d.py:55-129 — per scene TRAIN/<A|B|C>/<seq>:
.float3 blobs ('float\\n' + ndim + dims + raw fp32) hold intrinsics
(intrinsics/<split>/<sub>/<seq>/NNNN.float3), world2cam poses
(poses/.../<camera>/NNNN.float3) and depths (depths/...); frames 6..15 of
frames_cleanpass//frames_finalpass pngs per left/right camera. We emit the
clean pass into the uniform *_rgb.jpg/_depth.pfm/_mask.png/_metadata.npz
layout (one sequence dir per camera).
"""
import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import PIL.Image

from datasets_preprocess.common import process_frame


def read_float3(path):
    """DispNet .float3 format: 'float', ndim, dims (one per line), raw fp32
    in reversed-dim order (reference readFloat:112-128)."""
    with open(path, "rb") as f:
        assert f.readline().decode() == "float\n", path
        ndim = int(f.readline())
        dims = [int(f.readline()) for _ in range(ndim)]
        data = np.fromfile(f, np.float32, int(np.prod(dims)))
    return data.reshape(list(reversed(dims)))


def convert_sequence(db_root, relseq, out_root, cameras=("left", "right"),
                     frames=range(6, 16), img_size=512):
    for camera in cameras:
        out_dir = osp.join(out_root, relseq, camera)
        for n in frames:
            num = f"{n:04d}"
            intr_f = osp.join(db_root, "intrinsics", relseq, num + ".float3")
            pose_f = osp.join(db_root, "poses", relseq, camera, num + ".float3")
            depth_f = osp.join(db_root, "depths", relseq, camera, num + ".float3")
            img_f = osp.join(db_root, "frames_cleanpass", relseq, camera, num + ".png")
            if not all(osp.exists(x) for x in (intr_f, pose_f, depth_f, img_f)):
                continue
            K = read_float3(intr_f).reshape(3, 3)
            c2w = np.linalg.inv(read_float3(pose_f).reshape(4, 4))
            depth = np.squeeze(read_float3(depth_f))
            rgb = PIL.Image.open(img_f).convert("RGB")
            process_frame(out_dir, num, rgb, depth, K, c2w, img_size)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--staticthings3d_dir", required=True)
    p.add_argument("--output_dir", default="data/staticthings3d_proc")
    p.add_argument("--img_size", type=int, default=512)
    args = p.parse_args()
    root = args.staticthings3d_dir
    seqs = []
    for sub in "ABC":
        base = osp.join(root, "intrinsics", "TRAIN", sub)
        if osp.isdir(base):
            seqs += [osp.join("TRAIN", sub, s) for s in sorted(os.listdir(base))]
    assert seqs, f"nothing at {root}"
    for rel in seqs:
        convert_sequence(root, rel, args.output_dir, img_size=args.img_size)
        print("done", rel)


if __name__ == "__main__":
    main()
