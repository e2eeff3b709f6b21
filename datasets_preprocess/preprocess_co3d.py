#!/usr/bin/env python
"""CO3Dv2 -> preprocessed training layout.

Behavioural reference: /root/reference/datasets_preprocess/
preprocess_co3d.py:63-248 — per category: gzipped JSON annotations
(frame_annotations.jgz / sequence_annotations.jgz), PyTorch3D NDC cameras
converted to OpenCV (T[:2]*=-1, R[:,:2]*=-1, R transposed; NDC focal/pp
scaled by min(W,H)/2 about the image centre), 16-bit depth PNGs whose
uint16 payload reinterprets as float16, foreground masks, sequences
filtered by viewpoint_quality_score and subset lists
(set_lists/set_lists_<subset>.json). We emit the uniform
*_rgb.jpg/_depth.pfm/_mask.png/_metadata.npz layout per sequence.
"""
import argparse
import gzip
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import PIL.Image

from datasets_preprocess.common import crop_rescale, save_frame


def opencv_from_ndc(R, T, focal, p0, image_size):
    """PyTorch3D NDC camera -> (R_w2c, tvec, K) in OpenCV convention
    (reference opencv_from_cameras_projection:77-110, in numpy)."""
    R = np.asarray(R, np.float64).copy()
    T = np.asarray(T, np.float64).copy()
    focal = np.asarray(focal, np.float64)
    p0 = np.asarray(p0, np.float64)
    H, W = image_size
    T[:2] *= -1
    R[:, :2] *= -1
    R_cv = R.T
    wh = np.array([W, H], np.float64)
    scale = wh.min() / 2.0
    c0 = wh / 2.0
    pp = -p0 * scale + c0
    f = focal * scale
    K = np.array([[f[0], 0, pp[0]], [0, f[1], pp[1]], [0, 0, 1]], np.float32)
    return R_cv, T, K


def read_co3d_depth(path):
    """CO3D depth PNG: 16-bit payload reinterpreted as float16."""
    with PIL.Image.open(path) as depth_pil:
        return (np.frombuffer(np.array(depth_pil, dtype=np.uint16),
                              dtype=np.float16)
                .astype(np.float32)
                .reshape((depth_pil.size[1], depth_pil.size[0])))


def get_set_list(category_dir, split, single_sequence_subset=False):
    results = []
    subsets = (["singlesequence"] if single_sequence_subset
               else ["fewview_train", "fewview_dev", "fewview_test"])
    for subset in subsets:
        f = osp.join(category_dir, "set_lists", f"set_lists_{subset}.json")
        if not osp.exists(f):
            continue
        with open(f) as fin:
            data = json.load(fin)
        for key in data:
            if split in key:
                results += data[key]
    return results


def prepare_sequences(category, co3d_dir, output_dir, img_size=512,
                      split="train", min_quality=0.5,
                      max_num_sequences_per_object=50, seed=42):
    import random
    random.seed(seed)
    category_dir = osp.join(co3d_dir, category)
    entries = get_set_list(category_dir, split)
    with gzip.open(osp.join(category_dir, "frame_annotations.jgz")) as f:
        frame_data = json.loads(f.read())
    with gzip.open(osp.join(category_dir, "sequence_annotations.jgz")) as f:
        sequence_data = json.loads(f.read())
    frames = {}
    for fd in frame_data:
        frames.setdefault(fd["sequence_name"], {})[fd["frame_number"]] = fd
    good = {sd["sequence_name"] for sd in sequence_data
            if sd["viewpoint_quality_score"] > min_quality}
    seq_names = sorted({s for s, _, _ in entries if s in good})
    if len(seq_names) > max_num_sequences_per_object:
        seq_names = sorted(random.sample(seq_names, max_num_sequences_per_object))
    picked = set(seq_names)
    for seq_name, frame_number, filepath in entries:
        if seq_name not in picked:
            continue
        fd = frames[seq_name][frame_number]
        R, tvec, K = opencv_from_ndc(fd["viewpoint"]["R"], fd["viewpoint"]["T"],
                                     fd["viewpoint"]["focal_length"],
                                     fd["viewpoint"]["principal_point"],
                                     fd["image"]["size"])
        rgb = PIL.Image.open(osp.join(co3d_dir, filepath)).convert("RGB")
        depth = read_co3d_depth(osp.join(co3d_dir, fd["depth"]["path"]))
        mask_path = osp.join(co3d_dir, filepath.replace("images", "masks")
                             .replace(".jpg", ".png"))
        mask = (np.asarray(PIL.Image.open(mask_path).convert("L"), np.float32)
                / 255.0) if osp.exists(mask_path) else np.ones_like(depth)
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = R
        w2c[:3, 3] = tvec
        valid = ((depth > 0) & np.isfinite(depth)).astype(np.float32) * mask
        rgb, depth, valid, K = crop_rescale(rgb, depth, valid, K, img_size)
        out_dir = osp.join(output_dir, category, seq_name)
        frame_id = osp.splitext(osp.basename(filepath))[0]
        save_frame(out_dir, frame_id, rgb, depth, valid, K, np.linalg.inv(w2c))
    return seq_names


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--co3d_dir", required=True)
    p.add_argument("--output_dir", default="data/co3d_proc")
    p.add_argument("--img_size", type=int, default=512)
    p.add_argument("--split", default="train")
    p.add_argument("--min_quality", type=float, default=0.5)
    p.add_argument("--max_sequences_per_object", type=int, default=50)
    args = p.parse_args()
    for category in sorted(os.listdir(args.co3d_dir)):
        if not osp.isdir(osp.join(args.co3d_dir, category)):
            continue
        seqs = prepare_sequences(category, args.co3d_dir, args.output_dir,
                                 args.img_size, args.split, args.min_quality,
                                 args.max_sequences_per_object)
        print("done", category, len(seqs), "sequences")


if __name__ == "__main__":
    main()
