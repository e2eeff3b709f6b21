#!/usr/bin/env python
"""ARKitScenes (lowres_wide) -> preprocessed training layout.

Behavioural reference: /root/reference/datasets_preprocess/
preprocess_arkitscenes.py:60-355 — per scene: lowres_wide/<scene>_<ts>.png
frames, lowres_depth/<scene>_<ts>.png uint16 millimetre depths,
lowres_wide_intrinsics/<scene>_<ts>.pincam rows (w h fx fy cx cy),
lowres_wide.traj rows (ts, axis-angle rotation (3), translation (3)) in
world2cam convention. The scene's sky direction is estimated from the mean
device up/right vectors and frames are rotated upright (UP/DOWN/LEFT/RIGHT),
with intrinsics swapped and poses post-multiplied by the inverse rotation.

Deviation: the reference squad-interpolates quaternions to the frame
timestamps; we use the nearest trajectory sample (lowres_wide timestamps
are a subset of the traj for the official download). Output is the uniform
*_rgb.jpg/_depth.pfm/_mask.png/_metadata.npz layout.
"""
import argparse
import math
import os
import os.path as osp
import sys
from glob import glob

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import PIL.Image
from scipy.spatial.transform import Rotation

from datasets_preprocess.common import process_frame


def read_traj(path):
    """-> (timestamps (T,), cam2world (T, 4, 4))."""
    ts, poses = [], []
    with open(path) as f:
        for line in f:
            tok = line.split()
            if len(tok) < 7:
                continue
            ts.append(float(tok[0]))
            w2c = np.eye(4)
            w2c[:3, :3] = Rotation.from_rotvec(
                [float(t) for t in tok[1:4]]).as_matrix()
            w2c[:3, 3] = [float(t) for t in tok[4:7]]
            poses.append(np.linalg.inv(w2c))
    return np.asarray(ts), np.stack(poses)


def find_scene_orientation(c2w):
    """Sky direction + rotated_to_cam 4x4 (reference 309-349): compares the
    mean device up/right vectors against world up (+z)."""
    up = np.mean([p @ np.array([0.0, -1.0, 0.0, 0.0]) for p in c2w], axis=0)
    right = np.mean([p @ np.array([1.0, 0.0, 0.0, 0.0]) for p in c2w], axis=0)
    up_w = np.array([0.0, 0.0, 1.0, 0.0])
    ang_up = math.degrees(math.acos(np.clip(np.dot(up_w, up / (np.linalg.norm(up) + 1e-12)), -1, 1)))
    ang_right = math.degrees(math.acos(np.clip(np.dot(up_w, right / (np.linalg.norm(right) + 1e-12)), -1, 1)))
    if abs(ang_up - 90) < abs(ang_right - 90):
        if ang_right > 90:
            sky, rotvec = "LEFT", [0, 0, math.pi / 2]
        else:
            sky, rotvec = "RIGHT", [0, 0, -math.pi / 2]
    else:
        if ang_up > 90:
            sky, rotvec = "DOWN", [0, 0, math.pi]
        else:
            sky, rotvec = "UP", [0, 0, 0]
    cam_to_rotated = np.eye(4)
    cam_to_rotated[:3, :3] = Rotation.from_rotvec(rotvec).as_matrix()
    return sky, np.linalg.inv(cam_to_rotated)


def _upright(img_arr, sky):
    k = {"UP": 0, "LEFT": 1, "RIGHT": 3, "DOWN": 2}[sky]
    return np.rot90(img_arr, k) if k else img_arr


def convert_scene(scene_dir, out_dir, img_size=512, max_frames=200):
    scene = osp.basename(scene_dir.rstrip("/"))
    ts, c2w = read_traj(osp.join(scene_dir, "lowres_wide.traj"))
    sky, rotated_to_cam = find_scene_orientation(c2w)
    frames = sorted(glob(osp.join(scene_dir, "lowres_wide", f"{scene}_*.png")))
    step = max(1, len(frames) // max_frames)
    for rgb_f in frames[::step]:
        frame_id = osp.basename(rgb_f)[len(scene) + 1:-4]
        depth_f = osp.join(scene_dir, "lowres_depth", osp.basename(rgb_f))
        pincam = osp.join(scene_dir, "lowres_wide_intrinsics",
                          f"{scene}_{frame_id}.pincam")
        for eps in (0.0, -0.001, 0.001):
            cand = osp.join(scene_dir, "lowres_wide_intrinsics",
                            f"{scene}_{float(frame_id) + eps:.3f}.pincam")
            if osp.exists(cand):
                pincam = cand
                break
        if not (osp.exists(depth_f) and osp.exists(pincam)):
            continue
        w, h, fx, fy, cx, cy = np.loadtxt(pincam)
        import cv2
        rgb = np.asarray(PIL.Image.open(rgb_f).convert("RGB"))
        depth = cv2.imread(depth_f, cv2.IMREAD_UNCHANGED).astype(np.float32) / 1000.0
        rgb = _upright(rgb, sky)
        depth = _upright(depth, sky)
        if sky in ("LEFT", "RIGHT"):
            fx, fy, cx, cy = fy, fx, cy, cx
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
        i = int(np.argmin(np.abs(ts - float(frame_id))))
        pose = c2w[i] @ rotated_to_cam
        process_frame(out_dir, frame_id, PIL.Image.fromarray(rgb),
                      depth, K, pose, img_size)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arkitscenes_dir", required=True)
    p.add_argument("--output_dir", default="data/arkitscenes_proc")
    p.add_argument("--img_size", type=int, default=512)
    p.add_argument("--max_frames", type=int, default=200)
    args = p.parse_args()
    for split in ("Training", "Test"):
        base = osp.join(args.arkitscenes_dir, split)
        if not osp.isdir(base):
            continue
        for scene in sorted(os.listdir(base)):
            sd = osp.join(base, scene)
            if not osp.isdir(sd):
                continue
            convert_scene(sd, osp.join(args.output_dir, split, scene),
                          args.img_size, args.max_frames)
            print("done", split, scene)


if __name__ == "__main__":
    main()
