#!/usr/bin/env python
"""ScanNet++ -> preprocessed training layout.

Behavioural reference: /root/reference/datasets_preprocess/
preprocess_scannetpp.py:53-330 — per scene: COLMAP text models under
{dslr,iphone}/colmap/{cameras.txt,images.txt} (OPENCV/OPENCV_FISHEYE
cameras with distortion), frames under dslr/resized_images or iphone/rgb,
anonymization masks under */*_masks; images are undistorted with
cv2.initUndistortRectifyMap before the rescale. The reference renders GT
depth from the scene mesh with pyrender; pyrender is unavailable here, so
depth comes from the dataset's own rendered depth dir (iphone/depth or
--depth_dir, uint16 millimetres) when present, else frames are skipped.
Output: uniform *_rgb.jpg/_depth.pfm/_mask.png/_metadata.npz.
"""
import argparse
import os
import os.path as osp
import sys
from glob import glob

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import PIL.Image
from scipy.spatial.transform import Rotation

from datasets_preprocess.common import process_frame


def pose_from_qwxyz_txyz(elems):
    qw, qx, qy, qz, tx, ty, tz = (float(e) for e in elems)
    w2c = np.eye(4)
    w2c[:3, :3] = Rotation.from_quat([qx, qy, qz, qw]).as_matrix()
    w2c[:3, 3] = [tx, ty, tz]
    return np.linalg.inv(w2c)  # cam2world


def load_colmap_text(colmap_dir):
    """-> ({name: (c2w, K, dist, model)},) from cameras.txt + images.txt."""
    cams = {}
    with open(osp.join(colmap_dir, "cameras.txt")) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            el = line.split()
            cam_id, model = el[0], el[1]
            params = [float(v) for v in el[4:]]
            if model in ("OPENCV", "OPENCV_FISHEYE", "PINHOLE"):
                fx, fy, cx, cy = params[:4]
                dist = np.array(params[4:8] + [0] * (4 - len(params[4:8])),
                                np.float64) if len(params) > 4 else np.zeros(4)
            elif model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL"):
                f0, cx, cy = params[:3]
                fx = fy = f0
                dist = np.array([params[3] if len(params) > 3 else 0, 0, 0, 0])
            else:
                raise ValueError(f"unsupported COLMAP camera model {model}")
            K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)
            cams[cam_id] = (K, dist, model)
    out = {}
    with open(osp.join(colmap_dir, "images.txt")) as f:
        rows = [l for l in f.read().splitlines()
                if l.strip() and not l.startswith("#")]
    # image rows alternate with (possibly empty) 2D-point rows; detect image
    # rows structurally instead of assuming strict alternation
    for row in rows:
        el = row.split()
        if len(el) >= 10 and el[8] in cams and "." in el[9]:
            K, dist, model = cams[el[8]]
            out[el[9]] = (pose_from_qwxyz_txyz(el[1:8]), K, dist, model)
    return out


def undistort(rgb, K, dist, model):
    import cv2
    H, W = rgb.shape[:2]
    if model == "OPENCV_FISHEYE":
        newK = cv2.fisheye.estimateNewCameraMatrixForUndistortRectify(
            K, dist, (W, H), np.eye(3), balance=0.0)
        m1, m2 = cv2.fisheye.initUndistortRectifyMap(
            K, dist, np.eye(3), newK, (W, H), cv2.CV_32FC1)
    else:
        newK, _ = cv2.getOptimalNewCameraMatrix(K, np.r_[dist, 0], (W, H),
                                                alpha=0, centerPrincipalPoint=True)
        m1, m2 = cv2.initUndistortRectifyMap(K, np.r_[dist, 0], np.eye(3),
                                             newK, (W, H), cv2.CV_32FC1)
    und = cv2.remap(rgb, m1, m2, interpolation=cv2.INTER_LINEAR,
                    borderMode=cv2.BORDER_REFLECT_101)
    return und, np.asarray(newK, np.float32)


def convert_scene(scene_dir, out_dir, img_size=512, cam_type="iphone",
                  depth_dir=None, max_frames=200):
    import cv2
    base = osp.join(scene_dir, cam_type)
    colmap = osp.join(base, "colmap")
    infos = load_colmap_text(colmap)
    rgb_dir = osp.join(base, "rgb" if cam_type == "iphone" else "resized_images")
    ddir = depth_dir or osp.join(base, "depth")
    names = sorted(infos)
    step = max(1, len(names) // max_frames)
    done = 0
    for name in names[::step]:
        rgb_f = osp.join(rgb_dir, name)
        stem = osp.splitext(name)[0]
        depth_f = None
        for ext in (".png", ".jpg.png"):
            cand = osp.join(ddir, stem + ext)
            if osp.exists(cand):
                depth_f = cand
                break
        if not (osp.exists(rgb_f) and depth_f):
            continue
        c2w, K, dist, model = infos[name]
        rgb = np.asarray(PIL.Image.open(rgb_f).convert("RGB"))
        rgb, newK = undistort(rgb, K, dist, model)
        depth = cv2.imread(depth_f, cv2.IMREAD_UNCHANGED).astype(np.float32) / 1000.0
        if depth.shape != rgb.shape[:2]:
            depth = cv2.resize(depth, rgb.shape[1::-1],
                               interpolation=cv2.INTER_NEAREST)
        process_frame(out_dir, stem, PIL.Image.fromarray(rgb), depth,
                      newK.copy(), c2w, img_size)
        done += 1
    return done


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scannetpp_dir", required=True)
    p.add_argument("--output_dir", default="data/scannetpp_proc")
    p.add_argument("--img_size", type=int, default=512)
    p.add_argument("--cam_type", default="iphone", choices=["iphone", "dslr"])
    p.add_argument("--depth_dir", default=None,
                   help="pre-rendered depth dir (pyrender unavailable here)")
    p.add_argument("--max_frames", type=int, default=200)
    args = p.parse_args()
    data = osp.join(args.scannetpp_dir, "data")
    root = data if osp.isdir(data) else args.scannetpp_dir
    for scene in sorted(os.listdir(root)):
        sd = osp.join(root, scene)
        if not osp.isdir(osp.join(sd, args.cam_type)):
            continue
        n = convert_scene(sd, osp.join(args.output_dir, scene),
                          args.img_size, args.cam_type, args.depth_dir,
                          args.max_frames)
        print("done", scene, n, "frames")


if __name__ == "__main__":
    main()
