"""Shared helpers for dataset preprocessing converters.

Behavioural reference: /root/reference/datasets_preprocess/*.py — every
training-set converter writes the layout
  <seq>/<frame>_rgb.jpg, _depth.pfm, _mask.png, _metadata.npz
after a principal-point-centred crop and a rescale putting the short side
at 3/4 of img_size (or long side at img_size if that undershoots)
(preprocess_PointOdyssey.py:74-117).
"""
from __future__ import annotations

import os

import numpy as np
import PIL.Image

from align3r_tpu.training.data import cropping


def write_pfm(path, arr):
    arr = np.asarray(arr, np.float32)
    with open(path, "wb") as f:
        f.write(b"Pf\n")
        f.write(f"{arr.shape[1]} {arr.shape[0]}\n".encode())
        f.write(b"-1.0\n")
        np.flipud(arr).astype("<f4").tofile(f)


def crop_rescale(rgb: PIL.Image.Image, depth: np.ndarray, mask: np.ndarray,
                 K: np.ndarray, img_size: int = 512):
    """PP-centred crop + 3/4-short-side rescale (PointOdyssey.py:74-100)."""
    W, H = rgb.size
    cx, cy = np.round(K[:2, 2]).astype(int)
    mx, my = min(cx, W - cx), min(cy, H - cy)
    bbox = (int(cx - mx), int(cy - my), int(cx + mx), int(cy + my))
    dm = np.stack([depth, mask.astype(np.float32)], axis=-1)
    rgb, dm, _, K = cropping.crop_image_depthmap(rgb, dm, None, K, bbox)
    W2, H2 = rgb.size
    scale = (img_size * 3 // 4) / min(H, W) + 1e-8
    out_res = np.floor(np.array([W, H]) * scale).astype(int)
    if max(out_res) < img_size:
        scale = img_size / max(H, W) + 1e-8
        out_res = np.floor(np.array([W, H]) * scale).astype(int)
    rgb, dm, _, K = cropping.rescale_image_depthmap(rgb, dm, None, K, out_res)
    return rgb, dm[..., 0], dm[..., 1], K


def save_frame(out_dir: str, frame_id: str, rgb: PIL.Image.Image,
               depth: np.ndarray, mask: np.ndarray, K: np.ndarray,
               camera_pose: np.ndarray):
    os.makedirs(out_dir, exist_ok=True)
    rgb.save(os.path.join(out_dir, f"{frame_id}_rgb.jpg"))
    write_pfm(os.path.join(out_dir, f"{frame_id}_depth.pfm"), depth)
    import cv2
    cv2.imwrite(os.path.join(out_dir, f"{frame_id}_mask.png"),
                (np.asarray(mask) * 255).astype(np.uint8))
    np.savez(os.path.join(out_dir, f"{frame_id}_metadata.npz"),
             camera_intrinsics=np.asarray(K, np.float32),
             camera_pose=np.asarray(camera_pose, np.float32))


def process_frame(out_dir, frame_id, rgb, depth, K, pose, img_size=512,
                  max_depth=400.0):
    """Full conversion for one frame: validity mask, crop, rescale, save."""
    mask = ((depth > 0) & (depth < max_depth)).astype(np.float32)
    rgb, depth, mask, K = crop_rescale(rgb, depth, mask, K, img_size)
    save_frame(out_dir, frame_id, rgb, depth, mask, K, pose)
