"""Host-side image loading / preprocessing for the inference tools.

Behavioural reference: /root/reference/dust3r/utils/image_pose.py
(crop_img:173-204, pixel_to_pointcloud:206-244, load_images:246-407) —
resize long side to `size`, centre-crop to multiples of 16, normalise to
[-1, 1], load the per-frame monocular prior `.npz` by the per-dataset naming
convention and convert it to a min-max-normalised pointcloud.

Outputs are stacked numpy arrays (n, H, W, C) NHWC, ready for the batched
inference engine; per-frame dicts are also provided for API familiarity.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
import PIL.Image
from PIL.ImageOps import exif_transpose

from align3r_tpu.geometry import pixel_to_pointcloud

IMG_EXTS = (".jpg", ".jpeg", ".png")
VIDEO_EXTS = (".mp4", ".avi", ".mov")

# HEIF/HEIC input behind an optional import (reference
# utils/image_pose.py:19-24, 267: extensions join the accepted set only
# when pillow_heif is installed; it registers a PIL opener so
# PIL.Image.open handles the files transparently)
try:
    from pillow_heif import register_heif_opener  # type: ignore
    register_heif_opener()
    IMG_EXTS = IMG_EXTS + (".heic", ".heif")
    heif_support_enabled = True
except ImportError:
    heif_support_enabled = False


def _resize_pil(img, long_edge, nearest=False):
    W, H = img.size
    S = max(W, H)
    interp = PIL.Image.NEAREST if nearest else PIL.Image.LANCZOS
    new = (round(W * long_edge / S), round(H * long_edge / S))
    return img.resize(new, interp)


def _resize_np(arr, long_edge):
    import cv2
    H, W = arr.shape[:2]
    S = max(W, H)
    return cv2.resize(arr, (round(W * long_edge / S), round(H * long_edge / S)),
                      interpolation=cv2.INTER_CUBIC)


def _crop_center_np(arr, cw, ch):
    h, w = arr.shape[:2]
    cx, cy = h // 2, w // 2
    return arr[max(cx - ch // 2, 0): cx + ch // 2, max(cy - cw // 2, 0): cy + cw // 2]


def crop_img(img: PIL.Image.Image, size: int, pred_depth=None,
             square_ok=False, nearest=False, crop=True):
    """Resize long side to `size` (short side for 224) then crop/resize to a
    multiple-of-16 canvas centred on the principal point (reference
    image_pose.py:173-204)."""
    W1, H1 = img.size
    if size == 224:
        img = _resize_pil(img, round(size * max(W1 / H1, H1 / W1)), nearest)
        if pred_depth is not None:
            pred_depth = _resize_np(pred_depth, round(size * max(W1 / H1, H1 / W1)))
        W, H = img.size
        cx, cy = W // 2, H // 2
        half = min(cx, cy)
        img = img.crop((cx - half, cy - half, cx + half, cy + half))
        if pred_depth is not None:
            pred_depth = _crop_center_np(pred_depth, 2 * half, 2 * half)
        return img, pred_depth
    img = _resize_pil(img, size, nearest)
    if pred_depth is not None:
        pred_depth = _resize_np(pred_depth, size)
    W, H = img.size
    cx, cy = W // 2, H // 2
    halfw, halfh = ((2 * cx) // 16) * 8, ((2 * cy) // 16) * 8
    if not square_ok and W == H:
        halfh = 3 * halfw // 4
    if crop:
        img = img.crop((cx - halfw, cy - halfh, cx + halfw, cy + halfh))
        if pred_depth is not None:
            pred_depth = _crop_center_np(pred_depth, 2 * halfw, 2 * halfh)
    else:
        img = img.resize((2 * halfw, 2 * halfh), PIL.Image.LANCZOS)
        if pred_depth is not None:
            import cv2
            pred_depth = cv2.resize(pred_depth, (2 * halfw, 2 * halfh),
                                    interpolation=cv2.INTER_CUBIC)
    return img, pred_depth


def prior_depth_path(img_path: str, traj_format: str, depth_prior_name: str) -> str:
    """Per-dataset prior-depth .npz naming convention (image_pose.py:285-297)."""
    p = img_path
    tag = "depth_prediction_" + depth_prior_name
    if traj_format == "sintel":
        return p.replace("clean", tag).replace(".png", ".npz")
    if traj_format in ("tum", "tartanair"):
        return p.replace("rgb_50", "rgb_50_" + tag).replace(".png", ".npz")
    if traj_format == "bonn":
        return p.replace("rgb_110", "rgb_110_" + tag).replace(".png", ".npz")
    if traj_format == "davis":
        return (p.replace("JPEGImages", tag).replace(".jpg", ".npz")
                .replace("480p", "1080p"))
    if traj_format == "scannet":
        return (p.replace("color_30", "color_90_" + tag)
                .replace(".jpg", ".npz").replace(".png", ".npz"))
    if traj_format == "kitti":
        return (p.replace("image_gathered", tag)
                .replace(".jpg", ".npz").replace(".png", ".npz"))
    return (p.replace(".png", "_pred_depth_" + depth_prior_name + ".npz")
            .replace(".jpg", "_pred_depth_" + depth_prior_name + ".npz"))


def load_prior_pointcloud(img_path: str, traj_format: str,
                          depth_prior_name: str = "depthpro"):
    """Load the cached monocular prior and unproject it to the normalised
    pointcloud prior. Returns (H, W, 3) float32 or None if missing."""
    path = prior_depth_path(img_path, traj_format, depth_prior_name)
    if path == img_path or not os.path.exists(path):
        return None
    data = np.load(path, allow_pickle=True)
    depth = np.asarray(data["depth"])
    if depth.ndim == 3:
        depth = np.squeeze(depth)
    focal = float(data["focallength_px"]) if depth_prior_name == "depthpro" else 200.0
    return np.asarray(pixel_to_pointcloud(depth, focal), np.float32)


def normalize_img(img: PIL.Image.Image) -> np.ndarray:
    """[-1, 1] normalisation (reference ImgNorm, image_pose.py:26). NHWC."""
    return (np.asarray(img, np.float32) / 255.0 - 0.5) / 0.5


def load_images(folder_or_list, size: int, square_ok=False, verbose=False,
                dynamic_mask_root=None, crop=True, fps: int = 0,
                traj_format: str = "sintel", start: int = 0,
                interval: int = 10 ** 9, depth_prior_name: str = "depthpro"
                ) -> List[Dict]:
    """Load a folder / list of frames (or a video file) into per-frame dicts:
    {'img' (1,H,W,3) in [-1,1], 'pred_depth' (1,H,W,3), 'true_shape',
    'idx', 'instance', 'dynamic_mask' (1,H,W)}. Mirrors reference
    load_images (image_pose.py:246-407). `interval` caps both the folder
    slice and the number of fps-strided video frames (image_pose.py:
    365-367); the library default is unlimited (documented deviation —
    the reference defaults to 30, and tool/demo.py keeps that default at
    the CLI so the demo flows match)."""
    if isinstance(folder_or_list, str):
        if os.path.isdir(folder_or_list):
            root = folder_or_list
            content = sorted(os.listdir(folder_or_list))
        else:
            root, content = "", [folder_or_list]
    else:
        root, content = "", list(folder_or_list)
    content = sorted(content, key=lambda x: x.split("/")[-1])[start:start + interval]

    imgs: List[Dict] = []
    for path in content:
        full = os.path.join(root, path)
        low = path.lower()
        if low.endswith(IMG_EXTS):
            img = exif_transpose(PIL.Image.open(full)).convert("RGB")
            prior = load_prior_pointcloud(full, traj_format, depth_prior_name)
            img_c, prior_c = crop_img(img, size, prior, square_ok=square_ok, crop=crop)
            if prior_c is None:
                prior_c = np.zeros(img_c.size[::-1] + (3,), np.float32)
            d = dict(
                img=normalize_img(img_c)[None],
                pred_depth=np.asarray(prior_c, np.float32)[None],
                true_shape=np.int32([img_c.size[::-1]]),
                idx=len(imgs),
                instance=full,
            )
            dyn_path = None
            if dynamic_mask_root is not None:
                dyn_path = os.path.join(dynamic_mask_root, os.path.basename(path))
            elif traj_format == "sintel":
                dyn_path = (full.replace("final", "dynamic_label_perfect")
                            .replace("clean", "dynamic_label_perfect")
                            .replace("MPI-Sintel-training_images",
                                     "MPI-Sintel-depth-training"))
            if dyn_path and os.path.exists(dyn_path):
                dm = PIL.Image.open(dyn_path).convert("L")
                dm, _ = crop_img(dm, size, square_ok=square_ok, crop=crop)
                d["dynamic_mask"] = (np.asarray(dm, np.float32) / 255.0 > 0.99)[None]
            else:
                d["dynamic_mask"] = np.zeros((1,) + img_c.size[::-1], bool)
            imgs.append(d)
        elif low.endswith(VIDEO_EXTS):
            import cv2
            cap = cv2.VideoCapture(full)
            video_fps = cap.get(cv2.CAP_PROP_FPS) or 30
            step = max(int(round(video_fps / fps)), 1) if fps > 0 else 1
            # the reference caps sampled video frames at `interval` AFTER
            # fps striding (image_pose.py:365-367) — without it a long clip
            # decodes thousands of full-res frames
            k, kept0 = 0, len(imgs)
            while True:
                ok, frame = cap.read()
                if not ok or len(imgs) - kept0 >= interval:
                    break
                if k % step == 0:
                    img = PIL.Image.fromarray(frame[..., ::-1])
                    img_c, _ = crop_img(img, size, None, square_ok=square_ok, crop=crop)
                    imgs.append(dict(
                        img=normalize_img(img_c)[None],
                        pred_depth=np.zeros((1,) + img_c.size[::-1] + (3,), np.float32),
                        true_shape=np.int32([img_c.size[::-1]]),
                        idx=len(imgs),
                        instance=f"{full}:frame{k}",
                        dynamic_mask=np.zeros((1,) + img_c.size[::-1], bool),
                    ))
                k += 1
            cap.release()
    assert imgs, f"no images found in {folder_or_list}"
    if verbose:
        print(f">> loaded {len(imgs)} frames at {imgs[0]['img'].shape}")
    return imgs


def stack_views(views: List[Dict]) -> Dict[str, np.ndarray]:
    """Per-frame dicts -> stacked arrays for the engine."""
    return {
        "imgs": np.concatenate([v["img"] for v in views], axis=0),
        "priors": np.concatenate([v["pred_depth"] for v in views], axis=0),
        "dynamic_masks": np.concatenate([v["dynamic_mask"] for v in views], axis=0),
        "instances": [v["instance"] for v in views],
    }
