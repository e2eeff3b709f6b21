"""Joint image/depth/prior crop-resize with intrinsics bookkeeping.

Behavioural reference: /root/reference/dust3r/datasets/utils/cropping.py
(rescale_image_depthmap:56-90, camera_matrix_of_crop:93-106,
crop_image_depthmap:109-123, bbox_from_intrinsics_in_out:126-130,
center_crop_image_depthmap:132-190). Works on PIL images + numpy maps.
"""
from __future__ import annotations

import numpy as np
import PIL.Image

from align3r_tpu.geometry.core import (
    colmap_to_opencv_intrinsics, opencv_to_colmap_intrinsics)


def _resize_map(arr, size_wh):
    import cv2
    return cv2.resize(arr, tuple(int(x) for x in size_wh),
                      interpolation=cv2.INTER_NEAREST)


def rescale_image_depthmap(image, depthmap, pred_depth, K, output_resolution,
                           force=True):
    """Rescale so the image covers output_resolution (W, H)."""
    if not isinstance(image, PIL.Image.Image):
        image = PIL.Image.fromarray(image)
    in_res = np.array(image.size, np.float64)
    out_res = np.array(output_resolution, np.float64)
    scale = float(max(out_res / in_res)) + 1e-8
    if scale >= 1 and not force:
        return image, depthmap, pred_depth, K
    new_res = np.floor(in_res * scale).astype(int)
    resample = PIL.Image.LANCZOS if scale < 1 else PIL.Image.BICUBIC
    image = image.resize(tuple(new_res), resample)
    if depthmap is not None:
        depthmap = _resize_map(depthmap, new_res)
    if pred_depth is not None:
        pred_depth = _resize_map(pred_depth, new_res)
    K = camera_matrix_of_crop(K, in_res, new_res, scaling=scale)
    return image, depthmap, pred_depth, K


def camera_matrix_of_crop(K_in, in_res, out_res, scaling=1.0,
                          offset_factor=0.5, offset=None):
    margins = np.asarray(in_res, np.float64) * scaling - np.asarray(out_res)
    assert np.all(margins >= -1e-6), margins
    if offset is None:
        offset = offset_factor * margins
    K = opencv_to_colmap_intrinsics(np.asarray(K_in, np.float64))
    K[:2, :] *= scaling
    K[:2, 2] -= offset
    return colmap_to_opencv_intrinsics(K).astype(np.float32)


def crop_image_depthmap(image, depthmap, pred_depth, K, crop_bbox):
    l, t, r, b = crop_bbox
    image = image.crop((l, t, r, b))
    if depthmap is not None:
        depthmap = depthmap[t:b, l:r]
    if pred_depth is not None:
        pred_depth = pred_depth[t:b, l:r]
    K = np.array(K, copy=True)
    K[0, 2] -= l
    K[1, 2] -= t
    return image, depthmap, pred_depth, K


def bbox_from_intrinsics_in_out(K_in, K_out, out_res):
    out_w, out_h = out_res
    l, t = np.int32(np.round(K_in[:2, 2] - K_out[:2, 2]))
    return (l, t, l + int(out_w), t + int(out_h))


def center_crop_image_depthmap(image, depthmap, pred_depth, K, crop_scale):
    assert 0 < crop_scale <= 1
    in_res = np.array(image.size)
    out_res = np.floor(in_res * crop_scale).astype(int)
    l, t = ((in_res - out_res) / 2).astype(int)
    return crop_image_depthmap(image, depthmap, pred_depth, K,
                               (l, t, l + out_res[0], t + out_res[1]))
