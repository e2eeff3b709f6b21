"""SAM2 video mask refinement (optional post-pass on dynamic masks).

Behavioural reference: /root/reference/dust3r/cloud_opt_flow/optimizer.py
(refine_motion_mask_w_sam2:237-312): seed a SAM2 video predictor with the
self-supervised motion masks on odd frames, propagate, take the propagated
masks on even frames; repeat with roles swapped; OR the result into the
input masks. sam2_mask_refine defaults to False in the tools
(pose_test.py:44) — the self-mask path works without it.

The propagation itself is the JAX-native SAM2 video model
(models/sam2_video.py: Hiera + memory attention + memory encoder, verified
against the HF torch implementation); this module handles weight loading and
the parity-swap refinement scheme, plus a connected-components cleanup
fallback for zero-egress environments where no SAM2 weights are cached.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from align3r_tpu.native import remove_small_regions


def cleanup_masks(masks: np.ndarray, min_area: int = 64) -> np.ndarray:
    """Drop tiny islands and fill tiny holes per frame (native CC op)."""
    out = []
    for m in np.asarray(masks).astype(bool):
        m = remove_small_regions(m, min_area, mode="islands")
        m = remove_small_regions(m, min_area, mode="holes")
        out.append(m)
    return np.stack(out)


def sam2_available(model_name: str = "facebook/sam2.1-hiera-large") -> bool:
    try:
        from transformers import Sam2VideoModel  # noqa: F401
        import huggingface_hub
        huggingface_hub.snapshot_download(model_name, local_files_only=True)
        return True
    except Exception:
        return False


def refine_motion_mask_w_sam2(images01: np.ndarray, dynamic_masks: np.ndarray,
                              model_name: str = "facebook/sam2.1-hiera-large",
                              min_area: int = 64, params=None,
                              cfg=None) -> np.ndarray:
    """images01: (n, H, W, 3) in [0,1]; dynamic_masks: (n, H, W) bool.

    Returns refined masks. Pass (params, cfg) from
    sam2_video.load_hf_sam2_video to skip the checkpoint lookup; falls back
    to connected-component cleanup when SAM2 weights are not locally
    available (zero-egress environments).
    """
    masks = np.asarray(dynamic_masks).astype(bool)
    if params is None:
        if not sam2_available(model_name):
            return cleanup_masks(masks, min_area)
        from align3r_tpu.models.sam2_video import load_hf_sam2_video
        params, cfg = load_hf_sam2_video(model_name)
    from align3r_tpu.models.sam2_video import refine_motion_masks
    refined = refine_motion_masks(params, cfg, images01, masks)
    return cleanup_masks(refined, min_area)
