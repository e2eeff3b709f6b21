"""SAM2 video mask refinement (optional post-pass on dynamic masks).

Behavioural reference: /root/reference/dust3r/cloud_opt_flow/optimizer.py
(refine_motion_mask_w_sam2:237-312): seed a SAM2 video predictor with the
self-supervised motion masks on odd frames, propagate, take the propagated
masks on even frames; repeat with roles swapped; OR the result into the
input masks. sam2_mask_refine defaults to False in the tools
(pose_test.py:44) — the self-mask path works without it.

Implementation strategy this round: the video predictor runs through the
locally-installed HF `Sam2VideoModel` (torch CPU) when its weights are
available; mask cleanup (hole filling / island removal) always runs through
the native C++ connected-components op. A full JAX port of SAM2 (Hiera
encoder + memory attention) is tracked for a later round — it is ~13k LoC
in the reference and not on the default path.
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
                              min_area: int = 64) -> np.ndarray:
    """images01: (n, H, W, 3) in [0,1]; dynamic_masks: (n, H, W) bool.

    Returns refined masks. Falls back to connected-component cleanup when
    SAM2 weights are not locally available (zero-egress environments).
    """
    masks = np.asarray(dynamic_masks).astype(bool)
    if not sam2_available(model_name):
        return cleanup_masks(masks, min_area)

    import torch
    from transformers import Sam2VideoModel, Sam2VideoProcessor
    model = Sam2VideoModel.from_pretrained(model_name).eval()
    processor = Sam2VideoProcessor.from_pretrained(model_name)
    frames = [(f * 255).astype(np.uint8) for f in np.asarray(images01)]
    n = len(frames)
    refined = masks.copy()

    for parity in (1, 0):  # seed odd then even frames (reference scheme)
        session = processor.init_video_session(video=frames,
                                               inference_device="cpu")
        for idx in range(parity, n, 2):
            if masks[idx].any():
                processor.add_inputs_to_inference_session(
                    session, frame_idx=idx, obj_ids=1,
                    input_masks=masks[idx].astype(np.float32))
        with torch.no_grad():
            for out in model.propagate_in_video_iterator(session,
                                                         start_frame_idx=0):
                fi = out.frame_idx
                if fi % 2 == (1 - parity):
                    m = processor.post_process_masks(
                        [out.pred_masks], original_sizes=[masks[fi].shape])[0]
                    refined[fi] |= np.asarray(m)[0, 0] > 0
    return cleanup_masks(refined, min_area)
