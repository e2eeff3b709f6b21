"""Training criteria: Regr3D / ConfLoss / scale-shift-invariant eval loss.

Behavioural reference: /root/reference/dust3r/losses.py (Regr3D:178-239,
ConfLoss:242-286, Regr3D_ShiftInv/ScaleInv/ScaleShiftInv:289-347) and
dust3r/utils/geometry.py (normalize_pointcloud:255-315,
get_joint_pointcloud_depth:319-330, get_joint_pointcloud_center_scale:334-348).

JAX rework: boolean fancy-indexing (`loss[mask]`) becomes masked reductions
with static shapes; medians over valid pixels use NaN-masking + jnp.nanmedian.

gt view dicts: {'pts3d': (B,H,W,3) world-frame points, 'camera_pose': (B,4,4)
cam2world, 'valid_mask': (B,H,W) bool}. pred1: {'pts3d','conf'};
pred2: {'pts3d_in_other_view','conf'}.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from align3r_tpu.geometry import geotrf, normalize_pointcloud
from align3r_tpu.geometry.core import closed_form_pose_inverse, safe_norm


def _masked_mean(x, mask, axis=None):
    m = mask.astype(x.dtype)
    return (x * m).sum(axis=axis) / jnp.clip(m.sum(axis=axis), 1.0)


def l21(a, b):
    """Euclidean distance over the last axis (losses.py:91-96)."""
    return safe_norm(a - b, axis=-1)


def regr3d_pts(gt1: Dict, gt2: Dict, pred1: Dict, pred2: Dict,
               norm_mode: str = "avg_dis", gt_scale: bool = False,
               dist_clip: float | None = None):
    """Express everything in camera1, normalise, return points + masks.

    Reference losses.py:194-220 (get_all_pts3d).
    """
    in_cam1 = closed_form_pose_inverse(gt1["camera_pose"].astype(jnp.float32))
    gt_pts1 = geotrf(in_cam1, gt1["pts3d"].astype(jnp.float32))
    gt_pts2 = geotrf(in_cam1, gt2["pts3d"].astype(jnp.float32))
    valid1 = gt1["valid_mask"]
    valid2 = gt2["valid_mask"]
    if dist_clip is not None:
        valid1 = valid1 & (jnp.linalg.norm(gt_pts1, axis=-1) <= dist_clip)
        valid2 = valid2 & (jnp.linalg.norm(gt_pts2, axis=-1) <= dist_clip)
    pr_pts1 = pred1["pts3d"].astype(jnp.float32)
    pr_pts2 = pred2["pts3d_in_other_view"].astype(jnp.float32)
    if norm_mode:
        pr_pts1, pr_pts2 = normalize_pointcloud(pr_pts1, pr_pts2, norm_mode, valid1, valid2)
        if not gt_scale:
            gt_pts1, gt_pts2 = normalize_pointcloud(gt_pts1, gt_pts2, norm_mode, valid1, valid2)
    return gt_pts1, gt_pts2, pr_pts1, pr_pts2, valid1, valid2


def conf_regr3d_loss(gt1, gt2, pred1, pred2, alpha: float = 0.2,
                     norm_mode: str = "avg_dis") -> Tuple[jnp.ndarray, Dict]:
    """ConfLoss(Regr3D(L21)) — the training criterion (train.sh:6,
    losses.py:242-286). Returns (scalar loss, details dict)."""
    gt_pts1, gt_pts2, pr1, pr2, m1, m2 = regr3d_pts(gt1, gt2, pred1, pred2, norm_mode)
    d1 = l21(pr1, gt_pts1)
    d2 = l21(pr2, gt_pts2)
    conf1 = pred1["conf"].astype(jnp.float32)
    conf2 = pred2["conf"].astype(jnp.float32)
    cl1 = d1 * conf1 - alpha * jnp.log(conf1)
    cl2 = d2 * conf2 - alpha * jnp.log(conf2)
    loss1 = _masked_mean(cl1, m1)
    loss2 = _masked_mean(cl2, m2)
    details = {
        "Regr3D_pts3d_1": _masked_mean(d1, m1),
        "Regr3D_pts3d_2": _masked_mean(d2, m2),
        "conf_loss_1": loss1,
        "conf_loss_2": loss2,
    }
    return loss1 + loss2, details


def _nan_where(x, mask):
    return jnp.where(mask, x, jnp.nan)


def regr3d_scale_shift_inv_loss(gt1, gt2, pred1, pred2, gt_scale: bool = True):
    """Eval criterion Regr3D_ScaleShiftInv(L21, norm_mode='?avg_dis',
    gt_scale=True) (losses.py:289-347, training.py test criterion).

    Shift: subtract joint median depth; scale: divide by joint median
    centred norm (gt_scale=True rescales predictions to the GT scale).
    """
    gt_pts1, gt_pts2, pr1, pr2, m1, m2 = regr3d_pts(
        gt1, gt2, pred1, pred2, norm_mode="avg_dis", gt_scale=gt_scale)
    B = gt_pts1.shape[0]

    def joint_median_z(z1, z2, m1, m2):
        z = jnp.concatenate([_nan_where(z1, m1).reshape(B, -1),
                             _nan_where(z2, m2).reshape(B, -1)], axis=1)
        return jnp.nanmedian(z, axis=1)

    gt_shift = joint_median_z(gt_pts1[..., 2], gt_pts2[..., 2], m1, m2)[:, None, None]
    pr_shift = joint_median_z(pr1[..., 2], pr2[..., 2], m1, m2)[:, None, None]
    gt_pts1 = gt_pts1.at[..., 2].add(-gt_shift)
    gt_pts2 = gt_pts2.at[..., 2].add(-gt_shift)
    pr1 = pr1.at[..., 2].add(-pr_shift)
    pr2 = pr2.at[..., 2].add(-pr_shift)

    def center_scale(p1, p2, m1, m2):
        pts = jnp.concatenate([_nan_where(p1, m1[..., None]).reshape(B, -1, 3),
                               _nan_where(p2, m2[..., None]).reshape(B, -1, 3)], axis=1)
        center = jnp.nanmedian(pts, axis=1, keepdims=True)
        norm = jnp.linalg.norm(pts - center, axis=-1)
        return jnp.nanmedian(norm, axis=1)

    gt_s = center_scale(gt_pts1, gt_pts2, m1, m2)
    pr_s = jnp.clip(center_scale(pr1, pr2, m1, m2), 1e-3, 1e3)
    gt_s = jax.lax.stop_gradient(gt_s)[:, None, None, None]
    pr_s = jax.lax.stop_gradient(pr_s)[:, None, None, None]
    if gt_scale:
        pr1 = pr1 * (gt_s / pr_s)
        pr2 = pr2 * (gt_s / pr_s)
    else:
        gt_pts1, gt_pts2 = gt_pts1 / gt_s, gt_pts2 / gt_s
        pr1, pr2 = pr1 / pr_s, pr2 / pr_s

    loss = _masked_mean(l21(pr1, gt_pts1), m1) + _masked_mean(l21(pr2, gt_pts2), m2)
    return loss


def weighted_l21(a, b, z, weight_scale: float = 10.0):
    """1/z-weighted Euclidean distance (reference WeightedL21Loss,
    losses.py:53-88; unused by the default training recipe)."""
    w = jnp.clip(1.0 / (z + 1e-8), 0.0, 1.0)
    return weight_scale * safe_norm(a - b, axis=-1) * w


def find_opt_scaling(gt_pts1, gt_pts2, pr_pts1, pr_pts2=None,
                     fit_mode="weiszfeld_stop_grad", valid1=None, valid2=None):
    """Optimal gt->pred scale per batch element (reference
    dust3r/inference.py:106-150): closed-form L2 init then Weiszfeld IRLS.

    pts: (B, H, W, 3); valid: (B, H, W) bool. Returns (B,) scalings.
    """
    B = gt_pts1.shape[0]

    def flat(p, v):
        p = p.reshape(B, -1, 3)
        if v is None:
            m = jnp.ones(p.shape[:2], p.dtype)
        else:
            m = v.reshape(B, -1).astype(p.dtype)
        return p * m[..., None], m

    g1, m1 = flat(gt_pts1, valid1)
    p1, _ = flat(pr_pts1, valid1)
    if gt_pts2 is not None:
        g2, m2 = flat(gt_pts2, valid2)
        p2, _ = flat(pr_pts2, valid2)
        gt = jnp.concatenate([g1, g2], axis=1)
        pr = jnp.concatenate([p1, p2], axis=1)
        m = jnp.concatenate([m1, m2], axis=1)
    else:
        gt, pr, m = g1, p1, m1

    dot_gt_pr = (pr * gt).sum(-1)
    dot_gt_gt = (gt * gt).sum(-1)
    nnz = jnp.clip(m.sum(1), 1.0)
    scaling = dot_gt_pr.sum(1) / jnp.clip(dot_gt_gt.sum(1), 1e-12)
    if fit_mode.startswith("weiszfeld"):
        for _ in range(10):
            dis = safe_norm(pr - scaling[:, None, None] * gt, axis=-1)
            w = m / jnp.clip(dis, 1e-8)
            scaling = (w * dot_gt_pr).sum(1) / jnp.clip((w * dot_gt_gt).sum(1), 1e-12)
    elif fit_mode.startswith("median"):
        ratio = jnp.where(m > 0, dot_gt_pr / jnp.clip(dot_gt_gt, 1e-12), jnp.nan)
        scaling = jnp.nanmedian(ratio, axis=1)
    if fit_mode.endswith("stop_grad"):
        scaling = jax.lax.stop_gradient(scaling)
    return jnp.clip(scaling, 1e-3)


def get_pred_pts3d(gt, pred, use_pose: bool = False):
    """Dispatch prediction dict -> pts3d (reference inference.py:81-103)."""
    if "depth" in pred and "pseudo_focal" in pred:
        from align3r_tpu.geometry import depthmap_to_pts3d
        pp = gt.get("camera_intrinsics")
        pp = pp[..., :2, 2] if pp is not None else None
        pts3d = depthmap_to_pts3d(pred["depth"], pred["pseudo_focal"], pp=pp)
    elif "pts3d" in pred:
        pts3d = pred["pts3d"]
    elif "pts3d_in_other_view" in pred:
        assert use_pose
        return pred["pts3d_in_other_view"]
    if use_pose:
        pts3d = geotrf(pred["camera_pose"], pts3d)
    return pts3d
