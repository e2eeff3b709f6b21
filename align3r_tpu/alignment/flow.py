"""Flow-variant alignment loss (MonST3R-style, used for pose estimation).

Behavioural reference: /root/reference/dust3r/cloud_opt_flow/optimizer.py
(forward:500-557, relative_pose_loss:559-572, smooth_L1_loss_fn:18-24) and
dust3r/utils/goem_opt.py (DepthBasedWarping, depth_regularization_si_weighted).

Loss = pairwise pts3d L1
     + temporal_smoothing_weight · Σ relative-pose-error(consecutive frames)
     + flow_loss_weight · smooth-L1(ego-flow vs RAFT flow, static pixels,
       enabled after flow_loss_start_epoch · niter, zeroed on any step where
       it exceeds flow_loss_thre — the reference's `flow_loss_flag`
       (optimizer.py:46,542) is WRITE-ONLY, so its gate is per-step too and
       this matches it exactly; proven by test_reference_solve_parity's
       flow-term tests)
     + depth_regularize_weight · scale-invariant log-depth reg to init
       depth, with dynamic pixels double-weighted via the mask passed as
       pixel_wise_weight (optimizer.py:550).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from align3r_tpu.geometry import relative_pose_error
from align3r_tpu.geometry.warping import (
    warp_by_disp, smooth_l1_flow_loss, depth_regularization_si_weighted)
from align3r_tpu.alignment.scene import (
    SceneConfig, SceneData, pairwise_pts_loss, get_im_poses, get_intrinsics,
    get_depthmaps_raw,
)


def inv_intrinsics(K):
    """Closed-form inverse of pinhole K = [[fx,0,cx],[0,fy,cy],[0,0,1]]
    (avoids jnp.linalg.inv in the jitted solve loop)."""
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    z = jnp.zeros_like(fx)
    o = jnp.ones_like(fx)
    row0 = jnp.stack([1 / fx, z, -cx / fx], -1)
    row1 = jnp.stack([z, 1 / fy, -cy / fy], -1)
    row2 = jnp.stack([z, z, o], -1)
    return jnp.stack([row0, row1, row2], -2)


def flow_forward(params, data: SceneData, cfg: SceneConfig, step=0):
    loss = pairwise_pts_loss(params, data, cfg, step)
    H, W = cfg.imshape

    poses = get_im_poses(params)                        # (n, 4, 4)

    if cfg.temporal_smoothing_weight > 0:
        smooth = relative_pose_error(poses[:-1], poses[1:],
                                     cfg.translation_weight).sum()
        loss = loss + cfg.temporal_smoothing_weight * smooth

    if cfg.flow_loss_weight > 0 and data.flow_ij is not None:
        R_all = poses[:, :3, :3]
        T_all = poses[:, :3, 3:]
        K_all = get_intrinsics(params, data, cfg)
        inv_K_all = inv_intrinsics(K_all)
        ei, ej = data.ei, data.ej
        depth = get_depthmaps_raw(params, data, cfg).reshape(cfg.n_imgs, H, W)
        disp = 1.0 / (depth + 1e-6)
        ego_12 = warp_by_disp(R_all[ei], T_all[ei], R_all[ej], T_all[ej],
                              K_all[ej], inv_K_all[ei], disp[ei])
        ego_21 = warp_by_disp(R_all[ej], T_all[ej], R_all[ei], T_all[ei],
                              K_all[ei], inv_K_all[ej], disp[ej])
        if data.dynamic_masks is not None:
            static_i = 1.0 - data.dynamic_masks[ei]
            static_j = 1.0 - data.dynamic_masks[ej]
        else:
            static_i = jnp.ones((ei.shape[0], H, W))
            static_j = jnp.ones((ej.shape[0], H, W))
        fl = (smooth_l1_flow_loss(ego_12[..., :2], data.flow_ij, static_i,
                                  per_pixel_thre=cfg.pxl_thre)
              + smooth_l1_flow_loss(ego_21[..., :2], data.flow_ji, static_j,
                                    per_pixel_thre=cfg.pxl_thre))
        start = cfg.flow_loss_start_epoch * cfg.num_total_iter
        enabled = (step >= start) & ((cfg.flow_loss_thre <= 0) | (fl <= cfg.flow_loss_thre))
        loss = loss + cfg.flow_loss_weight * jnp.where(enabled, fl, 0.0)

    if cfg.depth_regularize_weight > 0 and data.init_depth is not None:
        depth = get_depthmaps_raw(params, data, cfg).reshape(cfg.n_imgs, H, W)
        init = data.init_depth.reshape(cfg.n_imgs, H, W)
        # the reference passes the dynamic masks as pixel_wise_weight
        # (optimizer.py:550): dynamic pixels get weight 2, static 1
        loss = loss + cfg.depth_regularize_weight * \
            depth_regularization_si_weighted(
                depth, init, pixel_wise_weight=data.dynamic_masks)

    return loss
