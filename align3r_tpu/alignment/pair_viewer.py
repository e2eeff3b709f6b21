"""PairViewer (closed-form 2-frame solve) and self-supervised motion masks.

Behavioural reference: /root/reference/dust3r/cloud_opt_flow/pair_viewer.py
(PairViewer:21-78) and cloud_opt_flow/optimizer.py
(get_motion_mask_from_pairs:156-235).

PairViewer: for a symmetrised 2-frame graph, estimate each camera's focal
(Weiszfeld on its own pointmap), the relative pose by RANSAC-PnP of the
cross-view pointmap, then keep the parameterisation from the more confident
direction. Motion masks: per symmetric pair, compare the RAFT flow against
the ego-motion flow implied by the PairViewer depth/pose; per-pair min-max
normalised error maps averaged per frame and thresholded.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from align3r_tpu.geometry import geotrf
from align3r_tpu.geometry.warping import warp_by_disp
from align3r_tpu.alignment.init_poses import estimate_focal_weiszfeld, fast_pnp


def pair_viewer(pred_i: Dict[Tuple[int, int], np.ndarray],
                pred_j: Dict[Tuple[int, int], np.ndarray],
                conf_i: Dict[Tuple[int, int], np.ndarray],
                conf_j: Dict[Tuple[int, int], np.ndarray],
                min_conf_thr: float = 3.0, niter_PnP: int = 100):
    """Closed-form solve for a symmetric pair {(0,1), (1,0)}.

    pred/conf dicts keyed by edge. Returns dict with 'poses' (2,4,4) cam2world,
    'focals' (2,), 'pp' (2,2), 'depths' (2,H,W).
    """
    H, W = pred_i[(0, 1)].shape[:2]
    pp = np.array([W / 2, H / 2], np.float32)
    im_conf = [np.maximum(conf_i[(0, 1)], conf_j[(1, 0)]),
               np.maximum(conf_i[(1, 0)], conf_j[(0, 1)])]

    focals, rel_poses, confs = [], [], []
    for i in range(2):
        e = (i, 1 - i)
        confs.append(float(conf_i[e].mean() * conf_j[e].mean()))
        focal = estimate_focal_weiszfeld(jnp.asarray(pred_i[e]))
        focals.append(focal)
        # pose of camera i from its points expressed in camera (1-i)
        pts3d = np.asarray(pred_j[(1 - i, i)], np.float32)
        msk = im_conf[i] > min_conf_thr
        res = fast_pnp(pts3d, focal, msk, pp=pp, niter_PnP=niter_PnP)
        rel_poses.append(res[1].astype(np.float32) if res else np.eye(4, dtype=np.float32))

    if confs[0] > confs[1]:
        poses = np.stack([np.eye(4, dtype=np.float32), rel_poses[1]])
        d0 = np.asarray(pred_i[(0, 1)])[..., 2]
        d1 = np.asarray(geotrf(jnp.asarray(np.linalg.inv(rel_poses[1])),
                               jnp.asarray(pred_j[(0, 1)])))[..., 2]
    else:
        poses = np.stack([rel_poses[0], np.eye(4, dtype=np.float32)])
        d0 = np.asarray(geotrf(jnp.asarray(np.linalg.inv(rel_poses[0])),
                               jnp.asarray(pred_j[(1, 0)])))[..., 2]
        d1 = np.asarray(pred_i[(1, 0)])[..., 2]
    return {
        "poses": poses,
        "focals": np.array(focals, np.float32),
        "pp": np.stack([pp, pp]),
        "depths": np.stack([d0, d1]),
    }


def motion_masks_from_pairs(output: Dict, flow_ij, flow_ji,
                            motion_mask_thre: float = 0.35,
                            min_conf_thr: float = 3.0) -> np.ndarray:
    """Self-supervised dynamic masks (optimizer.py:156-235).

    output: symmetrised inference dict (edges [fwd..., rev...]);
    flow_ij/flow_ji: (E, H, W, 2) RAFT flows per edge.
    Returns (n_imgs, H, W) bool, True = dynamic.
    """
    idx_i = np.asarray(output["view1"]["idx"])
    idx_j = np.asarray(output["view2"]["idx"])
    pred1 = np.asarray(output["pred1"]["pts3d"], np.float32)
    pred2 = np.asarray(output["pred2"]["pts3d_in_other_view"], np.float32)
    conf1 = np.asarray(output["pred1"]["conf"], np.float32)
    conf2 = np.asarray(output["pred2"]["conf"], np.float32)
    E, H, W, _ = pred1.shape
    assert E % 2 == 0, "motion masks need a symmetrised graph"
    half = E // 2
    n_imgs = int(max(idx_i.max(), idx_j.max())) + 1

    Ks_i, Ks_j, R_i, R_j, T_i, T_j, D_i, D_j = ([] for _ in range(8))
    for e in range(half):
        er = e + half
        assert idx_i[er] == idx_j[e] and idx_j[er] == idx_i[e], \
            "edge ordering must be [forward..., reversed...]"
        pi = {(0, 1): pred1[e], (1, 0): pred1[er]}
        pj = {(0, 1): pred2[e], (1, 0): pred2[er]}
        ci = {(0, 1): conf1[e], (1, 0): conf1[er]}
        cj = {(0, 1): conf2[e], (1, 0): conf2[er]}
        pv = pair_viewer(pi, pj, ci, cj, min_conf_thr)
        for k, (f, pp) in enumerate(zip(pv["focals"], pv["pp"])):
            K = np.array([[f, 0, pp[0]], [0, f, pp[1]], [0, 0, 1]], np.float32)
            (Ks_i if k == 0 else Ks_j).append(K)
        R_i.append(pv["poses"][0, :3, :3]); T_i.append(pv["poses"][0, :3, 3:])
        R_j.append(pv["poses"][1, :3, :3]); T_j.append(pv["poses"][1, :3, 3:])
        D_i.append(pv["depths"][0]); D_j.append(pv["depths"][1])

    Ks_i, Ks_j = jnp.asarray(np.stack(Ks_i)), jnp.asarray(np.stack(Ks_j))
    R_i, R_j = jnp.asarray(np.stack(R_i)), jnp.asarray(np.stack(R_j))
    T_i, T_j = jnp.asarray(np.stack(T_i)), jnp.asarray(np.stack(T_j))
    D_i, D_j = jnp.asarray(np.stack(D_i)), jnp.asarray(np.stack(D_j))

    inv = jnp.linalg.inv
    ego_12 = warp_by_disp(R_i, T_i, R_j, T_j, Ks_j, inv(Ks_i), 1.0 / (D_i + 1e-6))
    ego_21 = warp_by_disp(R_j, T_j, R_i, T_i, Ks_i, inv(Ks_j), 1.0 / (D_j + 1e-6))
    err_i = np.asarray(jnp.linalg.norm(ego_12[..., :2] - jnp.asarray(flow_ij[:half]), axis=-1))
    err_j = np.asarray(jnp.linalg.norm(ego_21[..., :2] - jnp.asarray(flow_ji[:half]), axis=-1))

    def norm01(e):
        mn = e.min(axis=(1, 2), keepdims=True)
        mx = e.max(axis=(1, 2), keepdims=True)
        return (e - mn) / np.maximum(mx - mn, 1e-12)

    err_i, err_j = norm01(err_i), norm01(err_j)
    acc = [[] for _ in range(n_imgs)]
    for e in range(half):
        acc[idx_i[e]].append(err_i[e])
        acc[idx_j[e]].append(err_j[e])
    masks = np.zeros((n_imgs, H, W), bool)
    for i in range(n_imgs):
        if acc[i]:
            masks[i] = np.stack(acc[i]).mean(0) > motion_mask_thre
    return masks
