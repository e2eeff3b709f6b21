"""Host-side MST initialisation for the global aligner.

Behavioural reference: /root/reference/dust3r/cloud_opt/init_im_poses.py
(init_minimum_spanning_tree:69-80, minimum_spanning_tree:128-254,
init_from_pts3d:83-126, fast_pnp:442-482) and dust3r/post_process.py
(estimate_focal_knowing_depth:12-60, Weiszfeld).

The graph walk (scipy MST + greedy propagation) is tiny and stays in
numpy/scipy on the host; the per-edge rigid registrations and focal
estimates are jnp (device). PnP fallback uses cv2 SQPNP like the reference
(only reached for frames untouched by the spanning tree, i.e. disconnected
graphs)."""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from align3r_tpu.geometry import (
    geotrf, xy_grid, rigid_points_registration, matrix_to_pose_vec,
)
from align3r_tpu.geometry.core import closed_form_pose_inverse
from align3r_tpu.alignment.scene import (
    SceneConfig, SceneData, set_focal, set_depthmap,
)


def estimate_focal_weiszfeld(pts3d, pp=None, min_focal: float = 0.0,
                             max_focal: float = np.inf, n_iter: int = 10):
    """Weiszfeld focal from a camera-frame pointmap (H, W, 3) or (A, 3)."""
    pts = jnp.asarray(pts3d, jnp.float32).reshape(-1, 3)
    if pts3d.ndim == 3:
        H, W = pts3d.shape[:2]
    else:
        raise ValueError("need (H, W, 3) to build the pixel grid")
    if pp is None:
        pp = jnp.array([W / 2, H / 2], jnp.float32)
    pixels = xy_grid(W, H).reshape(-1, 2) - pp[None]
    xy_over_z = pts[:, :2] / jnp.clip(jnp.abs(pts[:, 2:3]), 1e-8) * jnp.sign(pts[:, 2:3])
    xy_over_z = jnp.nan_to_num(xy_over_z, posinf=0, neginf=0)
    dot_xy_px = (xy_over_z * pixels).sum(-1)
    dot_xy_xy = (xy_over_z ** 2).sum(-1)
    focal = dot_xy_px.mean() / jnp.clip(dot_xy_xy.mean(), 1e-12)
    for _ in range(n_iter):
        dis = jnp.linalg.norm(pixels - focal * xy_over_z, axis=-1)
        w = 1.0 / jnp.clip(dis, 1e-8)
        focal = (w * dot_xy_px).mean() / jnp.clip((w * dot_xy_xy).mean(), 1e-12)
    base = max(H, W) / (2 * np.tan(np.deg2rad(60) / 2))
    # positive floor: degenerate pointmaps can yield focal <= 0, which would
    # blow up the log-focal parameterisation downstream
    lo = max(min_focal * base, 1e-4)
    return float(jnp.clip(focal, lo, max_focal * base))


def _srt_to_4x4(s, R, t):
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray(R) * s
    T[:3, 3] = np.asarray(t).ravel()
    return T


def fast_pnp(pts3d: np.ndarray, focal: Optional[float], msk: np.ndarray,
             pp=None, niter_PnP: int = 10):
    """RANSAC-PnP pose recovery (reference init_im_poses.py:442-482)."""
    import cv2
    if msk.sum() < 4:
        return None
    H, W, _ = pts3d.shape
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    pixels = np.stack([u, v], axis=-1).astype(np.float32)
    if pp is None:
        pp = (W / 2, H / 2)
    focals = [focal] if focal is not None else np.geomspace(max(W, H) / 2, max(W, H) * 3, 21)
    best = (0,)
    for f in focals:
        K = np.float32([(f, 0, pp[0]), (0, f, pp[1]), (0, 0, 1)])
        success, R, T, inliers = cv2.solvePnPRansac(
            pts3d[msk].astype(np.float64), pixels[msk].astype(np.float64), K, None,
            iterationsCount=niter_PnP, reprojectionError=5, flags=cv2.SOLVEPNP_SQPNP)
        if success and len(inliers) > best[0]:
            best = (len(inliers), R, T, f)
    if not best[0]:
        return None
    _, R, T, f = best
    R = cv2.Rodrigues(R)[0]
    w2c = _srt_to_4x4(1.0, R, T)
    return f, np.linalg.inv(w2c)


def edge_score_matrix(data: SceneData, cfg: SceneConfig, conf_i, conf_j):
    """(n, n) matrix of edge scores mean(conf_i)*mean(conf_j), NaN off-graph
    (reference cloud_opt_flow/init_im_poses.py:20-33 / commons.py:21-31)."""
    E = data.ei.shape[0]
    ci = np.asarray(conf_i).reshape(E, -1)
    cj = np.asarray(conf_j).reshape(E, -1)
    scores = ci.mean(1) * cj.mean(1)
    m = np.full((cfg.n_imgs, cfg.n_imgs), np.nan)
    for k, (i, j) in enumerate(zip(np.asarray(data.ei), np.asarray(data.ej))):
        m[int(i), int(j)] = float(scores[k])
    return m


def save_edge_score_heatmap(path: str, data: SceneData, cfg: SceneConfig,
                            conf_i, conf_j):
    """Edge-score heatmap artifact (reference save_score_path,
    cloud_opt_flow/init_im_poses.py:23-42; matplotlib instead of seaborn).
    Also writes the raw matrix next to it as <path>.npy."""
    m = edge_score_matrix(data, cfg, conf_i, conf_j)
    np.save(str(path) + ".npy", m)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        n = cfg.n_imgs
        size = max(4.0, 5.5 * np.log(max(n, 2)) - 2)
        fig, ax = plt.subplots(figsize=(size, size * 0.75))
        im = ax.imshow(m, cmap="viridis")
        fig.colorbar(im, ax=ax)
        if n <= 30:
            for i in range(n):
                for j in range(n):
                    if np.isfinite(m[i, j]):
                        ax.text(j, i, f"{m[i, j]:.1f}", ha="center",
                                va="center", fontsize=7, color="w")
        ax.set_title("Heatmap of Edge Scores")
        ax.set_xlabel("Node")
        ax.set_ylabel("Node")
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    except Exception:  # matplotlib headless quirks must not kill the solve
        pass
    return m


def mst_init(params: Dict, data: SceneData, cfg: SceneConfig,
             conf_i: np.ndarray, conf_j: np.ndarray,
             init_priors=None, niter_PnP: int = 10,
             verbose: bool = False) -> Dict:
    """Initialise pw_poses / im_poses / focals / depthmaps from an MST walk
    over the pairwise graph. Returns updated params.

    conf_i/conf_j: (E, A) raw confidences (not conf-transformed).
    init_priors: optional (keypose 4x4, keydepth (H,W), [keyfocal]) anchoring
    frame 0 (reference init_im_poses.py:164-185).
    """
    H, W = cfg.imshape
    A = H * W
    edges = [(int(i), int(j)) for i, j in zip(np.asarray(data.ei), np.asarray(data.ej))]
    E = len(edges)
    n = cfg.n_imgs
    pred_i = np.asarray(data.pred_i).reshape(E, H, W, 3)
    pred_j = np.asarray(data.pred_j).reshape(E, H, W, 3)
    conf_i = np.asarray(conf_i).reshape(E, A)
    conf_j = np.asarray(conf_j).reshape(E, A)
    edge_idx = {e: k for k, e in enumerate(edges)}

    # edge scores = mean(conf_i)*mean(conf_j) (commons.py:21-31)
    scores = conf_i.mean(1) * conf_j.mean(1)
    g = sp.dok_array((n, n))
    for k, (i, j) in enumerate(edges):
        g[i, j] = -float(scores[k])
    msp = sp.csgraph.minimum_spanning_tree(g.tocsr()).tocoo()
    todo = sorted(zip(-msp.data, msp.row, msp.col))  # ascending score

    pts3d: List[Optional[np.ndarray]] = [None] * n
    im_poses: List[Optional[np.ndarray]] = [None] * n
    im_focals: List[Optional[float]] = [None] * n

    # pick the root edge: best scoring, or (with priors) one touching frame 0
    if init_priors is None:
        score, i, j = todo.pop()
    else:
        # best edge touching frame 0; if none exists (frame 0 isolated from
        # the MST), fall back to the globally best edge instead of spinning
        # on the rotate-and-retry loop forever
        root_idx = next((idx for idx in range(len(todo) - 1, -1, -1)
                         if todo[idx][1] == 0 or todo[idx][2] == 0),
                        len(todo) - 1)
        score, i, j = todo.pop(root_idx)
    k = edge_idx[(i, j)]
    pts3d[i] = pred_i[k].copy()
    pts3d[j] = pred_j[k].copy()
    done = {i, j}
    if init_priors is None:
        im_poses[i] = np.eye(4, dtype=np.float32)
        im_focals[i] = estimate_focal_weiszfeld(pred_i[k])
    else:
        keypose = np.asarray(init_priors[0], np.float32)
        keyfocal = float(np.asarray(init_priors[2]).ravel()[0])
        anchor = 0
        im_poses[anchor] = keypose
        im_focals[anchor] = keyfocal
        if i == 0:
            pts3d[i] = np.asarray(geotrf(jnp.asarray(keypose), jnp.asarray(pts3d[i])))
            pts3d[j] = np.asarray(geotrf(jnp.asarray(keypose), jnp.asarray(pts3d[j])))
        else:  # j == 0: use the reversed edge's predictions (symmetrised graphs)
            ji = edge_idx.get((j, i))
            if ji is not None:
                pts3d[i] = np.asarray(geotrf(jnp.asarray(keypose), jnp.asarray(pred_j[ji])))
                pts3d[j] = np.asarray(geotrf(jnp.asarray(keypose), jnp.asarray(pred_i[ji])))
            else:
                pts3d[j] = np.asarray(geotrf(jnp.asarray(keypose), jnp.asarray(pts3d[j])))

    # greedy propagation over remaining MST edges (init_im_poses.py:190-230).
    # `stall` counts consecutive re-inserted edges: scipy returns a spanning
    # FOREST for a disconnected pairwise graph, and an unreachable
    # component's edges would otherwise rotate through the list forever —
    # after a full fruitless rotation we seed that component's best edge as
    # a fresh local root (identity pose) and keep propagating.
    stall = 0
    while todo:
        score, i, j = todo.pop()
        k = edge_idx[(i, j)]
        if i not in done and j not in done:
            todo.insert(0, (score, i, j))
            stall += 1
            if stall > len(todo):
                score, i, j = todo.pop()
                k = edge_idx[(i, j)]
                pts3d[i] = pred_i[k].copy()
                pts3d[j] = pred_j[k].copy()
                im_poses[i] = np.eye(4, dtype=np.float32)
                if im_focals[i] is None:
                    im_focals[i] = estimate_focal_weiszfeld(pred_i[k])
                done.update((i, j))
                stall = 0
            continue
        stall = 0
        if im_focals[i] is None:
            im_focals[i] = estimate_focal_weiszfeld(pred_i[k])
        if i in done:
            R, t, s = rigid_points_registration(
                jnp.asarray(pred_i[k].reshape(-1, 3)),
                jnp.asarray(pts3d[i].reshape(-1, 3)),
                weights=jnp.asarray(conf_i[k]))
            trf = _srt_to_4x4(float(s), R, t)
            pts3d[j] = np.asarray(geotrf(jnp.asarray(trf), jnp.asarray(pred_j[k])))
            done.add(j)
            if im_poses[i] is None:
                im_poses[i] = _srt_to_4x4(1.0, R, t)
        elif j in done:
            R, t, s = rigid_points_registration(
                jnp.asarray(pred_j[k].reshape(-1, 3)),
                jnp.asarray(pts3d[j].reshape(-1, 3)),
                weights=jnp.asarray(conf_j[k]))
            trf = _srt_to_4x4(float(s), R, t)
            pts3d[i] = np.asarray(geotrf(jnp.asarray(trf), jnp.asarray(pred_i[k])))
            done.add(i)
            if im_poses[i] is None:
                im_poses[i] = _srt_to_4x4(1.0, R, t)

    # leftover focals from best incident edge; leftover poses via PnP
    order = np.argsort([-s for s in scores])
    for k in order:
        i, _ = edges[k]
        if im_focals[i] is None:
            im_focals[i] = estimate_focal_weiszfeld(pred_i[k])
    im_conf = np.asarray(data.im_conf).reshape(n, A) if data.im_conf is not None \
        else np.ones((n, A))
    for i in range(n):
        if im_poses[i] is None and pts3d[i] is not None:
            msk = (im_conf[i] > cfg.min_conf_thr).reshape(H, W)
            res = fast_pnp(pts3d[i], im_focals[i], msk, niter_PnP=niter_PnP)
            if res:
                im_focals[i], im_poses[i] = res
        if im_poses[i] is None:
            im_poses[i] = np.eye(4, dtype=np.float32)
        if pts3d[i] is None:
            pts3d[i] = np.zeros((H, W, 3), np.float32)
        if im_focals[i] is None:
            im_focals[i] = float(max(H, W))

    return _init_from_pts3d(params, data, cfg, edges, pred_i, conf_i,
                            np.stack(pts3d), np.stack(im_poses),
                            np.array(im_focals), verbose)


def _init_from_pts3d(params, data, cfg, edges, pred_i, conf_i,
                     pts3d, im_poses, im_focals, verbose):
    """Set pw_poses / im_poses / focals / depths from the propagated cloud
    (reference init_im_poses.py:83-126)."""
    # per-edge sim3 aligning pred_i to the world cloud
    pw_vecs = []
    log_scales = []
    for k, (i, j) in enumerate(edges):
        R, t, s = rigid_points_registration(
            jnp.asarray(pred_i[k].reshape(-1, 3)),
            jnp.asarray(pts3d[i].reshape(-1, 3)),
            weights=jnp.asarray(conf_i[k]))
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(R)
        T[:3, 3] = np.asarray(t)
        pw_vecs.append(np.asarray(matrix_to_pose_vec(jnp.asarray(T), scale=float(s))))
        log_scales.append(np.log(float(s)))
    pw_poses = jnp.asarray(np.stack(pw_vecs), jnp.float32)

    # scale normalisation factor applied to world geometry (base_opt.py:212-229)
    if cfg.norm_pw_scale:
        s_factor = float(np.exp(np.log(cfg.base_scale) - np.mean(log_scales)))
    else:
        s_factor = 1.0
    im_poses = im_poses.copy()
    im_poses[:, :3, 3] *= s_factor
    pts3d = pts3d * s_factor

    new = dict(params)
    new["pw_poses"] = pw_poses
    pose_vecs = np.stack([np.asarray(matrix_to_pose_vec(jnp.asarray(p)))
                          for p in im_poses])
    new["im_poses"] = jnp.asarray(pose_vecs, jnp.float32)
    new = set_focal(new, cfg, np.arange(cfg.n_imgs), im_focals)
    if not cfg.if_use_mono:
        # depth = z of world points expressed back in each camera
        H, W = cfg.imshape
        cams = np.stack([np.linalg.inv(p) for p in im_poses])
        depth = np.asarray(geotrf(jnp.asarray(cams), jnp.asarray(pts3d)))[..., 2]
        new = set_depthmap(new, np.arange(cfg.n_imgs), depth.reshape(cfg.n_imgs, -1))
    return new
