"""Cross-view point-cloud cleaning (confidence suppression of occluders).

Behavioural reference: /root/reference/dust3r/cloud_opt/base_opt.py
(clean_pointcloud:467-503): for every ordered view pair (i, j), project
view i's 3D points into camera j; points that land in front of view j's
depth map (by tolerance) while being LESS confident than view j's pixel
get their confidence clamped to `bad_conf`.

TPU rework: the reference's double Python loop with boolean indexing
becomes one vmapped projection over all (i, j) pairs with masked scatter-min;
the whole pass is a single jitted program.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from align3r_tpu.geometry import geotrf
from align3r_tpu.geometry.core import closed_form_pose_inverse


@functools.partial(jax.jit, static_argnames=("tol", "bad_conf"))
def clean_pointcloud(im_confs, K, cams_world2cam, depthmaps, all_pts3d,
                     tol: float = 0.001, bad_conf: float = 0.0):
    """im_confs: (n, H, W); K: (n, 3, 3); cams_world2cam: (n, 4, 4);
    depthmaps: (n, H, W); all_pts3d: (n, H, W, 3) world frame.
    Returns cleaned confidences (n, H, W)."""
    n, H, W = im_confs.shape
    res = im_confs

    def project_into(j, pts_i, res, res_conf_i):
        """How view j's geometry suppresses view i's confidences. Both
        comparison sides read the EVOLVING res (reference base_opt.py:496
        compares res[i] < res[j], so suppression cascades through views
        already clamped earlier in the sweep)."""
        proj = geotrf(cams_world2cam[j], pts_i)              # (H, W, 3) in cam j
        z = proj[..., 2]
        uvw = jnp.einsum("ab,hwb->hwa", K[j], proj)
        u = uvw[..., 0] / jnp.clip(uvw[..., 2], 1e-9)
        v = uvw[..., 1] / jnp.clip(uvw[..., 2], 1e-9)
        ui = jnp.round(u).astype(jnp.int32)
        vi = jnp.round(v).astype(jnp.int32)
        msk = (z > 0) & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
        uc = jnp.clip(ui, 0, W - 1)
        vc = jnp.clip(vi, 0, H - 1)
        depth_j = depthmaps[j][vc, uc]
        conf_j = res[j][vc, uc]
        bad = msk & (z < (1 - tol) * depth_j) & (res_conf_i < conf_j)
        return jnp.where(bad, jnp.minimum(res_conf_i, bad_conf), res_conf_i)

    def clean_one(i, res):
        conf_i = res[i]
        def body(j, c):
            return jnp.where(j == i, c, project_into(j, all_pts3d[i],
                                                     res, c))
        conf_i = jax.lax.fori_loop(0, n, body, conf_i)
        return res.at[i].set(conf_i)

    return jax.lax.fori_loop(0, n, clean_one, res)


def scene_clean_pointcloud(scene, tol: float = 0.001, bad_conf: float = 0.0):
    """Apply to a pipeline SceneResult; returns cleaned (n, H, W) conf."""
    import numpy as np
    poses = jnp.asarray(scene.get_im_poses())
    cams = closed_form_pose_inverse(poses)
    K = jnp.asarray(scene.get_intrinsics())
    depth = jnp.asarray(scene.get_depthmaps())
    pts = jnp.asarray(scene.get_pts3d())
    conf = jnp.asarray(scene.get_conf())
    return np.asarray(clean_pointcloud(conf, K, cams, depth, pts,
                                       tol=tol, bad_conf=bad_conf))
