"""Pure-jnp camera geometry core.

Behavioural reference: /root/reference/dust3r/utils/geometry.py (xy_grid:15-37,
geotrf:40-102, depthmap_to_pts3d:116-163, depthmap_to_camera_coordinates:166-204,
normalize_pointcloud:255-315) and /root/reference/dust3r/utils/image_pose.py
(pixel_to_pointcloud:206-237, normalize 239-244).

Everything here is functional, shape-static and jit/vmap friendly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def safe_norm(x, axis=-1, keepdims: bool = False, eps: float = 1e-12):
    """||x|| with a well-defined (zero) gradient at x = 0.

    jnp.linalg.norm's gradient is x/||x|| -> NaN at exactly 0; masked/padded
    points are exact zeros throughout this codebase, so every norm on the
    differentiated path must use this instead.
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.clip(sq, eps)) * jnp.sign(sq)


def xy_grid(W: int, H: int, origin=(0, 0), homogeneous: bool = False, dtype=jnp.float32):
    """(H, W, 2) grid with out[j, i] = (i + ox, j + oy); optionally (H, W, 3) homogeneous."""
    xs = jnp.arange(origin[0], origin[0] + W, dtype=dtype)
    ys = jnp.arange(origin[1], origin[1] + H, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    if homogeneous:
        return jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)
    return jnp.stack([gx, gy], axis=-1)


def geotrf(Trf: jnp.ndarray, pts: jnp.ndarray, ncol: int | None = None, norm: float = 0.0):
    """Apply an affine/projective transform to points.

    Trf: (..., d, d) or (..., d+1, d+1); pts: (..., d) with leading batch dims
    broadcastable against Trf's. Returns transformed points, optionally
    projected onto the z=norm plane.
    """
    d = pts.shape[-1]
    batch = Trf.shape[:-2]
    if batch:
        # align pts batch dims: Trf (B..., d, d), pts (B..., *spatial, d)
        n_extra = pts.ndim - 1 - len(batch)
        T = Trf.reshape(batch + (1,) * n_extra + Trf.shape[-2:])
    else:
        T = Trf
    if Trf.shape[-1] == d + 1:
        out = jnp.einsum("...ij,...j->...i", T[..., :d, :d], pts) + T[..., :d, d]
    elif Trf.shape[-1] == d:
        out = jnp.einsum("...ij,...j->...i", T, pts)
    else:
        raise ValueError(f"incompatible shapes Trf={Trf.shape} pts={pts.shape}")
    if norm:
        out = out / out[..., -1:]
        if norm != 1:
            out = out * norm
    if ncol is not None:
        out = out[..., :ncol]
    return out


def inv(mat: jnp.ndarray) -> jnp.ndarray:
    """Invert a (stack of) 4x4 rigid/affine matrices (general inverse)."""
    return jnp.linalg.inv(mat)


def closed_form_pose_inverse(pose: jnp.ndarray) -> jnp.ndarray:
    """Fast inverse of a cam2world rigid pose: [R t]⁻¹ = [Rᵀ -Rᵀt]."""
    R = pose[..., :3, :3]
    t = pose[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, -jnp.einsum("...ij,...j->...i", Rt, t)[..., None]], axis=-1)
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0], pose.dtype), pose.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def depthmap_to_pts3d(depth: jnp.ndarray, pseudo_focal: jnp.ndarray, pp: jnp.ndarray | None = None):
    """Unproject depth to camera-frame points.

    depth: (B, H, W); pseudo_focal: (B,), (B, H, W) or (B, 2, H, W);
    pp: (B, 2) principal point or None (image centre (W-1)/2, (H-1)/2).
    Returns (B, H, W, 3).
    """
    B, H, W = depth.shape
    if pseudo_focal.ndim == 1:
        fx = fy = pseudo_focal[:, None, None]
    elif pseudo_focal.ndim == 3:
        fx = fy = pseudo_focal
    else:  # (B, 1or2, H, W)
        fx = pseudo_focal[:, 0]
        fy = pseudo_focal[:, 1] if pseudo_focal.shape[1] == 2 else fx
    grid = xy_grid(W, H, dtype=depth.dtype)  # (H,W,2)
    gx, gy = grid[..., 0][None], grid[..., 1][None]
    if pp is None:
        gx = gx - (W - 1) / 2
        gy = gy - (H - 1) / 2
    else:
        gx = gx - pp[:, 0, None, None]
        gy = gy - pp[:, 1, None, None]
    return jnp.stack([depth * gx / fx, depth * gy / fy, depth], axis=-1)


def depthmap_to_camera_coords(depthmap, camera_intrinsics, max_depth: float = 400.0):
    """Unproject with a full 3x3 K (no skew). Returns (pts (H,W,3), valid (H,W,2)).

    valid[..., 0] = 0 < depth < max_depth (geometry channel);
    valid[..., 1] = depth > 0 (sky channel). Matches reference
    geometry.py:166-204 (numpy, host-side in the data pipeline).
    """
    depthmap = np.asarray(depthmap)
    K = np.float32(camera_intrinsics)
    H, W = depthmap.shape
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    x = (u - K[0, 2]) * depthmap / K[0, 0]
    y = (v - K[1, 2]) * depthmap / K[1, 1]
    pts = np.stack([x, y, depthmap], axis=-1).astype(np.float32)
    valid = (depthmap > 0.0) & (depthmap < max_depth)
    if valid.sum() == 0:
        d = depthmap.copy()
        d[d == 0] = 1e4
        valid[d == d.min()] = True
    valid_sky = depthmap > 0.0
    return pts, np.stack([valid, valid_sky], axis=-1)


def normalize_pointcloud(pts1, pts2=None, norm_mode: str = "avg_dis",
                         valid1=None, valid2=None, ret_factor: bool = False):
    """Joint scale-normalisation of one or two pointmaps (mode 'avg_dis' only,
    the mode used by the training criterion; reference geometry.py:255-315).

    pts*: (B, H, W, 3); valid*: (B, H, W) bool. Invalid points contribute zero
    distance but are counted out of the divisor.
    """
    assert norm_mode == "avg_dis", norm_mode
    def flat(p, v):
        B = p.shape[0]
        p = p.reshape(B, -1, 3)
        if v is None:
            return p, jnp.full((B,), p.shape[1], p.dtype)
        v = v.reshape(B, -1, 1).astype(p.dtype)
        return p * v, v[..., 0].sum(axis=1)
    p1, n1 = flat(pts1, valid1)
    if pts2 is not None:
        p2, n2 = flat(pts2, valid2)
        all_pts = jnp.concatenate([p1, p2], axis=1)
        nnz = n1 + n2
    else:
        all_pts, nnz = p1, n1
    all_dis = safe_norm(all_pts, axis=-1)
    norm_factor = all_dis.sum(axis=1) / (nnz + 1e-8)
    norm_factor = jnp.clip(norm_factor, 1e-8)[:, None, None, None]
    res1 = pts1 / norm_factor
    if pts2 is None:
        return (res1, norm_factor) if ret_factor else res1
    res2 = pts2 / norm_factor
    return (res1, res2, norm_factor) if ret_factor else (res1, res2)


def pixel_to_pointcloud(depth_map, focal_length_px):
    """Monocular prior depth → min-max-normalised (H, W, 3) pointcloud.

    Matches reference image_pose.py:206-244: centre pp = (W/2, H/2), unproject,
    then per-channel min-max normalise to [0, 1]. Works on jnp or numpy.
    """
    depth_map = jnp.asarray(depth_map, jnp.float32)
    H, W = depth_map.shape
    grid = xy_grid(W, H, dtype=jnp.float32)
    X = (grid[..., 0] - W / 2) * depth_map / focal_length_px
    Y = (grid[..., 1] - H / 2) * depth_map / focal_length_px
    pc = jnp.stack([X, Y, depth_map], axis=-1)
    mn = pc.min(axis=(0, 1))
    mx = pc.max(axis=(0, 1))
    return (pc - mn) / (mx - mn)


def colmap_to_opencv_intrinsics(K):
    K = np.array(K, copy=True)
    K[0, 2] -= 0.5
    K[1, 2] -= 0.5
    return K


def opencv_to_colmap_intrinsics(K):
    K = np.array(K, copy=True)
    K[0, 2] += 0.5
    K[1, 2] += 0.5
    return K
