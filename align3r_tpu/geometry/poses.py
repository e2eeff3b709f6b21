"""Pose parameterisations and rigid registration, pure jnp.

Behavioural reference: /root/reference/dust3r/cloud_opt/base_opt.py
(_get_poses:184-189, get_pw_poses:212-229), cloud_opt_flow/commons.py
(signed_log1p/expm1:78-86), cloud_opt_flow/optimizer.py
(relative_pose_loss:559-572) and roma's RigidUnitQuat (xyzw quaternions).

Pose vector layouts (as in the reference optimizers):
  7-dof image pose : [qx, qy, qz, qw, signed_log1p(t) (3)]
  8-dof sim3 edge  : 7-dof + [log(scale)]
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def signed_log1p(x):
    return jnp.sign(x) * jnp.log1p(jnp.abs(x))


def signed_expm1(x):
    return jnp.sign(x) * jnp.expm1(jnp.abs(x))


def quat_normalize(q, eps: float = 1e-12):
    return q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_rotmat(q):
    """xyzw unit quaternion(s) -> (..., 3, 3) rotation matrix."""
    q = quat_normalize(q)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    R = jnp.stack([
        jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
        jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
        jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
    ], axis=-2)
    return R


def rotmat_to_quat(R):
    """(..., 3, 3) rotation -> xyzw quaternion, branch-free (jit-safe).

    Uses the four standard Shepperd branches and selects the numerically best
    one by largest trace-candidate, so it is valid for any proper rotation.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # candidate squared magnitudes *4
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def safe_sqrt(v):
        return jnp.sqrt(jnp.clip(v, 1e-12))

    # branch w
    sw = safe_sqrt(qw2) * 2
    cand_w = jnp.stack([(m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw, sw / 4], axis=-1)
    sx = safe_sqrt(qx2) * 2
    cand_x = jnp.stack([sx / 4, (m01 + m10) / sx, (m02 + m20) / sx, (m21 - m12) / sx], axis=-1)
    sy = safe_sqrt(qy2) * 2
    cand_y = jnp.stack([(m01 + m10) / sy, sy / 4, (m12 + m21) / sy, (m02 - m20) / sy], axis=-1)
    sz = safe_sqrt(qz2) * 2
    cand_z = jnp.stack([(m02 + m20) / sz, (m12 + m21) / sz, sz / 4, (m10 - m01) / sz], axis=-1)

    mags = jnp.stack([qx2, qy2, qz2, qw2], axis=-1)
    idx = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cand_x, cand_y, cand_z, cand_w], axis=-2)  # (..., 4cand, 4)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    return quat_normalize(q)


def pose_vec_to_matrix(vec):
    """7-dof pose vector -> (..., 4, 4) cam2world homogeneous matrix."""
    R = quat_to_rotmat(vec[..., :4])
    t = signed_expm1(vec[..., 4:7])
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0], vec.dtype),
                              vec.shape[:-1] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def matrix_to_pose_vec(T, scale=None):
    """(..., 4, 4) -> 7-dof (or 8-dof if scale given) pose vector."""
    q = rotmat_to_quat(T[..., :3, :3])
    s = 1.0 if scale is None else scale
    t = signed_log1p(T[..., :3, 3] / s)
    vec = jnp.concatenate([q, t], axis=-1)
    if scale is not None:
        logs = jnp.broadcast_to(jnp.log(jnp.asarray(scale, vec.dtype)), vec.shape[:-1] + (1,))
        vec = jnp.concatenate([vec, logs], axis=-1)
    return vec


def sim3_vec_to_matrix(vec, norm_scale: bool = True, base_scale: float = 0.5):
    """8-dof per-edge sim3 vectors (N, 8) -> (N, 4, 4) with rows [sR st; 0 1].

    If norm_scale, log-scales are centred so their product ~= base_scale^N
    (reference base_opt.py:174-229: `get_pw_norm_scale_factor`).
    """
    RT = pose_vec_to_matrix(vec[..., :7])
    log_s = vec[..., 7]
    if norm_scale:
        log_s = log_s + (jnp.log(base_scale) - jnp.mean(log_s, axis=-1, keepdims=True))
    s = jnp.exp(log_s)
    return RT.at[..., :3, :].multiply(s[..., None, None])


def relative_pose_error(RT1, RT2, translation_weight: float = 2.5):
    """||R_rel - I||_F + w·||t_rel|| for batches of 4x4 rigid poses (smoothing
    loss). Uses the closed-form rigid inverse — jnp.linalg.inv inside a
    differentiated scan compiles pathologically slowly on TPU."""
    from align3r_tpu.geometry.core import closed_form_pose_inverse
    rel = jnp.matmul(closed_form_pose_inverse(RT1), RT2)
    from align3r_tpu.geometry.core import safe_norm
    rot = safe_norm(rel[..., :3, :3] - jnp.eye(3, dtype=RT1.dtype), axis=(-2, -1))
    trans = safe_norm(rel[..., :3, 3], axis=-1)
    return rot + trans * translation_weight


def rigid_points_registration(pts_a, pts_b, weights=None, compute_scaling: bool = True):
    """Weighted Umeyama: find s, R, t minimising Σ w ||s·R·a + t − b||².

    pts_a, pts_b: (N, 3); weights: (N,) or None.
    Returns (R (3,3), t (3,), s scalar). Equivalent of
    roma.rigid_points_registration used at cloud_opt/init_im_poses.py:415-418.
    """
    a = jnp.asarray(pts_a, jnp.float32).reshape(-1, 3)
    b = jnp.asarray(pts_b, jnp.float32).reshape(-1, 3)
    # pre-scale by a common factor so the covariance/SVD stays in fp32 range
    # even for degenerate inputs (R, s are invariant; t rescales back)
    c = jnp.clip(jnp.maximum(jnp.abs(a).mean(), jnp.abs(b).mean()), 1.0)
    a = a / c
    b = b / c
    if weights is None:
        w = jnp.ones(a.shape[0], jnp.float32)
    else:
        w = jnp.asarray(weights, jnp.float32).reshape(-1)
    wsum = jnp.clip(w.sum(), 1e-12)
    wn = w / wsum
    mu_a = (wn[:, None] * a).sum(0)
    mu_b = (wn[:, None] * b).sum(0)
    ac = a - mu_a
    bc = b - mu_b
    cov = (wn[:, None] * bc).T @ ac  # (3,3): b rows, a cols
    U, S, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U @ Vt))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, 0.0]) + jnp.array([0.0, 0.0, 1.0]) * d)
    R = U @ D @ Vt
    if compute_scaling:
        var_a = (wn * (ac * ac).sum(-1)).sum()
        s = (S * jnp.diag(D)).sum() / jnp.clip(var_a, 1e-12)
    else:
        s = jnp.asarray(1.0, jnp.float32)
    t = (mu_b - s * (R @ mu_a)) * c
    return R, t, s
