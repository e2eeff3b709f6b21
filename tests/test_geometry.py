import jax
import jax.numpy as jnp
import numpy as np
import pytest

from align3r_tpu.geometry import (
    xy_grid, geotrf, depthmap_to_pts3d, normalize_pointcloud, pixel_to_pointcloud,
    signed_log1p, signed_expm1, quat_to_rotmat, rotmat_to_quat,
    pose_vec_to_matrix, matrix_to_pose_vec, sim3_vec_to_matrix,
    rigid_points_registration, relative_pose_error,
)
from align3r_tpu.geometry.core import closed_form_pose_inverse


def random_rotation(rng):
    A = rng.standard_normal((3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q.astype(np.float32)


def test_xy_grid():
    g = xy_grid(4, 3)
    assert g.shape == (3, 4, 2)
    assert g[1, 2, 0] == 2 and g[1, 2, 1] == 1
    gh = xy_grid(4, 3, homogeneous=True)
    assert gh.shape == (3, 4, 3) and np.all(np.asarray(gh[..., 2]) == 1)


def test_geotrf_homogeneous_matches_manual():
    rng = np.random.default_rng(0)
    R = random_rotation(rng)
    t = rng.standard_normal(3).astype(np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3], T[:3, 3] = R, t
    pts = rng.standard_normal((5, 7, 3)).astype(np.float32)
    out = geotrf(jnp.asarray(T), jnp.asarray(pts))
    expect = pts @ R.T + t
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_geotrf_batched():
    rng = np.random.default_rng(1)
    T = np.stack([np.eye(4, dtype=np.float32)] * 2)
    T[1, :3, 3] = [1, 2, 3]
    pts = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    out = np.asarray(geotrf(jnp.asarray(T), jnp.asarray(pts)))
    np.testing.assert_allclose(out[0], pts[0], atol=1e-6)
    np.testing.assert_allclose(out[1], pts[1] + np.array([1, 2, 3]), atol=1e-6)


def test_pose_inverse():
    rng = np.random.default_rng(2)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = random_rotation(rng)
    T[:3, 3] = rng.standard_normal(3)
    Ti = np.asarray(closed_form_pose_inverse(jnp.asarray(T)))
    np.testing.assert_allclose(Ti @ T, np.eye(4), atol=1e-5)


def test_depthmap_to_pts3d_roundtrip():
    B, H, W = 2, 6, 8
    rng = np.random.default_rng(3)
    depth = rng.uniform(0.5, 5.0, (B, H, W)).astype(np.float32)
    focal = np.array([100.0, 120.0], np.float32)
    pts = np.asarray(depthmap_to_pts3d(jnp.asarray(depth), jnp.asarray(focal)))
    assert pts.shape == (B, H, W, 3)
    np.testing.assert_allclose(pts[..., 2], depth, atol=1e-6)
    # pixel (j,i): x = d*(i-(W-1)/2)/f
    i, j = 5, 2
    np.testing.assert_allclose(
        pts[0, j, i, 0], depth[0, j, i] * (i - (W - 1) / 2) / 100.0, rtol=1e-5)


def test_normalize_pointcloud_avg_dis():
    rng = np.random.default_rng(4)
    p1 = rng.standard_normal((1, 4, 4, 3)).astype(np.float32) * 3
    p2 = rng.standard_normal((1, 4, 4, 3)).astype(np.float32) * 3
    r1, r2, f = normalize_pointcloud(jnp.asarray(p1), jnp.asarray(p2), ret_factor=True)
    d = np.concatenate([np.asarray(r1).reshape(-1, 3), np.asarray(r2).reshape(-1, 3)])
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1).mean(), 1.0, rtol=1e-4)
    # with validity masks: masked points don't affect the factor
    v1 = np.zeros((1, 4, 4), bool); v1[0, :2] = True
    r1b = normalize_pointcloud(jnp.asarray(p1), None, valid1=jnp.asarray(v1))
    dis = np.linalg.norm(p1[0, :2].reshape(-1, 3), axis=-1).mean()
    np.testing.assert_allclose(np.asarray(r1b), p1 / dis, rtol=1e-4)


def test_pixel_to_pointcloud_normalised():
    rng = np.random.default_rng(5)
    d = rng.uniform(1, 10, (12, 16)).astype(np.float32)
    pc = np.asarray(pixel_to_pointcloud(d, 200.0))
    assert pc.shape == (12, 16, 3)
    assert pc.min() >= -1e-6 and pc.max() <= 1 + 1e-6
    np.testing.assert_allclose(pc.min(axis=(0, 1)), 0, atol=1e-6)
    np.testing.assert_allclose(pc.max(axis=(0, 1)), 1, atol=1e-6)


def test_signed_log_expm1_inverse():
    x = jnp.linspace(-5, 5, 21)
    np.testing.assert_allclose(np.asarray(signed_expm1(signed_log1p(x))), np.asarray(x), atol=1e-5)


def test_quat_roundtrip():
    rng = np.random.default_rng(6)
    for _ in range(20):
        R = random_rotation(rng)
        q = rotmat_to_quat(jnp.asarray(R))
        R2 = np.asarray(quat_to_rotmat(q))
        np.testing.assert_allclose(R2, R, atol=1e-5)


def test_quat_batch_and_jit():
    rng = np.random.default_rng(7)
    Rs = np.stack([random_rotation(rng) for _ in range(8)])
    f = jax.jit(lambda R: quat_to_rotmat(rotmat_to_quat(R)))
    np.testing.assert_allclose(np.asarray(f(jnp.asarray(Rs))), Rs, atol=1e-5)


def test_pose_vec_roundtrip():
    rng = np.random.default_rng(8)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = random_rotation(rng)
    T[:3, 3] = rng.standard_normal(3) * 4
    vec = matrix_to_pose_vec(jnp.asarray(T))
    T2 = np.asarray(pose_vec_to_matrix(vec))
    np.testing.assert_allclose(T2, T, atol=1e-4)


def test_sim3_scale_normalisation():
    rng = np.random.default_rng(9)
    vecs = []
    for _ in range(4):
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = random_rotation(rng)
        T[:3, 3] = rng.standard_normal(3)
        vecs.append(np.asarray(matrix_to_pose_vec(jnp.asarray(T), scale=float(rng.uniform(0.5, 2)))))
    vecs = jnp.asarray(np.stack(vecs))
    M = np.asarray(sim3_vec_to_matrix(vecs, norm_scale=True, base_scale=0.5))
    # det of the scaled-rotation block = s^3; product of scales == base^N
    scales = np.array([np.linalg.det(M[k, :3, :3]) ** (1 / 3) for k in range(4)])
    np.testing.assert_allclose(np.prod(scales), 0.5 ** 4, rtol=1e-4)


def test_rigid_points_registration():
    rng = np.random.default_rng(10)
    a = rng.standard_normal((50, 3)).astype(np.float32)
    R = random_rotation(rng)
    t = rng.standard_normal(3).astype(np.float32)
    s = 1.7
    b = s * a @ R.T + t
    R2, t2, s2 = rigid_points_registration(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t2), t, atol=1e-4)
    np.testing.assert_allclose(float(s2), s, rtol=1e-4)
    # weighted: outliers with zero weight are ignored
    b_noisy = b.copy(); b_noisy[0] += 100
    w = np.ones(50, np.float32); w[0] = 0
    R3, t3, s3 = rigid_points_registration(jnp.asarray(a), jnp.asarray(b_noisy), weights=jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(R3), R, atol=1e-4)


def test_relative_pose_error_zero_for_identical():
    rng = np.random.default_rng(11)
    T = np.eye(4, dtype=np.float32)[None].repeat(3, 0)
    for k in range(3):
        T[k, :3, :3] = random_rotation(rng)
        T[k, :3, 3] = rng.standard_normal(3)
    err = np.asarray(relative_pose_error(jnp.asarray(T), jnp.asarray(T)))
    np.testing.assert_allclose(err, 0, atol=1e-4)
