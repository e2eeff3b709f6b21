import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from align3r_tpu.eval.depth_metrics import (
    align_lstsq, align_lad, align_lad2, align_scale_weiszfeld, align_median,
    depth_metrics, evaluate_sequence_depth, average_metrics)
from align3r_tpu.eval.trajectory import (
    c2w_to_tumpose, tumpose_to_c2w, poses_to_traj, umeyama_alignment,
    ate_rmse, rpe_rmse, eval_metrics, save_tum_trajectory, load_tum_trajectory)


def random_poses(n, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    mats = []
    for k in range(n):
        T = np.eye(4)
        T[:3, :3] = Rotation.from_rotvec(rng.standard_normal(3) * 0.1 * k).as_matrix()
        T[:3, 3] = rng.standard_normal(3) * scale + [k * 0.5, 0, 0]
        mats.append(T)
    return np.stack(mats)


def test_align_lstsq_exact():
    rng = np.random.default_rng(0)
    pred = rng.uniform(1, 5, 500)
    gt = 2.5 * pred + 0.7
    s, t = align_lstsq(pred, gt)
    assert s == pytest.approx(2.5, abs=1e-6) and t == pytest.approx(0.7, abs=1e-6)


def test_align_lad_robust_to_outliers():
    rng = np.random.default_rng(1)
    pred = rng.uniform(1, 5, 500)
    gt = 2.0 * pred + 0.5
    gt[:25] += 50  # 5% outliers
    s, t = align_lad(pred, gt)
    assert s == pytest.approx(2.0, abs=0.1)
    s2, t2 = align_lad2(pred, gt, lr=1e-2, max_iters=2000)
    assert s2 == pytest.approx(2.0, abs=0.15)


def test_align_scale_and_median():
    pred = np.array([1.0, 2, 3, 4])
    gt = pred * 3
    s, t = align_scale_weiszfeld(pred, gt)
    assert s == pytest.approx(3.0, rel=1e-4) and t == 0
    s, _ = align_median(pred, gt)
    assert s == pytest.approx(3.0)


def test_depth_metrics_perfect():
    gt = np.random.default_rng(2).uniform(1, 10, 1000)
    m = depth_metrics(gt, gt)
    assert m["Abs Rel"] == 0 and m["RMSE"] == 0 and m["δ < 1.25"] == 1.0


def test_evaluate_sequence_depth():
    rng = np.random.default_rng(3)
    gt = rng.uniform(1, 10, (3, 8, 8))
    pred = gt / 2 - 0.1  # scale 2, shift 0.2
    m = evaluate_sequence_depth(pred, gt, align="lstsq")
    assert m["Abs Rel"] < 1e-6
    avg = average_metrics([m, m])
    assert avg["Abs Rel"] == pytest.approx(m["Abs Rel"])


def test_tum_roundtrip(tmp_path):
    poses = random_poses(5)
    traj = poses_to_traj(poses)
    for k in range(5):
        np.testing.assert_allclose(tumpose_to_c2w(traj[0][k]), poses[k], atol=1e-10)
    p = tmp_path / "traj.txt"
    save_tum_trajectory(traj, p)
    tum2, ts2 = load_tum_trajectory(p)
    np.testing.assert_allclose(tum2, traj[0], atol=1e-12)


def test_umeyama_recovers_sim3():
    rng = np.random.default_rng(4)
    src = rng.standard_normal((40, 3))
    R = Rotation.from_rotvec([0.3, -0.2, 0.5]).as_matrix()
    s, t = 1.8, np.array([1, -2, 3.0])
    dst = s * src @ R.T + t
    s2, R2, t2 = umeyama_alignment(src, dst)
    assert s2 == pytest.approx(s, rel=1e-6)
    np.testing.assert_allclose(R2, R, atol=1e-8)
    np.testing.assert_allclose(t2, t, atol=1e-8)


def test_ate_zero_for_sim3_equivalent():
    poses = random_poses(10, seed=5)
    # transform the whole trajectory by a sim3: ATE must be ~0
    R = Rotation.from_rotvec([0.1, 0.7, -0.3]).as_matrix()
    s, t = 0.5, np.array([3, 1, -2.0])
    est = poses.copy()
    est[:, :3, 3] = s * poses[:, :3, 3] @ R.T + t
    est[:, :3, :3] = np.einsum("ij,njk->nik", R, poses[:, :3, :3])
    assert ate_rmse(est, poses) < 1e-8
    rpe_t, rpe_r = rpe_rmse(est, poses)
    assert rpe_t < 1e-8 and rpe_r < 1e-5


def test_eval_metrics_detects_noise(tmp_path):
    poses = random_poses(10, seed=6)
    noisy = poses.copy()
    noisy[:, :3, 3] += np.random.default_rng(7).standard_normal((10, 3)) * 0.05
    pred = poses_to_traj(noisy)
    gt = poses_to_traj(poses)
    ate, rpe_t, rpe_r = eval_metrics(pred, gt, seq="x", filename=str(tmp_path / "r.txt"))
    assert 0 < ate < 0.2
    assert (tmp_path / "r.txt").read_text().startswith("Seq: x")


def test_plot_and_scrape_metrics(tmp_path):
    """plot_trajectory writes a png; metric files scrape + average back."""
    from align3r_tpu.eval.trajectory import (
        eval_metrics, plot_trajectory, extract_metrics, process_directory,
        calculate_averages, poses_to_traj)
    rng = np.random.default_rng(0)
    poses = np.tile(np.eye(4, dtype=np.float32), (6, 1, 1))
    poses[:, 0, 3] = np.arange(6) * 0.1
    poses[:, 2, 3] = rng.normal(0, 0.05, 6)
    gt = poses_to_traj(poses)
    est_poses = poses.copy()
    est_poses[:, 0, 3] += rng.normal(0, 0.01, 6)
    est = poses_to_traj(est_poses)
    f1 = tmp_path / "seqA_eval_metric.txt"
    ate, rt, rr = eval_metrics(est, gt, seq="seqA", filename=str(f1))
    png = plot_trajectory(est, gt, title="seqA",
                          filename=str(tmp_path / "seqA"))
    assert (tmp_path / "seqA.png").exists()
    scraped = extract_metrics(str(f1))
    np.testing.assert_allclose(scraped, (ate, rt, rr), rtol=1e-6)
    rows = process_directory(str(tmp_path))
    assert rows[0][0] == "seqA"
    avg = calculate_averages(rows)
    np.testing.assert_allclose(avg, (ate, rt, rr), rtol=1e-6)
    assert calculate_averages([]) == (0.0, 0.0, 0.0)


def test_load_replica_scannet_traj(tmp_path):
    """ScanNet pose_30.txt rows (row-major 4x4 cam2world) load through the
    'scannet' traj_format (reference vo_eval.py:38-66, eval_metadata scannet
    entry); untracked -inf rows inherit the previous pose."""
    from align3r_tpu.eval.trajectory import load_traj, tumpose_to_c2w
    rng = np.random.default_rng(0)
    mats = []
    for _ in range(4):
        T = np.eye(4)
        T[:3, :3] = Rotation.random(random_state=rng.integers(1 << 30)).as_matrix()
        T[:3, 3] = rng.standard_normal(3)
        mats.append(T)
    rows = [m[:3].reshape(-1) for m in mats]
    rows.insert(2, np.full(12, -np.inf))  # scannet untracked frame
    p = tmp_path / "pose_30.txt"
    np.savetxt(p, np.stack(rows))
    tum, ts = load_traj(str(p), "scannet")
    assert tum.shape == (5, 7) and len(ts) == 5
    np.testing.assert_allclose(tumpose_to_c2w(tum[0]), mats[0], atol=1e-6)
    np.testing.assert_allclose(tum[2], tum[1])  # inherited pose
    # kitti format shares the matrix-row layout
    np.savetxt(tmp_path / "poses.txt", np.stack([m[:3].reshape(-1) for m in mats]))
    tum_k, _ = load_traj(str(tmp_path / "poses.txt"), "kitti")
    assert tum_k.shape == (4, 7)
