"""Reference-style API surface: load_model / make_pairs / inference /
global_aligner keep their call shapes (BASELINE.md contract)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from align3r_tpu.models.config import TINY_TEST
from align3r_tpu.models.align3r import init_align3r
from align3r_tpu import compat


@pytest.fixture(scope="module")
def model():
    params = init_align3r(jax.random.PRNGKey(0), TINY_TEST)
    for h in ("head1", "head2"):
        hc = dict(params[h])
        hc["head_conv3"] = {"kernel": params[h]["head_conv3"]["kernel"] * 0.01,
                            "bias": params[h]["head_conv3"]["bias"] * 0.0}
        params = dict(params, **{h: hc})
    return compat.Align3RModel(params, TINY_TEST)


def make_views(n=3, H=32, W=48, seed=0):
    rng = np.random.default_rng(seed)
    return [dict(img=rng.standard_normal((1, H, W, 3)).astype(np.float32) * 0.2,
                 pred_depth=rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32),
                 true_shape=np.int32([[H, W]]), idx=i, instance=str(i))
            for i in range(n)]


def test_reference_style_pipeline(model, tmp_path):
    imgs = make_views()
    pairs = compat.make_pairs(imgs, scene_graph="complete", symmetrize=True)
    assert isinstance(pairs[0], tuple) and "img" in pairs[0][0]
    output = compat.inference(pairs, model, device=None, batch_size=4)
    E = len(pairs)
    assert output["pred1"]["pts3d"].shape[0] == E
    assert set(np.asarray(output["view1"]["idx"])) == {0, 1, 2}

    scene = compat.global_aligner(output, device=None,
                                  mode=compat.GlobalAlignerMode.PointCloudOptimizer,
                                  variant="prior", min_conf_thr=1.1)
    loss = scene.compute_global_alignment(init="mst", niter=20, schedule="cosine",
                                          lr=0.05)
    assert np.isfinite(loss)
    poses = scene.get_im_poses()
    assert poses.shape == (3, 4, 4)
    assert len(scene.get_depthmaps()) == 3
    assert len(scene.get_pts3d()) == 3
    assert scene.get_intrinsics().shape == (3, 3, 3)
    assert len(scene.get_masks()) == 3
    scene.clean_pointcloud()


def test_nchw_images_accepted(model):
    imgs = make_views()
    for v in imgs:
        v["img"] = v["img"].transpose(0, 3, 1, 2)  # reference NCHW layout
    pairs = compat.make_pairs(imgs, "complete", symmetrize=False)
    out = compat.inference(pairs, model, batch_size=4)
    assert np.isfinite(np.asarray(out["pred1"]["pts3d"])).all()


def test_preset_known_poses_frozen(model):
    """Modular-optimizer role: preset poses/focals stay exactly fixed
    through the solve (reference preset_pose + init='known_poses')."""
    imgs = make_views()
    pairs = compat.make_pairs(imgs, "complete", symmetrize=True)
    output = compat.inference(pairs, model, batch_size=4)
    scene = compat.global_aligner(output,
                                  mode=compat.GlobalAlignerMode.ModularPointCloudOptimizer,
                                  variant="prior", min_conf_thr=1.1)
    known = np.stack([np.eye(4, dtype=np.float32)] * 2)
    known[1, 0, 3] = 0.5
    scene.preset_pose(known, pose_msk=[True, True, False])
    scene.preset_focal([40.0], msk=[True, False, False])
    loss = scene.compute_global_alignment(init="known_poses", niter=15,
                                          schedule="cosine", lr=0.05)
    assert np.isfinite(loss)
    poses = scene.get_im_poses()
    np.testing.assert_allclose(poses[:2], known, atol=1e-5)
    np.testing.assert_allclose(scene.get_focals()[0], 40.0, rtol=1e-5)
    # unfrozen frame 2 moved away from identity
    assert np.abs(poses[2] - np.eye(4)).max() > 1e-4


def test_save_score_heatmap(tmp_path):
    """save_score_path writes the MST edge-score heatmap + raw matrix
    (reference cloud_opt_flow/base_opt.py:460-466, init_im_poses.py:23-42);
    save_score_only skips the solve."""
    rng = np.random.default_rng(3)
    n, H, W = 3, 16, 24
    pairs = [(i, j) for i in range(n) for j in range(n) if i != j]
    E = len(pairs)
    out = {
        "view1": {"idx": np.array([p[0] for p in pairs])},
        "view2": {"idx": np.array([p[1] for p in pairs])},
        "pred1": {"pts3d": rng.standard_normal((E, H, W, 3)).astype(np.float32),
                  "conf": 1 + rng.random((E, H, W)).astype(np.float32)},
        "pred2": {"pts3d_in_other_view":
                  rng.standard_normal((E, H, W, 3)).astype(np.float32),
                  "conf": 1 + rng.random((E, H, W)).astype(np.float32)},
    }
    scene = compat.global_aligner(out, device=None,
                                  mode=compat.GlobalAlignerMode.PointCloudOptimizer)
    p = tmp_path / "scores.png"
    r = scene.compute_global_alignment(init="mst", niter=2,
                                       save_score_path=str(p),
                                       save_score_only=True)
    assert r is None
    m = np.load(str(p) + ".npy")
    assert m.shape == (scene.cfg.n_imgs, scene.cfg.n_imgs)
    finite = np.isfinite(m)
    assert finite.sum() == scene.data.ei.shape[0]
    # full call with score dump still solves
    loss = scene.compute_global_alignment(init="mst", niter=2,
                                          save_score_path=str(p))
    assert np.isfinite(loss)


def test_msk_indices_reference_semantics():
    """int scalars / lists / arrays ARE image indices (reference
    modular_optimizer.py:73-85); only bool masks go through np.where —
    np.nonzero on an int list silently selected the wrong images."""
    f = compat._SceneWrapper._msk_indices
    np.testing.assert_array_equal(f(None, 3), [0, 1, 2])
    np.testing.assert_array_equal(f(2, 1), [2])
    np.testing.assert_array_equal(f([0, 3, 5], 3), [0, 3, 5])
    np.testing.assert_array_equal(f(np.array([1, 4]), 2), [1, 4])
    np.testing.assert_array_equal(f([True, False, True], 2), [0, 2])
    import pytest as _pytest
    with _pytest.raises(TypeError):
        f(np.array([0.5, 1.0]), 2)


def test_global_aligner_prior_positional_signature(model):
    """The prior-variant reference factory is positional:
    global_aligner(output, if_use_mono, mono_depths, device, mode=...)
    (cloud_opt/__init__.py:26) — reference-style call sites must bind."""
    imgs = make_views()
    pairs = compat.make_pairs(imgs, "complete", symmetrize=True)
    output = compat.inference(pairs, model, batch_size=4)
    n = 3
    H, W = np.asarray(output["pred1"]["pts3d"]).shape[1:3]
    mono = [np.full((H, W), 2.0, np.float32) for _ in range(n)]
    scene = compat.global_aligner(output, True, mono, None,
                                  min_conf_thr=1.1)
    assert scene._variant == "prior"
    assert scene.cfg.if_use_mono
    loss = scene.compute_global_alignment(init="mst", niter=5,
                                          schedule="cosine", lr=0.05)
    assert np.isfinite(loss)
