"""Direct tests for inference/images.py load_images — the entry every
demo/eval tool funnels through (reference dust3r/utils/image_pose.py
load_images:246-407). Covers the folder path (priors, dynamic masks,
start/interval slicing) and the VIDEO path (fps striding + interval cap),
which no tool-level test exercised directly."""
import os

import numpy as np
import PIL.Image
import pytest

from align3r_tpu.inference.images import load_images, stack_views


@pytest.fixture(scope="module")
def img_folder(tmp_path_factory):
    root = tmp_path_factory.mktemp("frames")
    rng = np.random.default_rng(0)
    H, W = 48, 64
    for k in range(5):
        arr = rng.integers(0, 255, (H, W, 3), np.uint8)
        PIL.Image.fromarray(arr).save(root / f"frame_{k:03d}.png")
        np.savez(root / f"frame_{k:03d}_pred_depth_depthpro.npz",
                 depth=rng.uniform(1, 5, (H, W)).astype(np.float32),
                 focallength_px=np.float32(60.0))
    return str(root)


def test_load_images_folder_with_priors(img_folder):
    views = load_images(img_folder, size=64, traj_format="other", crop=False)
    assert len(views) == 5
    v = views[0]
    assert v["img"].shape[0] == 1 and v["img"].shape[-1] == 3
    assert v["img"].min() >= -1.0 and v["img"].max() <= 1.0
    # prior npz was found and converted to a pointcloud (nonzero z)
    assert v["pred_depth"].shape == v["img"].shape
    assert np.abs(v["pred_depth"][..., 2]).max() > 0
    assert [u["idx"] for u in views] == list(range(5))
    stacked = stack_views(views)
    assert stacked["imgs"].shape[0] == 5
    assert stacked["dynamic_masks"].dtype == bool


def test_load_images_start_interval(img_folder):
    """start/interval slice the RAW directory listing before the extension
    filter — reference-parity semantics (image_pose.py:276 slices
    folder_content first, then filters per-entry), so prior .npz entries
    sitting next to the frames count toward the window."""
    # listing: [f000.png, f000.npz, f001.png, f001.npz, f002.png, ...]
    views = load_images(img_folder, size=64, traj_format="other",
                        crop=False, start=2, interval=4)
    assert len(views) == 2
    assert views[0]["instance"].endswith("frame_001.png")
    assert views[1]["instance"].endswith("frame_002.png")


def test_load_images_dynamic_mask_root(img_folder, tmp_path):
    mroot = tmp_path / "masks"
    mroot.mkdir()
    H, W = 48, 64
    m = np.zeros((H, W), np.uint8)
    m[:, : W // 2] = 255
    for k in range(5):
        PIL.Image.fromarray(m).save(mroot / f"frame_{k:03d}.png")
    views = load_images(img_folder, size=64, traj_format="other", crop=False,
                        dynamic_mask_root=str(mroot))
    dm = views[0]["dynamic_mask"][0]
    assert dm.dtype == bool and dm.any() and not dm.all()
    assert dm[:, : W // 4].all() and not dm[:, -W // 4:].any()


def test_load_images_video_fps_and_interval(tmp_path):
    import cv2
    H, W, n_frames = 48, 64, 24
    path = str(tmp_path / "clip.avi")
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 12.0, (W, H))
    assert wr.isOpened(), "cv2 MJPG writer unavailable"
    rng = np.random.default_rng(1)
    for _ in range(n_frames):
        wr.write(rng.integers(0, 255, (H, W, 3), np.uint8))
    wr.release()

    # fps=6 on a 12 fps clip -> every 2nd frame = 12 views
    views = load_images(path, size=64, crop=False, fps=6)
    assert len(views) == 12
    assert views[0]["instance"].endswith(":frame0")
    assert views[1]["instance"].endswith(":frame2")
    assert views[0]["img"].shape[-1] == 3
    # priors are zero-filled for video frames (no npz convention)
    assert float(np.abs(views[0]["pred_depth"]).max()) == 0.0

    # interval caps AFTER fps striding (reference image_pose.py:365-367)
    views = load_images(path, size=64, crop=False, fps=6, interval=5)
    assert len(views) == 5

    # fps=0 -> every frame
    views = load_images(path, size=64, crop=False)
    assert len(views) == n_frames
