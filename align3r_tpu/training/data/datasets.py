"""Training dataset implementations over the preprocessed on-disk layout.

Behavioural reference: /root/reference/dust3r/datasets/my_*.py — every
preprocessed dataset shares the frame-file convention
  <stem>_rgb.jpg, <stem>_depth.pfm, <stem>_mask.png, <stem>_metadata.npz
  (+ <stem>_rgb_pred_depth_<prior>.npz monocular prior),
and differs only in scene discovery, the temporal pairing window, and
whether camera_pose in metadata is cam2world or world2cam. Sintel reads the
raw MPI-Sintel files instead (my_sintel.py:85-140).
"""
from __future__ import annotations

import itertools
import os
import os.path as osp
import re
from glob import glob

import numpy as np

from align3r_tpu.training.data.base import BaseStereoViewDataset


def read_pfm(path):
    """Portable float map reader (SceneFlow depth format)."""
    with open(path, "rb") as f:
        header = f.readline().decode("latin-1").rstrip()
        if header not in ("PF", "Pf"):
            raise ValueError(f"not a PFM file: {path}")
        color = header == "PF"
        dims = f.readline().decode("latin-1")
        while dims.startswith("#"):
            dims = f.readline().decode("latin-1")
        w, h = map(int, dims.split())
        scale = float(f.readline().decode("latin-1").rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    shape = (h, w, 3) if color else (h, w)
    return np.flipud(data.reshape(shape)).copy()


def imread_rgb(path):
    import cv2
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    assert img is not None, path
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def imread_gray(path):
    import cv2
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    assert img is not None, path
    return img


class PreprocessedSequenceDataset(BaseStereoViewDataset):
    """Shared machinery for the *_rgb.jpg layout."""

    dataset_label = "Preprocessed"
    invert_pose = False        # metadata camera_pose is world2cam?
    pair_window = 10
    pair_pred = None           # optional custom (i, j) predicate

    def __init__(self, *args, split=None, ROOT, **kwargs):
        self.ROOT = ROOT
        super().__init__(*args, split=split, **kwargs)
        self.pairs = []
        for scene in self._scene_list(split):
            imgs = sorted(glob(osp.join(scene, "*_rgb.jpg")))
            pred = self.pair_pred or (lambda i, j: abs(i - j) <= self.pair_window)
            for i, j in itertools.combinations(range(len(imgs)), 2):
                if pred(i, j):
                    self.pairs.append((imgs[i], imgs[j]))

    def _scene_list(self, split):
        return sorted(osp.join(self.ROOT, s) for s in os.listdir(self.ROOT))

    def __len__(self):
        return len(self.pairs)

    def _load_view(self, img_path):
        rgb = imread_rgb(img_path)
        depth = read_pfm(img_path.replace("_rgb.jpg", "_depth.pfm")).astype(np.float32)
        mask_path = img_path.replace("_rgb.jpg", "_mask.png")
        if osp.exists(mask_path):
            m = imread_gray(mask_path).astype(np.float32)
            depth = depth * ((m / 255.0) > 0.1)
        prior = np.load(img_path.replace(".jpg", "_pred_depth_"
                                         + self.depth_prior_name + ".npz"))
        focal = np.asarray(prior["focallength_px"])
        if focal.shape == (3, 3):
            focal = focal[0][0]
        pred_depth = self.pixel_to_pointcloud(np.squeeze(prior["depth"]),
                                              float(focal))
        meta = np.load(img_path.replace("_rgb.jpg", "_metadata.npz"))
        K = np.float32(meta["camera_intrinsics"])
        pose = np.float32(meta["camera_pose"])
        if self.invert_pose:
            pose = np.linalg.inv(pose)
        return rgb, depth, pred_depth, K, pose

    def _get_views(self, idx, resolution, rng):
        views = []
        for img_path in self.pairs[idx]:
            rgb, depth, pred_depth, K, pose = self._load_view(img_path)
            rgb, depth, pred_depth, K = self._crop_resize_if_necessary(
                rgb, depth, pred_depth, K, resolution, rng, info=img_path)
            views.append(dict(img=rgb, depthmap=depth, camera_pose=pose,
                              camera_intrinsics=K, dataset=self.dataset_label,
                              label=img_path, instance=img_path,
                              pred_depth=pred_depth))
        return views


class SceneFlowDatasets(PreprocessedSequenceDataset):
    """my_sceneflow.py:108-206: Driving/Monkaa/FlyingThings3D, |i-j|<=10."""
    dataset_label = "SceneFlow"
    pair_window = 10

    def _scene_list(self, split):
        outscenes = (["Driving_proc", "Monkaa_proc", "FlyingThings3D_proc"]
                     if split == "train" else ["FlyingThings3D_proc"])
        scenes = []
        for out in outscenes:
            if out == "FlyingThings3D_proc":
                sub = "TRAIN" if split == "train" else "TEST"
                scenes += sorted(glob(osp.join(self.ROOT, out, sub, "*/*/*")))
            elif out == "Driving_proc":
                scenes += sorted(glob(osp.join(self.ROOT, out, "*/*/*/*")))
            elif out == "Monkaa_proc":
                scenes += sorted(glob(osp.join(self.ROOT, out, "*/*")))
        return scenes


class PointodysseyDatasets(PreprocessedSequenceDataset):
    """my_PointOdyssey.py:57-124: |i-j|<=10, poses stored world2cam."""
    dataset_label = "Pointodyssey"
    invert_pose = True
    pair_window = 10


class SpringDatasets(PreprocessedSequenceDataset):
    """my_spring.py: |i-j|<=10, poses world2cam."""
    dataset_label = "Spring"
    invert_pose = True
    pair_window = 10


class TartanairDatasets(PreprocessedSequenceDataset):
    """my_Tartanair.py: |i-j|<=10."""
    dataset_label = "Tartanair"
    pair_window = 10


class VkittiDatasets(PreprocessedSequenceDataset):
    """my_vkitti2.py: |i-j|<=10."""
    dataset_label = "Vkitti"
    pair_window = 10


class SintelDatasets(BaseStereoViewDataset):
    """Raw MPI-Sintel frames (my_sintel.py:55-140): |i-j|<=3, gt depth zeroed
    at dynamic pixels, extrinsics are world2cam .cam files."""
    dataset_label = "Sintel"

    def __init__(self, *args, split=None, ROOT, **kwargs):
        self.ROOT = ROOT
        super().__init__(*args, split=split, **kwargs)
        self.pairs = []
        for scene in sorted(os.listdir(ROOT)):
            imgs = sorted(glob(osp.join(ROOT, scene, "*.png")))
            for i, j in itertools.combinations(range(len(imgs)), 2):
                if abs(i - j) <= 3:
                    self.pairs.append((imgs[i], imgs[j]))

    def __len__(self):
        return len(self.pairs)

    def _get_views(self, idx, resolution, rng):
        from align3r_tpu.utils.sintel_io import depth_read, cam_read
        views = []
        for img_path in self.pairs[idx]:
            rgb = imread_rgb(img_path)
            def sub(a, b):
                return img_path.replace("MPI-Sintel-training_images",
                                        "MPI-Sintel-depth-training") \
                    .replace(a, b)
            depth = depth_read(sub("final/", "depth/").replace("clean/", "depth/")
                               .replace(".png", ".dpt"))
            mask_path = sub("final/", "dynamic_label_perfect/") \
                .replace("clean/", "dynamic_label_perfect/")
            if osp.exists(mask_path):
                m = imread_gray(mask_path).astype(np.float32)
                depth = depth * ((m / 255.0) > 0.1)
            prior = np.load(img_path.replace("final", "depth_prediction_"
                                             + self.depth_prior_name)
                            .replace("clean", "depth_prediction_"
                                     + self.depth_prior_name)
                            .replace(".png", ".npz"))
            pred_depth = self.pixel_to_pointcloud(
                np.squeeze(prior["depth"]), float(np.asarray(prior["focallength_px"]).ravel()[0]))
            K, N = cam_read(sub("final/", "camdata_left/").replace("clean/", "camdata_left/")
                            .replace(".png", ".cam"))
            K = np.float32(K)
            R, t = np.float32(N[:3, :3]), np.float32(N[:3, 3])
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = R.T
            pose[:3, 3] = -R.T @ t
            rgb, depth, pred_depth, K = self._crop_resize_if_necessary(
                rgb, depth.astype(np.float32), pred_depth, K, resolution, rng,
                info=img_path)
            views.append(dict(img=rgb, depthmap=depth, camera_pose=pose,
                              camera_intrinsics=K, dataset=self.dataset_label,
                              label=img_path, instance=img_path,
                              pred_depth=pred_depth))
        return views
