"""Reference-compatible API surface (drop-in style entry points).

BASELINE.md requires the public entry points (`dust3r.inference`,
`make_pairs`, `global_aligner`, `load_model`) to keep their reference
signatures so users of the reference can switch frameworks without
rewriting call sites. This module adapts those surfaces onto the TPU-native
engine (view-dict pairs in, prediction dicts out).

Reference signatures: dust3r/inference.py:55-78, dust3r/image_pairs.py:11,
dust3r/cloud_opt/__init__.py:26-40, dust3r/model.py:27-43.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp


class Align3RModel:
    """Bundles (params, cfg) like the reference's model object."""

    def __init__(self, params, cfg):
        self.params = params
        self.cfg = cfg

    @classmethod
    def from_pretrained(cls, path_or_name):
        from align3r_tpu.models.convert import load_torch_checkpoint
        params, cfg = load_torch_checkpoint(path_or_name)
        return cls(params, cfg)

    def to(self, device=None):  # device placement is jax-managed; no-op
        return self


def load_model(model_path: str, device=None, verbose: bool = True) -> Align3RModel:
    """Reference dust3r.model.load_model signature."""
    if verbose:
        print("... loading model from", model_path)
    return Align3RModel.from_pretrained(model_path)


def make_pairs(imgs: Sequence[Dict], scene_graph="complete", prefilter=None,
               symmetrize=True) -> List[Tuple[Dict, Dict]]:
    """Reference signature: list of view dicts in, list of dict pairs out."""
    from align3r_tpu.inference.pairs import make_pairs as _mp
    idx_pairs = _mp(len(imgs), scene_graph, prefilter, symmetrize)
    return [(imgs[i], imgs[j]) for i, j in idx_pairs]


def inference(pairs: Sequence[Tuple[Dict, Dict]], model: Align3RModel,
              device=None, batch_size: int = 8, verbose: bool = True,
              **engine_kw) -> Dict:
    """Reference dust3r.inference signature over view-dict pairs.

    Each view dict needs 'img' (1, H, W, 3) or (1, 3, H, W) in [-1, 1],
    'pred_depth' (1, H, W, 3) and 'idx'. Returns the reference output
    contract {view1, view2, pred1, pred2} (numpy, channel-last).

    The compat layer keeps the reference AMP rule (heads fp32,
    dust3r/model.py:252) — the perf-oriented engine defaults to bf16 heads
    and callers can still opt in via head_dtype=jnp.bfloat16.
    """
    from align3r_tpu.inference.engine import inference as _inf
    engine_kw.setdefault("head_dtype", jnp.float32)

    # collect unique views by idx
    views: Dict[int, Dict] = {}
    idx_pairs = []
    for v1, v2 in pairs:
        views[int(v1["idx"])] = v1
        views[int(v2["idx"])] = v2
        idx_pairs.append((int(v1["idx"]), int(v2["idx"])))
    order = sorted(views)
    remap = {k: i for i, k in enumerate(order)}
    idx_pairs = [(remap[i], remap[j]) for i, j in idx_pairs]

    def img_of(v):
        img = np.asarray(v["img"])
        if img.ndim == 4 and img.shape[1] == 3 and img.shape[-1] != 3:
            img = img.transpose(0, 2, 3, 1)  # NCHW -> NHWC
        return img[0]

    imgs = np.stack([img_of(views[k]) for k in order])
    priors = np.stack([np.asarray(views[k]["pred_depth"])[0] for k in order])
    out = _inf(idx_pairs, model.params, model.cfg, jnp.asarray(imgs),
               jnp.asarray(priors), batch_size=batch_size, **engine_kw)
    # restore original view indices
    inv = {i: k for k, i in remap.items()}
    out["view1"]["idx"] = np.asarray([inv[i] for i in np.asarray(out["view1"]["idx"])])
    out["view2"]["idx"] = np.asarray([inv[i] for i in np.asarray(out["view2"]["idx"])])
    return out


class GlobalAlignerMode:
    PointCloudOptimizer = "PointCloudOptimizer"
    ModularPointCloudOptimizer = "ModularPointCloudOptimizer"
    PairViewer = "PairViewer"


class _SceneWrapper:
    """Reference-scene-like facade over (cfg, data, params) + solve."""

    def __init__(self, output, mode, device=None, variant="flow", **kwargs):
        from align3r_tpu.alignment.scene import build_scene
        self._output = output
        self._variant = variant
        mono = kwargs.pop("mono_depths", None)
        if kwargs.pop("if_use_mono", False) and mono is not None:
            mono = np.stack([np.asarray(m).reshape(-1) for m in mono])
        else:
            mono = None
        known = {"shared_focal", "temporal_smoothing_weight", "translation_weight",
                 "flow_loss_weight", "depth_regularize_weight", "min_conf_thr",
                 "optimize_pp", "conf", "base_scale", "pw_break", "focal_break",
                 "flow_loss_start_epoch", "flow_loss_thre", "num_total_iter"}
        cfg_kw = {k: v for k, v in kwargs.items() if k in known}
        self.cfg, self.data, self.params = build_scene(output, cfg_kw=cfg_kw,
                                                       mono_depths=mono)
        self._mode = mode
        self._masks = None  # built lazily; preset_* freezes rows in it

    def _get_masks(self):
        from align3r_tpu.alignment.scene import default_masks
        if self._masks is None:
            self._masks = default_masks(self.cfg, self.params)
        return self._masks

    # ----- preset/freeze API (reference base_opt preset_pose/_focal/... and
    # the ModularPointCloudOptimizer's partial-freezing role; here freezing
    # is a row-level gradient mask, so every scene is "modular")
    @staticmethod
    def _msk_indices(msk, n_values):
        """Reference _get_msk_indices (modular_optimizer.py:73-85): int
        scalars / int lists / int arrays ARE image indices; only BOOL masks
        go through np.where; msk=None means images 0..n-1."""
        if msk is None:
            return np.arange(n_values)
        if isinstance(msk, (int, np.integer)):
            return np.array([msk])
        msk = np.asarray(msk)
        if msk.dtype == bool:
            return np.where(msk)[0][:n_values]
        if np.issubdtype(msk.dtype, np.integer):
            return msk[:n_values]
        raise TypeError(f"bad mask dtype {msk.dtype!r} (bool or int)")

    def preset_pose(self, known_poses, pose_msk=None):
        from align3r_tpu.alignment import scene
        poses = np.asarray(known_poses, np.float32)
        self.params, self._masks = scene.preset_pose(
            self.params, self._get_masks(),
            self._msk_indices(pose_msk, len(poses)), poses)

    def preset_focal(self, known_focals, msk=None):
        from align3r_tpu.alignment import scene
        f = np.asarray(known_focals, np.float32).reshape(-1)
        self.params, self._masks = scene.preset_focal(
            self.params, self._get_masks(), self.cfg,
            self._msk_indices(msk, len(f)), f)

    def preset_principal_point(self, known_pp, msk=None):
        from align3r_tpu.alignment import scene
        pp = np.asarray(known_pp, np.float32)
        self.params, self._masks = scene.preset_principal_point(
            self.params, self._get_masks(), self.data,
            self._msk_indices(msk, len(pp)), pp)

    def preset_depthmap(self, known_depthmaps, msk=None):
        from align3r_tpu.alignment import scene
        d = np.stack([np.asarray(m).reshape(-1) for m in known_depthmaps])
        self.params, self._masks = scene.preset_depthmap(
            self.params, self._get_masks(), self._msk_indices(msk, len(d)), d)

    def compute_global_alignment(self, init=None, niter=300, schedule="cosine",
                                 lr=0.01, init_priors=None,
                                 save_score_path=None, save_score_only=False,
                                 **kw):
        from align3r_tpu.alignment.scene import (global_alignment_loop,
                                                 pairwise_pts_loss)
        from align3r_tpu.alignment.flow import flow_forward
        from align3r_tpu.alignment.init_poses import (mst_init,
                                                      save_edge_score_heatmap)
        if save_score_path is not None:
            # reference cloud_opt_flow/base_opt.py:460-466: dump the MST
            # edge-score heatmap; save_score_only skips the whole solve
            save_edge_score_heatmap(save_score_path, self.data, self.cfg,
                                    np.asarray(self._output["pred1"]["conf"]),
                                    np.asarray(self._output["pred2"]["conf"]))
            if save_score_only:
                return None
        if init in ("mst", "msp"):
            self.params = mst_init(self.params, self.data, self.cfg,
                                   np.asarray(self._output["pred1"]["conf"]),
                                   np.asarray(self._output["pred2"]["conf"]),
                                   init_priors=init_priors)
        # init="known_poses": poses were provided via preset_pose; nothing to
        # re-estimate (reference init_im_poses.py init_from_known_poses)
        masks = self._get_masks()
        loss_fn = flow_forward if self._variant == "flow" else pairwise_pts_loss
        self.params, losses = global_alignment_loop(
            self.params, masks, self.data, self.cfg, lr=lr, niter=niter,
            schedule=schedule, loss_fn=loss_fn)
        return float(np.asarray(losses)[-1])

    # ----- getters matching the reference scene API
    def get_im_poses(self):
        from align3r_tpu.alignment.scene import get_im_poses
        return np.asarray(get_im_poses(self.params))

    def get_depthmaps(self, raw=False):
        from align3r_tpu.alignment.scene import get_depthmaps_raw
        H, W = self.cfg.imshape
        d = np.asarray(get_depthmaps_raw(self.params, self.data, self.cfg))
        return d if raw else list(d.reshape(self.cfg.n_imgs, H, W))

    def get_pts3d(self, raw=False):
        from align3r_tpu.alignment.scene import depth_to_pts3d
        H, W = self.cfg.imshape
        p = np.asarray(depth_to_pts3d(self.params, self.data, self.cfg))
        return p if raw else list(p.reshape(self.cfg.n_imgs, H, W, 3))

    def get_focals(self):
        from align3r_tpu.alignment.scene import get_focals
        return np.asarray(get_focals(self.params, self.cfg))

    def get_intrinsics(self):
        from align3r_tpu.alignment.scene import get_intrinsics
        return np.asarray(get_intrinsics(self.params, self.data, self.cfg))

    def get_masks(self):
        H, W = self.cfg.imshape
        conf = np.asarray(self.data.im_conf).reshape(self.cfg.n_imgs, H, W)
        return [c > self.cfg.min_conf_thr for c in conf]

    def clean_pointcloud(self, **kw):
        from align3r_tpu.alignment.clean import clean_pointcloud
        import jax.numpy as jnp
        from align3r_tpu.geometry.core import closed_form_pose_inverse
        H, W = self.cfg.imshape
        conf = jnp.asarray(self.data.im_conf).reshape(self.cfg.n_imgs, H, W)
        poses = jnp.asarray(self.get_im_poses())
        new = clean_pointcloud(conf, jnp.asarray(self.get_intrinsics()),
                               closed_form_pose_inverse(poses),
                               jnp.asarray(np.stack(self.get_depthmaps())),
                               jnp.asarray(np.stack(self.get_pts3d())), **kw)
        import dataclasses
        self.data = dataclasses.replace(
            self.data, im_conf=jnp.asarray(new).reshape(self.cfg.n_imgs, -1))
        return self


def global_aligner(dust3r_output, *args, device=None,
                   mode=GlobalAlignerMode.PointCloudOptimizer, **kwargs):
    """BOTH reference factory signatures, distinguished positionally:

    - flow variant  (cloud_opt_flow/__init__.py:20):
        global_aligner(output, device, mode=..., **optim_kw)
    - prior variant (cloud_opt/__init__.py:26):
        global_aligner(output, if_use_mono, mono_depths, device, mode=...,
                       **optim_kw)

    A bool second positional argument selects the prior-variant binding
    (if_use_mono); anything else binds as `device` (flow variant)."""
    variant = kwargs.pop("variant", None)
    if args and isinstance(args[0], (bool, np.bool_)):
        kwargs["if_use_mono"] = bool(args[0])
        if len(args) > 1:
            kwargs.setdefault("mono_depths", args[1])
        if len(args) > 2:
            device = args[2]
        if len(args) > 3:
            mode = args[3]
        variant = variant or "prior"
    else:
        if len(args) > 0:
            device = args[0]
        if len(args) > 1:
            mode = args[1]
        variant = variant or "flow"
    if kwargs.pop("if_use_mono_env", False):
        variant = "prior"
    return _SceneWrapper(dust3r_output, mode, device, variant=variant, **kwargs)
