"""End-to-end video reconstruction pipeline (the tool/demo.py core).

Behavioural reference: /root/reference/tool/demo.py
(get_reconstructed_scene:120-171, hierarchical variant 173-251) and the
artifact savers in dust3r/cloud_opt_flow/base_opt.py:332-427.

Pipeline: frames -> pair graph -> batched two-view inference (on device) ->
optional RAFT flows + self-supervised motion masks -> MST init (host) ->
jitted Adam alignment scan (device) -> SceneResult with poses/depths/
intrinsics + artifact savers.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from align3r_tpu.models.config import Align3RConfig
from align3r_tpu.inference.pairs import make_pairs
from align3r_tpu.inference.engine import inference
from align3r_tpu.alignment.scene import (
    SceneConfig, SceneData, build_scene, default_masks, global_alignment_loop,
    get_im_poses, get_focals, get_principal_points, get_intrinsics,
    get_depthmaps_raw, pairwise_pts_loss)
from align3r_tpu.alignment.flow import flow_forward
from align3r_tpu.alignment.init_poses import mst_init
from align3r_tpu.eval.trajectory import poses_to_traj, save_tum_trajectory


@dataclasses.dataclass
class SceneResult:
    cfg: SceneConfig
    data: SceneData
    params: Dict
    losses: np.ndarray
    imgs: Optional[np.ndarray] = None            # (n, H, W, 3) in [-1, 1]
    dynamic_masks: Optional[np.ndarray] = None   # (n, H, W) bool

    # ------------------------------------------------------------- getters
    def get_im_poses(self) -> np.ndarray:
        return np.asarray(get_im_poses(self.params))

    def get_focals(self) -> np.ndarray:
        return np.asarray(get_focals(self.params, self.cfg))

    def get_principal_points(self) -> np.ndarray:
        return np.asarray(get_principal_points(self.params, self.data))

    def get_intrinsics(self) -> np.ndarray:
        return np.asarray(get_intrinsics(self.params, self.data, self.cfg))

    def get_depthmaps(self) -> np.ndarray:
        H, W = self.cfg.imshape
        return np.asarray(get_depthmaps_raw(self.params, self.data, self.cfg)
                          ).reshape(self.cfg.n_imgs, H, W)

    def get_pts3d(self) -> np.ndarray:
        from align3r_tpu.alignment.scene import depth_to_pts3d
        H, W = self.cfg.imshape
        return np.asarray(depth_to_pts3d(self.params, self.data, self.cfg)
                          ).reshape(self.cfg.n_imgs, H, W, 3)

    def get_conf(self) -> np.ndarray:
        H, W = self.cfg.imshape
        return np.asarray(self.data.im_conf).reshape(self.cfg.n_imgs, H, W)

    def get_masks(self) -> np.ndarray:
        return self.get_conf() > self.cfg.min_conf_thr

    # -------------------------------------------------------------- savers
    # (artifact formats mirror cloud_opt_flow/base_opt.py:332-427)
    def save_tum_poses(self, path):
        traj = poses_to_traj(self.get_im_poses())
        save_tum_trajectory(traj, path)
        return traj[0]

    def save_focals(self, path):
        np.savetxt(path, self.get_focals(), fmt="%.6f")

    def save_intrinsics(self, path):
        np.savetxt(path, self.get_intrinsics().reshape(-1, 9), fmt="%.6f")

    def save_depth_maps(self, out_dir, start: int = 0):
        import matplotlib
        depths = self.get_depthmaps()
        os.makedirs(out_dir, exist_ok=True)
        cm = matplotlib.colormaps["Spectral_r"]
        for i, d in enumerate(depths):
            np.save(os.path.join(out_dir, f"frame_{i + start:04d}.npy"), d)
            dn = (d - d.min()) / max(d.max() - d.min(), 1e-8)
            img = (cm(dn)[..., :3] * 255).astype(np.uint8)
            _save_png(img, os.path.join(out_dir, f"frame_{i + start:04d}.png"))
        return depths

    def save_conf_maps(self, out_dir, start: int = 0):
        confs = self.get_conf()
        os.makedirs(out_dir, exist_ok=True)
        for i, c in enumerate(confs):
            np.save(os.path.join(out_dir, f"conf_{i + start}.npy"), c)
        return confs

    def save_dynamic_masks(self, out_dir, start: int = 0):
        masks = self.dynamic_masks if self.dynamic_masks is not None else \
            np.zeros((self.cfg.n_imgs,) + self.cfg.imshape, bool)
        os.makedirs(out_dir, exist_ok=True)
        for i, m in enumerate(masks):
            _save_png((m * 255).astype(np.uint8),
                      os.path.join(out_dir, f"dynamic_mask_{i + start}.png"))
        return masks

    def mask_sky(self):
        """Zero confidence on HSV-heuristic sky pixels (reference
        base_opt.py:388-392 + viz.segment_sky). Returns new im_conf."""
        import dataclasses as _dc
        import jax.numpy as jnp
        from align3r_tpu.eval.viz import segment_sky
        assert self.imgs is not None
        H, W = self.cfg.imshape
        conf = np.asarray(self.data.im_conf).reshape(self.cfg.n_imgs, H, W).copy()
        for i in range(self.cfg.n_imgs):
            sky = segment_sky(self.imgs[i] * 0.5 + 0.5)
            conf[i][sky] = 0
        self.data = _dc.replace(self.data,
                                im_conf=jnp.asarray(conf.reshape(self.cfg.n_imgs, -1)))
        return conf

    def save_rgb_imgs(self, out_dir, start: int = 0):
        os.makedirs(out_dir, exist_ok=True)
        if self.imgs is None:
            return
        for i, im in enumerate(self.imgs):
            _save_png(((im * 0.5 + 0.5) * 255).astype(np.uint8),
                      os.path.join(out_dir, f"frame_{i + start:04d}.png"))


def _save_png(arr, path):
    import PIL.Image
    PIL.Image.fromarray(arr).save(path)


def compute_raft_flows(raft_params, imgs_01: np.ndarray, edges,
                       chunk: int = 12, iters: int = 20,
                       raft_kind: str = "raft2", compute_dtype="auto"):
    """Bidirectional RAFT flow per edge (optimizer.py get_flow:118-154).
    imgs_01: (n, H, W, 3) in [0, 1]. Returns flow_ij, flow_ji (E, H, W, 2).

    compute_dtype mirrors the reference's torch.autocast(bfloat16) flow
    compute (cloud_opt_flow/optimizer.py:250-251), but "auto" resolves to
    float32 everywhere: on v5e the bf16 solve MEASURED 27% SLOWER than fp32
    (98.3 vs 77.6 ms per 8-img 20-iter solve, tool/profile_raft.py) — the
    one-hot corr-lookup einsums pay more in 16-bit relayouts/casts than the
    MXU rate returns, and the conv stacks are only ~18% of the solve. bf16
    remains available as an explicit knob for autocast-parity experiments."""
    if compute_dtype == "auto":
        compute_dtype = jnp.float32
    if raft_kind == "raft1":
        from align3r_tpu.models.raft1 import raft1_forward, RAFT1Config
        _fwd = lambda a, b: raft1_forward(raft_params, a, b, RAFT1Config(),
                                          iters=iters,
                                          compute_dtype=compute_dtype)
    else:
        from align3r_tpu.models.raft import raft_forward, SPRING_M
        _fwd = lambda a, b: raft_forward(raft_params, a, b, SPRING_M,
                                         iters=iters,
                                         compute_dtype=compute_dtype)
    ei = np.array([e[0] for e in edges])
    ej = np.array([e[1] for e in edges])
    imgs255 = jnp.asarray(imgs_01 * 255.0, jnp.float32)
    E = len(edges)
    f_ij, f_ji = [], []
    fwd = jax.jit(_fwd)
    for s in range(0, E, chunk):
        e = min(s + chunk, E)
        pad = chunk - (e - s)
        bi = np.concatenate([ei[s:e], np.zeros(pad, int)]) if pad else ei[s:e]
        bj = np.concatenate([ej[s:e], np.zeros(pad, int)]) if pad else ej[s:e]
        a = jnp.take(imgs255, jnp.asarray(bi), axis=0)
        b = jnp.take(imgs255, jnp.asarray(bj), axis=0)
        f_ij.append(np.asarray(fwd(a, b))[: e - s])
        f_ji.append(np.asarray(fwd(b, a))[: e - s])
    return np.concatenate(f_ij), np.concatenate(f_ji)


def reconstruct_scene(
    imgs: np.ndarray, priors: np.ndarray, model_params, model_cfg: Align3RConfig,
    *,
    scene_graph: str = "swinstride-5-noncyclic",
    symmetrize: bool = True,
    batch_size: int = 8,
    variant: str = "flow",                 # 'flow' (demo/pose) | 'prior' (depth)
    mono_depths: Optional[np.ndarray] = None,
    raft_params=None,
    raft_kind: str = "raft2",              # 'raft2' (SEA-RAFT) | 'raft1'
    dynamic_masks: Optional[np.ndarray] = None,
    use_self_mask: bool = False,
    sam2_mask_refine: bool = False,
    sam2_model=None,                       # optional (params, cfg) from load_hf_sam2_video
    init: str = "mst",
    init_priors=None,
    niter: int = 300,
    lr: float = 0.01,
    schedule: str = "linear",
    lr_min: float = 1e-6,
    scene_kw: Optional[Dict] = None,
    seed: int = 0,
    conf_clamp: Optional[float] = None,    # depth_test.py:638-639 conf>1 -> 10
    inference_kw: Optional[Dict] = None,   # engine options, e.g. head_dtype
) -> SceneResult:
    """Full per-video solve. imgs: (n, H, W, 3) in [-1, 1]; priors: (n, H, W, 3)."""
    n = imgs.shape[0]
    pairs = make_pairs(n, scene_graph, symmetrize=symmetrize)
    output = inference(pairs, model_params, model_cfg,
                       jnp.asarray(imgs), jnp.asarray(priors),
                       batch_size=batch_size, **(inference_kw or {}))
    if conf_clamp is not None:
        for k, key in (("pred1", "conf"), ("pred2", "conf")):
            c = output[k][key]
            output[k][key] = jnp.where(c > 1, conf_clamp, c)

    scene_kw = dict(scene_kw or {})
    if variant == "flow":
        scene_kw.setdefault("num_total_iter", niter)
    cfg, data, params = build_scene(output, cfg_kw=scene_kw, mono_depths=mono_depths)

    # flow precompute + motion masks
    if variant == "flow" and cfg.flow_loss_weight > 0 and raft_params is not None:
        imgs01 = (np.asarray(imgs) * 0.5 + 0.5)
        flow_ij, flow_ji = compute_raft_flows(raft_params, imgs01, pairs,
                                              raft_kind=raft_kind)
        if use_self_mask and dynamic_masks is None:
            from align3r_tpu.alignment.pair_viewer import motion_masks_from_pairs
            dynamic_masks = motion_masks_from_pairs(
                output, flow_ij, flow_ji,
                motion_mask_thre=scene_kw.get("motion_mask_thre", 0.35),
                min_conf_thr=cfg.min_conf_thr)
            if sam2_mask_refine:
                # SAM2 video refinement of the self-supervised motion masks
                # (reference cloud_opt_flow/optimizer.py:237-312; falls back
                # to connected-component cleanup without local SAM2 weights)
                from align3r_tpu.models.sam2_refine import refine_motion_mask_w_sam2
                sp, sc = sam2_model if sam2_model is not None else (None, None)
                dynamic_masks = refine_motion_mask_w_sam2(
                    imgs01, np.asarray(dynamic_masks), params=sp, cfg=sc)
        data = dataclasses.replace(
            data, flow_ij=jnp.asarray(flow_ij), flow_ji=jnp.asarray(flow_ji))
    if dynamic_masks is not None:
        data = dataclasses.replace(
            data, dynamic_masks=jnp.asarray(dynamic_masks, jnp.float32))

    if init == "mst":
        params = mst_init(params, data, cfg,
                          np.asarray(output["pred1"]["conf"]),
                          np.asarray(output["pred2"]["conf"]),
                          init_priors=init_priors)
    if variant == "flow" and cfg.depth_regularize_weight > 0:
        data = dataclasses.replace(data, init_depth=get_depthmaps_raw(params, data, cfg))

    masks = default_masks(cfg, params)
    if init_priors is not None:
        # anchor frame 0's pose/focal across hierarchy levels
        # (reference init_im_poses.py:164-185)
        masks["im_poses"] = masks["im_poses"].at[0].set(0.0)
        masks["im_focals"] = masks["im_focals"].at[0].set(0.0)

    loss_fn = flow_forward if variant == "flow" else pairwise_pts_loss
    params, losses = global_alignment_loop(params, masks, data, cfg,
                                           lr=lr, niter=niter,
                                           schedule=schedule, lr_min=lr_min,
                                           loss_fn=loss_fn)
    losses = np.asarray(losses)
    if not np.isfinite(losses).all():
        # solve-loop sanitizer (the training loop's finite-loss assert
        # equivalent; reference hardwires detect_anomaly, training.py:28).
        # Raising here surfaces the divergence instead of emitting silent
        # zero metrics through the per-sequence exception tolerance.
        bad = int(np.flatnonzero(~np.isfinite(losses))[0])
        raise FloatingPointError(
            f"non-finite alignment loss at iter {bad}/{niter} "
            f"(variant={variant}, n_imgs={cfg.n_imgs}, edges={cfg.n_edges})")
    return SceneResult(cfg=cfg, data=data, params=params,
                       losses=losses, imgs=np.asarray(imgs),
                       dynamic_masks=dynamic_masks)


def reconstruct_scene_hierarchical(
    imgs: np.ndarray, priors: np.ndarray, model_params, model_cfg,
    *, clip_size: int = 10, coarse_niter: int = 300, coarse_lr: float = 0.01,
    niter: int = 300, lr: float = 0.01, **kw
) -> Tuple[List[SceneResult], np.ndarray, np.ndarray]:
    """Hierarchical long-video solve (reference tool/demo.py:173-251,
    my_make_pairs:357-397; depth_test.py:624-676): a coarse solve over
    keyframes (complete graph), then per-clip solves anchored to their
    keyframe's coarse pose/focal via init_priors.

    Returns (clip SceneResults, all_poses (n,4,4), all_depths (n,H,W)).
    """
    n = imgs.shape[0]
    keyframes = list(range(0, n, clip_size))
    coarse = reconstruct_scene(imgs[keyframes], priors[keyframes],
                               model_params, model_cfg,
                               scene_graph="complete", niter=coarse_niter,
                               lr=coarse_lr, **kw)
    key_poses = coarse.get_im_poses()
    key_focals = coarse.get_focals()
    key_depths = coarse.get_depthmaps()

    H, W = imgs.shape[1:3]
    all_poses = np.zeros((n, 4, 4), np.float32)
    all_depths = np.zeros((n, H, W), np.float32)
    results = []
    for ci, start in enumerate(keyframes):
        clip = list(range(start, min(start + clip_size + 1, n)))
        if len(clip) < 2:
            all_poses[start] = key_poses[ci]
            all_depths[start] = key_depths[ci]
            continue
        init_priors = (key_poses[ci], key_depths[ci], [key_focals[ci]])
        res = reconstruct_scene(imgs[clip], priors[clip], model_params,
                                model_cfg, scene_graph="complete",
                                niter=niter, lr=lr,
                                init_priors=init_priors, **kw)
        results.append(res)
        poses = res.get_im_poses()
        depths = res.get_depthmaps()
        take = len(clip) if clip[-1] == n - 1 else len(clip) - 1
        for k in range(take):
            all_poses[clip[k]] = poses[k]
            all_depths[clip[k]] = depths[k]
    return results, all_poses, all_depths
