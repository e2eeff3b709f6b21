"""Batched multi-scene alignment: vmap the whole Adam solve over videos.

SURVEY.md §7 step 10: per-video alignment vectorised over sequences. The
reference evaluates sequences one at a time per GPU (pose_test.py:98-112
shards the list over ranks); on TPU we can additionally vmap the jitted
solve so S same-shape scenes (e.g. the per-clip solves of a hierarchical
run, or an eval sweep bucket) share one compiled program and fill the chip.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from align3r_tpu.alignment.scene import (SceneConfig, SceneData,
                                         pairwise_pts_loss, pack_scene,
                                         resolve_fast_impl, solve_scan_body)
from align3r_tpu.alignment.schedules import schedule_array


def stack_scenes(datas: Sequence[SceneData]) -> SceneData:
    """Stack same-shape SceneData pytrees along a new scene axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *datas)


def stack_params(params_list: Sequence[Dict]) -> Dict:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


@functools.partial(jax.jit, static_argnames=("cfg", "loss_fn", "step0"))
def _batched_scan(params_s, masks_s, data_s, lrs, cfg: SceneConfig,
                  loss_fn=pairwise_pts_loss, step0: int = 0,
                  opt_state_s=None):
    """vmap of scene.solve_scan_body — the single shared Adam step body.
    step0/opt_state_s thread the global iteration count and the per-scene
    Adam moments across precision phases (step-gated loss terms like
    flow_forward's flow-loss epoch must see global steps)."""
    def solve_one(params, masks, data, opt_state):
        return solve_scan_body(params, masks, data, lrs, cfg, loss_fn,
                               step0, opt_state)

    st_axis = None if opt_state_s is None else 0
    return jax.vmap(solve_one, in_axes=(0, 0, 0, st_axis))(
        params_s, masks_s, data_s, opt_state_s)


def batched_alignment(params_list, masks_list, datas, cfg: SceneConfig,
                      lr: float = 0.01, niter: int = 300,
                      schedule: str = "cosine", lr_min: float = 1e-6,
                      loss_fn=pairwise_pts_loss, precision: str = "mixed"):
    """Solve S same-shape scenes in one vmapped program.

    precision as in scene.global_alignment_loop ('mixed' = bf16 then an
    fp32 polish continuing the same Adam moments and step index; on the
    fused path the polish runs the kernel on fp32-repacked observations,
    mirroring the single-scene loop). Returns (list of solved params
    dicts, losses (S, niter))."""
    if precision not in ("mixed", "bf16", "fp32"):
        raise ValueError(precision)
    fused = resolve_fast_impl(cfg) == "fused"
    if fused and precision != "fp32" and datas[0].packed_pred is None:
        # one-time packing so the vmapped fast phase uses the fused Pallas
        # edge kernel (its vmap batching rule adds a scene grid dimension)
        datas = [pack_scene(d, cfg) for d in datas]
    data_s = stack_scenes(datas)
    params_s = stack_params(params_list)
    masks_s = stack_params(masks_list)
    lrs = jnp.asarray(schedule_array(schedule, niter, lr, lr_min))
    k = int(niter * 0.8) if precision == "mixed" else \
        (niter if precision == "bf16" else 0)
    fast_cfg = dataclasses.replace(cfg, fast_solve=True)
    st_s = None
    if 0 < k:
        params_s, l1, st_s = _batched_scan(params_s, masks_s, data_s,
                                           lrs[:k], fast_cfg, loss_fn)
    if k < niter:
        if fused and 0 < k:
            # fp32 polish stays in-kernel on fp32-repacked observations
            data_s = stack_scenes([pack_scene(d, cfg, dtype=jnp.float32)
                                   for d in datas])
            polish_cfg = fast_cfg
        else:
            # precision='fp32' (or a pure-fp32 polish off the fused path)
            # must force the reference-exact fp32 loss even when the caller
            # passed a fast_solve=True cfg — mirror global_alignment_loop
            polish_cfg = dataclasses.replace(cfg, fast_solve=False)
        params_s, l2, _ = _batched_scan(params_s, masks_s, data_s, lrs[k:],
                                        polish_cfg, loss_fn, step0=k,
                                        opt_state_s=st_s)
    losses = l2 if k == 0 else (l1 if k == niter else
                                jnp.concatenate([l1, l2], axis=1))
    out_params = params_s
    S = len(datas)
    unstacked = [jax.tree.map(lambda x: x[i], out_params) for i in range(S)]
    return unstacked, np.asarray(losses)
