"""Batched multi-scene alignment: vmap the whole Adam solve over videos.

SURVEY.md §7 step 10: per-video alignment vectorised over sequences. The
reference evaluates sequences one at a time per GPU (pose_test.py:98-112
shards the list over ranks); on TPU we can additionally vmap the jitted
solve so S same-shape scenes (e.g. the per-clip solves of a hierarchical
run, or an eval sweep bucket) share one compiled program and fill the chip.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from align3r_tpu.alignment.scene import SceneConfig, SceneData, pairwise_pts_loss
from align3r_tpu.alignment.schedules import schedule_array


def stack_scenes(datas: Sequence[SceneData]) -> SceneData:
    """Stack same-shape SceneData pytrees along a new scene axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *datas)


def stack_params(params_list: Sequence[Dict]) -> Dict:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


@functools.partial(jax.jit, static_argnames=("cfg", "loss_fn"))
def _batched_scan(params_s, masks_s, data_s, lrs, cfg: SceneConfig,
                  loss_fn=pairwise_pts_loss):
    adam = optax.scale_by_adam(b1=0.9, b2=0.9)

    def solve_one(params, masks, data):
        st = adam.init(params)

        def step(carry, lr_i):
            p, st = carry
            lr, i = lr_i
            loss, grads = jax.value_and_grad(loss_fn)(p, data, cfg, i)
            grads = jax.tree.map(lambda g, m: g * m, grads, masks)
            updates, st2 = adam.update(grads, st)
            updates = jax.tree.map(lambda u: -lr * u, updates)
            return (optax.apply_updates(p, updates), st2), loss

        steps = jnp.arange(lrs.shape[0])
        (p, _), losses = jax.lax.scan(step, (params, st), (lrs, steps))
        return p, losses

    return jax.vmap(solve_one, in_axes=(0, 0, 0))(params_s, masks_s, data_s)


def batched_alignment(params_list, masks_list, datas, cfg: SceneConfig,
                      lr: float = 0.01, niter: int = 300,
                      schedule: str = "cosine", lr_min: float = 1e-6,
                      loss_fn=pairwise_pts_loss, precision: str = "mixed"):
    """Solve S same-shape scenes in one vmapped program.

    precision as in scene.global_alignment_loop ('mixed' = bf16 then fp32).
    Returns (list of solved params dicts, losses (S, niter))."""
    import dataclasses
    from align3r_tpu.alignment.scene import pack_scene, resolve_fast_impl
    if (resolve_fast_impl(cfg) == "fused" and precision != "fp32"
            and datas[0].packed_pred is None):
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
    if 0 < k:
        params_s, l1 = _batched_scan(params_s, masks_s, data_s, lrs[:k],
                                     fast_cfg, loss_fn)
    if k < niter:
        params_s, l2 = _batched_scan(params_s, masks_s, data_s, lrs[k:],
                                     cfg, loss_fn)
    losses = l2 if k == 0 else (l1 if k == niter else
                                jnp.concatenate([l1, l2], axis=1))
    out_params = params_s
    S = len(datas)
    unstacked = [jax.tree.map(lambda x: x[i], out_params) for i in range(S)]
    return unstacked, np.asarray(losses)
