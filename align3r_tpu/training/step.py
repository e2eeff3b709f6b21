"""Sharded train/eval steps (pjit over a device mesh).

Behavioural reference: /root/reference/dust3r/training.py (train:92-248,
train_one_epoch:279-366, freeze list 291-298) and croco/utils/misc.py
(param groups 388-452, cosine LR w/ warmup 456-471).

TPU rework: DDP + NativeScaler AMP become a single jitted step — bf16
forward/backward with fp32 params and Adam state, gradients synced by XLA
collectives implied by the data-axis sharding. Loss scaling is unnecessary in
bf16. Encoder freezing (fine-tune recipe) is an optax mask.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from align3r_tpu.models.align3r import apply_align3r
from align3r_tpu.models.config import Align3RConfig
from align3r_tpu.training.losses import conf_regr3d_loss

# fine-tune recipe: only these top-level param groups receive gradients
# (reference training.py:291-298: downstream_head, dec_blocks, dec_norm,
#  dec_blocks2, dec_blocks_pc, patch_embed_point_cloud, zero_convs —
#  note decoder_embed stays frozen too: it is absent from the list)
TRAINABLE_KEYS = (
    "head1", "head2", "dec_blocks", "dec_blocks2", "dec_norm",
    "dec_blocks_pc", "patch_embed_point_cloud", "zero_convs",
)


def trainable_mask(params) -> Dict[str, Any]:
    return {k: jax.tree.map(lambda _, trainable=(k in TRAINABLE_KEYS): trainable, v)
            for k, v in params.items()}


def cast_frozen_kernels(params, dtype=jnp.bfloat16):
    """Store frozen groups' matmul/conv kernels in the compute dtype.

    Every compute path casts `kernel` leaves to the activation dtype at use
    (nn.dense/conv2d/conv_transpose2d, blocks' grouped dense, fused_site's
    wq/wk/wv/wo) — so under bf16 compute, storing the frozen encoder's
    kernels in bf16 is BITWISE identical in the forward while halving their
    HBM footprint (~600 MB for the 304M-param frozen ViT-L encoder; part
    of the bs=4 16 GB v5e feasibility budget, VERDICT r3 next #1). Biases
    and LayerNorm params stay fp32: LN applies them in fp32 (nn.py:46-53)
    and the fused sites apply biases in fp32 (fused_site.py) — casting
    those WOULD change numerics. The reference keeps fp32 masters for
    frozen params under AMP (training.py:291-298 requires_grad=False), so
    exported checkpoints upcast bf16 kernels back to fp32 — values are
    exactly what compute used (bf16->fp32 is exact)."""
    def cast(node):
        if isinstance(node, dict):
            return {k: (v.astype(dtype) if k == "kernel" else cast(v))
                    for k, v in node.items()}
        return node
    return {k: (v if k in TRAINABLE_KEYS else cast(v))
            for k, v in params.items()}


def make_lr_schedule(base_lr: float, min_lr: float, warmup_epochs: float,
                     total_epochs: float, steps_per_epoch: int):
    """Per-iter warmup + cosine decay (croco/utils/misc.py:456-471)."""
    warmup = int(warmup_epochs * steps_per_epoch)
    total = int(total_epochs * steps_per_epoch)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=base_lr, warmup_steps=max(warmup, 1),
        decay_steps=max(total, 2), end_value=min_lr)


def make_optimizer(params, lr_schedule, weight_decay: float = 0.05,
                   betas=(0.9, 0.95), max_grad_norm: float | None = None,
                   accum_iter: int = 1):
    """AdamW with encoder-freeze masking (training.py:155-160: AdamW
    betas (0.9, 0.95), weight decay on non-bias/norm params).

    accum_iter > 1 wraps the chain in optax.MultiSteps — the TPU equivalent
    of the reference's gradient accumulation (training.py:320-339,
    accum_iter=4 in train.sh)."""
    def wd_mask(p):
        # no weight decay for biases / norm scales (misc.py:416-421)
        return jax.tree.map(lambda x: getattr(x, "ndim", 0) > 1, p)

    t_mask = trainable_mask(params)
    f_mask = jax.tree.map(lambda m: not m, t_mask)
    inner_chain = []
    if max_grad_norm:
        inner_chain.append(optax.clip_by_global_norm(max_grad_norm))
    inner_chain.append(optax.adamw(lr_schedule, b1=betas[0], b2=betas[1],
                                   weight_decay=weight_decay, mask=wd_mask))
    inner = optax.chain(*inner_chain)
    if accum_iter > 1:
        # MultiSteps INSIDE the trainable mask: its grad accumulator then
        # exists only for trainable leaves. Outside the mask it would
        # allocate a full-size acc_grads tree — +2.4 GB instead of +1.2 GB
        # for ViT-L with the 304M-param encoder frozen (r3 verdict #1; the
        # bs=4 OOM margin on a 16 GB v5e)
        inner = optax.MultiSteps(inner, every_k_schedule=accum_iter)
    # optimizer state is only allocated for trainable params; zero updates
    # for frozen params first (optax.masked passes masked-out leaves
    # through unchanged, so without this frozen grads would be applied)
    return optax.chain(optax.masked(optax.set_to_zero(), f_mask),
                       optax.masked(inner, t_mask))


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(params, tx) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def freeze_params(params) -> Dict[str, Any]:
    """stop_gradient on every non-TRAINABLE param group.

    This is what lets XLA PRUNE the frozen-encoder backward entirely: no
    trainable group feeds the encoder, so with its weights stop_gradient'd
    the encoder output has zero dependence on differentiated inputs and
    the whole 24-layer backward subtree is dead code (the reference gets
    the same effect from requires_grad=False, training.py:291-298).
    Frozen groups still receive literal-zero gradient arrays, so the optax
    masked set_to_zero chain and grad_norm stay well-defined (grad_norm
    now counts only trainable gradients, as it should)."""
    return {k: (v if k in TRAINABLE_KEYS
                else jax.tree.map(jax.lax.stop_gradient, v))
            for k, v in params.items()}


def loss_fn(params, batch, cfg: Align3RConfig, alpha: float = 0.2,
            dtype=jnp.bfloat16, remat: bool | str = True, attn_impl: str = "auto",
            freeze: bool = True, head_dtype=jnp.float32):
    """batch: {'view1': {...gt+inputs...}, 'view2': {...}} with per-view keys
    img, pred_depth (inputs) and pts3d, camera_pose, valid_mask (targets).
    attn_impl="fused" routes the forward through the Pallas site kernels
    (custom-VJP: XLA-recompute backward) — TPU-only speedup. freeze=True
    applies the fine-tune freeze list inside the differentiated function
    (see freeze_params). head_dtype=fp32 keeps the reference AMP boundary
    (heads out of autocast, training.py AMP + model.py:252-254); bf16 is
    the bandwidth lever on the HBM-bound step (roofline: 86% of bw SOL) —
    final regression conv + postprocess stay fp32 either way."""
    v1, v2 = batch["view1"], batch["view2"]
    if freeze:
        params = freeze_params(params)
    pred1, pred2 = apply_align3r(params, v1, v2, cfg, dtype=dtype,
                                 attn_impl=attn_impl, remat=remat,
                                 head_dtype=head_dtype)
    loss, details = conf_regr3d_loss(v1, v2, pred1, pred2, alpha=alpha)
    return loss, details


def make_train_step(tx, cfg: Align3RConfig, alpha: float = 0.2,
                    dtype=jnp.bfloat16, remat: bool | str = True,
                    attn_impl: str = "auto", freeze: bool = True,
                    head_dtype=jnp.float32):
    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        (loss, details), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, cfg, alpha, dtype, remat, attn_impl,
            freeze, head_dtype)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(details, loss=loss,
                       grad_norm=optax.global_norm(grads))
        return TrainState(new_params, new_opt, state.step + 1), metrics
    return train_step


def make_eval_step(cfg: Align3RConfig, dtype=jnp.bfloat16):
    from align3r_tpu.training.losses import regr3d_scale_shift_inv_loss

    def eval_step(params, batch):
        v1, v2 = batch["view1"], batch["view2"]
        pred1, pred2 = apply_align3r(params, v1, v2, cfg, dtype=dtype)
        return regr3d_scale_shift_inv_loss(v1, v2, pred1, pred2, gt_scale=True)
    return eval_step
