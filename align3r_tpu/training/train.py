"""Training driver: epochs, eval, checkpointing, logging.

Behavioural reference: /root/reference/dust3r/training.py (train:92-248,
train_one_epoch:279-366, test_one_epoch:369-405) and croco/utils/misc.py
(save/load auto-resume:292-329, per-iter LR:456-471).

TPU rework: DDP -> data-parallel pjit over a Mesh (gradient psum inserted by
XLA); AMP/NativeScaler -> bf16 forward with fp32 params (no loss scaling);
checkpoints are orbax-style pytree dirs with torch-compatible export;
logging is JSON-lines + optional TensorBoard; `--profile` wraps steps in a
jax.profiler trace (replacing the reference's CUDA max-mem MetricLogger).
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Optional

import numpy as np


@dataclasses.dataclass
class TrainArgs:
    model: str = "Align3RConfig()"            # config expression or ckpt path
    pretrained: Optional[str] = None          # torch .pth to start from
    train_dataset: str = ""
    test_dataset: str = ""
    seed: int = 0
    batch_size: int = 2
    accum_iter: int = 4
    epochs: int = 50
    start_epoch: int = 0
    lr: float = 5e-5
    min_lr: float = 1e-6
    warmup_epochs: int = 5
    weight_decay: float = 0.05
    alpha: float = 0.2                        # ConfLoss alpha (train.sh:6)
    num_workers: int = 8
    output_dir: str = "./output"
    eval_freq: int = 1
    save_freq: int = 1
    keep_freq: int = 5
    print_freq: int = 20
    n_data: Optional[int] = None              # data-parallel mesh size
    ckpt_backend: str = "pickle"              # 'pickle' | 'orbax' (async)
    cast_frozen: bool = True                  # store frozen kernels in bf16
    zero1: bool = False                       # shard optimizer state over
    #                                           the 'data' mesh axis (ZeRO-1)
    remat: str = "full"                       # 'none' | 'full' | 'dots'
    #                                           (models.align3r._ckpt)
    head_bf16: bool = False                   # bf16 DPT conv pyramid in the
    #                                           train forward (fp32 final
    #                                           conv+postprocess); default
    #                                           keeps the reference AMP
    #                                           boundary. Bandwidth lever:
    #                                           the step runs at 86% of the
    #                                           HBM roofline (r5).
    profile: bool = False
    max_steps_per_epoch: Optional[int] = None  # for smoke tests


_ORBAX_CKPTR = None
# meta.json for async orbax saves is deferred until the payload COMMITS:
# writing it eagerly would leave meta.json newer than (or orphaned from) an
# interrupted background write. Pending metas are promoted at the next
# wait point (the following save, or wait_for_checkpoints at exit).
_PENDING_META: dict = {}


def _orbax():
    """One process-wide AsyncCheckpointer (orbax manages a background
    thread; serialising saves through one instance is the supported
    pattern)."""
    global _ORBAX_CKPTR
    if _ORBAX_CKPTR is None:
        import orbax.checkpoint as ocp
        _ORBAX_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ORBAX_CKPTR


def _promote_pending_meta(assume_finished: bool = False):
    """Write meta.json for every save whose orbax payload has COMMITTED.

    Safe to call at ANY time on local filesystems: orbax commits local
    saves by atomically renaming its tmp dir to the final `orbax/` dir
    (AtomicRenameTemporaryPath is the default for all non-GCS paths,
    orbax _src/path/atomicity_defaults.py), so the final dir's existence
    IS the commit signal — the training loop calls this periodically so a
    committed checkpoint becomes resumable seconds after the background
    write lands, not a whole epoch later at the next save. In-flight saves
    stay pending. assume_finished=True (call only after
    wait_until_finished) means a still-missing payload is a FAILED save:
    warn loudly and drop the record rather than silently discarding it."""
    for path, meta in list(_PENDING_META.items()):
        if os.path.isdir(os.path.join(path, "orbax")):
            with open(os.path.join(path, "meta.json"), "w") as f:
                json.dump(meta, f)
            del _PENDING_META[path]
        elif assume_finished:
            import warnings
            warnings.warn(f"orbax save to {path} finished without a "
                          f"committed payload — checkpoint unusable, "
                          f"meta.json not written")
            del _PENDING_META[path]


def save_checkpoint(path, state, epoch, best_so_far=None,
                    backend: str = "pickle"):
    """backend='pickle': host-gathered numpy pickle (single-host, simple).
    backend='orbax': TPU-native ASYNC save — the device arrays are handed
    to orbax's background thread and training continues during the write;
    on a multi-host mesh each process writes only its addressable shards
    (no host gather). Resume reads either format (load_checkpoint)."""
    import jax
    os.makedirs(path, exist_ok=True)
    if backend == "orbax":
        ck = _orbax()
        ck.wait_until_finished()   # at most one in-flight save
        _promote_pending_meta(assume_finished=True)
        ck.save(os.path.abspath(os.path.join(path, "orbax")),
                {"params": state.params, "opt_state": state.opt_state},
                force=True)
        _PENDING_META[path] = {"step": int(state.step), "epoch": epoch,
                               "best_so_far": best_so_far}
        return
    import pickle
    flat = jax.tree.map(np.asarray, state.params)
    opt = jax.tree.map(np.asarray, state.opt_state)
    with open(os.path.join(path, "state.pkl"), "wb") as f:
        pickle.dump({"params": flat, "opt_state": opt,
                     "step": int(state.step), "epoch": epoch,
                     "best_so_far": best_so_far}, f)


def load_checkpoint(path, target_state=None):
    """Auto-detects the on-disk format. For orbax checkpoints pass the
    freshly-built TrainState as target_state so optax's NamedTuple
    structure is restored exactly (orbax otherwise returns plain dicts)."""
    import json as _json
    opath = os.path.join(path, "orbax")
    # promote THIS process's own pending metas first, else a load right
    # after a save would miss a fully-committed orbax payload whose
    # deferred meta.json hasn't landed yet and fall through to pickle
    if _ORBAX_CKPTR is not None:
        _ORBAX_CKPTR.wait_until_finished()
        _promote_pending_meta(assume_finished=True)
    # require BOTH the committed payload and its meta — a crash between the
    # payload commit and the deferred meta write leaves an unusable save
    if os.path.isdir(opath) and os.path.exists(os.path.join(path,
                                                            "meta.json")):
        ck = _orbax()
        ck.wait_until_finished()
        target = (None if target_state is None else
                  {"params": target_state.params,
                   "opt_state": target_state.opt_state})
        import orbax.checkpoint as ocp
        restored = ck.restore(
            os.path.abspath(opath),
            args=None if target is None else ocp.args.StandardRestore(target))
        with open(os.path.join(path, "meta.json")) as f:
            meta = _json.load(f)
        return {"params": restored["params"],
                "opt_state": restored["opt_state"], **meta}
    import pickle
    with open(os.path.join(path, "state.pkl"), "rb") as f:
        return pickle.load(f)


def wait_for_checkpoints():
    """Block until any in-flight async orbax save has committed (call
    before process exit so the last checkpoint is durable), then write
    the deferred meta.json for committed saves."""
    if _ORBAX_CKPTR is not None:
        _ORBAX_CKPTR.wait_until_finished()
        _promote_pending_meta(assume_finished=True)


def export_torch_checkpoint(path, params, cfg):
    """Torch-compatible .pth export (reference checkpoint format).

    Upcasts any bf16 leaves (cast_frozen_kernels storage) back to fp32:
    bf16->fp32 is exact, so the exported values are precisely what compute
    used, and the .pth stays in the reference's fp32 master format
    (numpy has no torch-loadable bfloat16 anyway)."""
    import jax
    import torch
    from align3r_tpu.models.convert import export_state_dict

    def upcast(x):
        x = np.asarray(x)
        return x if x.dtype == np.float32 else np.asarray(x, np.float32)

    params = jax.tree.map(upcast, params)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_state_dict(params, cfg).items()}
    torch.save({"model": sd}, path)


def train(args: TrainArgs):
    import jax
    import jax.numpy as jnp

    from align3r_tpu.models.config import Align3RConfig, VIT_L_512, TINY_TEST, parse_model_string
    from align3r_tpu.models.align3r import init_align3r
    from align3r_tpu.parallel.mesh import (
        make_mesh, data_sharding, replicated, maybe_init_distributed,
        zero1_opt_shardings)
    from align3r_tpu.training.data import get_data_loader
    from align3r_tpu.training.step import (
        make_lr_schedule, make_optimizer, make_train_step, make_eval_step,
        cast_frozen_kernels, TrainState)

    # multi-host hook (no-op unless ALIGN3R_DIST/ALIGN3R_COORDINATOR set;
    # reference croco/utils/misc.py:222-243 init_distributed_mode)
    maybe_init_distributed()

    os.makedirs(args.output_dir, exist_ok=True)
    log_path = os.path.join(args.output_dir, "log.txt")

    # ---- model
    if args.model.startswith("AsymmetricCroCo3DStereo"):
        cfg = parse_model_string(args.model)
    else:
        cfg = eval(args.model, {"__builtins__": {}},
                   {"Align3RConfig": Align3RConfig, "VIT_L_512": VIT_L_512,
                    "TINY_TEST": TINY_TEST})
    params = init_align3r(jax.random.PRNGKey(args.seed), cfg)
    if args.pretrained:
        from align3r_tpu.models.convert import load_torch_checkpoint
        params, cfg = load_torch_checkpoint(args.pretrained, cfg)
    if args.cast_frozen:
        # bf16 storage for frozen kernels — bitwise-identical forward (the
        # compute paths cast kernels to the activation dtype at use anyway),
        # ~600 MB HBM back on ViT-L (see step.cast_frozen_kernels)
        params = cast_frozen_kernels(params)

    # ---- data
    train_loader = get_data_loader(args.train_dataset, args.batch_size,
                                   num_workers=args.num_workers)
    test_loader = (get_data_loader(args.test_dataset, args.batch_size,
                                   num_workers=args.num_workers, shuffle=False)
                   if args.test_dataset else None)
    steps_per_epoch = max(len(train_loader), 1)

    # ---- optimizer + sharded step
    sched = make_lr_schedule(args.lr, args.min_lr, args.warmup_epochs,
                             args.epochs, steps_per_epoch)
    tx = make_optimizer(params, sched, weight_decay=args.weight_decay,
                        accum_iter=args.accum_iter)

    mesh = make_mesh(n_data=args.n_data)
    repl, dsh = replicated(mesh), data_sharding(mesh)
    if args.zero1:
        # params replicated, optimizer state 1/N per chip (ZeRO-1): the
        # elementwise update runs on each chip's slice; XLA all-gathers
        # the updates once where they meet the replicated params. Shardings
        # come from eval_shape so the state can be BORN sharded below —
        # init/resume never materialise a replicated copy of the moments
        # on one device (the transient would cost exactly the HBM ZeRO-1
        # exists to save).
        state_sh = TrainState(
            params=repl,
            opt_state=zero1_opt_shardings(jax.eval_shape(tx.init, params),
                                          mesh),
            step=repl)
        opt_sh = state_sh.opt_state
    else:
        state_sh = repl
        opt_sh = repl
    params = jax.device_put(params, repl)
    state = TrainState(params=params,
                       opt_state=jax.jit(tx.init, out_shardings=opt_sh)(params),
                       step=jax.device_put(jnp.zeros((), jnp.int32), repl))

    best_so_far = None
    last = os.path.join(args.output_dir, "checkpoint-last")
    if os.path.exists(os.path.join(last, "state.pkl")) \
            or (os.path.isdir(os.path.join(last, "orbax"))
                and os.path.exists(os.path.join(last, "meta.json"))):  # auto-resume
        # orbax restores INTO target_state's shardings (no replicated
        # transient); pickle leaves stay host numpy until the device_put
        ck = load_checkpoint(last, target_state=state)
        rparams = ck["params"]
        if args.cast_frozen:
            # idempotent; also covers resuming an fp32-era pickle checkpoint
            rparams = cast_frozen_kernels(rparams)
        state = TrainState(params=rparams, opt_state=ck["opt_state"],
                           step=jnp.asarray(ck["step"], jnp.int32))
        state = jax.device_put(state, state_sh)
        args.start_epoch = ck["epoch"] + 1
        best_so_far = ck.get("best_so_far")
        print(f"resumed from {last} at epoch {args.start_epoch}")
    import jax.numpy as _jnp
    train_step = jax.jit(make_train_step(
                             tx, cfg, alpha=args.alpha, remat=args.remat,
                             head_dtype=(_jnp.bfloat16 if args.head_bf16
                                         else _jnp.float32)),
                         in_shardings=(state_sh, dsh),
                         out_shardings=(state_sh, repl),
                         donate_argnums=(0,))
    eval_step = jax.jit(make_eval_step(cfg),
                        in_shardings=(repl, dsh), out_shardings=repl)

    def put_batch(batch):
        keep = ("img", "pred_depth", "pts3d", "camera_pose", "valid_mask")
        batch = {vn: {k: v for k, v in bv.items() if k in keep}
                 for vn, bv in batch.items()}
        return jax.tree.map(lambda x: jax.device_put(np.asarray(x), dsh), batch)

    writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter
        writer = SummaryWriter(log_dir=args.output_dir)
    except Exception:
        pass

    for epoch in range(args.start_epoch, args.epochs):
        train_loader.set_epoch(epoch)
        t0 = time.time()
        losses = []
        ctx = (jax.profiler.trace(os.path.join(args.output_dir, "profile"))
               if args.profile and epoch == args.start_epoch else None)
        if ctx:
            ctx.__enter__()
        for it, batch in enumerate(train_loader):
            if args.max_steps_per_epoch and it >= args.max_steps_per_epoch:
                break
            state, metrics = train_step(state, put_batch(batch))
            _promote_pending_meta()  # non-blocking: land meta.json as soon
            #                          as the async orbax payload commits
            if it % args.print_freq == 0:
                loss = float(metrics["loss"])
                assert np.isfinite(loss), f"loss is {loss}, stopping training"
                losses.append(loss)
                print(f"epoch {epoch} it {it}/{steps_per_epoch} "
                      f"loss {loss:.4f} lr {float(sched(state.step)):.2e}")
                if writer:
                    writer.add_scalar("train/loss", loss, int(state.step))
        if ctx:
            ctx.__exit__(None, None, None)

        test_loss = None
        if test_loader is not None and (epoch + 1) % args.eval_freq == 0:
            test_loader.set_epoch(0)
            vals = []
            for it, batch in enumerate(test_loader):
                if args.max_steps_per_epoch and it >= args.max_steps_per_epoch:
                    break
                vals.append(float(eval_step(state.params, put_batch(batch))))
            test_loss = float(np.mean(vals)) if vals else None
            if test_loss is not None and (best_so_far is None or test_loss < best_so_far):
                best_so_far = test_loss
                save_checkpoint(os.path.join(args.output_dir, "checkpoint-best"),
                                state, epoch, best_so_far,
                                backend=args.ckpt_backend)

        with open(log_path, "a") as f:
            f.write(json.dumps({"epoch": epoch,
                                "train_loss": float(np.mean(losses)) if losses else None,
                                "test_loss": test_loss,
                                "time_s": time.time() - t0}) + "\n")
        if (epoch + 1) % args.save_freq == 0 or epoch + 1 == args.epochs:
            save_checkpoint(last, state, epoch, best_so_far,
                            backend=args.ckpt_backend)
        if (epoch + 1) % args.keep_freq == 0:
            save_checkpoint(os.path.join(args.output_dir,
                                         f"checkpoint-{epoch + 1}"),
                            state, epoch, best_so_far,
                            backend=args.ckpt_backend)

    wait_for_checkpoints()
    # final torch-compat export (reference training.py:251-262)
    export_torch_checkpoint(os.path.join(args.output_dir, "checkpoint-final.pth"),
                            jax.tree.map(np.asarray, state.params), cfg)
    return state
