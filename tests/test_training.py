import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from align3r_tpu.models.config import Align3RConfig
from align3r_tpu.models.align3r import init_align3r
from align3r_tpu.training.step import (
    make_optimizer, make_lr_schedule, make_train_step, make_eval_step,
    create_train_state, trainable_mask, cast_frozen_kernels, loss_fn,
    TrainState, TRAINABLE_KEYS)
from align3r_tpu.training.losses import conf_regr3d_loss, regr3d_scale_shift_inv_loss
from align3r_tpu.parallel.mesh import make_mesh, data_sharding, replicated

CFG = Align3RConfig(img_size=(32, 32), enc_embed_dim=64, enc_depth=2,
                    enc_num_heads=4, dec_embed_dim=48, dec_depth=12,
                    dec_num_heads=4)


def make_batch(B=2, seed=0):
    rng = np.random.default_rng(seed)
    H, W = CFG.img_size
    def view(s):
        return {
            "img": jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.float32),
            "pred_depth": jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.float32),
            "pts3d": jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.float32),
            "camera_pose": jnp.broadcast_to(jnp.eye(4), (B, 4, 4)),
            "valid_mask": jnp.asarray(rng.uniform(0, 1, (B, H, W)) > 0.1),
        }
    return {"view1": view(0), "view2": view(1)}


def test_conf_loss_basics():
    B, H, W = 2, 8, 8
    rng = np.random.default_rng(0)
    gt = lambda: {"pts3d": jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.float32),
                  "camera_pose": jnp.broadcast_to(jnp.eye(4), (B, 4, 4)),
                  "valid_mask": jnp.ones((B, H, W), bool)}
    gt1, gt2 = gt(), gt()
    # perfect prediction, conf=1 -> loss = -2*alpha*log(1) + 0 = 0
    pred1 = {"pts3d": gt1["pts3d"], "conf": jnp.ones((B, H, W))}
    pred2 = {"pts3d_in_other_view": gt2["pts3d"], "conf": jnp.ones((B, H, W))}
    # note: normalization scales both identically so distance stays 0
    loss, details = conf_regr3d_loss(gt1, gt2, pred1, pred2, alpha=0.2)
    assert float(loss) == pytest.approx(0.0, abs=1e-5)
    # worse prediction -> larger loss
    pred1b = {"pts3d": gt1["pts3d"] + 0.5, "conf": jnp.ones((B, H, W))}
    loss_b, _ = conf_regr3d_loss(gt1, gt2, pred1b, pred2, alpha=0.2)
    assert float(loss_b) > float(loss)


def test_scale_shift_inv_loss_invariance():
    B, H, W = 1, 8, 8
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.standard_normal((B, H, W, 3)) + [0, 0, 4], jnp.float32)
    gt1 = {"pts3d": pts, "camera_pose": jnp.broadcast_to(jnp.eye(4), (B, 4, 4)),
           "valid_mask": jnp.ones((B, H, W), bool)}
    gt2 = {"pts3d": pts + 0.1, "camera_pose": gt1["camera_pose"],
           "valid_mask": gt1["valid_mask"]}
    pred1 = {"pts3d": pts, "conf": jnp.ones((B, H, W))}
    pred2 = {"pts3d_in_other_view": gt2["pts3d"], "conf": jnp.ones((B, H, W))}
    base = float(regr3d_scale_shift_inv_loss(gt1, gt2, pred1, pred2))
    # scaling predictions + shifting depth must not change the loss
    s = 2.7
    shift = jnp.array([0, 0, 1.3], jnp.float32)
    pred1s = {"pts3d": pts * s + shift, "conf": pred1["conf"]}
    pred2s = {"pts3d_in_other_view": gt2["pts3d"] * s + shift, "conf": pred2["conf"]}
    scaled = float(regr3d_scale_shift_inv_loss(gt1, gt2, pred1s, pred2s))
    assert scaled == pytest.approx(base, abs=2e-3)


def test_train_step_decreases_loss_and_freezes_encoder():
    params = init_align3r(jax.random.PRNGKey(0), CFG)
    sched = make_lr_schedule(1e-3, 1e-5, 0, 10, 10)
    tx = make_optimizer(params, sched)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(tx, CFG, dtype=jnp.float32, remat=False))
    batch = make_batch()
    enc_before = np.asarray(
        jax.tree.leaves(params["enc_blocks"])[0]).copy()
    emb_before = np.asarray(params["decoder_embed"]["kernel"]).copy()
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    # encoder and decoder_embed frozen (training.py:291-298 recipe)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(state.params["enc_blocks"])[0]), enc_before)
    np.testing.assert_array_equal(
        np.asarray(state.params["decoder_embed"]["kernel"]), emb_before)
    # heads did move
    assert not np.allclose(np.asarray(state.params["head1"]["head_conv3"]["kernel"]),
                           np.asarray(params["head1"]["head_conv3"]["kernel"]))


def test_opt_state_allocates_trainable_only():
    """The fine-tune memory contract (r3 verdict #1): Adam moments and the
    MultiSteps grad accumulator must exist ONLY for trainable leaves — a
    regression here silently costs ~2.4 GB on a ViT-L fine-tune and the
    bs=4 margin on a 16 GB v5e."""
    params = init_align3r(jax.random.PRNGKey(0), CFG)
    sched = make_lr_schedule(1e-3, 1e-5, 0, 10, 10)
    tx = make_optimizer(params, sched, accum_iter=4, max_grad_norm=1.0)
    opt_state = tx.init(params)

    n_params = sum(x.size for x in jax.tree.leaves(params))
    n_trainable = sum(
        x.size for k, v in params.items() if k in TRAINABLE_KEYS
        for x in jax.tree.leaves(v))
    assert n_trainable < n_params  # the freeze list actually bites
    # opt_state arrays = mu + nu + acc_grads (3x trainable) + scalar counts
    n_state = sum(x.size for x in jax.tree.leaves(opt_state)
                  if hasattr(x, "size"))
    assert n_state <= 3 * n_trainable + 16, (n_state, n_trainable)


def test_cast_frozen_kernels_bitwise_and_dtypes():
    """bf16 storage for frozen kernels (r4, the bs=4 memory budget): the
    dtype contract AND the bitwise-forward claim. Every compute path casts
    kernel leaves to the activation dtype at use, so storing frozen kernels
    in bf16 must not change a single bit of the bf16-compute loss — this
    test gates any future use site that applies a frozen kernel at fp32."""
    params = init_align3r(jax.random.PRNGKey(3), CFG)
    cast = cast_frozen_kernels(params)

    # dtype contract: frozen kernels bf16; frozen biases/LN fp32 (applied in
    # fp32 at use — casting them WOULD change numerics); trainable untouched
    for k, v in cast.items():
        for path, leaf in jax.tree_util.tree_flatten_with_path(v)[0]:
            name = path[-1].key if hasattr(path[-1], "key") else None
            if k in TRAINABLE_KEYS:
                assert leaf.dtype == jnp.float32, (k, path)
            elif name == "kernel":
                assert leaf.dtype == jnp.bfloat16, (k, path)
            else:
                assert leaf.dtype == jnp.float32, (k, path)

    batch = make_batch(seed=7)
    l0, _ = jax.jit(lambda p: loss_fn(p, batch, CFG, dtype=jnp.bfloat16))(params)
    l1, _ = jax.jit(lambda p: loss_fn(p, batch, CFG, dtype=jnp.bfloat16))(cast)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))

    # train step runs on cast params; trainable updates stay fp32
    tx = make_optimizer(cast, make_lr_schedule(1e-3, 1e-5, 0, 10, 10))
    state = create_train_state(cast, tx)
    state, metrics = jax.jit(make_train_step(tx, CFG, dtype=jnp.float32))(
        state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert state.params["head1"]["head_conv3"]["kernel"].dtype == jnp.float32
    assert jax.tree.leaves(state.params["enc_blocks"])[0].dtype in (
        jnp.bfloat16, jnp.float32)


def test_export_upcasts_bf16_storage(tmp_path):
    """export_torch_checkpoint must upcast bf16-stored leaves to fp32
    exactly (bf16->fp32 is lossless) so the .pth stays reference-format."""
    import torch
    from align3r_tpu.training.train import export_torch_checkpoint
    params = cast_frozen_kernels(init_align3r(jax.random.PRNGKey(4), CFG))
    path = tmp_path / "ck.pth"
    export_torch_checkpoint(str(path), jax.tree.map(np.asarray, params), CFG)
    sd = torch.load(str(path), weights_only=False)["model"]
    assert all(v.dtype == torch.float32 for v in sd.values())
    # a frozen kernel round-trips bit-exact: export = stored bf16 -> fp32
    want = np.asarray(params["enc_blocks"]["attn"]["qkv"]["kernel"][0],
                      np.float32).T
    np.testing.assert_array_equal(sd["enc_blocks.0.attn.qkv.weight"].numpy(),
                                  want)


def test_eval_step_runs():
    params = init_align3r(jax.random.PRNGKey(0), CFG)
    ev = jax.jit(make_eval_step(CFG, dtype=jnp.float32))
    loss = ev(params, make_batch(seed=5))
    assert np.isfinite(float(loss))


def test_remat_modes_identical_grads():
    """remat=False / True ('full') / 'dots' change WHAT the backward saves,
    never the math: loss and gradients must agree to fp32 roundoff."""
    params = init_align3r(jax.random.PRNGKey(0), CFG)
    batch = make_batch(B=2)
    out = {}
    for mode in (False, True, "dots"):
        g = jax.jit(jax.value_and_grad(
            lambda p: loss_fn(p, batch, CFG, dtype=jnp.float32,
                              remat=mode)[0]))(params)
        out[mode] = (float(g[0]), jax.tree.map(np.asarray, g[1]))
    for mode in (True, "dots"):
        assert out[mode][0] == pytest.approx(out[False][0], rel=1e-6)
        for a, b in zip(jax.tree.leaves(out[False][1]),
                        jax.tree.leaves(out[mode][1])):
            np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)
    with pytest.raises(ValueError):
        loss_fn(params, batch, CFG, dtype=jnp.float32, remat="bogus")


def test_zero1_opt_state_sharding_matches_replicated():
    """ZeRO-1 (opt state 1/N per chip over the 'data' axis) must produce
    the same training trajectory as fully-replicated state — the update is
    elementwise over the sharded leaves, so sharding changes layout, not
    math — while actually slicing the big moment/accumulator leaves."""
    from align3r_tpu.parallel.mesh import zero1_opt_shardings
    jax.clear_caches()
    mesh = make_mesh(n_data=8)
    repl, dsh = replicated(mesh), data_sharding(mesh)
    params = init_align3r(jax.random.PRNGKey(0), CFG)
    batch = jax.tree.map(lambda x: jax.device_put(x, dsh), make_batch(B=8))

    final = {}
    for z in (False, True):
        tx = make_optimizer(params, make_lr_schedule(1e-3, 1e-5, 0, 10, 10),
                            accum_iter=2)
        state = create_train_state(params, tx)
        st_sh = (TrainState(params=jax.tree.map(lambda _: repl, state.params),
                            opt_state=zero1_opt_shardings(state.opt_state,
                                                          mesh),
                            step=repl) if z else repl)
        state = jax.device_put(state, st_sh)
        step = jax.jit(make_train_step(tx, CFG, dtype=jnp.float32),
                       in_shardings=(st_sh, dsh), out_shardings=(st_sh, repl))
        for _ in range(3):
            state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        if z:  # the big leaves really are sharded 1/8 per device
            sharded = [x for x in jax.tree.leaves(state.opt_state)
                       if hasattr(x, "sharding")
                       and not x.sharding.is_fully_replicated]
            assert sharded, "zero1 sharded nothing"
            frac = (sharded[0].addressable_shards[0].data.size
                    / sharded[0].size)
            assert frac == pytest.approx(1 / 8)
        final[z] = jax.tree.map(np.asarray, state.params)

    for a, b in zip(jax.tree.leaves(final[False]), jax.tree.leaves(final[True])):
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-6)


def test_train_step_sharded_8dev():
    """Data-parallel train step over the 8-device CPU mesh."""
    # after a ~2h full-suite run the accumulated executable cache has twice
    # segfaulted the CPU backend during this test's large sharded compile;
    # dropping caches first keeps the full-suite run stable (the test has
    # always passed in isolation)
    jax.clear_caches()
    mesh = make_mesh(n_data=8)
    params = init_align3r(jax.random.PRNGKey(0), CFG)
    tx = make_optimizer(params, make_lr_schedule(1e-3, 1e-5, 0, 10, 10))
    state = create_train_state(params, tx)
    batch = make_batch(B=8)
    repl, dsh = replicated(mesh), data_sharding(mesh)
    state = jax.device_put(state, repl)
    batch = jax.tree.map(lambda x: jax.device_put(x, dsh), batch)
    step = jax.jit(make_train_step(tx, CFG, dtype=jnp.float32, remat=False),
                   in_shardings=(repl, dsh), out_shardings=(repl, repl))
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # gradient sync: sharded result equals single-device result
    step1 = jax.jit(make_train_step(tx, CFG, dtype=jnp.float32, remat=False))
    state1, metrics1 = step1(create_train_state(params, tx),
                             jax.tree.map(lambda x: np.asarray(x), batch))
    np.testing.assert_allclose(float(metrics["loss"]), float(metrics1["loss"]),
                               rtol=1e-4)


def test_frozen_groups_get_literal_zero_grads():
    """freeze_params stop_gradients the frozen groups INSIDE the
    differentiated function, so XLA prunes the encoder backward instead of
    computing-then-zeroing it (code-review r3 finding); the returned grads
    for frozen groups are literal zeros and grad_norm counts only
    trainable gradients."""
    from align3r_tpu.training.step import loss_fn, TRAINABLE_KEYS
    params = init_align3r(jax.random.PRNGKey(0), CFG)
    batch = make_batch()
    grads = jax.grad(lambda p: loss_fn(p, batch, CFG, dtype=jnp.float32,
                                       remat=False)[0])(params)
    for k, g in grads.items():
        leaves = [np.asarray(x) for x in jax.tree.leaves(g)]
        if k in ("head1", "head2", "dec_blocks", "dec_blocks2", "dec_norm",
                 "zero_convs"):
            # dec_blocks_pc / patch_embed_point_cloud legitimately get zero
            # grads at init: the zero-init zero-conv kernels block gradient
            # flow INTO the pc branch until the convs move
            assert any(np.abs(x).max() > 0 for x in leaves), k
        elif k not in TRAINABLE_KEYS:
            assert all((x == 0).all() for x in leaves), k


def test_checkpoint_backends_roundtrip(tmp_path):
    """pickle and orbax (async, TPU-native) checkpoint backends both
    round-trip a full TrainState, including optax's NamedTuple optimizer
    state (orbax needs target_state for that)."""
    from align3r_tpu.training.train import (save_checkpoint, load_checkpoint,
                                            wait_for_checkpoints)
    params = init_align3r(jax.random.PRNGKey(0), CFG)
    tx = make_optimizer(params, make_lr_schedule(1e-3, 1e-5, 0, 10, 10))
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(tx, CFG, dtype=jnp.float32, remat=False))
    state, _ = step(state, make_batch())   # non-trivial opt state

    for backend in ("pickle", "orbax"):
        path = str(tmp_path / backend)
        save_checkpoint(path, state, epoch=3, best_so_far=1.5,
                        backend=backend)
        wait_for_checkpoints()
        fresh = create_train_state(params, tx)
        ck = load_checkpoint(path, target_state=fresh)
        assert ck["epoch"] == 3 and ck["best_so_far"] == 1.5
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            ck["params"], state.params)
        # optimizer state restored with identical structure + values
        assert jax.tree.structure(ck["opt_state"]) == \
            jax.tree.structure(state.opt_state) or backend == "pickle"
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            jax.tree.leaves(ck["opt_state"]),
            jax.tree.leaves(state.opt_state))
