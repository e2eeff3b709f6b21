"""Benchmark: pairwise inference throughput (image pairs/sec/chip, ViT-L 512).

Measures the canonical hot path (SURVEY.md §3.1 hot loop #1): the Align3R
ViT-L/16 two-view network over a swinstride-5 frame graph at 512x288, using
the batched TPU inference engine (unique-image encoding + batched decode).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Wedge resilience: the axon TPU tunnel can wedge for an hour+ (any jit hangs
forever — see CLAUDE.md). The default entry point therefore orchestrates:
health-probe the chip in a *subprocess* (a wedged tunnel hangs in-process
jits, so the probe must be killable), run the real measurement in a
subprocess too, retry with backoff inside a bounded budget, and on
persistent wedge print a structured last-good record (rc=0, valid JSON)
instead of a traceback. `python bench.py --inner` runs the raw measurement.

vs_baseline: the reference repo publishes no numbers (BASELINE.md). We use a
documented estimate of the PyTorch reference on A100: bs=1 per symmetrized
pair, ViT-L 512x288 with plain (non-flash) attention ≈ 8 pairs/s. This
constant is an estimate, not a measurement; the absolute pairs/s is the
trustworthy number.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

LAST_GOOD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_last_good.json")
PROBE_TIMEOUT_S = 45
INNER_TIMEOUT_S = int(os.environ.get("BENCH_INNER_TIMEOUT_S", "1500"))
BUDGET_S = int(os.environ.get("BENCH_BUDGET_S", "1500"))
RETRY_SLEEP_S = 90

A100_REFERENCE_PAIRS_PER_SEC = 8.0  # documented estimate, see module docstring

N_FRAMES = 24
H, W = 288, 512
BATCH = 32  # engine sweep winner (tool/tune_engine.py r3: bs=32 + fused
            # sites + unroll=3 = 136.9 vs bs=16's 135.1 pairs/s same-run)
DEC_BATCH = 16  # decode-stage probe batch (bounded by the 16 encoded imgs)


def _probe_healthy() -> bool:
    """Run a tiny jit in a killable subprocess; True iff it completes."""
    code = ("import jax, jax.numpy as jnp; "
            "print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, timeout=PROBE_TIMEOUT_S)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _load_last_good():
    try:
        with open(LAST_GOOD_PATH) as f:
            return json.load(f)
    except Exception:  # noqa: BLE001
        return None


def orchestrate() -> int:
    """Health-probe, run the measurement in a subprocess, retry within a
    bounded budget; on persistent wedge emit a structured last-good record.
    Always exits 0 with one parseable JSON line (VERDICT r3 Next #2)."""
    deadline = time.monotonic() + BUDGET_S
    attempt = 0
    reason = "unknown"
    while True:
        attempt += 1
        if not _probe_healthy():
            reason = "tunnel_wedged_probe"
            sys.stderr.write(f"[bench] probe attempt {attempt}: tunnel "
                             f"unhealthy\n")
        else:
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--inner"],
                    capture_output=True, text=True, timeout=INNER_TIMEOUT_S)
            except subprocess.TimeoutExpired:
                r = None
                reason = "inner_timeout"
                sys.stderr.write(f"[bench] attempt {attempt}: inner bench "
                                 f"timed out after {INNER_TIMEOUT_S}s\n")
            if r is not None:
                rec = None
                for ln in (r.stdout or "").splitlines():
                    ln = ln.strip()
                    if ln.startswith("{") and ln.endswith("}"):
                        # keep the LAST line that actually parses as the
                        # metric record — stray dict-repr prints must not
                        # crash the wedge-resilient orchestrator
                        try:
                            cand = json.loads(ln)
                        except ValueError:
                            continue
                        if isinstance(cand, dict) and "metric" in cand:
                            rec = cand
                if r.returncode == 0 and rec is not None:
                    rec["ok"] = True
                    rec["timestamp"] = time.strftime(
                        "%Y-%m-%dT%H:%M:%SZ", time.gmtime())
                    try:
                        with open(LAST_GOOD_PATH, "w") as f:
                            json.dump(rec, f, indent=1)
                    except OSError:
                        pass
                    print(json.dumps(rec))
                    return 0
                reason = f"inner_rc={r.returncode}"
                sys.stderr.write(f"[bench] attempt {attempt} failed "
                                 f"(rc={r.returncode}); tail:\n"
                                 + "\n".join((r.stderr or "")
                                             .splitlines()[-8:]) + "\n")
        if time.monotonic() + RETRY_SLEEP_S >= deadline:
            break
        time.sleep(RETRY_SLEEP_S)
    last = _load_last_good()
    rec = {
        "metric": "image pairs/sec/chip (ViT-L 512x288, swinstride-5 graph)",
        "value": (last or {}).get("value", -1.0),
        "unit": "pairs/s",
        "vs_baseline": (last or {}).get("vs_baseline", -1.0),
        "ok": False,
        "reason": reason,
        "last_good": last,
    }
    print(json.dumps(rec))
    return 0


def main():
    import jax
    import jax.numpy as jnp

    from align3r_tpu.models.config import VIT_L_512
    from align3r_tpu.models.align3r import init_align3r
    from align3r_tpu.inference.pairs import make_pairs
    from align3r_tpu.inference.engine import inference

    cfg = VIT_L_512
    params = init_align3r(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    imgs = jax.random.normal(key, (N_FRAMES, H, W, 3), jnp.float32)
    priors = jax.random.uniform(jax.random.PRNGKey(2), (N_FRAMES, H, W, 3))
    pairs = make_pairs(N_FRAMES, "swinstride-5-noncyclic", symmetrize=True)

    def run():
        # encode_chunk=N_FRAMES: one unpadded encode dispatch (the default
        # 16 would encode 24 frames as 16 + 8-real-8-padded, wasting ~8
        # image encodes ~= 2% of the run)
        out = inference(pairs, params, cfg, imgs, priors, batch_size=BATCH,
                        encode_chunk=N_FRAMES)
        # force full execution: on the axon tunnel platform block_until_ready
        # returns early, so pull a scalar reduction back to the host instead
        np.asarray(jnp.sum(out["pred1"]["pts3d"]) + jnp.sum(out["pred2"]["conf"]))
        return out

    run()  # compile
    t0 = time.perf_counter()
    n_rep = 2
    for _ in range(n_rep):
        run()
    dt = (time.perf_counter() - t0) / n_rep
    pairs_per_sec = len(pairs) / dt

    # stage split (pipelined timings, one sync each): encoder vs decode+heads
    from align3r_tpu.inference.engine import (_encode_all_jit,
                                              _decode_batch_jit)
    from align3r_tpu.models.align3r import stack_decoder_params
    sparams = stack_decoder_params(params)
    impl = "fused" if jax.default_backend() in ("tpu", "axon") else "auto"
    f, pc = _encode_all_jit(sparams, imgs[:16], priors[:16], cfg,
                            attn_impl=impl)
    np.asarray(jnp.sum(f))
    t0 = time.perf_counter()
    acc = None
    for _ in range(4):
        f, pc = _encode_all_jit(sparams, imgs[:16], priors[:16], cfg,
                                attn_impl=impl)
        s = jnp.sum(f)
        acc = s if acc is None else acc + s
    np.asarray(acc)
    enc_ms_img = (time.perf_counter() - t0) / 4 / 16 * 1e3
    f1 = f[:DEC_BATCH]
    impl = "fused" if jax.default_backend() in ("tpu", "axon") else "auto"
    r1, r2 = _decode_batch_jit(sparams, f1, f1, pc[:DEC_BATCH], pc[:DEC_BATCH],
                               cfg, (H, W), jnp.bfloat16, jnp.bfloat16, impl)
    np.asarray(jnp.sum(r1["pts3d"]))
    t0 = time.perf_counter()
    acc = None
    for _ in range(10):
        r1, r2 = _decode_batch_jit(sparams, f1, f1, pc[:DEC_BATCH],
                                   pc[:DEC_BATCH], cfg, (H, W), jnp.bfloat16,
                                   jnp.bfloat16, impl)
        s = jnp.sum(r1["pts3d"])
        acc = s if acc is None else acc + s
    np.asarray(acc)
    dec_ms_pair = (time.perf_counter() - t0) / 10 / DEC_BATCH * 1e3

    align_ips = _bench_alignment()
    raft_ms = _bench_raft()

    print(json.dumps({
        "metric": "image pairs/sec/chip (ViT-L 512x288, swinstride-5 graph)",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / A100_REFERENCE_PAIRS_PER_SEC, 3),
        "alignment_iters_per_sec": round(align_ips, 1),
        "encode_ms_per_img": round(enc_ms_img, 2),
        "decode_ms_per_pair": round(dec_ms_pair, 2),
        "raft_flow_ms_per_img": round(raft_ms, 1),
        # the reference repo publishes no numbers; 8 pairs/s on A100 is a
        # documented estimate (module docstring) — value (pairs/s) is the
        # trustworthy figure
        "baseline_is_estimate": True,
    }))


def _bench_raft():
    """Tertiary metric: SEA-RAFT optical flow (20 iters, the flow-variant
    aligner's per-edge precompute — reference hot path #3) in ms/image.

    Measured per the repo's r2 discipline (CLAUDE.md): NS solves run inside
    ONE lax.scan (carry-threaded through the inputs so XLA's loop-invariant
    code motion cannot hoist the body) — per-program dispatch over the axon
    tunnel costs a fixed ~28 ms, which at B=8 inflated a per-dispatch
    measurement by ~3.5 ms/img and made the r2->r4 bench numbers drift with
    tunnel state (17.1 -> 22.0) while profiled device time held at ~9.7."""
    import jax
    import jax.numpy as jnp
    from align3r_tpu.models.raft import init_raft, raft_forward, SPRING_M
    try:
        rp = init_raft(jax.random.PRNGKey(3), SPRING_M)
        B, NS = 8, 4
        i1 = jax.random.uniform(jax.random.PRNGKey(4), (B, H, W, 3)) * 255
        i2 = jax.random.uniform(jax.random.PRNGKey(5), (B, H, W, 3)) * 255

        @jax.jit
        def solve_scan(params, a, b):
            def body(c, _):
                flow = raft_forward(params, a + c, b, SPRING_M, iters=20)
                return jnp.mean(flow) * 1e-20, jnp.sum(flow)
            _, s = jax.lax.scan(body, jnp.float32(0), None, length=NS)
            return jnp.sum(s)

        np.asarray(solve_scan(rp, i1, i2))
        t0 = time.perf_counter()
        reps = 2
        acc = None
        for _ in range(reps):
            s = solve_scan(rp, i1, i2)
            acc = s if acc is None else acc + s
        np.asarray(acc)
        return (time.perf_counter() - t0) / reps / NS / B * 1e3
    except Exception:  # noqa: BLE001 — keep the bench line printing
        return -1.0


def _bench_alignment():
    """Secondary metric: global-alignment Adam iters/sec (300-iter solve,
    24 frames @ 512x288, swinstride-5 graph — reference hot loop #2)."""
    import jax
    import jax.numpy as jnp

    from align3r_tpu.alignment.scene import (build_scene, default_masks,
                                             global_alignment_loop)
    from align3r_tpu.inference.pairs import make_pairs

    n, H, W = N_FRAMES, 288, 512
    pairs = make_pairs(n, "swinstride-5-noncyclic", symmetrize=True)
    E = len(pairs)
    key = jax.random.PRNGKey(0)
    output = {
        "view1": {"idx": np.array([p[0] for p in pairs])},
        "view2": {"idx": np.array([p[1] for p in pairs])},
        "pred1": {"pts3d": jax.random.normal(key, (E, H, W, 3)),
                  "conf": 1 + jax.random.uniform(key, (E, H, W))},
        "pred2": {"pts3d_in_other_view": jax.random.normal(key, (E, H, W, 3)),
                  "conf": 1 + jax.random.uniform(key, (E, H, W))},
    }
    cfg, data, params = build_scene(output)
    masks = default_masks(cfg, params)
    p2, losses = global_alignment_loop(params, masks, data, cfg,
                                       lr=0.01, niter=300)
    np.asarray(losses)  # compile + run
    t0 = time.perf_counter()
    p2, losses = global_alignment_loop(params, masks, data, cfg,
                                       lr=0.01, niter=300)
    np.asarray(losses)
    return 300 / (time.perf_counter() - t0)


if __name__ == "__main__":
    if "--inner" in sys.argv:
        main()
    else:
        sys.exit(orchestrate())
