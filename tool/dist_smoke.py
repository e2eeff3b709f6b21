"""Two-process distributed smoke worker (run by tests/test_dist_smoke.py).

Proves that `parallel.mesh.maybe_init_distributed` (the reference's
init_process_group equivalent, croco/utils/misc.py:222-243) actually
initialises a multi-process JAX cluster and that collectives reduce ACROSS
processes: each process contributes (process_id + 1) to a psum over a
global 1-axis mesh; with 2 processes the result must be 3.

Usage (the test sets these):
    ALIGN3R_COORDINATOR=localhost:<port> ALIGN3R_NUM_PROCESSES=2 \
    ALIGN3R_PROCESS_ID=<0|1> python tool/dist_smoke.py
"""
import os
import sys

import numpy as np


def main():
    import jax
    # the container pins JAX_PLATFORMS=axon (TPU tunnel); the smoke runs on
    # CPU, one device per process (see CLAUDE.md: env overrides don't work)
    jax.config.update("jax_platforms", "cpu")

    from align3r_tpu.parallel.mesh import maybe_init_distributed, process_slice

    ok = maybe_init_distributed()
    assert ok, "maybe_init_distributed returned False despite env vars"

    n_proc = int(os.environ["ALIGN3R_NUM_PROCESSES"])
    pid = int(os.environ["ALIGN3R_PROCESS_ID"])
    assert jax.process_count() == n_proc, jax.process_count()
    assert jax.process_index() == pid, jax.process_index()

    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental import multihost_utils
    shard_map = jax.shard_map  # noqa: N806

    # one global mesh over every device of every process
    devices = np.array(jax.devices())
    assert devices.size >= n_proc, devices
    mesh = Mesh(devices, ("data",))

    # each process contributes its (pid + 1); psum must see all of them
    n_local = len(jax.local_devices())
    local = np.full((n_local, 1), float(pid + 1), np.float32)
    global_x = multihost_utils.host_local_array_to_global_array(
        local, mesh, P("data"))

    f = jax.jit(shard_map(lambda x: jax.lax.psum(x, "data"),
                          mesh=mesh, in_specs=P("data"), out_specs=P()))
    out = f(global_x)  # replicated: every process holds the full psum
    total = float(np.asarray(jax.device_get(out.addressable_data(0))).ravel()[0])
    expect = sum(float(p + 1) * n_local for p in range(n_proc))
    assert total == expect, (total, expect)

    # eval work-list sharding uses the live process_count/index
    sl = process_slice(list(range(5)))
    assert sl == list(range(5))[pid::n_proc], sl

    print(f"DIST_SMOKE_OK pid={pid} nproc={jax.process_count()} "
          f"psum={total} slice={sl}", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
