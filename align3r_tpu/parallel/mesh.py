"""Device mesh and sharding helpers.

TPU-native replacement for the reference's NCCL DDP stack
(/root/reference/croco/utils/misc.py:222-243, dust3r/training.py:162-165):
a jax.sharding.Mesh with a 'data' axis (optionally 'model' for larger-scale
runs) carries gradient sync as XLA collectives over ICI — no explicit
all_reduce calls are needed; pjit inserts psum on the gradients.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> bool:
    """Multi-host bring-up, the NCCL-process-group equivalent (reference
    croco/utils/misc.py:222-243 reads RANK/WORLD_SIZE env vars and calls
    init_process_group('nccl')).

    Gated on env vars so single-host runs are untouched: set
    ALIGN3R_COORDINATOR (host:port) plus ALIGN3R_NUM_PROCESSES and
    ALIGN3R_PROCESS_ID, or rely on jax's own cluster auto-detection by
    setting ALIGN3R_DIST=1 (TPU pods populate the cluster env themselves).
    After this, jax.devices() spans all hosts and every Mesh built from it
    carries gradient psums over ICI/DCN. Returns True if initialised.
    """
    import os
    coord = os.environ.get("ALIGN3R_COORDINATOR")
    auto = os.environ.get("ALIGN3R_DIST") == "1"
    if not coord and not auto:
        return False
    kw = {}
    if coord:
        kw = dict(coordinator_address=coord,
                  num_processes=int(os.environ["ALIGN3R_NUM_PROCESSES"]),
                  process_id=int(os.environ["ALIGN3R_PROCESS_ID"]))
    jax.distributed.initialize(**kw)
    return True


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (n_data, n_model, len(devices))
    arr = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree on the mesh, leading axis over 'data'."""
    s = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def zero1_opt_shardings(opt_state, mesh: Mesh, min_size: int = 2 ** 16):
    """ZeRO-1 optimizer-state sharding specs over the 'data' axis.

    The reference's DDP replicates Adam moments on every rank; ZeRO-1
    instead gives each data-parallel chip a 1/N slice of the moments and
    the MultiSteps grad accumulator (~3.6 GB replicated for a ViT-L
    fine-tune -> ~0.45 GB/chip on an 8-chip mesh). The optimizer update
    is elementwise over these leaves, so under pjit each chip updates only
    its slice and XLA inserts exactly one all-gather where the (sharded)
    updates meet the replicated params — the ZeRO-1 collective — with no
    change to the update math.

    Each large leaf is sharded along its LARGEST dim divisible by the mesh
    'data' size (stacked layer trees lead with n_layers, which rarely
    divides the chip count — the feature dims do). Leaves smaller than
    min_size elements, or with no divisible dim, stay replicated.
    """
    n = mesh.shape["data"]
    repl = NamedSharding(mesh, P())

    def leaf_sharding(x):
        shape = getattr(x, "shape", ())
        size = int(np.prod(shape)) if shape else 0
        if size < min_size:
            return repl
        for d in sorted(range(len(shape)), key=lambda d: -shape[d]):
            if shape[d] % n == 0:
                spec = [None] * len(shape)
                spec[d] = "data"
                return NamedSharding(mesh, P(*spec))
        return repl

    return jax.tree.map(leaf_sharding, opt_state)


def process_slice(items: Sequence, n_proc: Optional[int] = None,
                  proc_id: Optional[int] = None):
    """Eval-time task parallelism: shard a work list across processes
    (reference pose_test.py:98-112 shards sequences across DDP ranks)."""
    n = n_proc if n_proc is not None else jax.process_count()
    i = proc_id if proc_id is not None else jax.process_index()
    return list(items)[i::n]
