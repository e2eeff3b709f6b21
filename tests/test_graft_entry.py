"""Unit checks for the driver-entry hardening (the full dryrun_multichip
is exercised by the driver itself; these cover the r5 contention guards
without paying a second 8-device compile)."""
import os
import subprocess
import sys

import numpy as np


def test_force_cpu_devices_sets_collective_timeouts():
    """The rendezvous termination window must be raised BEFORE backend
    init: the r4 multichip record went red on the ~20-40 s default while
    a measurement batch oversubscribed the host (MULTICHIP_r04 rc=134)."""
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import __graft_entry__ as g\n"
        "g._force_cpu_devices(8)\n"
        "import os\n"
        "f = os.environ['XLA_FLAGS']\n"
        "assert 'xla_force_host_platform_device_count=8' in f, f\n"
        "assert 'xla_cpu_collective_timeout_seconds=600' in f, f\n"
        "import jax\n"
        "assert len(jax.devices()) == 8\n"
        "assert jax.devices()[0].platform == 'cpu'\n"
        "print('ok')\n"
    ) % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr
    assert "ok" in r.stdout


def test_host_lock_blocks_then_yields(tmp_path, monkeypatch):
    """_HostLock waits on the watcher's flock and proceeds once released
    (bounded wait; a held lock must not deadlock the driver). Runs on a
    private lock file: taking the REAL /tmp/align3r_host.lock here would
    hang the suite for hours whenever the detached measurement watcher
    holds it (and fail the uncontended-acquire assert)."""
    import fcntl
    import threading
    import time
    import __graft_entry__ as g

    monkeypatch.setattr(g._HostLock, "PATH", str(tmp_path / "host.lock"))
    holder = open(g._HostLock.PATH, "w")
    fcntl.flock(holder, fcntl.LOCK_EX)
    t_release = threading.Timer(2.0, lambda: (
        fcntl.flock(holder, fcntl.LOCK_UN), holder.close()))
    t_release.start()
    t0 = time.monotonic()
    with g._HostLock(wait_s=60):
        waited = time.monotonic() - t0
    t_release.join()
    assert waited >= 1.0, waited          # actually waited for the holder
    # and an uncontended acquire is immediate
    t0 = time.monotonic()
    with g._HostLock(wait_s=60):
        assert time.monotonic() - t0 < 1.0
