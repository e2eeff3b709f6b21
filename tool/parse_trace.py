"""Summarise a jax.profiler perfetto trace (trace.json.gz) by device time.

jax.profiler.trace DOES work over the axon tunnel (CLAUDE.md r2); the
dumped perfetto JSON carries per-fusion device timings. This prints total
duration per process (host threads vs TPU device lanes) and the top ops by
accumulated device time — enough to answer "what binds" questions without
TensorBoard.

Usage: python tool/parse_trace.py <dir-or-file>
  With a directory, the newest plugins/profile/*/ *.trace.json.gz is used.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys


def find_trace(path: str) -> str:
    if os.path.isfile(path):
        return path
    cands = glob.glob(os.path.join(path, "**", "*.trace.json.gz"),
                      recursive=True)
    if not cands:
        raise SystemExit(f"no *.trace.json.gz under {path}")
    return max(cands, key=os.path.getmtime)


def summarize(path: str, top: int = 40):
    with gzip.open(path) as f:
        data = json.load(f)
    evs = data.get("traceEvents", [])
    pids = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    tot, cnt = collections.Counter(), collections.Counter()
    by_pid = collections.Counter()
    for e in evs:
        if e.get("ph") == "X":
            name = e.get("name", "?")
            dur = e.get("dur", 0)
            pid_name = pids.get(e.get("pid"), e.get("pid"))
            by_pid[pid_name] += dur
            # only accumulate per-op time on device lanes (host threads
            # duplicate dispatch spans and would double-count)
            if "TPU" in str(pid_name) or "/device:" in str(pid_name):
                tot[name] += dur
                cnt[name] += 1
    if not tot:  # CPU-only trace: fall back to everything
        for e in evs:
            if e.get("ph") == "X":
                tot[e.get("name", "?")] += e.get("dur", 0)
                cnt[e.get("name", "?")] += 1
    print(f"== {os.path.basename(path)} ==")
    print("== total dur by process ==")
    for k, v in by_pid.most_common(10):
        print(f"{v/1e3:10.2f} ms  {k}")
    print(f"== top {top} ops (device) ==")
    for k, v in tot.most_common(top):
        print(f"{v/1e3:10.3f} ms  x{cnt[k]:4d}  {k[:110]}")
    return tot, cnt


if __name__ == "__main__":
    summarize(find_trace(sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"))
