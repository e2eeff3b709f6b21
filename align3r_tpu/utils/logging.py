"""Metric logging + profiling hooks.

Behavioural reference: /root/reference/croco/utils/misc.py (MetricLogger /
SmoothedValue:27-173 with distributed all-reduce sync) and SURVEY.md §5
(TPU rebuild adds jax.profiler traces as the first-class replacement for
the reference's CUDA max-mem logging).
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict, deque
from typing import Optional


class SmoothedValue:
    """Track a series with a moving window (median/avg) + global avg."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        self.deque.append(value)
        self.count += n
        self.total += value * n

    def synchronize_between_processes(self):
        """Sum count/total across jax processes (reference misc.py:45-56
        all_reduce; here a psum over a host->device scalar)."""
        import jax
        if jax.process_count() == 1:
            return
        import jax.numpy as jnp
        import numpy as np
        from jax.experimental import multihost_utils
        arr = multihost_utils.process_allgather(
            jnp.asarray([self.count, self.total]))
        self.count = int(np.sum(np.asarray(arr)[..., 0]))
        self.total = float(np.sum(np.asarray(arr)[..., 1]))

    @property
    def median(self):
        import numpy as np
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self):
        import numpy as np
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)

    @property
    def value(self):
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, value=self.value)


class MetricLogger:
    def __init__(self, delimiter: str = "  "):
        self.meters = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(f"{k}: {m}" for k, m in self.meters.items())

    def synchronize_between_processes(self):
        for m in self.meters.values():
            m.synchronize_between_processes()

    def log_every(self, iterable, print_freq: int, header: str = ""):
        i = 0
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        end = time.time()
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0:
                print(f"{header} [{i}]  {self}  time: {iter_time}  "
                      f"data: {data_time}")
            i += 1
            end = time.time()
        total = time.time() - start
        print(f"{header} Total time: {total:.1f}s ({total / max(i, 1):.4f}s/it)")


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace context (no-op when log_dir is None)."""
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield


def append_jsonl(path: str, record: dict):
    """JSON-lines run log (reference training.py:175-187 log.txt)."""
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")
