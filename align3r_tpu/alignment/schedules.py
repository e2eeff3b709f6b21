"""LR schedules for the alignment loop, precomputed as arrays.

Behavioural reference: /root/reference/dust3r/cloud_opt_flow/commons.py:89-103
(cosine/linear/cycled; note t = iter/niter, not iter/(niter-1)) and
base_opt.py global_alignment_iter.
"""
from __future__ import annotations

import numpy as np


def schedule_array(schedule: str, niter: int, lr_base: float, lr_min: float,
                   num_cycles: int = 2) -> np.ndarray:
    t = np.arange(niter, dtype=np.float64) / niter
    if schedule == "cosine":
        lr = lr_min + (lr_base - lr_min) * (1 + np.cos(t * np.pi)) / 2
    elif schedule == "linear":
        lr = lr_base + (lr_min - lr_base) * t
    elif schedule.startswith("cycle"):
        ct = t * num_cycles
        ct = ct - np.floor(ct)
        lr = lr_base + (lr_min - lr_base) * ct
    else:
        raise ValueError(f"bad schedule {schedule!r}")
    return lr.astype(np.float32)
