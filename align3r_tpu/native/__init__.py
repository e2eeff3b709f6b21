"""Native (C++) host-side ops, built on demand with the system toolchain.

`connected_components` / `remove_small_regions` replace the reference's
CUDA op (third_party/sam2/sam2/csrc/connected_components.cu) for mask
postprocessing; scipy fallback when the extension isn't built.
"""
from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, f"_cc{sysconfig.get_config_var('EXT_SUFFIX') or '.so'}")
_cc = None


def _build():
    src = os.path.join(_HERE, "connected_components.cpp")
    include = sysconfig.get_path("include")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           f"-I{include}", src, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _cc
    if _cc is not None:
        return _cc
    try:
        if not os.path.exists(_SO) or (os.path.getmtime(_SO) <
                                       os.path.getmtime(os.path.join(
                                           _HERE, "connected_components.cpp"))):
            _build()
        import importlib.util
        spec = importlib.util.spec_from_file_location("_cc", _SO)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _cc = mod
    except Exception:
        _cc = False
    return _cc


def connected_components(mask: np.ndarray):
    """mask: (H, W) bool/uint8. Returns (labels int32 (H,W), n, areas (n+1,))."""
    m = np.ascontiguousarray(mask.astype(np.uint8))
    cc = _load()
    if cc:
        lb, n, areas = cc.label(m)
        labels = np.frombuffer(lb, np.int32).reshape(m.shape)
        return labels, n, np.asarray(areas, np.int64)
    from scipy import ndimage
    labels, n = ndimage.label(m, structure=np.ones((3, 3)))
    areas = np.bincount(labels.ravel(), minlength=n + 1)
    return labels.astype(np.int32), int(n), areas.astype(np.int64)


def remove_small_regions(mask: np.ndarray, area_thr: int, mode: str = "islands"):
    """Drop small foreground islands or fill small background holes
    (SAM2 postprocessing semantics). mask: (H, W) bool."""
    m = np.ascontiguousarray(mask.astype(np.uint8))
    mode_i = 0 if mode == "islands" else 1
    cc = _load()
    if cc:
        out = cc.remove_small_regions(m, int(area_thr), mode_i)
        return np.frombuffer(out, np.uint8).reshape(m.shape).astype(bool)
    labels, n, areas = connected_components(m if mode_i == 0 else 1 - m)
    out = m.astype(bool).copy()
    small = areas < area_thr
    bad = small[labels] & (labels > 0)
    out[bad] = (mode_i == 1)
    return out
