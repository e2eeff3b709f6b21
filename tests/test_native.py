import numpy as np
import pytest

from align3r_tpu.native import connected_components, remove_small_regions, _load


def make_mask():
    m = np.zeros((20, 30), bool)
    m[2:6, 2:6] = True          # 16 px island
    m[10:18, 10:25] = True      # 120 px island
    m[12:14, 12:14] = False     # 4 px hole inside the big island
    m[0, 29] = True             # 1 px island (diag-connected to nothing)
    return m


def test_native_extension_builds():
    assert _load(), "C++ extension failed to build; check g++ toolchain"


def test_label_counts():
    labels, n, areas = connected_components(make_mask())
    assert n == 3
    assert sorted(areas[1:].tolist()) == [1, 16, 116]
    assert labels.shape == (20, 30)
    # background is 0
    assert labels[0, 0] == 0


def test_label_8_connectivity():
    m = np.zeros((4, 4), bool)
    m[0, 0] = m[1, 1] = m[2, 2] = True  # diagonal chain = one component
    labels, n, areas = connected_components(m)
    assert n == 1 and areas[1] == 3


def test_remove_small_islands_and_holes():
    m = make_mask()
    out = remove_small_regions(m, area_thr=10, mode="islands")
    assert not out[0, 29]           # 1px island dropped
    assert out[2, 2] and out[10, 10]  # big ones kept
    out2 = remove_small_regions(m, area_thr=10, mode="holes")
    assert out2[12, 12]             # 4px hole filled
    assert not out2[0, 0]           # outer background untouched (big region)


def test_matches_scipy():
    rng = np.random.default_rng(0)
    m = rng.random((64, 80)) > 0.6
    labels, n, areas = connected_components(m)
    from scipy import ndimage
    sl, sn = ndimage.label(m, structure=np.ones((3, 3)))
    assert n == sn
    # same partition (up to label permutation)
    for k in range(1, n + 1):
        ours = labels == k
        theirs = sl == sl[ours][0]
        assert (ours == theirs).all()
