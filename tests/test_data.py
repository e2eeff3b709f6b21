"""Training data pipeline tests over a synthetic preprocessed dataset."""
import os
import numpy as np
import pytest

from align3r_tpu.training.data import (
    build_dataset, get_data_loader, collate_views, BatchedRandomSampler,
    PointodysseyDatasets, read_pfm)
from align3r_tpu.training.data.datasets import PreprocessedSequenceDataset


def write_pfm(path, arr):
    h, w = arr.shape
    with open(path, "wb") as f:
        f.write(b"Pf\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")
        np.flipud(arr).astype("<f4").tofile(f)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp("po")
    rng = np.random.default_rng(0)
    H, W = 60, 100
    for scene in ("scene_a", "scene_b"):
        d = root / scene
        d.mkdir()
        for k in range(4):
            stem = str(d / f"frame_{k:04d}")
            img = rng.integers(0, 255, (H, W, 3), np.uint8)
            cv2.imwrite(stem + "_rgb.jpg", img)
            write_pfm(stem + "_depth.pfm", rng.uniform(1, 5, (H, W)).astype(np.float32))
            cv2.imwrite(stem + "_mask.png", np.full((H, W), 255, np.uint8))
            K = np.array([[80, 0, W / 2], [0, 80, H / 2], [0, 0, 1]], np.float32)
            pose = np.eye(4, dtype=np.float32)
            pose[:3, 3] = [k * 0.1, 0, 0]
            np.savez(stem + "_metadata.npz", camera_intrinsics=K,
                     camera_pose=np.linalg.inv(pose))  # stored world2cam
            np.savez(stem + "_rgb_pred_depth_depthpro.npz",
                     depth=rng.uniform(1, 5, (H, W)).astype(np.float32),
                     focallength_px=np.float32(80.0))
    return str(root)


def test_pfm_roundtrip(tmp_path):
    arr = np.random.default_rng(1).uniform(0, 9, (7, 11)).astype(np.float32)
    write_pfm(str(tmp_path / "x.pfm"), arr)
    np.testing.assert_allclose(read_pfm(str(tmp_path / "x.pfm")), arr)


def test_dataset_contract(synth_root):
    ds = PointodysseyDatasets(split="train", ROOT=synth_root,
                              resolution=(96, 64), seed=777)
    # 2 scenes x C(4,2)=6 pairs
    assert len(ds) == 12
    views = ds[0]
    assert len(views) == 2
    for v in views:
        assert v["img"].shape == (64, 96, 3)
        assert -1.01 <= v["img"].min() and v["img"].max() <= 1.01
        assert v["pts3d"].shape == (64, 96, 3)
        assert v["valid_mask"].shape == (64, 96)
        assert v["pred_depth"].shape == (64, 96, 3)
        assert v["valid_mask"].any()
        assert np.isfinite(v["pts3d"][v["valid_mask"]]).all()
        # pose was stored world2cam and must be inverted back to cam2world
        assert np.isfinite(v["camera_pose"]).all()
    # seeded determinism: same idx -> identical views
    v2 = ds[0]
    np.testing.assert_array_equal(views[0]["img"], v2[0]["img"])


def test_dataset_algebra(synth_root):
    ds = PointodysseyDatasets(split="train", ROOT=synth_root,
                              resolution=(96, 64), seed=777)
    big = 30 @ ds
    big.set_epoch(0)
    assert len(big) == 30
    _ = big[29]
    both = (10 @ ds) + (5 @ ds)
    both.set_epoch(1)
    assert len(both) == 15
    _ = both[12]
    tripled = 3 * ds
    assert len(tripled) == 36


def test_build_dataset_expression(synth_root):
    expr = (f"10 @ PointodysseyDatasets(split='train', ROOT={synth_root!r}, "
            f"resolution=[(96, 64)], seed=777) + "
            f"6 @ PointodysseyDatasets(split='train', ROOT={synth_root!r}, "
            f"resolution=[(96, 64)], seed=1)")
    ds = build_dataset(expr)
    ds.set_epoch(0)
    assert len(ds) == 16


def test_batched_sampler_shares_resolution():
    class Dummy:
        def __len__(self):
            return 40
    s = BatchedRandomSampler(Dummy(), batch_size=4, num_ar=3)
    s.set_epoch(0)
    items = list(s)
    assert len(items) == 40
    for b in range(10):
        ars = {ar for _, ar in items[b * 4:(b + 1) * 4]}
        assert len(ars) == 1  # whole batch shares aspect ratio
    # rank slicing partitions each batch
    s0 = BatchedRandomSampler(Dummy(), 4, 3, world_size=2, rank=0)
    s1 = BatchedRandomSampler(Dummy(), 4, 3, world_size=2, rank=1)
    s0.set_epoch(3); s1.set_epoch(3)
    i0, i1 = list(s0), list(s1)
    assert len(i0) == len(i1) == 20
    assert not set(i0) & set(i1)


def test_sampler_and_loader_reject_indivisible_world_size():
    """batch_size % world_size != 0 would silently drop items from every
    batch (per = batch_size // world_size) — both the sampler and the
    DataLoader must refuse it up front (ADVICE r4 #2)."""
    import pytest
    from align3r_tpu.training.data.loader import DataLoader

    class Dummy:
        def __len__(self):
            return 40
    with pytest.raises(ValueError, match="divisible"):
        BatchedRandomSampler(Dummy(), batch_size=5, num_ar=3,
                             world_size=2, rank=0)
    with pytest.raises(ValueError, match="divisible"):
        DataLoader(Dummy(), batch_size=5, world_size=2, rank=0)


def test_sampler_distributed_without_set_epoch_raises():
    """Distributed iteration without set_epoch() must raise a RuntimeError
    (not a strippable assert): per-rank fresh seeds silently desynchronise
    the training data across DP ranks (ADVICE r4 #3)."""
    import pytest

    class Dummy:
        def __len__(self):
            return 40
    s = BatchedRandomSampler(Dummy(), batch_size=4, num_ar=3,
                             world_size=2, rank=1)
    with pytest.raises(RuntimeError, match="set_epoch"):
        next(iter(s))


def test_data_loader_batches(synth_root):
    ds = PointodysseyDatasets(split="train", ROOT=synth_root,
                              resolution=(96, 64), seed=777)
    dl = get_data_loader(ds, batch_size=4, num_workers=2)
    dl.set_epoch(0)
    batches = list(dl)
    assert len(batches) == len(ds) // 4
    b = batches[0]
    assert b["view1"]["img"].shape == (4, 64, 96, 3)
    assert b["view2"]["pts3d"].shape == (4, 64, 96, 3)
    assert b["view1"]["valid_mask"].dtype == bool
    assert b["view1"]["camera_pose"].shape == (4, 4, 4)


def test_data_loader_preserves_sampler_order():
    """Multi-worker prefetch must reassemble items in SAMPLER order: with
    out-of-order arrival, items would mix across batch boundaries and break
    the one-resolution-per-batch invariant (code-review r3 finding). A
    dataset with adversarial per-item delays makes arrival order differ
    from submission order."""
    import time as _time
    from align3r_tpu.training.data.loader import DataLoader

    class SlowDataset:
        resolutions = [(8, 8)]

        def __len__(self):
            return 16

        def __getitem__(self, idx):
            i, ar = idx if isinstance(idx, tuple) else (idx, 0)
            _time.sleep(0.05 if i % 4 == 0 else 0.0)  # stagger arrivals
            view = {"img": np.full((2, 2), i, np.float32), "idx": i}
            return [dict(view), dict(view)]

    dl = DataLoader(SlowDataset(), batch_size=4, num_workers=4, shuffle=True)
    dl.set_epoch(0)
    got = [b["view1"]["idx"].tolist() for b in dl]
    # expected composition = sampler order chunked by 4
    s = dl.sampler
    s.set_epoch(0)
    want = [i for i, _ in s]
    want = [want[k:k + 4] for k in range(0, 16, 4)]
    assert got == want, (got, want)


def test_batched_sampler_ragged_drop_last_false():
    class Dummy:
        def __len__(self):
            return 10
    s = BatchedRandomSampler(Dummy(), batch_size=4, num_ar=2, drop_last=False)
    s.set_epoch(0)
    items = list(s)
    assert len(items) == 10                      # nothing dropped, no crash
    assert sorted(i for i, _ in items) == list(range(10))
    ars = [ar for _, ar in items]
    assert len(set(ars[0:4])) == 1 and len(set(ars[4:8])) == 1


def test_resized_dataset_matches_reference_data_order():
    """Exact seed-777 data-order contract: ResizedDataset must tile ONE
    epoch permutation exactly like the reference (easy_dataset.py:89-99),
    not draw fresh permutations per repeat (r3 verdict Weak #7)."""
    from align3r_tpu.training.data.easy_dataset import ResizedDataset
    from tests.reference_import import (reference_available,
                                        reference_on_path,
                                        install_reference_dep_stubs)
    if not reference_available():
        pytest.skip("reference repo not present")
    install_reference_dep_stubs()

    class Dummy:
        def __len__(self):
            return 7

        def set_epoch(self, epoch):
            pass

    ours = ResizedDataset(23, Dummy())
    with reference_on_path():
        from dust3r.datasets.base.easy_dataset import (
            ResizedDataset as RefResized)
        theirs = RefResized.__new__(RefResized)
        theirs.new_size = 23
        theirs.dataset = Dummy()
        for epoch in (0, 1, 5):
            ours.set_epoch(epoch)
            RefResized.set_epoch(theirs, epoch)
            np.testing.assert_array_equal(ours._idxs, theirs._idxs_mapping)


def test_batched_sampler_matches_reference_order():
    """Bit-exact seed-777 iteration-order contract vs the reference sampler
    (batched_sampler.py:39-60): same shuffle stream (arange(total_size)
    shuffled in place), same aspect-ratio draws, same drop_last rounding.
    For world_size>1 the rank->item ROUTING deviates by design (global-batch
    sharding vs whole-batches-per-rank, see loader.py docstring) but every
    global batch's contents and feature index must still match."""
    from tests.reference_import import (reference_available,
                                        reference_on_path,
                                        install_reference_dep_stubs)
    if not reference_available():
        pytest.skip("reference repo not present")
    install_reference_dep_stubs()

    class Dummy:
        def __len__(self):
            return 23

    with reference_on_path():
        from dust3r.datasets.base.batched_sampler import (
            BatchedRandomSampler as RefSampler)
        # single process: exact (idx, ar) sequence
        ours = BatchedRandomSampler(Dummy(), batch_size=4, num_ar=3)
        ref = RefSampler(Dummy(), batch_size=4, pool_size=3)
        for epoch in (0, 3):
            ours.set_epoch(epoch)
            ref.set_epoch(epoch)
            np.testing.assert_array_equal(np.asarray(list(ours)),
                                          np.asarray(list(ref)))

        # world_size=2: same global batches, rank-sliced differently
        ws, bs = 2, 4
        ref_all = []
        for rank in range(ws):
            r = RefSampler(Dummy(), batch_size=bs, pool_size=3,
                           world_size=ws, rank=rank)
            r.set_epoch(1)
            ref_all.append(np.asarray(list(r)))
        # reference ranks take contiguous whole batches: global order is
        # rank0's batches then rank1's
        ref_glob = np.concatenate(ref_all, axis=0)
        our_batches = []
        for rank in range(ws):
            s = BatchedRandomSampler(Dummy(), batch_size=bs, num_ar=3,
                                     world_size=ws, rank=rank)
            s.set_epoch(1)
            our_batches.append(np.asarray(list(s)))
        # our global batch b = concat of each rank's per-batch slice
        per = bs // ws
        n_batches = len(ref_glob) // bs
        ours_glob = np.concatenate(
            [np.concatenate([our_batches[r][b * per:(b + 1) * per]
                             for r in range(ws)], axis=0)
             for b in range(n_batches)], axis=0)
        np.testing.assert_array_equal(ours_glob, ref_glob)
