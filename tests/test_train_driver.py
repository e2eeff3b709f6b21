"""End-to-end test of the train() DRIVER (training/train.py): dataset
expression -> loader -> sharded step -> checkpoint -> auto-resume ->
torch-compat export. Mirrors the reference driver contract
(dust3r/training.py train:92-248, auto-resume croco/utils/misc.py:292-329).
Runs a tiny model for 2 epochs with the orbax backend, then resumes."""
import json
import os

import numpy as np
import pytest

from align3r_tpu.training.train import TrainArgs, train


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp("po_train")

    def write_pfm(path, arr):
        h, w = arr.shape
        with open(path, "wb") as f:
            f.write(b"Pf\n")
            f.write(f"{w} {h}\n".encode())
            f.write(b"-1.0\n")
            np.flipud(arr).astype("<f4").tofile(f)

    rng = np.random.default_rng(0)
    H, W = 60, 100
    for scene in ("scene_a", "scene_b"):
        d = root / scene
        d.mkdir()
        for k in range(4):
            stem = str(d / f"frame_{k:04d}")
            img = rng.integers(0, 255, (H, W, 3), np.uint8)
            cv2.imwrite(stem + "_rgb.jpg", img)
            write_pfm(stem + "_depth.pfm",
                      rng.uniform(1, 5, (H, W)).astype(np.float32))
            cv2.imwrite(stem + "_mask.png", np.full((H, W), 255, np.uint8))
            K = np.array([[80, 0, W / 2], [0, 80, H / 2], [0, 0, 1]],
                         np.float32)
            pose = np.eye(4, dtype=np.float32)
            pose[:3, 3] = [k * 0.1, 0, 0]
            np.savez(stem + "_metadata.npz", camera_intrinsics=K,
                     camera_pose=np.linalg.inv(pose))
            np.savez(stem + "_rgb_pred_depth_depthpro.npz",
                     depth=rng.uniform(1, 5, (H, W)).astype(np.float32),
                     focallength_px=np.float32(80.0))
    return str(root)


def test_pending_meta_promotion_semantics(tmp_path):
    """Deferred orbax meta.json: non-blocking promotion lands meta as soon
    as the payload's final dir exists (orbax commits local saves by atomic
    rename), keeps in-flight saves pending, and only drops-with-warning
    when told the checkpointer has finished (a missing payload then means
    the background save failed)."""
    from align3r_tpu.training import train as T
    p = str(tmp_path / "ck")
    os.makedirs(p)
    T._PENDING_META[p] = {"step": 1, "epoch": 0, "best_so_far": None}
    T._promote_pending_meta()          # not committed -> stays pending
    assert p in T._PENDING_META
    assert not os.path.exists(os.path.join(p, "meta.json"))
    os.makedirs(os.path.join(p, "orbax"))   # commit (atomic rename lands)
    T._promote_pending_meta()
    assert p not in T._PENDING_META
    assert json.load(open(os.path.join(p, "meta.json")))["epoch"] == 0
    p2 = str(tmp_path / "ck2")
    os.makedirs(p2)
    T._PENDING_META[p2] = {"step": 2, "epoch": 1, "best_so_far": None}
    with pytest.warns(UserWarning):
        T._promote_pending_meta(assume_finished=True)
    assert p2 not in T._PENDING_META
    assert not os.path.exists(os.path.join(p2, "meta.json"))


def test_train_driver_end_to_end_with_orbax_resume(synth_root, tmp_path):
    out = str(tmp_path / "run")
    ds = (f"PointodysseyDatasets(split='train', ROOT='{synth_root}', "
          f"resolution=(64, 48), seed=777)")
    base = dict(
        model=("Align3RConfig(img_size=(48, 64), patch_size=16, "
               "enc_embed_dim=32, enc_depth=2, enc_num_heads=2, "
               "dec_embed_dim=24, dec_depth=12, dec_num_heads=2)"),
        train_dataset=ds, test_dataset=ds,
        batch_size=2, accum_iter=1, epochs=2, warmup_epochs=0,
        num_workers=2, output_dir=out, eval_freq=1, save_freq=1,
        keep_freq=10, max_steps_per_epoch=2, ckpt_backend="orbax",
        n_data=2, zero1=True)  # zero1: the async orbax save + resume round-
    #                            trips a SHARDED opt state (1/2 per device)
    state = train(TrainArgs(**base))
    assert os.path.isdir(os.path.join(out, "checkpoint-last", "orbax"))
    assert os.path.exists(os.path.join(out, "checkpoint-final.pth"))
    log = [json.loads(l) for l in open(os.path.join(out, "log.txt"))]
    assert [e["epoch"] for e in log] == [0, 1]
    assert all(np.isfinite(e["train_loss"]) for e in log)

    # auto-resume: one more epoch continues from epoch 2
    state2 = train(TrainArgs(**{**base, "epochs": 3}))
    log2 = [json.loads(l) for l in open(os.path.join(out, "log.txt"))]
    assert log2[-1]["epoch"] == 2 and len(log2) == 3
    # params advanced from the resumed state
    k0 = np.asarray(state.params["head1"]["head_conv3"]["kernel"])
    k2 = np.asarray(state2.params["head1"]["head_conv3"]["kernel"])
    assert not np.allclose(k0, k2)
