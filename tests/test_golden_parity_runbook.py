"""Keep the golden-parity runbook green in CI (VERDICT r3 next #8): the
self-check mode (random-init reference-format .pth -> convert -> both
stacks -> per-stage diffs + depth metrics) must PASS, so the day real
weights land the one-command runbook is known-working."""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tool"))


def test_golden_parity_selfcheck(tmp_path):
    from golden_parity import write_selfcheck_checkpoint, run_parity
    ckpt = str(tmp_path / "selfcheck.pth")
    write_selfcheck_checkpoint(ckpt, 32, 48)
    ok, diffs, metrics = run_parity(ckpt, n_frames=4)
    assert ok, (diffs, metrics)
