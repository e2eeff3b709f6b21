"""bench.py orchestrator: wedge resilience (VERDICT r3 Next #2).

The real measurement needs the TPU; these tests cover the orchestration
logic only — probe gating, JSON passthrough + last-good persistence on
success, and the structured last-good record (rc=0) on persistent wedge.
"""
import importlib.util
import json
import subprocess
import sys
import types

import pytest


@pytest.fixture()
def bench(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "LAST_GOOD_PATH",
                        str(tmp_path / "last_good.json"))
    monkeypatch.setattr(mod, "RETRY_SLEEP_S", 0.01)
    monkeypatch.setattr(mod, "BUDGET_S", 1)
    return mod


def test_success_path_writes_last_good(bench, monkeypatch, capsys):
    inner = json.dumps({"metric": "m", "value": 123.0, "unit": "pairs/s",
                        "vs_baseline": 15.0})

    monkeypatch.setattr(bench, "_probe_healthy", lambda: True)

    def fake_run(cmd, **kw):
        return types.SimpleNamespace(returncode=0,
                                     stdout="warn line\n" + inner + "\n",
                                     stderr="")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench.orchestrate() == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["ok"] is True and out["value"] == 123.0
    saved = json.load(open(bench.LAST_GOOD_PATH))
    assert saved["value"] == 123.0 and "timestamp" in saved


def test_stray_brace_lines_do_not_crash(bench, monkeypatch, capsys):
    """A dict-repr or other non-JSON brace-wrapped line AFTER the metric
    line must not crash the orchestrator (unguarded json.loads of the last
    brace line was exactly the rc=1 failure mode this module exists to
    eliminate)."""
    inner = json.dumps({"metric": "m", "value": 7.0, "unit": "u",
                        "vs_baseline": 1.0})
    monkeypatch.setattr(bench, "_probe_healthy", lambda: True)

    def fake_run(cmd, **kw):
        return types.SimpleNamespace(
            returncode=0,
            stdout=inner + "\n{'enc': 3.97, 'not': 'json'}\n"
                   + json.dumps({"no_metric_key": 1}) + "\n",
            stderr="")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench.orchestrate() == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["ok"] is True and out["value"] == 7.0


def test_wedge_emits_structured_last_good(bench, monkeypatch, capsys):
    json.dump({"value": 99.0, "vs_baseline": 12.0},
              open(bench.LAST_GOOD_PATH, "w"))
    monkeypatch.setattr(bench, "_probe_healthy", lambda: False)
    assert bench.orchestrate() == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["ok"] is False
    assert out["value"] == 99.0 and out["vs_baseline"] == 12.0
    assert out["reason"].startswith("tunnel_wedged")
    assert out["last_good"]["value"] == 99.0


def test_inner_failure_then_wedge_reports_rc(bench, monkeypatch, capsys):
    monkeypatch.setattr(bench, "_probe_healthy", lambda: True)

    def fake_run(cmd, **kw):
        return types.SimpleNamespace(returncode=1, stdout="", stderr="boom")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench.orchestrate() == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["ok"] is False and out["reason"] == "inner_rc=1"


def test_inner_timeout_is_caught(bench, monkeypatch, capsys):
    monkeypatch.setattr(bench, "_probe_healthy", lambda: True)

    def fake_run(cmd, **kw):
        raise subprocess.TimeoutExpired(cmd, 1)

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench.orchestrate() == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["ok"] is False and out["reason"] == "inner_timeout"
