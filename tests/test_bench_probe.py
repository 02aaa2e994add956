"""bench.py backend-probe contract (VERDICT r3 weak #1 + round-4 review):
transient relay outages are retried for the full budget, deterministic
probe errors fail fast, and stdout carries exactly one JSON line either
way. No accelerator needed — subprocess.run is monkeypatched."""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _Result:
    def __init__(self, rc, stderr=b""):
        self.returncode = rc
        self.stderr = stderr


def test_probe_returns_on_success(bench, monkeypatch):
    calls = []
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: calls.append(1) or _Result(0))
    bench._probe_backend(budget_s=60.0, retry_every_s=0.01)
    assert len(calls) == 1


def test_probe_fails_fast_on_repeated_deterministic_error(
        bench, monkeypatch, capsys):
    calls = []
    monkeypatch.setattr(
        subprocess, "run",
        lambda *a, **k: calls.append(1) or _Result(1, b"ImportError: broken"))
    with pytest.raises(SystemExit) as exc:
        bench._probe_backend(budget_s=3600.0, retry_every_s=0.01)
    assert exc.value.code == 2
    # two identical non-timeout failures suffice — not the full 60-min budget
    assert len(calls) == 2
    out_lines = [ln for ln in capsys.readouterr().out.splitlines() if ln]
    assert len(out_lines) == 1, "stdout must carry exactly one JSON line"
    err = json.loads(out_lines[0])
    assert err["value"] is None and "ImportError" in err["error"]


def test_probe_retries_timeouts_until_budget(bench, monkeypatch, capsys):
    calls = []

    def fake_run(*a, timeout=None, **k):
        calls.append(1)
        raise subprocess.TimeoutExpired(cmd="probe", timeout=timeout)

    monkeypatch.setattr(subprocess, "run", fake_run)
    with pytest.raises(SystemExit) as exc:
        # zero-ish budget: the first timeout consumes it; the point is that
        # a timeout alone never triggers the deterministic fail-fast path
        bench._probe_backend(
            budget_s=0.05, retry_every_s=0.01, attempt_timeout_s=0.01)
    assert exc.value.code == 2
    assert len(calls) >= 1
    out_lines = [ln for ln in capsys.readouterr().out.splitlines() if ln]
    assert len(out_lines) == 1
    assert json.loads(out_lines[0])["value"] is None


def test_probe_recovers_after_transient_failures(bench, monkeypatch):
    seq = [_Result(1, b"relay resetting"), _Result(0)]
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: seq.pop(0))
    bench._probe_backend(budget_s=60.0, retry_every_s=0.01)
    assert not seq  # both attempts consumed; second succeeded


def test_sweep_writes_artifact_and_prints_protocol_batch(
        bench, monkeypatch, tmp_path, capsys):
    """--sweep measures each batch, writes scripts/BATCH_SWEEP.json, and the
    stdout JSON line is the protocol batch (64) when present."""
    import json

    monkeypatch.setattr(bench, "_probe_backend", lambda **kw: None)
    monkeypatch.setattr(
        bench, "measure",
        lambda b: {"metric": "m", "value": float(b), "unit": "u",
                   "vs_baseline": 1.0, "batch": b,
                   "onchip_window_ms": 2.0},
    )
    # artifact path is repo-anchored (not cwd-relative); patch it into the
    # tmp tree so the test never touches the real scripts/BATCH_SWEEP.json
    monkeypatch.chdir(tmp_path)  # proves cwd doesn't matter
    artifact = tmp_path / "BATCH_SWEEP.json"
    monkeypatch.setattr(bench, "SWEEP_ARTIFACT", str(artifact))
    bench.main(["--sweep", "512,64"])
    out = capsys.readouterr().out.strip().splitlines()
    line = json.loads(out[-1])
    assert line["batch"] == 64  # protocol batch wins regardless of order
    sweep = json.loads(artifact.read_text())
    assert set(sweep) == {"64", "512"}
    assert sweep["512"]["value"] == 512.0


def test_sweep_survives_one_point_failing(bench, monkeypatch, tmp_path,
                                           capsys):
    """A relay flake on one sweep point must not lose the others: the
    artifact records the error for the failed batch, the good points stay,
    and stdout still carries the protocol-batch JSON line (the 2026-08-19
    capture lost a good batch-64 point to a batch-512 d2h failure)."""
    import json

    monkeypatch.setattr(bench, "_probe_backend", lambda **kw: None)

    def fake_measure(b):
        if b == 512:
            raise RuntimeError("TPU backend error (FailedPrecondition)")
        return {"metric": "m", "value": float(b), "unit": "u",
                "vs_baseline": 1.0, "batch": b, "onchip_window_ms": 2.0}

    monkeypatch.setattr(bench, "measure", fake_measure)
    artifact = tmp_path / "BATCH_SWEEP.json"
    monkeypatch.setattr(bench, "SWEEP_ARTIFACT", str(artifact))
    bench.main(["--sweep", "64,512"])
    out = capsys.readouterr().out.strip().splitlines()
    assert json.loads(out[-1])["batch"] == 64
    sweep = json.loads(artifact.read_text())
    assert sweep["64"]["value"] == 64.0
    assert "FailedPrecondition" in sweep["512"]["error"]


def test_sweep_all_points_failing_exits_nonzero(bench, monkeypatch, tmp_path,
                                                capsys):
    import json

    monkeypatch.setattr(bench, "_probe_backend", lambda **kw: None)

    def fake_measure(b):
        raise RuntimeError("relay down")

    monkeypatch.setattr(bench, "measure", fake_measure)
    artifact = tmp_path / "BATCH_SWEEP.json"
    monkeypatch.setattr(bench, "SWEEP_ARTIFACT", str(artifact))
    with pytest.raises(SystemExit) as exc:
        bench.main(["--sweep", "64,512"])
    assert exc.value.code == 1
    out_lines = [ln for ln in capsys.readouterr().out.splitlines() if ln]
    assert len(out_lines) == 1, "stdout must carry exactly one JSON line"
    err = json.loads(out_lines[0])
    assert err["value"] is None and "relay down" in err["error"]


def test_default_run_prints_measure_result(bench, monkeypatch, capsys):
    import json

    monkeypatch.setattr(bench, "_probe_backend", lambda **kw: None)
    monkeypatch.setattr(bench, "measure", lambda b: {"batch": b, "value": 1.0})
    bench.main([])
    assert json.loads(capsys.readouterr().out.strip())["batch"] == 64
