"""bench.py capture resilience (round-3 postmortem: BENCH_r03.json was
rc:1 with a raw traceback because the axon relay was down at capture
time and backend init hung).  The parent orchestrator must (a) relay a
child RESULT line verbatim on success, (b) retry through transient
probe failures, and (c) emit a clean parseable JSON error record —
exit 0 — when the backend stays down."""
import json
import subprocess
import sys

import pytest

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
import bench  # noqa: E402


class _R:
    def __init__(self, rc=0, out="", err=""):
        self.returncode, self.stdout, self.stderr = rc, out, err


def _run(capsys, monkeypatch, fake_run):
    monkeypatch.setattr(bench, "BACKOFFS_S", (0, 0, 0))
    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    rc = bench.main()
    line = capsys.readouterr().out.strip()
    assert "\n" not in line, "must print exactly ONE line"
    return rc, json.loads(line)


def test_happy_path_relays_child_result(capsys, monkeypatch):
    result = {"metric": bench.METRIC, "value": 555.0, "unit": "Mrays/s",
              "vs_baseline": 1.11, "window_mrays": [550.0, 555.0, 560.0]}

    def fake_run(cmd, **kw):
        if "-c" in cmd:                       # probe
            return _R(out="TPU_0\n")
        return _R(out="garbage\nRESULT " + json.dumps(result) + "\n")

    rc, rec = _run(capsys, monkeypatch, fake_run)
    assert rc == 0 and rec == result


def test_retries_through_transient_probe_failure(capsys, monkeypatch):
    calls = {"probe": 0}
    result = {"metric": bench.METRIC, "value": 512.0, "unit": "Mrays/s",
              "vs_baseline": 1.024}

    def fake_run(cmd, timeout, **kw):
        if "-c" in cmd:
            calls["probe"] += 1
            if calls["probe"] == 1:           # first probe: relay down
                raise subprocess.TimeoutExpired(cmd, timeout)
            return _R(out="TPU_0\n")
        return _R(out="RESULT " + json.dumps(result) + "\n")

    rc, rec = _run(capsys, monkeypatch, fake_run)
    assert rc == 0 and rec["value"] == 512.0 and calls["probe"] == 2


def test_outage_emits_clean_error_record(capsys, monkeypatch):
    def fake_run(cmd, timeout, **kw):
        raise subprocess.TimeoutExpired(cmd, timeout)

    rc, rec = _run(capsys, monkeypatch, fake_run)
    assert rc == 0
    assert rec["value"] == 0.0 and rec["vs_baseline"] == 0.0
    assert "unreachable" in rec["error"]
    # the driver's schema keys are all present even in the error record
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)


def test_failing_child_rc_becomes_error_record(capsys, monkeypatch):
    def fake_run(cmd, **kw):
        if "-c" in cmd:
            return _R(out="TPU_0\n")
        return _R(rc=1, err="Traceback ...\nRuntimeError: relay died\n")

    rc, rec = _run(capsys, monkeypatch, fake_run)
    assert rc == 0 and rec["value"] == 0.0
    assert "relay died" in rec["error"]


def test_live_outage_path_end_to_end(tmp_path):
    """Actually execute bench.py with an unreachable backend simulated by
    a 0-second probe timeout — the full subprocess orchestration."""
    env = dict(__import__("os").environ,
               VOLQ_BENCH_PROBE_TIMEOUT="0.01", VOLQ_BENCH_BACKOFFS="0")
    r = subprocess.run([sys.executable, bench.__file__], timeout=120,
                       capture_output=True, text=True, env=env)
    assert r.returncode == 0
    rec = json.loads(r.stdout.strip())
    assert rec["value"] == 0.0 and "error" in rec
