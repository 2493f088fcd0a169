"""bench.py supervisor: retry/passthrough logic, no devices touched.

The supervisor exists because the driver's end-of-round bench capture runs
unattended on a tunneled TPU that restarts at random and can wedge an
in-flight remote-compile RPC (three observed modes: broken pipe, lost
reply, no-socket hang). These tests stub subprocess.run — nothing here
compiles or dispatches.
"""

import json
import subprocess

import pytest

import bench

pytestmark = pytest.mark.fast

JSON_LINE = b'{"metric":"m","value":1.0,"unit":"u","vs_baseline":2.0}'


class _R:
    def __init__(self, rc, out):
        self.returncode = rc
        self.stdout = out


def _patch(monkeypatch, runs, probes_ok=True):
    """Install a subprocess.run stub; `runs` is a list of per-call
    behaviors (an Exception instance to raise, or a _R to return)."""
    monkeypatch.setenv("BENCH_PROBE_LIMIT", "1" if probes_ok else "0")
    monkeypatch.setenv("BENCH_ATTEMPTS", str(len(runs)))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    calls = []

    def fake(cmd, **kw):
        # probe calls target tools/tpu_up.py; measurement calls re-exec
        # bench.py itself
        if any("tpu_up" in str(c) for c in cmd):
            calls.append("probe")
            return _R(0, b"")
        calls.append("run")
        step = runs[sum(c == "run" for c in calls) - 1]
        if isinstance(step, Exception):
            raise step
        return step

    monkeypatch.setattr(subprocess, "run", fake)
    return calls


def test_passthrough_last_json_line(monkeypatch, capsys):
    _patch(monkeypatch, [_R(0, b"compile log noise\n" + JSON_LINE + b"\n")])
    assert bench._supervise() == 0
    out = capsys.readouterr().out.strip()
    assert json.loads(out)["metric"] == "m"
    assert "noise" not in out


def test_retries_after_timeout_then_succeeds(monkeypatch, capsys):
    _patch(monkeypatch, [subprocess.TimeoutExpired("x", 1),
                         _R(0, JSON_LINE + b"\n")])
    assert bench._supervise() == 0
    assert json.loads(capsys.readouterr().out.strip())["value"] == 1.0


def test_retries_on_nonzero_rc_and_bad_json(monkeypatch, capsys):
    _patch(monkeypatch, [_R(1, b""), _R(0, b"not json\n"),
                         _R(0, JSON_LINE + b"\n")])
    assert bench._supervise() == 0


def test_all_attempts_fail_is_nonzero(monkeypatch, capsys):
    _patch(monkeypatch, [_R(1, b""), subprocess.TimeoutExpired("x", 1)])
    assert bench._supervise() == 1
    assert capsys.readouterr().out.strip() == ""  # no lying JSON on failure


def test_waits_for_live_tpu_holder(monkeypatch, capsys, tmp_path):
    """The driver's end-of-round bench must not dispatch while the eval
    chain / follow-up queue holds the TPU (two concurrent TPU-touching
    processes deadlock the tunnel) — it waits on the advertised pidfiles
    until the holder exits or the bounded wait expires."""
    import os
    pf = tmp_path / "chain.pid"
    pf.write_text(str(os.getpid()))  # this test process: always alive
    monkeypatch.setenv("BENCH_HOLDER_PIDFILES", str(pf))
    monkeypatch.setenv("BENCH_HOLDER_WAIT", "120")
    sleeps = []
    _patch(monkeypatch, [_R(0, JSON_LINE + b"\n")])
    monkeypatch.setattr(bench.time, "sleep", lambda s: sleeps.append(s))
    assert bench._supervise() == 0
    err = capsys.readouterr().err
    assert err.count("TPU held by") == 2  # 120s bound / 60s polls


def test_dead_holder_pidfile_does_not_block(monkeypatch, capsys, tmp_path):
    pf = tmp_path / "queue.pid"
    pf.write_text("999999999")  # no such pid
    monkeypatch.setenv("BENCH_HOLDER_PIDFILES", str(pf))
    monkeypatch.setenv("BENCH_HOLDER_WAIT", "5400")
    _patch(monkeypatch, [_R(0, JSON_LINE + b"\n")])
    assert bench._supervise() == 0
    assert "TPU held by" not in capsys.readouterr().err
