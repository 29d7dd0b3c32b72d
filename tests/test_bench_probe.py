"""The headline bench's backend probe: retries through hangs and fast
failures, proceeds on success, and gives up (without raising) after the
attempt budget so the real init produces the error. The probe uses Popen +
process-group kill + file-redirected stderr (not subprocess.run with
capture_output, whose post-timeout communicate() can block forever)."""

import os
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


class _FakeProc:
    """Scripted probe child: 'hang' raises TimeoutExpired on the first
    timed wait (then returns -9 after the kill), 'fail' writes an
    UNAVAILABLE line to the stderr file and exits 1, 'ok' exits 0."""

    def __init__(self, outcome, stderr_file):
        self.outcome = outcome
        self.pid = 999999  # os.killpg is stubbed; never a real pgid
        self._stderr = stderr_file
        self._killed = False

    def wait(self, timeout=None):
        if self.outcome == "hang":
            if timeout is not None and not self._killed:
                raise subprocess.TimeoutExpired("probe", timeout)
            return -9
        if self.outcome == "fail":
            self._stderr.write(b"RuntimeError: UNAVAILABLE: tunnel down\n")
            self._stderr.flush()
            return 1
        return 0


def _patched(monkeypatch, outcomes):
    calls = []
    killed = []

    def fake_popen(cmd, stdout=None, stderr=None, start_new_session=False):
        outcome = outcomes[len(calls)]
        calls.append(outcome)
        assert start_new_session, "probe must own its process group"
        return _FakeProc(outcome, stderr)

    def fake_killpg(pgid, sig):
        killed.append(pgid)

    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    monkeypatch.setattr(os, "killpg", fake_killpg)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    return calls, killed


def test_probe_returns_on_first_success(monkeypatch):
    calls, _ = _patched(monkeypatch, ["ok"])
    bench._wait_for_backend()
    assert calls == ["ok"]


def test_probe_retries_through_hang_and_failure(monkeypatch):
    calls, killed = _patched(monkeypatch, ["hang", "fail", "ok"])
    bench._wait_for_backend()
    assert calls == ["hang", "fail", "ok"]
    assert killed == [999999]  # the hung probe's whole group was killed


def test_probe_attempts_from_env(monkeypatch):
    # unattended runs tune patience via BENCH_PROBE_ATTEMPTS
    calls, _ = _patched(monkeypatch, ["fail", "fail", "ok"])
    monkeypatch.setenv("BENCH_PROBE_ATTEMPTS", "2")
    bench._wait_for_backend()
    assert calls == ["fail", "fail"]  # gave up after the env budget


def test_probe_gives_up_without_raising(monkeypatch, capsys):
    calls, _ = _patched(monkeypatch, ["fail"] * 4)
    bench._wait_for_backend(max_attempts=4)
    assert len(calls) == 4
    captured = capsys.readouterr()
    assert "proceeding anyway" in captured.err
    assert "UNAVAILABLE" in captured.err  # stderr tail surfaced in the message
    # stdout stays clean: the one-JSON-line contract
    assert captured.out == ""
