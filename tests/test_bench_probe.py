"""The headline bench's backend probe: retries through hangs and fast
failures, proceeds on success, and gives up (without raising) after the
attempt budget so the real init produces the error."""

import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


class _FakeResult:
    def __init__(self, returncode=0, stderr=b""):
        self.returncode = returncode
        self.stderr = stderr


def _patched(monkeypatch, outcomes):
    """Install a subprocess.run stub that pops one scripted outcome per
    probe: 'hang' raises TimeoutExpired, 'fail' exits 1, 'ok' exits 0."""
    calls = []

    def fake_run(cmd, timeout=None, capture_output=None):
        outcome = outcomes[len(calls)]
        calls.append(outcome)
        if outcome == "hang":
            raise subprocess.TimeoutExpired(cmd, timeout)
        if outcome == "fail":
            return _FakeResult(1, b"RuntimeError: UNAVAILABLE: tunnel down")
        return _FakeResult(0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    return calls


def test_probe_returns_on_first_success(monkeypatch):
    calls = _patched(monkeypatch, ["ok"])
    bench._wait_for_backend()
    assert calls == ["ok"]


def test_probe_retries_through_hang_and_failure(monkeypatch):
    calls = _patched(monkeypatch, ["hang", "fail", "ok"])
    bench._wait_for_backend()
    assert calls == ["hang", "fail", "ok"]


def test_probe_gives_up_without_raising(monkeypatch, capsys):
    calls = _patched(monkeypatch, ["fail"] * 4)
    bench._wait_for_backend(max_attempts=4)
    assert len(calls) == 4
    captured = capsys.readouterr()
    assert "proceeding anyway" in captured.err
    # stdout stays clean: the one-JSON-line contract
    assert captured.out == ""
