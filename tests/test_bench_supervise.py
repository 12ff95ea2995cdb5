"""bench.py supervision ladder: mode resolution, retries, hang handling.

The supervised parent is plain stdlib logic (no jax), so it's unit-tested
with a stubbed subprocess.Popen — the real-TPU behavior it guards against
(indefinite remote-compile hangs) is documented in docs/DEVELOPMENT.md.
"""

import importlib.util
import json
import pathlib
import subprocess
import sys

import pytest

_spec = importlib.util.spec_from_file_location(
    "bench", pathlib.Path(__file__).resolve().parent.parent / "bench.py"
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


class _FakeProc:
    def __init__(self, out: bytes, rc: int = 0, hang: bool = False):
        self._out = out
        self.returncode = rc
        self._hang = hang
        self.pid = 4242

    def communicate(self, timeout=None):
        if self._hang:
            raise subprocess.TimeoutExpired(cmd="child", timeout=timeout)
        return self._out, b""

    def wait(self):
        return self.returncode


def _run(monkeypatch, capsys, argv, behaviors):
    """behaviors: list of (stdout, rc, hang) per attempt; returns
    (exit_code, printed_json, child_argvs)."""
    calls = []

    def fake_popen(child_argv, **kw):
        calls.append(list(child_argv))
        out, rc, hang = behaviors[len(calls) - 1]
        return _FakeProc(out, rc, hang)

    monkeypatch.setattr(bench.subprocess, "Popen", fake_popen)
    monkeypatch.setattr(bench.os, "killpg", lambda *a: None)
    rc = bench.supervise(argv)
    printed = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(printed), calls


_OK = json.dumps({"metric": "chunk_p50_ms", "value": 1.0}).encode()


def _mode_of(argv):
    return argv[argv.index("--mode") + 1]


def test_auto_mode_ladder_fused_staged_then_no_pallas(monkeypatch, capsys):
    rc, out, calls = _run(
        monkeypatch, capsys, ["--attempts", "3"],
        [(b"", 1, False), (b"", 0, True), (_OK, 0, False)],
    )
    assert rc == 0 and out["metric"] == "chunk_p50_ms"
    assert [_mode_of(c) for c in calls] == ["fused", "staged", "staged"]
    # the final reliability rung disables the Pallas resblock kernel
    assert ["--no-pallas-resblocks" in c for c in calls] == [False, False, True]


def test_auto_succeeds_first_fused_attempt(monkeypatch, capsys):
    rc, out, calls = _run(monkeypatch, capsys, [], [(_OK, 0, False)])
    assert rc == 0
    assert len(calls) == 1 and _mode_of(calls[0]) == "fused"


def test_explicit_mode_is_not_rewritten(monkeypatch, capsys):
    rc, out, calls = _run(
        monkeypatch, capsys, ["--mode", "staged", "--attempts", "2"],
        [(b"", 0, True), (_OK, 0, False)],
    )
    assert rc == 0
    assert [_mode_of(c) for c in calls] == ["staged", "staged"]
    # the user's --mode pair was stripped before re-adding (no duplicates)
    assert all(c.count("--mode") == 1 for c in calls)


def test_all_attempts_exhausted_reports_error_json(monkeypatch, capsys):
    # third behavior = the trivial-compile canary (hangs → service DOWN)
    rc, out, calls = _run(
        monkeypatch, capsys, ["--attempts", "2"],
        [(b"", 0, True), (b"", 0, True), (b"", 0, True)],
    )
    assert rc == 1
    assert out["value"] == -1.0 and "error" in out["extra"]
    assert "DOWN" in out["extra"]["compile_service"]
    assert len(calls) == 3  # 2 attempts + canary


def test_exhausted_with_healthy_service_says_service_up(monkeypatch, capsys):
    rc, out, calls = _run(
        monkeypatch, capsys, ["--attempts", "2"],
        [(b"", 0, True), (b"", 0, True), (b"65536.0\n", 0, False)],
    )
    assert rc == 1
    assert out["extra"]["compile_service"] == "up"


def test_mode_equals_form_is_stripped(monkeypatch, capsys):
    """argparse is last-wins: a leaked '--mode=auto' after the ladder's
    '--mode staged' would silently run every rung fused (ADVICE r2)."""
    rc, out, calls = _run(
        monkeypatch, capsys, ["--mode=auto", "--attempts", "3"],
        [(b"", 1, False), (b"", 0, True), (_OK, 0, False)],
    )
    assert rc == 0
    assert [_mode_of(c) for c in calls] == ["fused", "staged", "staged"]
    assert all(not any(a.startswith("--mode=") for a in c) for c in calls)
