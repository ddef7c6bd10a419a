"""bench.py output protocol: EXACTLY ONE JSON line, rc 0, in every path.

These test the emission logic in-process (no TPU, no subprocess probes, no
real watchdog thread): idempotent emit, unreachable-TPU gating, and the
crash-guard in main. The driver parses this line — a protocol regression
loses the round's perf evidence (round 2 recorded nothing; VERDICT.md #1).
"""

import importlib.util
import io
import json
import sys


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", "/root/repo/bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # top level is light: no jax import
    return mod


def _capture(fn):
    old = sys.stdout
    sys.stdout = buf = io.StringIO()
    try:
        fn()
    finally:
        sys.stdout = old
    return buf.getvalue()


def test_emit_idempotent():
    bench = _load_bench()
    bench._state["value"] = 123.0
    bench._state["extras"]["compile_s"] = 9.5

    out = _capture(lambda: (bench._emit_line(), bench._emit_line()))
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert len(lines) == 1, "second emit must be a no-op"
    rec = json.loads(lines[0])
    assert rec["value"] == 123.0
    assert rec["vs_baseline"] == round(123.0 / bench.A100_BASELINE_CLIPS_PER_SEC, 3)
    assert rec["compile_s"] == 9.5
    assert rec["unit"] == "clips/s"


def test_private_extras_hidden():
    bench = _load_bench()
    bench._state["extras"]["_scratch"] = "internal"
    bench._state["extras"]["public"] = 1
    rec = json.loads(_capture(bench._emit_line).strip())
    assert "public" in rec and "_scratch" not in rec


def test_unreachable_tpu_path():
    """Dead tunnel: _run returns with the reason recorded; main's single
    emit then carries value 0 + tpu_unreachable (validated live against an
    actually-dead relay; this pins the logic)."""
    bench = _load_bench()
    bench._tpu_alive = lambda timeout_s=0: False
    bench._time_left = lambda: 100.0  # < 420: give up immediately

    bench._run(bench._state["extras"])
    rec = json.loads(_capture(bench._emit_line).strip())
    assert rec["value"] == 0.0
    assert rec["tpu_unreachable"] is True
    assert rec["probe_attempts"] == 1


def test_main_crash_guard_emits(monkeypatch):
    """Any raise inside _run must still produce the one line and exit 0.

    The real watchdog thread and os._exit are stubbed: a live watchdog
    would os._exit(0) the WHOLE pytest process when the module budget
    expires mid-suite."""
    bench = _load_bench()

    def boom(extras):
        extras["partial"] = 1
        raise RuntimeError("tunnel died mid-measure")

    exit_codes = []
    monkeypatch.setattr(bench, "_run", boom)
    monkeypatch.setattr(bench, "_watchdog", lambda: None)
    monkeypatch.setattr(bench.os, "_exit", exit_codes.append)
    out = _capture(bench.main)
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["partial"] == 1
    assert "tunnel died" in rec["error"]
    assert exit_codes == [0]
