"""Unit tests for tools/trace_summary's nested-event self-time sweep."""

import gzip
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.trace_summary import find_trace, self_times, summarize  # noqa: E402


def _ev(name, ts, dur):
    return {"name": name, "ts": ts, "dur": dur, "ph": "X"}


def test_self_times_subtracts_children():
    # while [0, 100) encloses two kernels; self = 100 - 30 - 50 = 20
    track = [_ev("while", 0, 100), _ev("k1", 10, 30), _ev("k2", 45, 50)]
    out = self_times(track)
    assert out == {"while": 20, "k1": 30, "k2": 50}


def test_self_times_deep_nesting_and_siblings():
    # a(0,100) > b(10,60) > c(20,30); d(80,15) is a's second child
    track = [_ev("a", 0, 100), _ev("b", 10, 60), _ev("c", 20, 30),
             _ev("d", 80, 15)]
    out = self_times(track)
    assert out == {"a": 100 - 60 - 15, "b": 60 - 30, "c": 30, "d": 15}


def test_self_times_repeated_names_accumulate():
    track = [_ev("loop", 0, 50), _ev("k", 5, 10), _ev("k", 20, 10),
             _ev("loop", 60, 50), _ev("k", 70, 40)]
    out = self_times(track)
    assert out == {"loop": (50 - 20) + (50 - 40), "k": 60}


def test_self_times_back_to_back_boundary():
    # second event starts exactly when first ends: siblings, not nested
    track = [_ev("x", 0, 10), _ev("y", 10, 10)]
    assert self_times(track) == {"x": 10, "y": 10}


def test_summarize_end_to_end(tmp_path):
    # Minimal synthetic trace: one TPU pid with Modules + nested Ops.
    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "pid": 3, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 701, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "X", "pid": 3, "tid": 2, "name": "jit_step", "ts": 0,
         "dur": 4000.0},  # 4 ms module
        {"ph": "X", "pid": 3, "tid": 3, "name": "while.5", "ts": 0,
         "dur": 4000.0},
        {"ph": "X", "pid": 3, "tid": 3, "name": "kern.1", "ts": 100,
         "dur": 3000.0},
        # host events must be ignored
        {"ph": "X", "pid": 701, "tid": 1, "name": "dispatch", "ts": 0,
         "dur": 9999.0},
    ]
    d = tmp_path / "plugins" / "profile" / "run"
    d.mkdir(parents=True)
    with gzip.open(d / "vm.trace.json.gz", "wt") as fh:
        json.dump({"traceEvents": events}, fh)
    res = summarize(str(tmp_path), steps=2, top=5)
    assert res["devices"] == 1 and res["dispatches"] == 1
    assert res["modules_ms"] == 4.0
    assert res["device_step_ms"] == 2.0
    assert res["ops"] == {"kern.1": 3.0, "while.5": 1.0}
    assert find_trace(str(tmp_path)).endswith("vm.trace.json.gz")


def test_summarize_multi_device_tracks_swept_separately(tmp_path):
    """Two devices' op tracks overlap in time; pooling them into one
    interval sweep would nest device B's `while` inside device A's and
    corrupt (even negate) self-times. Each (pid, tid) track must be
    swept separately and the per-name totals summed."""
    events = []
    for pid in (3, 4):
        events += [
            {"ph": "M", "pid": pid, "name": "process_name",
             "args": {"name": f"/device:TPU:{pid - 3}"}},
            {"ph": "M", "pid": pid, "tid": 2, "name": "thread_name",
             "args": {"name": "XLA Modules"}},
            {"ph": "M", "pid": pid, "tid": 3, "name": "thread_name",
             "args": {"name": "XLA Ops"}},
            # Identical concurrent timelines on both devices:
            # while [0,4000) > kern [100,3100)
            {"ph": "X", "pid": pid, "tid": 2, "name": "jit_step",
             "ts": 0, "dur": 4000.0},
            {"ph": "X", "pid": pid, "tid": 3, "name": "while.5",
             "ts": 0, "dur": 4000.0},
            {"ph": "X", "pid": pid, "tid": 3, "name": "kern.1",
             "ts": 100, "dur": 3000.0},
        ]
    d = tmp_path / "plugins" / "profile" / "run"
    d.mkdir(parents=True)
    with gzip.open(d / "vm.trace.json.gz", "wt") as fh:
        json.dump({"traceEvents": events}, fh)
    res = summarize(str(tmp_path), steps=2, top=5)
    assert res["devices"] == 2 and res["dispatches"] == 2
    assert res["modules_ms"] == 4.0      # per-device mean
    assert res["device_step_ms"] == 2.0
    # Per-device self-times: kern 3 ms, while 1 ms (NOT while -3 ms).
    assert res["ops"] == {"kern.1": 3.0, "while.5": 1.0}


def test_summarize_top_zero_skips_op_sweep(tmp_path):
    """top=0 (bench.py's final-emit path) wants only modules_ms /
    device_step_ms — the op sweep must be skipped entirely."""
    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "pid": 3, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "X", "pid": 3, "tid": 2, "name": "jit_step", "ts": 0,
         "dur": 1000.0},
        {"ph": "X", "pid": 3, "tid": 3, "name": "kern.1", "ts": 0,
         "dur": 900.0},
    ]
    d = tmp_path / "plugins" / "profile" / "run"
    d.mkdir(parents=True)
    with gzip.open(d / "vm.trace.json.gz", "wt") as fh:
        json.dump({"traceEvents": events}, fh)
    res = summarize(str(tmp_path), steps=1, top=0)
    assert res["ops"] == {}
    assert res["device_step_ms"] == 1.0


@pytest.mark.slow
def test_profile_step_tool_smoke(tmp_path):
    """tools/profile_step.py end-to-end on the CPU backend: drives a
    short resident fit with tracing and prints one JSON line (the kernel
    table is TPU-only, so on CPU it reports model/backend alone)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "profile_step.py"),
         "--model.model", "vlmap", "--steps", "2", "--top", "3",
         "--size", "64", "--data.vocab_size", "64",
         "--data.pool5_dim", "32", "--model.num_candidates", "8"],
        capture_output=True, text=True, env=env, timeout=560)
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    assert d["model"] == "vlmap" and d["backend"] == "cpu"
