"""Summarize a ``jax.profiler`` trace: device step time + kernel self-times.

The axon relay makes wall-clock q/s swing ±30% run to run; the profiled
device step is the only stable number (BASELINE.md "variance source").
This tool turns a trace directory (``<train_dir>/profile`` as written by
``--train.profile_steps``, or any ancestor of ``plugins/profile/*/``)
into that number plus a kernel breakdown:

    python tools/trace_summary.py /tmp/run/profile --steps 384 [--top 12]

- **device step ms** = total "XLA Modules" device time / ``--steps``
  (the number of optimizer steps the trace spans — ``profile_steps``).
- **kernel table** = per-op SELF time on the "XLA Ops" device track.
  Events there nest (the ``while`` scan body encloses every kernel it
  dispatches), so raw durations double-count; self time subtracts each
  event's children via an interval sweep.

Output is one human table on stderr and ONE JSON line on stdout
(``{"device_step_ms": ..., "modules_ms": ..., "ops": {...}}``) so other
scripts (bench comparisons, the int8-store A/B) can consume it.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
from typing import Dict, List, Tuple


def find_trace(path: str) -> str:
    """Newest ``*.trace.json.gz`` under ``path`` (searched recursively)."""
    if os.path.isfile(path):
        return path
    hits = glob.glob(os.path.join(path, "**", "*.trace.json.gz"),
                     recursive=True)
    if not hits:
        raise FileNotFoundError(f"no *.trace.json.gz under {path}")
    return max(hits, key=os.path.getmtime)


def load_events(trace_file: str) -> List[dict]:
    with gzip.open(trace_file, "rt") as fh:
        return json.load(fh).get("traceEvents", [])


def device_tracks(events: List[dict]) -> Tuple[List[int], Dict[Tuple[int, int], str]]:
    """TPU device pids + {(pid, tid): thread name} metadata."""
    pids = [e["pid"] for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "TPU" in e["args"].get("name", "")]
    tids = {(e["pid"], e["tid"]): e["args"].get("name", "")
            for e in events
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    return pids, tids


def self_times(track: List[dict]) -> Dict[str, float]:
    """Per-name self time (us) for possibly-nested complete events.

    Sorted by (start, -dur), a stack of enclosing intervals attributes
    each event's duration to itself and subtracts it from its parent —
    one O(n log n) sweep, no tree construction.
    """
    track = sorted(track, key=lambda e: (e["ts"], -e.get("dur", 0.0)))
    out: collections.Counter = collections.Counter()
    stack: List[Tuple[float, str, float]] = []  # (end, name, self_us)
    for e in track:
        ts, dur = e["ts"], e.get("dur", 0.0)
        while stack and stack[-1][0] <= ts + 1e-9:
            end, name, self_us = stack.pop()
            out[name] += self_us
        if stack:
            end, name, self_us = stack[-1]
            stack[-1] = (end, name, self_us - dur)
        stack.append((ts + dur, e["name"], dur))
    for _, name, self_us in stack:
        out[name] += self_us
    return dict(out)


def summarize(path: str, steps: int | None, top: int) -> dict:
    trace_file = find_trace(path)
    events = load_events(trace_file)
    pids, tids = device_tracks(events)
    if not pids:
        raise SystemExit(f"no TPU device pid in {trace_file} "
                         "(CPU-only trace?)")
    modules_us = 0.0
    # Per-(pid, tid) op tracks: events from different devices overlap in
    # time, so pooling them into ONE interval sweep would treat device B's
    # events as children of device A's (negative/garbage self-times).
    # Sweep each device track separately and sum the per-name totals.
    ops_tracks: Dict[Tuple[int, int], List[dict]] = \
        collections.defaultdict(list)
    dispatches = 0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in pids:
            continue
        name = tids.get((e["pid"], e["tid"]), "")
        if name == "XLA Modules":
            modules_us += e.get("dur", 0.0)
            dispatches += 1
        elif name == "XLA Ops":
            ops_tracks[(e["pid"], e["tid"])].append(e)
    ops: collections.Counter = collections.Counter()
    if top:  # the sweep is O(n log n) over a possibly huge track — skip
        for track in ops_tracks.values():  # it when only modules_ms is
            ops.update(self_times(track))  # wanted (top=0)
    n_dev = len(pids)
    result = {
        "trace": trace_file,
        "devices": n_dev,
        "dispatches": dispatches,
        "modules_ms": round(modules_us / 1000.0 / n_dev, 3),
        "ops": {k: round(v / 1000.0 / n_dev, 3)
                for k, v in sorted(ops.items(), key=lambda kv: -kv[1])[:top]},
    }
    if steps:
        result["steps"] = steps
        result["device_step_ms"] = round(modules_us / 1000.0 / n_dev / steps,
                                         4)
    return result


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("path", help="trace dir (or file)")
    ap.add_argument("--steps", type=int, default=None,
                    help="optimizer steps the trace spans -> ms/step")
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()
    res = summarize(args.path, args.steps, args.top)
    print(f"trace: {res['trace']}", file=sys.stderr)
    print(f"devices={res['devices']} dispatches={res['dispatches']} "
          f"modules={res['modules_ms']:.1f} ms"
          + (f"  ->  {res['device_step_ms']:.3f} ms/step"
             if "device_step_ms" in res else ""), file=sys.stderr)
    for name, ms in res["ops"].items():
        line = f"  {ms:9.2f} ms  {name[:100]}"
        if "steps" in res:
            line += f"  ({ms / res['steps']:.4f} ms/step)"
        print(line, file=sys.stderr)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
