"""Benchmark: honest end-to-end training throughput on real hardware.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

North-star metric (BASELINE.json): VQA v2 questions/sec/chip at global batch
256. This drives the PRODUCT path end-to-end: a multi-batch corpus in the
production layout (deduplicated f16 feature store + question table,
data/datasets.synthetic_vqa_joined) trained through the shared
``Trainer.fit_resident`` loop — resident index-table segments, two-level
on-device feature join, gather-free resident attention, train step, metric
fetch/logging cadence. Throughput is read from the trainer's own logged
128-step windows.

Driver-provability — THREE layers, one per observed failure mode:

1. **Supervisor + child (round-5)**: ``python bench.py`` is a JAX-free
   SUPERVISOR that runs the measurement in a child process
   (``BENCH_CHILD=1``) and retries it in a FRESH process when the child
   stalls producing zero windows. Rationale: BENCH_r04 spent its entire
   920 s budget stalled inside ``init_state`` on a relay outage — one
   incident voided the round's artifact — while runs minutes later
   landed fine. A healthy run costs ~300 s (200-470 s measured
   per-process relay cold start + ~60 s of windows), so killing a
   zero-window child at ``BENCH_STALL_KILL_SECS`` (500) leaves a second
   attempt enough budget inside ``BENCH_HARD_EXIT_SECS`` (900). A
   **pre-init relay probe was evaluated and rejected**: the cold start is
   charged per process on the FIRST jit dispatch (277 s trivial program,
   471 s under contention), so any probe cheap enough to be worth running
   cannot distinguish a dead relay from a healthy slow start, and a probe
   that pays the full cold start does not warm the child's. The retry IS
   the probe. The supervisor also SALVAGES: if a killed child had already
   produced windows (recovery arriving between polls), the supervisor
   summarizes ``metrics.jsonl`` itself and emits an ok line. Errors
   raised >60 s into an attempt (relay incidents surfacing as backend
   errors — measured FailedPrecondition ~600 s in) are retried; fast
   failures (<60 s: config errors) are not.
2. **Watchdog (round-3, kept as the in-child backstop)**: a daemon THREAD
   armed before the first JAX call (first fire 280 s,
   ``BENCH_WATCHDOG_SECS``; re-fires every 80 s) emits a ``"partial":
   true`` JSON line from whatever windows exist, because the axon backend
   probe was measured hanging >400 s inside a blocked C call where
   ``signal.alarm`` never runs. Exit is PROGRESS-ANCHORED (>=160 s of
   training after the cold start, AND no new windows since the previous
   fire — late-arriving windows re-arm it) or ``BENCH_HARD_EXIT_SECS``
   for true hangs. Zero-window fires after training started emit
   ``"status": "no_windows_yet_cold_start"`` (value 0.0 = "not
   measured", never "measured zero").
3. **Exception guard**: any mid-run exception still emits one parsable
   line (``status: error:<Type>``, rc=1); KeyboardInterrupt emits
   ``status: interrupted`` and re-raises so a manual Ctrl-C stays
   distinguishable from a backend failure.

**Statistics** (``_summarize``): value = trimmed mean (min/max dropped) of
the steady windows — first window discarded (jit compile + upload);
windows FASTER than the device physically is (>1.1× the profiled ceiling —
a relay fetch stall under-counts one window and over-counts the next)
merged harmonically into their predecessor (``impossible_windows_merged``;
the pre-merge raw values are kept in ``windows_qps_per_chip_raw`` so a
stale-ceiling merge of honest windows is auditable from the artifact
alone); then any LEADING windows below half the median dropped as the
relay's cold-start dispatch ramp (``ramp_windows_discarded``, never more
than half the list, and only a leading prefix — mid-run dips are real
contention and stay). The trim is proportional (~1/8 from each end) and
the default run is 24 windows (3072 steps, ~8 s of device compute) so the
estimator is dominated by steady windows, not the outlier budget.

**Profiled-step ceiling is DERIVED, not hand-maintained** (round-5): the
merge bound and the ``device_step_ms_profiled`` context field come from
``bench_profiled_step.json`` (written by every ``BENCH_PROFILE`` run,
keyed by model+variant); the in-code constant is only the fallback for a
missing artifact. ``profiled_step_source`` in the JSON says which was
used. With ``BENCH_PROFILE=<steps>`` the final JSON also carries
``device_step_ms_measured`` (this run's own profiler trace divided by the
exact dispatch-boundary-aligned step count — ``_traced_steps``) and the
derived ``ceiling_qps_per_chip_measured`` — the numbers the relay's ±30%
wall variance cannot touch.

Realistic scale: ``BENCH_STORE_GB=<float>`` sizes the synthetic corpus's
deduplicated f16 feature store to ~that many GB (tens of thousands of
rows at the production grid shape; cached like the default corpus), so
the headline runs with multi-GB HBM residency and realistic
scalar-prefetch row distances. Composes with ``BENCH_STORE_SHARDED`` /
``BENCH_QUANT``; all time budgets scale with the store (host-side
prenormalize + relay upload happen before the first window). The final
JSON then carries ``store_gb_f16`` / ``store_rows`` / ``hbm_gb_in_use``.

``vs_baseline`` semantics — FIXED from round 2 onward: the denominator is
the round-1 single-batch compute CEILING of 53,966 q/s/chip (the best
kernel-only number round 1 produced), so >1.0 means the full end-to-end
pipeline beats last round's best-case measurement. Round 1's BENCH_r01
used its own first measurement (28,466) as denominator; do not compare
``vs_baseline`` across r01/r02.

The reference never published throughput (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import threading
import time

# Persistent compilation cache: repeated bench runs skip the (remote,
# occasionally flaky) TPU compile service entirely.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import numpy as np

# BENCH_r01 recorded ceiling on 1x TPU v5e (questions/sec/chip, batch 256,
# single resident batch, compute only) — the FIXED bar every round's
# end-to-end pipeline number is measured against (see module docstring).
ROUND1_CEILING = 53966.0

# FALLBACK profiled device-only step time (ms) for the flagship resident
# config at batch 256 on 1x v5e — used only when bench_profiled_step.json
# is missing or has no entry for the benched variant (the artifact is
# refreshed by every BENCH_PROFILE run; see _profiled_step_ms). History:
# 3.63 -> 3.00 (resident backward consumes saved activations) -> 2.77
# (time-major GRU + prenormalized store) -> 2.69 (time-major embedding).
DEVICE_STEP_MS_PROFILED = 2.69

_HERE = os.path.dirname(os.path.abspath(__file__))
PROFILED_STEP_FILE = os.path.join(_HERE, "bench_profiled_step.json")

_t0 = time.time()

# Serializes watchdog partial emissions against main's final emission so
# (a) a partial line can never print AFTER the final line (a driver reading
# the newest parsable stdout line must get the final record) and (b) the
# watchdog's os._exit can never truncate the final line mid-print.
_EMIT_LOCK = threading.Lock()
_WD = None  # the live _Watchdog, for the __main__ exception emitter


def _note(msg: str) -> None:
    print(f"[bench +{time.time() - _t0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _variant_key() -> str:
    """Registry key for the benched variant in bench_profiled_step.json.

    The device step depends on the model AND the numerics variant
    (int8 store, bf16 Adam mu); keying the cached ceiling by both keeps
    the impossible-window merge bound honest across A/B runs."""
    key = os.environ.get("BENCH_MODEL", "vqa_attention")
    if os.environ.get("BENCH_QUANT"):
        key += f"+{os.environ['BENCH_QUANT']}"
    mu = os.environ.get("BENCH_MU_DTYPE", "float32")
    if mu != "float32":
        key += f"+mu_{mu}"
    return key


def _profiled_step_ms() -> tuple:
    """(device_step_ms, source) for the benched variant.

    Reads the committed artifact written by previous BENCH_PROFILE runs;
    falls back to the in-code constant (flagship config) so a fresh
    checkout still carries sane compute-ceiling context. Round-5: the
    constant used to be hand-maintained and went stale across kernel
    changes (VERDICT r04 weak #2)."""
    try:
        with open(PROFILED_STEP_FILE) as fh:
            rec = json.load(fh).get(_variant_key())
        if rec and rec.get("device_step_ms"):
            return float(rec["device_step_ms"]), "artifact"
    except Exception:
        pass
    return DEVICE_STEP_MS_PROFILED, "fallback_constant"


def _record_profiled_step(ms: float) -> None:
    """Refresh the cached per-variant device step from this run's own
    profiler measurement (atomic write; failures are non-fatal)."""
    try:
        data = {}
        if os.path.exists(PROFILED_STEP_FILE):
            with open(PROFILED_STEP_FILE) as fh:
                data = json.load(fh)
        data[_variant_key()] = {"device_step_ms": round(ms, 4),
                                "recorded_unix": int(time.time())}
        tmp = PROFILED_STEP_FILE + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(data, fh, indent=1, sort_keys=True)
            fh.write("\n")
        os.replace(tmp, PROFILED_STEP_FILE)
    except Exception as e:
        _note(f"profiled-step record skipped: {e}")


def _read_windows(train_dir) -> list:
    qps = []
    if not train_dir:
        return qps
    path = os.path.join(train_dir, "metrics.jsonl")
    if not os.path.exists(path):
        return qps
    with open(path) as fh:
        for line in fh:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:  # partial line mid-write
                continue
            if "train/questions_per_sec" in rec:
                qps.append(rec["train/questions_per_sec"])
    return qps


def _summarize(qps_windows: list, n_chips: int,
               ceiling: float = None) -> dict:
    """Pure window statistics (unit-tested in tests/test_bench.py).

    - First window is discarded: it carries the jit compile + dataset
      upload.
    - A window FASTER than the device physically is (> 1.1× the
      profiled-device-step ceiling) means the relay stalled the previous
      window's metric fetch and the next fetch returned instantly — the
      under-counting and over-counting windows span honest wall time
      only TOGETHER, so the impossible window is merged harmonically
      into its predecessor (equal step counts) and counted in
      ``impossible_windows_merged``; the pre-merge raw windows are kept
      in ``windows_qps_per_chip_raw`` so a stale-ceiling merge of honest
      windows stays auditable from the artifact alone. Measured
      2026-08-18: a 31 s fetch stall produced the pair
      (1,057; 2,328,265) q/s on a 93k chip.
    - LEADING windows below half the median of the remainder are the
      relay's cold-start dispatch ramp (the host is still draining its
      backlog; measured 603 then 12.3k q/s before five ~90k windows,
      2026-08-18) — the same fixed cost as the compile window, so they
      are excluded from the mean but stay visible in the window list and
      are counted in ``ramp_windows_discarded``. Only a leading PREFIX is
      ever dropped (at most half the windows): a mid-run dip is real
      contention and stays in the mean.
    - value = trimmed mean (min/max dropped) of what remains.
    """
    steady = qps_windows[1:] or qps_windows
    per_chip = [float(q) / n_chips for q in steady]
    raw = [round(q, 1) for q in per_chip]
    merged = 0
    if ceiling:
        # 1.1x margin over the profiled ceiling: wide enough for the
        # cached artifact being a touch stale vs the live device step,
        # tight enough that a stall/catch-up pair cannot slip under it
        # (the 2026-08-20 int8/sharded runs carried (82.6k, 115.6k) and
        # (79.5k, 117.7k) pairs — 1.22-1.24x a 95.2k ceiling, under the
        # old 1.25 bound, leaving a physically impossible best_window in
        # the artifact). Merging two HONEST neighbors (if the artifact
        # ever lags a real ceiling gain by >10%) is harmless: their
        # harmonic mean sits at their own level — and auditable: the raw
        # windows stay in the emitted JSON.
        bound = 1.1 * ceiling
        while len(per_chip) > 1:
            idx = next((i for i, r in enumerate(per_chip) if r > bound),
                       None)
            if idx is None:
                break
            j = idx - 1 if idx > 0 else idx + 1
            a, b = per_chip[idx], per_chip[j]
            pair = 2.0 / (1.0 / max(a, 1e-9) + 1.0 / max(b, 1e-9))
            lo, hi = min(idx, j), max(idx, j)
            per_chip[lo:hi + 1] = [pair]
            merged += 1
        if len(per_chip) == 1 and per_chip[0] > bound:
            per_chip[0] = bound  # single impossible window: clamp
            merged += 1
    ramp = 0
    if len(per_chip) >= 4:
        median = float(np.median(per_chip))
        while (ramp < len(per_chip) // 2
               and per_chip[ramp] < 0.5 * median):
            ramp += 1
    kept = sorted(per_chip[ramp:])
    # Proportional trim: drop ~1/8 of the windows from each end (at least
    # one once there are >=4), so longer runs keep a constant-fraction
    # outlier budget instead of a single min/max slot.
    cut = max(1, len(kept) // 8) if len(kept) >= 4 else 0
    trimmed = kept[cut:-cut] if cut else kept
    value = float(np.mean(trimmed)) if trimmed else 0.0
    out = {
        "value": round(value, 2),
        "vs_baseline": round(value / ROUND1_CEILING, 4),
        "best_window_qps_per_chip": round(max(kept), 2) if kept else 0.0,
        "windows_qps_per_chip": [round(q, 1) for q in per_chip],
        "ramp_windows_discarded": ramp,
        "impossible_windows_merged": merged,
    }
    if merged:
        out["windows_qps_per_chip_raw"] = raw
    return out


def _result_dict(train_dir, n_chips: int, batch_size: int,
                 partial: bool, status: str = "ok",
                 extra: dict = None) -> dict:
    qps_windows = _read_windows(train_dir)
    step_ms, step_src = _profiled_step_ms()
    ceiling = batch_size / step_ms * 1000.0
    return dict({
        "metric": "vqa_e2e_train_questions_per_sec_per_chip_b256",
        "unit": "questions/sec/chip",
        **_summarize(qps_windows, n_chips, ceiling=ceiling),
        "device_step_ms_profiled": step_ms,
        "profiled_step_source": step_src,
        "batch_size": batch_size,
        "partial": partial,
        # "ok" | "no_windows_yet_cold_start": the latter means the relay's
        # per-process cold start (200-470 s measured) ate the whole budget
        # before a single measurement window completed — value 0.0 is then
        # "not measured", NOT "measured zero"; device_step_ms_profiled
        # carries the stable compute-ceiling context.
        "status": status,
    }, **(extra or {}))


def _emit(train_dir, n_chips: int, batch_size: int,
          partial: bool, status: str = "ok", extra: dict = None) -> None:
    print(json.dumps(_result_dict(train_dir, n_chips, batch_size,
                                  partial, status, extra)), flush=True)


def _traced_steps(start: int, until: int, k: int, max_steps: int) -> int:
    """Steps actually spanned by a profiler trace that starts/stops only
    at the trainer's dispatch boundaries (stepno advances by
    ``min(k, max_steps - stepno)``; the trace starts at the first
    boundary ``>= start`` — windows narrower than one dispatch still
    trace that one dispatch — and stops at the first boundary
    ``>= until`` after that, or at ``max_steps`` — trainer.py). The
    exact divisor for ``device_step_ms_measured``: e.g. BENCH_PROFILE=100
    at k=32 traces 128 steps, and dividing by 100 would overstate the
    step 28%."""
    s, t_start, t_stop = 0, None, None
    while s < max_steps:
        if t_start is None and s >= start:
            t_start = s
            until = max(until, s + 1)
        s += min(k, max_steps - s)
        if t_start is not None and s >= until:
            t_stop = s
            break
    if t_start is None:
        return 0
    return (t_stop if t_stop is not None else max_steps) - t_start


def _write_status(wd) -> None:
    """Atomic per-stage status snapshot for the supervisor (no-op when
    BENCH_STATUS_FILE is unset, i.e. a direct BENCH_CHILD run)."""
    path = os.environ.get("BENCH_STATUS_FILE")
    if not path:
        return
    try:
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"stage": wd.stage, "train_dir": wd.train_dir,
                       "n_chips": wd.n_chips, "batch_size": wd.batch_size,
                       "t": time.time()}, fh)
        os.replace(tmp, path)
    except Exception:
        pass


class _Watchdog(threading.Thread):
    """Deadline thread armed BEFORE the first JAX call.

    Round-3 hardening: the axon backend probe itself (``jax.devices()`` /
    ``jax.default_backend()``) was measured hanging >400 s when the relay
    is down — inside a blocked C call, where a ``signal.alarm`` handler
    never runs (the main thread must re-enter Python bytecode for the
    handler to execute). A daemon THREAD keeps firing regardless of what
    the main thread blocks on, so a parsable JSON line reaches stdout even
    if the very first backend touch hangs forever.

    Firing schedule: first at ``first_fire`` s (BENCH_WATCHDOG_SECS), then
    every 80 s. Each firing with measurement windows (or a stall past the
    grace conditions) emits a ``"partial": true`` JSON line; the thread
    exits the process at ``hard_exit`` s (BENCH_HARD_EXIT_SECS) or once
    training has had >=160 s after the 200-470 s per-process relay cold
    start AND no new window landed since the previous fire (late-arriving
    windows — relay recovery near the deadline — re-arm the exit so a
    recovering run keeps measuring; round-5 salvage path).
    """

    def __init__(self, first_fire: int, hard_exit: int, grace: int = 160):
        super().__init__(daemon=True, name="bench-watchdog")
        self.first_fire = first_fire
        self.hard_exit = hard_exit
        self.grace = grace  # min seconds of training before self-exit
        self.stage = "imports"          # advanced by main() as it proceeds
        self.train_dir = None           # set once the trainer exists
        self.train_started = 0.0        # set on entering fit_resident
        self.n_chips = 1
        self.batch_size = 256
        self.fires = 0
        self._last_window_count = 0
        self.done = threading.Event()

    def set_stage(self, stage: str, train_dir=None) -> None:
        self.stage = stage
        if train_dir is not None:
            self.train_dir = train_dir
        _write_status(self)

    def run(self) -> None:
        next_fire = _t0 + self.first_fire
        while not self.done.wait(timeout=max(0.5, next_fire - time.time())):
            if time.time() < next_fire - 0.25:  # spurious wakeup
                continue
            self.fires += 1
            elapsed = time.time() - _t0
            trained = (time.time() - self.train_started) \
                if self.train_started else 0.0
            windows = _read_windows(self.train_dir)
            growing = len(windows) > self._last_window_count
            self._last_window_count = len(windows)
            last = (elapsed >= self.hard_exit
                    or (self.fires >= 4 and trained >= self.grace
                        and not growing))
            _write_status(self)
            # The legitimate cold-start stages (the first jit dispatch
            # costs 200-470 s through the relay) stay silent while they
            # wait so a mid-run driver parse never sees a value-0 line
            # ahead of real windows; every other zero-window stall (e.g.
            # the backend probe hanging with the relay down) emits
            # immediately — rc=124 silence is the one unacceptable outcome.
            cold_start = (not windows and not last
                          and self.stage in ("init_state", "fit_resident"))
            if cold_start:
                _note(f"WATCHDOG fired ({self.fires}) — no windows yet "
                      f"(stage={self.stage}, trained {trained:.0f}s), "
                      "re-arming")
            else:
                if windows:
                    status = "ok"
                elif self.train_started or self.stage == "init_state":
                    status = "no_windows_yet_cold_start"
                else:
                    status = f"stalled_at_{self.stage}"
                with _EMIT_LOCK:
                    if self.done.is_set():  # main already emitted final
                        return
                    _note(f"WATCHDOG fired ({self.fires}) at stage="
                          f"{self.stage} — emitting "
                          f"{'final' if last else 'partial'} result")
                    _emit(self.train_dir, self.n_chips, self.batch_size,
                          partial=True, status=status)
            if last:
                if self.done.is_set():  # main is finishing — let it
                    return
                os._exit(0)
            next_fire = time.time() + 80


def main() -> None:
    """The measurement process (run with BENCH_CHILD=1 by the supervisor,
    or directly — the watchdog backstop works either way)."""
    # Realistic-scale rehearsal (BENCH_STORE_GB=<float>): size the
    # deduplicated f16 feature store to ~GB on disk (it uploads at the
    # same byte width as bf16), so the flagship capacity/throughput
    # claims run at the scale they advertise — tens of thousands of
    # store rows, multi-GB HBM residency, realistic scalar-prefetch row
    # distances — instead of the 205 MB default corpus. Compose with
    # BENCH_STORE_SHARDED / BENCH_QUANT for the sharded / int8 modes.
    store_gb = float(os.environ.get("BENCH_STORE_GB", "0"))
    # A multi-GB run pays real host-side prep (f16->bf16 cast +
    # L2-prenormalize of the whole store) and a multi-GB relay upload
    # before the first window: scale the watchdog budget with the store.
    wd_default, hard_default, grace = 280, 900, 160
    if store_gb:
        wd_default += int(60 * store_gb)
        hard_default += int(240 * store_gb)
        grace += int(120 * store_gb)
    watchdog = int(os.environ.get("BENCH_WATCHDOG_SECS", str(wd_default)))
    hard_exit = int(os.environ.get("BENCH_HARD_EXIT_SECS",
                                   str(hard_default)))
    global _WD
    wd = _WD = _Watchdog(watchdog, hard_exit, grace)
    wd.start()
    _note(f"start: backend probe next; watchdog={watchdog}s "
          f"(hard exit {hard_exit}s)")

    import jax

    from vqa_transfer_externaldata_tpu.config import Config
    from vqa_transfer_externaldata_tpu.data.datasets import (
        synthetic_vqa_joined)
    from vqa_transfer_externaldata_tpu.models.zoo import build_model
    from vqa_transfer_externaldata_tpu.parallel.trainer import Trainer

    if os.environ.get("BENCH_FORCE_CPU"):
        # CPU smoke runs: the axon plugin's sitecustomize forces
        # jax_platforms="axon,cpu" programmatically (overriding the env
        # var), and its backend probe blocks >400 s when the relay is
        # down — opt all the way out the same way tests/conftest.py does.
        jax.config.update("jax_platforms", "cpu")
    wd.set_stage("backend_probe")  # jax.default_backend() hung >400 s once
    on_tpu = jax.default_backend() != "cpu"
    batch_size = 256 if on_tpu else 32
    wd.batch_size = batch_size
    window = 128 if on_tpu else 3
    # 24 windows = 3072 steps = ~8.4 s of DEVICE compute at the 2.74 ms
    # step: nearly free on-chip, but 3x the samples for the trimmed mean.
    # With 8 windows (2026-08-18 runs 9-12) a single relay stall plus the
    # dispatch ramp could consume the trim's whole outlier budget; at 24
    # the estimator is dominated by steady windows.
    n_windows = int(os.environ.get("BENCH_WINDOWS", "24" if on_tpu else "4"))
    overrides = {
        "data.synthetic": True,
        "train.batch_size": batch_size,
        "train.log_every": window,
        "train.max_steps": window * n_windows,
        "train.checkpoint_every": 10**9,
        "train.eval_every": 10**9,
        "train.device_data_cache": True,
        # Steps per dispatch (BENCH_STEPS_PER_CALL to sweep): the resident
        # index-table segments leave zero per-call host traffic. Profiled
        # 2026-08-17: device 100% busy at k=32 (step scan 3.61 ms/step,
        # ~0.37 ms/step inter-dispatch jitter, zero >1 ms gaps); sweeping
        # k=128 changed nothing (55,960 vs 57,511 same-day, within run
        # noise) — the dispatch queue already hides relay latency.
        "train.steps_per_call":
            int(os.environ.get("BENCH_STEPS_PER_CALL", "32" if on_tpu
                               else "3")),
        # Gather-free attention straight out of the resident store
        # (scalar-prefetch kernels): device step 5.09 -> 3.63 ms profiled.
        "train.resident_fused_attention": True,
        # BENCH_QUANT=int8 benches the quantized resident store (halved
        # v-read HBM traffic, quantization-noise numerics). Default ""
        # keeps the headline number exact-math.
        "train.store_quantize": os.environ.get("BENCH_QUANT", ""),
        # BENCH_STORE_SHARDED=1 benches the row-sharded store (the
        # HBM-capacity mode; identical compute on one chip, P(data)
        # store + per-shard sampling on a multi-chip mesh). Default off:
        # the headline is the replicated-store path. '0'/'false' read as
        # off (a bare bool() would mislabel a `=0` run as replicated —
        # the A/B corruption store_quantize guards against).
        "train.store_sharded":
            os.environ.get("BENCH_STORE_SHARDED", "").lower()
            not in ("", "0", "false"),
        # BENCH_MU_DTYPE=bfloat16 benches the half-width Adam first
        # moment (config.adam_mu_dtype — optimizer-traffic A/B). Default
        # float32 keeps the headline exact-math.
        "train.adam_mu_dtype":
            os.environ.get("BENCH_MU_DTYPE", "float32"),
        # BENCH_MODEL benches another registry model through the same
        # harness/corpus (e.g. vqa_attention2: the G=2 multi-glimpse
        # resident path). Default stays the headline single-glimpse model.
        "model.model": os.environ.get("BENCH_MODEL", "vqa_attention"),
    }
    if os.environ.get("BENCH_PROFILE"):
        overrides["train.profile_start"] = window  # skip the compile window
        overrides["train.profile_steps"] = int(os.environ["BENCH_PROFILE"])
    if not on_tpu:  # CPU smoke: shrink so the bench still runs anywhere
        overrides.update({
            "data.vocab_size": 256, "data.num_answers": 64,
            "data.feature_dim": 256, "data.pool5_dim": 256,
            "model.rnn_dim": 64, "model.fusion_dim": 128,
            "model.att_hidden": 64, "model.dtype": "float32",
        })
    cfg = Config().replace_flat(overrides)
    _note(f"backend={jax.default_backend()} devices={jax.device_count()} "
          f"batch={batch_size} window={window} n_windows={n_windows}")

    # 256 images: the dedup store is 205 MB — the two-level join is
    # identical to the 512-image corpus but the one-time upload costs half
    # (the relay measured as low as 2.6 MB/s under tenant contention;
    # round-2's 512-image store upload alone took ~160 s that day).
    n_questions = 4096 if on_tpu else 256
    n_images = 256 if on_tpu else 32
    if store_gb and on_tpu:
        # f16 bytes per image row at the production grid shape; the
        # resident bf16 copy is the same width (+200/196 cell padding).
        n_cells = cfg.data.grid_h * cfg.data.grid_w
        n_images = int(store_gb * 2**30
                       / (n_cells * cfg.data.feature_dim * 2))
        # Enough questions that a 128-step window never repeats a batch
        # and every batch's rows spread over the full store.
        n_questions = 8192
    wd.set_stage("dataset_build")
    t_ds = time.time()
    ds = synthetic_vqa_joined(cfg, n_questions=n_questions,
                              n_images=n_images, seed=0)
    _note(f"dataset ready: {len(ds)} questions / {n_images} images "
          f"({ds.store.grid.nbytes / 1e9:.2f} GB f16 store, "
          f"{time.time() - t_ds:.1f}s)")

    spec = build_model(cfg)
    train_dir = tempfile.mkdtemp(prefix="bench_")
    trainer = Trainer(cfg, spec, train_dir=train_dir)
    n_chips = trainer.mesh.devices.size
    _note(f"trainer ready (train_dir={train_dir})")

    # From here the watchdog reads real measurement windows: any firing
    # emits a JSON line from however many windows completed instead of
    # letting an external timeout produce rc=124 with no output.
    wd.n_chips = n_chips
    wd.set_stage("init_state", train_dir=train_dir)

    state = trainer.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
    _note("state initialized; entering fit_resident (first window = "
          "compile + upload)")
    wd.train_started = time.time()
    wd.set_stage("fit_resident")
    state = trainer.fit_resident(ds, state)
    _note("training done")

    wd.set_stage("post_train")
    if os.environ.get("BENCH_EVAL"):
        # Secondary (stderr, recorded in BASELINE.md): full-split eval q/s
        # through the device-resident evaluator. Off by default — its
        # separate compile dominated round-2's cold-start wall time.
        eval_fn = trainer._make_resident_evaluator(ds)
        eval_fn(state)  # compile + warm
        t0 = time.perf_counter()
        metrics, _ = eval_fn(state)
        dt = time.perf_counter() - t0
        _note(f"eval(resident full split): {len(ds) / dt / n_chips:,.0f} "
              f"q/s/chip ({len(ds)} rows in {dt * 1e3:.1f} ms)  "
              f"acc={metrics.get('accuracy', float('nan')):.4f}")

    hbm_free = None
    if store_gb and os.environ.get("BENCH_HBM_PROBE"):
        # memory_stats is unavailable through the relay, so the
        # realistic-scale table's headroom was inferred, not read
        # (VERDICT r04 weak #5): measure it by allocate-to-failure
        # bisection WHILE the resident store is still alive (the trainer
        # keeps the uploaded tree reachable until close() — probing
        # after close() measures an idle chip: 15.5 GB "free" next to an
        # 8.8 GB store, observed 2026-08-21). Gated: a deliberate OOM is
        # not something the headline run should risk.
        wd.set_stage("hbm_probe")
        hbm_free = _probe_free_hbm()
    trainer.close()

    # Self-reported stable number: when the run captured a profiler trace
    # (BENCH_PROFILE=<steps>), parse it and put the measured device step —
    # the ONLY number the axon relay's ±30% wall variance cannot touch —
    # in the same JSON line as the wall windows.
    extra = {}
    if store_gb:
        extra["store_gb_f16"] = round(ds.store.grid.nbytes / 2**30, 2)
        extra["store_rows"] = n_images
        try:  # HBM residency after training (store + params + opt state)
            ms = jax.local_devices()[0].memory_stats() or {}
            if "bytes_in_use" in ms:
                extra["hbm_gb_in_use"] = round(
                    ms["bytes_in_use"] / 2**30, 2)
        except Exception:
            pass
        if hbm_free is not None:
            extra["hbm_free_gb_measured"] = hbm_free
    if os.environ.get("BENCH_PROFILE"):
        wd.set_stage("trace_summary")
        try:
            from tools.trace_summary import summarize

            start = overrides["train.profile_start"]
            traced = _traced_steps(
                start, start + overrides["train.profile_steps"],
                overrides["train.steps_per_call"],
                overrides["train.max_steps"])
            res = summarize(os.path.join(train_dir, "profile"),
                            steps=max(traced, 1), top=0)
            extra["device_step_ms_measured"] = res["device_step_ms"]
            extra["ceiling_qps_per_chip_measured"] = round(
                batch_size / res["device_step_ms"] * 1000.0, 1)
            _note(f"profiled device step {res['device_step_ms']:.3f} "
                  f"ms/step over {res['dispatches']} dispatches")
            if on_tpu:  # refresh the derived merge-bound artifact
                _record_profiled_step(res["device_step_ms"])
        except BaseException as e:  # CPU-only trace, missing dir, ...
            _note(f"trace summary skipped: {e}")

    with _EMIT_LOCK:
        wd.done.set()
        _emit(train_dir, n_chips, batch_size, partial=False, extra=extra)


def _probe_free_hbm(hi_gb: float = 16.0, step_gb: float = 0.5,
                    try_alloc=None) -> float:
    """Largest device-only allocation (GB) that succeeds right now — a
    jit'd ``jnp.zeros`` per probe (no host transfer; each buffer dropped
    before the next). ASCENDING, stop at first failure: measured
    2026-08-21 on the axon client that the first failed allocation
    poisons every later one in the process (4 GB ok → 20 GB fail →
    0.25 GB RESOURCE_EXHAUSTED forever after), so bisection gets exactly
    one bit after its first failure — an earlier bisecting version
    reported 0.0 GB free beside an 8.8 GB store on the 16 GB chip.
    Resolution = ``step_gb``; ~1 s per probe. ``try_alloc`` is injectable
    for the unit test; default probes the real device."""

    def _real_try_alloc(gb: float) -> bool:
        import jax
        import jax.numpy as jnp

        n = int(gb * 2**30)
        try:
            buf = jax.jit(lambda: jnp.zeros((n,), jnp.uint8))()
            jax.device_get(buf[:1])  # force materialization via the relay
            del buf
            return True
        except Exception:
            return False

    try_alloc = try_alloc or _real_try_alloc
    last, gb = 0.0, step_gb
    while gb <= hi_gb:
        ok = try_alloc(gb)
        _note(f"hbm probe: {gb:.2f} GB {'ok' if ok else 'FAILED — stop'}")
        if not ok:
            break
        last = gb
        gb += step_gb
    return round(last, 2)


def _child_entry() -> None:
    """BENCH_CHILD=1 entry: main() + the exception/interrupt guards."""
    try:
        main()
    except (SystemExit, KeyboardInterrupt):
        # Ctrl-C must stay distinguishable from a backend failure in the
        # artifact AND keep propagating (ADVICE r04): emit a distinct
        # status, then re-raise.
        e = sys.exc_info()[1]
        if isinstance(e, KeyboardInterrupt):
            wd = _WD
            with _EMIT_LOCK:
                if wd is not None and not wd.done.is_set():
                    wd.done.set()
                    _emit(wd.train_dir, wd.n_chips, wd.batch_size,
                          partial=True, status="interrupted")
        raise
    except BaseException as e:
        # A mid-run EXCEPTION (e.g. a relay incident surfacing as a TPU
        # backend error, as measured 2026-08-20: FailedPrecondition after
        # ~600 s in init_state) must still leave one parsable JSON line
        # on stdout — rc!=0 with NO line is the one outcome the driver
        # can't classify. The watchdog covers time-based stalls only; it
        # never fires for a fast-raising failure.
        import traceback

        traceback.print_exc()
        wd = _WD
        with _EMIT_LOCK:
            if wd is None:
                _emit(None, 1, 256, partial=True,
                      status=f"error:{type(e).__name__}")
            elif not wd.done.is_set():
                wd.done.set()
                _emit(wd.train_dir, wd.n_chips, wd.batch_size,
                      partial=True, status=f"error:{type(e).__name__}")
        sys.exit(1)


# ---------------------------------------------------------------------------
# Supervisor (the default `python bench.py` entry — JAX-free, cannot hang)
# ---------------------------------------------------------------------------


def _read_status(path: str) -> dict:
    try:
        with open(path) as fh:
            return json.load(fh)
    except Exception:
        return {}


class _Attempt:
    """One child measurement process + its captured stdout JSON lines."""

    def __init__(self, cmd, env, stall_kill: float, deadline: float,
                 min_retry: float, retries_left: bool,
                 kill_margin: float = 30.0):
        self.status_path = tempfile.mktemp(prefix="bench_status_")
        env = dict(env, BENCH_CHILD="1", BENCH_STATUS_FILE=self.status_path,
                   BENCH_HARD_EXIT_SECS=str(
                       max(30, int(deadline - time.time()) - 15)))
        self.proc = subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                                     text=True)
        self.lines = []
        self._reader = threading.Thread(target=self._read, daemon=True)
        self._reader.start()
        self.stall_kill = stall_kill
        self.deadline = deadline
        self.min_retry = min_retry
        self.retries_left = retries_left
        self.kill_margin = kill_margin
        self.started = time.time()
        self.killed_for = None

    def _read(self) -> None:
        for line in self.proc.stdout:
            line = line.strip()
            if line.startswith("{"):
                try:
                    self.lines.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
        self.proc.stdout.close()

    def status(self) -> dict:
        return _read_status(self.status_path)

    def windows(self) -> list:
        return _read_windows(self.status().get("train_dir"))

    def run(self) -> int:
        """Poll until the child exits or a kill condition hits; returns
        the child's rc (or -9 after a kill)."""
        while True:
            rc = self.proc.poll()
            if rc is not None:
                break
            now = time.time()
            n_windows = len(self.windows())
            # Stall kill: a zero-window child past the stall budget is
            # retried in a FRESH process (fresh relay client) — but only
            # while a retry can still finish inside the global deadline;
            # otherwise riding this attempt out is strictly better.
            if (n_windows == 0 and self.retries_left
                    and now - self.started > self.stall_kill
                    and self.deadline - now > self.min_retry):
                self.killed_for = "stall"
            elif now > self.deadline + self.kill_margin:
                self.killed_for = "deadline"  # child overstayed its own exit
            if self.killed_for:
                st = self.status()
                _note(f"supervisor: killing attempt ({self.killed_for}; "
                      f"stage={st.get('stage')}, {n_windows} windows, "
                      f"{now - self.started:.0f}s in)")
                self.proc.kill()
                rc = self.proc.wait(timeout=30)
                break
            time.sleep(1.0)
        self._reader.join(timeout=10)
        return rc

    def salvage(self) -> dict:
        """Best result this attempt produced: the child's final printed
        line if it has windows, else a fresh summary straight from
        metrics.jsonl (a killed child may have produced windows between
        the supervisor's polls — relay recovery arriving late)."""
        printed = self.lines[-1] if self.lines else None
        if printed and not printed.get("partial"):
            return printed  # a clean finish carries extras (profile, store)
        st = self.status()
        windows = _read_windows(st.get("train_dir"))
        printed_n = -1
        if printed:  # pre-merge raw list is the honest window count
            printed_n = len(printed.get("windows_qps_per_chip_raw",
                                        printed["windows_qps_per_chip"]))
        # metrics.jsonl counts ALL windows; a printed line summarizes
        # windows[1:]. Rebuild only when the file holds strictly more
        # information than the line.
        if windows and len(windows) - 1 > printed_n:
            return _result_dict(
                st.get("train_dir"), st.get("n_chips", 1),
                st.get("batch_size", 256), partial=True, status="ok")
        if printed is None and st.get("stage"):
            # Killed with nothing printed: at least name the stage the
            # child was stuck in (the BENCH_r04 artifact's one virtue).
            return _result_dict(
                st.get("train_dir"), st.get("n_chips", 1),
                st.get("batch_size", 256), partial=True,
                status="no_windows_yet_cold_start"
                if st["stage"] in ("init_state", "fit_resident")
                else f"stalled_at_{st['stage']}")
        return printed


def _choose(results: list) -> dict:
    """Newest result with windows wins; else the newest result."""
    with_windows = [r for r in results
                    if r and r.get("windows_qps_per_chip")]
    if with_windows:
        return with_windows[-1]
    real = [r for r in results if r]
    return real[-1] if real else None


def supervise(child_cmd=None) -> int:
    """JAX-free supervisor: run the measurement child, retry a stalled or
    late-erroring one in a fresh process, salvage whatever windows landed,
    and print exactly ONE JSON line. Returns the exit code."""
    try:
        store_gb = float(os.environ.get("BENCH_STORE_GB", "0") or 0)
    except ValueError:
        store_gb = 0.0  # the child raises + emits the error line itself
    total = int(os.environ.get("BENCH_HARD_EXIT_SECS",
                               str(900 + int(240 * store_gb))))
    # Store scaling measured 2026-08-21: an 8 GB corpus run reached its
    # first window ~1,250 s in on a slow relay (227 s host gen + ~500 s
    # cold start + ~450 s upload inside the first fit window) — 120 s/GB
    # left almost no margin, so 180 s/GB.
    stall_kill = int(os.environ.get("BENCH_STALL_KILL_SECS",
                                    str(500 + int(180 * store_gb))))
    # Minimum budget a retry needs to finish: measured healthy run =
    # 200-470 s cold start + ~60 s of windows; 320 s covers the typical
    # cold start with a reduced window count.
    min_retry = int(os.environ.get("BENCH_MIN_RETRY_SECS", "320"))
    max_attempts = max(1, int(os.environ.get("BENCH_MAX_ATTEMPTS", "2")))
    # Remaining knobs exist so the state machine is testable at
    # second-scale (tests/test_bench.py); production keeps the defaults.
    min_attempt = int(os.environ.get("BENCH_MIN_ATTEMPT_SECS", "30"))
    kill_margin = int(os.environ.get("BENCH_KILL_MARGIN_SECS", "30"))
    err_retry_after = int(os.environ.get("BENCH_ERROR_RETRY_AFTER_SECS",
                                         "60"))
    child_cmd = child_cmd or [sys.executable, os.path.abspath(__file__)]
    deadline = time.time() + total

    results, rcs, stall_kills = [], [], 0
    attempt_no = 0
    att = None
    try:
        while (attempt_no < max_attempts
               and deadline - time.time() > min_attempt):
            attempt_no += 1
            env = dict(os.environ)
            if attempt_no > 1 and "BENCH_WINDOWS" not in os.environ:
                env["BENCH_WINDOWS"] = "12"  # retry budget is tighter
            _note(f"supervisor: attempt {attempt_no}/{max_attempts} "
                  f"(budget {deadline - time.time():.0f}s, stall-kill "
                  f"{stall_kill}s)")
            att = _Attempt(child_cmd, env, stall_kill, deadline, min_retry,
                           retries_left=attempt_no < max_attempts,
                           kill_margin=kill_margin)
            rc = att.run()
            rcs.append(rc)
            res = att.salvage()
            results.append(res)
            if att.killed_for == "stall":
                stall_kills += 1
                continue  # the whole point: a fresh process next
            if res and not res.get("partial") and res["status"] == "ok":
                break  # clean finish
            if res and res.get("windows_qps_per_chip"):
                break  # partial-with-windows: budget is spent, take it
            # Zero windows. An error raised >60 s in looks like a relay
            # incident (measured FailedPrecondition ~600 s in) — retry;
            # a fast failure is a config/code error — don't burn budget.
            errored = res and str(res.get("status", "")).startswith("error:")
            if errored and time.time() - att.started < err_retry_after:
                break
        final = _choose(results)
        if final is None:  # child died printing nothing (e.g. SIGKILL'd
            final = _result_dict(  # before its watchdog armed)
                None, 1, 256, partial=True, status="stalled_at_spawn")
        final = dict(final, attempts=attempt_no, stall_kills=stall_kills)
        print(json.dumps(final), flush=True)
        ok = (final["status"] in ("ok", "no_windows_yet_cold_start")
              or final["status"].startswith("stalled_at"))
        return 0 if ok else (rcs[-1] if rcs and rcs[-1] else 1)
    except KeyboardInterrupt:
        _note("supervisor: interrupted — emitting best result, re-raising")
        if att is not None and att.proc.poll() is None:
            att.proc.kill()
            results.append(att.salvage())
        final = _choose(results) or _result_dict(
            None, 1, 256, partial=True, status="interrupted")
        print(json.dumps(dict(final, attempts=attempt_no,
                              status="interrupted")), flush=True)
        raise


if __name__ == "__main__":
    if os.environ.get("BENCH_CHILD"):
        _child_entry()
    else:
        sys.exit(supervise())
