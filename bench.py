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

Driver-provability (round-3 redesign; round-2's run timed out with NO
output, BENCH_r02.json rc=124):

- **Watchdog**: a daemon THREAD (armed before the first JAX call; default
  first fire 280 s, ``BENCH_WATCHDOG_SECS``) emits a JSON line from
  whatever steady windows exist at that moment and KEEPS RUNNING,
  re-firing every 80 s — so whenever the driver's own timeout strikes,
  the stdout tail already holds the newest parsable line. A thread (not
  ``signal.alarm``) because the axon backend probe itself was measured
  hanging >400 s inside a blocked C call, where a signal handler never
  gets to run; such a hang now emits ``"status": "stalled_at_<stage>"``
  lines instead of rc=124 silence. ``"partial": true`` marks watchdog
  emissions; the final non-partial line supersedes them when the run
  completes. The exit is PROGRESS-ANCHORED: the relay charges every fresh
  process a 200-470 s cold start on its FIRST jit dispatch (measured
  277 s for a trivial program, 471 s under contention; compile cache
  notwithstanding), so the watchdog only self-exits once training has had
  >=160 s to produce windows after that spin-up — or at
  ``BENCH_HARD_EXIT_SECS`` (900) for true hangs. Zero-window fires after
  training started emit ``"status": "no_windows_yet_cold_start"`` (value
  0.0 = "not measured", never "measured zero"); fires with windows emit
  ``"status": "ok"``.
- **Statistics** (``_summarize``): value = trimmed mean (min/max
  dropped) of the steady windows — first window discarded (jit compile +
  upload); windows FASTER than the device physically is (>1.1× the
  profiled ceiling — a relay fetch stall under-counts one window and
  over-counts the next) merged harmonically into their predecessor
  (``impossible_windows_merged``); then any LEADING windows below half
  the median dropped as the relay's cold-start dispatch ramp (same fixed
  cost as compile; counted in ``ramp_windows_discarded``, never more than
  half the list, and only a leading prefix — mid-run dips are real
  contention and stay). The trim is proportional (~1/8 of the windows
  from each end) and the default run is 24 windows (3072 steps, ~8 s of
  device compute) so the estimator is dominated by steady windows, not
  the outlier budget.
  ``windows_qps_per_chip`` lists every window so the spread is visible;
  ``best_window_qps_per_chip`` is the most contention-free window — the
  stable secondary number on a link with ±30% relay variance (BASELINE.md).
- **Cold start**: no separately-compiled resident evaluator (opt back in
  with ``BENCH_EVAL=1``); persistent compilation cache; progress on stderr
  from the first line.
- **Self-reported stable number**: with ``BENCH_PROFILE=<steps>`` the
  final JSON also carries ``device_step_ms_measured`` (this run's own
  profiler trace parsed by tools/trace_summary, divided by the exact
  dispatch-boundary-aligned step count — ``_traced_steps``) and the
  derived ``ceiling_qps_per_chip_measured`` — the numbers the relay's
  ±30% wall variance cannot touch.

Realistic scale: ``BENCH_STORE_GB=<float>`` sizes the synthetic corpus's
deduplicated f16 feature store to ~that many GB (tens of thousands of
rows at the production grid shape; cached like the default corpus), so
the headline runs with multi-GB HBM residency and realistic
scalar-prefetch row distances. Composes with ``BENCH_STORE_SHARDED`` /
``BENCH_QUANT``; the watchdog budget scales with the store (host-side
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
import sys
import tempfile
import threading
import time

# Persistent compilation cache: repeated bench runs skip the (remote,
# occasionally flaky) TPU compile service entirely.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import jax
import numpy as np

# BENCH_r01 recorded ceiling on 1x TPU v5e (questions/sec/chip, batch 256,
# single resident batch, compute only) — the FIXED bar every round's
# end-to-end pipeline number is measured against (see module docstring).
ROUND1_CEILING = 53966.0

# Profiled device-only step time (ms) for the flagship resident config at
# batch 256 on 1x v5e — jax.profiler trace 2026-08-17 (BASELINE.md). Not a
# measurement of THIS run; recorded so the JSON carries the stable
# compute-ceiling context next to the noisy wall number. 3.63 -> 3.00
# when the resident backward began consuming the forward's saved
# activations instead of recomputing v @ wv (ops/attention_resident);
# 3.00 -> 2.77 with the time-major GRU + prenormalized store;
# 2.77 -> 2.69 with the time-major embedding lookup (kills the gather
# and dwords relayout copies around the word-embedding scatter).
DEVICE_STEP_MS_PROFILED = 2.69

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


def _read_windows(train_dir) -> list:
    qps = []
    if train_dir is None:
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
      ``impossible_windows_merged``. Measured 2026-08-18: a 31 s fetch
      stall produced the pair (1,057; 2,328,265) q/s on a 93k chip.
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
    merged = 0
    if ceiling:
        # 1.1x margin over the profiled ceiling: wide enough for the
        # constant being a touch stale vs the live device step, tight
        # enough that a stall/catch-up pair cannot slip under it (the
        # 2026-08-20 int8/sharded runs carried (82.6k, 115.6k) and
        # (79.5k, 117.7k) pairs — 1.22-1.24x a 95.2k ceiling, under the
        # old 1.25 bound, leaving a physically impossible best_window in
        # the artifact). Merging two HONEST neighbors (if the constant
        # ever lags a real ceiling gain by >10%) is harmless: their
        # harmonic mean sits at their own level.
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
    return {
        "value": round(value, 2),
        "vs_baseline": round(value / ROUND1_CEILING, 4),
        "best_window_qps_per_chip": round(max(kept), 2) if kept else 0.0,
        "windows_qps_per_chip": [round(q, 1) for q in per_chip],
        "ramp_windows_discarded": ramp,
        "impossible_windows_merged": merged,
    }


def _emit(train_dir, n_chips: int, batch_size: int,
          partial: bool, status: str = "ok", extra: dict = None) -> None:
    qps_windows = _read_windows(train_dir)
    ceiling = batch_size / DEVICE_STEP_MS_PROFILED * 1000.0
    print(json.dumps(dict({
        "metric": "vqa_e2e_train_questions_per_sec_per_chip_b256",
        "unit": "questions/sec/chip",
        **_summarize(qps_windows, n_chips, ceiling=ceiling),
        "device_step_ms_profiled": DEVICE_STEP_MS_PROFILED,
        "batch_size": batch_size,
        "partial": partial,
        # "ok" | "no_windows_yet_cold_start": the latter means the relay's
        # per-process cold start (200-470 s measured) ate the whole budget
        # before a single measurement window completed — value 0.0 is then
        # "not measured", NOT "measured zero"; device_step_ms_profiled
        # carries the stable compute-ceiling context.
        "status": status,
    }, **(extra or {}))), flush=True)


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
    start (progress-anchored — see module docstring).
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
        self.done = threading.Event()

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
            last = (elapsed >= self.hard_exit
                    or (self.fires >= 4 and trained >= self.grace))
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
    wd.stage = "backend_probe"  # jax.default_backend() hung >400 s once
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
    wd.stage = "dataset_build"
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
    wd.train_dir = train_dir
    wd.n_chips = n_chips
    wd.stage = "init_state"

    state = trainer.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
    _note("state initialized; entering fit_resident (first window = "
          "compile + upload)")
    wd.train_started = time.time()
    wd.stage = "fit_resident"
    state = trainer.fit_resident(ds, state)
    _note("training done")

    wd.stage = "post_train"
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
    if os.environ.get("BENCH_PROFILE"):
        wd.stage = "trace_summary"
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
        except BaseException as e:  # CPU-only trace, missing dir, ...
            _note(f"trace summary skipped: {e}")

    with _EMIT_LOCK:
        wd.done.set()
        _emit(train_dir, n_chips, batch_size, partial=False, extra=extra)


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
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
