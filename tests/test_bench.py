"""Unit tests for bench.py's driver-provability watchdog.

The one unacceptable bench outcome is rc=124 with no parsable JSON on
stdout (BENCH_r02.json). The watchdog is a daemon thread armed before the
first JAX call because the axon backend probe was measured hanging >400 s
inside a blocked C call — where a ``signal.alarm`` handler never runs.
These tests drive the thread's state machine directly (no TPU, no hang).
"""

import json
import os
import time

import pytest

import bench


def _drain_emits(capfd):
    out, _ = capfd.readouterr()
    return [json.loads(line) for line in out.splitlines()
            if line.startswith("{")]


def test_watchdog_emits_on_backend_stall(monkeypatch, capfd):
    """A hang before training (e.g. the backend probe with the relay down)
    must put a parsable stalled-status JSON line on stdout, then exit."""
    exits = []
    wd = bench._Watchdog(first_fire=0, hard_exit=0)  # fire + hard-exit now

    def fake_exit(code):  # ends the watchdog loop cleanly via its Event
        exits.append(code)
        wd.done.set()

    monkeypatch.setattr(os, "_exit", fake_exit)
    wd.stage = "backend_probe"
    wd.start()
    wd.join(timeout=10)
    assert not wd.is_alive()
    assert exits == [0]
    emits = _drain_emits(capfd)
    assert emits, "stalled watchdog must emit a JSON line"
    last = emits[-1]
    assert last["status"] == "stalled_at_backend_probe"
    assert last["partial"] is True
    assert last["value"] == 0.0  # "not measured", never "measured zero"


def test_watchdog_stays_silent_during_cold_start(monkeypatch, capfd):
    """The first jit dispatch legitimately costs 200-470 s through the
    relay: zero-window fires during init_state/fit_resident re-arm
    silently (no value-0 line ahead of real windows)."""
    wd = bench._Watchdog(first_fire=0, hard_exit=10**6)
    monkeypatch.setattr(os, "_exit", lambda code: wd.done.set())
    wd.stage = "init_state"
    wd.train_started = time.time()
    wd.start()
    deadline = time.time() + 10
    while wd.fires < 1 and time.time() < deadline:
        time.sleep(0.05)
    wd.done.set()
    wd.join(timeout=10)
    assert wd.fires >= 1
    assert _drain_emits(capfd) == []


def test_watchdog_emits_windows_when_present(monkeypatch, capfd, tmp_path):
    """Once measurement windows exist, a fire emits status=ok with the
    trimmed-mean value read from the trainer's own metrics.jsonl."""
    metrics = tmp_path / "metrics.jsonl"
    with open(metrics, "w") as fh:
        for qps in (1000.0, 2000.0, 2200.0, 2400.0, 9000.0):
            fh.write(json.dumps({"train/questions_per_sec": qps}) + "\n")
    exits = []
    wd = bench._Watchdog(first_fire=0, hard_exit=0)

    def fake_exit(code):
        exits.append(code)
        wd.done.set()

    monkeypatch.setattr(os, "_exit", fake_exit)
    wd.stage = "fit_resident"
    wd.train_dir = str(tmp_path)
    wd.train_started = time.time()
    wd.start()
    wd.join(timeout=10)
    assert exits == [0]
    last = _drain_emits(capfd)[-1]
    assert last["status"] == "ok"
    assert last["partial"] is True
    # First window (compile+upload) dropped, then min/max trimmed:
    # steady = [2000, 2200, 2400, 9000] -> trimmed mean of [2200, 2400].
    assert last["value"] == pytest.approx(2300.0)
    assert last["best_window_qps_per_chip"] == pytest.approx(9000.0)


def test_summarize_drops_leading_ramp_only():
    """Cold-start dispatch-ramp windows (leading, < half the median) are
    excluded from the mean like the compile window; a mid-run dip is real
    contention and stays (2026-08-18 run: 603, 12.3k ramp before five
    ~90k windows)."""
    # first entry (compile window) discarded, then ramp prefix dropped
    s = bench._summarize(
        [1.0, 602.8, 12264.3, 87053.4, 91379.0, 94309.0, 93000.0], 1)
    assert s["ramp_windows_discarded"] == 2
    # kept [87053.4, 91379, 94309, 93000] -> trimmed mean of middle two
    assert s["value"] == pytest.approx((91379.0 + 93000.0) / 2)
    assert s["best_window_qps_per_chip"] == pytest.approx(94309.0)
    assert len(s["windows_qps_per_chip"]) == 6  # all steady windows shown

    # mid-run dip: not a leading prefix -> kept (trim handles it)
    s = bench._summarize([1.0, 90e3, 91e3, 20e3, 92e3, 93e3], 1)
    assert s["ramp_windows_discarded"] == 0
    assert s["value"] == pytest.approx((90e3 + 91e3 + 92e3) / 3)

    # uniformly slow day: median scales too, nothing dropped
    s = bench._summarize([1.0, 20e3, 21e3, 22e3, 23e3], 1)
    assert s["ramp_windows_discarded"] == 0

    # ramp never eats more than half the windows
    s = bench._summarize([1.0, 1.0, 2.0, 3.0, 100e3, 110e3, 120e3], 1)
    assert s["ramp_windows_discarded"] <= 3

    # short lists: no ramp logic, no trim
    s = bench._summarize([1.0, 50e3, 60e3], 1)
    assert s["value"] == pytest.approx(55e3)
    assert bench._summarize([], 1)["value"] == 0.0


def test_summarize_merges_impossible_windows():
    """A relay stall during a metric fetch under-counts one window and
    over-counts the next (measured pair 1,057 / 2,328,265 q/s on a 93k
    chip, 2026-08-18); only together do they span honest wall time, so a
    window above 1.1x the profiled device ceiling merges harmonically
    into its predecessor."""
    ceiling = 92.4e3
    # 2026-08-18 run shape: ramp, stall pair, three clean windows
    s = bench._summarize(
        [1.0, 36956.3, 1056.9, 2328264.6, 88109.0, 93884.1, 93077.5], 1,
        ceiling=ceiling)
    assert s["impossible_windows_merged"] == 1
    pair = 2.0 / (1 / 1056.9 + 1 / 2328264.6)
    assert s["windows_qps_per_chip"][1] == pytest.approx(pair, rel=1e-3)
    # ramp (36956, merged-pair) dropped; kept [88109, 93884, 93077]
    assert s["ramp_windows_discarded"] == 2
    assert s["value"] == pytest.approx(
        (88109.0 + 93884.1 + 93077.5) / 3, rel=1e-6)
    # best window can never exceed the physical bound
    assert s["best_window_qps_per_chip"] == pytest.approx(93884.1)

    # stall on the FIRST steady window: merges into its successor; the
    # merge cascades until the result is physically possible
    s = bench._summarize([1.0, 500e3, 80e3, 85e3, 86e3], 1,
                         ceiling=ceiling)
    assert s["impossible_windows_merged"] >= 1
    assert max(s["windows_qps_per_chip"]) <= 1.1 * ceiling

    # clean run: nothing merged, same result as without a ceiling
    clean = [1.0, 88e3, 90e3, 91e3, 92e3]
    assert (bench._summarize(clean, 1, ceiling=ceiling)["value"]
            == bench._summarize(clean, 1)["value"])

    # genuine good windows on a contended day (median depressed) are NOT
    # merged: the bound is physics (device ceiling), not the median
    s = bench._summarize([1.0, 20e3, 21e3, 22e3, 90e3, 91e3], 1,
                         ceiling=ceiling)
    assert s["impossible_windows_merged"] == 0


@pytest.mark.parametrize("start,prof,k,max_steps,expect", [
    (128, 384, 32, 1024, 384),   # aligned: exact
    (128, 100, 32, 1024, 128),   # unaligned: rounds up to boundary
    (128, 384, 128, 1024, 384),  # k = window
    (100, 10, 32, 1024, 32),     # window [100,110) contains no boundary:
                                 # the trace starts at the next boundary
                                 # (128) and spans that one dispatch
                                 # instead of silently skipping
    (128, 10000, 32, 256, 128),  # window past max_steps: truncated
    (10000, 10, 32, 256, 0),     # start past max_steps: never traced
    (0, 5, 7, 20, 7),            # non-divisible tail steps
])
def test_traced_steps_matches_dispatch_boundaries(start, prof, k,
                                                  max_steps, expect):
    """bench's divisor simulation must mirror the trainer's boundary walk
    (start at first boundary in [start, until), stop at first boundary
    >= until or at max_steps — trainer.fit_resident)."""
    assert bench._traced_steps(start, start + prof, k, max_steps) == expect


def test_exception_still_emits_json_line():
    """A mid-run EXCEPTION (a relay incident surfacing as a backend error
    — measured 2026-08-20: FailedPrecondition after ~600 s, rc=1, EMPTY
    stdout) must leave one parsable JSON line: the watchdog only covers
    time-based stalls, so the child's exception guard owns this path.
    Driven as a real subprocess through the full supervisor->child stack
    (a bogus BENCH_STORE_GB raises in the child before any backend work);
    a FAST failure must not be retried (it is a config error, not a relay
    incident)."""
    import subprocess
    import sys

    env = dict(os.environ, BENCH_FORCE_CPU="1", BENCH_STORE_GB="bogus")
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(bench.__file__),
                                      "bench.py")],
        env=env, capture_output=True, text=True, timeout=120)
    assert proc.returncode == 1
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, proc.stdout
    out = json.loads(lines[0])
    assert out["partial"] is True
    assert out["status"].startswith("error:ValueError")
    assert out["metric"] == "vqa_e2e_train_questions_per_sec_per_chip_b256"
    assert out["attempts"] == 1  # fast config error: no retry


# ---------------------------------------------------------------------------
# Supervisor (round-5): a relay outage stalling one process must not void
# the artifact — BENCH_r04 spent its whole 920 s budget stalled in
# init_state while runs minutes later landed fine. These tests drive
# bench.supervise() against real fake-child subprocesses at second-scale
# (the time knobs exist for exactly this).
# ---------------------------------------------------------------------------

import sys
import textwrap


def _fake_child(tmp_path, body: str) -> list:
    """Write a fake measurement child; returns the child_cmd for
    supervise(). The child sees BENCH_STATUS_FILE like the real one."""
    script = tmp_path / "fake_child.py"
    script.write_text(textwrap.dedent("""\
        import json, os, sys, time
        def status(stage, train_dir=None, n_chips=1, batch_size=256):
            with open(os.environ["BENCH_STATUS_FILE"], "w") as fh:
                json.dump({"stage": stage, "train_dir": train_dir,
                           "n_chips": n_chips, "batch_size": batch_size,
                           "t": time.time()}, fh)
        def windows(train_dir, qps):
            os.makedirs(train_dir, exist_ok=True)
            with open(os.path.join(train_dir, "metrics.jsonl"), "w") as fh:
                for q in qps:
                    fh.write(json.dumps(
                        {"train/questions_per_sec": q}) + "\\n")
    """) + textwrap.dedent(body))
    return [sys.executable, str(script)]


def _supervise_knobs(monkeypatch, **kw):
    # Generous second-scale knobs: this box is 1-CPU and often contended —
    # a fake child's interpreter startup alone was observed taking >2 s.
    defaults = {"BENCH_HARD_EXIT_SECS": "60", "BENCH_STALL_KILL_SECS": "6",
                "BENCH_MIN_RETRY_SECS": "1", "BENCH_MIN_ATTEMPT_SECS": "1",
                "BENCH_KILL_MARGIN_SECS": "30", "BENCH_MAX_ATTEMPTS": "2",
                "BENCH_ERROR_RETRY_AFTER_SECS": "60"}
    defaults.update(kw)
    for k, v in defaults.items():
        monkeypatch.setenv(k, str(v))


def test_supervisor_retries_stalled_child(monkeypatch, capfd, tmp_path):
    """Attempt 1 stalls in init_state with zero windows (the BENCH_r04
    failure shape) -> killed at the stall budget; attempt 2 (a fresh
    process) finishes clean -> its final line wins, with the retry
    recorded in the artifact."""
    _supervise_knobs(monkeypatch)
    marker = tmp_path / "attempt1_ran"
    cmd = _fake_child(tmp_path, f"""
        marker = {str(marker)!r}
        train_dir = {str(tmp_path / 'td2')!r}
        if not os.path.exists(marker):      # attempt 1: the r04 stall
            open(marker, "w").close()
            status("init_state")
            time.sleep(60)
        windows(train_dir, [1000.0, 90000.0, 91000.0, 92000.0, 93000.0])
        status("fit_resident", train_dir)
        print(json.dumps({{"metric": "m", "value": 91500.0, "status": "ok",
                           "partial": False,
                           "windows_qps_per_chip": [90000.0, 91000.0,
                                                    92000.0, 93000.0]}}),
              flush=True)
    """)
    rc = bench.supervise(child_cmd=cmd)
    assert rc == 0
    out = _drain_emits(capfd)
    assert len(out) == 1, "supervisor must print exactly one line"
    final = out[-1]
    assert final["status"] == "ok"
    assert final["partial"] is False
    assert final["attempts"] == 2
    assert final["stall_kills"] == 1
    assert final["value"] == pytest.approx(91500.0)


def test_supervisor_salvages_windows_from_killed_child(monkeypatch, capfd,
                                                       tmp_path):
    """Relay recovery arriving late: the child produced windows but never
    printed a line before the deadline kill -> the supervisor summarizes
    metrics.jsonl itself and emits an ok line (value from the steady
    windows, compile window dropped)."""
    _supervise_knobs(monkeypatch, BENCH_HARD_EXIT_SECS="6",
                     BENCH_KILL_MARGIN_SECS="2", BENCH_MAX_ATTEMPTS="1")
    cmd = _fake_child(tmp_path, f"""
        train_dir = {str(tmp_path / 'td')!r}
        windows(train_dir, [1000.0, 2000.0, 2200.0, 2400.0])
        status("fit_resident", train_dir)
        time.sleep(60)                       # never prints, never exits
    """)
    rc = bench.supervise(child_cmd=cmd)
    assert rc == 0
    final = _drain_emits(capfd)[-1]
    assert final["status"] == "ok"
    assert final["partial"] is True
    # steady = [2000, 2200, 2400] (short list: plain mean, no trim)
    assert final["value"] == pytest.approx(2200.0)


def test_supervisor_retries_late_error(monkeypatch, capfd, tmp_path):
    """An error raised past BENCH_ERROR_RETRY_AFTER_SECS looks like a
    relay incident (measured FailedPrecondition ~600 s in) -> retried in
    a fresh process; the same error raised instantly is a config error ->
    single attempt (covered by test_exception_still_emits_json_line)."""
    _supervise_knobs(monkeypatch, BENCH_ERROR_RETRY_AFTER_SECS="1",
                     BENCH_STALL_KILL_SECS="30")
    marker = tmp_path / "attempt1_ran"
    cmd = _fake_child(tmp_path, f"""
        marker = {str(marker)!r}
        if not os.path.exists(marker):
            open(marker, "w").close()
            status("init_state")
            time.sleep(2.0)                  # "late" under the test knob
            print(json.dumps({{"metric": "m", "value": 0.0, "partial": True,
                               "status": "error:FailedPrecondition",
                               "windows_qps_per_chip": []}}), flush=True)
            sys.exit(1)
        train_dir = {str(tmp_path / 'td2')!r}
        windows(train_dir, [1000.0, 88000.0, 89000.0])
        status("fit_resident", train_dir)
        print(json.dumps({{"metric": "m", "value": 88500.0, "status": "ok",
                           "partial": False,
                           "windows_qps_per_chip": [88000.0, 89000.0]}}),
              flush=True)
    """)
    rc = bench.supervise(child_cmd=cmd)
    assert rc == 0
    final = _drain_emits(capfd)[-1]
    assert final["status"] == "ok"
    assert final["attempts"] == 2
    assert final["value"] == pytest.approx(88500.0)


def test_supervisor_all_attempts_stalled(monkeypatch, capfd, tmp_path):
    """Relay down the whole budget: attempt 1 stall-killed, the FINAL
    attempt rides to the deadline (riding out is strictly better than a
    retry that cannot finish); the artifact still carries one parsable
    zero-window line with the retry evidence, rc=0 (value 0.0 = 'not
    measured', never 'measured zero')."""
    _supervise_knobs(monkeypatch, BENCH_HARD_EXIT_SECS="10",
                     BENCH_KILL_MARGIN_SECS="1")
    cmd = _fake_child(tmp_path, """
        status("init_state")
        time.sleep(60)
    """)
    rc = bench.supervise(child_cmd=cmd)
    assert rc == 0
    final = _drain_emits(capfd)[-1]
    assert final["value"] == 0.0
    assert final["attempts"] == 2
    assert final["stall_kills"] == 1  # the final attempt is never
    #                                   stall-killed, only deadline-killed
    assert final["status"] in ("stalled_at_spawn", "stalled_at_init_state",
                               "no_windows_yet_cold_start")


def test_summarize_keeps_raw_windows_when_merging():
    """ADVICE r04: a stale-ceiling merge of honest windows must stay
    auditable from the artifact alone — the pre-merge raw windows ride
    along whenever any merge happened."""
    ceiling = 92.4e3
    s = bench._summarize([1.0, 1056.9, 2328264.6, 93884.1], 1,
                         ceiling=ceiling)
    assert s["impossible_windows_merged"] == 1
    assert s["windows_qps_per_chip_raw"] == [1056.9, 2328264.6, 93884.1]
    # clean run: no raw duplicate bloating the line
    s = bench._summarize([1.0, 88e3, 90e3, 91e3], 1, ceiling=ceiling)
    assert "windows_qps_per_chip_raw" not in s


def test_probe_free_hbm_ascending():
    """The probe ascends and STOPS at the first failure — measured on
    the axon client that one failed allocation poisons every later one
    in the process, so it must never probe past a failure (a bisecting
    version read 0.0 GB free beside an 8.8 GB store)."""
    probed = []

    def fake_alloc(free):
        def try_alloc(gb):
            # poisoned-client semantics: anything after a failure fails
            probed.append(gb)
            assert all(p <= free for p in probed[:-1]), \
                "probed past the first failure"
            return gb <= free
        return try_alloc

    free = 5.3
    got = bench._probe_free_hbm(hi_gb=16.0, step_gb=0.5,
                                try_alloc=fake_alloc(free))
    assert abs(got - free) <= 0.5
    assert probed == sorted(probed)          # strictly ascending
    assert sum(g > free for g in probed) == 1  # exactly one failure
    # nothing free: reports 0, stops after one probe
    assert bench._probe_free_hbm(step_gb=0.5,
                                 try_alloc=lambda gb: False) == 0.0
    # everything free: reports ~hi without exceeding it
    assert bench._probe_free_hbm(hi_gb=8.0, step_gb=0.5,
                                 try_alloc=lambda gb: True) == 8.0


def test_profiled_step_artifact_roundtrip(monkeypatch, tmp_path):
    """The merge-bound ceiling is DERIVED from the committed artifact
    (refreshed by BENCH_PROFILE runs), keyed by model+variant; the
    in-code constant is only the missing-artifact fallback."""
    fake = tmp_path / "bench_profiled_step.json"
    monkeypatch.setattr(bench, "PROFILED_STEP_FILE", str(fake))
    ms, src = bench._profiled_step_ms()
    assert (ms, src) == (bench.DEVICE_STEP_MS_PROFILED,
                         "fallback_constant")
    bench._record_profiled_step(2.345)
    ms, src = bench._profiled_step_ms()
    assert (ms, src) == (2.345, "artifact")
    # another variant does not shadow the flagship entry
    monkeypatch.setenv("BENCH_MODEL", "vqa_attention2")
    assert bench._variant_key() == "vqa_attention2"
    ms, src = bench._profiled_step_ms()
    assert src == "fallback_constant"
    bench._record_profiled_step(3.05)
    assert bench._profiled_step_ms() == (3.05, "artifact")
    monkeypatch.delenv("BENCH_MODEL")
    assert bench._profiled_step_ms() == (2.345, "artifact")
    # the variant key folds in the numerics knobs
    monkeypatch.setenv("BENCH_QUANT", "int8")
    monkeypatch.setenv("BENCH_MU_DTYPE", "bfloat16")
    assert bench._variant_key() == "vqa_attention+int8+mu_bfloat16"
