"""REAL multi-process distributed test (round-3 VERDICT missing #5).

Two ``jax.distributed`` CPU processes (4 fake devices each, 8 global,
Gloo collectives) drive one resident-SHARDED fit + one resident eval
through tests/mp_worker.py — executing the actual cross-process code
(per-process index-segment slices, per-process sharded-store block
upload, ``process_allgather`` eval fetch) instead of monkeypatching
``jax.process_count`` — and must produce the same losses, params, and
predictions as the identical single-process 8-device run.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "mp_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(_WORKER)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(pid: int, nproc: int, port: int, run_dir: str,
           out: str, n_local_devices: int) -> subprocess.Popen:
    env = dict(os.environ)
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                        f"{n_local_devices}")
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    # `python tests/mp_worker.py` puts tests/ (the script dir), not the
    # cwd, on sys.path — the package import needs the repo root explicitly.
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, _WORKER, str(pid), str(nproc), str(port),
         run_dir, out],
        cwd=_REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)


def _run(nproc: int, tmp_path, tag: str) -> dict:
    port = _free_port()
    run_dir = str(tmp_path / f"run_{tag}")
    out = str(tmp_path / f"out_{tag}.npz")
    procs = [_spawn(pid, nproc, port, run_dir, out, 8 // nproc)
             for pid in range(nproc)]
    logs = [p.communicate(timeout=1200)[0] for p in procs]
    for p, lg in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{lg[-4000:]}"
    with np.load(out, allow_pickle=False) as f:
        data = {k: f[k] for k in f.files}
    data["_metrics"] = json.loads(str(data.pop("metrics")))
    data["_losses"] = [
        json.loads(line)["train/loss"]
        for line in open(os.path.join(run_dir, "metrics.jsonl"))
        if "train/loss" in line]
    return data


@pytest.mark.slow
def test_two_process_resident_sharded_matches_single(tmp_path):
    got = _run(2, tmp_path, "mp2")
    want = _run(1, tmp_path, "sp1")
    # Training-window losses: both processes of the 2-proc run write the
    # same (replicated) values; dedupe and compare against single-process.
    dedup = sorted(set(round(x, 6) for x in got["_losses"]))
    want_l = sorted(set(round(x, 6) for x in want["_losses"]))
    assert len(want_l) >= 2
    np.testing.assert_allclose(dedup, want_l, rtol=2e-5, atol=1e-6)
    # Final params identical (the psum'd grads and AdamW updates must not
    # depend on process layout).
    for k in want:
        if k.startswith("_") or k == "preds":
            continue
        np.testing.assert_allclose(got[k], want[k], rtol=2e-5, atol=2e-6,
                                   err_msg=k)
    # Resident-eval predictions: exact same split order after the sharded
    # epoch's scatter-back.
    np.testing.assert_array_equal(got["preds"], want["preds"])
    for k, v in want["_metrics"].items():
        np.testing.assert_allclose(got["_metrics"][k], v, rtol=1e-4,
                                   atol=1e-5, err_msg=k)
