"""Secondary benchmarks: every BASELINE.md throughput row, re-runnable.

``bench.py`` is the driver's ONE-JSON-line artifact (flagship stage-2
train). This script re-verifies the OTHER headline rows — stage-1 vlmap
train, device-resident full-split eval, end2end raw-image train step —
in a single process (one ~90-280 s relay cold start amortized across all
of them) and writes ``BENCH_ALL_r{N}.json`` at the repo root, so those
numbers live in a committed, regenerable artifact instead of hand-edited
prose (round-2 VERDICT "What's missing" item 5).

Usage:  python bench_all.py [round_number]

Each metric: median of ``REPS`` timed calls after a warmup call of the
same compiled program; device sync via ``jax.device_get`` (the axon
relay's ``block_until_ready`` returns early — SKILL.md gotcha).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import jax
import numpy as np

_t0 = time.time()
REPS = 5


def _note(msg: str) -> None:
    print(f"[bench_all +{time.time() - _t0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _median_time(fn, reps: int = REPS) -> float:
    """Median wall seconds of ``fn()`` over ``reps`` calls (post-warmup).
    ``fn`` must end in a ``jax.device_get`` so the relay has executed."""
    fn()  # warmup: compile + first dispatch
    times = []
    for _ in range(reps):
        t = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t)
    return float(np.median(times))


def _windows_qps(train_dir: str, key: str) -> list:
    out = []
    with open(os.path.join(train_dir, "metrics.jsonl")) as fh:
        for line in fh:
            rec = json.loads(line)
            if key in rec:
                out.append(rec[key])
    return out


def bench_stage1_vlmap(on_tpu: bool) -> dict:
    """Stage-1 (vlmap) resident-loop training throughput, regions/s/chip
    (BASELINE.md round-2 row: 50,251).

    Windows are summarized by ``bench._summarize`` (the flagship bench's
    unit-tested statistics): first window (compile+upload) discarded,
    leading sub-half-median windows dropped as relay cold-start ramp,
    trimmed mean of the rest — a 2026-08-18 run measured windows
    [17.8k, 106.5k, 106.8k] where a naive mean reads 77k against a
    ~106.6k steady state."""
    from vqa_transfer_externaldata_tpu.config import Config
    from vqa_transfer_externaldata_tpu.data.datasets import synthetic_vlmap
    from vqa_transfer_externaldata_tpu.models.zoo import build_model
    from vqa_transfer_externaldata_tpu.parallel.trainer import Trainer

    from bench import _summarize

    batch = 256 if on_tpu else 32
    window = 128 if on_tpu else 2
    out = {}
    # "gather": the per-example [B, K] candidate CE; "dense": the
    # count-weighted dense-vocab CE (model.dense_candidate_loss) — same
    # loss to fp noise (tests/test_models.py), minus the [B, K] element
    # gather + backward scatter that dominate the gather step.
    for label, dense in (("gather", False), ("dense", True)):
        # dense: the 0.26 ms profiled step puts only ~8 ms of device work
        # behind each ~20-35 ms relay dispatch at 32 steps/call — one
        # 512-step dispatch per log window amortizes it (133 ms device
        # per dispatch; 128 steps/call still lost ~40% to dispatch).
        win = (512 if dense else window) if on_tpu else window
        cfg = Config().replace_flat({
            "data.synthetic": True, "model.model": "vlmap",
            "model.dense_candidate_loss": dense,
            "train.batch_size": batch, "train.log_every": win,
            "train.max_steps": win * (8 if on_tpu else 2),
            "train.checkpoint_every": 10**9, "train.eval_every": 10**9,
            "train.device_data_cache": True,
            "train.steps_per_call": (win if dense else 32)
                if on_tpu else 2,
            **({} if on_tpu else {"data.vocab_size": 256,
                                  "data.pool5_dim": 128}),
        })
        # BENCH_VLMAP_ROWS scales the corpus (dense mode: counts grow
        # [N, V] — 64k rows = 1.07 GB u16 resident beside the features,
        # the realistic-scale proof for the dense-CE path).
        ds = synthetic_vlmap(
            cfg, size=int(os.environ.get("BENCH_VLMAP_ROWS", "4096"))
            if on_tpu else 128)
        spec = build_model(cfg)
        train_dir = tempfile.mkdtemp(prefix="ba_vlmap_")
        trainer = Trainer(cfg, spec, train_dir=train_dir)
        n_chips = trainer.mesh.devices.size
        state = trainer.init_state(
            next(ds.batches(1, epochs=1, shuffle=False)))
        trainer.fit_resident(ds, state)
        trainer.close()
        stats = _summarize(
            _windows_qps(train_dir, "train/questions_per_sec"), n_chips)
        out[label] = {
            "regions_per_sec_per_chip": stats["value"],
            "windows": stats["windows_qps_per_chip"],
            "ramp_windows_discarded": stats["ramp_windows_discarded"],
            "batch_size": batch}
        _note(f"stage1_vlmap[{label}]: {out[label]}")
    return out


def bench_resident_eval(on_tpu: bool) -> dict:
    """Device-resident full-split eval throughput, q/s/chip (one dispatch
    + one fetch for the whole split; BASELINE.md round-2 row: 84,421).

    16384 rows (round 3; was 4096): the relay's fixed ~35 ms
    dispatch+fetch cost dominated the 4096-row split (profiled device
    time 17 ms of a 50-80 ms wall), understating the full-split rate a
    real 200k-row VQA val eval would see. answer_scores staying host-side
    (trainer._make_resident_evaluator) makes the bigger split nearly
    upload-free (+2 MB).

    Round-3 session 5: ``resident_fused_attention`` on — the headline
    train bench's gather-free path serves eval too, and measuring the
    gathered path here was understating eval 2.1x (device step 2.76 ->
    0.99 ms/batch profiled; the [B, N, C] gather + the gathered Pallas
    forward both disappear). Parity with the gathered evaluator is
    pinned by tests/test_trainer.py::
    test_resident_fused_attention_matches_gather."""
    from vqa_transfer_externaldata_tpu.config import Config
    from vqa_transfer_externaldata_tpu.data.datasets import (
        synthetic_vqa_joined)
    from vqa_transfer_externaldata_tpu.models.zoo import build_model
    from vqa_transfer_externaldata_tpu.parallel.trainer import Trainer

    batch = 256 if on_tpu else 32
    cfg = Config().replace_flat({
        "data.synthetic": True, "train.batch_size": batch,
        "train.device_data_cache": True,
        "train.resident_fused_attention": True,
        **({} if on_tpu else {
            "data.vocab_size": 256, "data.num_answers": 64,
            "data.feature_dim": 256, "data.pool5_dim": 256,
            "model.rnn_dim": 64, "model.fusion_dim": 128,
            "model.att_hidden": 64, "model.dtype": "float32"}),
    })
    n_q = 16384 if on_tpu else 128
    ds = synthetic_vqa_joined(cfg, n_questions=n_q,
                              n_images=256 if on_tpu else 16, seed=0)
    spec = build_model(cfg)
    trainer = Trainer(cfg, spec,
                      train_dir=tempfile.mkdtemp(prefix="ba_eval_"))
    n_chips = trainer.mesh.devices.size
    state = trainer.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
    eval_fn = trainer._make_resident_evaluator(ds)
    dt = _median_time(lambda: eval_fn(state))
    trainer.close()
    return {"questions_per_sec_per_chip": round(n_q / dt / n_chips, 1),
            "rows": n_q, "ms_per_split": round(dt * 1e3, 1)}


def bench_val_scale_eval(on_tpu: bool) -> dict:
    """VQA-v2-val-SCALE resident eval, measured (round-4 VERDICT missing
    #3 — the '~248k q/s/chip projected at >=139k rows' amortization-curve
    claim becomes a number): 215,040 rows (the 214,354-question val split
    padded up to batch 256) over a multi-GB dedup store
    (``BENCH_VAL_STORE_GB``, default 4), one dispatch + one fetch through
    ``Trainer._make_resident_evaluator``."""
    from vqa_transfer_externaldata_tpu.config import Config
    from vqa_transfer_externaldata_tpu.data.datasets import (
        synthetic_vqa_joined)
    from vqa_transfer_externaldata_tpu.models.zoo import build_model
    from vqa_transfer_externaldata_tpu.parallel.trainer import Trainer

    batch = 256 if on_tpu else 32
    cfg = Config().replace_flat({
        "data.synthetic": True, "train.batch_size": batch,
        "train.device_data_cache": True,
        "train.resident_fused_attention": True,
        **({} if on_tpu else {
            "data.vocab_size": 256, "data.num_answers": 64,
            "data.feature_dim": 256, "data.pool5_dim": 256,
            "model.rnn_dim": 64, "model.fusion_dim": 128,
            "model.att_hidden": 64, "model.dtype": "float32"}),
    })
    store_gb = float(os.environ.get("BENCH_VAL_STORE_GB", "4"))
    if on_tpu:
        n_q = 215040  # 840 batches of 256
        n_cells = cfg.data.grid_h * cfg.data.grid_w
        n_img = int(store_gb * 2**30
                    / (n_cells * cfg.data.feature_dim * 2))
    else:
        n_q, n_img = 2048, 64
    ds = synthetic_vqa_joined(cfg, n_questions=n_q, n_images=n_img, seed=0)
    spec = build_model(cfg)
    trainer = Trainer(cfg, spec,
                      train_dir=tempfile.mkdtemp(prefix="ba_valscale_"))
    n_chips = trainer.mesh.devices.size
    state = trainer.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
    eval_fn = trainer._make_resident_evaluator(ds)
    dt = _median_time(lambda: eval_fn(state), reps=3)
    trainer.close()
    return {"questions_per_sec_per_chip": round(n_q / dt / n_chips, 1),
            "rows": n_q, "ms_per_split": round(dt * 1e3, 1),
            "store_gb_f16": round(ds.store.grid.nbytes / 2**30, 2),
            "store_rows": n_img}


def bench_vlmap_desc(on_tpu: bool) -> dict:
    """Stage-1 DESCRIPTION-variant training throughput (the paper's
    blank-fill task-discovery workload) at production shape, GRU and
    BiGRU encoders — the word-level row above does not exercise the
    phrase encoder at all, and the last description number predates the
    dense-vocab scoring + time-major changes (round-4 VERDICT missing
    item: no current ``vlmap_desc`` artifact row existed)."""
    from vqa_transfer_externaldata_tpu.config import Config
    from vqa_transfer_externaldata_tpu.data.datasets import (
        synthetic_vlmap_desc)
    from vqa_transfer_externaldata_tpu.models.zoo import build_model
    from vqa_transfer_externaldata_tpu.parallel.trainer import Trainer
    from bench import _summarize

    batch = 256 if on_tpu else 32
    window = 128 if on_tpu else 2
    out = {}
    for label, bidir, dense in (("gru", False, False),
                                ("bigru", True, False),
                                ("gru_dense", False, True),
                                ("bigru_dense", True, True)):
        # dense variants: one 512-step dispatch per log window, like the
        # word-level dense row — at ~1 ms steps the 32-step dispatches
        # sat at the relay RTT and window walls swung with tenant
        # contention (measured 46k-300k within one run).
        win = (512 if dense else window) if on_tpu else window
        cfg = Config().replace_flat({
            "data.synthetic": True, "model.model": "vlmap_description",
            "model.bidirectional_desc": bidir,
            "model.dense_candidate_loss": dense,
            "train.batch_size": batch, "train.log_every": win,
            "train.max_steps": win * (8 if on_tpu else 2),
            "train.checkpoint_every": 10**9, "train.eval_every": 10**9,
            "train.device_data_cache": True,
            "train.steps_per_call": (win if dense else 32)
                if on_tpu else 2,
            **({} if on_tpu else {"data.vocab_size": 256,
                                  "data.pool5_dim": 128,
                                  "model.rnn_dim": 64}),
        })
        ds = synthetic_vlmap_desc(cfg, size=4096 if on_tpu else 128)
        spec = build_model(cfg)
        train_dir = tempfile.mkdtemp(prefix=f"ba_vld_{label}_")
        trainer = Trainer(cfg, spec, train_dir=train_dir)
        n_chips = trainer.mesh.devices.size
        state = trainer.init_state(
            next(ds.batches(1, epochs=1, shuffle=False)))
        trainer.fit_resident(ds, state)
        trainer.close()
        stats = _summarize(
            _windows_qps(train_dir, "train/questions_per_sec"), n_chips)
        out[label] = {"regions_per_sec_per_chip": stats["value"],
                      "windows": stats["windows_qps_per_chip"],
                      "batch_size": batch}
        _note(f"vlmap_desc[{label}]: {out[label]}")
    return out


def bench_end2end_step(on_tpu: bool) -> dict:
    """End2end raw-image (config 5) train step: 448 JPEG-decoded images ->
    frozen space-to-depth ResNet-101 -> attention head; images/s/chip of
    the device step (BASELINE.md round-2 row: 1,570). Decode is the input
    pipeline's job (threads/grain) and is excluded here, as in round 2."""
    from vqa_transfer_externaldata_tpu.config import Config
    from vqa_transfer_externaldata_tpu.models.zoo import build_model
    from vqa_transfer_externaldata_tpu.parallel.trainer import Trainer

    batch = 32 if on_tpu else 4
    size = 448 if on_tpu else 64
    cfg = Config().replace_flat({
        "data.synthetic": True, "model.model": "vqa_end2end",
        "data.image_size": size,
        "data.grid_h": size // 32, "data.grid_w": size // 32,
        "train.batch_size": batch,
        **({} if on_tpu else {
            "model.resnet_stages": "1,1,1,1", "model.resnet_width": 8,
            "data.vocab_size": 256, "data.num_answers": 64,
            "model.rnn_dim": 64, "model.fusion_dim": 128,
            "model.att_hidden": 64, "model.dtype": "float32"}),
    })
    spec = build_model(cfg)
    rng = np.random.default_rng(0)
    batch_np = {
        "images": rng.integers(0, 256, size=(batch, size, size, 3))
        .astype(np.uint8),
        "q_ids": rng.integers(4, cfg.data.vocab_size, size=(
            batch, cfg.data.max_question_len)).astype(np.int32),
        "answer_id": rng.integers(0, cfg.data.num_answers,
                                  size=batch).astype(np.int32),
    }
    trainer = Trainer(cfg, spec,
                      train_dir=tempfile.mkdtemp(prefix="ba_e2e_"))
    n_chips = trainer.mesh.devices.size
    state_box = [trainer.init_state(batch_np)]
    step_fn = trainer._build_train_step(1)
    dev_batch = jax.device_put(batch_np)
    chain = 16 if on_tpu else 2  # amortize the ~35 ms relay fetch

    def steps():
        metrics = None
        for _ in range(chain):  # async dispatches; ONE sync at the end
            state_box[0], metrics = step_fn(state_box[0], dev_batch)
        jax.device_get(metrics["loss"])

    dt = _median_time(steps) / chain
    trainer.close()
    return {"images_per_sec_per_chip": round(batch / dt / n_chips, 1),
            "ms_per_step": round(dt * 1e3, 2), "batch_size": batch,
            "image_size": size, "steps_per_timing": chain}


def bench_end2end_ingest(on_tpu: bool) -> dict:
    """Config-5 with the pipeline actually FED: raw JPEGs on disk ->
    native libjpeg decode+resize (host) -> prefetch -> jit
    normalize+ResNet+VQA step. Reports (a) sustained img/s of the fed
    loop and (b) the host decode rate per core, so the artifact states
    the host-core budget required to keep the device step
    (``end2end_raw_image_train_step``) fed — the round-3 artifact only
    timed the step on pre-staged images (round-3 VERDICT missing #4)."""
    from vqa_transfer_externaldata_tpu.config import Config
    from vqa_transfer_externaldata_tpu.data import native
    from vqa_transfer_externaldata_tpu.data.ingest import (
        ImageQuestionDataset)
    from vqa_transfer_externaldata_tpu.models.zoo import build_model
    from vqa_transfer_externaldata_tpu.parallel.trainer import Trainer
    from PIL import Image

    batch = 32 if on_tpu else 4
    size = 448 if on_tpu else 64
    window = 8 if on_tpu else 2
    n_windows = 4 if on_tpu else 2
    cfg = Config().replace_flat({
        "data.synthetic": True, "model.model": "vqa_end2end",
        "data.image_size": size,
        "data.grid_h": size // 32, "data.grid_w": size // 32,
        "train.batch_size": batch, "train.log_every": window,
        "train.max_steps": window * n_windows,
        "train.checkpoint_every": 10**9, "train.eval_every": 10**9,
        **({} if on_tpu else {
            "model.resnet_stages": "1,1,1,1", "model.resnet_width": 8,
            "data.vocab_size": 256, "data.num_answers": 64,
            "model.rnn_dim": 64, "model.fusion_dim": 128,
            "model.att_hidden": 64, "model.dtype": "float32"}),
    })
    d = cfg.data
    # Synthetic JPEG corpus on disk (random noise is worst-case JPEG
    # entropy — real COCO photos decode no slower).
    img_dir = tempfile.mkdtemp(prefix="ba_jpegs_")
    rng = np.random.default_rng(0)
    n_imgs = 128 if on_tpu else 16
    paths = []
    for i in range(n_imgs):
        arr = rng.integers(0, 256, size=(size, size, 3)).astype(np.uint8)
        p = os.path.join(img_dir, f"{i}.jpg")
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)

    # (b) host decode rate, per core: the native decoder threads over the
    # batch in C++, but this box has one core — state the per-core rate.
    # decode_jpeg_batch returns None when the native library isn't built;
    # timing that no-op would report a absurd multi-million img/s "rate",
    # so the row carries null instead (native_decoder: false names why).
    # (c) decode THREAD scaling (round-4 VERDICT missing #4): the
    # "~5 host cores sustain the step rate" claim needs a measured slope,
    # not an extrapolation. On this 1-core box threads contend, so the
    # 1->2 slope is a LOWER bound on the per-core scaling (2 threads on 2
    # real cores can only do better than 2 threads on 1); the artifact
    # states the measured numbers and that bound explicitly.
    decode = native.decode_jpeg_batch(paths, size)
    decode_rate, decode_scaling = None, None
    if decode is not None:
        t0 = time.perf_counter()
        native.decode_jpeg_batch(paths, size)
        decode_rate = round(n_imgs / (time.perf_counter() - t0), 1)
        decode_scaling = {}
        for nt in (1, 2):
            t0 = time.perf_counter()
            native.decode_jpeg_batch(paths, size, threads=nt)
            decode_scaling[f"threads_{nt}"] = round(
                n_imgs / (time.perf_counter() - t0), 1)

    n_q = window * n_windows * batch
    arrays = {
        "q_ids": rng.integers(4, d.vocab_size, size=(
            n_q, d.max_question_len)).astype(np.int32),
        "answer_id": rng.integers(0, d.num_answers,
                                  size=n_q).astype(np.int32),
        "image_index": rng.integers(0, n_imgs, size=n_q).astype(np.int32),
    }
    ds = ImageQuestionDataset(arrays, paths, image_size=size)
    spec = build_model(cfg)
    train_dir = tempfile.mkdtemp(prefix="ba_ingest_")
    trainer = Trainer(cfg, spec, train_dir=train_dir)
    n_chips = trainer.mesh.devices.size
    state = trainer.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
    trainer.fit(ds.batches(batch, seed=0), state)
    trainer.close()
    from bench import _summarize

    stats = _summarize(_windows_qps(train_dir, "train/questions_per_sec"),
                       n_chips)

    # Grain-fed variant of the SAME row (round-4 VERDICT missing #4): the
    # checkpointable production input pipeline (--data.input_pipeline
    # grain) instead of the ThreadPool batcher; workers=0 = in-process
    # decode (mp workers would only contend on this 1-core host).
    from vqa_transfer_externaldata_tpu.data.grain_loader import (
        GrainTrainIterator)

    grain_dir = tempfile.mkdtemp(prefix="ba_ingestg_")
    trainer = Trainer(cfg, spec, train_dir=grain_dir)
    state = trainer.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
    trainer.fit(GrainTrainIterator(ds, batch_size=batch, seed=0), state)
    trainer.close()
    ds.close()
    grain_stats = _summarize(
        _windows_qps(grain_dir, "train/questions_per_sec"), n_chips)

    host_cores = os.cpu_count() or 1
    return {"images_per_sec_per_chip_with_ingest": stats["value"],
            "windows": stats["windows_qps_per_chip"],
            "images_per_sec_per_chip_grain_fed": grain_stats["value"],
            "grain_windows": grain_stats["windows_qps_per_chip"],
            "host_decode_imgs_per_sec": decode_rate,
            "host_decode_thread_scaling": decode_scaling,
            "host_cores": host_cores,
            "native_decoder": decode is not None,
            "batch_size": batch, "image_size": size}


def bench_serving(on_tpu: bool) -> dict:
    """Serving surface (serving.Predictor): per-request wall latency
    p50/p99 and throughput at batch 1/8/64 through the public
    ``Predictor.answer`` path — question encode, pad-to-batch, jit
    forward, device fetch, answer decode. This is the number a deployment
    sees; the eval rows above are trainer-path numbers (round-3 VERDICT
    missing #6)."""
    from vqa_transfer_externaldata_tpu.config import Config
    from vqa_transfer_externaldata_tpu.models.zoo import build_model
    from vqa_transfer_externaldata_tpu.serving import Predictor
    from vqa_transfer_externaldata_tpu.utils.checkpoint import save_params

    cfg = Config().replace_flat({
        "data.synthetic": True,
        **({} if on_tpu else {
            "data.vocab_size": 256, "data.num_answers": 64,
            "data.feature_dim": 256, "data.pool5_dim": 256,
            "model.rnn_dim": 64, "model.fusion_dim": 128,
            "model.att_hidden": 64, "model.dtype": "float32"}),
    })
    run_dir = tempfile.mkdtemp(prefix="ba_serve_")
    with open(os.path.join(run_dir, "config.json"), "w") as fh:
        fh.write(cfg.to_json())
    spec = build_model(cfg)
    from vqa_transfer_externaldata_tpu.models.zoo import example_batch

    example = spec.inputs(example_batch(cfg))
    params = spec.module.init({"params": jax.random.PRNGKey(0)},
                              *example, train=False)["params"]
    save_params(os.path.join(run_dir, "params_final"),
                {"params": jax.device_get(params)})

    d = cfg.data
    n_cells = d.grid_h * d.grid_w
    rng = np.random.default_rng(0)
    out = {}
    reps = 50 if on_tpu else 5
    for bs in (1, 8, 64) if on_tpu else (1, 4):
        pred = Predictor(run_dir, batch_size=bs)
        feats = rng.normal(size=(bs, n_cells, d.feature_dim)) \
            .astype(np.float32)
        questions = [f"w{5 + i % 20} w{6 + i % 20}" for i in range(bs)]
        pred.answer(feats, questions)  # compile + warm
        times = []
        for _ in range(reps):
            t = time.perf_counter()
            pred.answer(feats, questions)
            times.append(time.perf_counter() - t)
        p50 = float(np.percentile(times, 50))
        p99 = float(np.percentile(times, 99))
        out[f"batch_{bs}"] = {
            "p50_ms": round(p50 * 1e3, 2), "p99_ms": round(p99 * 1e3, 2),
            "qps_at_p50": round(bs / p50, 1)}

        # Pipelined STREAM at the same batch size (round-4 VERDICT weak
        # #3): submit(N+1) before result(N) overlaps the next request's
        # feature upload with the current request's device execution +
        # fetch. Reported as per-request mean over the stream, so it is
        # directly comparable to p50 above.
        n_req = reps
        t0 = time.perf_counter()
        handle = pred.submit(feats, questions)
        for _ in range(n_req - 1):
            nxt = pred.submit(feats, questions)
            pred.result(handle)
            handle = nxt
        pred.result(handle)
        per_req = (time.perf_counter() - t0) / n_req
        out[f"batch_{bs}"]["pipelined_ms_per_request"] = round(
            per_req * 1e3, 2)
        out[f"batch_{bs}"]["pipelined_qps"] = round(bs / per_req, 1)

        # Pre-staged device features (same VERDICT item): the request's
        # feature tensor already lives on device (e.g. rows of the
        # resident store) — the serving envelope minus the host->device
        # feature upload the batch-64 row is dominated by.
        import jax.numpy as jnp

        dev_feats = jax.device_put(feats.astype(jnp.bfloat16))
        jax.device_get(pred._apply(pred.params, dev_feats,
                                   pred._encode_questions(questions)))
        times = []
        for _ in range(reps):
            t = time.perf_counter()
            pred.answer(dev_feats, questions)
            times.append(time.perf_counter() - t)
        p50s = float(np.percentile(times, 50))
        out[f"batch_{bs}"]["pre_staged_p50_ms"] = round(p50s * 1e3, 2)
        out[f"batch_{bs}"]["pre_staged_qps_at_p50"] = round(bs / p50s, 1)
    return out


def main() -> None:
    if os.environ.get("BENCH_FORCE_CPU"):
        # Same escape hatch as bench.py: the axon sitecustomize overrides
        # JAX_PLATFORMS programmatically, and the relay probe can hang for
        # minutes when the relay is down.
        jax.config.update("jax_platforms", "cpu")
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    on_tpu = jax.default_backend() != "cpu"
    _note(f"backend={jax.default_backend()} devices={jax.device_count()}")
    out = {"backend": jax.default_backend(),
           "devices": jax.device_count(),
           "note": ("wall timings through the axon relay; the profiled "
                    "device step is the stable number (BASELINE.md)")}
    # BENCH_ALL_ONLY=<row[,row...]> re-runs a subset and MERGES into the
    # existing artifact (a single relay-contaminated row shouldn't cost a
    # full re-run of every other row).
    only = {s for s in os.environ.get("BENCH_ALL_ONLY", "").split(",") if s}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"BENCH_ALL_r{rnd:02d}.json" if rnd
                        else "BENCH_ALL.json")
    if only and os.path.exists(path):
        with open(path) as fh:
            out = {**json.load(fh), **out}
    rows = [("stage1_vlmap_train", bench_stage1_vlmap),
            ("vlmap_desc_train", bench_vlmap_desc),
            ("resident_full_split_eval", bench_resident_eval),
            ("val_scale_resident_eval", bench_val_scale_eval),
            ("end2end_raw_image_train_step", bench_end2end_step),
            ("end2end_with_ingest", bench_end2end_ingest),
            ("serving_predictor_latency", bench_serving)]
    unknown = only - {n for n, _ in rows}
    if unknown:  # a typo would otherwise silently re-header stale rows
        raise SystemExit(
            f"BENCH_ALL_ONLY names unknown rows {sorted(unknown)}; "
            f"known: {sorted(n for n, _ in rows)}")
    for name, fn in rows:
        if only and name not in only:
            continue
        _note(f"{name}: starting")
        # Per-row timestamp (round-4 ADVICE): a BENCH_ALL_ONLY merge keeps
        # stale rows next to fresh ones — each row says when it was
        # actually measured instead of inheriting the new header's date.
        out[name] = dict(fn(on_tpu), recorded_unix=int(time.time()))
        _note(f"{name}: {out[name]}")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    _note(f"wrote {path}")


if __name__ == "__main__":
    main()
