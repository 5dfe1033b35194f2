"""Inference/serving API: load a trained run and answer questions.

The eval-mode forward automatically takes the Pallas fused-attention path
(models/vqa_attention.py mode dispatch), runs at a fixed compiled batch size
(requests are padded and trimmed — static shapes), and decodes answers
through the run's answer vocab:

    predictor = Predictor("runs/vqa")
    answers = predictor.answer(features, ["what color is the dog?", ...])

For the raw-image model (``vqa_end2end``) pass uint8 images instead of
precomputed features.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from vqa_transfer_externaldata_tpu.cli.common import build_spec
from vqa_transfer_externaldata_tpu.config import Config
from vqa_transfer_externaldata_tpu.utils.checkpoint import load_params
from vqa_transfer_externaldata_tpu.utils.logging import log


class Predictor:
    def __init__(self, train_dir: str, *, batch_size: int = 8,
                 params_path: Optional[str] = None) -> None:
        cfg_path = os.path.join(train_dir, "config.json")
        with open(cfg_path) as fh:
            saved = json.load(fh)
        flat = {f"{s}.{k}": v for s, sec in saved.items()
                for k, v in sec.items()}
        self.cfg: Config = Config().replace_flat(flat)
        self.batch_size = batch_size
        self.spec, self.word_vocab, self.answer_vocab = build_spec(self.cfg)
        if self.word_vocab is None or self.answer_vocab is None:
            raise ValueError(
                "run config has no vocab paths (and is not synthetic); "
                "serving needs vocab.json / answer_vocab.json")
        params_path = params_path or os.path.join(train_dir, "params_final")
        restored = load_params(params_path)
        if isinstance(restored, dict) and "params" in restored:
            self.params = restored["params"]
            self._extra: Dict = restored.get("extra_vars") or {}
        else:  # round-1 artifact layout: the raw param tree
            self.params = restored
            self._extra = {}
        if not self._extra:
            self._extra = self._materialize_extra()
        # Params live on device from init: jit re-transfers host-numpy
        # arguments on EVERY call, and the param tree (~45 MB for the
        # flagship) through the relay costs ~0.9 s/request — measured as
        # a 906 ms batch-1 p50 before this device_put (BENCH_ALL_r04's
        # first serving run). Per-request traffic is now just the
        # features + ids batch and the [B] prediction fetch.
        self.params = jax.device_put(self.params)
        self._extra = jax.device_put(self._extra)
        # f32 feature requests upload at the model's 16-bit compute width
        # (the model casts on arrival anyway — identical math, half the
        # per-request host->device bytes; 103 MB/request at batch 64).
        # uint8 image requests (vqa_end2end) are already minimal.
        from vqa_transfer_externaldata_tpu.ops.layers import dtype_of
        import jax.numpy as jnp
        import ml_dtypes

        self._vis_cast = (ml_dtypes.bfloat16
                          if dtype_of(self.cfg.model.dtype) == jnp.bfloat16
                          else None)
        self._store = None  # set by stage_store()
        self._apply = jax.jit(self._forward)
        log.info("predictor ready: %s (%s), batch %d", train_dir,
                 self.cfg.model.model, batch_size)

    def stage_store(self, grid: np.ndarray) -> None:
        """Upload a feature store's grids ONCE ([M, cells, C] or
        [M, g, g, C], f16/f32); :meth:`answer_indexed` then serves
        requests that reference rows by store index, shipping only ids.
        Through a high-latency link this is the whole game: batch-64 p50
        measured 1.54 s with per-request feature upload vs 33 ms
        pre-staged (BENCH_ALL_r05 `serving_predictor_latency`)."""
        g = np.asarray(grid)
        if g.ndim == 4:
            g = g.reshape(g.shape[0], -1, g.shape[-1])
        dt = self._vis_cast if self._vis_cast is not None else np.float32
        self._store = jax.device_put(np.asarray(g, dt))
        log.info("staged %d-row feature store on device (%.2f GB)",
                 g.shape[0], self._store.nbytes / 1e9)

    def answer_indexed(self, image_index, questions: Sequence[str]
                       ) -> List[str]:
        """Answer questions about images already in the staged store:
        ``image_index`` [N] rows into :meth:`stage_store`'s grid. The
        feature gather happens on device — the request ships ids only."""
        if self._store is None:
            raise ValueError("no staged store — call stage_store() first")
        import jax.numpy as jnp

        idx = jnp.asarray(np.asarray(image_index, np.int32))
        return self.answer(jnp.take(self._store, idx, axis=0), questions)

    def _materialize_extra(self) -> Dict:
        """Non-trainable collections for artifacts that predate extra_vars
        persistence. A shape-only eval_shape probe finds whether the module
        has any (vqa_attention/baseline/vlmap: none); only then is a real
        init run — correct for stats-free modules, and for the raw-image
        model it at least makes apply well-formed (with a loud warning,
        since fresh BN stats are NOT the trained extractor's)."""
        from vqa_transfer_externaldata_tpu.models.zoo import example_batch

        example = self.spec.inputs(example_batch(self.cfg))
        rng = {"params": jax.random.PRNGKey(0)}
        shapes = jax.eval_shape(
            lambda: self.spec.module.init(rng, *example, train=False))
        if set(shapes) <= {"params"}:
            return {}
        log.warning(
            "params_final has no extra_vars but the model carries "
            "non-trainable collections %s — materializing from a fresh "
            "init (retrain or re-save to get the trained statistics)",
            sorted(set(shapes) - {"params"}))
        variables = dict(self.spec.module.init(rng, *example, train=False))
        variables.pop("params")
        return jax.device_get(variables)

    def _forward(self, params, *inputs):
        out = self.spec.module.apply({"params": params, **self._extra},
                                     *inputs, train=False)
        return out["logits"].astype(np.float32).argmax(-1)

    def _encode_questions(self, questions: Sequence[str]) -> np.ndarray:
        T = self.cfg.data.max_question_len
        ids = np.zeros((len(questions), T), np.int32)
        for i, q in enumerate(questions):
            ids[i], _ = self.word_vocab.encode(q, T)
        return ids

    def _dispatch_batched(self, visual, q_ids: np.ndarray) -> tuple:
        """Pad/cast each chunk and enqueue its forward; returns
        ``(device_handles, n)`` without waiting. Device-resident
        ``visual`` (a ``jax.Array`` — pre-staged features, e.g. rows of a
        resident store) skips the cast and the per-request host->device
        feature upload entirely — the dominant serving cost through a
        high-latency link (batch 64 ships 51 MB/request; BASELINE.md
        serving row)."""
        n = q_ids.shape[0]
        bs = self.batch_size
        on_device = isinstance(visual, jax.Array)
        handles = []
        for start in range(0, n, bs):
            end = min(start + bs, n)
            pad = bs - (end - start)
            v = visual[start:end]
            q = q_ids[start:end]
            if pad:
                if on_device:
                    import jax.numpy as jnp

                    v = jnp.concatenate([v, jnp.repeat(v[:1], pad, 0)])
                else:
                    v = np.concatenate([v, np.repeat(v[:1], pad, 0)])
                q = np.concatenate([q, np.repeat(q[:1], pad, 0)])
            if not on_device and self._vis_cast is not None \
                    and v.dtype in (np.float32, np.float64):
                v = v.astype(self._vis_cast)
            handles.append(self._apply(self.params, v, q))
        return handles, n

    def _run_batched(self, visual, q_ids: np.ndarray) -> np.ndarray:
        handles, n = self._dispatch_batched(visual, q_ids)
        # One fetch per chunk AFTER every chunk is enqueued: chunk i's
        # fetch overlaps chunk i+1's upload+compute on the device queue
        # (the old per-chunk blocking loop serialized them).
        outs = [np.asarray(jax.device_get(h)) for h in handles]
        return np.concatenate(outs)[:n]

    def submit(self, visual, questions: Sequence[str]):
        """Enqueue a request; returns an opaque handle for :meth:`result`.

        Pipelining surface: ``submit(N+1)`` before ``result(N)`` overlaps
        request N+1's feature upload with request N's device execution
        and result fetch — device execution is FIFO, so results stay
        ordered. ``visual`` as for :meth:`answer`, or a device-resident
        ``jax.Array`` to skip the upload."""
        q_ids = self._encode_questions(questions)
        assert visual.shape[0] == q_ids.shape[0]
        v = visual if isinstance(visual, jax.Array) else np.asarray(visual)
        return self._dispatch_batched(v, q_ids)

    def result(self, handle) -> List[str]:
        """Fetch a :meth:`submit` handle and decode answer strings."""
        handles, n = handle
        outs = [np.asarray(jax.device_get(h)) for h in handles]
        preds = np.concatenate(outs)[:n]
        return [self.answer_vocab.tokens[int(p)] for p in preds]

    def answer(self, visual, questions: Sequence[str]) -> List[str]:
        """``visual``: [N, grid_cells, C] features (vqa_attention),
        [N, C] pool5 (vqa_baseline), or [N, S, S, 3] uint8 (vqa_end2end);
        host numpy, or a device-resident ``jax.Array`` (pre-staged
        features — skips the per-request upload)."""
        return self.result(self.submit(visual, questions))
