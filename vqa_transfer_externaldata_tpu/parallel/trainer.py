"""Shared sharded data-parallel trainer (reference C10, rebuilt TPU-first).

One trainer serves both stages (BASELINE.json: "share one sharded
data-parallel trainer"): the model family only contributes a flax module, a
batch adapter, and a loss via its ModelSpec (models/zoo.py). Each step is a
single jit-compiled program over the mesh — batch sharded on the ``data``
axis, state replicated and donated, gradient all-reduce emitted by XLA from
sharding propagation (the rebuild's replacement for the reference's
``sess.run`` boundary, SURVEY.md section 3.6).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from vqa_transfer_externaldata_tpu.config import Config
from vqa_transfer_externaldata_tpu.models.zoo import ModelSpec
from vqa_transfer_externaldata_tpu.parallel.mesh import (
    batch_sharding, create_mesh, put_sharded, replicated)
from vqa_transfer_externaldata_tpu.utils.checkpoint import CheckpointManager
from vqa_transfer_externaldata_tpu.utils.logging import MetricWriter, Timer, log


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array
    # Non-trainable variable collections (e.g. frozen BatchNorm stats for
    # the raw-image backbone); empty dict for the precomputed-feature models.
    extra_vars: Any = flax.struct.field(default_factory=dict)


def make_lr_schedule(cfg: Config) -> optax.Schedule:
    """Linear warmup into staircase exponential decay (reference C10's
    Adam + decaying LR, with warmup added for large-batch stability)."""
    t = cfg.train

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.minimum(1.0, (step + 1.0) / max(1, t.warmup_steps))
        decay = t.lr_decay_rate ** jnp.floor(step / t.lr_decay_steps)
        return t.learning_rate * warm * decay

    return schedule


def _next_multiple(step: int, every: int) -> int:
    """Smallest multiple of ``every`` strictly greater than ``step``."""
    every = max(1, every)
    return (step // every + 1) * every


def _eval_metrics(spec, outputs, batch) -> Dict[str, Any]:
    """Eval-step metrics: the spec's loss when the batch carries its
    declared target column (``spec.label_key`` — "answer_id" for the VQA
    family, "label" for vlmap), else the predictions-only pass (a split
    without targets, e.g. a user-built server-submission table, must
    evaluate instead of crashing in the loss). Static python branch —
    jit traces per batch structure. Shared by the streaming eval step
    and the resident evaluator so the gate cannot drift between them."""
    if spec.label_key in batch:
        _, metrics = spec.loss(outputs, batch)
        return metrics
    mask = batch.get("example_mask")
    b = next(iter(batch.values())).shape[0]
    return {"weight": (jnp.sum(mask) if mask is not None
                       else jnp.asarray(float(b)))}


def sharded_index_batches(owner: np.ndarray, n_shards: int,
                          per_shard: int, seed: int):
    """Seeded per-shard index sampler for ``train.store_sharded``.

    ``owner[i]`` is the store shard (0..n_shards-1) holding row ``i``'s
    image. Yields [n_shards * per_shard] int64 batches whose slot ``d``
    (positions ``d*per_shard:(d+1)*per_shard``) contains only rows owned
    by shard ``d`` — the layout ``NamedSharding(P(None, 'data'))`` places
    on device ``d``, so each device's fused-attention grid reads only its
    local store shard. Every shard draws from an independent seeded
    permutation epoch over its own rows (standard pre-sharded
    data-parallel sampling: each worker owns a fixed dataset slice);
    shards cycle their epochs at their own rate, so no global epoch
    boundary exists. Deterministic given (owner, n_shards, per_shard,
    seed) — tests replay the exact stream through the gathered path."""
    lists = [np.flatnonzero(owner == d) for d in range(n_shards)]
    empty = [d for d, l in enumerate(lists) if l.size == 0]
    if empty:
        raise ValueError(
            f"store_sharded: store shard(s) {empty} own no dataset rows — "
            "every shard needs at least one question (rebalance the store "
            "or reduce the data-axis size)")
    smallest = min(l.size for l in lists)
    if smallest < per_shard:
        # The replicated sampler raises on size < batch_size; here a
        # too-small SHARD still trains, but its questions repeat within
        # every single batch — call that out loudly (real VQA shards own
        # thousands of questions; this fires on toy/skewed corpora).
        log.warning(
            "store_sharded: smallest shard owns %d questions < per-shard "
            "batch %d — its questions are ~%.1fx oversampled every step",
            smallest, per_shard, per_shard / smallest)
    rngs = [np.random.default_rng(
        np.random.SeedSequence([seed, 0x5A7D, d])) for d in range(n_shards)]
    pools = [rng.permutation(l) for rng, l in zip(rngs, lists)]
    offs = [0] * n_shards
    while True:
        parts = []
        for d in range(n_shards):
            take = []
            need = per_shard
            while need:
                avail = pools[d][offs[d]:offs[d] + need]
                if avail.size == 0:  # epoch exhausted: reshuffle
                    pools[d] = rngs[d].permutation(lists[d])
                    offs[d] = 0
                    continue
                take.append(avail)
                offs[d] += avail.size
                need -= avail.size
            parts.append(np.concatenate(take) if len(take) > 1
                         else take[0])
        yield np.concatenate(parts)


def _freeze_mask_fn(names_csv: str) -> Callable[[Any], Any]:
    """Pytree-of-bools mask: True (frozen) where any path component of the
    leaf matches a name in the comma-separated list."""
    names = {n.strip() for n in names_csv.split(",") if n.strip()}

    def mask(params: Any) -> Any:
        def rec(tree: Any, hit: bool) -> Any:
            if isinstance(tree, dict):
                return {k: rec(v, hit or k in names)
                        for k, v in tree.items()}
            return hit

        return rec(params, False)

    return mask


def make_optimizer(cfg: Config, extra_frozen: str = ""
                   ) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    """``extra_frozen``: model-implied frozen subtrees appended to
    ``train.freeze_params`` (the Trainer adds ``resnet`` when the module
    declares ``freeze_backbone`` — a 44M-param ResNet-101 must not carry
    Adam state: m/v for it is ~350 MB of HBM and >1 GB/step of pure
    read-modify-write traffic for updates that are identically zero)."""
    t = cfg.train
    lr = make_lr_schedule(cfg)
    if t.adam_mu_dtype not in ("float32", "bfloat16"):
        # Fail at build time, loudly: f16 mu would overflow silently and
        # anything else is a typo (mirrors the store_quantize gate).
        raise ValueError(
            f"train.adam_mu_dtype={t.adam_mu_dtype!r}: 'float32' or "
            "'bfloat16' (BASELINE.md step-tail A/B)")
    frozen_csv = ",".join(s for s in (t.freeze_params, extra_frozen) if s)
    adamw = optax.adamw(lr, b1=t.adam_beta1, b2=t.adam_beta2,
                        eps=t.adam_eps, weight_decay=t.weight_decay,
                        # mu is scan-carried state: bf16 halves its
                        # read+write share of the per-step optimizer
                        # traffic floor (config.py adam_mu_dtype).
                        mu_dtype=t.adam_mu_dtype)
    if not frozen_csv:
        return optax.chain(optax.clip_by_global_norm(t.grad_clip_norm),
                           adamw), lr
    # Frozen leaves are zeroed BEFORE the global-norm clip (their
    # gradients must not inflate the clip norm and scale down every live
    # param's update). adamw itself is masked to the TRAINABLE leaves, so
    # frozen leaves allocate NO m/v state (optax.MaskedNode) and pay no
    # per-step optimizer traffic; their (zeroed) updates pass through
    # unchanged and weight decay cannot leak into them. The transferred
    # answer space stays exactly as transfer_init wrote it.
    frozen_fn = _freeze_mask_fn(frozen_csv)

    def trainable_fn(params):
        return jax.tree_util.tree_map(lambda m: not m, frozen_fn(params))

    return optax.chain(
        optax.masked(optax.set_to_zero(), frozen_fn),
        optax.clip_by_global_norm(t.grad_clip_norm),
        optax.masked(adamw, trainable_fn),
    ), lr


class Trainer:
    """Build once, then ``fit`` / ``evaluate`` / ``restore``."""

    # fit_resident stages its seeded index table in segments of this many
    # steps (~2 MB each); shrink in tests to exercise re-staging.
    resident_segment_steps = 2048

    def __init__(self, cfg: Config, spec: ModelSpec,
                 mesh: Optional[jax.sharding.Mesh] = None,
                 train_dir: Optional[str] = None) -> None:
        self.cfg = cfg
        self.spec = spec
        self.mesh = mesh if mesh is not None else create_mesh(cfg)
        n_data = self.mesh.shape[self.mesh.axis_names[0]]
        if cfg.train.batch_size % n_data:
            raise ValueError(
                f"global batch_size={cfg.train.batch_size} must be divisible "
                f"by the data-axis size {n_data} of {self.mesh}")
        if cfg.train.store_sharded and not cfg.train.device_data_cache:
            # Loud by contract (config.py): the flag exists to NOT hold
            # the full store per device; a run the user believes is
            # sharded must never silently proceed unsharded.
            raise ValueError(
                "train.store_sharded needs train.device_data_cache — the "
                "feature store only exists device-resident")
        module_updates: Dict[str, Any] = {}
        if n_data > 1 and getattr(spec.module, "data_mesh", "no") is None:
            # Multi-device data axis: hand the model the mesh so the
            # resident attention op runs under shard_map (each device its
            # own scalar-prefetch grid — GSPMD cannot partition the Mosaic
            # custom call itself; ops/attention_resident docstring).
            module_updates.update(data_mesh=self.mesh,
                                  data_axis_name=self.mesh.axis_names[0])
        if (cfg.train.resident_fused_attention
                and cfg.train.device_data_cache
                and getattr(spec.module, "normalize_v", False)
                and getattr(spec.module, "store_prenormalized", None)
                is False):
            # The fused resident mode L2-normalizes the store's cells ONCE
            # at upload (_prepare_resident) instead of on every kernel
            # access — the model must then skip normalization on the
            # (store, rows) path. Decided here so the train/eval step
            # closures (built below) and _prepare_resident agree.
            module_updates.update(store_prenormalized=True)
        if module_updates:
            import dataclasses

            self.spec = spec = dataclasses.replace(
                spec, module=spec.module.clone(**module_updates))
        self.tx, self.lr_fn = make_optimizer(
            cfg, extra_frozen=("resnet" if getattr(
                spec.module, "freeze_backbone", False) else ""))
        self.train_dir = train_dir or cfg.train.train_dir
        self.ckpt = CheckpointManager(
            self.train_dir, keep=cfg.train.keep_checkpoints,
            save_every=cfg.train.checkpoint_every)
        self.metrics = MetricWriter(self.train_dir)
        self._repl = replicated(self.mesh)
        self._bshard = batch_sharding(self.mesh)
        from jax.sharding import NamedSharding, PartitionSpec as P

        self._bstack_shard = NamedSharding(
            self.mesh, P(None, self.mesh.axis_names[0]))
        self._shard_rules = tuple(
            s.strip() for s in cfg.mesh.shard_params.split(",") if s.strip())
        # (n_shards, rows_per_shard) once _prepare_resident has staged a
        # row-sharded store (train.store_sharded), else None.
        self._resident_shard: Optional[Tuple[int, int]] = None
        self._step_cache: Dict[int, Callable] = {}
        # Prime the default-k step now: _build_train_step also records
        # _raw_step_fn (read by init_state and the resident paths).
        self._step_for(max(1, cfg.train.steps_per_call))
        self._eval_step = self._build_eval_step()

    def _set_module_attrs(self, **updates) -> None:
        """Update static module attributes discovered after construction
        (e.g. the int8 store's dequantization scale, known only once
        ``_prepare_resident`` has seen the dataset) and rebuild every
        step/eval closure that captured the old module. No-op when the
        attributes already hold the requested values."""
        if all(getattr(self.spec.module, k, None) == v
               for k, v in updates.items()):
            return
        import dataclasses

        self.spec = dataclasses.replace(
            self.spec, module=self.spec.module.clone(**updates))
        self._step_cache.clear()
        self._step_for(max(1, self.cfg.train.steps_per_call))  # re-prime
        self._eval_step = self._build_eval_step()

    def _step_for(self, k: int) -> Callable:
        """Compiled train step fusing ``k`` optimizer steps per dispatch.
        Cached per k — the non-divisible tail of a run (max_steps % k != 0)
        costs exactly one extra compile instead of overshooting max_steps
        on padded duplicate batches."""
        if k not in self._step_cache:
            self._step_cache[k] = self._build_train_step(k)
        return self._step_cache[k]

    def _tree_shardings(self, tree: Any) -> Any:
        """Per-leaf placements for a params-like tree: leaves whose tree
        path matches a ``mesh.shard_params`` rule are sharded row-wise over
        the model axis (tensor parallelism for the embedding/classifier
        tables); everything else replicates. With no rules this is the
        single replicated sharding (the round-1 behavior, zero overhead).
        Works on any tree whose paths embed the param names — the optax
        state's mu/nu mirrors match the same rules."""
        if not self._shard_rules:
            return self._repl
        from jax.sharding import NamedSharding, PartitionSpec as P

        maxis = self.mesh.axis_names[1]
        msize = self.mesh.shape[maxis]
        row_shard = NamedSharding(self.mesh, P(maxis))

        def leaf(path, x):
            p = jax.tree_util.keystr(path)
            if (any(r in p for r in self._shard_rules)
                    and getattr(x, "ndim", 0) >= 1
                    and x.shape[0] >= msize and x.shape[0] % msize == 0):
                return row_shard
            return self._repl

        return jax.tree_util.tree_map_with_path(leaf, tree)

    def _state_in_spec(self) -> Any:
        """jit in/out sharding entry for a TrainState argument: the pinned
        replicated sharding normally; ``None`` (infer from the committed
        input, which init_state placed per _tree_shardings) when tensor-
        parallel param sharding is active."""
        return None if self._shard_rules else self._repl

    # -- state ---------------------------------------------------------------

    def init_state(self, example_batch: Dict[str, np.ndarray],
                   params: Optional[Any] = None,
                   extra_vars: Optional[Any] = None) -> TrainState:
        """Initialize (or adopt) params / non-trainable collections,
        replicated on mesh. ``extra_vars`` adoption is how pretrained frozen
        BatchNorm stats enter the raw-image model (cli.train backbone load)."""
        host_batch = {k: np.asarray(v)[:1] for k, v in example_batch.items()}
        rng = jax.random.PRNGKey(self.cfg.train.seed)

        def init_fn():
            variables = dict(self.spec.module.init(
                {"params": rng}, *self.spec.inputs(host_batch), train=False))
            return variables.pop("params"), variables

        def opt_init(p):
            return self.tx.init(p)

        if params is None:
            # ONE jitted program for params + extra collections + optimizer
            # state: each separate jit dispatch pays a full remote-compile
            # + relay round (~1.5 min each measured under contention on the
            # axon link) — fusing them halved the bench cold start.
            def init_all():
                p, variables = init_fn()
                return p, variables, opt_init(p)

            if self._shard_rules:
                p_sh, v_sh, o_sh = jax.eval_shape(init_all)
                out_sh = (self._tree_shardings(p_sh), self._repl,
                          self._tree_shardings(o_sh))
            else:
                out_sh = self._repl
            params, fresh_extra, opt_state = jax.jit(
                init_all, out_shardings=out_sh)()
        else:
            fresh_extra = None
            if extra_vars is None:
                _, fresh_extra = jax.jit(init_fn,
                                         out_shardings=self._repl)()
            params = (jax.device_put(params, self._tree_shardings(params))
                      if self._shard_rules
                      else put_sharded(params, self._repl))
            opt_out_sh = (self._tree_shardings(
                jax.eval_shape(opt_init, params))
                if self._shard_rules else self._repl)
            opt_state = jax.jit(opt_init, out_shardings=opt_out_sh)(params)
        extra_vars = (put_sharded(extra_vars, self._repl)
                      if extra_vars is not None else fresh_extra)
        return TrainState(
            step=jax.device_put(jnp.zeros((), jnp.int32), self._repl),
            params=params, opt_state=opt_state,
            rng=jax.device_put(jax.random.PRNGKey(self.cfg.train.seed + 1),
                               self._repl),
            extra_vars=extra_vars)

    def restore(self, state: TrainState,
                step: Optional[int] = None) -> TrainState:
        return self.ckpt.restore(state, step)

    # -- compiled steps --------------------------------------------------------

    def _build_train_step(self, k: int = 1) -> Callable:
        spec, tx, lr_fn = self.spec, self.tx, self.lr_fn

        remat = self.cfg.train.remat

        def step_fn(state: TrainState,
                    batch: Dict[str, jax.Array]):
            rng, dropout_rng = jax.random.split(state.rng)

            def forward(params, batch, dropout_rng):
                return spec.module.apply(
                    {"params": params, **state.extra_vars},
                    *spec.inputs(batch), train=True,
                    rngs={"dropout": dropout_rng})

            if remat:
                # Rematerialize activations in the backward pass
                # (jax.checkpoint): FLOPs for memory.
                forward = jax.checkpoint(forward)

            def loss_fn(params):
                outputs = forward(params, batch, dropout_rng)
                loss, metrics = spec.loss(outputs, batch)
                return loss, metrics

            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (_, metrics), grads = grad_fn(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = dict(metrics)
            metrics.pop("weight", None)  # eval-weighting aid, not a metric
            metrics["grad_norm"] = optax.global_norm(grads)
            metrics["lr"] = lr_fn(state.step)
            new_state = TrainState(step=state.step + 1, params=params,
                                   opt_state=opt_state, rng=rng,
                                   extra_vars=state.extra_vars)
            return new_state, metrics

        self._raw_step_fn = step_fn  # reused by the device-resident path
        donate = (0,) if self.cfg.train.donate_state else ()
        if k > 1:
            # Fuse k steps into one dispatch: scan over a [k, ...]-stacked
            # batch. Amortizes per-dispatch runtime overhead (significant
            # through the axon relay: ~1 ms/dispatch).
            def multi_step_fn(state: TrainState,
                              batch_stack: Dict[str, jax.Array]):
                def body(s, b):
                    return step_fn(s, b)

                state, metrics = jax.lax.scan(body, state, batch_stack)
                return state, jax.tree_util.tree_map(
                    lambda m: m[-1], metrics)

            return jax.jit(
                multi_step_fn,
                in_shardings=(self._state_in_spec(), self._bstack_shard),
                out_shardings=(self._state_in_spec(), self._repl),
                donate_argnums=donate)
        return jax.jit(
            step_fn,
            in_shardings=(self._state_in_spec(), self._bshard),
            out_shardings=(self._state_in_spec(), self._repl),
            donate_argnums=donate)

    def _build_eval_step(self) -> Callable:
        spec = self.spec

        def eval_fn(params, extra_vars, batch):
            outputs = spec.module.apply({"params": params, **extra_vars},
                                        *spec.inputs(batch), train=False)
            preds = jnp.argmax(outputs["logits"].astype(jnp.float32), -1)
            metrics = _eval_metrics(spec, outputs, batch)
            return preds, metrics

        return jax.jit(
            eval_fn,
            in_shardings=(self._state_in_spec(), self._repl, self._bshard),
            out_shardings=(self._bshard, self._repl))

    # -- loops -----------------------------------------------------------------

    def fit(self, train_batches: Iterator[Dict[str, np.ndarray]],
            state: TrainState,
            eval_batches_fn: Optional[Callable[[], Iterator]] = None,
            max_steps: Optional[int] = None) -> TrainState:
        t = self.cfg.train
        max_steps = max_steps if max_steps is not None else t.max_steps
        # Checkpointable input pipelines (grain): their state is persisted
        # next to each Orbax checkpoint so resume is sample-exact. A
        # prefetch wrapper would make get_state() overshoot by its depth
        # (grain prefetches internally), so stateful iterators skip it.
        stateful_input = hasattr(train_batches, "get_state")
        if t.prefetch_batches > 0 and not stateful_input:
            from vqa_transfer_externaldata_tpu.data.datasets import (
                PrefetchIterator)

            train_batches = PrefetchIterator(train_batches,
                                             depth=t.prefetch_batches)
        timer = Timer()
        pending: Dict[str, jax.Array] = {}
        step = int(jax.device_get(state.step))
        last_log = step
        # Deterministic cadence: fire when step crosses the next multiple
        # of the interval, then re-arm past the current step. The old
        # ``step % every < k`` test double-fired or skipped whenever
        # ``every % steps_per_call != 0``.
        next_log = _next_multiple(step, t.log_every)
        next_eval = _next_multiple(step, t.eval_every)
        log.info("training from step %d to %d (global batch %d over %s)",
                 step, max_steps, t.batch_size, self.mesh)
        profile_until = (t.profile_start + t.profile_steps
                         if t.profile_steps else -1)
        profiling = False
        while step < max_steps:
            if (t.profile_steps and not profiling and profile_until >= 0
                    and step >= t.profile_start):
                # >= (not ==): dispatch boundaries advance by
                # steps_per_call, so profile_start may never be hit
                # exactly; no upper bound — a window narrower than one
                # dispatch still traces that one dispatch instead of
                # silently skipping (stop below ends it).
                jax.profiler.start_trace(
                    os.path.join(self.train_dir, "profile"))
                profiling = True
                profile_until = max(profile_until, step + 1)
                log.info("profiler trace started (steps %d..%d)",
                         step, profile_until)
            # Tail dispatch clamps to max_steps (one extra compile via
            # _step_for) instead of overshooting on duplicate batches.
            k = min(max(1, t.steps_per_call), max_steps - step)
            if k > 1:
                group = [self._cast_features_host(next(train_batches))
                         for _ in range(k)]
                batch = {key: np.stack([g[key] for g in group])
                         for key in group[0]}
                batch = put_sharded(batch, self._bstack_shard)
            else:
                batch = self._cast_features_host(next(train_batches))
                batch = put_sharded(batch, self._bshard)
            state, pending = self._step_for(k)(state, batch)
            step += k
            if profiling and step >= profile_until:
                jax.tree_util.tree_map(
                    lambda x: x.block_until_ready(), pending)
                jax.profiler.stop_trace()
                profiling = False
                profile_until = -1  # latch: never re-start this run
                log.info("profiler trace written to %s/profile",
                         self.train_dir)
            if step >= next_log or step >= max_steps:
                next_log = _next_multiple(step, t.log_every)
                # ONE combined fetch: each device_get is a full relay
                # round trip (~35 ms on this box) — per-key fetching of a
                # 7-scalar dict costs 7 round trips.
                m = {key: float(v)
                     for key, v in jax.device_get(pending).items()}
                dt = timer.reset()
                m["steps_per_sec"] = (step - last_log) / max(dt, 1e-9)
                m["questions_per_sec"] = m["steps_per_sec"] * t.batch_size
                last_log = step
                self.metrics.write(step, m, prefix="train")
                log.info("step %6d  loss %.4f  acc %.4f  %.1f q/s", step,
                         m.get("loss", float("nan")),
                         m.get("accuracy", float("nan")),
                         m["questions_per_sec"])
            if eval_batches_fn is not None and step >= next_eval:
                next_eval = _next_multiple(step, t.eval_every)
                eval_metrics, _ = self.evaluate(state, eval_batches_fn())
                self.metrics.write(step, eval_metrics, prefix="val")
                log.info("eval @ %d: %s", step,
                         {k: round(v, 4) for k, v in eval_metrics.items()})
            if self.ckpt.save(step, state) and stateful_input:
                self.ckpt.save_data_iter(step, train_batches.get_state())
        if profiling:
            # profile window exceeded max_steps — close the trace instead
            # of leaking an unterminated profile (same as fit_resident).
            jax.tree_util.tree_map(
                lambda x: x.block_until_ready(), pending)
            jax.profiler.stop_trace()
            log.info("profiler trace (truncated at max_steps) written to "
                     "%s/profile", self.train_dir)
        self.ckpt.wait()
        final = int(jax.device_get(state.step))
        if self.ckpt.latest_step() != final:
            self.ckpt.save(final, state, force=True)
            if stateful_input:
                self.ckpt.save_data_iter(final, train_batches.get_state())
            self.ckpt.wait()
        return state

    def fit_resident(self, ds, state: TrainState,
                     eval_batches_fn: Optional[Callable[[], Iterator]] = None,
                     max_steps: Optional[int] = None,
                     eval_ds=None) -> TrainState:
        """Device-resident training (train.device_data_cache): the whole
        dataset is uploaded once (float features cast to the compute dtype
        host-side, halving the transfer) and each step gathers its batch
        on-device from a [batch]-int32 index vector — the only per-step
        host->device traffic. For datasets that fit in HBM; essential when
        the host link is slow (this box's relay: 0.06 GB/s).

        ``JoinedDataset`` is first-class here, and is the TPU-native form
        of the reference's deduplicated per-image HDF5 layout: the small
        question table AND the deduplicated feature store upload once, and
        each step runs a TWO-level on-device gather (batch rows, then
        ``image_index``/``region_index`` into the store). The store stays
        deduplicated in HBM — versus per-question feature copies this is a
        >3x memory saving on VQA v2 shapes, and it subsumes the host-side
        feature join entirely (no per-step host gather, no upload)."""
        t = self.cfg.train
        max_steps = max_steps if max_steps is not None else t.max_steps
        data, make_batch, nbytes = self._prepare_resident(ds)
        store_rows = next((data[key].shape[0]
                           for key in ("grid0", "grid_pad") if key in data),
                          None)
        # THIS fit's shard info, captured before any in-loop evaluator's
        # _prepare_resident (a different dataset) can overwrite the
        # trainer-level attribute.
        shard_info = self._resident_shard
        log.info("device-resident dataset: %d rows%s, %.2f GB uploaded "
                 "once%s",
                 ds.size,
                 f" + {store_rows}-row feature store" if store_rows else "",
                 nbytes / 1e9,
                 (f" (store row-sharded {shard_info[0]}-way)"
                  if shard_info else ""))
        n_data = self.mesh.shape[self.mesh.axis_names[0]]
        # Bytes of the grid store specifically: store_sharded splits only
        # the grid planes/pad, not the row arrays or pool5 — the hint
        # must state what the flag actually saves.
        store_bytes = sum(v.nbytes for k, v in data.items()
                          if k.startswith("grid")
                          and isinstance(v, np.ndarray))
        # Only recommend the flag where setting it would actually work:
        # store_sharded requires the fused resident path (grid_pad), and
        # its gate raises otherwise.
        if (shard_info is None and "grid_pad" in data
                and store_bytes > 8e9 and n_data > 1):
            # A v5e chip has ~16 GB HBM; a replicated multi-GB store
            # leaves little for activations — and it need not be
            # replicated on a >1-device data axis.
            log.warning(
                "replicating a %.1f GB feature store on each of %d "
                "devices — --train.store_sharded splits it to %.1f "
                "GB/device (row arrays + pool5, %.1f GB, stay replicated)",
                store_bytes / 1e9, n_data, store_bytes / 1e9 / n_data,
                (nbytes - store_bytes) / 1e9)
        data_shardings = self._resident_shardings(data)
        dev_arrays = self._upload_resident(data)
        # Keep the uploaded tree reachable after fit returns: post-run
        # consumers (the bench's HBM-headroom probe, pre-staged serving
        # from store rows) need it ALIVE — without this reference the
        # store frees the moment fit returns and a probe measures an idle
        # chip. Dropped in close().
        self._resident_arrays = dev_arrays
        from jax.sharding import NamedSharding, PartitionSpec as P

        raw_step = self._raw_step_fn

        # The dataset is a jit ARGUMENT, not a closure capture — captured
        # arrays get embedded as HLO constants and shipped to the compiler
        # (the remote compile service rejects the GB-sized request).
        #
        # ZERO per-call host traffic: the seeded index table is staged to
        # the device in [seg_steps, B] segments (one ~2 MB upload per
        # segment), each call slices its k rows out of the resident
        # segment at a device-resident offset scalar that the program
        # itself advances and returns. Profiled without this: every
        # per-call device_put of the [k, B] indices cost a blocking ~35 ms
        # relay round trip — 2.9 ms/step of host gap on top of a 5.5 ms
        # device step at k=8.
        donate = (0,) if t.donate_state else ()
        k = max(1, t.steps_per_call)
        kidx_shard = NamedSharding(
            self.mesh, P(None, self.mesh.axis_names[0]))

        def make_step(kk: int):
            def step_scan(state, seg, off, data):
                idxs = jax.lax.dynamic_slice_in_dim(seg, off, kk)

                def body(st, idx):
                    return raw_step(st, make_batch(idx, data))

                state, ms = jax.lax.scan(body, state, idxs)
                return (state, jax.tree_util.tree_map(lambda x: x[-1], ms),
                        off + kk)

            return jax.jit(step_scan,
                           in_shardings=(self._state_in_spec(), kidx_shard,
                                         self._repl,
                                         data_shardings),
                           out_shardings=(self._state_in_spec(), self._repl,
                                          self._repl),
                           donate_argnums=donate)

        # Per-k compiled dispatch: the non-divisible tail of a run clamps
        # to max_steps (one extra compile) instead of overshooting on
        # padded duplicate index rows.
        step_cache: Dict[int, Callable] = {}

        def step_for(kk: int):
            if kk not in step_cache:
                step_cache[kk] = make_step(kk)
            return step_cache[kk]

        # In-loop eval: a resident evaluator (val split stays in HBM too)
        # when a dataset is given; host-streamed batches otherwise. Built
        # lazily so short runs never pay the val-split upload.
        resident_eval_cache: list = []

        def resident_eval_fn():
            if not resident_eval_cache:
                resident_eval_cache.append(
                    self._make_resident_evaluator(eval_ds))
            return resident_eval_cache[0]

        # Lagged in-loop eval: the eval program is DISPATCHED at its
        # boundary (the device runs it in enqueue order, on exactly that
        # boundary's params — later donating train steps cannot alias the
        # buffers an enqueued program reads) but its fetch + host
        # post-processing (pred scatter, official-score reweighting) are
        # deferred to the next log boundary, by which point further train
        # windows are already queued on the device. The ~35 ms relay fetch
        # then overlaps device work instead of draining the dispatch
        # pipeline — the eval's synchronous metric fetch was most of the
        # ~4 s eval+checkpoint boundary cost in the production soak
        # (BASELINE.md 2026-08-19). Metric VALUES are exact for their
        # boundary; only their arrival is late, like the lagged train
        # windows above.
        pending_eval: list = []  # [(boundary stepno, dispatch handle)]

        def collect_eval() -> None:
            # FIFO: the trigger guards below read pending_eval[0], so the
            # collect must drain the head (with the at-most-one-in-flight
            # invariant they coincide; pop(0) keeps the order structural).
            at, handle = pending_eval.pop(0)
            eval_metrics, _ = resident_eval_fn().collect(handle)
            self.metrics.write(at, eval_metrics, prefix="val")
            log.info("eval @ %d: %s", at,
                     {k: round(v, 4) for k, v in eval_metrics.items()})

        timer = Timer()
        pending: Dict[str, jax.Array] = {}
        stepno = int(jax.device_get(state.step))
        last_log = stepno
        # Lagged metric windows: at log boundary N the loop enqueues that
        # window's on-device metrics and fetches/logs boundary N-1's —
        # whose work has long finished — while window N is already queued
        # on the device. Fetching the CURRENT boundary instead (the
        # round-2 behavior) drains the whole dispatch pipeline and parks
        # the device for a relay round trip (35-234 ms measured) out of
        # every ~354 ms window: most of the gap between the 92.4k q/s
        # profiled ceiling and the ~68k measured wall number. Each fetch
        # still synchronizes to the END of the window it logs, so the
        # wall time between consecutive fetches is honest steady-state
        # device progress; metric VALUES simply arrive one window late.
        lagged: list = []  # [(boundary stepno, on-device metric tree)]

        def log_window(final: bool) -> None:
            nonlocal last_log
            lagged.append((stepno, pending))
            drain = []
            while len(lagged) > (0 if final else 1):
                drain.append(lagged.pop(0))
            if not drain:
                return
            # ONE wall measurement per drain. Wall time between fetches is
            # honest device progress only while the device is the
            # bottleneck; the final drain pops the lagged window AND the
            # last window back to back, so a second timer read there would
            # measure relay round-trip skew, not compute (observed as a
            # 2.5M "q/s" tail window on an idle chip, 2026-08-18). The
            # drain therefore logs each window's metric VALUES but one
            # combined rate, on the last record, spanning every step the
            # drain covers.
            trees = jax.device_get([pend for _, pend in drain])
            dt = timer.reset()
            span = drain[-1][0] - last_log
            for (at, _), tree in zip(drain, trees):
                m = {key: float(v) for key, v in tree.items()}
                if at == drain[-1][0]:
                    m["steps_per_sec"] = span / max(dt, 1e-9)
                    m["questions_per_sec"] = (m["steps_per_sec"]
                                              * t.batch_size)
                    log.info("step %6d  loss %.4f  acc %.4f  %.1f q/s",
                             at, m.get("loss", float("nan")),
                             m.get("accuracy", float("nan")),
                             m["questions_per_sec"])
                else:
                    log.info("step %6d  loss %.4f  acc %.4f", at,
                             m.get("loss", float("nan")),
                             m.get("accuracy", float("nan")))
                self.metrics.write(at, m, prefix="train")
            last_log = drain[-1][0]

        next_log = _next_multiple(stepno, t.log_every)
        next_eval = _next_multiple(stepno, t.eval_every)
        if shard_info is not None:
            # Row-sharded store: each device samples the questions whose
            # image it owns (round-robin owner = row % n; per-shard
            # seeded epochs; slot layout matches the P(None, 'data')
            # index-segment sharding below).
            n_sh, _ = shard_info
            owner = np.asarray(ds.arrays[ds.index_key]) % n_sh
            indices = sharded_index_batches(
                owner, n_sh, t.batch_size // n_sh, t.seed)
        else:
            indices = ds.index_batches(t.batch_size, seed=t.seed)
        # Within-batch image-locality sort (train.sort_batch_by_image,
        # default off): pure within-batch permutation — every per-batch
        # reduction is order-invariant, so training is equivalent up to
        # float summation order (tested). Measured no resident-kernel
        # speedup on v5e (see the config field's note); selectable for
        # gather-path locality experiments.
        sort_rows = None
        if t.sort_batch_by_image:
            from vqa_transfer_externaldata_tpu.data.features import (
                JoinedDataset)

            if isinstance(ds, JoinedDataset):
                sort_rows = np.asarray(ds.arrays[ds.index_key])
        log.info("training (device-resident) from step %d to %d over %s",
                 stepno, max_steps, self.mesh)
        # Multi-host: index batches are generated identically on every
        # process (same seed); each process contributes its contiguous
        # local rows of the globally data-sharded index vector.
        pi, pc = jax.process_index(), jax.process_count()
        profile_until = (t.profile_start + t.profile_steps
                         if t.profile_steps else -1)
        profiling = False
        # Index-table segment length (steps): ~2 MB per upload by default;
        # a class attribute so tests can shrink it to exercise the
        # multi-segment path.
        seg_steps = max(k, (self.resident_segment_steps // k) * k)
        seg_dev = None
        seg_off = seg_steps  # force initial staging
        off_dev = None
        while stepno < max_steps:
            if seg_off >= seg_steps:
                # Stage the next index-table segment (ONE host->device
                # transfer per seg_steps steps).
                todo = max_steps - stepno
                n_rows = min(seg_steps, ((todo + k - 1) // k) * k)
                rows = [next(indices) for _ in range(min(n_rows, todo))]
                if sort_rows is not None:
                    if shard_info is not None:
                        # Sharded store: sort WITHIN each device slot —
                        # a whole-batch sort would interleave shard
                        # owners (round-robin owner = row % n) and route
                        # questions to devices that do not hold their
                        # image rows.
                        ns = shard_info[0]

                        def _slot_sort(r, ns=ns):
                            parts = r.reshape(ns, -1)
                            return np.concatenate(
                                [p[np.argsort(sort_rows[p], kind="stable")]
                                 for p in parts])

                        rows = [_slot_sort(r) for r in rows]
                    else:
                        rows = [r[np.argsort(sort_rows[r], kind="stable")]
                                for r in rows]
                while len(rows) < n_rows:  # static shapes for the tail
                    rows.append(rows[-1])
                seg = np.stack(rows)  # [S, B]
                if pc > 1:
                    local = seg.shape[1] // pc
                    seg = seg[:, pi * local:(pi + 1) * local]
                if seg.shape[0] < seg_steps:  # tail segment, same shape
                    pad = np.broadcast_to(
                        seg[-1:], (seg_steps - seg.shape[0],) + seg.shape[1:])
                    seg = np.concatenate([seg, pad], axis=0)
                seg_dev = put_sharded(seg.astype(np.int32), kidx_shard)
                off_dev = put_sharded(np.zeros((), np.int32), self._repl)
                seg_off = 0
            if (t.profile_steps and not profiling and profile_until >= 0
                    and stepno >= t.profile_start):
                # Same boundary semantics as fit: start at the first
                # dispatch boundary >= profile_start; windows narrower
                # than one dispatch trace that one dispatch.
                jax.profiler.start_trace(
                    os.path.join(self.train_dir, "profile"))
                profiling = True
                profile_until = max(profile_until, stepno + 1)
                log.info("profiler trace started (steps %d..%d)",
                         stepno, profile_until)
            k_eff = min(k, max_steps - stepno)
            state, pending, off_dev = step_for(k_eff)(state, seg_dev,
                                                      off_dev, dev_arrays)
            seg_off += k_eff
            stepno += k_eff
            if profiling and stepno >= profile_until:
                # device_get (not block_until_ready: broken under the
                # axon relay) forces completion before the trace closes.
                jax.device_get(pending)
                jax.profiler.stop_trace()
                profiling = False
                profile_until = -1  # latch: never re-start this run
                log.info("profiler trace written to %s/profile",
                         self.train_dir)
            if stepno >= next_log or stepno >= max_steps:
                next_log = _next_multiple(stepno, t.log_every)
                # ONE combined fetch per window (each get = one ~35 ms
                # relay trip), lagged one boundary — see log_window.
                log_window(final=stepno >= max_steps)
            if (eval_ds is not None or eval_batches_fn is not None) \
                    and stepno >= next_eval:
                next_eval = _next_multiple(stepno, t.eval_every)
                if eval_ds is not None:
                    if pending_eval:  # at most one in flight, in order
                        collect_eval()
                    pending_eval.append(
                        (stepno, resident_eval_fn().dispatch(state)))
                else:
                    eval_metrics, _ = self.evaluate(state, eval_batches_fn())
                    self.metrics.write(stepno, eval_metrics, prefix="val")
                    log.info("eval @ %d: %s", stepno,
                             {k: round(v, 4)
                              for k, v in eval_metrics.items()})
            if pending_eval and (stepno >= pending_eval[0][0] + t.log_every
                                 or stepno >= max_steps):
                collect_eval()
            self.ckpt.save(stepno, state)
        if profiling:
            # profile_start + profile_steps exceeded max_steps: the stop
            # boundary was never reached inside the loop — close the trace
            # at training end instead of leaking an unterminated profile.
            jax.device_get(pending)
            jax.profiler.stop_trace()
            log.info("profiler trace (truncated at max_steps) written to "
                     "%s/profile", self.train_dir)
        while pending_eval:  # safety: the loop's final drain covers this
            collect_eval()
        self.ckpt.wait()
        final = int(jax.device_get(state.step))
        if self.ckpt.latest_step() != final:
            self.ckpt.save(final, state, force=True)
            self.ckpt.wait()
        return state

    def _prepare_resident(self, ds, drop_keys: Tuple[str, ...] = ()
                          ) -> Tuple[Dict[str, Any], Callable, int]:
        """Host-side prep for device-resident data: cast feature arrays to
        the compute dtype, and for a JoinedDataset stage the deduplicated
        store as separate ``grid``/``pool5`` planes. Returns
        ``(data, make_batch, nbytes)`` where ``make_batch(idx, data)``
        materializes a batch on device (one- or two-level gather).
        ``drop_keys``: row arrays to keep host-side (the resident evaluator
        drops ``answer_scores`` — [n, A] f32, the largest row array — and
        recomputes its one consumer host-side from the fetched preds)."""
        from vqa_transfer_externaldata_tpu.data.features import JoinedDataset

        arrays = {k: np.asarray(v) for k, v in ds.arrays.items()
                  if k not in drop_keys}
        arrays = self._cast_features_host(arrays)
        data: Dict[str, Any] = {"rows": arrays}
        joined = isinstance(ds, JoinedDataset)
        # (n_shards, rows_per_shard) of a row-sharded store, else None —
        # read by fit_resident / _make_resident_evaluator for the upload
        # sharding, the per-shard sampler, and the eval epoch layout.
        self._resident_shard = None
        index_key, feature_keys = "", ()
        if joined:
            index_key, feature_keys = ds.index_key, ds.feature_keys
            grid = np.asarray(ds.store.grid)
            if grid.ndim == 4:  # [M, g, g, C] -> [M, N, C] (same bytes)
                M, gh, gw, C = grid.shape
                grid = grid.reshape(M, gh * gw, C)
            # f16-on-disk grids upload at half width and compute as the
            # model dtype; pool5 casts like the streaming path. The
            # f16->bf16 cast itself is DEFERRED into the branches below:
            # the prenormalized fused path rewrites every value anyway
            # (prenormalize_store casts while it writes — an up-front
            # full-store astype was one of four full copies that cost
            # ~95 s/GB of host prep at realistic store sizes).
            store = self._cast_features_host(
                {"features": grid,
                 "pool5": np.asarray(ds.store.pool5, np.float32)})
            target16 = None
            if store["features"].dtype == np.float16:
                import ml_dtypes

                from vqa_transfer_externaldata_tpu.ops.layers import dtype_of

                if dtype_of(self.cfg.model.dtype) == jnp.bfloat16:
                    target16 = ml_dtypes.bfloat16
            # The grid uploads PRE-SPLIT into <=1024-channel planes: XLA's
            # TPU gather lowering wants [M, N, <=1024] operands, and fed
            # the full [M, N, 2048] store it re-splits the WHOLE store
            # into halves inside the scan body — 822 MB of loop-invariant
            # HBM traffic per step, 1.25 ms of a 5.5 ms step (profiled:
            # trace fusion.508). Splitting host-side removes the in-loop
            # split; the per-plane gathers feed consumers directly (the
            # re-concat fuses away).
            grid_c = store["features"]
            C2 = grid_c.shape[-1]
            on_tpu = jax.default_backend() == "tpu"
            # On a >1-device data axis the op runs under shard_map, so the
            # PER-DEVICE batch must hit the kernel's 8-question window.
            n_data = self.mesh.shape[self.mesh.axis_names[0]]
            model_ok = bool(getattr(self.spec.module, "n_cells", None))
            # The G-glimpse kernels static-slice per-glimpse score rows out
            # of one 8-sublane ws block (ops/attention_resident
            # ._resident_fwd_multi) — validate HERE so glimpses > 8 falls
            # back to the gathered path instead of dying at first fused
            # step inside the kernel wrapper.
            glimpses_ok = getattr(self.spec.module, "glimpses", 1) <= 8
            fused_att = (self.cfg.train.resident_fused_attention
                         and model_ok and glimpses_ok
                         and self.cfg.train.batch_size % (8 * n_data) == 0
                         and (not on_tpu or C2 % 128 == 0))
            if self.cfg.train.resident_fused_attention and not fused_att:
                # Default-on since round 3: a model the op does not cover
                # (no spatial grid) falls back silently-ish; a SHAPE gate
                # failing on a covered model is worth a warning — the user
                # is leaving the fast path on the table.
                (log.warning if model_ok else log.info)(
                    "resident_fused_attention unavailable "
                    "(needs a spatial-attention model with glimpses <= 8, "
                    "batch %% (8 * data-axis devices) == 0, "
                    "feature_dim %% 128 == 0 "
                    "on TPU) — using the gathered resident path")
            if self.cfg.train.store_sharded and not fused_att:
                # The whole point of the flag is NOT holding the full
                # store per device; silently replicating it would OOM the
                # exact workload the user set the flag for.
                raise ValueError(
                    "train.store_sharded requires the fused resident "
                    "attention path (a spatial-attention model, "
                    "resident_fused_attention on, batch % (8 * data-axis "
                    "devices) == 0, feature_dim % 128 == 0 on TPU)")
            n_planes = 0
            if fused_att:
                # Gather-free mode: ONE padded store; the attention
                # kernels scalar-prefetch rows straight out of it
                # (ops/attention_resident) — no [B, N, C] batch, no
                # gather, no layout copy.
                from vqa_transfer_externaldata_tpu.ops.attention_resident \
                    import pad_store_rows, prenormalize_store

                quantize = self.cfg.train.store_quantize
                if quantize not in ("", "int8"):
                    # Fail loudly: silently measuring a float store under
                    # a quantized-run label would corrupt any A/B.
                    raise ValueError(
                        f"train.store_quantize={quantize!r}: only 'int8' "
                        "is supported (or '' for the exact-math store)")
                if getattr(self.spec.module, "store_prenormalized", False):
                    # Normalize each cell ONCE here (f32, the kernel's
                    # rsqrt(ssq + 1e-12) convention) so the fwd+bwd
                    # kernels skip the per-access sum-of-squares/rsqrt;
                    # the model passes normalize=False for this store.
                    # prenormalize_store fuses normalize + compute-dtype
                    # cast + cell-axis pad (+ int8 quantize with its one
                    # global scale) into one chunked read->write pass —
                    # the source (often an mmapped f16 store) is read
                    # once and never aliased or mutated.
                    grid_pad, scale = prenormalize_store(
                        grid_c, out_dtype=target16, quantize=quantize)
                    if quantize == "int8":
                        # The scale reaches the op as a static model
                        # attribute (the step/eval closures are rebuilt
                        # if it changed).
                        self._set_module_attrs(store_scale=scale)
                else:
                    if quantize:
                        log.warning(
                            "train.store_quantize=%r needs the "
                            "prenormalized fused resident path "
                            "(normalize_v model + "
                            "resident_fused_attention); keeping float "
                            "store", quantize)
                    if target16 is not None:
                        grid_c = grid_c.astype(target16)
                    grid_pad = pad_store_rows(grid_c)
                if self.cfg.train.store_sharded:
                    # Row-sharded store (HBM-capacity mode): rows are
                    # assigned ROUND-ROBIN (owner = row % n, shard-local
                    # = row // n) — balanced within one row for ANY store
                    # size, and no empty tail shard (a contiguous split
                    # of a padded row axis strands the padding — and any
                    # trailing question-less images — on the last
                    # shards). ``grid_pad`` stays in dataset row order
                    # host-side; _upload_resident assembles each device's
                    # contiguous block from the zero-copy strided view
                    # grid_pad[d::n] at upload (a host-side permuted copy
                    # would double peak host RAM at exactly the store
                    # sizes this flag exists for). The op's shard_map
                    # takes P(data) for the store, make_batch remaps
                    # global rows to shard-local ones, and the samplers
                    # route each question to its image's owner device
                    # (sharded_index_batches / the evaluator's per-shard
                    # epochs).
                    self._resident_shard = (
                        n_data, -(-grid_pad.shape[0] // n_data))
                data["grid_pad"] = grid_pad
                if getattr(self.spec.module, "store_sharded", None) \
                        is not None:
                    self._set_module_attrs(
                        store_sharded=self._resident_shard is not None)
            else:
                if target16 is not None:  # gathered path: cast up front
                    grid_c = grid_c.astype(target16)
                n_planes = max(1, (C2 + 1023) // 1024)
                width = (C2 + n_planes - 1) // n_planes
                for p in range(n_planes):
                    data[f"grid{p}"] = np.ascontiguousarray(
                        grid_c[..., p * width:(p + 1) * width])
            data["pool5"] = store["pool5"]
        else:
            n_planes = 0
            fused_att = False
            if self.cfg.train.store_sharded:
                # No store, nothing to shard, nothing that can OOM — a
                # warning, not a raise: an in-loop eval over a storeless
                # split must not abort a sharded TRAINING run mid-flight
                # (the real forgot-the-flag footgun is caught at Trainer
                # init: store_sharded without device_data_cache raises).
                log.warning(
                    "train.store_sharded has no effect on %s: no feature "
                    "store to shard (JoinedDataset required)",
                    type(ds).__name__)

        # Captured as a LOCAL: make_batch can be re-traced lazily (e.g.
        # the tail-k train dispatch) after a later _prepare_resident call
        # (an eval split) has overwritten self._resident_shard.
        shard_n = n_data if self._resident_shard is not None else 0

        def make_batch(idx, data):
            batch = {k: jnp.take(v, idx, axis=0)
                     for k, v in data["rows"].items()}
            if joined:  # second-level gather: store rows by image/region
                rows = batch[index_key]
                for key in feature_keys:
                    if key in ("feature", "pool5"):
                        batch[key] = jnp.take(data["pool5"], rows, axis=0)
                    elif fused_att:
                        # No gather: hand the model (store, rows). For a
                        # row-sharded store the rows become shard-LOCAL
                        # (round-robin: local = row // n): the samplers
                        # place each question on its image's owner device
                        # (owner = row % n).
                        batch["features"] = (
                            data["grid_pad"],
                            rows // shard_n if shard_n else rows)
                    else:
                        # (An [N, M, Cp]-transposed staging was tried to
                        # hand the gather the n-outer layout consumers
                        # want: XLA canonicalizes it into the same
                        # program — same gather + same layout copy.)
                        parts = [jnp.take(data[f"grid{p}"], rows, axis=0)
                                 for p in range(n_planes)]
                        batch["features"] = (
                            parts[0] if n_planes == 1
                            else jnp.concatenate(parts, axis=-1))
            return batch

        nbytes = sum(v.nbytes for part in data.values()
                     for v in (part.values() if isinstance(part, dict)
                               else [part]))
        return data, make_batch, nbytes

    def _make_resident_evaluator(self, ds) -> Callable[
            [TrainState], Tuple[Dict[str, float], np.ndarray]]:
        """Device-resident evaluator over ``ds``: data uploads once and the
        ENTIRE padded index epoch runs as one ``lax.scan`` device program —
        one dispatch and one host fetch for the whole split. On a
        high-latency host link (this box's relay: ~35 ms per round trip) a
        per-batch eval loop pays 3-4 round trips per batch; this pays 2
        total."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        # answer_scores ([n, A] f32 — the largest row array) stays HOST-side:
        # its only consumer is the scores[i, pred_i] indicator, recomputed
        # below from the fetched preds in f64. Cuts the one-time upload by
        # n*A*4 bytes and drops a [B, A] gather from every scan step.
        # cand_counts ([n, V] u16, dense_candidate_loss) is TRAIN-only —
        # eval always scores the gathered [B, K] candidates.
        data, make_batch, nbytes = self._prepare_resident(
            ds, drop_keys=("answer_scores", "cand_counts"))
        shard = self._resident_shard
        log.info("device-resident eval split: %d rows, %.2f GB uploaded "
                 "once%s", ds.size, nbytes / 1e9,
                 f" (store row-sharded {shard[0]}-way)" if shard else "")
        dev_arrays = self._upload_resident(data)
        bshard = NamedSharding(self.mesh, P(None, self.mesh.axis_names[0]))
        spec = self.spec
        B = self.cfg.train.batch_size
        n = len(ds)

        if shard is None:
            # Padded index epoch, staged host-side once: [n_batches, B].
            starts = list(range(0, n, B))
            idxs = np.zeros((len(starts), B), np.int32)
            masks = np.zeros((len(starts), B), np.float32)
            for r, start in enumerate(starts):
                stop = min(start + B, n)
                idxs[r, :stop - start] = np.arange(start, stop)
                masks[r, :stop - start] = 1.0
            positions = None
        else:
            # Row-sharded store: device d can only evaluate questions
            # whose image lives in its store shard, so the epoch is laid
            # out per shard — [n_batches, n_sh, B/n_sh], each shard
            # consuming ITS question list in order, padded (mask 0) to
            # the longest shard's batch count. ``positions`` maps every
            # (batch, slot) back to the original row for the pred
            # scatter; padded slots reuse question row 0 — safe because
            # the LOCAL remap is ``row // n_sh`` and any global row
            # satisfies row // n_sh <= rps - 1, so the slot reads an
            # in-bounds (possibly wrong-image, fully masked) store row.
            n_sh, _ = shard
            per_dev = B // n_sh
            owner = np.asarray(ds.arrays[ds.index_key]) % n_sh
            lists = [np.flatnonzero(owner == d) for d in range(n_sh)]
            n_batches = max(1, max(-(-l.size // per_dev) for l in lists))
            idxs = np.zeros((n_batches, n_sh, per_dev), np.int32)
            masks = np.zeros((n_batches, n_sh, per_dev), np.float32)
            positions = np.full((n_batches, n_sh, per_dev), -1, np.int64)
            for d, rows_d in enumerate(lists):
                for r in range(n_batches):
                    seg = rows_d[r * per_dev:(r + 1) * per_dev]
                    idxs[r, d, :seg.size] = seg
                    masks[r, d, :seg.size] = 1.0
                    positions[r, d, :seg.size] = seg
            idxs = idxs.reshape(n_batches, B)
            masks = masks.reshape(n_batches, B)
            positions = positions.reshape(-1)
            starts = list(range(n_batches))  # weight denominator rows

        def eval_all(params, extra_vars, idxs, masks, data):
            def body(_, xs):
                idx, mask = xs
                batch = make_batch(idx, data)
                batch["example_mask"] = mask
                outputs = spec.module.apply(
                    {"params": params, **extra_vars},
                    *spec.inputs(batch), train=False)
                preds = jnp.argmax(outputs["logits"].astype(jnp.float32),
                                   -1)
                metrics = _eval_metrics(spec, outputs, batch)
                return 0, (preds, metrics)

            _, (preds, metrics) = jax.lax.scan(body, 0, (idxs, masks))
            return preds, metrics  # [n_batches, B], {k: [n_batches]}

        eval_step = jax.jit(
            eval_all,
            in_shardings=(self._state_in_spec(), self._repl, bshard, bshard,
                          self._resident_shardings(data)),
            out_shardings=(bshard, self._repl))
        # put_sharded's multi-process contract: each process passes only
        # ITS devices' rows of a sharded array (parallel/mesh.py). The
        # epoch is computed identically on every process, so each slices
        # its contiguous column block — fit_resident's seg convention.
        # Passing the full epoch handed make_array_from_process_local_data
        # a doubled global array with wrong per-device slices (found by
        # the real 2-process test, tests/test_multiprocess.py).
        pi, pc = jax.process_index(), jax.process_count()
        if pc > 1:
            local = idxs.shape[1] // pc
            idxs = idxs[:, pi * local:(pi + 1) * local]
            masks = masks[:, pi * local:(pi + 1) * local]
        dev_idxs = put_sharded(idxs, bshard)
        dev_masks = put_sharded(masks, bshard)

        scores_host = (np.asarray(ds.arrays["answer_scores"], np.float64)
                       if "answer_scores" in ds.arrays else None)
        labels_host = (np.asarray(ds.arrays["answer_id"])
                       if "answer_id" in ds.arrays else None)

        def dispatch(state: TrainState) -> Tuple[jax.Array, Any]:
            """Enqueue the whole-split eval program; returns device
            futures. Device execution is FIFO per device, so the enqueued
            scan reads this state's param buffers before any later
            (donating) train step can alias them — the caller may keep
            training immediately."""
            return eval_step(state.params, state.extra_vars,
                             dev_idxs, dev_masks, dev_arrays)

        def collect(handle: Tuple[jax.Array, Any]
                    ) -> Tuple[Dict[str, float], np.ndarray]:
            """Fetch a :func:`dispatch` handle and finish host-side: the
            one relay round trip plus the pred scatter / official-score
            reweighting. Deferring this past the next train dispatches
            hides the fetch behind already-queued device work (the in-loop
            lagged-eval path in :meth:`fit_resident`)."""
            p, m = handle
            if jax.process_count() > 1:
                # Multi-host: the preds are data-sharded across hosts, so
                # a plain device_get would touch non-addressable shards.
                # process_allgather replicates them to every host (the
                # metrics are already replicated). tiled=True is REQUIRED
                # for a global (non-fully-addressable) array input — it
                # returns the array's full global value, not a per-process
                # stack (found by the real 2-process test; the default
                # raises ValueError).
                from jax.experimental import multihost_utils

                p = multihost_utils.process_allgather(p, tiled=True)
                m = jax.device_get(m)
            else:
                p, m = jax.device_get((p, m))  # ONE fetch for the split
            m = {k: np.asarray(v, np.float64) for k, v in m.items()}
            w = m.pop("weight", np.ones(len(starts)))
            total_w = max(float(w.sum()), 1e-9)
            means = {k: float((v * w).sum() / total_w) for k, v in m.items()}
            if positions is None:
                preds = np.asarray(p).reshape(-1)[:n]
            else:
                # Sharded epoch: scatter per-shard slot predictions back
                # to the split's original row order; padded slots
                # (position -1) drop.
                flat = np.asarray(p).reshape(-1)
                sel = positions >= 0
                preds = np.zeros((n,), flat.dtype)
                preds[positions[sel]] = flat[sel]
            if scores_host is not None and labels_host is not None:
                # Same weighting as vqa_loss's in-loop indicator (valid =
                # answer in vocab; padding already excluded by [:n]).
                from vqa_transfer_externaldata_tpu.utils.vocab import UNK_ID

                wv = (labels_host[:n] != UNK_ID).astype(np.float64)
                means["vqa_accuracy"] = float(
                    (scores_host[np.arange(n), preds] * wv).sum()
                    / max(wv.sum(), 1e-9))
            return means, preds

        def run(state: TrainState) -> Tuple[Dict[str, float], np.ndarray]:
            return collect(dispatch(state))

        run.dispatch = dispatch
        run.collect = collect
        return run

    def evaluate_resident(self, state: TrainState, ds
                          ) -> Tuple[Dict[str, float], np.ndarray]:
        """One-shot :meth:`_make_resident_evaluator` (upload + run)."""
        return self._make_resident_evaluator(ds)(state)

    def _resident_shardings(self, data: Dict[str, Any]) -> Dict[str, Any]:
        """Per-leaf shardings for a resident data tree: everything
        replicated except ``grid_pad``, whose row axis is partitioned over
        the data axis when ``_prepare_resident`` staged a sharded store
        (train.store_sharded). Feeds both the one-time upload and the jit
        in_shardings of the resident train/eval programs."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        shards = jax.tree_util.tree_map(lambda _: self._repl, data)
        if self._resident_shard is not None and "grid_pad" in data:
            shards["grid_pad"] = NamedSharding(
                self.mesh, P(self.mesh.axis_names[0]))
        return shards

    def _upload_resident(self, data: Dict[str, Any]) -> Dict[str, Any]:
        """One-time upload of a resident data tree. A row-sharded store
        (train.store_sharded) is assembled per device from the zero-copy
        strided view ``grid_pad[d::n]`` (host rows stay in dataset order;
        device d's contiguous block holds rows d, d+n, d+2n, ...) — peak
        extra host RAM is ONE shard's pad, not a permuted copy of the
        whole store. Everything else ships through ``put_sharded``."""
        shardings = self._resident_shardings(data)
        shard = self._resident_shard
        if shard is None or "grid_pad" not in data:
            return put_sharded(data, shardings)
        n_sh, rps = shard
        host = {k: v for k, v in data.items() if k != "grid_pad"}
        out = put_sharded(host, {k: shardings[k] for k in host})
        grid = data["grid_pad"]
        sh = shardings["grid_pad"]
        global_shape = (rps * n_sh,) + grid.shape[1:]
        arrs = []
        blocks: Dict[int, np.ndarray] = {}  # one host copy per DATA shard
        pi = jax.process_index()
        for dev, idx in sh.devices_indices_map(global_shape).items():
            if dev.process_index != pi:
                # Multi-host: each process stages only its own devices'
                # blocks; make_array_from_single_device_arrays assembles
                # the global array from every process's contribution.
                # (_prepare_resident's host-side prep still reads the
                # whole store per process — mmap-friendly, but the
                # prenormalize/quantize passes materialize it.)
                continue
            d = (idx[0].start or 0) // rps
            if d not in blocks:
                block = grid[d::n_sh]
                pad = rps - block.shape[0]
                if pad:  # tail shards of a non-divisible store: zeros
                    block = np.concatenate(
                        [block,
                         np.zeros((pad,) + grid.shape[1:], grid.dtype)])
                else:
                    block = np.ascontiguousarray(block)
                blocks[d] = block
            # A dp x tp mesh replicates each row shard across the model
            # axis: reuse the staged host block for every replica device
            # instead of re-materializing a multi-GB copy per device.
            arrs.append(jax.device_put(blocks[d], dev))
        out["grid_pad"] = jax.make_array_from_single_device_arrays(
            global_shape, sh, arrs)
        return out

    def _cast_features_host(self, arrays: Dict[str, np.ndarray]
                            ) -> Dict[str, np.ndarray]:
        """Cast float32 feature arrays to the model compute dtype on host
        (bf16 halves host->device bytes; params/labels untouched)."""
        from vqa_transfer_externaldata_tpu.ops.layers import dtype_of

        dt = dtype_of(self.cfg.model.dtype)
        if dt == jnp.float32:
            return arrays
        import ml_dtypes

        np_dt = ml_dtypes.bfloat16 if dt == jnp.bfloat16 else np.float16
        out = dict(arrays)
        for key in ("features", "feature", "pool5"):
            if key in out and out[key].dtype == np.float32:
                out[key] = out[key].astype(np_dt)
        return out

    def evaluate(self, state: TrainState,
                 batches: Iterator[Dict[str, np.ndarray]]
                 ) -> Tuple[Dict[str, float], np.ndarray]:
        """Full-split eval: valid-row-weighted mean metrics + concatenated
        predicted ids. Per-batch means are weighted by the batch's valid-row
        count (the loss's ``weight`` metric) so the padded/partially-masked
        final batch cannot dilute the split-level numbers."""
        sums: Dict[str, float] = {}
        total_w = 0.0
        count = 0
        preds = []
        for batch in batches:
            # Same bf16 the model would cast to on device — halves the
            # host->device bytes at identical numerics.
            batch = self._cast_features_host(batch)
            batch = put_sharded(batch, self._bshard)
            p, m = self._eval_step(state.params, state.extra_vars, batch)
            if jax.process_count() > 1:
                # Preds are data-sharded across hosts (same fetch hazard
                # as the resident evaluator — see its run()).
                from jax.experimental import multihost_utils

                p = multihost_utils.process_allgather(p, tiled=True)
                m = jax.device_get(m)
            else:
                p, m = jax.device_get((p, m))  # ONE round trip
            preds.append(np.asarray(p))
            m = {k: float(v) for k, v in m.items()}
            w = m.pop("weight", 1.0)
            total_w += w
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + v * w
            count += 1
        means = {k: v / max(total_w, 1e-9) for k, v in sums.items()}
        return means, (np.concatenate(preds) if preds
                       else np.zeros((0,), np.int32))

    def close(self) -> None:
        self._resident_arrays = None  # release the device-resident tree
        self.ckpt.close()
        self.metrics.close()
