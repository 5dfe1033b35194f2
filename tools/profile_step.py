"""Profile ANY registry model's resident train step on the current backend.

One command replaces the ad-hoc "build a trainer, run with
``--train.profile_steps``, find the trace, run trace_summary" loop used
throughout rounds 4-5 (BASELINE.md "step tail", the dense-CE and
interleave A/Bs):

    python tools/profile_step.py --model.model vlmap --model.dense_candidate_loss true
    python tools/profile_step.py --model.model vqa_attention \
        --data.synthetic_layout joined   # flagship PRODUCTION path: the
        # gather-free resident attention needs the joined (store-backed)
        # corpus layout; flat would profile the gathered fallback
    python tools/profile_step.py --model.model vlmap_description \
        --model.bidirectional_desc true --steps 128 --top 12

Accepts every ``--section.field`` config override (Config.from_args).
Trains ``3 * steps`` resident steps on synthetic data (sized to the
production bench shapes on TPU), traces the middle third (past the
compile+upload ramp), and prints trace_summary's device step + per-op
self-times — ONE JSON line on stdout, the human table on stderr.

Tool-only flags (consumed before the config overlay): ``--steps N``
(profiled window, default 128), ``--top N`` (ops listed, default 12),
``--size N`` (synthetic rows, default 4096 on TPU / 256 on CPU).

``JAX_PLATFORMS=cpu`` runs the whole flow as a smoke test, but the
kernel table comes back empty — trace_summary reads the TPU device
tracks, which only exist on the real chip.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Same platform guard as the CLI entrypoints (cli/__init__.py): the axon
# sitecustomize overrides JAX_PLATFORMS programmatically; restore env-var
# semantics so JAX_PLATFORMS=cpu profiles the CPU backend as asked.
_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    import jax as _jax

    _jax.config.update("jax_platforms", _plat)


def _pop_flag(argv, name, default):
    if name in argv:
        i = argv.index(name)
        val = int(argv[i + 1])
        del argv[i:i + 2]
        return val
    return default


def main() -> None:
    argv = sys.argv[1:]
    steps = _pop_flag(argv, "--steps", 128)
    top = _pop_flag(argv, "--top", 12)
    size = _pop_flag(argv, "--size", 0)

    import jax

    from vqa_transfer_externaldata_tpu.config import Config
    from vqa_transfer_externaldata_tpu.data.datasets import load_dataset
    from vqa_transfer_externaldata_tpu.models.zoo import build_model
    from vqa_transfer_externaldata_tpu.parallel.trainer import Trainer

    on_tpu = jax.default_backend() != "cpu"
    cfg = Config.from_args(argv).replace_flat({
        "data.synthetic": True,
        "train.batch_size": 256 if on_tpu else 32,
        "train.log_every": steps,
        "train.max_steps": 3 * steps,
        "train.checkpoint_every": 10 ** 9, "train.eval_every": 10 ** 9,
        "train.device_data_cache": True,
        "train.steps_per_call": min(32, steps) if on_tpu else 2,
        "train.profile_steps": steps, "train.profile_start": 2 * steps,
    })
    # tool defaults layered UNDER the user's explicit flags
    user = Config.from_args(argv)
    base = Config()
    for sec in ("train",):
        for f in ("batch_size", "log_every", "max_steps", "steps_per_call"):
            uval = getattr(getattr(user, sec), f)
            if uval != getattr(getattr(base, sec), f):
                cfg = cfg.replace_flat({f"{sec}.{f}": uval})
    spec = build_model(cfg)
    ds = load_dataset(cfg, "train", stage=spec.stage,
                      size=size or (4096 if on_tpu else 256))
    train_dir = tempfile.mkdtemp(prefix="profile_step_")
    trainer = Trainer(cfg, spec, train_dir=train_dir)
    state = trainer.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
    trainer.fit_resident(ds, state)
    trainer.close()

    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "trace_summary.py"),
         os.path.join(train_dir, "profile"),
         "--steps", str(steps), "--top", str(top)],
        capture_output=True, text=True)
    sys.stderr.write(r.stderr)
    line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "{}"
    out = json.loads(line)
    out["model"] = cfg.model.model
    out["backend"] = jax.default_backend()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
