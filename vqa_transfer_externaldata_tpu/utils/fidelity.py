"""Checkpoint-fidelity tooling (BASELINE.json north-star: "bit-comparable
VQA v2 accuracy to the reference checkpoints", SURVEY.md section 7 hard
part (a)).

Compare two param trees or two models' logits layer-by-layer, reporting the
worst absolute/relative deviation per leaf — the tool used to validate
ported reference weights (e.g. ops/resnet.convert_torch_state_dict, or a
TF1-GRU port through ops/gru.TFGRUEncoder) against this framework's
execution of the same math.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import numpy as np


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in path)


def diff_trees(a: Any, b: Any) -> Dict[str, Dict[str, float]]:
    """Per-leaf {max_abs, max_rel, shape_mismatch} between two pytrees."""
    fa = dict(jax.tree_util.tree_leaves_with_path(a))
    fb = dict(jax.tree_util.tree_leaves_with_path(b))
    report: Dict[str, Dict[str, float]] = {}
    for path in sorted(set(fa) | set(fb), key=str):
        name = _path_str(path)
        if path not in fa or path not in fb:
            report[name] = {"missing": 1.0}
            continue
        va, vb = np.asarray(fa[path], np.float64), np.asarray(
            fb[path], np.float64)
        if va.shape != vb.shape:
            report[name] = {"shape_mismatch": 1.0}
            continue
        diff = np.abs(va - vb)
        scale = np.maximum(np.abs(vb), 1e-12)
        report[name] = {"max_abs": float(diff.max(initial=0.0)),
                        "max_rel": float((diff / scale).max(initial=0.0))}
    return report


def worst_deviation(report: Dict[str, Dict[str, float]]) -> Tuple[str, float]:
    worst_name, worst = "", 0.0
    for name, stats in report.items():
        val = stats.get("max_abs", float("inf")
                        if ("missing" in stats or "shape_mismatch" in stats)
                        else 0.0)
        if val > worst:
            worst_name, worst = name, val
    return worst_name, worst


def logits_agree(apply_a: Callable, apply_b: Callable, batch: Any,
                 *, atol: float = 1e-4,
                 rtol: float = 1e-3) -> Tuple[bool, float]:
    """Run two forward fns on the same batch; (agree?, max abs deviation).

    ``apply_*`` take the batch and return logits. This is the
    "checkpoint-level output fidelity" check: same inputs, two
    implementations/weight ports, logit-level comparison.
    """
    la = np.asarray(jax.device_get(apply_a(batch)), np.float64)
    lb = np.asarray(jax.device_get(apply_b(batch)), np.float64)
    max_abs = float(np.abs(la - lb).max())
    ok = bool(np.allclose(la, lb, atol=atol, rtol=rtol))
    return ok, max_abs
