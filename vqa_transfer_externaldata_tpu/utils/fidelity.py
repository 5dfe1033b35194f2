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


def reference_forward_numpy(params: Dict[str, Any],
                            features: np.ndarray,
                            q_ids: np.ndarray) -> np.ndarray:
    """Independent straight-line numpy reimplementation of the ENTIRE
    reference-convention VQA forward (``model.fidelity_mode``): GloVe
    embedding lookup -> TF1-GRUCell question encoder -> L2-normalized
    single-glimpse spatial attention -> gated-tanh fusion -> cosine
    answer-embedding classifier.

    This is the oracle for SURVEY.md section 7 hard part (a): when the
    reference checkpoints become portable, their weights load into the
    fidelity-mode flax model, and THIS function (sharing no code with the
    flax/Pallas stack — pure numpy in float64) defines what the assembled
    math must produce. tests/test_fidelity.py pins the flax forward to it
    at f32 tolerance.

    ``params``: the fidelity-mode model's param tree. ``features``
    [B, N, C] gathered grid; ``q_ids`` [B, T] int32 (<pad>=0).
    Returns logits [B, num_answers] float64.
    """
    f64 = np.float64

    def sig(a):
        return 1.0 / (1.0 + np.exp(-a))

    def l2n(a):  # ops/layers.l2_normalize convention: sqrt(sum + eps)
        return a / np.sqrt(np.sum(a * a, -1, keepdims=True) + 1e-12)

    # --- question encoder: embedding + TF1 GRUCell (ops/gru.TFGRUEncoder
    # conventions: packed [x, h] kernels, gate bias init 1.0, reset gate
    # multiplies h BEFORE the candidate matmul, h' = z*h + (1-z)*c) ------
    table = np.asarray(params["word_emb"]["embedding"], f64)
    x = table[np.asarray(q_ids)]
    mask = (np.asarray(q_ids) != 0).astype(f64)
    wg = np.asarray(params["gru"]["gates_kernel"], f64)  # [D+H, 2H]
    bg = np.asarray(params["gru"]["gates_bias"], f64)
    wc = np.asarray(params["gru"]["candidate_kernel"], f64)  # [D+H, H]
    bc = np.asarray(params["gru"]["candidate_bias"], f64)
    B, T, _ = x.shape
    H = wc.shape[1]
    h = np.zeros((B, H), f64)
    for t in range(T):
        xt = x[:, t]
        gates = np.concatenate([xt, h], -1) @ wg + bg
        r, z = sig(gates[:, :H]), sig(gates[:, H:])
        c = np.tanh(np.concatenate([xt, r * h], -1) @ wc + bc)
        h_new = z * h + (1.0 - z) * c
        m = mask[:, t][:, None]
        h = m * h_new + (1.0 - m) * h
    q = h

    # --- spatial attention over the grid, per-cell L2 normalization in
    # the scale-after-matmul convention (ops/attention, normalize=True):
    # z_n = (v_n @ Wv) * r_n + qh; s_n = relu(z_n) . ws; alpha = softmax;
    # v_att = sum_n (alpha_n * r_n) v_n -----------------------------------
    v = np.asarray(features, f64)  # [B, N, C]
    qh = q @ np.asarray(params["att_q"]["kernel"], f64) \
        + np.asarray(params["att_q"]["bias"], f64)
    wv = np.asarray(params["att_wv"], f64)
    ws = np.asarray(params["att_ws"], f64)
    r_n = 1.0 / np.sqrt(np.sum(v * v, -1) + 1e-12)  # [B, N]
    z_att = np.einsum("bnc,ch->bnh", v, wv) * r_n[:, :, None] \
        + qh[:, None, :]
    s = np.maximum(z_att, 0.0) @ ws  # [B, N]
    s = s - s.max(-1, keepdims=True)
    alpha = np.exp(s)
    alpha = alpha / alpha.sum(-1, keepdims=True)
    v_att = np.einsum("bn,bnc->bc", alpha * r_n, v)

    # --- gated-tanh fusion + cosine answer-embedding classifier ---------
    def gated(inp, sub):
        y = inp @ np.asarray(sub["w"]["kernel"], f64) \
            + np.asarray(sub["w"]["bias"], f64)
        g = inp @ np.asarray(sub["g"]["kernel"], f64) \
            + np.asarray(sub["g"]["bias"], f64)
        return np.tanh(y) * sig(g)

    fused = gated(q, params["fuse_q"]) * gated(v_att, params["fuse_v"])
    zz = fused @ np.asarray(params["ans_proj"]["kernel"], f64) \
        + np.asarray(params["ans_proj"]["bias"], f64)
    e = l2n(np.asarray(params["answer_embedding"], f64))
    logits = l2n(zz) @ e.T
    return logits * float(np.asarray(params["logit_scale"])) \
        + np.asarray(params["logit_bias"], f64)


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


def reference_vlmap_forward_numpy(params: Dict[str, Any],
                                  feature: np.ndarray,
                                  task: np.ndarray,
                                  candidates: np.ndarray) -> np.ndarray:
    """Independent numpy/float64 reimplementation of the ENTIRE stage-1
    word-level vlmap forward (models/vlmap.VLMapModel, dropout off):
    FiLM task conditioning -> 2-layer relu MLP visual projection ->
    scaled cosine candidate scoring in the shared word space.

    The stage-1 counterpart of :func:`reference_forward_numpy` (SURVEY.md
    section 7 hard part (a)): the pretrained word table this model
    produces is the paper's transferable artifact, so ported stage-1
    reference weights need their own assembled-forward oracle.
    tests/test_fidelity.py pins the flax forward (f32) to it.

    ``feature`` [B, C] f32 region features; ``task`` [B] int32;
    ``candidates`` [B, K] int32. Returns logits [B, K] float64.
    """
    f64 = np.float64

    def l2n(a):
        return a / np.sqrt(np.sum(a * a, -1, keepdims=True) + 1e-12)

    t_emb = np.asarray(params["task_embedding"], f64)[np.asarray(task)]
    x = np.concatenate([np.asarray(feature, f64), t_emb], -1)
    mlp = params["visual_proj"]
    h = x @ np.asarray(mlp["fc0"]["kernel"], f64) \
        + np.asarray(mlp["fc0"]["bias"], f64)
    h = np.maximum(h, 0.0)
    z = h @ np.asarray(mlp["fc1"]["kernel"], f64) \
        + np.asarray(mlp["fc1"]["bias"], f64)
    zn = l2n(z)
    en = l2n(np.asarray(params["word_emb"]["embedding"], f64))  # [V, D]
    scores = zn @ en.T  # [B, V]
    cand = np.take_along_axis(scores, np.asarray(candidates), axis=1)
    return cand * float(np.asarray(params["logit_scale"]))


def reference_vlmap_desc_forward_numpy(params: Dict[str, Any],
                                       feature: np.ndarray,
                                       desc_ids: np.ndarray,
                                       task: np.ndarray,
                                       candidates: np.ndarray) -> np.ndarray:
    """Independent numpy/float64 reimplementation of the description-level
    vlmap forward (models/vlmap.VLMapDescriptionModel, dropout off):
    blanked-phrase GRU in the shared word space (cudnn convention —
    ops/gru.GRUEncoder: r,z,n packed gates, candidate bias ``bhn`` inside
    the reset product, h' = (1-z)*n + z*h, padded steps carry through) ->
    FiLM task conditioning -> relu MLP -> scaled cosine candidate scoring.
    Completes the assembled-forward oracle family (VQA fidelity_mode,
    word-level vlmap, description vlmap)."""
    f64 = np.float64

    def sig(a):
        return 1.0 / (1.0 + np.exp(-a))

    def l2n(a):
        return a / np.sqrt(np.sum(a * a, -1, keepdims=True) + 1e-12)

    table = np.asarray(params["word_emb"]["embedding"], f64)
    x = table[np.asarray(desc_ids)]  # [B, T, D]
    mask = (np.asarray(desc_ids) != 0).astype(f64)
    gru = params["desc_gru"]
    wx = np.asarray(gru["wx"], f64)
    uh = np.asarray(gru["uh"], f64)
    b = np.asarray(gru["b"], f64)
    bhn = np.asarray(gru["bhn"], f64)
    B, T, _ = x.shape
    H = uh.shape[0]
    h = np.zeros((B, H), f64)
    for t in range(T):
        gx = x[:, t] @ wx + b
        gh = h @ uh
        gx_r, gx_z, gx_n = np.split(gx, 3, -1)
        gh_r, gh_z, gh_n = np.split(gh, 3, -1)
        r = sig(gx_r + gh_r)
        z = sig(gx_z + gh_z)
        n = np.tanh(gx_n + r * (gh_n + bhn))
        h_new = (1.0 - z) * n + z * h
        m = mask[:, t][:, None]
        h = m * h_new + (1.0 - m) * h

    t_emb = np.asarray(params["task_embedding"], f64)[np.asarray(task)]
    inp = np.concatenate([np.asarray(feature, f64), h, t_emb], -1)
    mlp = params["visual_proj"]
    hh = np.maximum(inp @ np.asarray(mlp["fc0"]["kernel"], f64)
                    + np.asarray(mlp["fc0"]["bias"], f64), 0.0)
    zz = hh @ np.asarray(mlp["fc1"]["kernel"], f64) \
        + np.asarray(mlp["fc1"]["bias"], f64)
    en = l2n(np.asarray(params["word_emb"]["embedding"], f64))
    scores = l2n(zz) @ en.T
    cand = np.take_along_axis(scores, np.asarray(candidates), axis=1)
    return cand * float(np.asarray(params["logit_scale"]))
