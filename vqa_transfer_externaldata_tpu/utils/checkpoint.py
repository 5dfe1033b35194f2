"""Checkpointing + cross-stage transfer glue (reference C12).

The reference uses ``tf.train.Saver`` periodic saves plus a *selective,
variable-name-mapped* restore that pulls the stage-1 (vlmap) word-embedding
space into the stage-2 (vqa) graph and initializes answer-embedding rows
from it — the paper's core transfer mechanism (SURVEY.md sections 0/5).

Rebuild: Orbax for save/auto-resume (async, keep-N), and ``transfer_init``
as a first-class pytree-path-mapped operation: copy the shared word table,
then build each answer-embedding row as the mean of its answer's word
embeddings (multi-word answers average), leaving rows untouched when no
word is known. Out-of-vocabulary answers thereby inherit semantics from the
pretrained space — what enables the paper's OOV-answer evaluation.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from vqa_transfer_externaldata_tpu.utils.logging import log
from vqa_transfer_externaldata_tpu.utils.vocab import Vocab, tokenize


class CheckpointManager:
    """Thin Orbax wrapper: periodic async save, keep-N, auto-resume."""

    def __init__(self, train_dir: str, *, keep: int = 5,
                 save_every: int = 1000) -> None:
        self.directory = os.path.abspath(os.path.join(train_dir, "ckpt"))
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, save_interval_steps=save_every,
                enable_async_checkpointing=True),
        )

    def save(self, step: int, state: Any, *, force: bool = False) -> bool:
        return self._mngr.save(step, args=ocp.args.StandardSave(state),
                               force=force)

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure/shardings of ``state_like``."""
        step = self._mngr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          state_like)
        return self._mngr.restore(step,
                                  args=ocp.args.StandardRestore(abstract))

    def save_data_iter(self, step: int, state: Dict) -> None:
        """Persist a (JSON-serializable) input-iterator state next to the
        ``step`` checkpoint — written synchronously (it is tiny) so a
        resumed run continues on the exact next sample (grain pipelines;
        data/grain_loader.GrainTrainIterator)."""
        import json

        path = os.path.join(self.directory, f"data_iter_{step}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(state, fh)
        os.replace(tmp, path)
        # Mirror Orbax's keep-N pruning: drop iterator states whose model
        # checkpoint no longer exists (a state without its checkpoint is
        # unusable and they otherwise accumulate one file per save).
        import glob
        import re

        kept = set(self._mngr.all_steps())
        kept.add(step)
        for p in glob.glob(os.path.join(self.directory,
                                        "data_iter_*.json")):
            m = re.fullmatch(r"data_iter_(\d+)\.json", os.path.basename(p))
            if m and int(m.group(1)) not in kept:
                try:
                    os.remove(p)
                except OSError:
                    pass

    def restore_data_iter(self, step: Optional[int] = None) -> Optional[Dict]:
        """Iterator state saved at ``step`` (default: latest), or None."""
        import json

        step = self._mngr.latest_step() if step is None else step
        if step is None:
            return None
        path = os.path.join(self.directory, f"data_iter_{step}.json")
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return json.load(fh)

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self._mngr.wait_until_finished()
        self._mngr.close()


def save_params(path: str, params: Any) -> None:
    """One-shot standalone param save (e.g. the published vlmap artifact)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def load_params(path: str) -> Any:
    ckptr = ocp.StandardCheckpointer()
    out = ckptr.restore(os.path.abspath(path))
    ckptr.close()
    return out


# ---------------------------------------------------------------------------
# Transfer init (the paper's contribution, reference C12)
# ---------------------------------------------------------------------------


def answer_embedding_from_words(word_table: np.ndarray, word_vocab: Vocab,
                                answer_vocab: Vocab,
                                fallback: Optional[np.ndarray] = None
                                ) -> np.ndarray:
    """[A, D] matrix: row a = mean word embedding of answer a's tokens.

    Rows whose answer has no known word keep ``fallback``'s row when given
    (transfer_init passes the model's fresh initialization, honouring the
    'rows untouched when no word is known' contract and the initializer's
    scale); standalone callers without a fallback get small seeded random
    values so the rows remain trainable without colliding.
    """
    dim = word_table.shape[1]
    out = np.zeros((len(answer_vocab), dim), np.float32)
    for a, answer in enumerate(answer_vocab.tokens):
        ids = [word_vocab.token_to_id[t] for t in tokenize(answer)
               if t in word_vocab.token_to_id]
        if ids:
            out[a] = word_table[ids].mean(axis=0)
        elif fallback is not None and a < fallback.shape[0]:
            out[a] = fallback[a]
        else:
            out[a] = np.random.default_rng(a).normal(0, 0.01, size=dim)
    return out


def _find_paths(tree: Any, key: str, path: tuple = ()) -> list:
    """All paths in a nested-dict param tree whose final key is ``key``."""
    hits = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            p = path + (k,)
            if k == key:
                hits.append(p)
            hits.extend(_find_paths(v, key, p))
    return hits


def _get_path(tree: Dict, path: tuple) -> Any:
    for k in path:
        tree = tree[k]
    return tree


def _set_path(tree: Dict, path: tuple, value: Any) -> Dict:
    """Functional set: copies only the dicts along ``path``."""
    out = dict(tree)
    if len(path) == 1:
        out[path[0]] = value
    else:
        out[path[0]] = _set_path(tree[path[0]], path[1:], value)
    return out


def _resolve_unique(tree: Dict, key: str, *, who: str,
                    required: bool) -> Optional[tuple]:
    paths = _find_paths(tree, key)
    if not paths:
        if required:
            raise ValueError(
                f"transfer_init: no {key!r} in the {who} param tree "
                f"(top-level keys: {sorted(tree)}); this model does not "
                f"expose the shared word space, so stage-1 transfer "
                f"cannot apply")
        return None
    if len(paths) > 1:
        raise ValueError(
            f"transfer_init: {key!r} is ambiguous in the {who} params: "
            f"{['/'.join(p) for p in paths]}")
    return paths[0]


def transfer_init(vqa_params: Dict, vlmap_params: Dict,
                  word_vocab: Vocab, answer_vocab: Vocab) -> Dict:
    """Map stage-1 params into a freshly-initialized stage-2 param tree.

    - ``word_emb/embedding`` is copied verbatim (shared question/word space).
    - ``answer_embedding`` rows are rebuilt from the pretrained word table
      via :func:`answer_embedding_from_words`.
    Everything else keeps its fresh initialization.

    Both tables are resolved by tree-path search, so nesting differences
    between model families are transparent (``vqa_end2end`` keeps its head
    under ``head/``; any vlmap variant exposes the same ``word_emb`` scope).
    Models without an ``answer_embedding`` (e.g. ``vqa_baseline``) still
    receive the word table, with a warning that the answer-space half of the
    transfer does not apply.
    """
    src_path = _resolve_unique(vlmap_params, "word_emb", who="stage-1",
                               required=True)
    src_table = np.asarray(_get_path(vlmap_params, src_path)["embedding"])
    tgt_path = _resolve_unique(vqa_params, "word_emb", who="stage-2",
                               required=True)
    tgt_table = np.asarray(_get_path(vqa_params, tgt_path)["embedding"])
    if src_table.shape != tgt_table.shape:
        raise ValueError(
            f"word table shape mismatch: vlmap {src_table.shape} "
            f"vs vqa {tgt_table.shape}")
    word_scope = dict(_get_path(vqa_params, tgt_path))
    word_scope["embedding"] = src_table.copy()
    out = _set_path(vqa_params, tgt_path, word_scope)

    ans_path = _resolve_unique(out, "answer_embedding", who="stage-2",
                               required=False)
    if ans_path is None:
        log.warning(
            "transfer_init: model has no 'answer_embedding' table "
            "(e.g. vqa_baseline) — word table transferred, answer-space "
            "init skipped")
        return out
    tgt_ans = np.asarray(_get_path(out, ans_path))
    if src_table.shape[1] != tgt_ans.shape[1]:
        raise ValueError(
            f"answer embedding dim mismatch: words give "
            f"{src_table.shape[1]}, model has {tgt_ans.shape[1]} (set "
            f"model.answer_dim = word_dim for transfer)")
    ans = answer_embedding_from_words(src_table, word_vocab, answer_vocab,
                                      fallback=tgt_ans)
    rows = min(ans.shape[0], tgt_ans.shape[0])
    new_ans = tgt_ans.copy()
    new_ans[:rows] = ans[:rows]
    out = _set_path(out, ans_path, new_ans)
    log.info("transfer_init: word table %s copied, %d answer rows seeded",
             src_table.shape, rows)
    return out
