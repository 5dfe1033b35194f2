"""Evaler semantics: full coverage, pad masking, official result format."""

import numpy as np

from vqa_transfer_externaldata_tpu.data.datasets import ArrayDataset
from vqa_transfer_externaldata_tpu.parallel.evaler import padded_batches
from vqa_transfer_externaldata_tpu.utils.vocab import UNK_ID


def test_padded_batches_cover_all_rows_and_mask_pads():
    n, bs = 10, 4
    ds = ArrayDataset({
        "q_ids": np.arange(n * 3, dtype=np.int32).reshape(n, 3),
        "answer_id": np.full((n,), 7, np.int32),
    })
    gen, total = padded_batches(ds, bs)
    batches = list(gen)
    assert total == n and len(batches) == 3
    flat_q = np.concatenate([b["q_ids"] for b in batches])[:n]
    np.testing.assert_array_equal(flat_q, ds.arrays["q_ids"])
    # padded rows are copies of row 0 but with <unk> answers (masked)
    last = batches[-1]
    assert last["answer_id"][2] == UNK_ID and last["answer_id"][3] == UNK_ID
    np.testing.assert_array_equal(last["q_ids"][2], ds.arrays["q_ids"][0])
    # real rows keep their answers
    assert last["answer_id"][0] == 7


def test_padded_batches_exact_multiple_is_untouched():
    ds = ArrayDataset({"answer_id": np.full((8,), 3, np.int32)})
    gen, n = padded_batches(ds, 4)
    batches = list(gen)
    assert n == 8 and len(batches) == 2
    assert all((b["answer_id"] == 3).all() for b in batches)
