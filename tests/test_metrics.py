"""Golden tests for the official VQA accuracy metric + normalization."""

import numpy as np

from vqa_transfer_externaldata_tpu.utils import metrics


def test_normalize_contractions():
    assert metrics.normalize_answer("dont") == "don't"
    assert metrics.normalize_answer("isnt it") == "isn't it"


def test_normalize_digits_and_articles():
    assert metrics.normalize_answer("two") == "2"
    assert metrics.normalize_answer("a cat") == "cat"
    assert metrics.normalize_answer("the one dog") == "1 dog"
    assert metrics.normalize_answer("none") == "0"


def test_normalize_punctuation():
    assert metrics.normalize_answer("yes!") == "yes"
    assert metrics.normalize_answer("red, white") == "red white"
    # comma inside a number is stripped, not spaced
    assert metrics.normalize_answer("1,000") == "1,000".replace(",", "")


def test_accuracy_unanimous():
    assert metrics.vqa_accuracy("yes", ["yes"] * 10) == 1.0


def test_accuracy_zero():
    assert metrics.vqa_accuracy("no", ["yes"] * 10) == 0.0


def test_accuracy_partial():
    # 3 of 10 annotators say "cat": leave-one-out subsets have 2 or 3 matches
    gts = ["cat"] * 3 + ["dog"] * 7
    # subsets leaving out a "cat": 2 matches -> 2/3 ; leaving out "dog": 3 -> 1
    expected = (3 * (2 / 3) + 7 * 1.0) / 10
    assert abs(metrics.vqa_accuracy("cat", gts) - expected) < 1e-9


def test_accuracy_min_cap():
    # 10/10 matches still capped at 1
    assert metrics.vqa_accuracy("yes", ["yes"] * 10) == 1.0


def test_unanimous_gt_skips_normalization():
    """Official vqaEval.py gate: normalization (digits, articles,
    punctuation, contractions) runs ONLY when the ground-truth answers
    are not unanimous — a unanimous question compares raw strings."""
    # unanimous: '2' vs raw 'two' does NOT match (official scores 0.0)
    assert metrics.vqa_accuracy("2", ["two"] * 10) == 0.0
    # ...but the raw unanimous form itself matches
    assert metrics.vqa_accuracy("two", ["two"] * 10) == 1.0
    # non-unanimous: normalization applies, '2' matches the 9x 'two'
    gts = ["two"] * 9 + ["three"]
    assert metrics.vqa_accuracy("2", gts) == metrics.vqa_accuracy("two", gts)
    assert metrics.vqa_accuracy("2", gts) > 0.9
    # the prediction is still newline/tab-stripped in the unanimous case
    assert metrics.vqa_accuracy(" two\n", ["two"] * 10) == 1.0

    # answer_scores applies the same gate: unanimous raw form scores 1 at
    # its vocab id; the normalized-but-different form scores 0.
    table = {"two": 0, "2": 1}
    s = metrics.answer_scores(["two"] * 10, table, 2)
    assert s[0] == 1.0 and s[1] == 0.0
    # non-unanimous: gts normalize ('two' -> '2' via the manual digit
    # map), so the score lands on the NORMALIZED vocab form.
    s = metrics.answer_scores(["two"] * 9 + ["three"], table, 2)
    assert s[1] > 0.9 and s[0] == 0.0


def test_normalize_idempotent():
    """Normalizing twice must equal normalizing once (eval code may see
    already-normalized strings from preprocessed artifacts)."""
    cases = ["Isn't it a Dog?", "two, three", "none", "1,000 people",
             "he's running", "y'all"]
    for c in cases:
        once = metrics.normalize_answer(c)
        assert metrics.normalize_answer(once) == once, c


def test_accuracy_symmetry_under_gt_order():
    gts = ["cat"] * 3 + ["dog"] * 7
    import random

    rng = random.Random(0)
    base = metrics.vqa_accuracy("cat", gts)
    for _ in range(5):
        shuffled = gts[:]
        rng.shuffle(shuffled)
        # equal up to float summation order
        assert abs(metrics.vqa_accuracy("cat", shuffled) - base) < 1e-12


def test_answer_scores_and_soft_accuracy():
    a2i = {"yes": 4, "no": 5, "2": 6}
    gts = ["yes"] * 5 + ["no"] * 5
    scores = metrics.answer_scores(gts, a2i, num_answers=8)
    assert scores[4] > 0 and scores[5] > 0 and scores[6] == 0
    # both present 5/10 times: leave-one-out matches are 4 or 5, all >=3 -> 1.0
    assert scores[4] == 1.0 and scores[5] == 1.0
    table = np.stack([scores, scores])
    assert metrics.soft_accuracy(np.array([4, 6]), table) == 0.5
