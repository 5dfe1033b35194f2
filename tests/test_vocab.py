"""Golden tests for tokenizer / vocab / GloVe tooling (reference C2/C3)."""

import numpy as np

from vqa_transfer_externaldata_tpu.utils import vocab as V


def test_tokenize_golden():
    assert V.tokenize("What color is the dog?") == [
        "what", "color", "is", "the", "dog"]
    assert V.tokenize("Isn't it 2 p.m.?") == ["isn't", "it", "2", "p", "m"]
    assert V.tokenize("") == []


def test_vocab_build_deterministic():
    texts = ["the cat sat", "the cat ran", "a dog ran"]
    v1 = V.Vocab.build(texts)
    v2 = V.Vocab.build(list(texts))
    assert v1.tokens == v2.tokens
    assert v1.tokens[: 4] == V.SPECIALS
    # "cat"(2) "ran"(2) "the"(2) then "a"(1) "dog"(1) "sat"(1)
    assert v1.tokens[4:] == ["cat", "ran", "the", "a", "dog", "sat"]


def test_encode_pads_and_truncates():
    v = V.Vocab.build(["cat dog"])
    ids, length = v.encode("cat dog", max_len=4)
    assert length == 2 and ids.shape == (4,)
    assert ids[2] == V.PAD_ID and ids[3] == V.PAD_ID
    ids, length = v.encode("cat dog cat dog cat", max_len=3)
    assert length == 3
    ids, _ = v.encode("unicorn", max_len=3)
    assert ids[0] == V.UNK_ID


def test_answer_vocab_normalizes_and_ranks():
    answers = ["Yes!", "yes", "two", "2", "no"]
    av = V.build_answer_vocab(answers, top_k=2)
    # "yes" (2 after normalization) and "2" (2) beat "no" (1)
    assert set(av.tokens[4:]) == {"yes", "2"}


def test_glove_matrix_roundtrip(tmp_path):
    v = V.Vocab.build(["cat dog"])
    vectors = {"cat": np.ones(4, np.float32)}
    mat = V.glove_matrix(v, vectors, dim=4, pad_to=16)
    assert mat.shape == (16, 4)
    assert np.all(mat[v.token_to_id["cat"]] == 1.0)
    assert np.all(mat[V.PAD_ID] == 0.0)
    assert np.all(mat[len(v):] == 0.0)
    path = str(tmp_path / "emb.npz")
    V.save_matrix(path, mat)
    assert np.array_equal(V.load_matrix(path), mat)


def test_vocab_json_roundtrip(tmp_path):
    v = V.Vocab.build(["what color is the cat", "how many dogs"])
    path = str(tmp_path / "vocab.json")
    v.save(path)
    v2 = V.Vocab.load(path)
    assert v2.tokens == v.tokens
    assert v2.token_to_id == v.token_to_id


def test_decode_skips_padding_only():
    v = V.Vocab.build(["cat dog"])
    ids, _ = v.encode("cat dog", max_len=5)
    # decode drops <pad> but keeps <unk>
    assert v.decode(ids) == ["cat", "dog"]
    ids2, _ = v.encode("cat unicorn", max_len=5)
    assert v.decode(ids2) == ["cat", V.UNK]


def test_glove_txt_parse(tmp_path):
    p = tmp_path / "glove.txt"
    p.write_text("cat 1.0 2.0 3.0\ndog 4.0 5.0 6.0\nbad 1.0\n")
    vecs = V.load_glove_txt(str(p), dim=3)
    assert set(vecs) == {"cat", "dog"}
    v = V.Vocab.build(["cat"])
    vecs = V.load_glove_txt(str(p), dim=3, vocab=v)
    assert set(vecs) == {"cat"}
