from vqa_transfer_externaldata_tpu.config import Config


def test_defaults_roundtrip():
    cfg = Config()
    assert cfg.data.grid_h == 14 and cfg.model.word_dim == 300
    assert "vqa_attention" in cfg.run_name("vqa")


def test_flag_overlay():
    cfg = Config.from_args([
        "--train.batch_size", "32",
        "--model.model", "vqa_baseline",
        "--model.use_pallas", "false",
    ])
    assert cfg.train.batch_size == 32
    assert cfg.model.model == "vqa_baseline"
    assert cfg.model.use_pallas is False
    # untouched sections keep defaults
    assert cfg.data.max_question_len == 26


def test_replace_flat_rejects_unknown():
    import pytest

    with pytest.raises(KeyError):
        Config().replace_flat({"train.nope": 1})
    with pytest.raises(KeyError):
        Config().replace_flat({"batch_size": 1})


def test_json_serialization():
    cfg = Config()
    d = cfg.to_dict()
    assert d["train"]["seed"] == 123
    assert "bfloat16" in cfg.to_json()
