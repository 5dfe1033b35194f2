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


def test_maybe_initialize_distributed_gate(monkeypatch):
    """--mesh.distributed: auto only fires when a coordinator/pod env is
    visible; on always fires; off never; idempotent within a process.
    (The real 2-process runtime is exercised by test_multiprocess.py —
    this pins the CLI gate's decision logic without starting one.)"""
    import jax

    from vqa_transfer_externaldata_tpu.parallel import mesh as mesh_mod

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append(1))
    for var in mesh_mod._COORDINATOR_ENV_VARS:
        monkeypatch.delenv(var, raising=False)
    # A single-host TPU VM (incl. this box) sets TPU_WORKER_HOSTNAMES to
    # ONE hostname — that must not trigger auto; multiple workers must.
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    monkeypatch.setattr(mesh_mod, "_dist_initialized", False)

    assert mesh_mod.maybe_initialize_distributed("off") is False
    assert mesh_mod.maybe_initialize_distributed("auto") is False  # no env
    assert calls == []

    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-0,host-1")
    assert mesh_mod.maybe_initialize_distributed("auto") is True
    assert calls == [1]
    monkeypatch.setattr(mesh_mod, "_dist_initialized", False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    calls.clear()

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:1234")
    assert mesh_mod.maybe_initialize_distributed("auto") is True
    assert calls == [1]
    # idempotent: a second CLI call in the same process is a no-op
    assert mesh_mod.maybe_initialize_distributed("auto") is False
    assert mesh_mod.maybe_initialize_distributed("on") is False
    assert calls == [1]

    monkeypatch.setattr(mesh_mod, "_dist_initialized", False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS")
    assert mesh_mod.maybe_initialize_distributed("on") is True
    assert calls == [1, 1]

    import pytest

    with pytest.raises(ValueError, match="auto|on|off"):
        mesh_mod.maybe_initialize_distributed("yes")


def test_initialize_distributed_explicit_coordinator(monkeypatch):
    """--mesh.coordinator_address/num_processes/process_id flow through to
    jax.distributed.initialize for launchers JAX cannot autodetect
    (round-4 ADVICE: 'on' had no path to pass one); an explicit
    coordinator alone also flips auto on; defaults are OMITTED so JAX's
    autodetection still covers anything not given."""
    import jax

    from vqa_transfer_externaldata_tpu.parallel import mesh as mesh_mod

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    for var in mesh_mod._COORDINATOR_ENV_VARS:
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    monkeypatch.setattr(mesh_mod, "_dist_initialized", False)

    # explicit coordinator: auto fires and every given field is passed
    assert mesh_mod.maybe_initialize_distributed(
        "auto", coordinator_address="10.0.0.1:8476",
        num_processes=4, process_id=2) is True
    assert calls == [{"coordinator_address": "10.0.0.1:8476",
                      "num_processes": 4, "process_id": 2}]

    # defaults are omitted entirely ("on" + autodetection)
    monkeypatch.setattr(mesh_mod, "_dist_initialized", False)
    calls.clear()
    assert mesh_mod.maybe_initialize_distributed("on") is True
    assert calls == [{}]

    # the CLI glue threads the --mesh.* overrides through
    monkeypatch.setattr(mesh_mod, "_dist_initialized", False)
    calls.clear()
    cfg = Config.from_args([
        "--mesh.distributed", "auto",
        "--mesh.coordinator_address", "h0:1234",
        "--mesh.num_processes", "2", "--mesh.process_id", "1"])
    assert mesh_mod.initialize_distributed_from(cfg) is True
    assert calls == [{"coordinator_address": "h0:1234",
                      "num_processes": 2, "process_id": 1}]
