"""Configuration system.

The reference threads a flat ``argparse.Namespace`` through every layer
(SURVEY.md section 1, component C13: per-entrypoint argparse + per-model arg
hooks + ``train_dir`` naming from hyperparams). Here the same capability is a
typed dataclass tree with a flat ``--section.field`` argparse overlay, so one
config object serves both stages and every entrypoint, and the ``train_dir``
name is still derived from the hyperparameters that matter.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field, fields
from typing import Optional, Sequence


# ---------------------------------------------------------------------------
# Leaf configs
# ---------------------------------------------------------------------------


@dataclass
class DataConfig:
    """Dataset artifact locations and static shapes (reference C2/C5/C7)."""

    dataset_dir: str = "data/preprocessed/vqa_v2"
    feature_path: str = ""  # HDF5/npz of precomputed image grid features
    vocab_path: str = ""  # question vocab json
    answer_vocab_path: str = ""  # top-K answer vocab json
    glove_path: str = ""  # filtered GloVe matrix (npz) or raw .txt
    # Static shapes (XLA: everything fixed at trace time).
    max_question_len: int = 26  # reference pads questions to a fixed length
    image_size: int = 448  # raw-image path (end2end model); 448/32 -> 14
    grid_h: int = 14
    grid_w: int = 14
    feature_dim: int = 2048  # ResNet-101 conv5 channels
    pool5_dim: int = 2048
    num_answers: int = 2000  # top-K answer vocab size
    vocab_size: int = 8192  # question-word vocab size (padded for MXU tiling)
    # vlmap: redraw same-task negatives each batch (vs the fixed
    # preprocessing-time candidate sets).
    resample_negatives: bool = True
    # Raw-image (end2end, BASELINE config 5) inputs: JPEG directory joined
    # against the question table's image_ids (official COCO naming).
    image_dir: str = ""
    # "" = derive from the dataset split (official COCO naming embeds the
    # split: train->train2014, val->val2014, test/test-dev->test2015);
    # set explicitly only for non-standard image layouts — the override
    # then applies to EVERY split.
    coco_split: str = ""
    # "threads" (in-repo thread-pool decode, data/ingest.py) or "grain"
    # (deterministic, checkpointable grain pipeline — iterator state is
    # saved alongside each Orbax checkpoint so resume is sample-exact;
    # data/grain_loader.py).
    input_pipeline: str = "threads"
    # grain only: >0 runs decode in this many worker processes
    # (grain mp_prefetch); 0 decodes in-process.
    grain_workers: int = 0
    # Synthetic-data mode (tests / benchmarking without the real corpora).
    synthetic: bool = False
    synthetic_size: int = 1024
    # Synthetic stage-2 corpus layout: "flat" = per-question feature
    # copies (simple; exercises the gathered paths), "joined" = the
    # PRODUCTION layout (deduplicated f16 feature store + question table
    # joined by image_index, ~8 questions/image) — the shape the 93k
    # q/s/chip headline bench trains, reachable from the CLI with
    # --data.synthetic_layout joined --train.device_data_cache true.
    synthetic_layout: str = "flat"


@dataclass
class ModelConfig:
    """Model family + dimensions (reference C6/C8 model zoo flags)."""

    model: str = "vqa_attention"  # registry key, see models/zoo.py
    word_dim: int = 300  # GloVe dimensionality
    rnn_dim: int = 512  # GRU hidden size
    fusion_dim: int = 1024  # joint embedding dim
    att_hidden: int = 512  # attention score-MLP hidden size
    answer_dim: int = 300  # answer-embedding space (ties to word_dim)
    dropout: float = 0.5
    dtype: str = "bfloat16"  # compute dtype on TPU; params stay float32
    use_pallas: bool = True  # fused Pallas kernels for hot ops
    glimpses: int = 1  # attention glimpses (vqa_attention2 sets 2)
    # vlmap_description only: bidirectional blanked-phrase encoder
    # (ops/gru.BiGRUEncoder) — the blank's RIGHT context reaches the
    # encoding directly instead of only through the forward recurrence.
    bidirectional_desc: bool = False
    # vlmap family, TRAINING loss formulation. The K-candidate softmax
    # CE is exactly log Σ_v count[b,v]·e^{s_v} − s_word over the dense
    # [B, V] score matrix the model already computes — carrying the
    # candidate MULTISET as per-word counts ([N, V] uint8, or uint16 for
    # num_candidates >= 256; built by the data layer) makes both the
    # [B, K]-from-[B, V] element gather and its backward scatter
    # disappear (profiled 2.2 ms of a 3.08 ms desc step on v5e;
    # gradients bitwise identical, tests/test_models.py). Eval keeps the
    # gathered [B, K] logits (deterministic stored candidate sets,
    # predictions by candidate index). Memory: counts cost N·V bytes
    # (u8) resident — fine at bench/corpus scale (68 MB u16 at N=4096,
    # V=8192), prohibitive for multi-million-region stores (load_dataset
    # raises past ~16 GB); streamed resampled training builds them per
    # batch instead. Stays opt-in.
    dense_candidate_loss: bool = False
    # "cudnn" (TPU-fused, default) or "tf" (TF1-GRUCell-exact gate math
    # for reference-checkpoint fidelity, ops/gru.TFGRUEncoder)
    rnn_variant: str = "cudnn"
    # Reference-convention fidelity assembly (SURVEY.md section 7 hard
    # part (a)): forces the TF1-exact GRU, float32 compute and the XLA
    # (non-Pallas) attention forward — the drop-in target for ported
    # reference checkpoints. The FULL forward under this flag is
    # golden-tested against an independent straight-line numpy
    # reimplementation (utils/fidelity.reference_forward_numpy).
    fidelity_mode: bool = False
    # vqa_end2end (raw-image) backbone: torchvision-format resnet101
    # state_dict (.pth) loaded into params/batch_stats at init — without it
    # the frozen extractor is RANDOM and real-data training is useless.
    resnet_checkpoint: str = ""
    resnet_stages: str = "3,4,23,3"  # bottleneck blocks per stage (101)
    resnet_width: int = 64  # stem channels (tests shrink both)
    # vlmap (stage-1) specific
    num_tasks: int = 32
    task_dim: int = 64
    num_candidates: int = 512  # candidate answer-words per vlmap example


@dataclass
class TrainConfig:
    """Optimization + loop control (reference C10 trainer flags)."""

    batch_size: int = 256  # global batch (sharded over the data axis)
    learning_rate: float = 1e-3
    lr_decay_steps: int = 10_000
    lr_decay_rate: float = 0.9
    warmup_steps: int = 200
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_eps: float = 1e-8
    grad_clip_norm: float = 10.0
    weight_decay: float = 0.0
    # Adam first-moment storage dtype ("float32" | "bfloat16"): mu is a
    # scan-carried buffer, so its width is real per-step HBM traffic
    # (~45 MB read+write at the flagship's 11M params — part of the
    # step's optimizer-traffic floor, BASELINE.md "step tail"). bf16 mu
    # changes only mu's storage rounding (optax casts per update); nu
    # stays f32 — its (1-b2)=1e-3 increments are below bf16's ~2^-8
    # relative resolution and would stall the EMA.
    adam_mu_dtype: str = "float32"
    max_steps: int = 100_000
    log_every: int = 50
    eval_every: int = 1000
    checkpoint_every: int = 1000
    keep_checkpoints: int = 5
    seed: int = 123
    train_dir: str = "train_dir"
    resume: bool = True  # auto-resume from latest checkpoint in train_dir
    # jax.profiler trace: capture steps [profile_start, profile_start +
    # profile_steps) into <train_dir>/profile (0 disables). View with
    # TensorBoard or Perfetto (SURVEY.md section 5).
    profile_start: int = 10
    profile_steps: int = 0
    # Host-side input prefetch depth (batches prepared ahead by a
    # background thread while the device runs; 0 disables).
    prefetch_batches: int = 2
    # Train steps fused into one device dispatch (lax.scan over a stacked
    # batch). Only helps when the host/dispatch path is the bottleneck —
    # async dispatch already overlaps compute on a healthy setup (measured
    # slower on v5e at batch 256: scan carry overhead > dispatch savings),
    # so default 1. Logging/checkpoint cadence round to this granularity.
    steps_per_call: int = 1
    # Transfer (stage-2) init: path to a stage-1 (vlmap) checkpoint whose
    # word/answer embedding space seeds the answer classifier (reference C12).
    pretrained_param_path: str = ""
    # Comma-separated param names to freeze (zero updates), matched against
    # any component of the param tree path — e.g.
    # "answer_embedding,logit_bias" keeps the transferred answer space
    # fixed during fine-tuning, the paper's protocol for answering
    # out-of-vocabulary answers (SURVEY.md section 0: OOV rows must keep
    # their pretrained geometry rather than being pushed away by the
    # softmax over in-vocab training targets).
    freeze_params: str = ""
    donate_state: bool = True
    # Rematerialize the forward in the backward pass (jax.checkpoint):
    # trades ~1 extra forward of FLOPs for activation memory — enables
    # larger batches / the raw-image model at bigger B.
    remat: bool = False
    # Upload the WHOLE dataset to device once and gather batches on-device
    # by index (only [batch] int32 indices cross the host link per step).
    # For datasets that fit in HBM; essential when host->device bandwidth
    # is poor (this box's TPU relay moves 0.06 GB/s — a 411MB f32 batch
    # costs 6.7s/step uploaded, ~0 device-resident).
    device_data_cache: bool = False
    # With device_data_cache: skip the per-step [B, N, C] feature gather
    # entirely — the attention kernels read grid rows straight from the
    # resident store via Mosaic scalar prefetch (vqa_attention only,
    # single glimpse). See ops/attention_resident.py. Default ON from
    # round-3 session 5: strictly faster where it applies (train device
    # step 5.09 -> 2.74 ms; eval 2.76 -> 0.99 ms/batch profiled),
    # parity-tested vs the gathered path end-to-end, and it falls back to
    # the gathered resident path automatically (with a log line) for
    # models/shapes it does not cover.
    resident_fused_attention: bool = True
    # With resident_fused_attention: quantize the resident feature store.
    # "int8": per-cell L2 prenormalization (store_prenormalized math,
    # unchanged) then symmetric int8 codes with ONE global scale — the
    # dominant HBM traffic of the attention kernels (the [Np, C] v reads)
    # halves, the codes are cast in VMEM, and the scale is applied
    # entirely outside the kernels (ops/attention_resident.quantize_store
    # docstring). Affects training numerics at quantization-noise level
    # (~0.4% relative on v_att; parity + accuracy tests in
    # tests/test_attention_resident.py). "" = bf16 store (exact).
    store_quantize: str = ""
    # With resident_fused_attention on a >1-device data axis: partition
    # the resident feature store's ROW axis over the data axis instead of
    # replicating it — rows assign ROUND-ROBIN (device d owns rows with
    # row % n_devices == d, ~M/n each) and each device trains on the
    # questions whose image it owns (per-shard seeded sampling; standard
    # pre-sharded data-parallel semantics). This is
    # the HBM-capacity mode: the aggregate store can be ~n_devices times
    # one chip's HBM (the real VQA v2 grid store, ~66 GB bf16, fits a
    # v5e-8 at 8.3 GB/chip). Math per step is identical to the replicated
    # store given the same batches (tested); requires the fused resident
    # path (raises otherwise — silently replicating would defeat the
    # point of the flag).
    store_sharded: bool = False
    # With device_data_cache on a JoinedDataset: order each staged index
    # batch by its store row (image_index). Batch COMPOSITION is unchanged
    # — only the within-batch order, to which every reduction (loss mean,
    # grads, metrics) is invariant (tested). Hypothesis was that the
    # resident kernels' v block would skip its HBM re-fetch on consecutive
    # same-row grid steps; MEASURED 2026-08-17 on v5e: no device-step
    # change at 8-16 questions/image (Mosaic issues the block copy
    # regardless of index equality), so this defaults OFF. Kept selectable
    # for gather-path locality experiments.
    sort_batch_by_image: bool = False


@dataclass
class MeshConfig:
    """Device-mesh layout (new in the rebuild; reference is single-device).

    Axis names are fixed so a model axis can be added later without breaking
    checkpoints (SURVEY.md section 2, parallelism table).
    """

    data_axis: str = "data"
    model_axis: str = "model"
    num_data: int = -1  # -1: all visible devices on the data axis
    num_model: int = 1
    # Multi-host: whether CLI entrypoints start the JAX distributed
    # runtime (jax.distributed.initialize) before the first device query.
    # "auto" initializes only when a coordinator/pod environment is
    # visible (JAX_COORDINATOR_ADDRESS / TPU_WORKER_HOSTNAMES / ...);
    # "on" always; "off" never. See parallel.mesh
    # .maybe_initialize_distributed.
    distributed: str = "auto"
    # Explicit coordinator for launchers JAX cannot autodetect (round-4
    # ADVICE: "on" had no path to pass one): host:port of process 0, the
    # total process count, and this process's id. Defaults defer to JAX's
    # autodetection (Cloud TPU pod metadata / the env vars above); any
    # non-default value is passed through to jax.distributed.initialize,
    # and coordinator_address alone also flips "auto" on.
    coordinator_address: str = ""
    num_processes: int = -1
    process_id: int = -1
    # Comma-separated param-path substrings to shard row-wise (dim 0) over
    # the model axis — tensor parallelism for the big embedding/classifier
    # tables (e.g. "answer_embedding,word_emb"). A matching table whose
    # row count is not divisible by num_model stays replicated. XLA
    # inserts the cross-shard collectives (the softmax over a
    # model-sharded logits dim) from sharding propagation.
    shard_params: str = ""


@dataclass
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    # -- argparse overlay ---------------------------------------------------

    @classmethod
    def parser(cls) -> argparse.ArgumentParser:
        p = argparse.ArgumentParser(
            description="tpu-vqa-transfer",
            formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        )
        for section_field in fields(cls):
            section_cls = section_field.default_factory  # type: ignore[union-attr]
            for f in fields(section_cls()):
                flag = f"--{section_field.name}.{f.name}"
                default = getattr(section_cls(), f.name)
                if f.type in ("bool", bool):
                    p.add_argument(
                        flag, type=_parse_bool, default=None, metavar="BOOL"
                    )
                else:
                    p.add_argument(flag, type=type(default), default=None)
        p.add_argument("--config_json", type=str, default=None,
                       help="JSON file of overrides, applied before flags")
        return p

    @classmethod
    def from_args(cls, argv: Optional[Sequence[str]] = None) -> "Config":
        args, _ = cls.parser().parse_known_args(argv)
        cfg = cls()
        if args.config_json:
            with open(args.config_json) as fh:
                cfg = cfg.replace_flat(json.load(fh))
        overrides = {
            k: v for k, v in vars(args).items()
            if v is not None and k != "config_json"
        }
        return cfg.replace_flat(overrides)

    def replace_flat(self, overrides: dict) -> "Config":
        """Apply ``{"section.field": value}`` overrides, returning a new Config."""
        sections = {f.name: dataclasses.replace(getattr(self, f.name))
                    for f in fields(self)}
        for key, value in overrides.items():
            section_name, _, field_name = key.partition(".")
            if not field_name:
                raise KeyError(f"override key must be section.field, got {key!r}")
            section = sections[section_name]
            if not hasattr(section, field_name):
                raise KeyError(f"unknown config field {key!r}")
            setattr(section, field_name, value)
        return Config(**sections)

    # -- train_dir naming (reference encodes hyperparams in the dir name) ---

    def run_name(self, stage: str) -> str:
        m, t = self.model, self.train
        return (
            f"{stage}_{m.model}_bs{t.batch_size}_lr{t.learning_rate:g}"
            f"_d{m.fusion_dim}_seed{t.seed}"
        )

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)


def _parse_bool(s: str) -> bool:
    if s.lower() in ("1", "true", "yes", "on"):
        return True
    if s.lower() in ("0", "false", "no", "off"):
        return False
    raise argparse.ArgumentTypeError(f"not a bool: {s!r}")
