"""Device mesh + sharding helpers (new in the rebuild).

The reference is single-process single-GPU with no distributed layer at all
(SURVEY.md section 2, parallelism table). The rebuild's scaling story is the
TPU-native one: a ``jax.sharding.Mesh`` over the slice's ICI, batch arrays
sharded on the ``data`` axis, params replicated, and XLA emitting the
gradient ``psum`` from sharding propagation — no hand-written comm layer.
A ``model`` axis exists in the mesh from day one so tensor-parallel variants
can be added without re-laying-out checkpoints.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vqa_transfer_externaldata_tpu.config import Config

# Environment markers that identify a multi-host launch. JAX's own no-arg
# ``jax.distributed.initialize()`` auto-detects its coordinator on Cloud
# TPU pods (worker hostnames in the TPU metadata) and from the explicit
# coordinator variables used by launchers/tests.
_COORDINATOR_ENV_VARS = (
    "JAX_COORDINATOR_ADDRESS",       # explicit (jax.distributed docs)
    "COORDINATOR_ADDRESS",           # common launcher convention
    "MEGASCALE_COORDINATOR_ADDRESS",  # multislice
)
_dist_initialized = False


def _multihost_env() -> bool:
    import os

    if any(os.environ.get(v) for v in _COORDINATOR_ENV_VARS):
        return True
    # Cloud TPU pod metadata: a single-host TPU VM also sets this (to its
    # own hostname — the axon box exports "localhost"), so it signals
    # multi-host only when it names MORE THAN ONE worker.
    return "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")


def maybe_initialize_distributed(mode: str = "auto",
                                 coordinator_address: str = "",
                                 num_processes: int = -1,
                                 process_id: int = -1) -> bool:
    """Initialize the JAX distributed runtime for multi-host runs.

    The reference is single-process with no distributed layer (SURVEY.md
    section 2); the rebuild's multi-host paths — per-process epoch shards
    (``batches(shard=)``), per-process sharded-store block uploads, the
    evaluators' ``process_allgather``, multi-host async Orbax — all sit on
    ``jax.distributed``, which is NOT started automatically. The train and
    eval entrypoints call this before their first device query
    (``--mesh.distributed``):

    - ``auto`` (default): initialize iff a coordinator/pod environment is
      visible (one process on one host — every test/bench on this box —
      stays exactly as before) or an explicit ``coordinator_address`` was
      passed;
    - ``on``: always initialize;
    - ``off``: never.

    The explicit ``coordinator_address``/``num_processes``/``process_id``
    (``--mesh.coordinator_address`` etc.) exist for launchers JAX cannot
    autodetect — without them, ``on`` outside a recognized pod
    environment raises or hangs waiting for a coordinator (round-4
    ADVICE). Defaults (empty / -1) are omitted so JAX's autodetection
    still runs for anything not given.

    Idempotent across CLIs in one process. Returns whether the runtime
    was initialized by this call.
    """
    global _dist_initialized
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"mesh.distributed must be auto|on|off, "
                         f"got {mode!r}")
    if mode == "off" or _dist_initialized:
        return False
    if mode == "auto" and not (_multihost_env() or coordinator_address):
        return False
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes >= 0:
        kwargs["num_processes"] = num_processes
    if process_id >= 0:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    _dist_initialized = True
    return True


def initialize_distributed_from(cfg: Config) -> bool:
    """CLI glue: :func:`maybe_initialize_distributed` with the
    ``--mesh.*`` coordinator overrides threaded through."""
    m = cfg.mesh
    return maybe_initialize_distributed(
        m.distributed, coordinator_address=m.coordinator_address,
        num_processes=m.num_processes, process_id=m.process_id)


def create_mesh(cfg: Optional[Config] = None,
                devices: Optional[Sequence[Any]] = None) -> Mesh:
    cfg = cfg or Config()
    devices = list(devices if devices is not None else jax.devices())
    num_model = max(1, cfg.mesh.num_model)
    num_data = cfg.mesh.num_data
    if num_data <= 0:
        num_data = len(devices) // num_model
    use = num_data * num_model
    assert use <= len(devices), (
        f"mesh {num_data}x{num_model} needs {use} devices, "
        f"have {len(devices)}")
    arr = mesh_utils.create_device_mesh(
        (num_data, num_model), devices=np.asarray(devices[:use]))
    return Mesh(arr, (cfg.mesh.data_axis, cfg.mesh.model_axis))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split across the data axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_sharded(tree: Any, sharding: Any) -> Any:
    """Host arrays -> global device arrays under ``sharding``.

    ``sharding`` may be ONE ``NamedSharding`` for the whole tree, or a
    matching pytree(-prefix) of shardings (the resident paths pass a dict
    with a row-sharded ``grid_pad`` and replicated everything else).

    Single-process: plain ``device_put``. Multi-process (a real multi-host
    slice): the sharding spans non-addressable devices, so ``device_put``
    cannot build the global array — each process holds only its local rows
    (the per-process dataset shard from ``Dataset.batches(shard=...)``) and
    the global array is assembled with
    ``jax.make_array_from_process_local_data``. For replicated shardings
    every process passes the full array (local == global). The trainer
    routes every per-step upload through here, so the same loop is correct
    on one host and on a multi-host slice.
    """
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    if isinstance(sharding, jax.sharding.Sharding):
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.tree_util.tree_map(
        lambda x, s: jax.make_array_from_process_local_data(
            s, np.asarray(x)), tree, sharding)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Host numpy batch -> device arrays sharded on the data axis."""
    return put_sharded(batch, batch_sharding(mesh))
