"""Device mesh construction.

The reference scales with NCCL DDP + DeepSpeed ZeRO configured by accelerate
YAML / ds JSON (acc_configs/, ds_configs/). The TPU-native equivalent is a
single ``jax.sharding.Mesh`` with named axes and GSPMD-inserted collectives:

- axis "data":  batch (and ZeRO-style fully-sharded params/opt-state)
- axis "model": tensor parallelism (attention heads / MLP columns)

Multi-slice topologies put "data" on DCN and keep "model" inside ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(data: Optional[int] = None, model: int = 1,
                dcn: int = 1,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ("data", "model") mesh. ``data`` defaults to
    n_devices // model.

    dcn > 1 builds a multi-slice topology (the reference's multi-node
    accelerate `num_machines` equivalent): the outermost ``dcn`` factor of
    the data axis crosses the slow DCN links while "model" (and the
    intra-slice part of "data") stay inside each slice's ICI. On real
    multi-slice TPU hardware the device order comes from
    ``mesh_utils.create_hybrid_device_mesh`` so GSPMD emits hierarchical
    collectives (reduce-scatter inside the slice, all-reduce across); on
    hosts without slice topology (CPU emulation, single slice) devices are
    grouped contiguously per emulated slice — same mesh shape and sharding
    semantics, which is what multi-chip dry runs validate."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    if dcn > 1:
        if data % dcn:
            raise ValueError(f"data={data} not divisible by dcn={dcn}")
        per_slice_data = data // dcn
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_hybrid_device_mesh(
                (per_slice_data, model), (dcn, 1), devices=devices)
        except (ValueError, AssertionError, KeyError, AttributeError):
            # no slice topology info (CPU emulation / single physical
            # slice): contiguous per-slice grouping
            arr = np.asarray(devices).reshape(data, model)
        return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_batch_size() -> int:
    """Batch size for dummy inputs in workload init_fns: the ambient
    mesh's data-axis size when one is set, else 1. Parameter shapes never
    depend on batch, but under sequence_parallel the attention shard_map
    pins the batch dim to the "data" axis (parallel/context.py:61) — a
    batch-1 dummy then fails the divisibility check on any data>1 mesh,
    so init must trace with one row per data shard."""
    mesh = jax.sharding.get_abstract_mesh()
    if not mesh.empty and DATA_AXIS in mesh.shape:
        return mesh.shape[DATA_AXIS]
    return 1


def local_batch_slice(global_batch: int, mesh: Mesh) -> int:
    """Per-PROCESS batch share for multi-host feeding (the reference's
    partition_dataset equivalent, keyed on jax.process_index()). Each host
    feeds global_batch / process_count examples — NOT global_batch /
    data-device-count, which would be the per-DEVICE share (a process
    usually owns several data-parallel devices)."""
    n_proc = max(len({d.process_index for d in mesh.devices.flat}), 1)
    if global_batch % n_proc:
        raise ValueError(
            f"global batch {global_batch} does not divide over "
            f"{n_proc} host processes")
    return global_batch // n_proc


def maybe_initialize_distributed(enable=None) -> bool:
    """Multi-host bring-up: call jax.distributed.initialize() so
    jax.process_count()/process_index() see the whole pod (the
    reference relies on torch.distributed init via DeepSpeed launchers;
    scripts/training/*.sh -> deepspeed). Without this, every host of a
    pod slice runs as its own single-process world and the CLIs'
    partition_items() data split degenerates to "everyone reads
    everything".

    enable=None auto-detects multi-host env (an explicit coordinator
    address, or a TPU worker-hostname list with >1 entry — a single
    entry means one host, e.g. the dev relay's
    TPU_WORKER_HOSTNAMES=localhost); False skips; True forces. Must run
    before the first device access. Returns True when a multi-process
    runtime was initialized. Safe to call twice.
    """
    import os

    auto = enable is None
    if auto:
        workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        enable = bool(
            os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS")
            or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
            or len([w for w in workers.split(",") if w.strip()]) > 1)
    if not enable:
        return False
    try:
        jax.distributed.initialize()
    except RuntimeError as e:
        # double-init is a no-op: jax 0.9 raises "distributed.initialize
        # should only be called once."; older versions said "already
        # initialized"
        msg = str(e).lower()
        if ("already initialized" not in msg
                and "only be called once" not in msg):
            raise
    except ValueError:
        # jax could not resolve a coordinator from the environment. When
        # the user forced --multihost true that is a config error; when we
        # merely guessed, degrade to single-process instead of killing a
        # working single-host run.
        if not auto:
            raise
        import logging

        logging.getLogger(__name__).warning(
            "multi-host env detected but jax.distributed.initialize() "
            "found no coordinator; continuing single-process")
        return False
    return jax.process_count() > 1
