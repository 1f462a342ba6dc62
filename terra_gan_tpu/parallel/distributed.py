"""Multi-host (pod-scale) data parallelism.

The reference is a single-GPU program (SURVEY §2.4: nothing is
distributed). This framework's mesh layer already builds meshes over
``jax.devices()`` — which is the GLOBAL device list once a process
group exists — and ``shard_train_step`` runs the same SPMD program on
every host, so scaling from one chip to a multi-host pod needs exactly
three additions, all here:

1. ``initialize_from_env()`` — create the process group (coordinator
   address + process id from env, or Cloud TPU pod autodetection).
2. ``process_shard(items)`` — give each host a disjoint, EQUAL-SIZED
   subset of the work list (equal sizes keep every host executing the
   same number of collective steps; a host with one extra batch would
   deadlock the others).
3. ``global_batch_from_local(batch, mesh)`` — assemble global sharded
   arrays from each host's process-local batch
   (``jax.make_array_from_process_local_data``), the multi-process
   analogue of ``shard_batch``.

With those, the single-host recipe carries over verbatim:

    initialize_from_env()
    mesh = make_mesh()                      # all GLOBAL devices
    step = shard_train_step(make_train_step(...), mesh)
    for files in loader(process_shard(all_files)):
        batch = global_batch_from_local(load(files), mesh)
        state, metrics = step(state, batch, vgg)   # DP over ICI/DCN

State stays replicated (33 M params — DP-only is the right call at any
practical scale, SURVEY §2.4); gradient/BN reductions ride XLA
collectives exactly as in the single-host mesh case, now across hosts.
Proven by tests/test_distributed.py: two real processes × 4 virtual
CPU devices run a full GAN train step whose metrics match the
single-process 8-device run bit-for-bit-close (same program, same
global batch).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional, Sequence

import jax
import numpy as np

from .mesh import batch_sharding

logger = logging.getLogger(__name__)

_ENV_COORDINATOR = "TERRA_GAN_TPU_COORDINATOR"
_ENV_NUM_PROCESSES = "TERRA_GAN_TPU_NUM_PROCESSES"
_ENV_PROCESS_ID = "TERRA_GAN_TPU_PROCESS_ID"


def initialize_from_env() -> bool:
    """Initialize the JAX process group for multi-host runs.

    Reads ``TERRA_GAN_TPU_COORDINATOR`` (host:port),
    ``TERRA_GAN_TPU_NUM_PROCESSES`` and ``TERRA_GAN_TPU_PROCESS_ID``;
    with none set, single-process operation is assumed and nothing
    happens (on Cloud TPU pod slices, call
    ``jax.distributed.initialize()`` yourself — it autodetects — or set
    the env vars). Returns True when the run is multi-process.

    Must be called before any device use (backend creation pins the
    topology).
    """
    coord = os.environ.get(_ENV_COORDINATOR)
    if not coord:
        return False
    num = int(os.environ[_ENV_NUM_PROCESSES])
    pid = int(os.environ[_ENV_PROCESS_ID])
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=num, process_id=pid
    )
    logger.info(
        "process group up: process %d/%d, %d global / %d local devices",
        pid, num, jax.device_count(), jax.local_device_count(),
    )
    return num > 1


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def is_primary_process() -> bool:
    """True on the process that should own side effects every host
    would otherwise duplicate (checkpoint writes, experiment tracking).
    Always True single-process."""
    return jax.process_index() == 0


def process_shard(
    items: Sequence,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
    equalize: bool = True,
) -> list:
    """Disjoint subset of ``items`` for this process (round-robin).

    With ``equalize`` (the default, for TRAINING data), the shards are
    truncated to the minimum per-process count: every host must run the
    SAME number of steps, or the hosts with more batches block forever
    in collectives waiting for the exhausted ones. The dropped
    remainder is at most ``process_count - 1`` items per epoch
    (reshuffling each epoch rotates which items are dropped).

    Pass ``equalize=False`` for collective-free work (e.g. per-host
    grid inference), where uneven shards are harmless and nothing
    should be dropped.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    mine = list(items[pi::pc])
    if equalize:
        mine = mine[: len(items) // pc]
    return mine


def global_batch_from_local(
    batch: Dict[str, np.ndarray],
    mesh,
    shard_spatial: bool = False,
) -> Dict[str, jax.Array]:
    """Multi-process analogue of ``shard_batch``: each process passes
    its LOCAL batch slice (equal size on every host); the returned
    global arrays have leading dim ``local_n * process_count`` and the
    same (data[, spatial]) sharding the single-host path uses, so
    ``shard_train_step`` runs unchanged.

    Every process's local tile count must be identical (use
    ``process_shard`` + a fixed batch size with ``drop_last`` tails —
    the data-replicated tail trick does not generalize to disjoint
    per-host data).
    """
    sharding = batch_sharding(mesh, shard_spatial=shard_spatial)
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in batch.items()
    }
