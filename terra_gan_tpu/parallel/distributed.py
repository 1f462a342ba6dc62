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
    try:
        num = int(os.environ[_ENV_NUM_PROCESSES])
        pid = int(os.environ[_ENV_PROCESS_ID])
    except KeyError as e:
        raise RuntimeError(
            f"{_ENV_COORDINATOR} is set but {e.args[0]} is not — "
            f"multi-host runs need all three of {_ENV_COORDINATOR}, "
            f"{_ENV_NUM_PROCESSES}, {_ENV_PROCESS_ID}"
        ) from e
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


_barrier_seq = 0


def coordination_barrier(name: str, timeout_s: float = 900.0) -> None:
    """Host-level barrier via the coordination service (NOT gloo).

    XLA's CPU cross-process collectives rendezvous through gloo with a
    HARD 30 s context-init timeout: if one process reaches a program's
    first collective >30 s before its peers (checkpoint load, a
    compile-cache race, one host's slower startup), the whole group
    dies with "Gloo context initialization failed". The coordination
    service barrier has a configurable timeout, so lockstep-critical
    phases call this first to absorb startup skew before entering the
    30 s-fused gloo rendezvous. (TPU pods rendezvous through the TPU
    runtime, not gloo — there this is just a cheap alignment point.)
    No-op single-process."""
    if not is_multiprocess():
        return
    global _barrier_seq
    _barrier_seq += 1
    try:
        from jax._src import distributed as _dist

        client = _dist.global_state.client
        if client is None:  # pragma: no cover - initialized elsewhere
            return
        # unique id per call: coordination barriers are one-shot
        client.wait_at_barrier(
            f"terra_gan:{name}:{_barrier_seq}", int(timeout_s * 1000)
        )
    except (ImportError, AttributeError) as e:  # pragma: no cover
        # private-API drift: jax._src.distributed has no stability
        # contract — a rename surfaces as AttributeError, not
        # ImportError; both degrade to the 30 s gloo window + warning
        logger.warning("coordination barrier unavailable: %s", e)


def broadcast_from_primary(tree):
    """Replace every array leaf with process 0's value.

    Re-establishes the replicated-state invariant on multi-host RESUME:
    process 0 owns all checkpoint writes (the single-writer rule), so
    on a pod with per-host filesystems only process 0 finds the master
    or preempted.pth — without this broadcast, each host would load a
    DIFFERENT starting state and the psums would silently mix gradients
    computed against different weights. No-op single-process."""
    if not is_multiprocess():
        return tree
    from jax.experimental import multihost_utils

    # absorb startup skew (checkpoint load happens on process 0 only)
    # before gloo's unforgiving 30 s rendezvous window
    coordination_barrier("broadcast_from_primary")
    return multihost_utils.broadcast_one_to_all(tree)


def any_process(flag: bool) -> bool:
    """Host-level OR across the process group (True single-process iff
    flag). Keeps per-host control flow in lockstep: a preemption signal
    or failure seen by ONE host must stop/affect EVERY host at the same
    batch boundary, or the others deadlock in the next collective."""
    if not is_multiprocess():
        return bool(flag)
    from jax.experimental import multihost_utils

    return bool(
        multihost_utils.process_allgather(np.asarray([bool(flag)])).any()
    )


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
