"""Device mesh + sharding helpers (the framework's "distributed backend").

The reference has no distributed execution at all — one CUDA device,
sequential tile loops (SURVEY §2.4). The TPU-native replacement is a
`jax.sharding.Mesh` with two logical axes:

  * "data"    — batch (tile) axis: data-parallel training and
                grid-scale batched inference. Gradient/BatchNorm
                reductions become XLA psums over ICI.
  * "spatial" — image-height axis: spatial partitioning for tiles too
                large for one chip's HBM; XLA's SPMD partitioner
                inserts the conv halo exchanges automatically. This is
                the conv-net analogue of sequence/context parallelism
                (SURVEY §5.7).

Everything is a NamedSharding over this mesh; the train step is jitted
with state replicated and the batch sharded, so the only collectives
are the grad/BN reductions XLA inserts.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(
    n_devices: Optional[int] = None,
    spatial: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, spatial) mesh over the available devices.

    n_devices defaults to all local devices; `spatial` splits off that
    many devices for height-wise spatial partitioning (must divide
    n_devices).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    if n % spatial != 0:
        raise ValueError(f"spatial={spatial} must divide n_devices={n}")
    grid = np.asarray(devices[:n]).reshape(n // spatial, spatial)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def local_mesh_like(mesh: Mesh, devices=None) -> Mesh:
    """Rebuild a requested (data, spatial) mesh geometry on this host's
    local devices (multi-host evaluate: inference is collective-free,
    so each host runs its grid share over a LOCAL mesh).

    When the global geometry exceeds the local device count — the
    common pod case — the SPATIAL factor is preserved and only the
    data axis shrinks: spatial sharding is requested because one chip's
    HBM cannot hold a tile, so silently dropping it would turn a
    geometry problem into per-chip OOMs. Falls back to spatial=1 (with
    a warning) only when spatial itself exceeds the local devices."""
    devices = list(devices if devices is not None else jax.local_devices())
    d, s = mesh.shape[DATA_AXIS], mesh.shape[SPATIAL_AXIS]
    if d * s <= len(devices):
        return make_mesh(d * s, spatial=s, devices=devices)
    if s <= len(devices):
        return make_mesh((len(devices) // s) * s, spatial=s,
                         devices=devices)
    logger.warning(
        "requested spatial=%d exceeds the %d local devices; falling "
        "back to spatial=1 — oversized tiles may OOM on one chip",
        s, len(devices),
    )
    return make_mesh(devices=devices)


# v5e chip HBM: 16 GB physical, ~15.75 GB usable (measured round 1,
# BASELINE.md); the budget fraction leaves headroom for XLA scratch,
# fusion temporaries and the remote-relay transfer buffers.
HBM_BYTES_V5E = int(15.75 * 2**30)
_HBM_BUDGET_FRACTION = 0.6
# peak live activation footprint of the PConv U-Net per input pixel:
# the widest full-resolution stages (enc1/dec1) carry 64 feature
# channels, and ~6 such buffers are simultaneously live (input, enc1
# out, its skip copy pinned until dec1, the upsampled decoder features,
# the concat operands and the composite). Training multiplies this by
# ~4: saved residuals for the backward pass plus the VGG perceptual
# graph (measured: batch-16 512^2 training fills the chip, BASELINE.md).
_EVAL_BYTES_PER_PIXEL = 64 * 4 * 6
_TRAIN_ACTIVATION_MULTIPLIER = 4


def auto_spatial(
    n_devices: int,
    height: int,
    width: int,
    batch_per_device: int = 1,
    training: bool = False,
    hbm_bytes: int = HBM_BYTES_V5E,
) -> int:
    """HBM-based heuristic: how many ways to shard the image H axis.

    Returns the smallest power-of-two spatial factor (dividing
    n_devices) whose per-device activation estimate fits the HBM
    budget. 512² production tiles → 1 (no spatial sharding); the axis
    only engages for oversized tiles (≥~4k² eval, ≥~2k² training at
    batch 1) where one chip's HBM cannot hold the full-resolution
    stages — SURVEY §5.7's "long context" analogue.
    """
    est = height * width * _EVAL_BYTES_PER_PIXEL * max(1, batch_per_device)
    if training:
        est *= _TRAIN_ACTIVATION_MULTIPLIER
    budget = _HBM_BUDGET_FRACTION * hbm_bytes
    spatial = 1
    while est / spatial > budget:
        nxt = spatial * 2
        if nxt > n_devices or n_devices % nxt != 0:
            break
        spatial = nxt
    return spatial


def parse_mesh_arg(
    spec: Optional[str],
    height: int = 512,
    width: int = 512,
    batch_per_device: int = 1,
    training: bool = False,
) -> Optional[Mesh]:
    """CLI --mesh value -> Mesh. Accepts "8", "4x2" (data x spatial), or
    "auto" (all local devices, spatial chosen by the HBM heuristic)."""
    if not spec:
        return None
    spec = spec.strip().lower()
    if spec == "auto":
        n = len(jax.devices())
        spatial = auto_spatial(
            n, height, width, batch_per_device, training=training
        )
        return make_mesh(n, spatial=spatial)
    parts = [int(x) for x in spec.split("x")]
    data, spatial = (parts + [1])[:2]
    return make_mesh(data * spatial, spatial=spatial)


def data_axis_size(mesh: Mesh) -> int:
    """How many ways the tile axis is split — the divisibility requirement
    for a batch to shard over this mesh."""
    return mesh.shape[DATA_AXIS]


def batch_spec(
    mesh: Mesh, shard_spatial: bool = False, shard_data: bool = True
) -> P:
    """PartitionSpec for an NHWC batch: shard N on data, optionally H.

    shard_data=False replicates the batch over the data axis instead —
    the tail-batch path for tile counts that don't divide the mesh
    (see shard_train_step): every data row redundantly computes the
    true (unpadded) batch, so loss means and BatchNorm batch statistics
    match the reference's single-device tail semantics exactly
    (mvp_gan/src/train.py:75-81, drop_last unset).
    """
    n = DATA_AXIS if shard_data else None
    if shard_spatial and mesh.shape[SPATIAL_AXIS] > 1:
        return P(n, SPATIAL_AXIS, None, None)
    return P(n)


def batch_sharding(
    mesh: Mesh, shard_spatial: bool = False, shard_data: bool = True
) -> NamedSharding:
    return NamedSharding(mesh, batch_spec(mesh, shard_spatial, shard_data))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(
    batch: Dict[str, jax.Array],
    mesh: Mesh,
    shard_spatial: bool = False,
    shard_data: bool = True,
) -> Dict[str, jax.Array]:
    """Place a host batch dict onto the mesh, sharded over tiles.

    Works in multi-host runs too: every process passes the IDENTICAL
    global batch (deterministic seeded loaders make this free — see
    parallel/distributed.py), and each contributes only its addressable
    shards via make_array_from_callback, which handles any (data,
    spatial, replicated) layout. Hosts with disjoint per-process data
    should use distributed.global_batch_from_local instead."""
    sharding = batch_sharding(mesh, shard_spatial, shard_data)
    if jax.process_count() > 1:
        out = {}
        for k, v in batch.items():
            v = np.asarray(v)
            out[k] = jax.make_array_from_callback(
                v.shape, sharding, lambda idx, _v=v: _v[idx]
            )
        return out
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def pad_to_multiple(
    arrays: Dict[str, np.ndarray], multiple: int
) -> Tuple[Dict[str, np.ndarray], int]:
    """Pad the leading (tile) axis so it divides the mesh; returns pad count.

    Padding repeats the last element so BatchNorm statistics stay
    finite; callers slice the output back to the true count.
    """
    n = next(iter(arrays.values())).shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return arrays, 0
    padded = {
        k: np.concatenate([v, np.repeat(v[-1:], rem, axis=0)], axis=0)
        for k, v in arrays.items()
    }
    return padded, rem


def shard_train_step(
    step_fn,
    mesh: Mesh,
    shard_spatial: bool = False,
    shard_data: bool = True,
):
    """Wrap a train step for SPMD execution over the mesh.

    state/vgg replicated, batch sharded over tiles (and optionally H).
    Under jit's global view, batch-axis reductions (BatchNorm means,
    loss means, and thus gradients) automatically become cross-device
    psums — exactly single-device semantics, faster.

    shard_data=False builds the *tail-batch* variant: the batch is
    replicated over the data axis (still H-sharded over spatial when
    enabled), so any tile count runs with true-batch loss/BatchNorm
    semantics at the cost of redundant compute on the data rows. The
    training loop routes non-divisible final batches here instead of
    padding, which would bias the means (the reference trains the
    partial tail batch as-is: mvp_gan/src/train.py:75-81). Per-device
    memory for the tail equals the reference's own single-device
    requirement at that batch size.
    """
    repl = replicated(mesh)
    bshard = batch_sharding(mesh, shard_spatial, shard_data)
    return jax.jit(
        step_fn,
        in_shardings=(repl, {"image": bshard, "mask": bshard}, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
