"""Grid-scale batched inference.

The reference inpaints tiles one at a time at batch size 1 in a Python
loop (main_pipeline.py:513-525, evaluate.py:30) — the single biggest
throughput loss in the system. Here a whole parent grid (up to 100
child tiles) is inpainted as one device-sharded batch: tiles stacked
on the leading axis, sharded over the mesh's "data" axis, one jit call
per chunk, with double-buffered host->device transfer of the next
chunk while the current one computes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from .mesh import batch_sharding, make_mesh, pad_to_multiple, replicated

_FETCH_PROBE_CACHE: Dict[Any, Tuple[float, float]] = {}


def probe_fetch(device=None) -> Tuple[float, float]:
    """Measured device->host fetch (rtt_seconds, bytes_per_second).

    One ~1 KB round trip (median of 3) gives the latency; one 4 MB
    fetch minus that latency gives the bandwidth. Cached per device for
    the process lifetime — the probe itself costs a couple of round
    trips at startup, nothing per window. On this environment's relay
    tunnel the measured figures are ~0.5 s RTT / ~8 MB/s (BASELINE.md
    grid-e2e budget); on a PCIe-attached chip they are ~1e-4 s / GB/s.
    """
    import time

    if device is None:
        device = jax.devices()[0]
    key = (device.platform, getattr(device, "id", 0))
    if key in _FETCH_PROBE_CACHE:
        return _FETCH_PROBE_CACHE[key]
    small = jax.device_put(np.zeros(1024, np.uint8), device)
    big_n = 4 << 20
    big = jax.device_put(np.zeros(big_n, np.uint8), device)
    jax.block_until_ready([small, big])
    np.asarray(small)  # warm the fetch path
    rtts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(small)
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[1]
    t0 = time.perf_counter()
    np.asarray(big)
    big_t = time.perf_counter() - t0
    bw = big_n / max(big_t - rtt, 1e-9)
    _FETCH_PROBE_CACHE[key] = (rtt, bw)
    return rtt, bw


def auto_chunk_policy(device=None) -> Tuple[int, int]:
    """(chunk_size, prefetch_depth) for grid inference, from a fetch probe.

    The r3 grid study (BASELINE.md) showed the best window size is a
    property of the HOST ATTACHMENT, not the model: on a relay-attached
    device (~0.5 s fetch round trip) large monolithic windows win
    because every fetch pays the RTT (chunk 128: 15.0-16.6 t/s vs
    chunk 32: 13.1-13.5); on PCIe-class hosts where fetch is ~free,
    small windows pipeline host decode/encode against device compute.
    Instead of a hardcoded default the operator must know to flip
    (r3 verdict weakness #4), probe once and decide:

      relay-class (rtt > 50 ms)  -> chunk 128, prefetch 2
      fast fetch                 -> chunk 32, prefetch 3

    Replaces the loop at reference main_pipeline.py:497-539, which has
    no batching or pipelining at all.
    """
    rtt, _bw = probe_fetch(device)
    if rtt > 0.05:
        return 128, 2
    return 32, 3


class BatchedInpainter:
    """Sharded batched forward of the generator in eval mode.

    Usage:
        inp = BatchedInpainter(generator, variables, mesh=mesh)
        out = inp(images, masks)   # [N,H,W,1] float32 in [0,1]
    """

    def __init__(
        self,
        generator,
        variables: Dict[str, Any],
        mesh=None,
        chunk: int = 128,  # measured v5e sweet spot (BASELINE.md r2 batch sweep)
        compute_dtype: Optional[Any] = None,
        shard_spatial: bool = False,
        quantize_uint8: bool = False,
    ):
        """shard_spatial additionally splits the image-height axis over
        the mesh's "spatial" dimension — for tiles too large for one
        chip's HBM (XLA inserts the conv halo exchanges).

        quantize_uint8 performs the PNG uint8 quantization
        (clip(0,1)*255, truncating cast — bit-identical to
        evaluation.inference.save_tile's host conversion) on device, so
        the host fetches 1 byte/px instead of 4. Device->host bandwidth
        bounds grid-scale e2e throughput on PCIe hosts and utterly
        dominates on this environment's relay tunnel (8 MB/s fetch,
        BASELINE.md)."""
        self.generator = generator
        if jax.process_count() > 1:
            # Inference is embarrassingly parallel over tiles: on a pod,
            # each host inpaints its own share over its LOCAL devices
            # (process_shard the work; see cli run_evaluation_mode) —
            # sharding one batch across hosts would only add ICI/DCN
            # coordination AND make the output fetch non-addressable.
            if mesh is not None and any(
                d.process_index != jax.process_index()
                for d in mesh.devices.flat
            ):
                raise ValueError(
                    "BatchedInpainter needs a host-local mesh in "
                    "multi-process runs: pass make_mesh(devices=jax."
                    "local_devices()) and process_shard the tile list"
                )
            if mesh is None:
                mesh = make_mesh(devices=jax.local_devices())
        self.mesh = mesh if mesh is not None else make_mesh()
        self.chunk = chunk
        self.n_dev = self.mesh.shape["data"] * self.mesh.shape["spatial"]
        if not shard_spatial:
            # with no H sharding, tiles only need to divide the data axis
            self.n_dev = self.mesh.shape["data"]
        self.bshard = batch_sharding(self.mesh, shard_spatial)
        self.variables = jax.device_put(variables, replicated(self.mesh))

        def forward(variables, images, masks):
            import jax.numpy as jnp

            # uint8 ingest: host->device transfer of raw decoded bytes
            # (4x fewer than float32), normalized on device exactly as
            # the host loader would (u8 -> f32 /255; mask > 0). On this
            # environment's relay tunnel the float32 input upload was
            # the single largest byte stream of grid e2e (~268 MB per
            # 128-tile window vs 33.5 MB down) — BASELINE.md r5.
            if images.dtype == jnp.uint8:
                images = images.astype(jnp.float32) / 255.0
            if masks.dtype == jnp.uint8:
                masks = (masks > 0).astype(jnp.float32)
            out = generator.apply(variables, images * masks, masks, False)
            if quantize_uint8:
                out = (jnp.clip(out, 0.0, 1.0) * 255.0).astype(jnp.uint8)
            return out

        self._forward = jax.jit(
            forward,
            in_shardings=(replicated(self.mesh), self.bshard, self.bshard),
            out_shardings=self.bshard,
        )

    @property
    def step(self) -> int:
        """Chunk size rounded down to a device multiple."""
        s = max(self.chunk, self.n_dev)
        return s - s % self.n_dev

    def stream_from(self, chunk_iter):
        """Pipelined inference over an iterator of host chunks.

        chunk_iter yields (meta, images, masks); this generator yields
        (meta, host_output) one chunk late: chunk i+1's host->device
        transfer and forward are dispatched BEFORE chunk i's
        device->host fetch blocks, so the device computes while the
        host fetches, and — when the consumer hands the yielded chunk
        to a writer thread — while it encodes PNGs too. This is the
        fetch/encode overlap that closes the grid-e2e host gap
        (reference loop being replaced: main_pipeline.py:497-539,
        strictly sequential load->forward->save per tile).
        """
        pending = None
        for meta, images, masks in chunk_iter:
            arrs = {"image": images, "mask": masks}
            arrs, pad = pad_to_multiple(arrs, self.n_dev)
            img = jax.device_put(arrs["image"], self.bshard)
            msk = jax.device_put(arrs["mask"], self.bshard)
            out = self._forward(self.variables, img, msk)
            try:
                # hint the runtime to start the device->host DMA as
                # soon as the forward completes, so it runs under the
                # next chunk's transfer+compute instead of waiting for
                # the blocking np.asarray below
                out.copy_to_host_async()
            except Exception:  # pragma: no cover - optional fast path
                pass
            if pending is not None:
                prev_meta, prev_out, prev_pad = pending
                yield prev_meta, self._finish(prev_out, prev_pad)
            pending = (meta, out, pad)
        if pending is not None:
            prev_meta, prev_out, prev_pad = pending
            yield prev_meta, self._finish(prev_out, prev_pad)

    def __call__(self, images: np.ndarray, masks: np.ndarray) -> np.ndarray:
        """Inpaint a stack of tiles. images/masks: [N,H,W,1] float32."""
        n = images.shape[0]
        step = self.step

        def chunks():
            for start in range(0, n, step):
                yield (
                    start,
                    images[start : start + step],
                    masks[start : start + step],
                )

        outs = [out for _, out in self.stream_from(chunks())]
        return (
            np.concatenate(outs, axis=0)
            if outs
            else np.zeros((0,) + images.shape[1:], np.float32)
        )

    @staticmethod
    def _finish(out: jax.Array, pad: int) -> np.ndarray:
        host = np.asarray(out)
        return host[: host.shape[0] - pad] if pad else host
