"""Inference serving: HTTP service with dynamic micro-batching.

The reference has no serving story (inference = offline batch-1 loop,
main_pipeline.py:513-525). For production deployment this module adds
a dependency-free HTTP service over the TPU-batched inpainter:

  * POST /inpaint        — body {"image": <b64 PNG>, "mask": <b64 PNG>}
                           (or raw 16-bit per-pixel arrays via "array"
                           mode) -> {"inpainted": <b64 PNG>} at the
                           reference's 500x500 output contract
  * POST /inpaint_batch  — {"items": [{image, mask}, ...]} -> list
  * GET  /healthz        — liveness + device info (always open)
  * GET  /stats          — request/batch/error counters, latency
                           p50/p95 over the recent window + EWMA,
                           queue-depth/in-flight gauges (JSON)
  * GET  /metrics        — the same snapshot in Prometheus text
                           exposition format (scrape target)

Auth: when a secret is configured (--auth-secret or the
TERRA_GAN_TPU_SERVING_SECRET env var), every endpoint except /healthz
requires `Authorization: Bearer <HS256 JWT>` signed with that secret —
the same token discipline as the annotation portal
(portal/jwt_auth.py; reference semantics:
Annotation_Portal_Code/app.py:38-55, 401 on a missing/invalid token).
Bodies larger than --max-body-mb are rejected with 413 before reading.

Requests are queued and coalesced into device batches of up to
`max_batch` (padded to the mesh), amortizing dispatch overhead the
same way the offline grid path does: the batcher thread drains the
queue every `max_wait_ms` or when a full batch accumulates.

Run: python -m terra_gan_tpu.serving.server --checkpoint master.pth
        [--port 8500] [--size 512] [--max-batch 16] [--bf16]
"""

from __future__ import annotations

import base64
import io
import json
import logging
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


class BadRequestError(ValueError):
    """Client-side input problem (undecodable image, wrong type) -> 400."""


class MicroBatcher:
    """Coalesces single requests into device batches."""

    # sliding window for latency percentiles: big enough for stable
    # p95 under load, small enough that numpy.percentile over it is
    # microseconds per /stats hit
    LATENCY_WINDOW = 512

    def __init__(self, infer_fn, max_batch: int = 16, max_wait_ms: float = 5.0):
        from collections import deque

        self.infer_fn = infer_fn
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self.queue: "queue.Queue" = queue.Queue()
        self.stats = {
            "requests": 0, "batches": 0, "batch_size_sum": 0,
            "errors": 0, "latency_ewma_ms": 0.0,
        }
        self._latencies = deque(maxlen=self.LATENCY_WINDOW)
        self._inflight = 0
        self._lock = threading.Lock()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def snapshot(self) -> Dict[str, Any]:
        """Point-in-time stats incl. p50/p95 over the recent window and
        live queue/in-flight gauges (served by /stats and /metrics)."""
        with self._lock:
            s = dict(self.stats)
            lat = list(self._latencies)
            inflight = self._inflight
        s["mean_batch"] = (
            s["batch_size_sum"] / s["batches"] if s["batches"] else 0
        )
        if lat:
            s["latency_p50_ms"] = round(float(np.percentile(lat, 50)), 2)
            s["latency_p95_ms"] = round(float(np.percentile(lat, 95)), 2)
        else:
            s["latency_p50_ms"] = s["latency_p95_ms"] = 0.0
        s["queue_depth"] = self.queue.qsize()
        s["inflight"] = inflight
        return s

    def submit(self, image: np.ndarray, mask: np.ndarray) -> np.ndarray:
        """Blocking single-item inference through the batcher."""
        event = threading.Event()
        slot: Dict[str, Any] = {}
        t0 = time.perf_counter()
        with self._lock:
            self._inflight += 1
        self.queue.put((image, mask, event, slot))
        event.wait()
        with self._lock:
            self._inflight -= 1
            self.stats["requests"] += 1
            if "error" in slot:
                self.stats["errors"] += 1
            dt = (time.perf_counter() - t0) * 1000.0
            self._latencies.append(dt)
            ewma = self.stats["latency_ewma_ms"]
            self.stats["latency_ewma_ms"] = 0.9 * ewma + 0.1 * dt if ewma else dt
        if "error" in slot:
            raise RuntimeError(slot["error"])
        return slot["output"]

    def _loop(self) -> None:
        while True:
            first = self.queue.get()
            batch = [first]
            deadline = time.perf_counter() + self.max_wait
            while len(batch) < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    batch.append(self.queue.get(timeout=remaining))
                except queue.Empty:
                    break
            images = np.stack([b[0] for b in batch])
            masks = np.stack([b[1] for b in batch])
            try:
                outputs = self.infer_fn(images, masks)
                for i, (_, _, event, slot) in enumerate(batch):
                    slot["output"] = outputs[i]
                    event.set()
            except Exception as e:  # propagate per request
                logger.exception("batch inference failed")
                for _, _, event, slot in batch:
                    slot["error"] = str(e)
                    event.set()
            with self._lock:
                self.stats["batches"] += 1
                self.stats["batch_size_sum"] += len(batch)


class InpaintService:
    """Model + batcher + HTTP plumbing."""

    def __init__(
        self,
        checkpoint: Optional[str] = None,
        size: int = 512,
        out_size: int = 500,
        max_batch: int = 16,
        bf16: bool = True,
        base_width: int = 64,
        quant: Optional[str] = None,
        calib_dir: Optional[str] = None,
        exported: Optional[str] = None,
    ):
        import jax
        import jax.numpy as jnp

        from ..models import PConvUNet
        from ..utils.jax_setup import enable_persistent_cache

        enable_persistent_cache()
        self.size = size
        self.out_size = out_size
        self.exported_path = exported
        if exported is not None:
            # hermetic deployment path: the artifact carries weights,
            # lowering platform(s), and any baked w8a8 quantization —
            # no checkpoint, model code, or calibration applies here
            if quant is not None:
                raise ValueError(
                    "--quant cannot combine with --exported: "
                    "quantization is baked at export time "
                    "(serving/export.py)"
                )
            self.generator = None
            self.variables = None
            self._fwd = self._make_fwd_exported(exported)
        else:
            cd = jnp.bfloat16 if bf16 else None
            self.generator = PConvUNet(
                base_width=base_width, compute_dtype=cd,
                precision=None if bf16 else "highest",
            )
            if checkpoint and Path(checkpoint).exists():
                from ..evaluation.inference import load_generator_variables

                self.variables = load_generator_variables(checkpoint)
                logger.info("serving checkpoint %s", checkpoint)
            else:
                logger.warning("no checkpoint; serving random weights")
                self.variables = jax.jit(
                    self.generator.init, static_argnums=3
                )(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, size, size, 1)),
                    jnp.ones((1, size, size, 1)),
                    False,
                )
            self._fwd = self._make_fwd(self.generator)
        # w8a8 eval quantization: activation scales need REAL terrain
        # data (random warmup data would misdo the ranges). Preferred:
        # --calib-dir with sample tile/mask pairs, so the scales are
        # fixed HERE and warmup() compiles the final quantized forward
        # for every bucket before traffic arrives. Fallback: calibrate
        # lazily on the first request batch, then immediately re-warm
        # all buckets (one consolidated stall on that first request
        # instead of a fresh compile stalling each bucket's first hit).
        # Either way the rebuilt forward is a fresh jit — swapping
        # self.generator under the old jit would keep serving the
        # already-compiled bf16 executable for seen shapes.
        self._quant = quant
        self._quant_done = quant is None
        # warm the compile cache for every batch size bucket we emit
        self._buckets = sorted({1, max(1, max_batch // 4), max_batch})
        if exported is not None and self._exported_static_batch:
            # the artifact compiled for exactly one batch size: every
            # request pads to it (and the micro-batcher never exceeds
            # it) instead of crashing warmup with an opaque StableHLO
            # shape-refinement error on bucket 1
            b = self._exported_static_batch
            logger.info(
                "exported artifact has static batch %d: serving with "
                "the single bucket [%d] (requested max_batch %d)",
                b, b, max_batch,
            )
            self._buckets = [b]
            max_batch = b
        if quant is not None and calib_dir:
            if not self._calibrate_from_dir(calib_dir):
                logger.warning(
                    "no usable tile/mask pairs in --calib-dir %s; "
                    "falling back to first-request calibration",
                    calib_dir,
                )
        self.batcher = MicroBatcher(self._infer, max_batch=max_batch)

    def _make_fwd(self, model):
        import jax
        import jax.numpy as jnp

        def _forward(v, xm_u8):
            # one stacked uint8 upload per batch (image ch0, 0/1 mask
            # ch1): 1 byte/px/plane instead of two separate f32
            # transfers — each host->device transfer pays a relay
            # round trip here, and uint8 is 4x less on the wire.
            # u8/255 in f32 is bit-identical to the former host-side
            # np.float32(asarray(img))/255.
            x = xm_u8[..., 0:1].astype(jnp.float32) / 255.0
            m = xm_u8[..., 1:2].astype(jnp.float32)
            out = model.apply(v, x * m, m, False)
            # PNG uint8 quantization on device: the host fetches
            # 1 byte/px instead of 4 (bit-identical to the host
            # conversion; same trick as parallel/infer.py)
            return (jnp.clip(out, 0.0, 1.0) * 255.0).astype(jnp.uint8)

        return jax.jit(_forward)

    def _make_fwd_exported(self, path: str):
        """Same (variables, stacked-uint8) signature as _make_fwd, but
        the model forward is the serialized StableHLO artifact — the
        uint8 wire codecs wrap it inside one jit."""
        import jax
        import jax.numpy as jnp

        from .export import load_exported

        call = load_exported(path)
        meta = call.meta
        if meta.get("size") not in (None, self.size):
            logger.info(
                "artifact tile size %s overrides --size %d",
                meta["size"], self.size,
            )
            self.size = int(meta["size"])
        # a --static-batch artifact accepts exactly ONE batch size; the
        # caller pins the bucket set to it (a symbolic-batch artifact
        # has a leading dim like "b" here and serves every bucket)
        self._exported_static_batch = None
        avals = meta.get("in_avals") or []
        if avals:
            dim0 = avals[0].split("[", 1)[-1].split(",", 1)[0].strip()
            if dim0.isdigit():
                self._exported_static_batch = int(dim0)
        logger.info(
            "serving exported artifact %s (platforms=%s quant=%s)",
            path, meta.get("platforms"), meta.get("quant"),
        )

        def _forward(_v, xm_u8):
            x = xm_u8[..., 0:1].astype(jnp.float32) / 255.0
            m = xm_u8[..., 1:2].astype(jnp.float32)
            out = call(x, m)
            return (jnp.clip(out, 0.0, 1.0) * 255.0).astype(jnp.uint8)

        return jax.jit(_forward)

    def _apply_quant_scales(self, x: np.ndarray, m: np.ndarray) -> None:
        """Freeze w8a8 activation scales from (x, m) float batches and
        rebuild the jitted forward against the quantized model."""
        from ..ops.quant import calibrate_quant_scales, quantized_clone

        scales = calibrate_quant_scales(
            self.generator, self.variables, [(x * m, m)]
        )
        self.generator = quantized_clone(self.generator, self._quant, scales)
        self._fwd = self._make_fwd(self.generator)
        self._quant_done = True

    def _calibrate_from_dir(self, calib_dir: str) -> bool:
        """Startup calibration from sample tiles: <stem>.png paired with
        <stem>_mask_resized.png (the pipeline's split layout), either
        flat in calib_dir or under calib_dir/{images,masks} — the same
        loader the export CLI's --quant uses."""
        from ..evaluation.inference import load_calibration_tiles

        tiles = load_calibration_tiles(calib_dir, self.size)
        if tiles is None:
            return False
        x, m = tiles
        self._apply_quant_scales(x, m)
        logger.info(
            "w8a8 activation scales calibrated at startup from %d "
            "tiles in %s", x.shape[0], calib_dir,
        )
        return True

    def _calibrate_quant(self, images: np.ndarray, masks: np.ndarray):
        self._apply_quant_scales(
            images.astype(np.float32) / 255.0, masks.astype(np.float32)
        )
        logger.info(
            "w8a8 activation scales calibrated on first batch (%d "
            "tiles); re-warming batch buckets %s against the quantized "
            "forward (one-time; prefer --calib-dir to move this cost "
            "to startup)", images.shape[0], self._buckets,
        )
        # without this, every bucket's FIRST quantized hit would stall a
        # live request on a fresh compile (minutes through this
        # environment's remote-compile relay)
        self._warm_buckets()

    def _warm_buckets(self) -> None:
        import jax.numpy as jnp

        for b in self._buckets:
            xm = jnp.zeros((b, self.size, self.size, 2), jnp.uint8)
            xm = xm.at[..., 1].set(1)
            float(self._fwd(self.variables, xm).sum())

    def warmup(self) -> None:
        if self._quant is not None and not self._quant_done:
            logger.warning(
                "warmup with --quant but no --calib-dir: compiling the "
                "bf16 forward only; the first request pays calibration "
                "plus the quantized recompile of all buckets"
            )
        self._warm_buckets()
        logger.info("warmed batch buckets %s", self._buckets)

    def _bucket(self, n: int) -> int:
        for b in self._buckets:
            if n <= b:
                return b
        return self._buckets[-1]

    def _infer(self, images: np.ndarray, masks: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        if not self._quant_done:
            # single-threaded here (MicroBatcher's loop is the only
            # caller), so the lazy swap needs no locking
            self._calibrate_quant(images, masks)
        n = images.shape[0]
        b = self._bucket(n)
        xm = np.concatenate([images, masks], axis=-1)  # (n,H,W,2) uint8
        if n < b:  # pad to a warmed bucket (static shapes under jit)
            xm = np.concatenate(
                [xm, np.repeat(xm[-1:], b - n, axis=0)]
            )
        out = np.asarray(self._fwd(self.variables, jnp.asarray(xm)))
        return out[:n]

    # -- codecs -------------------------------------------------------------
    def decode_pair(self, item: Dict) -> Tuple[np.ndarray, np.ndarray]:
        from PIL import Image as PILImage

        if not isinstance(item, dict):
            raise BadRequestError("each item must be a JSON object")

        def decode(field: str, resample) -> np.ndarray:
            b64 = item[field]  # KeyError -> 400 "missing field"
            if not isinstance(b64, str):
                raise BadRequestError(f"{field} must be a base64 string")
            try:
                raw = base64.b64decode(b64, validate=True)
            except Exception as e:
                raise BadRequestError(f"undecodable {field}: {e}") from e
            img = None
            try:
                # native gray8 fast path (~1.6x PIL); None -> other
                # formats/bit depths, handled by PIL below
                from ..utils.native import png_decode_gray8

                u8 = png_decode_gray8(raw)
                if u8 is not None:
                    img = PILImage.fromarray(u8, "L")
            except Exception:
                img = None
            if img is None:
                try:
                    img = PILImage.open(io.BytesIO(raw)).convert("L")
                except Exception as e:
                    raise BadRequestError(f"undecodable {field}: {e}") from e
            if img.size != (self.size, self.size):
                img = img.resize((self.size, self.size), resample)
            return np.asarray(img, np.uint8)[..., None]

        # uint8 planes; the device does /255 and the 0/1 mask is
        # already binary — one stacked 1-byte/px/plane upload
        image = decode("image", PILImage.BILINEAR)
        mask = (decode("mask", PILImage.BILINEAR) > 0).astype(np.uint8)
        return image, mask

    def encode_output(self, array01: np.ndarray) -> str:
        from PIL import Image

        if array01.dtype == np.uint8:
            u8 = array01[..., 0]  # device-quantized
        else:
            u8 = (np.clip(array01[..., 0], 0, 1) * 255).astype(np.uint8)
        if self.out_size and u8.shape != (self.out_size, self.out_size):
            u8 = np.asarray(
                Image.fromarray(u8).resize(
                    (self.out_size, self.out_size), Image.BILINEAR
                )
            )
        from ..utils.native import png_encode_gray8

        data = png_encode_gray8(u8)  # ~6x faster than PIL, lossless
        if data is None:
            buf = io.BytesIO()
            Image.fromarray(u8).save(buf, format="PNG")
            data = buf.getvalue()
        return base64.b64encode(data).decode()


def make_server(
    service: InpaintService,
    host: str,
    port: int,
    auth_secret: Optional[str] = None,
    max_body_bytes: int = 32 * 1024 * 1024,
    max_batch_items: int = 64,
):
    class Handler(BaseHTTPRequestHandler):
        # headers and the ~340 KB base64 body go out as separate
        # writes; with Nagle on, the kernel holds the second write for
        # the peer's delayed ACK (~40 ms of the measured p50)
        disable_nagle_algorithm = True

        def log_message(self, *args):
            pass

        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _authorized(self) -> bool:
            """Bearer-JWT check, portal-parity semantics (HS256, 401 on
            any missing/malformed/expired token). /healthz stays open
            for liveness probes."""
            if auth_secret is None:
                return True
            from ..portal import jwt_auth

            header = self.headers.get("Authorization", "")
            if not header.startswith("Bearer "):
                self._json({"error": "missing bearer token"}, 401)
                return False
            try:
                jwt_auth.decode(header[len("Bearer "):].strip(), auth_secret)
            except jwt_auth.InvalidTokenError as e:
                self._json({"error": f"invalid token: {e}"}, 401)
                return False
            return True

        def do_GET(self):
            if self.path == "/healthz":
                import jax

                return self._json({
                    "status": "ok",
                    "devices": [str(d) for d in jax.devices()],
                    "model_size": service.size,
                    "auth": auth_secret is not None,
                    "exported": service.exported_path,
                })
            if not self._authorized():
                return
            if self.path == "/stats":
                return self._json(service.batcher.snapshot())
            if self.path == "/metrics":
                # Prometheus/OpenMetrics text exposition of the same
                # snapshot — no client library needed for the format
                s = service.batcher.snapshot()
                lines = []
                for name, kind, value in (
                    ("requests_total", "counter", s["requests"]),
                    ("errors_total", "counter", s["errors"]),
                    ("batches_total", "counter", s["batches"]),
                    ("batch_size_mean", "gauge", s["mean_batch"]),
                    ("latency_p50_ms", "gauge", s["latency_p50_ms"]),
                    ("latency_p95_ms", "gauge", s["latency_p95_ms"]),
                    ("latency_ewma_ms", "gauge", s["latency_ewma_ms"]),
                    ("queue_depth", "gauge", s["queue_depth"]),
                    ("inflight_requests", "gauge", s["inflight"]),
                ):
                    metric = f"terra_gan_tpu_{name}"
                    lines.append(f"# TYPE {metric} {kind}")
                    lines.append(f"{metric} {value}")
                body = ("\n".join(lines) + "\n").encode()
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            self._json({"error": "not found"}, 404)

        def do_POST(self):
            if not self._authorized():
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
            except (TypeError, ValueError):
                return self._json({"error": "bad content-length"}, 400)
            if length > max_body_bytes:
                return self._json(
                    {"error": f"body exceeds {max_body_bytes} bytes"}, 413
                )
            if length <= 0:
                return self._json({"error": "empty body"}, 400)
            try:
                payload = json.loads(self.rfile.read(length))
            except (json.JSONDecodeError, UnicodeDecodeError):
                return self._json({"error": "bad json"}, 400)
            if not isinstance(payload, dict):
                return self._json({"error": "body must be a JSON object"}, 400)
            try:
                if self.path == "/inpaint":
                    image, mask = service.decode_pair(payload)
                    out = service.batcher.submit(image, mask)
                    return self._json(
                        {"inpainted": service.encode_output(out)}
                    )
                if self.path == "/inpaint_batch":
                    items = payload.get("items", [])
                    if not isinstance(items, list):
                        return self._json({"error": "items must be a list"}, 400)
                    if len(items) > max_batch_items:
                        return self._json(
                            {"error": f"at most {max_batch_items} items"}, 400
                        )
                    results = []
                    for item in items:
                        image, mask = service.decode_pair(item)
                        out = service.batcher.submit(image, mask)
                        results.append(service.encode_output(out))
                    return self._json({"inpainted": results})
            except KeyError as e:
                return self._json({"error": f"missing field {e}"}, 400)
            except BadRequestError as e:
                return self._json({"error": str(e)}, 400)
            except Exception as e:
                logger.exception("request failed")
                return self._json({"error": str(e)}, 500)
            self._json({"error": "not found"}, 404)

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="Inpainting inference service")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8500)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--out-size", type=int, default=500)
    p.add_argument("--max-batch", type=int, default=16)
    p.add_argument("--base-width", type=int, default=64)
    p.add_argument("--fp32", action="store_true",
                   help="exact fp32 mode (default bf16 perf mode)")
    p.add_argument("--quant", choices=["w8a8", "w8a8_resident"], default=None,
                   help="int8 MXU eval mode (measured 1.18x at 512^2, "
                        "hole-PSNR parity); calibrates from --calib-dir "
                        "at startup, else on the first request batch")
    p.add_argument("--calib-dir", default=None,
                   help="directory of sample tiles (<stem>.png + "
                        "<stem>_mask_resized.png, flat or images/+masks/) "
                        "for startup w8a8 calibration, so warmup compiles "
                        "the final quantized forward before traffic")
    p.add_argument("--auth-secret", default=None,
                   help="HS256 JWT secret; defaults to the "
                        "TERRA_GAN_TPU_SERVING_SECRET env var. Unset = "
                        "open server (logged loudly).")
    p.add_argument("--max-body-mb", type=int, default=32)
    p.add_argument("--exported", default=None,
                   help="serve a serialized StableHLO artifact "
                        "(scripts/export_model.py) instead of a "
                        "checkpoint; weights/quant are baked in")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    import os

    secret = args.auth_secret or os.environ.get(
        "TERRA_GAN_TPU_SERVING_SECRET"
    )
    if not secret:
        logger.warning(
            "serving WITHOUT auth — set --auth-secret or "
            "TERRA_GAN_TPU_SERVING_SECRET for production"
        )
    service = InpaintService(
        checkpoint=args.checkpoint, size=args.size, out_size=args.out_size,
        max_batch=args.max_batch, bf16=not args.fp32,
        base_width=args.base_width, quant=args.quant,
        calib_dir=args.calib_dir, exported=args.exported,
    )
    service.warmup()
    server = make_server(
        service, args.host, args.port, auth_secret=secret,
        max_body_bytes=args.max_body_mb * 1024 * 1024,
    )
    logger.info("serving on %s:%d", args.host, args.port)

    # graceful drain: SIGTERM/SIGINT stop accepting new connections and
    # let in-flight requests finish (ThreadingHTTPServer joins its
    # non-daemon handler threads on server_close). A second signal
    # falls through to the default handler (hard exit).
    import signal
    import threading

    def _drain(signum, frame):
        logger.info(
            "signal %d: draining — no new connections, in-flight "
            "requests finish", signum,
        )
        signal.signal(signum, signal.SIG_DFL)
        # shutdown() blocks until serve_forever returns; it must run
        # off the serving thread
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _drain)
    signal.signal(signal.SIGINT, _drain)
    server.daemon_threads = False
    server.serve_forever()
    server.server_close()  # joins in-flight handler threads
    logger.info("drained; exiting")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
