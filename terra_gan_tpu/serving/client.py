"""Python client for the inpainting service (serving/server.py).

The reference has HTTP clients only for the annotation portal
(utils/api/portal_client.py:11-351); its inference is local-only.
This client completes the serving deployment story: applications talk
to a remote TPU inpainting service through numpy arrays (or files)
without knowing the wire format.

  * dependency-free (urllib + the package's own HS256 JWT helper)
  * retries with jittered exponential backoff on connection errors
    and 5xx/429 — the same discipline as the portal tools
    (portal/pythonanywhere.py bulk download; reference semantics:
    utils/api/portal_client.py:28-36 retrying Session)
  * auth: pass a pre-signed bearer token, or a shared secret and the
    client signs short-lived tokens itself (portal/jwt_auth.py)
  * PNG wire codec through the native gray8 encoder when available

Also a CLI — the remote analogue of `inpaint_directory` for hosts
without a TPU:

  python -m terra_gan_tpu.serving.client --url http://tpu-host:8500 \
      --images dir/ --masks dir/ --out out/ [--secret ...]
"""

from __future__ import annotations

import base64
import io
import json
import logging
import random
import time
import urllib.error
import urllib.request
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

# statuses worth retrying: transient server states, never client errors
_RETRY_STATUSES = {429, 500, 502, 503, 504}


class ServingError(RuntimeError):
    """Request failed after retries (terminal server/connection error)."""


class InpaintClient:
    """Typed client over the serving HTTP API."""

    def __init__(
        self,
        base_url: str,
        token: Optional[str] = None,
        auth_secret: Optional[str] = None,
        token_ttl_s: float = 300.0,
        timeout: float = 120.0,
        max_retries: int = 4,
        backoff_s: float = 0.5,
    ):
        self.base_url = base_url.rstrip("/")
        self._token = token
        self._secret = auth_secret
        self._token_ttl = token_ttl_s
        self._token_exp = 0.0
        self.timeout = timeout
        self.max_retries = max_retries
        self.backoff_s = backoff_s

    # -- auth ---------------------------------------------------------------
    def _bearer(self) -> Optional[str]:
        if self._token is not None:
            return self._token
        if self._secret is None:
            return None
        now = time.time()
        if now >= self._token_exp - 30.0:  # refresh with 30 s margin
            from ..portal import jwt_auth

            self._signed = jwt_auth.encode(
                {"sub": "inpaint-client"}, self._secret,
                expires_in=self._token_ttl,
            )
            self._token_exp = now + self._token_ttl
        return self._signed

    # -- transport ----------------------------------------------------------
    def _request(self, path: str, payload: Optional[Dict] = None) -> Dict:
        url = f"{self.base_url}{path}"
        data = json.dumps(payload).encode() if payload is not None else None
        last: Optional[Exception] = None
        for attempt in range(self.max_retries + 1):
            headers = {"Content-Type": "application/json"}
            bearer = self._bearer()
            if bearer:
                headers["Authorization"] = f"Bearer {bearer}"
            req = urllib.request.Request(url, data=data, headers=headers)
            try:
                with urllib.request.urlopen(req, timeout=self.timeout) as r:
                    return json.loads(r.read())
            except urllib.error.HTTPError as e:
                if e.code not in _RETRY_STATUSES:
                    # 4xx: surface the server's error message verbatim
                    try:
                        detail = json.loads(e.read()).get("error", "")
                    except Exception:
                        detail = ""
                    raise ServingError(
                        f"{path} -> HTTP {e.code}: {detail or e.reason}"
                    ) from e
                last = e
            except (urllib.error.URLError, ConnectionError, TimeoutError) as e:
                last = e
            if attempt < self.max_retries:
                # jittered exponential backoff (portal discipline)
                delay = self.backoff_s * (2**attempt) * (0.5 + random.random())
                logger.warning(
                    "retry %d/%d for %s in %.1fs (%s)",
                    attempt + 1, self.max_retries, path, delay, last,
                )
                time.sleep(delay)
        raise ServingError(
            f"{path} failed after {self.max_retries + 1} attempts: {last}"
        ) from last

    # -- codecs -------------------------------------------------------------
    @staticmethod
    def _encode_png(array: np.ndarray) -> str:
        u8 = np.asarray(array)
        if u8.ndim == 3:
            u8 = u8[..., 0]
        if u8.dtype != np.uint8:
            u8 = (np.clip(u8, 0.0, 1.0) * 255).astype(np.uint8)
        data = None
        try:
            from ..utils.native import png_encode_gray8

            data = png_encode_gray8(np.ascontiguousarray(u8))
        except Exception:  # pragma: no cover - native unavailable
            data = None
        if data is None:
            from PIL import Image

            buf = io.BytesIO()
            Image.fromarray(u8).save(buf, format="PNG")
            data = buf.getvalue()
        return base64.b64encode(data).decode()

    @staticmethod
    def _decode_png(b64: str) -> np.ndarray:
        raw = base64.b64decode(b64)
        try:
            from ..utils.native import png_decode_gray8

            u8 = png_decode_gray8(raw)
            if u8 is not None:
                return u8
        except Exception:  # pragma: no cover
            pass
        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(raw)).convert("L"), np.uint8)

    # -- API ----------------------------------------------------------------
    def healthz(self) -> Dict:
        return self._request("/healthz")

    def stats(self) -> Dict:
        return self._request("/stats")

    def inpaint(self, image: np.ndarray, mask: np.ndarray) -> np.ndarray:
        """One (H,W[,1]) grayscale tile + 0/255 (or 0/1) mask ->
        inpainted uint8 (H,W) at the server's output contract."""
        out = self._request("/inpaint", {
            "image": self._encode_png(image),
            "mask": self._encode_png(self._as_mask_u8(mask)),
        })
        return self._decode_png(out["inpainted"])

    def inpaint_batch(
        self, pairs: Sequence[Tuple[np.ndarray, np.ndarray]]
    ) -> List[np.ndarray]:
        out = self._request("/inpaint_batch", {"items": [
            {"image": self._encode_png(img),
             "mask": self._encode_png(self._as_mask_u8(m))}
            for img, m in pairs
        ]})
        return [self._decode_png(b) for b in out["inpainted"]]

    @staticmethod
    def _as_mask_u8(mask: np.ndarray) -> np.ndarray:
        m = np.asarray(mask)
        if m.ndim == 3:
            m = m[..., 0]
        return (m > 0).astype(np.uint8) * 255

    def inpaint_files(
        self,
        image_path: str | Path,
        mask_path: str | Path,
        out_path: str | Path,
    ) -> Path:
        from ..utils.images import open_gray

        img = np.asarray(open_gray(image_path), np.uint8)
        mask = np.asarray(open_gray(mask_path), np.uint8)
        out = self.inpaint(img, mask)
        out_path = Path(out_path)
        out_path.parent.mkdir(parents=True, exist_ok=True)
        data = None
        try:
            from ..utils.native import png_encode_gray8

            data = png_encode_gray8(np.ascontiguousarray(out))
        except Exception:  # pragma: no cover
            data = None
        if data is None:
            from PIL import Image

            buf = io.BytesIO()
            Image.fromarray(out).save(buf, format="PNG")
            data = buf.getvalue()
        out_path.write_bytes(data)
        return out_path


def main(argv=None) -> int:
    """Remote batch inpainting: the reference's evaluate loop
    (main_pipeline.py:497-539) pointed at a serving endpoint instead of
    a local model — for hosts without an accelerator."""
    import argparse
    import os

    from ..evaluation.inference import iter_tile_pairs

    p = argparse.ArgumentParser(
        description="Remote inpainting via a terra-gan-tpu-serve endpoint"
    )
    p.add_argument("--url", required=True)
    p.add_argument("--images", required=True)
    p.add_argument("--masks", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=8,
                   help="tiles per /inpaint_batch request")
    p.add_argument("--secret", default=None,
                   help="HS256 secret (or TERRA_GAN_TPU_SERVING_SECRET) "
                        "to sign bearer tokens")
    p.add_argument("--token", default=None, help="pre-signed bearer token")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    client = InpaintClient(
        args.url, token=args.token,
        auth_secret=args.secret
        or os.environ.get("TERRA_GAN_TPU_SERVING_SECRET"),
    )
    health = client.healthz()
    logger.info("server ok: %s", health)

    from ..utils.images import open_gray

    pairs = [
        (img, m) for img, m in iter_tile_pairs(args.images, args.masks)
        if m is not None
    ]
    if not pairs:
        logger.error("no tile/mask pairs under %s", args.images)
        return 1
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    t0 = time.perf_counter()
    done = 0
    for s in range(0, len(pairs), args.batch):
        chunk = pairs[s : s + args.batch]
        arrays = [
            (np.asarray(open_gray(i), np.uint8),
             np.asarray(open_gray(m), np.uint8))
            for i, m in chunk
        ]
        outs = client.inpaint_batch(arrays)
        for (img_path, _), out in zip(chunk, outs):
            target = out_dir / f"{Path(img_path).stem}_inpainted.png"
            from PIL import Image

            Image.fromarray(out).save(target)
            done += 1
    dt = time.perf_counter() - t0
    logger.info("%d tiles in %.1fs (%.1f tiles/s)", done, dt, done / dt)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
