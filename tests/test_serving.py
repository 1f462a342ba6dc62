"""Serving layer: micro-batcher coalescing + live HTTP service."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from terra_gan_tpu.serving import InpaintService, MicroBatcher, make_server


class TestMicroBatcher:
    def test_coalesces_concurrent_requests(self):
        seen_batches = []

        def infer(images, masks):
            seen_batches.append(images.shape[0])
            return images * 0.5

        mb = MicroBatcher(infer, max_batch=8, max_wait_ms=50)
        results = [None] * 6

        def worker(i):
            results[i] = mb.submit(
                np.full((4, 4, 1), float(i), np.float32),
                np.ones((4, 4, 1), np.float32),
            )

        threads = [
            threading.Thread(target=worker, args=(i,)) for i in range(6)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, r in enumerate(results):
            assert float(r[0, 0, 0]) == i * 0.5
        # at least some coalescing happened
        assert max(seen_batches) > 1
        assert mb.stats["requests"] == 6

    def test_error_propagates(self):
        def infer(images, masks):
            raise ValueError("boom")

        mb = MicroBatcher(infer, max_batch=2, max_wait_ms=1)
        with pytest.raises(RuntimeError, match="boom"):
            mb.submit(np.zeros((2, 2, 1), np.float32),
                      np.ones((2, 2, 1), np.float32))


def png_b64(arr_u8: np.ndarray) -> str:
    buf = io.BytesIO()
    Image.fromarray(arr_u8).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


class TestHTTPService:
    @pytest.fixture(scope="class")
    def server(self):
        service = InpaintService(
            size=64, out_size=64, max_batch=4, bf16=False, base_width=8
        )
        service.warmup()
        srv = make_server(service, "127.0.0.1", 0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        yield f"http://127.0.0.1:{srv.server_port}"
        srv.shutdown()

    def _post(self, url, payload):
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())

    def test_healthz_and_inpaint(self, server):
        with urllib.request.urlopen(f"{server}/healthz") as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok"

        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (64, 64), dtype=np.uint8)
        mask = (rng.random((64, 64)) > 0.3).astype(np.uint8) * 255
        out = self._post(
            f"{server}/inpaint",
            {"image": png_b64(img), "mask": png_b64(mask)},
        )
        result = Image.open(
            io.BytesIO(base64.b64decode(out["inpainted"]))
        )
        assert result.size == (64, 64)
        # preserved pixels survive the round trip (composite contract);
        # uint8 quantization allows off-by-one
        got = np.asarray(result, np.int32)
        keep = mask > 0
        assert np.abs(got[keep] - img[keep].astype(np.int32)).max() <= 1

        stats = json.loads(
            urllib.request.urlopen(f"{server}/stats").read()
        )
        assert stats["requests"] >= 1

    def test_batch_endpoint_and_bad_input(self, server):
        rng = np.random.default_rng(1)
        items = []
        for _ in range(3):
            img = rng.integers(0, 255, (64, 64), dtype=np.uint8)
            mask = (rng.random((64, 64)) > 0.3).astype(np.uint8) * 255
            items.append({"image": png_b64(img), "mask": png_b64(mask)})
        out = self._post(f"{server}/inpaint_batch", {"items": items})
        assert len(out["inpainted"]) == 3

        # probe: missing field -> 400 with named field
        req = urllib.request.Request(
            f"{server}/inpaint",
            data=json.dumps({"image": items[0]["image"]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "mask" in json.loads(e.read())["error"]
