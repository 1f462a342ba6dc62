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
        # observability snapshot: percentiles over the recent window,
        # live gauges, error counter
        assert stats["latency_p50_ms"] > 0
        assert stats["latency_p95_ms"] >= stats["latency_p50_ms"]
        assert stats["errors"] == 0
        assert stats["queue_depth"] == 0 and stats["inflight"] == 0

    def test_metrics_prometheus_exposition(self, server):
        with urllib.request.urlopen(f"{server}/metrics") as resp:
            assert resp.headers["Content-Type"].startswith("text/plain")
            text = resp.read().decode()
        assert "# TYPE terra_gan_tpu_requests_total counter" in text
        lines = dict(
            line.split(" ", 1) for line in text.strip().splitlines()
            if not line.startswith("#")
        )
        assert float(lines["terra_gan_tpu_requests_total"]) >= 1
        assert float(lines["terra_gan_tpu_latency_p50_ms"]) > 0
        assert float(lines["terra_gan_tpu_errors_total"]) == 0

    def test_uint8_upload_bit_identical_to_f32_path(self):
        """The stacked-uint8 device upload (r3 serving perf win) must
        produce bit-identical outputs to the former f32 two-array
        path: u8->f32 then /255 under the SAME jit is the same IEEE
        op sequence as uploading host-divided f32 (comparing two
        jitted programs — eager-vs-jit fusion rounding is a separate,
        known ±1)."""
        import jax
        import jax.numpy as jnp

        svc = InpaintService(
            size=32, out_size=32, max_batch=2, bf16=False, base_width=8
        )
        rng = np.random.default_rng(3)
        xi = rng.integers(0, 255, (1, 32, 32, 1), dtype=np.uint8)
        mi = (rng.random((1, 32, 32, 1)) > 0.3).astype(np.uint8)

        @jax.jit
        def fwd_f32(v, x, m):
            out = svc.generator.apply(v, x * m, m, False)
            return (jnp.clip(out, 0.0, 1.0) * 255.0).astype(jnp.uint8)

        want = np.asarray(fwd_f32(
            svc.variables,
            jnp.asarray(xi.astype(np.float32) / 255.0),
            jnp.asarray(mi.astype(np.float32)),
        ))
        got = svc._infer(xi, mi)
        np.testing.assert_array_equal(got, want)

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


SECRET = "serving-test-secret"


class TestServingAuthAndHardening:
    """Bearer-JWT auth (portal parity: Annotation_Portal_Code/app.py:38-55
    — 401 on missing/invalid/expired token) + request-size limits and
    malformed-input handling (round-2 verdict weakness #7)."""

    @pytest.fixture(scope="class")
    def server(self):
        service = InpaintService(
            size=64, out_size=64, max_batch=4, bf16=False, base_width=8
        )
        service.warmup()
        srv = make_server(
            service, "127.0.0.1", 0, auth_secret=SECRET,
            max_body_bytes=256 * 1024, max_batch_items=4,
        )
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        yield f"http://127.0.0.1:{srv.server_port}"
        srv.shutdown()

    def _request(self, url, payload=None, token=None, raw_body=None):
        headers = {"Content-Type": "application/json"}
        if token is not None:
            headers["Authorization"] = f"Bearer {token}"
        data = raw_body
        if data is None and payload is not None:
            data = json.dumps(payload).encode()
        req = urllib.request.Request(url, data=data, headers=headers)
        try:
            with urllib.request.urlopen(req) as resp:
                return resp.status, json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    def _token(self, **kwargs):
        from terra_gan_tpu.portal import jwt_auth

        return jwt_auth.encode({"sub": "tester"}, SECRET, **kwargs)

    def _pair(self):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 255, (64, 64), dtype=np.uint8)
        mask = (rng.random((64, 64)) > 0.3).astype(np.uint8) * 255
        return {"image": png_b64(img), "mask": png_b64(mask)}

    def test_healthz_open_without_token(self, server):
        with urllib.request.urlopen(f"{server}/healthz") as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok" and health["auth"] is True

    def test_missing_token_401(self, server):
        code, body = self._request(f"{server}/inpaint", self._pair())
        assert code == 401 and "token" in body["error"]

    def test_metrics_requires_token(self, server):
        code, _ = self._request(f"{server}/metrics")
        assert code == 401

    def test_stats_requires_token(self, server):
        code, _ = self._request(f"{server}/stats")
        assert code == 401
        token = self._token()
        req = urllib.request.Request(
            f"{server}/stats", headers={"Authorization": f"Bearer {token}"}
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 200

    def test_tampered_token_401(self, server):
        token = self._token()
        bad = token[:-2] + ("AA" if not token.endswith("AA") else "BB")
        code, body = self._request(f"{server}/inpaint", self._pair(), token=bad)
        assert code == 401 and "invalid token" in body["error"]

    def test_expired_token_401(self, server):
        token = self._token(expires_in=-10)
        code, body = self._request(
            f"{server}/inpaint", self._pair(), token=token
        )
        assert code == 401 and "expired" in body["error"]

    def test_valid_token_inpaints(self, server):
        code, body = self._request(
            f"{server}/inpaint", self._pair(), token=self._token()
        )
        assert code == 200 and "inpainted" in body

    def test_oversized_body_413(self, server):
        big = b'{"image": "' + b"A" * (300 * 1024) + b'"}'
        code, body = self._request(
            f"{server}/inpaint", raw_body=big, token=self._token()
        )
        assert code == 413 and "exceeds" in body["error"]

    def test_bad_json_400(self, server):
        code, body = self._request(
            f"{server}/inpaint", raw_body=b"{not json", token=self._token()
        )
        assert code == 400 and body["error"] == "bad json"

    def test_non_object_body_400(self, server):
        code, body = self._request(
            f"{server}/inpaint", raw_body=b"[1,2,3]", token=self._token()
        )
        assert code == 400 and "object" in body["error"]

    def test_undecodable_image_400(self, server):
        payload = {"image": png_b64(np.zeros((64, 64), np.uint8)),
                   "mask": base64.b64encode(b"not a png").decode()}
        code, body = self._request(
            f"{server}/inpaint", payload, token=self._token()
        )
        assert code == 400 and "undecodable mask" in body["error"]

    def test_wrong_type_image_400(self, server):
        payload = {"image": 12345, "mask": png_b64(np.zeros((64, 64), np.uint8))}
        code, body = self._request(
            f"{server}/inpaint", payload, token=self._token()
        )
        assert code == 400 and "base64" in body["error"]

    def test_batch_items_not_list_400(self, server):
        code, body = self._request(
            f"{server}/inpaint_batch", {"items": "nope"}, token=self._token()
        )
        assert code == 400 and "list" in body["error"]

    def test_batch_items_capped_400(self, server):
        items = [self._pair()] * 5  # cap configured at 4
        code, body = self._request(
            f"{server}/inpaint_batch", {"items": items}, token=self._token()
        )
        assert code == 400 and "at most" in body["error"]


class TestGracefulDrain:
    def test_shutdown_finishes_inflight_then_refuses(self):
        """Drain semantics (the serving CLI wires SIGTERM/SIGINT to
        exactly this shutdown+close sequence): an in-flight request
        completes with a full 200 response; new connections are refused
        once drained."""
        import time as _time
        import urllib.error

        service = InpaintService(
            size=64, out_size=64, max_batch=4, bf16=False, base_width=8
        )
        service.warmup()
        srv = make_server(service, "127.0.0.1", 0)
        srv.daemon_threads = False  # as the CLI sets before serving
        port = srv.server_port

        orig_submit = service.batcher.submit

        def slow_submit(*a, **k):
            _time.sleep(0.7)  # hold the request in flight past shutdown
            return orig_submit(*a, **k)

        service.batcher.submit = slow_submit
        serve_thread = threading.Thread(target=srv.serve_forever)
        serve_thread.start()

        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (64, 64), dtype=np.uint8)
        mask = (rng.random((64, 64)) > 0.3).astype(np.uint8) * 255
        result = {}

        def call():
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/inpaint",
                data=json.dumps(
                    {"image": png_b64(img), "mask": png_b64(mask)}
                ).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as resp:
                result["status"] = resp.status
                result["body"] = json.loads(resp.read())

        rt = threading.Thread(target=call)
        rt.start()
        _time.sleep(0.25)  # request is inside slow_submit now
        srv.shutdown()       # stop accepting new connections
        serve_thread.join(10)
        srv.server_close()   # joins the in-flight handler thread
        rt.join(10)

        assert result.get("status") == 200
        assert "inpainted" in result["body"]
        # drained server refuses new connections
        with pytest.raises(urllib.error.URLError):
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=2
            )


class TestQuantCalibration:
    """w8a8 serving calibration (review finding: lazy calibration threw
    away every warmup compile and recompiled each bucket inside a live
    request)."""

    def test_startup_calibration_from_dir(self, tmp_path):
        """--calib-dir freezes the activation scales at init, so
        warmup() compiles the FINAL quantized forward and the request
        path never swaps the model."""
        rng = np.random.default_rng(3)
        for i in range(3):
            img = rng.integers(0, 255, (64, 64), dtype=np.uint8)
            mask = (rng.random((64, 64)) > 0.3).astype(np.uint8) * 255
            Image.fromarray(img).save(tmp_path / f"t{i}.png")
            Image.fromarray(mask).save(tmp_path / f"t{i}_mask_resized.png")

        service = InpaintService(
            size=64, out_size=64, max_batch=4, bf16=False, base_width=8,
            quant="w8a8", calib_dir=str(tmp_path),
        )
        assert service._quant_done
        assert service.generator.quant == "w8a8"
        service.warmup()
        fwd_after_warmup = service._fwd

        out = service._infer(
            rng.integers(0, 255, (1, 64, 64, 1), dtype=np.uint8),
            (rng.random((1, 64, 64, 1)) > 0.3).astype(np.uint8),
        )
        # same jitted forward: no in-request rebuild/recompile
        assert service._fwd is fwd_after_warmup
        assert out.shape == (1, 64, 64, 1) and out.dtype == np.uint8

    def test_startup_calibration_split_layout(self, tmp_path):
        """calib_dir may also be a split directory (images/ + masks/)."""
        rng = np.random.default_rng(5)
        (tmp_path / "images").mkdir()
        (tmp_path / "masks").mkdir()
        Image.fromarray(
            rng.integers(0, 255, (64, 64), dtype=np.uint8)
        ).save(tmp_path / "images" / "a.png")
        Image.fromarray(
            (rng.random((64, 64)) > 0.3).astype(np.uint8) * 255
        ).save(tmp_path / "masks" / "a_mask_resized.png")
        service = InpaintService(
            size=64, out_size=64, max_batch=4, bf16=False, base_width=8,
            quant="w8a8", calib_dir=str(tmp_path),
        )
        assert service._quant_done and service.generator.quant == "w8a8"

    def test_lazy_calibration_rewarms_all_buckets(self):
        """Without --calib-dir, the first request calibrates and then
        re-warms EVERY bucket against the quantized forward, so later
        first-hits of other buckets reuse compiled executables."""
        service = InpaintService(
            size=64, out_size=64, max_batch=4, bf16=False, base_width=8,
            quant="w8a8",
        )
        service.warmup()
        assert not service._quant_done

        warms = []
        orig = service._warm_buckets
        service._warm_buckets = lambda: (warms.append(1), orig())[-1]

        rng = np.random.default_rng(4)
        out = service._infer(
            rng.integers(0, 255, (2, 64, 64, 1), dtype=np.uint8),
            (rng.random((2, 64, 64, 1)) > 0.3).astype(np.uint8),
        )
        assert service._quant_done
        assert service.generator.quant == "w8a8"
        assert warms == [1]
        assert out.shape == (2, 64, 64, 1)
        # second request: no further calibration/warm cycles
        service._infer(
            rng.integers(0, 255, (4, 64, 64, 1), dtype=np.uint8),
            (rng.random((4, 64, 64, 1)) > 0.3).astype(np.uint8),
        )
        assert warms == [1]


class TestInpaintClient:
    """Typed HTTP client (serving/client.py): happy path vs a live
    server, auth via self-signed tokens, retry/backoff on transient
    5xx, terminal 4xx surfaced with the server's message."""

    SECRET = "client-test-secret"

    @pytest.fixture(scope="class")
    def server(self):
        service = InpaintService(
            size=64, out_size=64, max_batch=4, bf16=False, base_width=8
        )
        service.warmup()
        srv = make_server(
            service, "127.0.0.1", 0, auth_secret=self.SECRET
        )
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        yield f"http://127.0.0.1:{srv.server_port}"
        srv.shutdown()

    def _pair(self, seed=0, size=64):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 255, (size, size), dtype=np.uint8)
        mask = (rng.random((size, size)) > 0.3).astype(np.uint8) * 255
        return img, mask

    def test_inpaint_roundtrip_with_signed_auth(self, server):
        from terra_gan_tpu.serving import InpaintClient

        client = InpaintClient(server, auth_secret=self.SECRET)
        assert client.healthz()["status"] == "ok"
        img, mask = self._pair()
        out = client.inpaint(img, mask)
        assert out.shape == (64, 64) and out.dtype == np.uint8
        # composite contract: preserved pixels survive (uint8 +-1)
        keep = mask > 0
        assert np.abs(
            out[keep].astype(np.int32) - img[keep].astype(np.int32)
        ).max() <= 1
        stats = client.stats()
        assert stats["requests"] >= 1

    def test_inpaint_batch(self, server):
        from terra_gan_tpu.serving import InpaintClient

        client = InpaintClient(server, auth_secret=self.SECRET)
        pairs = [self._pair(seed=i) for i in range(3)]
        outs = client.inpaint_batch(pairs)
        assert len(outs) == 3
        singles = [client.inpaint(i, m) for i, m in pairs]
        for got, want in zip(outs, singles):
            np.testing.assert_array_equal(got, want)

    def test_unauthorized_no_retry(self, server):
        from terra_gan_tpu.serving import InpaintClient, ServingError

        client = InpaintClient(server)  # no token, no secret
        img, mask = self._pair()
        with pytest.raises(ServingError, match="401"):
            client.inpaint(img, mask)

    def test_retries_transient_503(self):
        """First two hits 503, third succeeds — the client retries with
        backoff instead of failing."""
        from http.server import BaseHTTPRequestHandler, HTTPServer

        from terra_gan_tpu.serving import InpaintClient

        hits = []

        class Flaky(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                hits.append(1)
                if len(hits) < 3:
                    self.send_response(503)
                    self.end_headers()
                    return
                body = json.dumps({"status": "ok"}).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        srv = HTTPServer(("127.0.0.1", 0), Flaky)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            client = InpaintClient(
                f"http://127.0.0.1:{srv.server_port}",
                max_retries=4, backoff_s=0.01,
            )
            assert client.healthz()["status"] == "ok"
            assert len(hits) == 3
        finally:
            srv.shutdown()

    def test_terminal_connection_error(self):
        from terra_gan_tpu.serving import InpaintClient, ServingError

        client = InpaintClient(
            "http://127.0.0.1:1", max_retries=1, backoff_s=0.01
        )
        with pytest.raises(ServingError, match="after 2 attempts"):
            client.healthz()

    def test_cli_remote_batch(self, server, tmp_path):
        """terra-gan-tpu-infer: the reference evaluate loop pointed at
        a remote endpoint (main_pipeline.py:497-539 analogue)."""
        from terra_gan_tpu.serving.client import main as client_main

        img_dir = tmp_path / "images"
        mask_dir = tmp_path / "masks"
        img_dir.mkdir(), mask_dir.mkdir()
        for i in range(3):
            img, mask = self._pair(seed=i)
            Image.fromarray(img).save(img_dir / f"t{i}.png")
            Image.fromarray(mask).save(mask_dir / f"t{i}_mask_resized.png")
        out_dir = tmp_path / "out"
        rc = client_main([
            "--url", server, "--images", str(img_dir),
            "--masks", str(mask_dir), "--out", str(out_dir),
            "--secret", self.SECRET, "--batch", "2",
        ])
        assert rc == 0
        outs = sorted(out_dir.glob("*_inpainted.png"))
        assert [p.name for p in outs] == [
            "t0_inpainted.png", "t1_inpainted.png", "t2_inpainted.png"
        ]
        assert Image.open(outs[0]).size == (64, 64)
