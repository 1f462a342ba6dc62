"""End-to-end portal server tests: the real WSGI app behind a real HTTP
server, driven by the real PortalClient — no fakes on either side.

Covers the reference's JWT auth semantics (Annotation_Portal_Code/
app.py:38-55): valid HS256 token -> authorized; missing header -> 401
"No API key provided"; expired/tampered/garbage token -> 401 "Invalid
API key". Plus the full upload -> annotate -> fetch -> status ->
feedback -> delete flow over HTTP.
"""

import base64
import io
import json
import sys
import threading
import time
from pathlib import Path
from wsgiref.simple_server import WSGIRequestHandler, make_server

import numpy as np
import pytest
import requests
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from terra_gan_tpu.portal import jwt_auth
from terra_gan_tpu.portal.client import PortalClient
from terra_gan_tpu.portal.server import create_app

SECRET = "unit-test-secret"


class _QuietHandler(WSGIRequestHandler):
    def log_message(self, *args):
        pass


@pytest.fixture
def portal(tmp_path):
    """Real wsgiref server on an ephemeral port, JWT-secret mode."""
    app = create_app(
        tmp_path / "images", tmp_path / "annotations", secret_key=SECRET
    )
    server = make_server("127.0.0.1", 0, app, handler_class=_QuietHandler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_port}"
    yield base, tmp_path
    server.shutdown()
    thread.join(timeout=5)


def _png_bytes(size=(32, 32), value=128) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(np.full(size, value, np.uint8)).save(buf, format="PNG")
    return buf.getvalue()


def _token(**overrides) -> str:
    claims = {"sub": "pipeline", **overrides}
    return jwt_auth.encode(claims, overrides.pop("secret", SECRET))


class TestJwtAuth:
    def test_roundtrip(self):
        tok = jwt_auth.encode({"sub": "x"}, SECRET, expires_in=60)
        claims = jwt_auth.decode(tok, SECRET)
        assert claims["sub"] == "x" and claims["exp"] > time.time()

    def test_expired(self):
        tok = jwt_auth.encode({"sub": "x"}, SECRET, expires_in=-10)
        with pytest.raises(jwt_auth.InvalidTokenError, match="expired"):
            jwt_auth.decode(tok, SECRET)

    def test_not_yet_valid(self):
        tok = jwt_auth.encode({"nbf": time.time() + 3600}, SECRET)
        with pytest.raises(jwt_auth.InvalidTokenError, match="not yet valid"):
            jwt_auth.decode(tok, SECRET)

    def test_wrong_secret(self):
        tok = jwt_auth.encode({"sub": "x"}, "other-secret")
        with pytest.raises(jwt_auth.InvalidTokenError, match="signature"):
            jwt_auth.decode(tok, SECRET)

    def test_tampered_payload(self):
        tok = jwt_auth.encode({"role": "user"}, SECRET)
        h, p, s = tok.split(".")
        evil = base64.urlsafe_b64encode(
            json.dumps({"role": "admin"}).encode()
        ).rstrip(b"=").decode()
        with pytest.raises(jwt_auth.InvalidTokenError):
            jwt_auth.decode(f"{h}.{evil}.{s}", SECRET)

    def test_alg_none_rejected(self):
        header = base64.urlsafe_b64encode(
            json.dumps({"alg": "none", "typ": "JWT"}).encode()
        ).rstrip(b"=").decode()
        payload = base64.urlsafe_b64encode(b"{}").rstrip(b"=").decode()
        with pytest.raises(jwt_auth.InvalidTokenError, match="HS256"):
            jwt_auth.decode(f"{header}.{payload}.", SECRET)

    def test_garbage(self):
        for garbage in ("", "abc", "a.b", "a.b.c.d", "!!.!!.!!"):
            with pytest.raises(jwt_auth.InvalidTokenError):
                jwt_auth.decode(garbage, SECRET)


class TestServerAuth:
    """401 semantics at the HTTP boundary, matching app.py:38-55."""

    def test_missing_header(self, portal):
        base, _ = portal
        r = requests.get(f"{base}/api/status/NJ05")
        assert r.status_code == 401
        assert r.json()["error"] == "No API key provided"

    def test_non_bearer_header(self, portal):
        base, _ = portal
        r = requests.get(
            f"{base}/api/status/NJ05", headers={"Authorization": "Basic abc"}
        )
        assert r.status_code == 401
        assert r.json()["error"] == "No API key provided"

    def test_garbage_token(self, portal):
        base, _ = portal
        r = requests.get(
            f"{base}/api/status/NJ05",
            headers={"Authorization": "Bearer not.a.jwt"},
        )
        assert r.status_code == 401
        assert r.json()["error"] == "Invalid API key"

    def test_expired_token(self, portal):
        base, _ = portal
        tok = jwt_auth.encode({"sub": "x"}, SECRET, expires_in=-5)
        r = requests.get(
            f"{base}/api/status/NJ05",
            headers={"Authorization": f"Bearer {tok}"},
        )
        assert r.status_code == 401
        assert r.json()["error"] == "Invalid API key"

    def test_valid_token(self, portal):
        base, _ = portal
        tok = jwt_auth.encode({"sub": "x"}, SECRET, expires_in=60)
        r = requests.get(
            f"{base}/api/status/NJ05",
            headers={"Authorization": f"Bearer {tok}"},
        )
        assert r.status_code == 200
        assert r.json()["grid_square"] == "NJ05"

    def test_unprotected_routes_stay_open(self, portal):
        base, _ = portal
        assert requests.get(f"{base}/images").status_code == 200


class TestEndToEndFlow:
    """Real PortalClient -> real server over HTTP, full HITL loop."""

    def test_full_flow(self, portal, tmp_path, monkeypatch):
        base, root = portal
        monkeypatch.setenv("EXPERIMENT_MODE", "true")
        token = jwt_auth.encode({"sub": "pipeline"}, SECRET, expires_in=3600)
        client = PortalClient(base, api_key=token, timeout=10)

        # upload two colored tiles (chunked path)
        tiles = []
        for i in range(2):
            p = tmp_path / f"nj0{i}50_inpainted_colored.png"
            p.write_bytes(_png_bytes(value=100 + i))
            tiles.append(p)
        assert client.upload_batch("NJ05", tiles)
        assert client.create_test_file("NJ05")

        listed = requests.get(f"{base}/images").json()["images"]
        assert "NJ05_nj0050_inpainted_colored.png" in listed

        # human saves an annotation (the browser POST, app.py:127-171)
        mask_b64 = "data:image/png;base64," + base64.b64encode(
            _png_bytes(value=255)
        ).decode()
        r = requests.post(
            f"{base}/save_annotation",
            json={
                "image_name": "NJ05_nj0050_inpainted_colored.png",
                "user_hash": "u1",
                "mask": mask_b64,
            },
        )
        assert r.status_code == 200 and r.json()["status"] == "success"

        # wrong-dimension mask is rejected with the reference's message
        bad = "data:image/png;base64," + base64.b64encode(
            _png_bytes(size=(16, 16))
        ).decode()
        r = requests.post(
            f"{base}/save_annotation",
            json={
                "image_name": "NJ05_nj0050_inpainted_colored.png",
                "user_hash": "u1",
                "mask": bad,
            },
        )
        assert r.status_code == 400
        assert "do not match" in r.json()["message"]

        # fetch annotations through the client
        downloaded = client.fetch_annotations("NJ05", tmp_path / "fetched")
        assert downloaded and downloaded[0].name.endswith("_u1_mask.png")

        status = client.get_annotation_status("NJ05")
        assert status["annotated_images"] == 1
        assert status["total_images"] == 3  # 2 tiles + probe

        assert client.submit_feedback("NJ05", {"quality": "good"})
        feedback_log = root / "annotations" / "NJ05_feedback.jsonl"
        assert feedback_log.exists()

        # delete the processed annotation
        name = downloaded[0].name
        assert client.delete_processed_annotations("NJ05", [name]) == 1
        assert client.fetch_annotations("NJ05", tmp_path / "fetched2") == []

    def test_plain_key_fallback_mode(self, tmp_path):
        app = create_app(
            tmp_path / "img", tmp_path / "ann", api_key="plain-key"
        )
        server = make_server(
            "127.0.0.1", 0, app, handler_class=_QuietHandler
        )
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            base = f"http://127.0.0.1:{server.server_port}"
            ok = requests.get(
                f"{base}/api/status/NJ05",
                headers={"Authorization": "Bearer plain-key"},
            )
            assert ok.status_code == 200
            bad = requests.get(
                f"{base}/api/status/NJ05",
                headers={"Authorization": "Bearer wrong"},
            )
            assert bad.status_code == 401
        finally:
            server.shutdown()
            t.join(timeout=5)

    def test_ui_served(self, portal):
        base, _ = portal
        r = requests.get(f"{base}/")
        assert r.status_code == 200 and b"<html" in r.content[:200].lower()
        r = requests.get(f"{base}/static/annotator.js")
        assert r.status_code == 200
