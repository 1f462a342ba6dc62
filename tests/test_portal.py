"""HITL portal layer: client against a local fake portal server,
annotation matching helpers, upload CLI.

The fake portal (threaded http.server) implements the reference's
endpoint surface (SURVEY §4 test plan item d) so the full client flow
runs without network access.
"""

import io
import json
import threading
from http.server import ThreadingHTTPServer

import numpy as np
import pytest
from PIL import Image

from terra_gan_tpu.config import Config
from terra_gan_tpu.data.dataset import DirectMatchDataset
from terra_gan_tpu.portal import (
    PortalClient,
    extract_tile_token,
    match_human_and_system_masks,
    upload_results,
    validate_dataset,
)

API_KEY = "test-key"


from fake_portal import make_handler, new_store

@pytest.fixture()
def fake_portal():
    store = new_store()
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(API_KEY, store))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_port}", store
    server.shutdown()


def png_bytes(size=32, value=255):
    buf = io.BytesIO()
    Image.fromarray(np.full((size, size), value, np.uint8)).save(
        buf, format="PNG"
    )
    return buf.getvalue()


class TestPortalClient:
    def test_upload_chunks_and_status(self, fake_portal, tmp_path):
        url, store = fake_portal
        client = PortalClient(url, API_KEY)
        paths = []
        for i in range(5):  # odd count -> 3 chunks of <=2
            p = tmp_path / f"nj000{i}_inpainted_colored.png"
            p.write_bytes(png_bytes())
            paths.append(p)
        assert client.upload_batch("NJ00", paths)
        assert len(store["images"]) == 5
        assert all(n.startswith("NJ00_") for n in store["images"])
        status = client.get_annotation_status("NJ00")
        assert status["total_images"] == 5 and not status["completed"]

    def test_fetch_and_delete_annotations(self, fake_portal, tmp_path):
        url, store = fake_portal
        store["annotations"]["NJ00_nj0001_user_mask.png"] = png_bytes()
        store["annotations"]["NJ00_nj0002_user_mask.png"] = png_bytes()
        client = PortalClient(url, API_KEY)
        files = client.fetch_annotations("NJ00", download_dir=tmp_path)
        assert len(files) == 2 and all(f.exists() for f in files)
        assert client.delete_annotation(
            "NJ00", "NJ00_nj0001_user_mask.png", confirm=False
        )
        deleted = client.delete_processed_annotations(
            "NJ00", ["NJ00_nj0002_user_mask.png"], confirm=False
        )
        assert deleted == 1
        assert not store["annotations"]

    def test_feedback_and_probe(self, fake_portal):
        url, store = fake_portal
        client = PortalClient(url, API_KEY)
        assert client.submit_feedback("NJ00", {"quality": "good"})
        assert store["feedback"] == [{"quality": "good"}]
        assert client.create_test_file("NJ00")

    def test_bad_key_fails(self, fake_portal):
        url, _ = fake_portal
        client = PortalClient(url, "wrong-key")
        assert client.get_annotation_status("NJ00") is None

    def test_upload_results_cli_flow(self, fake_portal, tmp_path, monkeypatch):
        url, store = fake_portal
        cfg = Config.from_dict({
            "portal": {"base_url": url, "api_key": API_KEY},
            "data": {"output_dir": str(tmp_path / "out")},
        })
        colored = tmp_path / "out" / "NJ00" / "colored"
        colored.mkdir(parents=True)
        (colored / "nj0000_inpainted_colored.png").write_bytes(png_bytes())
        assert upload_results("NJ00", cfg)
        assert len(store["images"]) == 1


class TestHelpers:
    def test_extract_tile_token(self):
        assert extract_tile_token("colored_nm4927_user") == "nm4927"
        assert extract_tile_token("NS83_ns8030_inpainted") == "ns8030"
        assert extract_tile_token("nothing_here") is None

    def test_match_and_validate(self, tmp_path):
        cfg = Config.from_dict({
            "data": {
                "output_dir": str(tmp_path / "out"),
                "processed_dir": str(tmp_path / "proc"),
            }
        })
        hdir = tmp_path / "out" / "NJ00" / "human_annotation_masks"
        sdir = tmp_path / "proc" / "NJ00" / "test" / "masks"
        idir = tmp_path / "proc" / "NJ00" / "test" / "images"
        for d in (hdir, sdir, idir):
            d.mkdir(parents=True)
        rng = np.random.default_rng(0)
        for tile in ("nj0001", "nj0002"):
            Image.fromarray(
                (rng.random((32, 32)) > 0.7).astype(np.uint8) * 255
            ).save(hdir / f"colored_{tile}_u.png")
            Image.fromarray(
                (rng.random((32, 32)) > 0.4).astype(np.uint8) * 255
            ).save(sdir / f"{tile}_mask_resized.png")
            Image.fromarray(
                rng.integers(0, 255, (32, 32), dtype=np.uint8)
            ).save(idir / f"{tile}.png")
        # one unmatched human annotation
        Image.fromarray(np.zeros((32, 32), np.uint8)).save(
            hdir / "colored_nj0099_u.png"
        )
        pairs = match_human_and_system_masks("NJ00", cfg)
        assert len(pairs) == 2
        ds = DirectMatchDataset(pairs, size=32)
        assert validate_dataset(ds)

    def test_validate_rejects_all_empty(self, tmp_path):
        img = tmp_path / "i.png"
        Image.fromarray(np.zeros((16, 16), np.uint8)).save(img)
        pairs = [{
            "image_path": img, "system_mask_path": img,
            "human_mask_path": img, "tile_name": "t",
        }]
        ds = DirectMatchDataset(pairs, size=16)
        assert not validate_dataset(ds)


class TestServerApp:
    def test_no_framework_needed(self, tmp_path):
        # the server is pure WSGI (stdlib): constructible with no Flask
        from terra_gan_tpu.portal import create_server_app

        app = create_server_app(tmp_path / "img", tmp_path / "ann")
        assert callable(app)  # WSGI callable; full behavior is covered
        # end-to-end over HTTP in tests/test_portal_server.py
