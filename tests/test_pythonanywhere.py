"""PythonAnywhere files-API client against a local fake server."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from terra_gan_tpu.portal.pythonanywhere import PythonAnywhereClient

TOKEN = "tok"


class FakePA(BaseHTTPRequestHandler):
    files = {}

    def log_message(self, *args):
        pass

    def _auth(self):
        return self.headers.get("Authorization") == f"Token {TOKEN}"

    def do_GET(self):
        if not self._auth():
            self.send_response(401), self.end_headers()
            return
        if self.path.startswith("/api/v0/user/u/files/tree/"):
            body = json.dumps(sorted(self.files)).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        if self.path.startswith("/api/v0/user/u/files/path"):
            remote = self.path.split("/files/path", 1)[1]
            blob = self.files.get(remote)
            if blob is None:
                self.send_response(404), self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)
            return
        self.send_response(404), self.end_headers()

    def do_POST(self):
        if not self._auth():
            self.send_response(401), self.end_headers()
            return
        remote = self.path.split("/files/path", 1)[1]
        length = int(self.headers.get("Content-Length", 0))
        self.files[remote] = self.rfile.read(length)
        self.send_response(201), self.end_headers()

    def do_DELETE(self):
        remote = self.path.split("/files/path", 1)[1]
        if self.files.pop(remote, None) is None:
            self.send_response(404), self.end_headers()
            return
        self.send_response(204), self.end_headers()


@pytest.fixture()
def fake_pa(monkeypatch):
    FakePA.files = {
        "/home/u/annotations/NJ00_nj0001_user_mask.png": b"png1",
        "/home/u/annotations/NJ00_nj0002_user_mask.png": b"png2",
        "/home/u/annotations/NX99_nx9901_user_mask.png": b"png3",
        "/home/u/annotations/notes.txt": b"x",
    }
    server = ThreadingHTTPServer(("127.0.0.1", 0), FakePA)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    import terra_gan_tpu.portal.pythonanywhere as pa

    monkeypatch.setattr(
        pa, "API_BASE",
        f"http://127.0.0.1:{server.server_port}/api/v0/user/{{user}}",
    )
    yield FakePA.files
    server.shutdown()


def test_grid_download_cleanup_upload(fake_pa, tmp_path):
    client = PythonAnywhereClient("u", TOKEN)
    files = client.download_annotations_for_grid(
        "NJ00", "/home/u/annotations", tmp_path
    )
    assert sorted(f.name for f in files) == [
        "NJ00_nj0001_user_mask.png", "NJ00_nj0002_user_mask.png",
    ]
    assert files[0].read_bytes() == b"png1"

    # bulk download gets everything
    all_files = client.download_all(
        "/home/u/annotations", tmp_path / "all", max_workers=2
    )
    assert len(all_files) == 4

    # upload a new file then grid-scoped cleanup
    src = tmp_path / "NJ00_nj0003_user_mask.png"
    src.write_bytes(b"new")
    assert client.upload_annotations(tmp_path, "/home/u/annotations") >= 1
    deleted = client.cleanup_remote("/home/u/annotations", "NJ00")
    assert deleted == 3  # nj0001, nj0002, nj0003
    remaining = [p for p in fake_pa if p.endswith(".png")]
    assert remaining == ["/home/u/annotations/NX99_nx9901_user_mask.png"]
