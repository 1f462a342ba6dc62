"""Standalone fake annotation portal (reference endpoint surface).

Used by test_portal.py as a fixture and runnable as a process for
driving the full run_experiment.sh orchestration without network:

    python tests/fake_portal.py --port 8765 --api-key test-key
"""

from __future__ import annotations

import json
import re
import threading
from email import message_from_bytes
from email.policy import HTTP
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def make_handler(api_key: str, store: dict):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def _auth_ok(self):
            return self.headers.get("Authorization") == f"Bearer {api_key}"

        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if not self._auth_ok():
                return self._json({"error": "unauthorized"}, 401)
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            if self.path.startswith("/api/upload/"):
                grid = self.path.rsplit("/", 1)[1]
                msg = message_from_bytes(
                    b"Content-Type: "
                    + self.headers["Content-Type"].encode()
                    + b"\r\n\r\n" + body,
                    policy=HTTP,
                )
                saved = []
                for part in msg.iter_parts():
                    name = part.get_filename()
                    if name:
                        if not name.startswith(grid):
                            name = f"{grid}_{name}"
                        store["images"][name] = part.get_payload(decode=True)
                        saved.append(name)
                        # auto-annotator: when enabled, immediately file a
                        # trivial annotation so experiment flows don't block
                        if store.get("auto_annotate"):
                            store["annotations"][
                                name.replace(".png", "") + "_auto_mask.png"
                            ] = store["auto_annotate"]
                return self._json({"status": "success", "uploaded": saved})
            if self.path.startswith("/api/feedback/"):
                store["feedback"].append(json.loads(body))
                return self._json({"status": "success"})
            if self.path.startswith("/api/delete-batch/"):
                names = json.loads(body).get("filenames", [])
                deleted = sum(
                    1 for n in names
                    if store["annotations"].pop(n, None) is not None
                )
                return self._json({"status": "success", "deleted": deleted})
            self._json({"error": "not found"}, 404)

        def do_GET(self):
            if not self._auth_ok():
                return self._json({"error": "unauthorized"}, 401)
            m = re.match(r"/api/annotations/(\w+)", self.path)
            if m:
                grid = m.group(1)
                return self._json({
                    "annotations": [
                        n for n in store["annotations"]
                        if n.startswith(f"{grid}_")
                    ]
                })
            m = re.match(r"/api/file/(.+)", self.path)
            if m:
                name = m.group(1)
                blob = store["annotations"].get(name) or store["images"].get(
                    name
                )
                if blob is None:
                    return self._json({"error": "not found"}, 404)
                self.send_response(200)
                self.send_header("Content-Length", str(len(blob)))
                self.end_headers()
                self.wfile.write(blob)
                return
            m = re.match(r"/api/status/(\w+)", self.path)
            if m:
                grid = m.group(1)
                total = len(
                    [n for n in store["images"] if n.startswith(f"{grid}_")]
                )
                ann = len(
                    [n for n in store["annotations"]
                     if n.startswith(f"{grid}_")]
                )
                return self._json({
                    "grid_square": grid,
                    "total_images": total,
                    "annotated_images": ann,
                    "completed": total > 0 and ann >= total,
                })
            self._json({"error": "not found"}, 404)

        def do_DELETE(self):
            if not self._auth_ok():
                return self._json({"error": "unauthorized"}, 401)
            name = self.path.rsplit("/", 1)[1]
            if store["annotations"].pop(name, None) is None:
                return self._json({"error": "not found"}, 404)
            self._json({"status": "success"})

    return Handler


def new_store(auto_annotate: bytes | None = None) -> dict:
    return {
        "images": {}, "annotations": {}, "feedback": [],
        "auto_annotate": auto_annotate,
    }


def serve(port: int, api_key: str, store: dict) -> ThreadingHTTPServer:
    server = ThreadingHTTPServer(
        ("127.0.0.1", port), make_handler(api_key, store)
    )
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server


def main(argv=None) -> int:
    import argparse
    import io

    import numpy as np
    from PIL import Image

    p = argparse.ArgumentParser(description="Fake annotation portal")
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--api-key", default="test-key")
    p.add_argument(
        "--auto-annotate", action="store_true",
        help="file a synthetic annotation for every uploaded tile",
    )
    p.add_argument("--size", type=int, default=64)
    args = p.parse_args(argv)

    blob = None
    if args.auto_annotate:
        rng = np.random.default_rng(0)
        buf = io.BytesIO()
        Image.fromarray(
            (rng.random((args.size, args.size)) > 0.8).astype(np.uint8) * 255
        ).save(buf, format="PNG")
        blob = buf.getvalue()

    store = new_store(auto_annotate=blob)
    server = ThreadingHTTPServer(
        ("127.0.0.1", args.port), make_handler(args.api_key, store)
    )
    print(f"fake portal on 127.0.0.1:{args.port}")
    server.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
