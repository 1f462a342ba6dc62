"""Annotation portal web server (reference: Annotation_Portal_Code/app.py).

Flask app with the same endpoint surface and semantics:
  * JWT-style bearer auth on API routes (app.py:38-55)
  * GET  /images                       — list annotatable images
  * POST /api/upload/<grid>            — multipart PNG batch upload,
    filenames prefixed with <grid>_ when missing (app.py:89-125)
  * POST /save_annotation              — base64 mask; rejected when its
    dimensions differ from the original image (app.py:127-171);
    saved as <image-stem>_<user_hash>_mask.png
  * GET  /api/annotations/<grid>       — list annotation files
  * GET  /api/annotations-file/<f>     — base64 body
  * GET  /api/file/<f>                 — raw stream
  * GET  /api/status/<grid>            — counts + completed flag
    (app.py:273-325)
  * POST /api/feedback/<grid>          — JSON feedback log
  * DELETE /api/delete/<grid>/<f>, POST /api/delete-batch/<grid>

Flask is optional in this environment; `create_app` raises a clear
error when it's missing, and tests drive the app through Flask's test
client when available.
"""

from __future__ import annotations

import base64
import io
import json
import logging
import os
import time
from pathlib import Path

logger = logging.getLogger(__name__)


def create_app(
    image_folder: str | Path = "static/images",
    annotation_folder: str | Path = "static/annotations",
    api_key: str = "",
):
    try:
        from flask import Flask, jsonify, request, send_file
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "the annotation portal server requires Flask; install it on "
            "the portal host (the pipeline itself never needs it)"
        ) from e

    image_folder = Path(image_folder)
    annotation_folder = Path(annotation_folder)
    image_folder.mkdir(parents=True, exist_ok=True)
    annotation_folder.mkdir(parents=True, exist_ok=True)

    app = Flask(__name__)
    app.config["IMAGE_FOLDER"] = str(image_folder)
    app.config["ANNOTATION_FOLDER"] = str(annotation_folder)
    app.config["MAX_CONTENT_LENGTH"] = 64 * 1024 * 1024

    def authorized() -> bool:
        if not api_key:
            return True
        header = request.headers.get("Authorization", "")
        return header == f"Bearer {api_key}"

    def require_key(fn):
        from functools import wraps

        @wraps(fn)
        def wrapper(*args, **kwargs):
            if not authorized():
                return jsonify({"error": "unauthorized"}), 401
            return fn(*args, **kwargs)

        return wrapper

    @app.route("/images")
    def list_images():
        names = sorted(
            f for f in os.listdir(image_folder) if f.lower().endswith(".png")
        )
        return jsonify({"images": names})

    @app.route("/api/upload/<grid_square>", methods=["POST"])
    @require_key
    def upload_batch(grid_square):
        if "files" not in request.files:
            return jsonify({"error": "No files provided"}), 400
        files = request.files.getlist("files")
        if not files:
            return jsonify({"error": "Empty files list"}), 400
        saved = []
        for f in files:
            if not f or not f.filename:
                continue
            name = f.filename
            if not name.startswith(grid_square):
                name = f"{grid_square}_{name}"
            f.save(image_folder / Path(name).name)
            saved.append(name)
        return jsonify({"status": "success", "uploaded": saved})

    @app.route("/save_annotation", methods=["POST"])
    def save_annotation():
        from PIL import Image

        data = request.get_json(force=True)
        image_name = data.get("image_name", "")
        user_hash = data.get("user_hash", "anon")
        raw = data.get("mask", "")
        try:
            mask_bytes = base64.b64decode(raw.split(",", 1)[1])
        except (IndexError, ValueError):
            return jsonify({"status": "error", "message": "bad mask"}), 400

        image_path = image_folder / Path(image_name).name
        if image_path.exists():
            with Image.open(image_path) as orig:
                ow, oh = orig.size
            with Image.open(io.BytesIO(mask_bytes)) as mask_img:
                mw, mh = mask_img.size
            if (mw, mh) != (ow, oh):
                return (
                    jsonify({
                        "status": "error",
                        "message": (
                            f"Mask dimensions ({mw}x{mh}) do not match "
                            f"original image ({ow}x{oh})"
                        ),
                    }),
                    400,
                )
        stem = Path(image_name).stem
        out = annotation_folder / f"{stem}_{user_hash}_mask.png"
        out.write_bytes(mask_bytes)
        return jsonify({"status": "success"})

    @app.route("/api/annotations/<grid_square>")
    @require_key
    def list_annotations(grid_square):
        names = sorted(
            f for f in os.listdir(annotation_folder)
            if f.endswith("_mask.png") and f.startswith(f"{grid_square}_")
        )
        return jsonify({"annotations": names})

    @app.route("/api/annotations-file/<path:filename>")
    @require_key
    def annotation_file(filename):
        path = annotation_folder / Path(filename).name
        if not path.exists():
            return jsonify({"error": "not found"}), 404
        return jsonify(
            {"filename": path.name,
             "content": base64.b64encode(path.read_bytes()).decode()}
        )

    @app.route("/api/file/<path:filename>")
    @require_key
    def raw_file(filename):
        for folder in (annotation_folder, image_folder):
            path = folder / Path(filename).name
            if path.exists():
                return send_file(path)
        return jsonify({"error": "not found"}), 404

    @app.route("/api/status/<grid_square>")
    @require_key
    def status(grid_square):
        total = len([
            f for f in os.listdir(image_folder)
            if f.lower().endswith(".png") and f.startswith(f"{grid_square}_")
        ])
        grid_dir = image_folder / grid_square
        if grid_dir.exists():
            total += len([
                f for f in os.listdir(grid_dir)
                if f.lower().endswith(".png")
            ])
        annotated = len([
            f for f in os.listdir(annotation_folder)
            if f.endswith("_mask.png") and f.startswith(f"{grid_square}_")
        ])
        return jsonify({
            "grid_square": grid_square,
            "total_images": total,
            "annotated_images": annotated,
            "completed": total > 0 and annotated >= total,
        })

    @app.route("/api/feedback/<grid_square>", methods=["POST"])
    @require_key
    def feedback(grid_square):
        payload = request.get_json(force=True)
        log = annotation_folder / f"{grid_square}_feedback.jsonl"
        with open(log, "a") as f:
            f.write(json.dumps({"ts": time.time(), **payload}) + "\n")
        return jsonify({"status": "success"})

    @app.route("/api/delete/<grid_square>/<path:filename>", methods=["DELETE"])
    @require_key
    def delete_annotation(grid_square, filename):
        path = annotation_folder / Path(filename).name
        if not path.exists():
            return jsonify({"error": "not found"}), 404
        path.unlink()
        return jsonify({"status": "success", "deleted": path.name})

    @app.route("/api/delete-batch/<grid_square>", methods=["POST"])
    @require_key
    def delete_batch(grid_square):
        names = (request.get_json(force=True) or {}).get("filenames", [])
        deleted = 0
        for name in names:
            path = annotation_folder / Path(name).name
            if path.exists():
                path.unlink()
                deleted += 1
        return jsonify({"status": "success", "deleted": deleted})

    return app


def main(argv=None) -> int:  # pragma: no cover - live server entry
    import argparse

    p = argparse.ArgumentParser(description="Annotation portal server")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--images", default="static/images")
    p.add_argument("--annotations", default="static/annotations")
    p.add_argument("--api-key", default=os.environ.get("PORTAL_API_KEY", ""))
    args = p.parse_args(argv)
    app = create_app(args.images, args.annotations, args.api_key)
    app.run(host=args.host, port=args.port)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
