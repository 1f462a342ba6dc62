"""Annotation portal HTTP client (reference: utils/api/portal_client.py).

Same endpoint surface and semantics as the reference client:
  * bearer-token auth; retrying Session (5 retries, backoff on
    429/5xx — portal_client.py:28-36)
  * upload_batch: colored tiles POSTed 2 at a time to
    /api/upload/<grid> with inter-chunk delay (portal_client.py:65-129)
  * fetch_annotations via the PythonAnywhere files API downloader
    (portal_client.py:131-166)
  * get_annotation_status -> /api/status/<grid>
  * submit_feedback -> POST /api/feedback/<grid>
  * create_test_file: synthetic probe upload for server health checks
  * delete_annotation / delete_processed_annotations with interactive
    confirmation unless EXPERIMENT_MODE=true (portal_client.py:250-351)
"""

from __future__ import annotations

import io
import logging
import os
import time
from pathlib import Path
from typing import Dict, List, Optional, Sequence

logger = logging.getLogger(__name__)

UPLOAD_CHUNK = 2
CHUNK_DELAY_S = 1.0


def _make_session():
    import requests
    from requests.adapters import HTTPAdapter
    from urllib3.util.retry import Retry

    session = requests.Session()
    retry = Retry(
        total=5,
        backoff_factor=1.0,
        status_forcelist=[429, 500, 502, 503, 504],
        allowed_methods=["GET", "POST", "DELETE"],
    )
    adapter = HTTPAdapter(max_retries=retry)
    session.mount("http://", adapter)
    session.mount("https://", adapter)
    return session


def experiment_mode() -> bool:
    return os.environ.get("EXPERIMENT_MODE", "").lower() in ("1", "true", "yes")


class PortalClient:
    def __init__(self, base_url: str, api_key: str, timeout: float = 60.0):
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self.timeout = timeout
        self.session = _make_session()
        self.headers = {"Authorization": f"Bearer {api_key}"}

    # -- uploads ----------------------------------------------------------
    def upload_batch(
        self, grid_square: str, image_paths: Sequence[str | Path]
    ) -> bool:
        endpoint = f"{self.base_url}/api/upload/{grid_square}"
        valid = [Path(p) for p in image_paths if Path(p).exists()]
        if not valid:
            logger.warning("no valid files to upload for %s", grid_square)
            return False
        ok = 0
        n_chunks = -(-len(valid) // UPLOAD_CHUNK)
        for ci in range(n_chunks):
            chunk = valid[ci * UPLOAD_CHUNK : (ci + 1) * UPLOAD_CHUNK]
            handles = []
            try:
                files = []
                for p in chunk:
                    fh = open(p, "rb")
                    handles.append(fh)
                    files.append(("files", (p.name, fh, "image/png")))
                resp = self.session.post(
                    endpoint, files=files, headers=self.headers,
                    timeout=self.timeout,
                )
                resp.raise_for_status()
                ok += len(chunk)
                logger.info("uploaded chunk %d/%d", ci + 1, n_chunks)
                if ci + 1 < n_chunks:
                    time.sleep(CHUNK_DELAY_S)
            except Exception as e:
                logger.error("chunk %d upload failed: %s", ci + 1, e)
            finally:
                for fh in handles:
                    fh.close()
        return ok == len(valid)

    def create_test_file(self, grid_square: str) -> bool:
        """Upload a tiny synthetic probe image to check server health."""
        try:
            import numpy as np
            from PIL import Image

            buf = io.BytesIO()
            Image.fromarray(
                np.full((32, 32), 128, np.uint8)
            ).save(buf, format="PNG")
            buf.seek(0)
            resp = self.session.post(
                f"{self.base_url}/api/upload/{grid_square}",
                files=[("files", ("portal_test.png", buf, "image/png"))],
                headers=self.headers,
                timeout=self.timeout,
            )
            resp.raise_for_status()
            return True
        except Exception as e:
            logger.error("test upload failed: %s", e)
            return False

    # -- annotations ------------------------------------------------------
    def fetch_annotations(
        self, grid_square: str, download_dir: str | Path = "data/human_annotations"
    ) -> Optional[List[Path]]:
        """List + download annotation PNGs for a grid."""
        try:
            resp = self.session.get(
                f"{self.base_url}/api/annotations/{grid_square}",
                headers=self.headers,
                timeout=self.timeout,
            )
            resp.raise_for_status()
            names = resp.json().get("annotations", [])
        except Exception as e:
            logger.error("annotation listing failed: %s", e)
            return None
        out_dir = Path(download_dir) / grid_square
        out_dir.mkdir(parents=True, exist_ok=True)
        downloaded = []
        for name in names:
            try:
                r = self.session.get(
                    f"{self.base_url}/api/file/{name}",
                    headers=self.headers,
                    timeout=self.timeout,
                )
                r.raise_for_status()
                dest = out_dir / Path(name).name
                dest.write_bytes(r.content)
                downloaded.append(dest)
            except Exception as e:
                logger.error("download failed for %s: %s", name, e)
        return downloaded

    def get_annotation_status(self, grid_square: str) -> Optional[Dict]:
        try:
            resp = self.session.get(
                f"{self.base_url}/api/status/{grid_square}",
                headers=self.headers,
                timeout=self.timeout,
            )
            resp.raise_for_status()
            return resp.json()
        except Exception as e:
            logger.error("status fetch failed: %s", e)
            return None

    def submit_feedback(self, grid_square: str, feedback: Dict) -> bool:
        try:
            resp = self.session.post(
                f"{self.base_url}/api/feedback/{grid_square}",
                json=feedback,
                headers={**self.headers, "Content-Type": "application/json"},
                timeout=self.timeout,
            )
            resp.raise_for_status()
            return True
        except Exception as e:
            logger.error("feedback submit failed: %s", e)
            return False

    # -- deletion ---------------------------------------------------------
    def delete_annotation(
        self, grid_square: str, filename: str, confirm: bool = True
    ) -> bool:
        if confirm and not experiment_mode():
            answer = input(f"Delete {filename} from portal? [y/N] ")
            if answer.strip().lower() not in ("y", "yes"):
                return False
        try:
            resp = self.session.delete(
                f"{self.base_url}/api/delete/{grid_square}/{filename}",
                headers=self.headers,
                timeout=self.timeout,
            )
            resp.raise_for_status()
            return True
        except Exception as e:
            logger.error("delete failed for %s: %s", filename, e)
            return False

    def delete_processed_annotations(
        self,
        grid_square: str,
        filenames: Sequence[str],
        confirm: bool = True,
    ) -> int:
        """Batch deletion after successful training; returns count deleted."""
        if confirm and not experiment_mode():
            answer = input(
                f"Delete {len(filenames)} processed annotations for "
                f"{grid_square}? [y/N] "
            )
            if answer.strip().lower() not in ("y", "yes"):
                return 0
        try:
            resp = self.session.post(
                f"{self.base_url}/api/delete-batch/{grid_square}",
                json={"filenames": list(filenames)},
                headers={**self.headers, "Content-Type": "application/json"},
                timeout=self.timeout,
            )
            resp.raise_for_status()
            return resp.json().get("deleted", len(filenames))
        except Exception as e:
            logger.error("batch delete failed: %s", e)
            return 0
