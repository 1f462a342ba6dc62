"""Datasets + batched host->device pipeline.

Reference contracts:
  * InpaintingDataset (mvp_gan/src/utils/dataset.py:14-43): paired
    *sorted* image/mask dirs; grayscale; both resized to 512x512
    bilinear (train.py:67-70 applies the same transform to the mask);
    mask binarized at >0 AFTER the resize; values scaled to [0,1].
  * DirectMatchDataset (direct_match_dataset.py:31-85): triplets
    (image, system mask, human mask) from matched-pair dicts; image
    bilinear / masks NEAREST to 512; binarize at >0.5; unreadable
    items become zero tensors with tile_name "error".

TPU-first deltas: NHWC numpy batches (not per-sample tensors); a
threaded prefetch loader decodes/resizes the next batch on host CPU
while the device computes the current one (the reference uses
DataLoader num_workers=0 — fully serial, train.py:79).
"""

from __future__ import annotations

import logging
import os
import threading
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from ..utils.images import open_gray

logger = logging.getLogger(__name__)

TARGET = 512

# Decoded-tile cache budget. Initial training is 100 epochs over the
# same split (config.yaml:8-10) and the reference re-decodes every PNG
# every epoch (dataset.py:14-43 under DataLoader); on a busy host the
# feed thread's decode rate bounds real samples/s (BASELINE.md "Native
# decode"), so epochs >= 2 should pay array math, not PNG decode. A
# cached 512^2 tile pair is ~512 KB (post-resize uint8 image + 0/1
# mask), so the 256 MB default holds ~500 tiles — every real parent
# split (<= 100 tiles) fits. Override per-dataset via cache_bytes or
# globally via TERRA_GAN_TPU_TILE_CACHE_MB (0 disables).
DEFAULT_CACHE_BYTES = 256 * 2**20


def _cache_budget(cache_bytes: Optional[int]) -> int:
    if cache_bytes is not None:
        return cache_bytes
    env = os.environ.get("TERRA_GAN_TPU_TILE_CACHE_MB")
    if env is not None:
        try:
            return int(float(env) * 2**20)
        except ValueError:
            logger.warning("bad TERRA_GAN_TPU_TILE_CACHE_MB=%r ignored", env)
    return DEFAULT_CACHE_BYTES


class _TileCache:
    """Insert-until-full cache of decoded uint8 tile tuples.

    Epoch access is cyclic (every index once per epoch), the pattern
    LRU thrashes on — once over budget an LRU would evict every entry
    exactly before its next use. Filling to the budget and then keeping
    what we have serves the first `budget` bytes of tiles from memory
    forever and leaves the rest on the decode path.
    """

    def __init__(self, budget_bytes: int):
        self.budget = budget_bytes
        self.used = 0
        self._data: Dict[int, Tuple[np.ndarray, ...]] = {}
        self._lock = threading.Lock()

    def get(self, key: int) -> Optional[Tuple[np.ndarray, ...]]:
        return self._data.get(key)

    def put(self, key: int, arrays: Tuple[np.ndarray, ...]) -> None:
        nbytes = sum(a.nbytes for a in arrays)
        with self._lock:
            if key in self._data or self.used + nbytes > self.budget:
                return
            self._data[key] = arrays
            self.used += nbytes


def _load_gray_u8(path: str | Path, size: int, resample) -> np.ndarray:
    """Post-resize (H, W) uint8 plane — the cacheable form: the float
    conversion below happens AFTER the uint8 resize, so caching here is
    bit-identical to re-decoding."""
    # native gray8 PNG decode when possible (utils/images.py): on a
    # 1-core host the feed thread's decode rate bounds real samples/s
    img = open_gray(path)
    if img.size != (size, size):
        img = img.resize((size, size), resample)
    return np.asarray(img, np.uint8)


def _load_grayscale(path: str | Path, size: int, resample) -> np.ndarray:
    u8 = _load_gray_u8(path, size, resample)
    return u8.astype(np.float32)[..., None] / 255.0


class InpaintingDataset:
    """Paired image/mask directories, index-aligned by sorted filename."""

    def __init__(
        self,
        img_dir: str | Path,
        mask_dir: str | Path,
        size: int = TARGET,
        cache_bytes: Optional[int] = None,
    ):
        self.img_dir, self.mask_dir = Path(img_dir), Path(mask_dir)
        self.size = size
        self.img_files = sorted(
            p for p in self.img_dir.iterdir() if p.is_file()
        )
        self.mask_files = sorted(
            p for p in self.mask_dir.iterdir() if p.is_file()
        )
        if len(self.img_files) != len(self.mask_files):
            raise ValueError(
                f"image/mask count mismatch: {len(self.img_files)} vs "
                f"{len(self.mask_files)}"
            )
        budget = _cache_budget(cache_bytes)
        self._cache = _TileCache(budget) if budget > 0 else None

    def __len__(self) -> int:
        return len(self.img_files)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        cached = self._cache.get(idx) if self._cache else None
        if cached is None:
            img_u8 = _load_gray_u8(self.img_files[idx], self.size,
                                   Image.BILINEAR)
            # reference resizes the mask with the same bilinear
            # transform, then binarizes at >0 (dataset.py:37): on the
            # post-resize uint8 plane that is exactly u8 > 0
            mask_u8 = (_load_gray_u8(self.mask_files[idx], self.size,
                                     Image.BILINEAR) > 0).astype(np.uint8)
            if self._cache:
                self._cache.put(idx, (img_u8, mask_u8))
        else:
            img_u8, mask_u8 = cached
        return {
            "image": img_u8.astype(np.float32)[..., None] / 255.0,
            "mask": mask_u8.astype(np.float32)[..., None],
        }


class DirectMatchDataset:
    """Triplets for human-guided fine-tuning from matched-pair dicts."""

    def __init__(
        self,
        matched_pairs: Sequence[Dict],
        size: int = TARGET,
        cache_bytes: Optional[int] = None,
    ):
        self.pairs = list(matched_pairs)
        self.size = size
        budget = _cache_budget(cache_bytes)
        self._cache = _TileCache(budget) if budget > 0 else None

    def __len__(self) -> int:
        return len(self.pairs)

    def __getitem__(self, idx: int) -> Dict:
        pair = self.pairs[idx]
        cached = self._cache.get(idx) if self._cache else None
        if cached is not None:
            image_u8, system_u8, human_u8 = cached
            return {
                "image": image_u8.astype(np.float32)[..., None] / 255.0,
                "mask": system_u8.astype(np.float32)[..., None],
                "human_mask": human_u8.astype(np.float32)[..., None],
                "tile_name": pair.get("tile_name", ""),
            }
        try:
            image_u8 = _load_gray_u8(
                pair["image_path"], self.size, Image.BILINEAR
            )
            # binarize at >0.5 on the [0,1] scale (direct_match_dataset
            # .py:54-61): on the post-resize uint8 plane that is
            # u8/255 > 0.5, i.e. u8 >= 128
            system_u8 = (_load_gray_u8(
                pair["system_mask_path"], self.size, Image.NEAREST
            ) >= 128).astype(np.uint8)
            human_u8 = (_load_gray_u8(
                pair["human_mask_path"], self.size, Image.NEAREST
            ) >= 128).astype(np.uint8)
            if human_u8.sum() == 0:
                logger.warning(
                    "human mask for tile %s is empty", pair.get("tile_name")
                )
            # error items are never cached, so a transient read failure
            # can heal on a later epoch
            if self._cache:
                self._cache.put(idx, (image_u8, system_u8, human_u8))
            return {
                "image": image_u8.astype(np.float32)[..., None] / 255.0,
                "mask": system_u8.astype(np.float32)[..., None],
                "human_mask": human_u8.astype(np.float32)[..., None],
                "tile_name": pair.get("tile_name", ""),
            }
        except Exception as e:
            logger.error("failed to load item %d: %s", idx, e)
            zero = np.zeros((self.size, self.size, 1), np.float32)
            return {
                "image": zero, "mask": zero, "human_mask": zero,
                "tile_name": "error",
            }


def _default_feed_workers() -> int:
    """Producer-thread count for BatchLoader (r4, VERDICT item 3).

    Epoch 1 decodes through the producers at ~117-125 pairs/s per core
    (BASELINE.md); an 8-chip DP mesh needs ~800 samples/s, so epoch 1
    is ~6x feed-starved with one producer on any host class. cv2/PIL/
    zlib release the GIL, so N threads scale the decode rate with
    cores. Default: min(4, cores) — 1 on this 1-core bench host
    (measured neutral), 4 on real pod hosts. Override via
    TERRA_GAN_TPU_FEED_WORKERS (0/1 -> single producer).
    """
    env = os.environ.get("TERRA_GAN_TPU_FEED_WORKERS")
    if env is not None:
        try:
            return max(1, int(env))
        except ValueError:
            logger.warning("bad TERRA_GAN_TPU_FEED_WORKERS=%r ignored", env)
    return max(1, min(4, os.cpu_count() or 1))


class BatchLoader:
    """Shuffling batcher with N-worker background prefetch.

    Yields dicts of stacked NHWC float32 arrays. Non-array fields
    (tile_name) are collected into lists under the same key. The last
    partial batch is dropped when drop_last (static shapes under jit).

    Batch ORDER is deterministic regardless of num_workers: workers
    claim batch indices from a shared counter and publish into a
    reorder buffer; the consumer emits strictly in sequence. The same
    seed therefore produces the identical batch stream with 1 or N
    workers (tests/test_data.py), which multi-host lockstep training
    relies on.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
        prefetch: int = 2,
        strict: bool = False,
        num_workers: Optional[int] = None,
    ):
        """strict: raise on a failed batch instead of skipping it —
        required in multi-host training, where a skip on one host
        shifts its batch sequence out of collective lockstep.
        num_workers: producer threads (None -> min(4, cores), env
        TERRA_GAN_TPU_FEED_WORKERS overrides)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.strict = strict
        self.num_workers = (
            _default_feed_workers() if num_workers is None
            else max(1, num_workers)
        )
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        return idx

    def set_epoch(self, epoch: int) -> None:
        """Fast-forward the shuffle stream to epoch ``epoch``.

        Preemption resume (training/loop.py): after a mid-run restart
        the NEXT ``__iter__`` must produce the batch order epoch
        ``epoch`` would have had in an uninterrupted run. Each epoch's
        permutation comes from the same rng stream, so draw and discard
        one permutation per skipped epoch — the stream position, and
        therefore every later epoch's order, stays a pure function of
        (seed, epoch) regardless of how many resumes it took to get
        there (the multi-host lockstep guarantee depends on this).
        """
        while self._epoch < epoch:
            self._order()
            self._epoch += 1

    def _collate(self, items: List[Dict]) -> Dict:
        out: Dict = {}
        for key in items[0]:
            vals = [it[key] for it in items]
            if isinstance(vals[0], np.ndarray):
                out[key] = np.stack(vals, axis=0)
            else:
                out[key] = vals
        return out

    def __iter__(self) -> Iterator[Dict]:
        order = self._order()
        self._epoch += 1
        n = len(order)
        stops = range(0, n - self.batch_size + 1, self.batch_size) if (
            self.drop_last
        ) else range(0, n, self.batch_size)
        batches = [order[s : s + self.batch_size] for s in stops]
        total = len(batches)
        workers = max(1, min(self.num_workers, total)) if total else 0

        # Reorder buffer: workers claim sequence numbers from a shared
        # counter, load out of order, and publish results[seq]; the
        # consumer emits strictly in seq order. Memory is bounded by
        # never letting a worker claim past emit + prefetch + workers
        # (at most that many decoded batches are in flight or buffered).
        _SKIP = object()
        results: Dict[int, object] = {}
        cond = threading.Condition()
        state = {"claim": 0, "emit": 0, "stop": False}
        max_ahead = self.prefetch + workers

        def worker():
            while True:
                with cond:
                    while (
                        not state["stop"]
                        and state["claim"] < total
                        and state["claim"] >= state["emit"] + max_ahead
                    ):
                        cond.wait()
                    if state["stop"] or state["claim"] >= total:
                        return
                    seq = state["claim"]
                    state["claim"] += 1
                b = batches[seq]
                try:
                    items = [self.dataset[int(i)] for i in b]
                    out: object = self._collate(items)
                except Exception as e:
                    if not self.strict:
                        # skip the bad batch, keep the epoch going — the
                        # reference logs and continues per batch
                        # (train.py:268-270); without this, one corrupt
                        # tile would silently end the whole epoch
                        logger.error("batch load failed, skipping: %s", e)
                    out = ("__error__", e)
                with cond:
                    results[seq] = out
                    cond.notify_all()

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(workers)
        ]
        for t in threads:
            t.start()
        last_err = None
        produced = 0
        try:
            for seq in range(total):
                with cond:
                    while seq not in results:
                        cond.wait()
                    item = results.pop(seq)
                    state["emit"] = seq + 1
                    cond.notify_all()
                if isinstance(item, tuple) and item and item[0] == "__error__":
                    if self.strict:
                        # multi-host lockstep: surface instead of
                        # silently shifting this host's batch sequence
                        raise RuntimeError(
                            "batch load failed in strict mode"
                        ) from item[1]
                    last_err = item[1]
                    continue
                produced += 1
                yield item
            if total and produced == 0 and last_err is not None:
                # EVERY batch failed: systematic (all files bad /
                # collate shape mismatch), not a per-tile skip
                raise RuntimeError(
                    "every batch failed to load"
                ) from last_err
        finally:
            with cond:
                state["stop"] = True
                cond.notify_all()
            for t in threads:
                t.join()
