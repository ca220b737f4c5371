"""Training input pipeline: glob -> decode -> random crop -> batch -> prefetch.

Host-side counterpart of the tf.data pipeline in tf_boilerplate.py:19-35:
shuffled repeating file stream, PNG or .npy decode, random crop to
``patchsize``, fixed batch, background prefetching. Pure
numpy/PIL + worker threads, feeding device-put'ed sharded batches so the TPU
never waits on PNG decode.
"""

import glob as globlib
import queue
import threading
from typing import Iterator, List, Optional

import numpy as np


class PatchPipeline:
    """Infinite stream of [B, P, P, 3] uint8 batches.

    The trainer normalizes to [0, 1] fp32 on device (see Trainer._build_step)
    so only a quarter of the bytes cross the host->device boundary."""

    def __init__(
        self,
        train_glob: str,
        batchsize: int = 8,
        patchsize: int = 256,
        num_threads: int = 8,
        prefetch: int = 32,
        seed: int = 0,
        cache_bytes: int = 2 << 30,
    ):
        self.files: List[str] = sorted(globlib.glob(train_glob))
        if not self.files:
            raise RuntimeError(f"No training images found with glob '{train_glob}'.")
        self.batchsize = batchsize
        self.patchsize = patchsize
        self.seed = seed
        # Decoded-image cache (uint8): for corpora that fit in `cache_bytes`
        # each file is decoded once, after which the pipeline is pure
        # memcpy + crop — PNG decode otherwise dominates small-image corpora.
        self._cache: dict = {}
        self._cache_bytes_left = int(cache_bytes)
        self._cache_lock = threading.Lock()
        self._queue: "queue.Queue[np.ndarray]" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(target=self._worker, args=(i, num_threads), daemon=True)
            for i in range(num_threads)
        ]
        for t in self._threads:
            t.start()

    # ------------------------------------------------------------------ impl

    def _load(self, path: str) -> Optional[np.ndarray]:
        cached = self._cache.get(path)
        if cached is not None:
            return cached
        try:
            if path.endswith(".npy"):
                arr = np.load(path)
                if arr.dtype != np.uint8:
                    arr = np.clip(
                        arr * (255.0 if arr.max() <= 1.5 else 1.0), 0, 255
                    ).astype(np.uint8)
                img = arr
            else:
                from PIL import Image

                img = np.asarray(Image.open(path).convert("RGB"), np.uint8)
        except Exception:
            return None
        with self._cache_lock:
            if self._cache_bytes_left >= img.nbytes and path not in self._cache:
                self._cache[path] = img
                self._cache_bytes_left -= img.nbytes
        return img

    def _random_crop(self, img: np.ndarray, rng: np.random.Generator) -> Optional[np.ndarray]:
        p = self.patchsize
        h, w = img.shape[:2]
        if h < p or w < p:
            return None
        i = rng.integers(0, h - p + 1)
        j = rng.integers(0, w - p + 1)
        return img[i : i + p, j : j + p, :]

    def _worker(self, worker_id: int, num_workers: int):
        # Seed with the (seed, worker_id) PAIR, not their sum: under
        # multi-host DP each host gets seed = 1000 + process_index, and
        # additive seeding would make host p's worker w collide with host
        # p+1's worker w-1, silently duplicating sample streams across the
        # data-parallel axis. SeedSequence entropy pairs are collision-free
        # for distinct (seed, worker) tuples.
        rng = np.random.default_rng(np.random.SeedSequence([self.seed, worker_id]))
        while not self._stop.is_set():
            batch = []
            while len(batch) < self.batchsize:
                path = self.files[rng.integers(0, len(self.files))]
                img = self._load(path)
                if img is None:
                    continue
                crop = self._random_crop(img, rng)
                if crop is not None:
                    batch.append(crop)
            # Batches stay uint8 end-to-end: the trainer normalizes to
            # [0, 1] fp32 ON DEVICE. Shipping uint8 quarters host->device
            # traffic — which matters doubly because the TPU-tunnel plugin
            # leaks host memory proportional to bytes transferred (observed
            # ~1 GB/min at fp32 batch-8/patch-256 rates; OOM-killed a 30k-
            # step run at 128 GB RSS).
            out = np.stack(batch)
            while not self._stop.is_set():
                try:
                    self._queue.put(out, timeout=0.5)
                    break
                except queue.Full:
                    continue

    # ------------------------------------------------------------------- api

    def __iter__(self) -> Iterator[np.ndarray]:
        return self

    def __next__(self) -> np.ndarray:
        return self._queue.get()

    def close(self):
        self._stop.set()
