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


class DeviceDataset:
    """Whole-corpus-in-HBM training data: zero per-step host->device bytes.

    The host pipeline ships ~12.6 MB of uint8 patches per 64-step fused call
    (batch 8, patch 256); over a thin remote-TPU link that transfer, not
    compute, bounds training throughput (measured: ~3 steps/s on a slow
    tunnel day vs ~15+ compute-bound). When the corpus fits an HBM budget,
    upload it ONCE as a (N, H, W, 3) uint8 array and sample random
    image+crop batches on device with jax.random — the per-call host
    traffic drops to one PRNG key.

    Same sampling semantics as PatchPipeline (uniform file choice + uniform
    crop, the tf.data shuffle/random_crop analog, tf_boilerplate.py:19-35),
    expressed as an XLA program instead of worker threads. Requires
    uniformly-sized images (the synthetic/photo corpora are); falls back is
    the caller's job (see Trainer docs / CLI --data_pipeline).

    ``sample(k)`` returns a (k, B, P, P, 3) uint8 DEVICE array shaped for
    the trainer's fused scan; pass ``mesh`` to lay it out batch-sharded so
    the stacked batch is born with the trainer's input sharding.
    """

    def __init__(
        self,
        train_glob: str,
        batchsize: int = 8,
        patchsize: int = 256,
        seed: int = 0,
        mesh=None,
    ):
        import jax
        import jax.numpy as jnp

        files = sorted(globlib.glob(train_glob))
        if not files:
            raise RuntimeError(f"No training images found with glob '{train_glob}'.")
        imgs = []
        for path in files:
            img = _decode_image(path)
            if img is None:
                continue
            if img.shape[0] >= patchsize and img.shape[1] >= patchsize:
                imgs.append(img)
        if not imgs:
            raise RuntimeError(
                f"No images >= patchsize {patchsize} under '{train_glob}'."
            )
        shapes = {im.shape for im in imgs}
        if len(shapes) != 1:
            raise ValueError(
                f"DeviceDataset needs uniformly-sized images, got {shapes}; "
                "use the host PatchPipeline for mixed-size corpora."
            )
        stack = np.stack(imgs)  # (N, H, W, 3) uint8
        self.num_images = stack.shape[0]
        self.nbytes = stack.nbytes
        self.batchsize = batchsize
        self.patchsize = patchsize
        self._base_key = jax.random.PRNGKey(seed)
        self._calls = 0
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from nic_tpu.parallel.mesh import replicated_sharding

            self._images = jax.device_put(stack, replicated_sharding(mesh))
            self._out_sharding = NamedSharding(mesh, P(None, "data"))
        else:
            self._images = jax.device_put(stack)
            self._out_sharding = None

        B, Ps = batchsize, patchsize

        def sample_impl(images, key, k):
            N, H, W, _ = images.shape
            ki, ky, kx = jax.random.split(key, 3)
            idx = jax.random.randint(ki, (k, B), 0, N)
            oy = jax.random.randint(ky, (k, B), 0, H - Ps + 1)
            ox = jax.random.randint(kx, (k, B), 0, W - Ps + 1)

            def crop(i, y, x):
                return jax.lax.dynamic_slice(
                    images, (i, y, x, 0), (1, Ps, Ps, 3)
                )[0]

            return jax.vmap(jax.vmap(crop))(idx, oy, ox)

        jit_kwargs = {"static_argnums": (2,)}
        if self._out_sharding is not None:
            jit_kwargs["out_shardings"] = self._out_sharding
        self._sampler = jax.jit(sample_impl, **jit_kwargs)
        self._jnp = jnp

    def sample(self, k: int):
        """(k, B, P, P, 3) uint8 device batch stack for k fused steps."""
        import jax

        key = jax.random.fold_in(self._base_key, self._calls)
        self._calls += 1
        return self._sampler(self._images, key, k)

    def close(self):
        self._images = None


def _decode_image(path: str) -> Optional[np.ndarray]:
    """uint8 HWC decode of a PNG/JPEG/.npy file (None on failure)."""
    try:
        if path.endswith(".npy"):
            arr = np.load(path)
            if arr.dtype != np.uint8:
                arr = np.clip(
                    arr * (255.0 if arr.max() <= 1.5 else 1.0), 0, 255
                ).astype(np.uint8)
            return arr
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"), np.uint8)
    except Exception:
        return None
