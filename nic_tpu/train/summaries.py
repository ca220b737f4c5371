"""Training observability: metrics JSONL + optional TensorBoard scalars.

Counterpart of the reference's SummarySaverHook wiring
(tf_boilerplate.py:70-82): every metric whose name contains bpp/loss/mse/psnr
is logged on a time cadence. JSONL is always written (greppable, no deps);
TensorBoard event files are written too when a logdir is given and
TensorFlow is importable. Also provides a jax.profiler trace context and a
step-time/images-per-sec meter (SURVEY.md section 5: the reference has no
profiling at all — the TPU build needs it for the throughput north-star).
"""

import contextlib
import json
import os
import time
from typing import Dict, Optional


class SummaryWriter:
    def __init__(self, jsonl_path: str, logdir: Optional[str] = None):
        self.jsonl_path = jsonl_path
        self._tb = None
        if logdir:
            try:
                import tensorflow as tf  # optional dependency

                self._tb = tf.summary.create_file_writer(logdir)
            except Exception:
                self._tb = None

    def write(self, step: int, metrics: Dict[str, float]):
        record = {"step": step}
        record.update({k: float(v) for k, v in metrics.items()})
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(k, float(v), step=step)
                self._tb.flush()

    def write_images(self, step: int, images: Dict[str, "np.ndarray"], max_outputs: int = 2):
        """Original/reconstruction image summaries (tf_boilerplate.py:75-76).
        No-op without a TensorBoard logdir."""
        if self._tb is None:
            return
        import numpy as np
        import tensorflow as tf

        with self._tb.as_default():
            for name, img in images.items():
                img = np.clip(np.asarray(img, np.float32), 0.0, 1.0)
                tf.summary.image(name, img[:max_outputs], step=step)
            self._tb.flush()


class ThroughputMeter:
    """Images/sec and step-time tracking over a sliding window."""

    def __init__(self):
        self._t0 = time.perf_counter()
        self._images = 0
        self._steps = 0

    def update(self, batch_images: int, steps: int = 1):
        self._images += batch_images
        self._steps += steps

    def rates(self) -> Dict[str, float]:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        return {
            "images_per_sec": self._images / dt,
            "steps_per_sec": self._steps / dt,
        }

    def reset(self):
        self._t0 = time.perf_counter()
        self._images = 0
        self._steps = 0


@contextlib.contextmanager
def profile_trace(logdir: Optional[str]):
    """jax.profiler trace context; no-op when logdir is falsy."""
    if not logdir:
        yield
        return
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
