"""Checkpoint save/restore (counterpart of TF1 Saver + MonitoredTrainingSession
auto-resume, tf_boilerplate.py:84-88), built on orbax.

Layout: <checkpoint_dir>/<runname>/ckpt-<step>/ with orbax pytree state.
``latest_step`` mirrors tf.train.latest_checkpoint discovery (sga.py:180-182).
"""

import os
import re
from typing import Any, Optional

import orbax.checkpoint as ocp


def _ckpt_path(save_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(save_dir), f"ckpt-{step}")


def latest_step(save_dir: str) -> Optional[int]:
    if not os.path.isdir(save_dir):
        return None
    steps = []
    for name in os.listdir(save_dir):
        m = re.fullmatch(r"ckpt-(\d+)", name)
        if m and os.path.isdir(os.path.join(save_dir, name)):
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def save_checkpoint(save_dir: str, step: int, state: Any) -> str:
    path = _ckpt_path(save_dir, step)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(save_dir: str, state_template: Any, step: Optional[int] = None) -> Any:
    if step is None:
        step = latest_step(save_dir)
    if step is None:
        raise FileNotFoundError(f"No checkpoints under {save_dir}")
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(_ckpt_path(save_dir, step), state_template)


def restore_raw(save_dir: str, step: Optional[int] = None) -> Any:
    """Restore a checkpoint with no target template (raw nested dict).

    Inference paths only need `params` + `step`; restoring template-free
    sidesteps optimizer-state tree-structure coupling entirely (a
    checkpoint written with --grad_clip has a chain-wrapped opt_state that
    a clip-less template cannot receive, and vice versa).
    """
    if step is None:
        step = latest_step(save_dir)
    if step is None:
        raise FileNotFoundError(f"No checkpoints under {save_dir}")
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(_ckpt_path(save_dir, step))


# ------------------------------------------------------------- npz archives
#
# Compact, git-committable parameter archives. Orbax checkpoint trees (many
# small files + optimizer state) are too bulky to track, and untracked
# artifacts do not survive between build rounds — trained weights were lost
# this way once. A params-<step>.npz (float32, compressed, one file) is the
# durable form: ~45 MB for the nf=192 model, restorable without knowing the
# optimizer configuration. Inference paths (restore_params_only) fall back
# to the newest npz when no orbax checkpoint is present.

_NPZ_RE = re.compile(r"params-(\d+)\.npz")


def latest_npz(save_dir: str) -> Optional[str]:
    """Path of the highest-step params-<step>.npz under save_dir, or None."""
    if not os.path.isdir(save_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(save_dir):
        m = _NPZ_RE.fullmatch(name)
        if m and int(m.group(1)) > best_step:
            best_step, best = int(m.group(1)), os.path.join(save_dir, name)
    return best


def export_params_npz(save_dir: str, step: int, params: Any) -> str:
    """Write params as <save_dir>/params-<step>.npz (flat '/'-joined keys)."""
    import numpy as np
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params, sep="/")
    arrays = {k: np.asarray(v, dtype=np.float32) for k, v in flat.items()}
    path = os.path.join(save_dir, f"params-{step}.npz")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **arrays)
    os.replace(tmp, path)
    return path


def load_params_npz(path: str):
    """(step, nested params dict) from a params-<step>.npz archive."""
    import numpy as np
    from flax import traverse_util

    m = _NPZ_RE.fullmatch(os.path.basename(path))
    step = int(m.group(1)) if m else 0
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    return step, traverse_util.unflatten_dict(flat, sep="/")
