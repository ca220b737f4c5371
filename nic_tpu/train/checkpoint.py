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
