"""Global constants shared across models and inference methods.

Mirrors the cross-cutting constants of the reference (see
/root/reference/mbt2018.py:45-47, sga.py:24-30, configs.py:1-13).
"""

import numpy as np

# Conditional Gaussian scale table (mbt2018.py:45-47 and every script).
SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64


def scale_table() -> np.ndarray:
    """Log-spaced scale table used by the conditional entropy model."""
    return np.exp(
        np.linspace(np.log(SCALES_MIN), np.log(SCALES_MAX), SCALES_LEVELS)
    ).astype(np.float32)


# Likelihood / variance bounds (sga.py:28-29; mbt2018_bb.py:45-46).
LIKELIHOOD_LOWER_BOUND = 1e-9
VARIANCE_UPPER_BOUND = 2e1         # iterative-inference scripts
VARIANCE_UPPER_BOUND_BB_TRAIN = 1e1  # mbt2018_bb training

# atanh clipping epsilon in the SGA/danneal relaxations (sga.py:30).
ATANH_EPSILON = 1e-5

# Default RNG seed (sga.py:15-17 et al.).
DEFAULT_SEED = 0

# Eval batching by pixel budget (configs.py:5-9).
EVAL_BATCH_NUM_PIXELS = 1e7

# Entropy-coding table parameters.
CODER_PRECISION = 16      # bits of CDF precision for the rANS coder
FACTORIZED_TAIL_MASS = 1e-9
CONDITIONAL_TAIL_MASS = 2 ** -8

# Default checkpoint directory (configs.py:1).
CHECKPOINT_DIR = "./checkpoints"

# Whether to write .tfci-style bitstreams during batch eval (configs.py:4).
WRITE_BITSTREAM_FOR_EVAL = False

# Whether to save per-iteration optimization records (configs.py:12).
SAVE_OPT_RECORD = False


def get_eval_batch_size(num_pixels_per_image: int) -> int:
    """Auto batch size from a fixed pixel budget (configs.py:8-9)."""
    return max(1, round(EVAL_BATCH_NUM_PIXELS / num_pixels_per_image))
