"""Standalone max-likelihood trainer for the flexible factorized prior.

Counterpart of the reference's learned_prior.py train()/CLI
(learned_prior.py:389-535): fits a FactorizedEntropyModel density to a
[N, channels] sample array by maximizing log pdf with Adam, with
relative-tolerance early stopping; saves weights + a training record.
Runs the full dataset as one jitted batch per step.
"""

import json
import os
from dataclasses import asdict, dataclass
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nic_tpu.models.factorized_prior import FactorizedEntropyModel
from nic_tpu.ops.bounds import lower_bound


@dataclass
class PriorTrainConfig:
    num_channels: int
    dims: Tuple[int, ...] = (3, 3, 3)
    init_scale: float = 1.0
    lr: float = 0.01
    its: int = 500
    tol: float = 1e-3
    logging_freq: int = 10
    seed: int = 0
    checkpoint_dir: str = "./checkpoints"

    def runname(self) -> str:
        # learned_prior.py:363-381 naming convention.
        parts = [f"dims={'_'.join(map(str, self.dims))}"]
        for key in ("init_scale", "lr", "its", "tol"):
            parts.append(f"{key}={getattr(self, key)}")
        return "-".join(["learned_prior"] + parts)


def fit_factorized_prior(
    data: np.ndarray,
    cfg: PriorTrainConfig,
    verbose: bool = True,
):
    """Fit the prior to data of shape [N, channels]; returns (params, record)."""
    assert data.ndim == 2 and data.shape[1] == cfg.num_channels
    model = FactorizedEntropyModel(
        channels=cfg.num_channels, dims=cfg.dims, init_scale=cfg.init_scale
    )
    x = jnp.asarray(data, jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(cfg.seed), x[:1], training=False
    )
    params = variables["params"]
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)

    pdf_lower_bound = 1e-10  # learned_prior.py:430

    def loss_fn(p):
        pdf = model.apply({"params": p}, x, method=model.pdf)
        pdf = lower_bound(pdf, pdf_lower_bound)
        return -jnp.mean(jnp.log(pdf))

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    record = []
    prev_loss = float("inf")
    for it in range(cfg.its):
        params, opt_state, loss = step(params, opt_state)
        loss = float(loss)
        if abs(prev_loss - loss) / max(abs(loss), 1e-12) < cfg.tol:
            break
        prev_loss = loss
        if it % cfg.logging_freq == 0 or it + 1 == cfg.its:
            if verbose:
                print(f"it={it},\t\tloss={loss:g}")
            record.append(dict(it=it, loss=loss))
    return params, record


def train_prior_cli(args) -> str:
    """Reference-style entry: load .npy data, fit, save weights + record."""
    cfg = PriorTrainConfig(
        num_channels=args.num_channels,
        dims=tuple(args.dims),
        init_scale=float(args.init_scale),
        lr=args.lr,
        its=args.its,
        tol=args.tol,
        logging_freq=args.logging_freq,
        seed=getattr(args, "seed", 0),
        checkpoint_dir=args.checkpoint_dir,
    )
    data = np.load(args.data_path)
    save_dir = os.path.join(cfg.checkpoint_dir, cfg.runname())
    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, "args.json"), "w") as f:
        json.dump(asdict(cfg), f, indent=4, sort_keys=True)
    params, record = fit_factorized_prior(data, cfg)
    flat = {
        jax.tree_util.keystr(path): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(params)
    }
    np.savez(os.path.join(save_dir, "prior_model.npz"), **flat)
    if getattr(args, "plot", False):
        plot_fitted_density(cfg, params, data, save_dir)
    with open(os.path.join(save_dir, "record.json"), "w") as f:
        json.dump(record, f, indent=4, sort_keys=True)
    return save_dir


def plot_fitted_density(cfg: PriorTrainConfig, params, data: np.ndarray, save_dir: str):
    """Fitted per-channel pdf vs data histogram (learned_prior.py:464-490)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    model = FactorizedEntropyModel(
        channels=cfg.num_channels, dims=cfg.dims, init_scale=cfg.init_scale
    )
    xs = np.linspace(-5, 5, 200).astype(np.float32)
    grid = jnp.tile(jnp.asarray(xs)[:, None], (1, cfg.num_channels))
    q_xs = np.asarray(model.apply({"params": params}, grid, method=model.pdf))
    k = min(cfg.num_channels, 8)
    cols = min(k, 4)
    rows_n = -(-k // cols)
    plt.figure(figsize=(12, 8))
    for c in range(k):
        plt.subplot(rows_n, cols, c + 1)
        plt.plot(xs, q_xs[:, c], label="$q(x)$")
        plt.hist(data[:, c].ravel(), bins=31, density=True, alpha=0.4, label="data")
        plt.title(f"channel {c}")
    plt.legend()
    plt.tight_layout()
    path = os.path.join(save_dir, "fitted_density.png")
    plt.savefig(path)
    plt.close()
    return path
