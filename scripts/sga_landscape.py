"""Regenerate the reference's SGA-landscape figure (results/sga_landscape.png).

The reference ships this plot (paper Fig. 2) as a results artifact: the RD
objective over a 2-D slice of latent space, with the amortized (inference
network) prediction, the SGA parameter trajectory, and the stochastic SGA
samples overlaid. This script reproduces it end-to-end with this framework:

  1. amortized init y0 = g_a(x), z0 = h_a(y0)                (sga.py:77-78)
  2. full SGA run, recording the continuous latent trajectory every
     --record_every iterations (the engine's chunked scan carries the Adam
     state + annealing step across chunks, so recording is free)
  3. slice: the two y-coordinates SGA moved the most
  4. landscape: the continuous RD objective (MAP relaxation — unrounded
     distortion + continuous rate, map.py:85-102) on a grid over those two
     coordinates with every other latent frozen at the SGA optimum
  5. overlays: amortized prediction (diamond), SGA trajectory (line),
     Gumbel-softmax samples drawn at the recorded (y, T) pairs (dots,
     colored by temperature)

Usage (toy CPU):
  JAX_PLATFORMS=cpu python scripts/sga_landscape.py /tmp/vimg0.png \
      --checkpoint_dir /tmp/vckpt --runname mbt2018-num_filters=8-lmbda=0.01 \
      --num_filters 8 --its 400 --out results/sga_landscape.png
Real checkpoint (TPU): same with checkpoints_val2 + nf=192 + --its 2000.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("image", help="PNG or .npy (first image used)")
    ap.add_argument("--checkpoint_dir", default=None)
    ap.add_argument("--runname", default=None)
    ap.add_argument("--num_filters", type=int, default=192)
    ap.add_argument("--lmbda", type=float, default=0.01)
    ap.add_argument("--its", type=int, default=2000)
    ap.add_argument("--record_every", type=int, default=50)
    ap.add_argument("--grid", type=int, default=21)
    ap.add_argument("--pad", type=float, default=1.2,
                    help="grid margin around the trajectory's bounding box")
    ap.add_argument("--out", default="results/sga_landscape.png")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/nic_tpu_jax_cache")
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    import jax.numpy as jnp
    import numpy as np

    from nic_tpu.infer.engine import (
        Latents,
        _amortized_init,
        _init_carry,
        _optimize_chunk,
        _rd_loss,
    )
    from nic_tpu.infer.methods import SGA
    from nic_tpu.models.mbt2018 import MeanScaleHyperprior
    from nic_tpu.ops.schedules import annealed_temperature
    from nic_tpu.utils import load_input

    x = load_input(args.image)[0]
    # Pad to the stride-64 alignment the eval graph expects.
    h, w = x.shape[:2]
    H, W = -(-h // 64) * 64, -(-w // 64) * 64
    x = np.pad(x, ((0, H - h), (0, W - w), (0, 0)), mode="edge")[None]
    x = jnp.asarray(x, jnp.float32)

    model = MeanScaleHyperprior(
        num_filters=args.num_filters, compute_dtype=jnp.bfloat16
    )
    if args.checkpoint_dir and args.runname:
        from nic_tpu.train.trainer import TrainConfig, Trainer

        trainer = Trainer(
            TrainConfig(
                model="mbt2018",
                num_filters=args.num_filters,
                checkpoint_dir=args.checkpoint_dir,
                runname=args.runname,
            )
        )
        params = trainer.restore_params_only()[1]
    else:
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros_like(x), training=False
        )["params"]

    method = SGA.replace(iterations=args.its)
    y0, z0 = _amortized_init(model, params, x)
    rng = jax.random.PRNGKey(args.seed)
    carry = _init_carry(Latents(y=y0, z=z0), rng)

    # 2. SGA with trajectory recording: drive the engine's own chunked scan
    # so Adam state and the annealing step roll across chunks exactly as a
    # single optimize() call would.
    traj = [np.asarray(carry.latents.y).ravel()]
    its_done = 0
    while its_done < method.iterations:
        this = min(args.record_every, method.iterations - its_done)
        carry, _, _ = _optimize_chunk(
            model, params, x, jnp.float32(args.lmbda), method, this, carry, 0, 1
        )
        its_done += this
        traj.append(np.asarray(carry.latents.y).ravel())
    y_star = np.asarray(carry.latents.y)
    z_star = carry.latents.z
    traj = np.stack(traj)  # [T+1, y_size]

    # 3. The two coordinates SGA moved the most.
    move = np.abs(traj[-1] - traj[0])
    c1, c2 = np.argsort(move)[-2:][::-1]
    t1, t2 = traj[:, c1], traj[:, c2]
    print(f"coords: flat {int(c1)}, {int(c2)}; moved {move[c1]:.2f}, {move[c2]:.2f}")

    # 5. SGA samples at the recorded points: the Gumbel-softmax draw the
    # engine makes at that iteration's temperature (sga.py:95-120).
    from nic_tpu.ops.quantize import sga_relax

    samples = []
    for i in range(1, traj.shape[0]):
        it = min(i * args.record_every, method.iterations) - 1
        T = float(
            annealed_temperature(
                it, r=method.annealing_rate, ub=method.temperature_ub,
                scheme=method.annealing_scheme, t0=method.t0,
            )
        )
        pair = jnp.asarray([t1[i], t2[i]], jnp.float32)
        s = sga_relax(pair, jnp.float32(T), jax.random.fold_in(rng, 1000 + i))
        samples.append(np.asarray(s))
    samples = np.stack(samples)

    # 4. Landscape: continuous RD objective over the (c1, c2) grid, all
    # other latents frozen at the SGA optimum.
    lo1, hi1 = min(t1.min(), samples[:, 0].min()), max(t1.max(), samples[:, 0].max())
    lo2, hi2 = min(t2.min(), samples[:, 1].min()), max(t2.max(), samples[:, 1].max())
    g1 = np.linspace(lo1 - args.pad, hi1 + args.pad, args.grid)
    g2 = np.linspace(lo2 - args.pad, hi2 + args.pad, args.grid)

    y_flat = jnp.asarray(y_star.ravel())

    @jax.jit
    def loss_at(v1, v2):
        y = y_flat.at[c1].set(v1).at[c2].set(v2).reshape(y_star.shape)
        loss, _ = _rd_loss(
            model, params, Latents(y=y, z=z_star), x,
            jnp.float32(args.lmbda), jnp.float32(1.0),
            jax.random.PRNGKey(0), "map",
        )
        return loss

    vv1, vv2 = np.meshgrid(g1, g2)
    flat1, flat2 = vv1.ravel(), vv2.ravel()
    zz = []
    batched = jax.jit(jax.vmap(loss_at))
    chunk = 32
    for i in range(0, flat1.size, chunk):
        zz.append(np.asarray(batched(
            jnp.asarray(flat1[i:i + chunk]), jnp.asarray(flat2[i:i + chunk])
        )))
    zz = np.concatenate(zz).reshape(vv1.shape)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7.2, 4.8))
    cf = ax.contourf(vv1, vv2, zz, levels=20, cmap="viridis")
    fig.colorbar(cf, ax=ax, label="RD objective (continuous relaxation)")
    order = np.linspace(0.2, 1.0, samples.shape[0])
    ax.scatter(samples[:, 0], samples[:, 1], s=14, c=order, cmap="Reds",
               zorder=3, label="SGA samples")
    ax.plot(t1, t2, color="magenta", lw=2.2, zorder=4,
            label="Trajectory of SGA parameters")
    ax.scatter([t1[0]], [t2[0]], marker="D", s=70, color="#1f77ff",
               edgecolor="white", zorder=5, label="Inference network prediction")
    ax.scatter([t1[-1]], [t2[-1]], marker="o", s=45, color="white",
               edgecolor="black", zorder=5)
    ax.set_xlabel("latent coordinate 1")
    ax.set_ylabel("latent coordinate 2")
    ax.set_title("SGA Optimization Landscape")
    ax.legend(loc="upper left", framealpha=0.9)
    ax.grid(ls="--", alpha=0.4)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    fig.savefig(args.out, dpi=110, bbox_inches="tight")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
