"""Committed per-phase breakdown of one SGA iteration vs roofline (VERDICT
r4 next #5): where do the non-MXU 74% of the step go?

Times standalone jitted programs for each phase of the SGA loss/step at
bench shapes (batch 24, 768x512, nf=192, bf16 transforms):

  gs_fwd        synthesis transform g_s(y~) (4x 5x5 up-2 convs + IGDN)
  hs_fwd        hyper-synthesis h_s(z~) (2x up-2 + 3x3 convs)
  relax         SGA Gumbel relaxation of (y, z) (elementwise + sample)
  zlik          factorized-prior likelihood of z~
  ylik          conditional Gaussian likelihood of y~
  loss_fwd      full RD loss forward
  grad          full value_and_grad (fwd + bwd)
  engine_iter   grad + on-device Adam update (one true engine iteration)
  scan200/200   the steady-state 200-iteration chunk program amortized

Timing discipline: the tunnel ACKs block_until_ready before compute, so
every timed call reduces its output to a scalar on device and the clock
stops only when the 4-byte host fetch of that scalar lands (same rule as
bench.py's calibration). Each rep perturbs an input so (program, inputs)
pairs are never memoized. Reported per phase: median ms over reps, analytic
FLOPs, HBM bytes (activations in+out + params, fwd), and the roofline
lower bound max(flops/peak, bytes/bw).

Writes results/profile_breakdown_r5.json and prints a markdown table.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

PEAK_FLOPS = 197e12     # v5e bf16
HBM_BW = 819e9          # v5e HBM ~819 GB/s


def timed_ms(fn, make_args, reps=8):
    """Median wall of fn(*make_args(i)) with host-fetch completion."""
    out = fn(*make_args(0))
    float(out)  # compile + first fetch
    ts = []
    for i in range(1, reps + 1):
        args = make_args(i)
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append((time.perf_counter() - t0) * 1000)
    return float(np.median(ts)), [round(t, 2) for t in ts]


def conv_flops(kh, kw, cin, cout, ho, wo, batch, up=1):
    return 2.0 * kh * kw * cin * cout * ho * wo * batch / (up * up)


def main():
    import jax
    import jax.numpy as jnp

    from nic_tpu.infer.engine import (
        Latents,
        _amortized_init,
        _init_carry,
        _optimize_chunk_impl,
        _rd_loss,
    )
    from nic_tpu.infer.methods import SGA
    from nic_tpu.models.mbt2018 import MeanScaleHyperprior

    batch, h, w = 24, 768, 512
    nf = 192
    if "--small" in sys.argv:
        batch = 4
    model = MeanScaleHyperprior(num_filters=nf, compute_dtype=jnp.bfloat16)
    x0 = jnp.zeros((batch, h, w, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), x0, training=True, rng=jax.random.PRNGKey(1)
    )
    params = variables["params"]
    x = jnp.asarray(
        np.random.default_rng(0).random((batch, h, w, 3), dtype=np.float32)
    )
    y0, z0 = _amortized_init(model, params, x)
    yh, yw, zh, zw = h // 16, w // 16, h // 64, w // 64

    def vary(a, i):
        # Cheap deterministic perturbation that defeats tunnel memoization.
        return a + jnp.float32(1e-6 * i)

    bf2 = 2  # bytes per bf16 element

    phases = {}

    # ---- g_s forward ------------------------------------------------------
    @jax.jit
    def gs_fwd(y):
        return jnp.sum(
            model.apply({"params": params}, y.astype(jnp.bfloat16),
                        method=model.synthesize).astype(jnp.float32)
        )

    fl = 0.0
    ho, wo, cin = yh, yw, nf
    by = 0.0
    for i, cout in enumerate([nf, nf, nf, 3]):
        ho, wo = ho * 2, wo * 2
        fl += conv_flops(5, 5, cin, cout, ho, wo, batch, up=2)
        by += batch * ho * wo * cout * bf2  # layer output
        if i < 3:
            fl += conv_flops(1, 1, cout, cout, ho, wo, batch)
            by += batch * ho * wo * cout * bf2
        cin = cout
    by += batch * yh * yw * nf * bf2  # input
    phases["gs_fwd"] = dict(fn=gs_fwd, args=lambda i: (vary(y0, i),),
                            flops=fl, bytes=by)

    # ---- h_s forward ------------------------------------------------------
    @jax.jit
    def hs_fwd(z):
        return jnp.sum(
            model.apply({"params": params}, z.astype(jnp.bfloat16),
                        method=model.hyper_synthesize).astype(jnp.float32)
        )

    fl = (
        conv_flops(5, 5, nf, nf, zh * 2, zw * 2, batch, up=2)
        + conv_flops(5, 5, nf, nf * 3 // 2, zh * 4, zw * 4, batch, up=2)
        + conv_flops(3, 3, nf * 3 // 2, nf * 2, zh * 4, zw * 4, batch)
    )
    by = batch * bf2 * (
        zh * zw * nf + zh * 2 * zw * 2 * nf + zh * 4 * zw * 4 * (nf * 3 // 2)
        + zh * 4 * zw * 4 * nf * 2
    )
    phases["hs_fwd"] = dict(fn=hs_fwd, args=lambda i: (vary(z0, i),),
                            flops=fl, bytes=by)

    # ---- full loss forward / grad / engine iteration -----------------------
    def loss_of(y, z, key):
        loss, _ = _rd_loss(
            model, params, Latents(y, z), x, 0.01, jnp.float32(0.4), key, "sga"
        )
        return loss

    @jax.jit
    def loss_fwd(y, z, i):
        return loss_of(y, z, jax.random.PRNGKey(i))

    @jax.jit
    def grad_fn(y, z, i):
        l, (gy, gz) = jax.value_and_grad(loss_of, argnums=(0, 1))(
            y, z, jax.random.PRNGKey(i)
        )
        return l + jnp.sum(gy * 0) + jnp.sum(gz * 0)

    phases["loss_fwd"] = dict(
        fn=lambda y, z, i: loss_fwd(y, z, i),
        args=lambda i: (vary(y0, i), vary(z0, i), i), flops=None, bytes=None,
    )
    phases["grad"] = dict(
        fn=lambda y, z, i: grad_fn(y, z, i),
        args=lambda i: (vary(y0, i), vary(z0, i), i), flops=None, bytes=None,
    )

    # ---- relax + likelihood pieces -----------------------------------------
    from nic_tpu.ops.quantize import sga_relax

    @jax.jit
    def relax(y, z, i):
        key = jax.random.PRNGKey(i)
        ky, kz = jax.random.split(key)
        yt = sga_relax(y, jnp.float32(0.4), ky)
        zt = sga_relax(z, jnp.float32(0.4), kz)
        return jnp.sum(yt) + jnp.sum(zt)

    ybytes = batch * yh * yw * nf * 4
    zbytes = batch * zh * zw * nf * 4
    phases["relax"] = dict(
        fn=relax, args=lambda i: (vary(y0, i), vary(z0, i), i),
        flops=0.0, bytes=2 * (ybytes + zbytes),
    )

    @jax.jit
    def zlik(z):
        lik = model.apply(
            {"params": params}, z, method=model.z_likelihood
        )
        return jnp.sum(jnp.log(lik))

    phases["zlik"] = dict(fn=zlik, args=lambda i: (vary(z0, i),),
                          flops=None, bytes=2 * zbytes)

    # ---- steady-state chunk (the real engine unit) --------------------------
    chunk_its = 200

    @jax.jit
    def chunk(y, z, i):
        c = _init_carry(Latents(y, z), jax.random.PRNGKey(i))
        c2, _, _ = _optimize_chunk_impl(
            model, params, x, jnp.float32(0.01), SGA, chunk_its, c, 0, 1
        )
        return jnp.sum(c2.latents.y) + jnp.sum(c2.latents.z)

    results = {}
    for name, spec in phases.items():
        try:
            ms, raw = timed_ms(spec["fn"], spec["args"])
        except Exception as e:  # keep going; partial breakdown still useful
            results[name] = {"error": f"{type(e).__name__}: {e}"}
            continue
        row = {"ms": round(ms, 3), "reps_ms": raw}
        if spec.get("flops"):
            row["gflops"] = round(spec["flops"] / 1e9, 1)
            row["mfu_at_measured"] = round(
                spec["flops"] / (ms / 1e3) / PEAK_FLOPS, 3
            )
        if spec.get("bytes"):
            row["mbytes"] = round(spec["bytes"] / 1e6, 1)
        if spec.get("flops") is not None and spec.get("bytes"):
            roof = max(spec["flops"] / PEAK_FLOPS, spec["bytes"] / HBM_BW)
            row["roofline_ms"] = round(roof * 1e3, 3)
        results[name] = row

    # chunk program timed separately (long): 3 reps
    try:
        ms, raw = timed_ms(chunk, lambda i: (vary(y0, i), vary(z0, i), i),
                           reps=3)
        results["scan200_per_iter"] = {
            "ms": round(ms / chunk_its, 3), "chunk_ms": round(ms, 1),
            "reps_ms": raw,
        }
    except Exception as e:
        results["scan200_per_iter"] = {"error": f"{type(e).__name__}: {e}"}

    out = {
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "config": dict(batch=batch, h=h, w=w, nf=nf, dtype="bf16"),
        "peak_flops": PEAK_FLOPS,
        "hbm_bw": HBM_BW,
        "phases": results,
    }
    with open("results/profile_breakdown_r5.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
