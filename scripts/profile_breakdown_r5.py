"""Committed per-phase breakdown of one SGA iteration vs roofline (VERDICT
r4 next #5): where do the non-MXU ~74% of the step go?

Times each phase of the SGA loss/step at bench shapes (batch 24, 768x512,
nf=192, bf16 transforms):

  gs_fwd        synthesis transform g_s(y~) (4x 5x5 up-2 convs + IGDN)
  hs_fwd        hyper-synthesis h_s(z~) (2x up-2 + 3x3 convs)
  ga_fwd        analysis transform g_a(x) (only in init, for reference)
  relax         SGA Gumbel relaxation of (y, z) (elementwise + sample)
  zlik          factorized-prior likelihood of z~
  ylik          conditional Gaussian likelihood of y~ given (mu, sigma)
  loss_fwd      full RD loss forward
  grad          full value_and_grad (fwd + bwd)
  scan200/200   the steady-state 200-iteration engine chunk amortized

Timing discipline (this tunnel): the plugin ACKs block_until_ready before
compute finishes AND memoizes identical (program, inputs) dispatches, and a
single dispatch costs ~25-30 ms regardless of payload. Single-dispatch
timings are therefore useless for ~1-10 ms phases. Instead every phase is
timed as a data-dependence-chained lax.scan (each iteration's input is
perturbed by the previous iteration's output, so nothing can be memoized or
reordered) at TWO chunk lengths, and the per-iteration time is the SLOPE
(t_k2 - t_k1) / (k2 - k1) — dispatch latency and any constant overhead
cancel exactly. The clock stops when a 4-byte host fetch of the result
lands (same rule as bench.py's calibration). Reported per phase: slope ms,
analytic FLOPs, HBM bytes (activations in+out + params, fwd), and the
roofline lower bound max(flops/peak, bytes/bw).

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
K1, K2 = 40, 120        # chained chunk lengths for the slope
REPS = 3


def conv_flops(kh, kw, cin, cout, ho, wo, batch, up=1):
    return 2.0 * kh * kw * cin * cout * ho * wo * batch / (up * up)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from nic_tpu.infer.engine import (
        Latents,
        _amortized_init,
        _init_carry,
        _optimize_chunk_impl,
        _rd_loss,
    )
    from nic_tpu.infer.methods import SGA
    from nic_tpu.models.mbt2018 import MeanScaleHyperprior
    from nic_tpu.ops.quantize import sga_relax

    batch, h, w = 24, 768, 512
    nf = 192
    if "--small" in sys.argv:
        batch = 4
    if "--tiny" in sys.argv:  # CPU smoke test of the harness itself
        batch, h, w, nf = 1, 128, 128, 8
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
    mu0, sigma0 = model.apply(
        {"params": params}, z0, (y0.shape[1], y0.shape[2]),
        method=model.hyper_synthesize,
    )
    yh, yw, zh, zw = h // 16, w // 16, h // 64, w // 64
    base_key = jax.random.PRNGKey(7)

    # ---- chained-scan slope timer -------------------------------------------
    def chained_runner(phase_scalar_fn, k):
        """phase_scalar_fn(s, i) -> f32 scalar; s is the chained perturbation.

        Returns a jitted fn(seed_scalar) whose value depends on every
        iteration (accumulated), with iteration i+1's input perturbed by
        iteration i's output — serializing the chain on device.
        """

        @jax.jit
        def run(seed):
            def body(carry, i):
                s, acc = carry
                out = phase_scalar_fn(s, i)
                # bounded, data-dependent next perturbation
                s_next = jnp.tanh(out) * 1e-6 + seed * 1e-12
                return (s_next, acc + out), None

            (_, acc), _ = lax.scan(body, (seed, jnp.float32(0.0)),
                                   jnp.arange(k))
            return acc

        return run

    def slope_ms(phase_scalar_fn, reps=REPS):
        """Per-iteration ms from the (K1, K2) chained-scan slope."""
        r1 = chained_runner(phase_scalar_fn, K1)
        r2 = chained_runner(phase_scalar_fn, K2)
        float(r1(jnp.float32(0.0)))  # compile + warm
        float(r2(jnp.float32(0.0)))
        t1s, t2s = [], []
        for i in range(1, reps + 1):
            s = jnp.float32(i * 1e-7)
            t0 = time.perf_counter()
            float(r1(s))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(r2(s))
            t2s.append(time.perf_counter() - t0)
        t1, t2 = float(np.median(t1s)), float(np.median(t2s))
        per_iter = (t2 - t1) / (K2 - K1) * 1000.0
        return per_iter, [round(v * 1000, 1) for v in t1s], \
            [round(v * 1000, 1) for v in t2s]

    bf2 = 2  # bytes per bf16 element

    phases = {}

    # ---- g_s forward ---------------------------------------------------------
    def gs_phase(s, i):
        out = model.apply({"params": params},
                          (y0 + s).astype(jnp.bfloat16),
                          method=model.synthesize)
        return jnp.sum(out.astype(jnp.float32))

    fl = 0.0
    ho, wo, cin = yh, yw, nf
    by = 0.0
    for li, cout in enumerate([nf, nf, nf, 3]):
        ho, wo = ho * 2, wo * 2
        fl += conv_flops(5, 5, cin, cout, ho, wo, batch, up=2)
        by += batch * ho * wo * cout * bf2  # layer output
        if li < 3:
            fl += conv_flops(1, 1, cout, cout, ho, wo, batch)  # GDN mix
            by += batch * ho * wo * cout * bf2
        cin = cout
    by += batch * yh * yw * nf * bf2  # input
    phases["gs_fwd"] = dict(fn=gs_phase, flops=fl, bytes=by)

    # ---- h_s forward ---------------------------------------------------------
    def hs_phase(s, i):
        mu, sigma = model.apply({"params": params},
                                (z0 + s).astype(jnp.bfloat16),
                                method=model.hyper_synthesize)
        return jnp.sum(mu.astype(jnp.float32)) + jnp.sum(
            sigma.astype(jnp.float32))

    fl = (
        conv_flops(5, 5, nf, nf, zh * 2, zw * 2, batch, up=2)
        + conv_flops(5, 5, nf, nf * 3 // 2, zh * 4, zw * 4, batch, up=2)
        + conv_flops(3, 3, nf * 3 // 2, nf * 2, zh * 4, zw * 4, batch)
    )
    by = batch * bf2 * (
        zh * zw * nf + zh * 2 * zw * 2 * nf + zh * 4 * zw * 4 * (nf * 3 // 2)
        + zh * 4 * zw * 4 * nf * 2
    )
    phases["hs_fwd"] = dict(fn=hs_phase, flops=fl, bytes=by)

    # ---- g_a forward (init-only; for scale) ----------------------------------
    def ga_phase(s, i):
        y = model.apply({"params": params}, (x + s).astype(jnp.bfloat16),
                        method=model.analyze)
        return jnp.sum(y.astype(jnp.float32))

    fl = 0.0
    ho, wo, cin = h, w, 3
    for li, cout in enumerate([nf, nf, nf, nf]):
        ho, wo = ho // 2, wo // 2
        fl += conv_flops(5, 5, cin, cout, ho, wo, batch)
        if li < 3:
            fl += conv_flops(1, 1, cout, cout, ho, wo, batch)
        cin = cout
    phases["ga_fwd"] = dict(fn=ga_phase, flops=fl,
                            bytes=batch * h * w * 3 * 4)

    # ---- relax + likelihood pieces -------------------------------------------
    ybytes = batch * yh * yw * nf * 4
    zbytes = batch * zh * zw * nf * 4

    def relax_phase(s, i):
        key = jax.random.fold_in(base_key, i)
        ky, kz = jax.random.split(key)
        yt = sga_relax(y0 + s, jnp.float32(0.4), ky)
        zt = sga_relax(z0 + s, jnp.float32(0.4), kz)
        return jnp.sum(yt) + jnp.sum(zt)

    phases["relax"] = dict(fn=relax_phase, flops=0.0,
                           bytes=2 * (ybytes + zbytes))

    def zlik_phase(s, i):
        lik = model.apply({"params": params}, z0 + s,
                          method=model.z_likelihood)
        return jnp.sum(jnp.log(lik))

    phases["zlik"] = dict(fn=zlik_phase, flops=None, bytes=2 * zbytes)

    def ylik_phase(s, i):
        lik = model.apply({"params": params}, y0 + s, mu0, sigma0,
                          method=model.y_likelihood)
        return jnp.sum(jnp.log(lik))

    phases["ylik"] = dict(fn=ylik_phase, flops=None, bytes=4 * ybytes)

    # ---- full loss forward / grad --------------------------------------------
    def loss_phase(s, i):
        key = jax.random.fold_in(base_key, i)
        loss, _ = _rd_loss(model, params, Latents(y0 + s, z0 + s), x,
                           0.01, jnp.float32(0.4), key, "sga")
        return loss

    phases["loss_fwd"] = dict(fn=loss_phase, flops=None, bytes=None)

    def grad_phase(s, i):
        key = jax.random.fold_in(base_key, i)

        def loss_of(y, z):
            loss, _ = _rd_loss(model, params, Latents(y, z), x, 0.01,
                               jnp.float32(0.4), key, "sga")
            return loss

        l, (gy, gz) = jax.value_and_grad(loss_of, argnums=(0, 1))(
            y0 + s, z0 + s)
        return l + jnp.sum(gy) * 1e-12 + jnp.sum(gz) * 1e-12

    phases["grad"] = dict(fn=grad_phase, flops=None, bytes=None)

    results = {}
    for name, spec in phases.items():
        try:
            ms, raw1, raw2 = slope_ms(spec["fn"])
        except Exception as e:  # keep going; partial breakdown still useful
            results[name] = {"error": f"{type(e).__name__}: {e}"}
            continue
        row = {"ms": round(ms, 3), f"reps_k{K1}_ms": raw1,
               f"reps_k{K2}_ms": raw2}
        if spec.get("flops"):
            row["gflops"] = round(spec["flops"] / 1e9, 1)
            row["mfu_at_measured"] = round(
                spec["flops"] / (ms / 1e3) / PEAK_FLOPS, 3)
        if spec.get("bytes"):
            row["mbytes"] = round(spec["bytes"] / 1e6, 1)
        if spec.get("flops") is not None and spec.get("bytes"):
            roof = max(spec["flops"] / PEAK_FLOPS, spec["bytes"] / HBM_BW)
            row["roofline_ms"] = round(roof * 1e3, 3)
        results[name] = row
        print(f"  {name}: {row.get('ms')} ms", flush=True)

    # ---- steady-state engine chunk (the real unit; already one dispatch) -----
    chunk_its = 200

    @jax.jit
    def chunk(y, z, i):
        c = _init_carry(Latents(y, z), jax.random.PRNGKey(i))
        c2, _, _ = _optimize_chunk_impl(
            model, params, x, jnp.float32(0.01), SGA, chunk_its, c, 0, 1
        )
        return jnp.sum(c2.latents.y) + jnp.sum(c2.latents.z)

    try:
        float(chunk(y0, z0, 0))
        ts = []
        for i in range(1, REPS + 1):
            yv = y0 + jnp.float32(1e-6 * i)
            t0 = time.perf_counter()
            float(chunk(yv, z0, i))
            ts.append((time.perf_counter() - t0) * 1000)
        ms = float(np.median(ts))
        results["scan200_per_iter"] = {
            "ms": round(ms / chunk_its, 3), "chunk_ms": round(ms, 1),
            "reps_ms": [round(t, 1) for t in ts],
        }
    except Exception as e:
        results["scan200_per_iter"] = {"error": f"{type(e).__name__}: {e}"}

    out = {
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "config": dict(batch=batch, h=h, w=w, nf=nf, dtype="bf16"),
        "method": f"chained-scan slope (k={K1},{K2}; per-iter = slope)",
        "peak_flops": PEAK_FLOPS,
        "hbm_bw": HBM_BW,
        "phases": results,
    }
    with open("results/profile_breakdown_r5.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
