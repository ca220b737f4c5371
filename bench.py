"""Headline benchmark: SGA iterative-inference throughput per chip.

The reference's flagship workload (sga.py: 2000 host-round-trip Adam steps
per image batch) rebuilt as jit-compiled on-device scans. Prints ONE JSON
line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}.

Config mirrors the reference's own eval batching: Kodak-sized images at the
1e7-pixel batch budget (configs.py:5-9 gives round(1e7/393216) = 25 images;
we use 24), full 2000 iterations, num_filters=192. Transform convolutions
run in bfloat16 (validated against fp32 in tests); likelihood/rate math is
fp32.

Two anchors for vs_baseline:
  * assumed: 1/60 images/sec — "on the order of a minute per Kodak image"
    for the TF1 code on a contemporary GPU (BASELINE.md publishes no speed
    numbers; BASELINE.json's north star is >= 10x this).
  * measured: a reference-loop emulation run on the SAME chip and batch —
    one device dispatch per optimization step, gradients shipped to host,
    numpy Adam, latents fed back (exactly the sga.py:210-215 loop shape,
    with the reference's from-scratch numpy Adam, adam.py:8-59). Steady-
    state per-step time x 2000 steps gives the anchor. Same model dtype
    (bf16) as the fast path, so the measured ratio isolates the loop
    structure — conservative, since TF1 itself ran fp32.

The JSON also carries a step-time/MFU breakdown so perf changes are
attributable: avg ms per SGA iteration, MXU utilization from XLA's flop
count of the scan body x trip count (cost_analysis counts a scan body once)
cross-checked by an analytic conv FLOP count, all 3 timed-run walls, and a
fixed chained-matmul calibration time that fingerprints the tunnel's speed
for the session (per-dispatch latency varies ~4x by time of day).

Run `python bench.py --reference-emulation` to run a longer emulation
measurement alone.
"""

import json
import os
import subprocess
import sys
import time

REFERENCE_IMAGES_PER_SEC = 1.0 / 60.0  # TF1 SGA anchor (see module docstring)
# TPU v5e (lite) peak FLOP/s per chip: ~197 TFLOP/s bf16; int8 is 2x that
# (394 TOP/s). The bench's transform convs run bf16 (int8 only under
# --quant-int8), so MFU normalizes by the bf16 peak by default.
V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_INT8_OPS = 394e12

_INNER_ENV = "NIC_TPU_BENCH_INNER"


def _run_with_retry(extra_args) -> int:
    """Run the benchmark in a subprocess, retrying once: the TPU tunnel
    occasionally kills the worker process mid-run, which poisons the JAX
    client — a fresh process is the only recovery."""
    env = dict(os.environ, **{_INNER_ENV: "1"})
    for attempt in range(3):
        try:
            # stderr passes through live (stage progress markers land in the
            # caller's log even if the run is killed by an outer timeout —
            # the r5 window-1 bench timed out with zero attribution because
            # everything was captured); stdout is parsed for the JSON line.
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), *extra_args],
                env=env,
                stdout=subprocess.PIPE,
                text=True,
                timeout=3000,  # a down tunnel hangs dispatches; don't hang
            )
        except subprocess.TimeoutExpired:
            sys.stderr.write(
                f"bench attempt {attempt + 1} timed out (tunnel outage?); "
                "retrying in 120s...\n"
            )
            time.sleep(120)
            continue
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                print(line)
                return 0
        sys.stderr.write(f"bench attempt {attempt + 1} failed; retrying...\n")
    return 1


def _stage(msg):
    """Progress marker on stderr with a UTC stamp: makes an externally
    killed run attributable to the stage it died in."""
    sys.stderr.write(
        f"[bench {time.strftime('%H:%M:%S', time.gmtime())}Z] {msg}\n"
    )
    sys.stderr.flush()


def _build(batch, h, w, quant=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nic_tpu.infer.engine import LatentOptimizer
    from nic_tpu.models.mbt2018 import MeanScaleHyperprior

    model = MeanScaleHyperprior(
        num_filters=192, compute_dtype=jnp.bfloat16, quant=quant
    )
    x0 = jnp.zeros((batch, h, w, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), x0, training=True, rng=jax.random.PRNGKey(1)
    )
    opt = LatentOptimizer(model, variables["params"])
    x = jnp.asarray(
        np.random.default_rng(0).random((batch, h, w, 3), dtype=np.float32)
    )
    return model, variables["params"], opt, x


def _measure_reference_emulation(model, params, x, iterations=2000,
                                 timed_steps=100, lmbda=0.01):
    """Per-step time of the TF1 loop shape on this chip: one jit dispatch
    per step (fwd+bwd), gradients to host, numpy Adam (reference
    adam.py:8-59 semantics), latents fed back as fresh arrays. Returns
    (images_per_sec_extrapolated_to_2000_its, per_step_seconds)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nic_tpu.infer.engine import Latents, _amortized_init, _rd_loss

    @jax.jit
    def grad_step(y, z, xx, T, key):
        def loss_fn(yy, zz):
            loss, _ = _rd_loss(
                model, params, Latents(yy, zz), xx, lmbda, T, key, "sga"
            )
            return loss

        return jax.value_and_grad(loss_fn, argnums=(0, 1))(y, z)

    y0, z0 = _amortized_init(model, params, x)
    # np.array (not asarray): device arrays convert to READ-ONLY numpy
    # views, and the Adam update below mutates in place (BENCH_r02/r03
    # shipped without a measured anchor because of exactly this).
    y, z = np.array(y0), np.array(z0)

    # Reference numpy Adam state (adam.py: beta1=.9, beta2=.999, eps=1e-8).
    lr, b1, b2, eps = 0.005, 0.9, 0.999, 1e-8
    m = {"y": np.zeros_like(y), "z": np.zeros_like(z)}
    v = {"y": np.zeros_like(y), "z": np.zeros_like(z)}

    def temperature(t):  # exp0 schedule, sga.py:190-196
        T = 0.5 if t < 700 else 0.5 * np.exp(-1e-3 * (t - 700))
        return float(np.clip(T, 1e-8, 0.5))

    def host_step(t, timing=True):
        key = jax.random.PRNGKey(t)
        loss, (gy, gz) = grad_step(
            jnp.asarray(y), jnp.asarray(z), x, temperature(t), key
        )
        # Device -> host boundary, every step (the sess.run fetch).
        gy, gz = np.asarray(gy), np.asarray(gz)
        tt = t + 1
        lr_t = lr * np.sqrt(1 - b2 ** tt) / (1 - b1 ** tt)
        for name, p, g in (("y", y, gy), ("z", z, gz)):
            m[name] = b1 * m[name] + (1 - b1) * g
            v[name] = b2 * v[name] + (1 - b2) * g * g
            p -= lr_t * m[name] / (np.sqrt(v[name]) + eps)
        return float(loss)

    for t in range(3):  # warmup/compile
        host_step(t)
    t0 = time.perf_counter()
    for t in range(3, 3 + timed_steps):
        host_step(t)
    per_step = (time.perf_counter() - t0) / timed_steps
    images_per_sec = x.shape[0] / (per_step * iterations)
    return images_per_sec, per_step


def _hand_step_flops(batch, h, w, nf=192):
    """Analytic FLOP count of one SGA iteration at bench shapes: forward
    g_s + h_s convolutions (the latents are the only variables, so the
    backward pass needs one input-cotangent conv per forward conv — ~1x
    forward, no weight grads). GDN channel mixes (1x1 convs) included.
    Cross-checks the XLA cost-analysis number."""

    def conv(kh, kw, cin, cout, ho, wo, up=1):
        # A stride-up-s transposed conv has only kh*kw/s^2 real MACs per
        # OUTPUT pixel on average (each output is hit by a 1/s^2 slice of
        # the kernel taps) — charging all kh*kw taps overstated the hand
        # count 4x for the up-2 layers (VERDICT r3 weak #3).
        return 2.0 * kh * kw * cin * cout * ho * wo * batch / (up * up)

    yh, yw = h // 16, w // 16
    zh, zw = h // 64, w // 64
    f = 0.0
    # g_s: 4x 5x5 stride-up-2 (nn_models.py:39-70), IGDN channel mix after
    # each of the first three (1x1 conv form, ops/gdn.py).
    ho, wo, cin = yh, yw, nf
    for i, cout in enumerate([nf, nf, nf, 3]):
        ho, wo = ho * 2, wo * 2
        f += conv(5, 5, cin, cout, ho, wo, up=2)
        if i < 3:
            f += conv(1, 1, cout, cout, ho, wo)  # IGDN norm pool
        cin = cout
    # h_s (MBT2018 variant, nn_models.py:140-170): 5x5/up2 nf -> 5x5/up2
    # 1.5nf -> 3x3/up1 2nf.
    f += conv(5, 5, nf, nf, zh * 2, zw * 2, up=2)
    f += conv(5, 5, nf, nf * 3 // 2, zh * 4, zw * 4, up=2)
    f += conv(3, 3, nf * 3 // 2, nf * 2, zh * 4, zw * 4)
    return 2.0 * f  # fwd + input-cotangent bwd


def _chunk_mfu(model, params, opt, x, chunk_seconds, chunk_its=200):
    """MXU utilization of the steady-state SGA chunk program.

    XLA's compiled cost_analysis() counts a lax.scan/while body ONCE
    regardless of trip count (verified: scans of length 1/10/100 report
    identical flops), so the chunk program's reported flops ~= one
    iteration's flops. MFU = body_flops * chunk_its / wall / peak. Returns
    (mfu_xla, mfu_hand) where mfu_hand uses an analytic conv FLOP count of
    one iteration as a cross-check; either may be None."""
    import jax
    import jax.numpy as jnp

    from nic_tpu.infer.engine import (
        Latents,
        _amortized_init,
        _init_carry,
        _optimize_chunk_impl,
    )
    from nic_tpu.infer.methods import SGA

    batch, h, w = x.shape[0], x.shape[1], x.shape[2]
    mfu_hand = None
    if chunk_seconds > 0:
        mfu_hand = (
            _hand_step_flops(batch, h, w)
            * chunk_its
            / chunk_seconds
            / V5E_PEAK_BF16_FLOPS
        )
    try:
        y0, z0 = _amortized_init(model, params, x)
        carry = _init_carry(Latents(y0, z0), jax.random.PRNGKey(0))
        lowered = jax.jit(
            _optimize_chunk_impl, static_argnums=(0, 4, 5, 7, 8)
        ).lower(model, params, x, jnp.float32(0.01), SGA, chunk_its, carry, 0, 1)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        body_flops = float(cost.get("flops", 0.0))
        if body_flops <= 0 or chunk_seconds <= 0:
            return None, mfu_hand
        mfu = body_flops * chunk_its / chunk_seconds / V5E_PEAK_BF16_FLOPS
        return mfu, mfu_hand
    except Exception:
        return None, mfu_hand


def _calibration_ms(n=6, dim=2048):
    """Wall time of a fixed chained-matmul program: a session-to-session
    tunnel-speed fingerprint recorded next to every headline number (the
    tunnel's per-dispatch latency varies ~4x by time of day; this makes
    drift distinguishable from real regressions).

    The tunnel memoizes identical (program, inputs) dispatches, so every
    rep runs on a DIFFERENT input (rep index folded into the matrix). The
    tunnel also ACKs block_until_ready before compute finishes, so each
    rep is timed until a HOST-SIDE scalar fetch of the result completes —
    a device->host transfer of the answer cannot return early. Physically
    impossible times are still rejected as a backstop: the chain is
    64 x 2*2048^3 ~= 1.1 TFLOP of data-dependent bf16 matmuls, >= ~5.6 ms
    at the v5e 197 TFLOP/s peak (BENCH_r03 recorded 0.0 ms via
    block_until_ready, and the r4 int8 run recorded null because every
    block_until_ready rep timed under the floor; VERDICT r3 weak #2)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def prog(a):
        def body(x, _):
            return x @ a + 0.001 * x, None

        out, _ = jax.lax.scan(body, a, None, length=64)
        # Scalar result: the host fetch below transfers 4 bytes, so the
        # timed quantity is compute + per-dispatch latency, not bandwidth.
        return jnp.float32(out[0, 0])

    base = jnp.full((dim, dim), 0.001, jnp.bfloat16)
    float(prog(base))  # compile
    floor_s = 64 * 2.0 * dim ** 3 / V5E_PEAK_BF16_FLOPS * 0.2  # 5x peak = fake
    best = float("inf")
    accepted, tries = 0, 0
    # Wall-clock budget: when the tunnel is in a slow phase each try costs a
    # full dispatch round trip, and the reject-and-retry loop can eat tens of
    # minutes (the r5 window-1 bench died to an outer timeout with 16.7 min
    # spent HERE). The fingerprint is diagnostic, not a deliverable — take
    # whatever was accepted when the budget runs out.
    budget_t0 = time.perf_counter()
    while accepted < n and tries < 4 * n:
        if time.perf_counter() - budget_t0 > 120.0 and accepted:
            break
        if time.perf_counter() - budget_t0 > 300.0:
            break
        tries += 1
        # Distinct input per rep (steps > bf16 ulp at 0.001) so the
        # (program, inputs) pair is never repeated and cannot be memoized.
        a = (base * (1.0 + 0.01 * tries)).block_until_ready()
        t0 = time.perf_counter()
        float(prog(a))  # blocks until the real answer reaches the host
        dt = time.perf_counter() - t0
        if dt < floor_s:
            continue  # cache-served response; remeasure
        best = min(best, dt)
        accepted += 1
    return best * 1000.0 if accepted else None


def main(argv):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/nic_tpu_jax_cache")
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    import numpy as np

    from nic_tpu.infer.methods import SGA

    batch = 24  # reference pixel budget: round(1e7 / 393216) = 25 Kodak images
    h, w = 768, 512  # Kodak-sized
    iterations = 2000  # the reference's fixed setting (sga.py:192)
    # Opt-in int8 decode-transform forward (ops/int8conv.py); measured via
    # scripts/exp_int8.py before flipping any default.
    quant = "int8" if "--quant-int8" in argv else None

    model, params, opt, x = _build(batch, h, w, quant=quant)

    if "--decode" in argv:
        # Serving-side metric: full mbt2018 decompress wall (host rANS +
        # device h_s/g_s), per image — the reference's only decoder path
        # (mbt2018.py:248-295). A/Bs the single whole-batch rANS stream
        # (reference PackedTensors shape) against per-image streams decoded
        # by C++ threads, and reports a host-rANS vs device-time breakdown
        # so the serving bottleneck is attributable (VERDICT r2 item 6).
        import numpy as np

        from nic_tpu.coding.codec import HyperpriorCodec

        codec = HyperpriorCodec(model, params)
        xs = np.asarray(x[:4])

        host_rans_s = [0.0]
        orig_decode, orig_decode_batch = codec.coder.decode, codec.coder.decode_batch

        def _timed(fn):
            def wrapped(*a, **k):
                t0 = time.perf_counter()
                out = fn(*a, **k)
                host_rans_s[0] += time.perf_counter() - t0
                return out

            return wrapped

        codec.coder.decode = _timed(orig_decode)
        codec.coder.decode_batch = _timed(orig_decode_batch)

        results = {}
        for variant, parallel, unfused, slim in (
            ("single_stream", False, False, False),
            ("per_image_streams", True, False, False),
            # Pre-fusion dispatch pipeline (4+ device programs instead of 2):
            # isolates how much of the decode wall is tunnel dispatch count.
            ("single_stream_unfused", False, True, False),
            # Slim host<->device transfers (uint8 indexes, int16 symbols,
            # uint8 pixels): isolates how much is tunnel BANDWIDTH.
            ("single_stream_slim", False, False, True),
            ("per_image_streams_slim", True, False, True),
        ):
            # Pin every variant explicitly ("0" = forced off) so the A/B
            # never measures whatever codec.DECODE_DEFAULT happens to be.
            os.environ["NIC_TPU_DECODE_UNFUSED"] = "1" if unfused else "0"
            os.environ["NIC_TPU_DECODE_SLIM"] = "1" if slim else "0"
            blob, _ = codec.compress(xs, parallel=parallel)
            codec.decompress(blob)  # warm compiles
            best, best_host = float("inf"), 0.0
            for _ in range(3):
                host_rans_s[0] = 0.0
                t0 = time.perf_counter()
                codec.decompress(blob)
                dt = time.perf_counter() - t0
                if dt < best:
                    best, best_host = dt, host_rans_s[0]
            results[variant] = {
                "images_per_sec": round(xs.shape[0] / best, 3),
                "wall_s": round(best, 3),
                "host_rans_s": round(best_host, 3),
                "device_and_other_s": round(best - best_host, 3),
                "stream_bytes": len(blob),
            }
        os.environ.pop("NIC_TPU_DECODE_UNFUSED", None)
        os.environ.pop("NIC_TPU_DECODE_SLIM", None)
        print(
            json.dumps(
                {
                    "metric": f"mbt2018 decompress ({h}x{w}, nf=192)",
                    "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                    "value": results["single_stream"]["images_per_sec"],
                    "unit": "images/sec/chip",
                    "batch": xs.shape[0],
                    **results,
                }
            )
        )
        return

    if "--reference-emulation" in argv:
        ips, per_step = _measure_reference_emulation(
            model, params, x, iterations, timed_steps=100
        )
        print(
            json.dumps(
                {
                    "metric": "TF1-loop-shape SGA emulation (per-step dispatch "
                    "+ host numpy Adam, extrapolated to 2000 its)",
                    "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                    "value": round(ips, 5),
                    "unit": "images/sec/chip",
                    "per_step_ms": round(per_step * 1000, 1),
                }
            )
        )
        return

    # Session-speed fingerprint BEFORE the heavy runs (tunnel drift defense).
    _stage("calibration")
    try:
        calibration_ms = _calibration_ms()
    except Exception:
        calibration_ms = None
    _stage(f"calibration done ({calibration_ms} ms); warmup/compile")

    # Warmup: compile all chunked programs with a short run.
    warm = opt.optimize(x, lmbda=0.01, method=SGA.replace(iterations=400), seed=0)
    assert np.all(np.isfinite(warm["est_bpp"]))

    # Best of 3 timed runs; every run's wall time goes into the JSON so
    # tunnel drift (4x by time of day) is visible, not hidden in a min().
    run_times = []
    for s in (1, 2, 3):
        _stage(f"timed run {s}/3")
        t0 = time.perf_counter()
        res = opt.optimize(x, lmbda=0.01, method=SGA, seed=s)
        run_times.append(time.perf_counter() - t0)
        assert np.all(np.isfinite(res["est_bpp"]))
    best_dt = min(run_times)
    images_per_sec = batch / best_dt
    step_ms = best_dt / iterations * 1000.0

    # Measured anchor: the reference's loop shape on this same chip/batch.
    # Retried — a populated anchor is a deliverable, not best-effort
    # (BENCH_r02 shipped without one because a single throw was swallowed).
    # 100 timed steps (VERDICT r4 weak #1: 30 was too few for a quantity
    # that swings 1.8x run-to-run); --no-anchor skips it for A/B windows
    # that pair against a same-session full run instead.
    measured_anchor, anchor_step_s, anchor_err = None, None, None
    anchor_attempts = 0 if "--no-anchor" in argv else 3
    for attempt in range(anchor_attempts):
        try:
            _stage(f"measured anchor (100 per-dispatch steps), attempt {attempt + 1}")
            measured_anchor, anchor_step_s = _measure_reference_emulation(
                model, params, x, iterations
            )
            anchor_err = None
            break
        except Exception as e:
            anchor_err = f"{type(e).__name__}: {e}"
            sys.stderr.write(
                f"reference emulation attempt {attempt + 1} failed: {e}\n"
            )
            time.sleep(5)

    _stage("MFU cost analysis")
    mfu, mfu_hand = _chunk_mfu(model, params, opt, x, best_dt / iterations * 200)
    peak = V5E_PEAK_INT8_OPS if quant else V5E_PEAK_BF16_FLOPS
    scale = V5E_PEAK_BF16_FLOPS / peak  # _chunk_mfu normalizes by bf16 peak
    # The two MFU numbers cross-check each other: XLA's cost_analysis of
    # the scan body vs an analytic conv count. They must agree within 1.5x
    # (hand counts only the transform convs, so hand <= xla is expected);
    # a larger mismatch means one of them is miscounting — say so.
    mfu_note = None
    if mfu and mfu_hand:
        ratio = mfu / mfu_hand
        if not (1 / 1.5 <= ratio <= 1.5):
            mfu_note = (
                f"MFU cross-check mismatch: xla/hand = {ratio:.2f} "
                "(expected within 1.5x; one count is wrong)"
            )

    out = {
        "metric": (
            f"SGA inference throughput ({iterations} its, {h}x{w}, nf=192, "
            f"{'int8-fwd' if quant else 'bf16'})"
        ),
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "value": round(images_per_sec, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / REFERENCE_IMAGES_PER_SEC, 2),
        "step_ms": round(step_ms, 2),
        "run_times_s": [round(t, 2) for t in run_times],
        "calibration_matmul_ms": (
            round(calibration_ms, 1) if calibration_ms is not None else None
        ),
        "mfu": round(mfu * scale, 4) if mfu is not None else None,
        "mfu_hand_conv_only": (
            round(mfu_hand * scale, 4) if mfu_hand is not None else None
        ),
        "assumed_anchor_images_per_sec": round(REFERENCE_IMAGES_PER_SEC, 5),
    }
    if mfu_note:
        out["mfu_note"] = mfu_note
    if measured_anchor is not None:
        out["measured_anchor"] = round(measured_anchor, 5)
        out["measured_anchor_step_ms"] = round(anchor_step_s * 1000, 1)
        out["measured_anchor_timed_steps"] = 100
        out["vs_measured_anchor"] = round(images_per_sec / measured_anchor, 2)
    elif anchor_err is not None:
        out["measured_anchor_error"] = anchor_err
    print(json.dumps(out))


if __name__ == "__main__":
    if os.environ.get(_INNER_ENV):
        main(sys.argv[1:])
    else:
        sys.exit(_run_with_retry(sys.argv[1:]))
