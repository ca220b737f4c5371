"""Method specifications for the iterative-inference engines.

One spec per reference script; constants cite their sources:
  SGA      sga.py:190-196   (lr .005, 2000 its, exp0 schedule r=1e-3 t0=700 ub=.5)
  MAP      map.py:150-156   (lr .005, early stop on rounded objective / 10 its)
  STE      ste.py:161-164   (lr 1e-4, early stop on relaxed objective / 10 its)
  UNOISE   unoise.py        (lr .005, fresh U(-.5,.5) noise each step)
  DANNEAL  danneal.py:183-193 (lr .005, plain exp schedule r=4e-3 ub=.2)
"""

from dataclasses import dataclass


@dataclass(frozen=True)
class MethodSpec:
    name: str
    iterations: int = 2000
    lr: float = 0.005
    annealing_scheme: str = "exp0"
    annealing_rate: float = 1e-3
    t0: int = 700
    temperature_ub: float = 0.5
    early_stop: bool = False
    probe_interval: int = 10
    # Distortion term of the optimized objective: "mse" (the reference's
    # only choice) or "msssim" (lmbda * (1 - MS-SSIM) + bpp) for models
    # trained with --distortion msssim. Batch engine only; images >= 176px.
    distortion: str = "mse"
    # unoise only: where the Gaussian mean used to quantize the transmitted
    # y comes from. "quantized_z" (default): mu = h_s(round(z)) — decodable,
    # a deliberate deviation. "noisy_z": mu = h_s(z + U(-.5,.5)), the
    # reference's exact A3 semantics (unoise.py:82,97) — the decoder cannot
    # reproduce this mean, so these streams are estimate-only.
    unoise_mu_source: str = "quantized_z"

    def replace(self, **kw) -> "MethodSpec":
        from dataclasses import replace as _replace

        return _replace(self, **kw)


SGA = MethodSpec(name="sga")
MAP = MethodSpec(name="map", early_stop=True)
STE = MethodSpec(name="ste", lr=1e-4, early_stop=True)
UNOISE = MethodSpec(name="unoise")
DANNEAL = MethodSpec(
    name="danneal", annealing_scheme="exp", annealing_rate=4e-3, temperature_ub=0.2
)

METHODS = {m.name: m for m in (SGA, MAP, STE, UNOISE, DANNEAL)}
