"""nic_tpu: a TPU-native (JAX/XLA/Pallas/pjit) neural image compression framework.

Re-implements, TPU-first, the full capability surface of
mandt-lab/improving-inference-for-neural-image-compression
("Improving Inference for Neural Image Compression", Yang, Bamler, Mandt,
NeurIPS 2020):

- Mean-scale hyperprior models (MBT2018 base + bits-back variant) with
  data-parallel pjit training over a TPU mesh.
- Eight inference-time latent optimization methods (SGA, MAP, STE,
  uniform-noise, deterministic annealing, and three bits-back variants),
  each running as a single jit-compiled ``lax.scan`` with on-device Adam.
- A host-side C++ rANS entropy coder producing real bitstreams, with
  quantized-CDF tables computed from the on-device entropy models.
- PSNR / MS-SSIM / bpp evaluation on Kodak & Tecnick with the reference's
  results-file conventions.

The design is new (not a port): the reference is a TF1 graph-mode codebase
whose inference loops round-trip host<->device every step; here the whole
optimization loop lives in HBM.
"""

__version__ = "0.1.0"
