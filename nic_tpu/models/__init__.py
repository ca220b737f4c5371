from nic_tpu.models.layers import SignalConv, GDN
from nic_tpu.models.transforms import (
    AnalysisTransform,
    SynthesisTransform,
    HyperAnalysisTransform,
    HyperSynthesisTransform,
    MBT2018HyperSynthesisTransform,
)
from nic_tpu.models.factorized_prior import FactorizedEntropyModel
from nic_tpu.models.conditional import GaussianConditional

__all__ = [
    "SignalConv",
    "GDN",
    "AnalysisTransform",
    "SynthesisTransform",
    "HyperAnalysisTransform",
    "HyperSynthesisTransform",
    "MBT2018HyperSynthesisTransform",
    "FactorizedEntropyModel",
    "GaussianConditional",
]
