from nic_tpu.infer.adam import AdamState, adam_init, adam_update
from nic_tpu.infer.methods import DANNEAL, MAP, METHODS, SGA, STE, UNOISE, MethodSpec
from nic_tpu.infer.engine import LatentOptimizer
from nic_tpu.infer.bb import BBMethodSpec, BB_SGA, BB_NO_SGA, BB_PLAIN, BBLatentOptimizer

__all__ = [
    "AdamState",
    "adam_init",
    "adam_update",
    "MethodSpec",
    "SGA",
    "MAP",
    "STE",
    "UNOISE",
    "DANNEAL",
    "METHODS",
    "LatentOptimizer",
    "BBMethodSpec",
    "BB_SGA",
    "BB_NO_SGA",
    "BB_PLAIN",
    "BBLatentOptimizer",
]
