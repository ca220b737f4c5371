from nic_tpu.ops.bounds import lower_bound, upper_bound
from nic_tpu.ops.stats import (
    box_convolved_gaussian_likelihood,
    gaussian_standardized_cumulative,
    log_normal_pdf,
    standardized_quantile,
)
from nic_tpu.ops.quantize import (
    round_ste,
    round_relu_ste,
    round_crelu_ste,
    sga_relax,
    danneal_relax,
    sga_logits,
)
from nic_tpu.ops.schedules import annealed_temperature
from nic_tpu.ops.gdn import gdn

__all__ = [
    "lower_bound",
    "upper_bound",
    "box_convolved_gaussian_likelihood",
    "gaussian_standardized_cumulative",
    "log_normal_pdf",
    "standardized_quantile",
    "round_ste",
    "round_relu_ste",
    "round_crelu_ste",
    "sga_relax",
    "danneal_relax",
    "sga_logits",
    "annealed_temperature",
    "gdn",
]
