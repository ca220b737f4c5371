from nic_tpu.coding.coder import RansCoder
from nic_tpu.coding.tables import pmf_to_quantized_cdf, CdfTable
from nic_tpu.coding.container import PackedBitstream

__all__ = ["RansCoder", "pmf_to_quantized_cdf", "CdfTable", "PackedBitstream"]
