from nic_tpu.evaluation.metrics import msssim, msssim_db, psnr
from nic_tpu.evaluation.results import save_rd_results, rd_results_filename

__all__ = ["psnr", "msssim", "msssim_db", "save_rd_results", "rd_results_filename"]
