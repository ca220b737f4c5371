from nic_tpu.train.data import PatchPipeline
from nic_tpu.train.trainer import TrainConfig, Trainer

__all__ = ["PatchPipeline", "TrainConfig", "Trainer"]
