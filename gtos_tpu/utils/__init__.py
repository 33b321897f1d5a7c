from gtos_tpu.utils.config import ModelConfig, TrainConfig

__all__ = ["ModelConfig", "TrainConfig"]
