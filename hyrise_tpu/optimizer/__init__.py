from hyrise_tpu.optimizer.optimizer import Optimizer

__all__ = ["Optimizer"]
