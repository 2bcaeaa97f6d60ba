"""Training layer: optimizers, jitted steps, checkpointing, epoch loops."""

from gaudi_tpu.train.optim import adaptive_grad_clip, make_optimizer
from gaudi_tpu.train.checkpoints import load_checkpoint, save_checkpoint

__all__ = [
    "adaptive_grad_clip",
    "make_optimizer",
    "save_checkpoint",
    "load_checkpoint",
]
