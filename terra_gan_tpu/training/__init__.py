"""Training runtime: fused GAN steps, state, loops (SURVEY §2.1)."""

from .state import GANTrainState, adam
from .step import bce_with_logits, make_eval_step, make_train_step

__all__ = [
    "GANTrainState",
    "adam",
    "bce_with_logits",
    "make_eval_step",
    "make_train_step",
]
