"""Training runtime: fused GAN steps, state, loops, checkpoints (SURVEY §2.1)."""

from .checkpoint import (
    export_pth,
    import_pth,
    resolve_checkpoint,
    restore_native,
    save_native,
)
from .human_guided import HumanGuidedTrainer
from .loop import loss_config_for_initial_training, train
from .state import GANTrainState, adam
from .train_metrics import MetricsLogger, gradient_norms, learning_rates
from .checkpoint_utils import load_checkpoint, save_checkpoint, validate_checkpoint
from .step import bce_with_logits, make_eval_step, make_train_step

__all__ = [
    "GANTrainState",
    "MetricsLogger",
    "gradient_norms",
    "learning_rates",
    "load_checkpoint",
    "save_checkpoint",
    "validate_checkpoint",
    "HumanGuidedTrainer",
    "adam",
    "bce_with_logits",
    "export_pth",
    "import_pth",
    "loss_config_for_initial_training",
    "make_eval_step",
    "make_train_step",
    "resolve_checkpoint",
    "restore_native",
    "save_native",
    "train",
]
