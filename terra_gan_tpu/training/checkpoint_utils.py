"""Checkpoint validation + atomic-save helpers (reference:
utils/checkpoint_utils/checkpoint_utils.py).

Same API surface:
  * validate_checkpoint — require {epoch, generator_state_dict,
    optimizer_G_state_dict} with a legacy raw-state-dict fallback
    (checkpoint_utils.py:8-42)
  * load_checkpoint — validated load into a GANTrainState template
  * save_checkpoint — atomic .tmp + rename write
    (checkpoint_utils.py:74-113)

Unlike the reference (where main_pipeline/train.py did their own ad-hoc
torch.save and never called this module), the training loop here routes
through training/checkpoint.py which uses the same atomic pattern.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

logger = logging.getLogger(__name__)

REQUIRED_KEYS = {"epoch", "generator_state_dict", "optimizer_G_state_dict"}


def validate_checkpoint(obj: Any) -> Tuple[bool, str]:
    """(is_valid, kind) where kind is 'full', 'legacy', or 'invalid'."""
    if isinstance(obj, dict) and REQUIRED_KEYS <= set(obj):
        return True, "full"
    if isinstance(obj, dict) and any(
        k.endswith("input_conv.weight") or k.startswith("enc1")
        for k in obj
    ):
        # legacy raw generator state dict
        return True, "legacy"
    if isinstance(obj, dict) and "generator_state_dict" in obj:
        return True, "partial"
    return False, "invalid"


def load_checkpoint(path: str | Path, template) -> Tuple[Any, Dict]:
    """Validated load of a .pth checkpoint into a GANTrainState."""
    from ..utils.torch_compat import load_pth
    from .checkpoint import import_pth

    obj = load_pth(path)
    ok, kind = validate_checkpoint(obj)
    if not ok:
        raise ValueError(f"invalid checkpoint at {path}")
    logger.info("loading %s checkpoint from %s", kind, path)
    return import_pth(path, template)


def save_checkpoint(
    path: str | Path,
    state,
    epoch: int = 0,
    config: Optional[Dict] = None,
    extra: Optional[Dict] = None,
) -> Path:
    """Atomic reference-layout save (tmp + rename)."""
    from .checkpoint import export_pth

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    # export_pth already writes to .tmp and renames
    export_pth(path, state, epoch=epoch, config=config, extra=extra)
    return path
