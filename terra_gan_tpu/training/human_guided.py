"""Human-guided fine-tuning (reference: mvp_gan/src/training/
human_guided_trainer.py:44-262).

Generator-only fine-tune (no discriminator) on matched human
annotations with HumanGuidedLoss, Adam at
training.modes.human_guided.learning_rate. Per-epoch checkpoints
generator_epoch_{e} + best_model on lowest epoch loss; NaN/Inf batch
losses excluded from the epoch average (the reference's guard at
human_guided_trainer.py:146-148); same metric names (epoch.loss,
epoch.time, epoch.success_rate).

The whole G step (forward + HumanGuidedLoss incl. VGG + Adam update)
is one jitted program; human masks ride the batch dict.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..data.dataset import BatchLoader
from ..losses import (
    HumanGuidedLossConfig,
    InpaintingLossConfig,
    human_guided_loss,
)
from ..models.vgg import VGGParams
from ..utils.torch_compat import generator_vars_to_torch_state, save_pth
from .state import adam

logger = logging.getLogger(__name__)


def hg_loss_config(config: Config) -> HumanGuidedLossConfig:
    """HumanGuidedLoss DOES read the config boundary weight
    (losses.py:139), unlike initial training: the reference uses
    `loss_weights.get('boundary', 0.5)` — an EXPLICIT 0 in the yaml
    means 0; only a missing key falls back to 0.5."""
    lw = config.training.loss_weights
    raw_lw = (config.raw.get("training") or {}).get("loss_weights") or {}
    boundary = raw_lw.get("boundary", 0.5)
    if boundary is None:
        boundary = 0.5
    return HumanGuidedLossConfig(
        base=InpaintingLossConfig(
            perceptual_weight=lw.perceptual,
            tv_weight=lw.tv,
            boundary_weight=float(boundary),
            vgg_remat=config.training.vgg_remat,
        ),
        base_loss_weight=config.training.human_guided.base_loss_weight,
        human_feedback_weight=config.training.human_guided.human_feedback_weight,
    )


class HumanGuidedTrainer:
    def __init__(self, config: Config, tracker=None):
        self.config = config
        self.tracker = tracker
        self.loss_config = hg_loss_config(config)

    def _make_step(self, generator, tx):
        loss_cfg = self.loss_config

        def loss_fn(g_params, g_stats, batch, vgg_params):
            real, mask = batch["image"], batch["mask"]
            gen, updates = generator.apply(
                {"params": g_params, "batch_stats": g_stats},
                real * mask, mask, True, mutable=["batch_stats"],
            )
            total, comps = human_guided_loss(
                gen, real, mask, batch.get("human_mask"), vgg_params,
                loss_cfg,
                compute_dtype=getattr(generator, "compute_dtype", None),
            )
            return total, (updates["batch_stats"], comps)

        def step(g_params, g_stats, opt_state, batch, vgg_params):
            (loss, (new_stats, comps)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(g_params, g_stats, batch, vgg_params)
            upd, new_opt = tx.update(grads, opt_state, g_params)
            new_params = optax.apply_updates(g_params, upd)
            return new_params, new_stats, new_opt, loss, comps

        return jax.jit(step, donate_argnums=(0, 2))

    def train(
        self,
        generator,
        variables: Dict[str, Any],
        dataset,
        num_epochs: Optional[int] = None,
        checkpoint_dir: str | Path = "checkpoints_hg",
        vgg_params: Optional[VGGParams] = None,
    ) -> Dict[str, Any]:
        hg = self.config.training.human_guided
        num_epochs = num_epochs or hg.epochs
        checkpoint_dir = Path(checkpoint_dir)
        checkpoint_dir.mkdir(parents=True, exist_ok=True)

        tx = adam(hg.learning_rate)
        # copy (not view) the caller's params: the jitted step donates
        # its param buffers (donate_argnums), and jnp.asarray on a jax
        # array is a no-op — without the copy, the caller's `variables`
        # would be silently deleted by the first step
        g_params = jax.tree.map(jnp.array, variables["params"])
        g_stats = jax.tree.map(
            jnp.array, variables.get("batch_stats", {})
        )
        opt_state = tx.init(g_params)
        step_fn = self._make_step(generator, tx)

        # reference keeps partial tail batches (DataLoader default)
        loader = BatchLoader(
            dataset, batch_size=hg.batch_size, shuffle=True,
            drop_last=False,
            num_workers=self.config.training.feed_workers,
        )
        best_loss = float("inf")
        t0 = time.time()
        history = []

        from .loop import (
            TrainingPreempted,
            _fault_injection,
            _PREEMPT,
            _preemption_guard,
        )

        with _preemption_guard():
            return self._run_epochs(
                generator, num_epochs, checkpoint_dir, loader, step_fn,
                g_params, g_stats, opt_state, vgg_params, best_loss, t0,
                history, TrainingPreempted, _fault_injection, _PREEMPT,
            )

    def _run_epochs(
        self, generator, num_epochs, checkpoint_dir, loader, step_fn,
        g_params, g_stats, opt_state, vgg_params, best_loss, t0, history,
        TrainingPreempted, _fault_injection, _PREEMPT,
    ) -> Dict[str, Any]:
        for epoch in range(num_epochs):
            t_epoch = time.time()
            epoch_loss, success, batches = 0.0, 0, 0
            for batch_idx, batch in enumerate(loader):
                _fault_injection(epoch, batch_idx)
                if _PREEMPT.is_set():
                    # same discipline as the initial-training loop:
                    # persist the last committed state, then surface
                    logger.warning(
                        "HG preemption requested: checkpointing at "
                        "epoch %d, batch %d", epoch, batch_idx,
                    )
                    ckpt = {
                        "epoch": epoch,
                        "model_state_dict": generator_vars_to_torch_state(
                            {"params": jax.tree.map(np.asarray, g_params),
                             "batch_stats": jax.tree.map(
                                 np.asarray, g_stats)}
                        ),
                        "preempted": True,
                        "config": getattr(self.config, "raw", {}),
                    }
                    save_pth(checkpoint_dir / "preempted.pth", ckpt)
                    raise TrainingPreempted(
                        state=None, epoch=epoch,
                        checkpoint=checkpoint_dir / "preempted.pth",
                    )
                dev = {
                    k: jnp.asarray(v)
                    for k, v in batch.items()
                    if isinstance(v, np.ndarray)
                }
                g_params, g_stats, opt_state, loss, comps = step_fn(
                    g_params, g_stats, opt_state, dev, vgg_params
                )
                batches += 1
                lv = float(loss)
                if np.isfinite(lv):
                    epoch_loss += lv
                    success += 1
                if self.tracker is not None and batch_idx % 10 == 0:
                    self.tracker.log_training_batch(
                        batch_metrics={"loss": lv},
                        step=epoch * len(loader) + batch_idx,
                    )

            avg = epoch_loss / max(1, success) if epoch_loss > 0 else 0.0
            epoch_time = time.time() - t_epoch
            history.append(avg)
            if self.tracker is not None:
                self.tracker.log_metrics(
                    {
                        "epoch.loss": avg,
                        "epoch.time": epoch_time,
                        "epoch.success_rate": success / max(1, batches),
                    },
                    step=epoch,
                )

            # per-epoch + best checkpoints (human_guided_trainer.py:198-208)
            ckpt = {
                "epoch": epoch,
                "model_state_dict": generator_vars_to_torch_state(
                    {"params": jax.tree.map(np.asarray, g_params),
                     "batch_stats": jax.tree.map(np.asarray, g_stats)}
                ),
                "loss": avg,
                "config": getattr(self.config, "raw", {}),
            }
            try:
                save_pth(checkpoint_dir / f"generator_epoch_{epoch}.pth", ckpt)
                if 0.0 < avg < best_loss:
                    best_loss = avg
                    save_pth(checkpoint_dir / "best_model.pth", ckpt)
                    logger.info("new best HG model: loss=%.6f", best_loss)
            except Exception as e:
                logger.error("HG checkpoint save failed: %s", e)
            logger.info(
                "HG epoch %d: loss=%.6f time=%.2fs", epoch, avg, epoch_time
            )

        # a completed fine-tune supersedes any preempted.pth it resumed
        # from (same discipline as training/loop.py:_remove_preempted)
        preempted = checkpoint_dir / "preempted.pth"
        if preempted.exists():
            preempted.unlink()
            logger.info("consumed preempted HG checkpoint %s", preempted)

        return {
            "best_loss": best_loss if np.isfinite(best_loss) else None,
            "total_time": time.time() - t0,
            "epoch_losses": history,
            "variables": {"params": g_params, "batch_stats": g_stats},
        }
