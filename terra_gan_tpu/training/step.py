"""Fused GAN train/eval steps (reference loop: mvp_gan/src/train.py:177-219).

One jitted XLA program per optimizer step: generator forward, full
inpainting loss + adversarial term, generator Adam update,
discriminator real/fake BCE and Adam update, and every BatchNorm
running-stat update — no host round-trips inside the step.

Faithful semantics reproduced from the reference:
  * G objective: InpaintingLoss(gen, real, mask) + BCE(D(gen), 1)
    (train.py:183-204). The reference constructs its criterion without
    a boundary weight, so the boundary term runs at the class default
    0.5 regardless of config (train.py:110-114, losses.py:14) — our
    default config mirrors that; pass an explicit
    InpaintingLossConfig to change it.
  * D objective: 0.5*(BCE(D(real),1) + BCE(D(stop_grad(gen)),0))
    (train.py:209-219), computed with the *pre-update* generator
    output, exactly as the torch code does (gen_imgs was produced
    before optimizer_G.step()).
  * BatchNorm running stats chronology matches torch: D's stats are
    updated three times per step in the order fake (G-step forward),
    real, fake-detached (train.py:202,211-212); G's once.
  * The D-step RECOMPUTES its fake forward D(stop_grad(gen)) with the
    live d_params. An earlier revision reused the G-step's fake logits
    (their VALUES are identical: same params, same input, train-mode
    BN normalizes by batch stats) — but a reused tensor is a constant
    under jax.grad, which silently zeroed the fake-half contribution
    to D's gradient, training D on the real half only. Found by the
    r3 float64 trajectory gate (loss curves diverged while every
    individual gradient matched); the recompute restores the
    reference's exact D objective (train.py:209-219). The recompute's
    FORWARD is free: XLA CSE merges it with the G-step's D(gen)
    (verified by conv-count analysis of the compiled step — the fix's
    9 extra convolutions are exactly the fake-half backward: 5 filter
    grads + the 4-conv cotangent chain, ~5-7% of the step and
    semantically irreducible). A hand-shared two-cotangent jax.vjp
    restructure compiles to the identical program — don't reopen.

The returned metrics dict mirrors the reference's batch metric names
(train.py:246-251).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..losses import InpaintingLossConfig, inpainting_loss
from .state import GANTrainState


def bce_with_logits(logits: jnp.ndarray, target: float) -> jnp.ndarray:
    """Mean BCEWithLogits against a constant 0/1 target, numerically stable."""
    x = logits.astype(jnp.promote_types(logits.dtype, jnp.float32))
    # max(x,0) - x*z + log1p(exp(-|x|))
    return jnp.mean(
        jnp.maximum(x, 0.0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x)))
    )


def make_train_step(
    generator,
    discriminator,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    loss_config: InpaintingLossConfig = InpaintingLossConfig(),
    loss_fn: Optional[Callable] = None,
    donate: bool = True,
    jit_compile: bool = True,
    loss_compute_dtype=None,
):
    """Build the fused train step.

    loss_fn: optional override with signature
      (pred, target, mask, vgg_params, batch) -> (loss, components);
      defaults to the reference InpaintingLoss. `batch` gives access to
      extra fields (e.g. human masks for the human-guided variant).

    Returns step(state, batch, vgg_params) -> (state, metrics) where
    batch = {'image': [B,H,W,1], 'mask': [B,H,W,1]} float32, mask 1 =
    preserved. vgg_params is an argument (not a closure capture) so the
    frozen VGG weights live in device memory as ordinary inputs.
    """

    base_loss = loss_fn or (
        lambda pred, target, mask, vgg, batch: inpainting_loss(
            pred, target, mask, vgg, loss_config,
            compute_dtype=loss_compute_dtype,
        )
    )

    def g_loss_fn(g_params, state: GANTrainState, batch, vgg_params):
        real, mask = batch["image"], batch["mask"]
        gen, g_updates = generator.apply(
            {"params": g_params, "batch_stats": state.g_stats},
            real * mask,
            mask,
            True,
            mutable=["batch_stats"],
        )
        recon_loss, comps = base_loss(gen, real, mask, vgg_params, batch)
        fake_logits, d_updates = discriminator.apply(
            state.discriminator_variables(),
            gen,
            True,
            mutable=["batch_stats"],
        )
        g_adv = bce_with_logits(fake_logits, 1.0)
        total = recon_loss + g_adv
        aux = (gen, g_updates["batch_stats"], d_updates["batch_stats"],
               comps, g_adv)
        return total, aux

    def d_loss_fn(d_params, d_stats, real, gen):
        # torch chronology (train.py:209-219): D(real) first (BN stat
        # update #2), then D(gen.detach()) (#3) — BOTH under grad wrt
        # d_params
        real_logits, d_updates = discriminator.apply(
            {"params": d_params, "batch_stats": d_stats},
            real,
            True,
            mutable=["batch_stats"],
        )
        fake_logits, d_updates = discriminator.apply(
            {"params": d_params, "batch_stats": d_updates["batch_stats"]},
            gen,
            True,
            mutable=["batch_stats"],
        )
        real_loss = bce_with_logits(real_logits, 1.0)
        fake_loss = bce_with_logits(fake_logits, 0.0)
        d_loss = 0.5 * (real_loss + fake_loss)
        return d_loss, (d_updates["batch_stats"], real_loss, fake_loss)

    def step(
        state: GANTrainState, batch: Dict[str, jnp.ndarray], vgg_params
    ) -> Tuple[GANTrainState, Dict[str, jnp.ndarray]]:
        real, mask = batch["image"], batch["mask"]

        # ---- Generator step --------------------------------------------
        (g_total, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params, state, batch, vgg_params
        )
        gen, new_g_stats, d_stats_fake, comps, g_adv = aux
        g_upd, new_g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        new_g_params = optax.apply_updates(state.g_params, g_upd)

        # ---- Discriminator step (pre-update generator output) ----------
        gen_sg = jax.lax.stop_gradient(gen)
        (d_loss, (d_stats_final, real_loss, fake_loss)), d_grads = (
            jax.value_and_grad(d_loss_fn, has_aux=True)(
                state.d_params, d_stats_fake, real, gen_sg
            )
        )
        d_upd, new_d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        new_d_params = optax.apply_updates(state.d_params, d_upd)

        metrics = {
            "g_loss": g_total,
            "d_loss": d_loss,
            "real_loss": real_loss,
            "fake_loss": fake_loss,
            "g_adv_loss": g_adv,
        }
        for name, value in comps.items():
            if name != "total":
                metrics[f"g_{name}"] = value

        new_state = state.replace(
            step=state.step + 1,
            g_params=new_g_params,
            g_stats=new_g_stats,
            d_params=new_d_params,
            d_stats=d_stats_final,
            g_opt=new_g_opt,
            d_opt=new_d_opt,
        )
        return new_state, metrics

    if not jit_compile:
        # caller owns compilation (e.g. parallel.mesh.shard_train_step)
        return step
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(
    generator,
    discriminator,
    loss_config: InpaintingLossConfig = InpaintingLossConfig(),
    torch_faithful_d_mode: bool = True,
):
    """Validation step (train.py:277-303).

    Reference quirk preserved by default: validation calls
    `generator.eval()` but never `discriminator.eval()`
    (train.py:279), so the monitoring D forwards run in train mode —
    normalizing by batch stats AND advancing D's running stats, twice
    per val batch. With torch_faithful_d_mode the step therefore
    returns an updated state; pass False for a pure (stats-frozen)
    validation pass.
    """

    def step(state: GANTrainState, batch, vgg_params):
        real, mask = batch["image"], batch["mask"]
        gen = generator.apply(
            state.generator_variables(), real * mask, mask, False
        )
        g_loss, comps = inpainting_loss(gen, real, mask, vgg_params, loss_config)
        if torch_faithful_d_mode:
            real_logits, upd = discriminator.apply(
                state.discriminator_variables(), real, True,
                mutable=["batch_stats"],
            )
            fake_logits, upd = discriminator.apply(
                {"params": state.d_params,
                 "batch_stats": upd["batch_stats"]},
                gen, True, mutable=["batch_stats"],
            )
            state = state.replace(d_stats=upd["batch_stats"])
        else:
            real_logits = discriminator.apply(
                state.discriminator_variables(), real, False
            )
            fake_logits = discriminator.apply(
                state.discriminator_variables(), gen, False
            )
        d_loss = 0.5 * (
            bce_with_logits(real_logits, 1.0) + bce_with_logits(fake_logits, 0.0)
        )
        metrics = {"val_g_loss": g_loss, "val_d_loss": d_loss}
        for name, value in comps.items():
            if name != "total":
                metrics[f"val_g_{name}"] = value
        return state, gen, metrics

    return jax.jit(step)
