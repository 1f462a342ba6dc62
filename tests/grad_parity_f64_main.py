"""Per-block generator-gradient parity vs the torch oracle, in float64.

Subprocess main (jax_enable_x64 is process-global, so this cannot run
inside the normal pytest process). Same setup as
test_train_step.py::TestGradientParity::test_generator_grads_match_torch
but with both frameworks in f64, where conv-reassociation roundoff
drops below ~1e-12 and any semantic deviation in the G objective's
gradient (loss formulas, PConv renorm, BN batch stats, D coupling)
would be unmistakable. Measured r3: worst block rel 1.3e-12; the fp32
version of the same comparison floors at ~1e-2..5e-2 (reassociation
noise amplified through the full-depth backward chain — see
BASELINE.md "fp32 divergence" study), which is why the fp32 test only
sanity-gates at 1e-1 while this one enforces 1e-9.

Prints one JSON line: {"rel": {block: rel, ...}, "worst": x}.
"""
import json
import os
import sys

os.environ.setdefault("JAX_ENABLE_X64", "1")
_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from terra_gan_tpu.losses import InpaintingLossConfig, inpainting_loss
from terra_gan_tpu.models import Discriminator, PConvUNet
from terra_gan_tpu.utils.torch_compat import (
    torch_state_to_discriminator_vars,
    torch_state_to_generator_vars,
    _hwio_to_oihw,
)
from ref_loader import load_reference_models

LOSS_CFG = InpaintingLossConfig(
    perceptual_weight=0.0, tv_weight=0.1, boundary_weight=0.5
)

def torch_criterion(pred, target, mask):
    total = F.l1_loss(pred, target)
    x = pred * (1 - mask)
    b, h, w = x.size(0), x.size(2), x.size(3)
    h_tv = torch.pow(x[:, :, 1:, :] - x[:, :, : h - 1, :], 2).sum()
    w_tv = torch.pow(x[:, :, :, 1:] - x[:, :, :, : w - 1], 2).sum()
    tv = 2 * (h_tv / x[:, :, 1:, :].numel() + w_tv / x[:, :, :, 1:].numel()) / b
    total = total + 0.1 * tv
    dil = F.max_pool2d(mask, 3, 1, 1)
    ero = 1 - F.max_pool2d(1 - mask, 3, 1, 1)
    boundary = torch.clamp(dil - ero, 0, 1)
    if boundary.sum() >= 1.0:
        bd = (torch.abs(pred - target) * boundary).sum() / (boundary.sum() + 1e-6)
        total = total + 0.5 * bd
    return total

rng = np.random.default_rng(21)
real_np = rng.random((2, 128, 128, 1), dtype=np.float32)
mask_np = (rng.random((2, 128, 128, 1)) > 0.3).astype(np.float32)
mask_np[:, 30:70, 20:60, :] = 0.0

ref = load_reference_models()
torch.manual_seed(0)
G, D = ref.generator.PConvUNet().double(), ref.discriminator.Discriminator().double()
gvars = torch_state_to_generator_vars(
    {k: v for k, v in G.state_dict().items()})
dvars = torch_state_to_discriminator_vars(
    {k: v for k, v in D.state_dict().items()})
# force f64 leaves
gvars = jax.tree.map(lambda x: jnp.asarray(np.asarray(x), jnp.float64), gvars)
dvars = jax.tree.map(lambda x: jnp.asarray(np.asarray(x), jnp.float64), dvars)

# the reference PConv downcasts the propagated mask via `.float()`
# (pconv.py:35) — cast every PConv input back to double (lossless for
# binary masks), same trick as trajectory_parity_main.py
for m in G.modules():
    if type(m).__name__ == "PConv2d":
        m.register_forward_pre_hook(
            lambda mod, inp: tuple(t.double() for t in inp)
        )

G.train(); D.train()
treal = torch.from_numpy(np.transpose(real_np, (0, 3, 1, 2))).double()
tmask = torch.from_numpy(np.transpose(mask_np, (0, 3, 1, 2))).double()
gen = G(treal * tmask, tmask)
fv = D(gen)
loss = torch_criterion(gen, treal, tmask) + (
    F.binary_cross_entropy_with_logits(fv, torch.ones_like(fv))
)
loss.backward()
tgrads = {n: p.grad for n, p in G.named_parameters() if p.grad is not None}

jG, jD = PConvUNet(), Discriminator()
from terra_gan_tpu.training.step import bce_with_logits

def loss_fn(g_params):
    genj, _ = jG.apply(
        {"params": g_params, "batch_stats": gvars["batch_stats"]},
        jnp.asarray(real_np * mask_np, jnp.float64),
        jnp.asarray(mask_np, jnp.float64),
        True, mutable=["batch_stats"],
    )
    l, _ = inpainting_loss(
        genj, jnp.asarray(real_np, jnp.float64),
        jnp.asarray(mask_np, jnp.float64), None, LOSS_CFG,
    )
    logits, _ = jD.apply(dvars, genj, True, mutable=["batch_stats"])
    return l + bce_with_logits(logits, 1.0)

jgrads = jax.jit(jax.grad(loss_fn))(gvars["params"])

rels = {}
for blk in [f"enc{i}" for i in range(1, 8)] + [f"dec{i}" for i in range(7, 0, -1)]:
    jg = _hwio_to_oihw(np.asarray(jgrads[blk]["kernel"]))
    tg = tgrads[f"{blk}.input_conv.weight"].numpy()
    rels[blk] = float(
        np.linalg.norm(jg - tg) / (np.linalg.norm(tg) + 1e-12)
    )
print(json.dumps({"rel": rels, "worst": max(rels.values())}))
