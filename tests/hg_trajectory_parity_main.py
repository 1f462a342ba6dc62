"""Subprocess worker for the HUMAN-GUIDED trajectory-parity test (run
by test_train_step.py::TestHGTrajectoryParity in its own interpreter
because jax_enable_x64 is process-global and must not leak).

Runs N generator-only fine-tune steps at the production HG lr (1e-4,
config example) in float64 on both frameworks from identical
torch-initialized weights, through the REAL production step builder
(HumanGuidedTrainer._make_step) vs the reference HG semantics restated
in torch (human_guided_trainer.py:100-155 + losses.py:132-204:
base InpaintingLoss incl. boundary, plus human-region L1 + boundary,
combined base_loss_weight/human_feedback_weight; empty human masks
skip the human term entirely).

Unlike the GAN trajectory (adversarial dynamics amplify reassociation
noise ~1e4x/step), the HG objective is a single-network descent, so
the f64 curves should stay near machine epsilon for all 20 steps —
any real semantic bug shows up as a first-step jump.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from terra_gan_tpu.config import Config
from terra_gan_tpu.models import PConvUNet
from terra_gan_tpu.training.human_guided import HumanGuidedTrainer
from terra_gan_tpu.training.state import adam
from terra_gan_tpu.utils.torch_compat import torch_state_to_generator_vars

from ref_loader import load_reference_models

N_STEPS = 20
LR = 1e-4  # production HG learning rate (config.example.yaml)
SIZE = 64
BASE_W, HUMAN_W, BOUNDARY_W = 0.7, 0.3, 0.5


def to_nchw64(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).double()


def torch_boundary(pred, target, m):
    """Area-normalized L1 on the 3x3 dilate-erode band
    (losses.py:403-416); exactly 0 when the band is empty."""
    dil = F.max_pool2d(m, 3, 1, 1)
    ero = 1 - F.max_pool2d(1 - m, 3, 1, 1)
    band = torch.clamp(dil - ero, 0, 1)
    if float(band.sum()) < 1.0:
        return torch.zeros((), dtype=pred.dtype)
    return (torch.abs(pred - target) * band).sum() / (band.sum() + 1e-6)


def torch_hg_loss(pred, target, mask, human_mask):
    """HumanGuidedLoss restated (losses.py:132-204), perceptual off."""
    base = F.l1_loss(pred, target)
    x = pred * (1 - mask)
    b, h, w = x.size(0), x.size(2), x.size(3)
    h_tv = torch.pow(x[:, :, 1:, :] - x[:, :, : h - 1, :], 2).sum()
    w_tv = torch.pow(x[:, :, :, 1:] - x[:, :, :, : w - 1], 2).sum()
    tv = 2 * (h_tv / x[:, :, 1:, :].numel() + w_tv / x[:, :, :, 1:].numel()) / b
    base = base + 0.1 * tv
    base = base + BOUNDARY_W * torch_boundary(pred, target, mask)

    hg = (human_mask > 0).double()
    human = torch.zeros((), dtype=pred.dtype)
    if float(hg.sum()) > 0:  # reference skips the term when empty
        human = F.l1_loss(pred * hg, target * hg)
        human = human + BOUNDARY_W * torch_boundary(pred, target, hg)
    return BASE_W * base + HUMAN_W * human


def main() -> None:
    rng = np.random.default_rng(44)
    batches = []
    for i in range(4):  # cycle distinct batches like a loader
        real = rng.random((2, SIZE, SIZE, 1)).astype(np.float64)
        mask = (rng.random((2, SIZE, SIZE, 1)) > 0.3).astype(np.float64)
        mask[:, 20:40, 15:35, :] = 0.0
        if i == 2:
            # one all-empty human mask: exercises the skip-when-empty
            # gate under grad on both frameworks
            human = np.zeros((2, SIZE, SIZE, 1), np.float64)
        else:
            human = (rng.random((2, SIZE, SIZE, 1)) > 0.9).astype(np.float64)
        batches.append((real, mask, human))

    ref = load_reference_models()
    torch.manual_seed(0)
    G = ref.generator.PConvUNet().double().train()
    # the reference binarizes propagated masks with .float() (f32);
    # cast every PConv input back to double — lossless for binary masks
    for mod in G.modules():
        if mod.__class__.__name__ == "PConv2d":
            mod.register_forward_pre_hook(
                lambda m, inp: tuple(t.double() for t in inp)
            )
    opt = torch.optim.Adam(G.parameters(), lr=LR)

    # the REAL production step: HumanGuidedTrainer._make_step over the
    # same config the CLI would build
    cfg = Config.from_dict({
        "training": {
            "loss_weights": {
                "perceptual": 0.0, "tv": 0.1, "boundary": BOUNDARY_W,
            },
            "modes": {
                "human_guided": {
                    "epochs": 1, "batch_size": 2, "learning_rate": LR,
                    "human_feedback_weight": HUMAN_W,
                    "base_loss_weight": BASE_W,
                },
            },
        },
    })
    trainer = HumanGuidedTrainer(cfg)
    jG = PConvUNet()
    tx = adam(LR)
    step_fn = trainer._make_step(jG, tx)

    gvars = torch_state_to_generator_vars(G.state_dict())
    g_params = jax.tree.map(jnp.asarray, gvars["params"])
    g_stats = jax.tree.map(jnp.asarray, gvars["batch_stats"])
    opt_state = tx.init(g_params)

    def worst_bn_diff():
        want_now = torch_state_to_generator_vars(G.state_dict())
        return max(jax.tree.leaves(jax.tree.map(
            lambda x, y: float(np.abs(np.asarray(x) - np.asarray(y)).max()),
            g_stats, want_now["batch_stats"],
        )))

    j_hist, t_hist = [], []
    bn_diff_step2 = None
    for i in range(N_STEPS):
        real_np, mask_np, human_np = batches[i % len(batches)]
        dev = {
            "image": jnp.asarray(real_np),
            "mask": jnp.asarray(mask_np),
            "human_mask": jnp.asarray(human_np),
        }
        g_params, g_stats, opt_state, loss, _ = step_fn(
            g_params, g_stats, opt_state, dev, None
        )
        j_hist.append(float(loss))

        G.train()
        opt.zero_grad()
        gen = G(to_nchw64(real_np) * to_nchw64(mask_np), to_nchw64(mask_np))
        t_loss = torch_hg_loss(
            gen, to_nchw64(real_np), to_nchw64(mask_np), to_nchw64(human_np)
        )
        t_loss.backward()
        opt.step()
        t_hist.append(float(t_loss.item()))
        if i == 2:
            # BN running stats are still semantically tight here; by
            # step ~6 the deep-stage variance-of-2-values statistic has
            # chaotically amplified f64 roundoff to O(1) (measured
            # 7e-13 -> 1.3 by step 7 at ~1e3x/step)
            bn_diff_step2 = worst_bn_diff()

    jv, tv = np.asarray(j_hist), np.asarray(t_hist)
    out = {
        "steps": N_STEPS,
        "lr": LR,
        "nrmse_loss": float(
            np.sqrt(np.mean((jv - tv) ** 2)) / np.sqrt(np.mean(tv ** 2))
        ),
        "stepdiff_loss": [float(abs(a - b)) for a, b in zip(jv, tv)],
        "final_loss_jax": j_hist[-1],
        "final_loss_torch": t_hist[-1],
        "bn_stat_diff_step2": bn_diff_step2,
    }

    want = torch_state_to_generator_vars(G.state_dict())
    out["max_param_diff"] = max(jax.tree.leaves(jax.tree.map(
        lambda x, y: float(np.abs(np.asarray(x) - np.asarray(y)).max()),
        g_params, want["params"],
    )))
    out["max_bn_stat_diff"] = max(jax.tree.leaves(jax.tree.map(
        lambda x, y: float(np.abs(np.asarray(x) - np.asarray(y)).max()),
        g_stats, want["batch_stats"],
    )))
    # deep-stage running variances reach O(1e3), so gate on the
    # RELATIVE drift too
    out["max_bn_stat_rel_diff"] = max(jax.tree.leaves(jax.tree.map(
        lambda x, y: float((
            np.abs(np.asarray(x) - np.asarray(y))
            / np.maximum(1.0, np.abs(np.asarray(y)))
        ).max()),
        g_stats, want["batch_stats"],
    )))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
