"""Subprocess worker for the trajectory-parity test (run by
test_train_step.py::TestTrajectoryParity in its own interpreter because
jax_enable_x64 is process-global and must not leak into the suite).

Runs N full G+D optimizer steps at the PRODUCTION lr (2e-4,
config.yaml) in float64 on both frameworks from identical
torch-initialized weights and prints one JSON line of trajectory
agreement metrics.

Why float64: the r3 investigation showed jax-vs-torch fp32 gradients
agree only to ~1e-2 relative at small tile sizes — NOT an
implementation gap (in f64 every block's gradient matches to ~1e-10)
but fp32 conv-reassociation roundoff amplified by train-mode BatchNorm
at the U-Net's 1x1/2x2 deep stages. In f64 the roundoff floor drops
~1e8x: step 0 matches at machine epsilon and the early steps at
1e-11..1e-7, after which the adversarial dynamics amplify the
remaining reassociation noise ~1e4x per step (measured; see the
stepdiff_* output) — the gate in test_train_step.py is set by that
physics. This makes the run a true test of the full update-rule
semantics (loss -> grads -> Adam -> BN chronology -> D/G interaction)
over time: the r3 D-gradient bug showed up here as a step-1 diff of
~0.5, seven orders above the gate, while passing every per-step test.
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

import jax.numpy as jnp

from terra_gan_tpu.models import Discriminator, PConvUNet
from terra_gan_tpu.training.state import GANTrainState, adam
from terra_gan_tpu.training.step import make_train_step
from terra_gan_tpu.utils.torch_compat import (
    torch_state_to_discriminator_vars,
    torch_state_to_generator_vars,
)

from ref_loader import load_reference_models
from test_train_step import LOSS_CFG, torch_train_step

N_STEPS = 20
LR = 2e-4  # the production learning rate (reference config.yaml)
SIZE = 64


def to_nchw64(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).double()


def main() -> None:
    rng = np.random.default_rng(33)
    batches = []
    for _ in range(4):  # cycle distinct batches like a loader
        real = rng.random((2, SIZE, SIZE, 1)).astype(np.float64)
        mask = (rng.random((2, SIZE, SIZE, 1)) > 0.3).astype(np.float64)
        mask[:, 20:40, 15:35, :] = 0.0
        batches.append((real, mask))

    ref = load_reference_models()
    torch.manual_seed(0)
    G = ref.generator.PConvUNet().double().train()
    D = ref.discriminator.Discriminator().double().train()
    # the reference binarizes propagated masks with .float() (f32);
    # cast every PConv input back to double — lossless for binary masks
    for mod in G.modules():
        if mod.__class__.__name__ == "PConv2d":
            mod.register_forward_pre_hook(
                lambda m, inp: tuple(t.double() for t in inp)
            )
    optG = torch.optim.Adam(G.parameters(), lr=LR)
    optD = torch.optim.Adam(D.parameters(), lr=LR)

    gvars = torch_state_to_generator_vars(G.state_dict())
    dvars = torch_state_to_discriminator_vars(D.state_dict())
    jG, jD = PConvUNet(), Discriminator()
    state = GANTrainState.create(
        jG, jD, jax.random.PRNGKey(0),
        sample_shape=(2, SIZE, SIZE, 1),
        g_variables=gvars, d_variables=dvars,
        g_tx=adam(LR), d_tx=adam(LR),
    )
    step = make_train_step(jG, jD, adam(LR), adam(LR), LOSS_CFG, donate=False)

    j_hist = {"g_loss": [], "d_loss": []}
    t_hist = {"g_loss": [], "d_loss": []}
    for i in range(N_STEPS):
        real_np, mask_np = batches[i % len(batches)]
        state, metrics = step(
            state,
            {"image": jnp.asarray(real_np), "mask": jnp.asarray(mask_np)},
            None,
        )
        j_hist["g_loss"].append(float(metrics["g_loss"]))
        j_hist["d_loss"].append(float(metrics["d_loss"]))
        tm = torch_train_step(
            G, D, optG, optD, to_nchw64(real_np), to_nchw64(mask_np)
        )
        t_hist["g_loss"].append(tm["g_loss"])
        t_hist["d_loss"].append(tm["d_loss"])

    out = {"steps": N_STEPS, "lr": LR}
    for k in ("g_loss", "d_loss"):
        jv, tv = np.asarray(j_hist[k]), np.asarray(t_hist[k])
        out[f"nrmse_{k}"] = float(
            np.sqrt(np.mean((jv - tv) ** 2)) / np.sqrt(np.mean(tv ** 2))
        )
        out[f"stepdiff_{k}"] = [float(abs(a - b)) for a, b in zip(jv, tv)]
    out["final_g_loss_jax"] = j_hist["g_loss"][-1]
    out["final_g_loss_torch"] = t_hist["g_loss"][-1]

    # final-weight agreement (max abs over every parameter tensor)
    want_g = torch_state_to_generator_vars(G.state_dict())
    want_d = torch_state_to_discriminator_vars(D.state_dict())
    for name, got, want in (
        ("g", state.g_params, want_g["params"]),
        ("d", state.d_params, want_d["params"]),
    ):
        diffs = jax.tree.leaves(jax.tree.map(
            lambda x, y: float(np.abs(np.asarray(x) - np.asarray(y)).max()),
            got, want,
        ))
        out[f"max_{name}_param_diff"] = max(diffs)
    sdiffs = jax.tree.leaves(jax.tree.map(
        lambda x, y: float(np.abs(np.asarray(x) - np.asarray(y)).max()),
        state.g_stats, want_g["batch_stats"],
    ))
    out["max_g_bn_stat_diff"] = max(sdiffs)
    ddiffs = jax.tree.leaves(jax.tree.map(
        lambda x, y: float(np.abs(np.asarray(x) - np.asarray(y)).max()),
        state.d_stats, want_d["batch_stats"],
    ))
    out["max_d_bn_stat_diff"] = max(ddiffs)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
