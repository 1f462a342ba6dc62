"""Worker for the multi-host DP test: one of N real processes, each
owning 4 virtual CPU devices, jointly running ONE full GAN train step
over the global (data=8) mesh. Prints one JSON line of metrics.

Env (set by tests/test_distributed.py): TERRA_GAN_TPU_COORDINATOR,
TERRA_GAN_TPU_NUM_PROCESSES, TERRA_GAN_TPU_PROCESS_ID.
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

from terra_gan_tpu.parallel import (  # noqa: E402
    global_batch_from_local,
    initialize_from_env,
    make_mesh,
    shard_train_step,
)

assert initialize_from_env(), "process group env missing"

import numpy as np  # noqa: E402

from terra_gan_tpu.losses import InpaintingLossConfig  # noqa: E402
from terra_gan_tpu.models import Discriminator, PConvUNet  # noqa: E402
from terra_gan_tpu.models.vgg import random_weights  # noqa: E402
from terra_gan_tpu.training import (  # noqa: E402
    GANTrainState,
    adam,
    make_train_step,
)


def main() -> None:
    pid = jax.process_index()
    n_proc = jax.process_count()
    assert jax.device_count() == 4 * n_proc

    # identical replicated state on every process (same seed)
    G = PConvUNet(base_width=8)
    D = Discriminator(base_width=8)
    state = GANTrainState.create(
        G, D, jax.random.PRNGKey(0), sample_shape=(2, 64, 64, 1)
    )
    mesh = make_mesh(jax.device_count())  # global mesh, spatial=1
    step = shard_train_step(
        make_train_step(
            G, D, adam(), adam(),
            InpaintingLossConfig(perceptual_weight=0.1),
            jit_compile=False,
        ),
        mesh,
    )

    # the full 16-tile batch is generated identically everywhere; each
    # process CONTRIBUTES only its contiguous half (matching the global
    # device order: process 0's devices come first)
    rng = np.random.default_rng(7)
    image = rng.random((16, 64, 64, 1), dtype=np.float32)
    mask = (rng.random((16, 64, 64, 1)) > 0.3).astype(np.float32)
    lo, hi = pid * 8, (pid + 1) * 8
    batch = global_batch_from_local(
        {"image": image[lo:hi], "mask": mask[lo:hi]}, mesh
    )
    assert batch["image"].shape[0] == 16  # global leading dim

    state, metrics = step(state, batch, random_weights(0))
    jax.block_until_ready(state)

    # second config: (data=4, spatial=2) with H sharding, through the
    # identical-copy shard_batch path (every process passes the full
    # global batch; make_array_from_callback slices addressable shards)
    from terra_gan_tpu.parallel import shard_batch

    mesh_sp = make_mesh(jax.device_count(), spatial=2)
    step_sp = shard_train_step(
        make_train_step(
            G, D, adam(), adam(),
            InpaintingLossConfig(perceptual_weight=0.1),
            jit_compile=False,
        ),
        mesh_sp,
        shard_spatial=True,
    )
    state_sp = GANTrainState.create(
        G, D, jax.random.PRNGKey(0), sample_shape=(2, 64, 64, 1)
    )
    batch_sp = shard_batch(
        {"image": image, "mask": mask}, mesh_sp, shard_spatial=True
    )
    state_sp, m_sp = step_sp(state_sp, batch_sp, random_weights(0))
    jax.block_until_ready(state_sp)

    print(json.dumps({
        "pid": pid,
        "global_devices": jax.device_count(),
        "g_loss": float(metrics["g_loss"]),
        "d_loss": float(metrics["d_loss"]),
        "step": int(state.step),
        "g_loss_spatial": float(m_sp["g_loss"]),
    }), flush=True)


if __name__ == "__main__":
    main()
