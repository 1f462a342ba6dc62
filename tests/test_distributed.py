"""Multi-host data parallelism (parallel/distributed.py): two REAL
processes x 4 virtual CPU devices run one full GAN train step over the
global 8-device mesh, and the metrics must match the single-process
8-device run — the same SPMD program, now with cross-process
collectives. The reference has nothing distributed (SURVEY §2.4)."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

from terra_gan_tpu.losses import InpaintingLossConfig
from terra_gan_tpu.models import Discriminator, PConvUNet
from terra_gan_tpu.models.vgg import random_weights
from terra_gan_tpu.parallel import (
    make_mesh,
    process_shard,
    shard_batch,
    shard_train_step,
)
from terra_gan_tpu.training import GANTrainState, adam, make_train_step


class TestProcessShard:
    def test_disjoint_equal_sized(self):
        items = list(range(11))
        shards = [
            process_shard(items, process_index=i, process_count=3)
            for i in range(3)
        ]
        # equal sizes (truncated to min): 11 // 3 = 3 each
        assert all(len(s) == 3 for s in shards)
        flat = [x for s in shards for x in s]
        assert len(set(flat)) == len(flat)  # disjoint
        assert set(flat) <= set(items)

    def test_divisible_keeps_everything(self):
        items = list(range(12))
        flat = sorted(
            x
            for i in range(4)
            for x in process_shard(items, process_index=i, process_count=4)
        )
        assert flat == items


class TestTwoProcessTrainStep:
    def test_matches_single_process(self, tmp_path):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices for the reference run")

        # ---- reference: the SAME step single-process over 8 devices
        G = PConvUNet(base_width=8)
        D = Discriminator(base_width=8)
        state = GANTrainState.create(
            G, D, jax.random.PRNGKey(0), sample_shape=(2, 64, 64, 1)
        )
        mesh = make_mesh(8)
        step = shard_train_step(
            make_train_step(
                G, D, adam(), adam(),
                InpaintingLossConfig(perceptual_weight=0.1),
                jit_compile=False,
            ),
            mesh,
        )
        rng = np.random.default_rng(7)
        batch = {
            "image": rng.random((16, 64, 64, 1), dtype=np.float32),
            "mask": (rng.random((16, 64, 64, 1)) > 0.3).astype(np.float32),
        }
        _, ref = step(state, shard_batch(batch, mesh), random_weights(0))
        ref_g, ref_d = float(ref["g_loss"]), float(ref["d_loss"])

        # ---- two real processes, 4 virtual devices each
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        script = Path(__file__).parent / "distributed_worker_main.py"
        procs = []
        for pid in range(2):
            env = dict(os.environ)
            env.update({
                "TERRA_GAN_TPU_COORDINATOR": f"localhost:{port}",
                "TERRA_GAN_TPU_NUM_PROCESSES": "2",
                "TERRA_GAN_TPU_PROCESS_ID": str(pid),
                "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            })
            procs.append(subprocess.Popen(
                [sys.executable, str(script)],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True, env=env,
            ))
        outs = []
        for p in procs:
            out, err = p.communicate(timeout=600)
            assert p.returncode == 0, err[-2000:]
            outs.append(json.loads(out.strip().splitlines()[-1]))

        for got in outs:
            assert got["global_devices"] == 8
            assert got["step"] == 1
            # same global program + same global batch: agreement within
            # f32 reassociation noise (cross-process collectives may
            # reduce in a different order than in-process ones)
            assert abs(got["g_loss"] - ref_g) <= 2e-5 * max(1, abs(ref_g))
            assert abs(got["d_loss"] - ref_d) <= 2e-5 * max(1, abs(ref_d))
        # both processes observed the identical global metrics
        assert outs[0]["g_loss"] == outs[1]["g_loss"]
