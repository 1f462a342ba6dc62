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


@pytest.mark.slow
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

        # spatial reference: (data=4, spatial=2) with H sharding
        mesh_sp = make_mesh(8, spatial=2)
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
        _, ref_sp = step_sp(
            state_sp,
            shard_batch(batch, mesh_sp, shard_spatial=True),
            random_weights(0),
        )
        ref_g_sp = float(ref_sp["g_loss"])

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
            # spatial (data=4, spatial=2) H-sharded config, fed through
            # the identical-copy multi-process shard_batch path
            assert abs(got["g_loss_spatial"] - ref_g_sp) <= (
                2e-5 * max(1, abs(ref_g_sp))
            )
        # both processes observed the identical global metrics
        assert outs[0]["g_loss"] == outs[1]["g_loss"]
        assert outs[0]["g_loss_spatial"] == outs[1]["g_loss_spatial"]


def _build_workspace(root: Path, grid_wh: int = 4) -> None:
    """A synthetic Digimap workspace (grid_wh x grid_wh tiles, 64^2)
    with a config sized so --mesh 8 training hits BOTH the sharded path
    (batch 8) and the data-replicated tail."""
    import zipfile

    import yaml

    cv2 = pytest.importorskip("cv2")
    from terra_gan_tpu.data.asc import write_asc

    cfg = {
        "training": {
            "loss_weights": {"perceptual": 0.0, "tv": 0.1, "boundary": 0},
            "modes": {
                "initial": {"epochs": 1, "batch_size": 8},
                "human_guided": {
                    "epochs": 1, "batch_size": 2, "learning_rate": 1e-4,
                    "human_feedback_weight": 0.3, "base_loss_weight": 0.7,
                },
            },
        },
        "evaluation": {"checkpoint_dir": "ckpts"},
        "mask_processing": {"visualization": {"enabled": False}},
        "experiment_tracking": {"enabled": False},
        "data": {
            "raw_dir": "data/raw", "processed_dir": "data/processed",
            "output_dir": "data/output", "input_zip_folder": "data/zips",
            "models_dir": "data/models", "image_size": 64,
        },
    }
    root.mkdir(parents=True, exist_ok=True)
    (root / "config.yaml").write_text(yaml.safe_dump(cfg))
    rng = np.random.default_rng(0)  # same seed -> identical workspaces
    src = root / "src"
    dsm = src / "getmapping-dsm-2000_x"
    rgb = src / "getmapping_rgb_25cm_x"
    dsm.mkdir(parents=True), rgb.mkdir(parents=True)
    for x in range(grid_wh):
        for y in range(grid_wh):
            name = f"nj{x:02d}{y:02d}"
            write_asc(dsm / f"{name}_DSM.asc", rng.uniform(0, 100, (64, 64)))
            img = rng.integers(60, 200, (128, 128, 3), dtype=np.uint8)
            cv2.imwrite(str(rgb / f"{name}_rgb.jpg"), img)
    (root / "data/zips").mkdir(parents=True)
    with zipfile.ZipFile(root / "data/zips/NJ00.zip", "w") as zf:
        for p in src.rglob("*"):
            if p.is_file():
                zf.write(p, p.relative_to(src))


@pytest.mark.slow
class TestTwoProcessCLI:
    def test_cli_train_on_two_hosts(self, tmp_path):
        """The REAL driver end-to-end on a 2-process group: each
        process runs `--mode train --mesh 8` from its own identical
        workspace (as on a pod with replicated data). Process 0 writes
        the checkpoints; process 1 writes none; the trained weights
        match a single-process 8-device run of the same workspace."""
        import torch

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices for the reference run")

        for name in ("ws0", "ws1", "ws_ref"):
            _build_workspace(tmp_path / name)

        # ---- reference: single-process --mesh 8 through the same CLI
        from terra_gan_tpu.cli.main_pipeline import main as cli_main

        cwd = os.getcwd()
        os.environ.setdefault("EXPERIMENT_MODE", "true")
        try:
            os.chdir(tmp_path / "ws_ref")
            assert cli_main(
                ["--mode", "train", "--config", "config.yaml", "--mesh", "8"]
            ) == 0
        finally:
            os.chdir(cwd)
        ref_ck = torch.load(
            tmp_path / "ws_ref" / "ckpts" / "master_checkpoint.pth",
            map_location="cpu", weights_only=False,
        )

        # ---- two real processes through the same driver
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        script = Path(__file__).parent / "distributed_cli_worker.py"
        procs = []
        for pid in range(2):
            env = dict(os.environ)
            env.update({
                "TERRA_GAN_TPU_COORDINATOR": f"localhost:{port}",
                "TERRA_GAN_TPU_NUM_PROCESSES": "2",
                "TERRA_GAN_TPU_PROCESS_ID": str(pid),
            })
            env.pop("XLA_FLAGS", None)  # worker sets its own (4 devices)
            procs.append(subprocess.Popen(
                [sys.executable, str(script), str(tmp_path / f"ws{pid}")],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True, env=env,
            ))
        for p, pid in zip(procs, range(2)):
            _, err = p.communicate(timeout=900)
            assert p.returncode == 0, f"proc {pid}: {err[-2000:]}"

        # single-writer rule: process 0 owns every checkpoint artifact
        assert (tmp_path / "ws0" / "ckpts" / "master_checkpoint.pth").exists()
        assert not (tmp_path / "ws1" / "ckpts").exists()

        got_ck = torch.load(
            tmp_path / "ws0" / "ckpts" / "master_checkpoint.pth",
            map_location="cpu", weights_only=False,
        )
        assert got_ck["processed_grids"] == ["NJ00"]
        # same global batches, same program: weights agree with the
        # single-process run up to cross-process collective
        # reassociation THROUGH ADAM — a grad reassoc flip near zero
        # moves a weight by up to ~lr per step (measured: 4/204800
        # elements at max 3.4e-4 after 2 steps at lr 2e-4), so the gate
        # is per-element |diff| <= 5*lr with a tight mean
        for key, want in ref_ck["generator_state_dict"].items():
            got = np.asarray(got_ck["generator_state_dict"][key], np.float64)
            want = np.asarray(want, np.float64)
            diff = np.abs(got - want)
            assert diff.max() <= 1e-3, (key, diff.max())
            assert diff.mean() <= 1e-5, (key, diff.mean())

        # ---- multi-host evaluate: grids round-robin per host, local
        # meshes (1 grid, 2 hosts: host 0 inpaints it, host 1's share
        # is legitimately empty — both must exit 0)
        import shutil

        shutil.copytree(tmp_path / "ws0" / "ckpts", tmp_path / "ws1" / "ckpts")
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        procs = []
        for pid in range(2):
            env = dict(os.environ)
            env.update({
                "TERRA_GAN_TPU_COORDINATOR": f"localhost:{port}",
                "TERRA_GAN_TPU_NUM_PROCESSES": "2",
                "TERRA_GAN_TPU_PROCESS_ID": str(pid),
            })
            env.pop("XLA_FLAGS", None)
            procs.append(subprocess.Popen(
                [sys.executable, str(script), str(tmp_path / f"ws{pid}"),
                 "evaluate"],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True, env=env,
            ))
        for p, pid in zip(procs, range(2)):
            _, err = p.communicate(timeout=900)
            assert p.returncode == 0, f"eval proc {pid}: {err[-2000:]}"
        ws0_out = list(
            (tmp_path / "ws0" / "data/output/NJ00/inpainted").glob("*.png")
        )
        assert ws0_out, "host 0 should have inpainted its grid share"
        # host 1's share was empty: no tiles written (the directory
        # itself may pre-exist from the train phase's path setup)
        assert not list(
            (tmp_path / "ws1" / "data/output/NJ00/inpainted").glob("*.png")
        )


class TestSyncPrimitives:
    """broadcast_from_primary / any_process: the lockstep invariants the
    multi-host train path relies on (code-review findings: divergent
    per-host resume states; one-host preemption deadlocking the rest)."""

    WORKER = r'''
import os, sys, json
sys.path.insert(0, "/root/repo")
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax; jax.config.update("jax_platforms", "cpu")
from terra_gan_tpu.parallel import (
    any_process, broadcast_from_primary, initialize_from_env,
)
import numpy as np
assert initialize_from_env()
pid = jax.process_index()
# hosts start with DIFFERENT trees (as after a divergent resume)
tree = {"w": np.full((3,), float(pid + 1), np.float32), "step": pid}
tree = broadcast_from_primary(tree)
# a preemption flag seen only by process 1 must reach everyone
flag = any_process(pid == 1)
print(json.dumps({
    "pid": pid,
    "w": np.asarray(tree["w"]).tolist(),
    "step": int(np.asarray(tree["step"])),
    "flag": bool(flag),
}), flush=True)
'''

    def test_broadcast_and_any_process(self):
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        procs = []
        for pid in range(2):
            env = dict(os.environ)
            env.update({
                "TERRA_GAN_TPU_COORDINATOR": f"localhost:{port}",
                "TERRA_GAN_TPU_NUM_PROCESSES": "2",
                "TERRA_GAN_TPU_PROCESS_ID": str(pid),
            })
            env.pop("XLA_FLAGS", None)
            procs.append(subprocess.Popen(
                [sys.executable, "-c", self.WORKER],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True, env=env,
            ))
        outs = []
        for p in procs:
            out, err = p.communicate(timeout=300)
            assert p.returncode == 0, err[-2000:]
            outs.append(json.loads(out.strip().splitlines()[-1]))
        for got in outs:
            # everyone holds process 0's values...
            assert got["w"] == [1.0, 1.0, 1.0], got
            assert got["step"] == 0, got
            # ...and process 1's preemption flag reached process 0
            assert got["flag"] is True, got

    def test_single_process_noops(self):
        from terra_gan_tpu.parallel import any_process, broadcast_from_primary

        tree = {"a": np.arange(3)}
        assert broadcast_from_primary(tree) is tree
        assert any_process(False) is False
        assert any_process(True) is True

    def test_partial_env_raises_clear_error(self, monkeypatch):
        from terra_gan_tpu.parallel import initialize_from_env

        monkeypatch.setenv("TERRA_GAN_TPU_COORDINATOR", "localhost:1")
        monkeypatch.delenv("TERRA_GAN_TPU_NUM_PROCESSES", raising=False)
        monkeypatch.delenv("TERRA_GAN_TPU_PROCESS_ID", raising=False)
        with pytest.raises(RuntimeError, match="all three"):
            initialize_from_env()
