"""Training loop, human-guided trainer, checkpoints, metrics, tracker."""

import json
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from terra_gan_tpu.config import Config
from terra_gan_tpu.evaluation import (
    MaskEvaluator,
    boundary_quality,
    psnr,
    ssim,
)
from terra_gan_tpu.models import Discriminator, PConvUNet
from terra_gan_tpu.tracking import ExperimentTracker
from terra_gan_tpu.training import (
    GANTrainState,
    HumanGuidedTrainer,
    export_pth,
    import_pth,
    resolve_checkpoint,
    restore_native,
    save_native,
    train,
)
from terra_gan_tpu.data.dataset import DirectMatchDataset

torch = pytest.importorskip("torch")


def make_dirs(tmp_path, n=4, size=64):
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        (tmp_path / split / "images").mkdir(parents=True)
        (tmp_path / split / "masks").mkdir(parents=True)
        for i in range(n):
            Image.fromarray(
                rng.integers(0, 255, (size, size), dtype=np.uint8)
            ).save(tmp_path / split / "images" / f"t{i}.png")
            Image.fromarray(
                (rng.random((size, size)) > 0.3).astype(np.uint8) * 255
            ).save(tmp_path / split / "masks" / f"t{i}.png")


def tiny_config(tmp_path, epochs=2) -> Config:
    return Config.from_dict({
        "training": {
            "loss_weights": {"perceptual": 0.0, "tv": 0.1, "boundary": 0},
            "modes": {
                "initial": {"epochs": epochs, "batch_size": 2},
                "human_guided": {
                    "epochs": 2, "batch_size": 2, "learning_rate": 1e-4,
                    "human_feedback_weight": 0.3, "base_loss_weight": 0.7,
                },
            },
        },
        "experiment_tracking": {
            "enabled": True,
            "tracking_uri": f"file:{tmp_path}/mlruns",
        },
    })


class TestMetrics:
    def test_psnr_ssim_basics(self):
        rng = np.random.default_rng(1)
        a = jnp.asarray(rng.random((1, 32, 32, 1), dtype=np.float32))
        assert float(psnr(a, a)) == np.inf
        assert abs(float(ssim(a, a)) - 1.0) < 1e-5
        b = jnp.clip(a + 0.1, 0, 1)
        assert float(psnr(a, b)) < 30.0
        assert float(ssim(a, b)) < 1.0

    def test_ssim_matches_torch_avgpool_formula(self):
        import torch.nn.functional as F

        rng = np.random.default_rng(2)
        a = rng.random((1, 33, 37, 1), dtype=np.float32)
        b = rng.random((1, 33, 37, 1), dtype=np.float32)

        def t(x):
            return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))

        k, c1, c2 = 11, 0.01 ** 2, 0.03 ** 2
        mu1 = F.avg_pool2d(t(a), k, 1, k // 2)
        mu2 = F.avg_pool2d(t(b), k, 1, k // 2)
        s1 = F.avg_pool2d(t(a) * t(a), k, 1, k // 2) - mu1 * mu1
        s2 = F.avg_pool2d(t(b) * t(b), k, 1, k // 2) - mu2 * mu2
        s12 = F.avg_pool2d(t(a) * t(b), k, 1, k // 2) - mu1 * mu2
        want = (
            ((2 * mu1 * mu2 + c1) * (2 * s12 + c2))
            / ((mu1 * mu1 + mu2 * mu2 + c1) * (s1 + s2 + c2))
        ).mean().item()
        got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        assert abs(got - want) < 1e-5

    def test_boundary_quality_empty_band(self):
        ones = jnp.ones((1, 16, 16, 1))
        out = boundary_quality(ones, ones, ones)
        assert all(float(v) == 0.0 for v in out.values())

    def test_mask_evaluator(self):
        ev = MaskEvaluator()
        a = np.zeros((32, 32), np.uint8)
        b = np.zeros((32, 32), np.uint8)
        a[4:12, 4:12] = 1
        b[8:16, 8:16] = 1
        m = ev.calculate_metrics(a, b)
        assert 0 < m.iou < 1
        assert m.feature_count == 1
        assert m.total_area == 64


class TestTracker:
    def test_filestore_roundtrip(self, tmp_path):
        cfg = tiny_config(tmp_path)
        tr = ExperimentTracker(cfg, flush_interval=0.0, force_file_store=True)
        run_id = tr.start_run("test_run", params={"training": {"lr": 1}})
        assert run_id is not None
        tr.log_metrics({"epoch.g_loss": 1.5}, step=0)
        tr.log_training_batch(batch_metrics={"g_loss": 2.0}, step=1)
        tr.log_model({"params": {"w": jnp.ones((2, 2))}}, "best")
        tr.end_run()

        # the file store emits the MLflow file-store layout
        run_dir = Path(f"{tmp_path}/mlruns/dsm_inpainting") / run_id
        assert (run_dir / "metrics" / "epoch.g_loss").exists()
        assert (run_dir / "metrics" / "batch.g_loss").exists()
        assert (run_dir / "params" / "training.lr").read_text() == "1"
        assert (run_dir / "artifacts" / "best.npz").exists()
        assert "status: FINISHED" in (run_dir / "meta.yaml").read_text()

    def test_disabled_is_noop(self):
        cfg = Config.from_dict({"experiment_tracking": {"enabled": False}})
        tr = ExperimentTracker(cfg)
        assert tr.start_run("x") is None
        tr.log_metrics({"a": 1.0})
        tr.end_run()


class TestCheckpoints:
    @pytest.fixture(scope="class")
    def state(self):
        G, D = PConvUNet(base_width=8), Discriminator(base_width=8)
        return GANTrainState.create(
            G, D, jax.random.PRNGKey(0), sample_shape=(1, 64, 64, 1)
        )

    def test_native_roundtrip(self, tmp_path, state):
        save_native(tmp_path / "ck", state, {"epoch": 3})
        restored, extra = restore_native(tmp_path / "ck", state)
        assert extra["epoch"] == 3
        diff = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            state.g_params, restored.g_params,
        )
        assert max(jax.tree.leaves(diff)) == 0.0

    def test_resolve_priority(self, tmp_path):
        a = tmp_path / "a.pth"
        b = tmp_path / "b.pth"
        b.write_bytes(b"x")
        assert resolve_checkpoint(None, None, None) is None
        assert resolve_checkpoint(a, b, None) == b  # a missing -> master
        a.write_bytes(b"x")
        assert resolve_checkpoint(a, b, None) == a
        # a preempted checkpoint outranks everything until consumed
        p = tmp_path / "preempted.pth"
        assert resolve_checkpoint(a, b, None, preempted=p) == a  # missing
        p.write_bytes(b"x")
        assert resolve_checkpoint(a, b, None, preempted=p) == p

    def test_pth_roundtrip_with_optimizer(self, tmp_path):
        """Full-width export must load into the reference torch model AND
        restore Adam moments on reimport."""
        from terra_gan_tpu.losses import InpaintingLossConfig
        from terra_gan_tpu.training import adam, make_train_step
        from terra_gan_tpu.training.checkpoint import _find_adam

        G, D = PConvUNet(), Discriminator()
        state = GANTrainState.create(
            G, D, jax.random.PRNGKey(1), sample_shape=(1, 64, 64, 1)
        )
        # take one step so optimizer moments are nonzero
        step = make_train_step(
            G, D, adam(), adam(),
            InpaintingLossConfig(perceptual_weight=0.0), donate=False,
        )
        rng = np.random.default_rng(0)
        batch = {
            "image": jnp.asarray(rng.random((1, 64, 64, 1), dtype=np.float32)),
            "mask": jnp.asarray(
                (rng.random((1, 64, 64, 1)) > 0.3).astype(np.float32)
            ),
        }
        state, _ = step(state, batch, None)

        p = tmp_path / "master_checkpoint.pth"
        export_pth(p, state, epoch=7, config={"k": "v"})

        # loads into the reference torch models
        import sys
        sys.path.insert(0, str(Path(__file__).parent))
        from ref_loader import load_reference_models, reference_available

        if reference_available():
            ref = load_reference_models()
            ckpt = torch.load(p, map_location="cpu", weights_only=False)
            tG = ref.generator.PConvUNet()
            tG.load_state_dict(ckpt["generator_state_dict"])
            tD = ref.discriminator.Discriminator()
            tD.load_state_dict(ckpt["discriminator_state_dict"])
            optG = torch.optim.Adam(tG.parameters(), lr=2e-4)
            optG.load_state_dict(ckpt["optimizer_G_state_dict"])
            assert ckpt["epoch"] == 7

        # reimport restores params AND Adam moments
        template = GANTrainState.create(
            PConvUNet(), Discriminator(), jax.random.PRNGKey(2),
            sample_shape=(1, 64, 64, 1),
        )
        restored, extra = import_pth(p, template)
        assert extra["epoch"] == 7
        d = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(jnp.asarray(a) - b))),
            restored.g_params, state.g_params,
        )
        assert max(jax.tree.leaves(d)) < 1e-6
        got_adam = _find_adam(restored.g_opt)
        want_adam = _find_adam(state.g_opt)
        assert int(np.asarray(got_adam.count)) == 1
        mu_diff = jax.tree.map(
            lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
            got_adam.mu, want_adam.mu,
        )
        assert max(jax.tree.leaves(mu_diff)) < 1e-7


class TestTrainLoop:
    def test_two_epochs_end_to_end(self, tmp_path):
        make_dirs(tmp_path)
        cfg = tiny_config(tmp_path)
        G, D = PConvUNet(base_width=8), Discriminator(base_width=8)
        tracker = ExperimentTracker(
            cfg, flush_interval=0.0, force_file_store=True
        )
        tracker.start_run("train_test")
        result = train(
            tmp_path / "train" / "images",
            tmp_path / "train" / "masks",
            G, D,
            checkpoint_path=tmp_path / "master_checkpoint.pth",
            config=cfg,
            tracker=tracker,
            val_img_dir=tmp_path / "val" / "images",
            val_mask_dir=tmp_path / "val" / "masks",
            image_size=64,
        )
        tracker.end_run()
        assert result["final_epoch"] == 1
        assert result["best_val_loss"] is not None
        assert np.isfinite(result["best_val_loss"])
        assert (tmp_path / "master_checkpoint.pth").exists()
        assert (tmp_path / "checkpoint_epoch_0").exists()
        assert int(result["state"].step) == 2 * 2  # 2 epochs x 2 batches
        # feed-starvation observability: epoch.data_wait_ms_per_batch
        # lands in the metric store (the feed-bound vs device-bound
        # signal the loss metrics can't show)
        wait_files = list(
            (tmp_path / "mlruns").rglob("*data_wait_ms_per_batch")
        )
        assert wait_files, "epoch.data_wait_ms_per_batch not logged"
        val = float(wait_files[0].read_text().split()[1])
        assert val >= 0.0

    def test_qat_tail_in_loop(self, tmp_path):
        """training.qat_tail.steps > 0 appends the quantization-aware
        tail fine-tune to a completed run: the result carries the frozen
        int8 scales (incl. the tail's dec1:out), the fine-tune actually
        moved the generator params, and qat_tail.pth rides next to the
        master checkpoint with the scales the deployment path
        (load_checkpoint_quant_scales) reads back."""
        from terra_gan_tpu.evaluation.inference import (
            load_checkpoint_quant_scales,
        )

        make_dirs(tmp_path)
        raw = tiny_config(tmp_path).raw
        raw["training"]["qat_tail"] = {"steps": 2, "learning_rate": 5e-5}
        cfg = Config.from_dict(raw)
        assert cfg.training.qat_tail.steps == 2
        G, D = PConvUNet(base_width=8), Discriminator(base_width=8)
        result = train(
            tmp_path / "train" / "images", tmp_path / "train" / "masks",
            G, D, checkpoint_path=tmp_path / "master_checkpoint.pth",
            config=cfg, image_size=64, seed=7,
        )
        scales = result["quant_scales"]
        assert "dec1:out" in scales and float(scales["dec1:out"]) > 0
        # the two QAT steps ran on top of the completed run
        assert int(result["state"].step) == 2 * 2 + 2
        qat_pth = tmp_path / "qat_tail.pth"
        assert qat_pth.exists()
        loaded = load_checkpoint_quant_scales(qat_pth)
        assert loaded is not None
        assert float(loaded["dec1:out"]) == pytest.approx(
            float(scales["dec1:out"])
        )
        ckpt = torch.load(qat_pth, map_location="cpu", weights_only=False)
        assert ckpt["qat_tail_steps"] == 2

    def test_async_checkpoint_matches_sync(self, tmp_path):
        """training.async_checkpoint writes the same checkpoints as the
        synchronous path (same seed -> same trajectory -> same best/
        periodic saves), flushed before train() returns."""
        make_dirs(tmp_path)
        results = {}
        for mode in ("sync", "async"):
            d = tmp_path / mode
            raw = tiny_config(tmp_path).raw
            raw["training"]["async_checkpoint"] = mode == "async"
            cfg = Config.from_dict(raw)
            assert cfg.training.async_checkpoint == (mode == "async")
            G, D = PConvUNet(base_width=8), Discriminator(base_width=8)
            results[mode] = train(
                tmp_path / "train" / "images", tmp_path / "train" / "masks",
                G, D, checkpoint_path=d / "master_checkpoint.pth",
                config=cfg, image_size=64, seed=3,
            )
            assert (d / "master_checkpoint.pth").exists()
            assert (d / "checkpoint_epoch_0").exists()
        a = torch.load(
            tmp_path / "async" / "master_checkpoint.pth",
            map_location="cpu", weights_only=False,
        )
        s = torch.load(
            tmp_path / "sync" / "master_checkpoint.pth",
            map_location="cpu", weights_only=False,
        )
        assert a["epoch"] == s["epoch"]
        for k, v in s["generator_state_dict"].items():
            assert torch.equal(a["generator_state_dict"][k], v), k
        assert results["async"]["best_train_loss"] == pytest.approx(
            results["sync"]["best_train_loss"]
        )

    def test_epoch_survives_corrupt_tile(self, tmp_path):
        """A corrupt tile skips its batch only; the epoch and the run
        complete on the remaining data (reference train.py:268-270)."""
        make_dirs(tmp_path)
        (tmp_path / "train" / "images" / "t1.png").write_bytes(b"garbage")
        cfg = tiny_config(tmp_path, epochs=1)
        G, D = PConvUNet(base_width=8), Discriminator(base_width=8)
        result = train(
            tmp_path / "train" / "images",
            tmp_path / "train" / "masks",
            G, D,
            checkpoint_path=tmp_path / "master_checkpoint.pth",
            config=cfg,
            image_size=64,
        )
        assert result["final_epoch"] == 0
        # shuffle decides whether t1 shares a batch with one or two
        # clean tiles; at least one clean batch must have trained
        assert int(result["state"].step) >= 1
        assert np.isfinite(result["best_train_loss"])

    def test_systematic_failure_raises(self, tmp_path):
        """If EVERY batch of the first epoch fails, train() must raise
        instead of reporting a successful no-op run."""
        make_dirs(tmp_path)
        for p in (tmp_path / "train" / "images").glob("*.png"):
            p.write_bytes(b"broken")
        cfg = tiny_config(tmp_path, epochs=1)
        G, D = PConvUNet(base_width=8), Discriminator(base_width=8)
        with pytest.raises(RuntimeError):
            train(
                tmp_path / "train" / "images",
                tmp_path / "train" / "masks",
                G, D,
                checkpoint_path=tmp_path / "ck.pth",
                config=cfg,
                image_size=64,
            )


class TestPreemption:
    """Graceful preemption (SIGTERM / fault-injection drill): the run
    checkpoints the last committed state and surfaces TrainingPreempted;
    re-running resumes from the checkpoint. The reference's only
    recovery story is re-running after a hard kill (SURVEY §5.3)."""

    def _assert_preempted_ckpt(self, path, tmp_path):
        from terra_gan_tpu.training import TrainingPreempted  # noqa: F401

        template = GANTrainState.create(
            PConvUNet(base_width=8), Discriminator(base_width=8),
            jax.random.PRNGKey(9), sample_shape=(1, 64, 64, 1),
        )
        restored, extra = import_pth(path, template)
        assert extra.get("preempted") is True
        return restored, extra

    def test_fault_injected_preemption_then_resume(self, tmp_path, monkeypatch):
        from terra_gan_tpu.training import TrainingPreempted

        make_dirs(tmp_path)
        cfg = tiny_config(tmp_path, epochs=2)  # 2 tiles/batch, 2 batches
        G, D = PConvUNet(base_width=8), Discriminator(base_width=8)
        ckpt = tmp_path / "master_checkpoint.pth"

        monkeypatch.setenv("TERRA_GAN_TPU_FAULT", "preempt@0:1")
        with pytest.raises(TrainingPreempted) as ei:
            train(
                tmp_path / "train" / "images", tmp_path / "train" / "masks",
                G, D, checkpoint_path=ckpt, config=cfg, image_size=64,
            )
        assert ei.value.epoch == 0
        # one batch committed before the batch-1 preemption point
        assert int(ei.value.state.step) == 1
        # latest state goes to a SIBLING preempted.pth — never over the
        # master checkpoint (which holds best-model weights when it
        # exists; here no epoch completed, so no master was written)
        preempted = tmp_path / "preempted.pth"
        assert ei.value.checkpoint == preempted
        assert not ckpt.exists()
        restored, extra = self._assert_preempted_ckpt(preempted, tmp_path)
        assert extra["epoch"] == 0

        # resume from the preempted checkpoint: completes the schedule
        monkeypatch.delenv("TERRA_GAN_TPU_FAULT")
        result = train(
            tmp_path / "train" / "images", tmp_path / "train" / "masks",
            G, D, state=restored, checkpoint_path=ckpt, config=cfg,
            image_size=64,
        )
        assert result["final_epoch"] == 1
        # resumed run trained 2 epochs x 2 batches ON TOP of the
        # preempted step (Adam moments et al. restored, not reset)
        assert int(result["state"].step) == 1 + 4
        _, extra2 = import_pth(ckpt, restored)
        assert extra2.get("preempted") is not True
        # the completed run consumed the preempted checkpoint
        assert not preempted.exists()
        assert not preempted.with_suffix(".orbax").exists()

    def test_resume_fast_forwards_to_preempted_epoch(
        self, tmp_path, monkeypatch
    ):
        """r5: a resumed run finishes the REMAINING epochs of the
        schedule (start_epoch from preempted.pth) instead of re-running
        the whole range, and compares validation against the
        pre-preemption best instead of a fresh inf — together these
        give the 'every epoch logged exactly once, best-model master
        intact' soak contract (scripts/soak_production.py)."""
        from terra_gan_tpu.training import TrainingPreempted

        make_dirs(tmp_path)
        cfg = tiny_config(tmp_path, epochs=3)  # 2 tiles/batch, 2 batches
        G, D = PConvUNet(base_width=8), Discriminator(base_width=8)
        ckpt = tmp_path / "master_checkpoint.pth"

        # preempt entering epoch 1: epoch 0's 2 batches are committed
        monkeypatch.setenv("TERRA_GAN_TPU_FAULT", "preempt@1:0")
        with pytest.raises(TrainingPreempted) as ei:
            train(
                tmp_path / "train" / "images", tmp_path / "train" / "masks",
                G, D, checkpoint_path=ckpt, config=cfg, image_size=64,
                preempt_extra={"parent": "NJ00"},
            )
        assert ei.value.epoch == 1
        restored, extra = import_pth(tmp_path / "preempted.pth", ei.value.state)
        assert extra["epoch"] == 1
        assert extra["parent"] == "NJ00"  # preempt_extra rides along
        # best-so-far rides in the checkpoint for the resume to inherit
        assert np.isfinite(extra["best_train_loss"])

        monkeypatch.delenv("TERRA_GAN_TPU_FAULT")
        result = train(
            tmp_path / "train" / "images", tmp_path / "train" / "masks",
            G, D, state=restored, checkpoint_path=ckpt, config=cfg,
            image_size=64, start_epoch=int(extra["epoch"]),
            resume_best={"best_train_loss": 0.0},  # unbeatable
        )
        assert result["final_epoch"] == 2
        # ONLY epochs 1..2 ran: 2 committed + 2 epochs x 2 batches
        # (re-running the full range would give 2 + 3*2 = 8)
        assert int(result["state"].step) == 2 + 4
        # an unbeatable inherited best means the resumed run must never
        # overwrite the best-model master written during run 1
        _, extra2 = import_pth(ckpt, restored)
        assert extra2["epoch"] == 0

    def test_sigterm_checkpoints_and_stops(self, tmp_path):
        """The actual signal path: SIGTERM mid-epoch (delivered while a
        batch runs) checkpoints and raises instead of dying."""
        import os
        import signal as _signal

        from terra_gan_tpu.training import TrainingPreempted

        make_dirs(tmp_path)
        cfg = tiny_config(tmp_path, epochs=2)
        G, D = PConvUNet(base_width=8), Discriminator(base_width=8)
        ckpt = tmp_path / "master_checkpoint.pth"

        class SigtermOnFirstLog:
            """Tracker stub that SIGTERMs this process during the first
            batch's metric log — the handler must convert it into a
            graceful stop at the next batch boundary."""

            def log_training_batch(self, batch_metrics, step):
                if step == 0:
                    os.kill(os.getpid(), _signal.SIGTERM)

            def log_metrics(self, *a, **k):
                pass

            def log_model(self, *a, **k):
                pass

        prev = _signal.getsignal(_signal.SIGTERM)
        with pytest.raises(TrainingPreempted) as ei:
            train(
                tmp_path / "train" / "images", tmp_path / "train" / "masks",
                G, D, checkpoint_path=ckpt, config=cfg, image_size=64,
                tracker=SigtermOnFirstLog(),
            )
        assert ei.value.epoch == 0
        self._assert_preempted_ckpt(tmp_path / "preempted.pth", tmp_path)
        # the guard restored whatever handler pytest had installed
        assert _signal.getsignal(_signal.SIGTERM) == prev

    def test_preemption_preserves_best_master(self, tmp_path, monkeypatch):
        """A preemption during a LATER (possibly worse) epoch must not
        clobber the best-model master checkpoint the best-save contract
        guarantees (train.py:314-397): epoch 0 completes and writes the
        master; the epoch-1 preemption writes only preempted.pth."""
        from terra_gan_tpu.training import TrainingPreempted

        make_dirs(tmp_path)
        cfg = tiny_config(tmp_path, epochs=3)
        G, D = PConvUNet(base_width=8), Discriminator(base_width=8)
        ckpt = tmp_path / "master_checkpoint.pth"

        monkeypatch.setenv("TERRA_GAN_TPU_FAULT", "preempt@1:0")
        with pytest.raises(TrainingPreempted) as ei:
            train(
                tmp_path / "train" / "images", tmp_path / "train" / "masks",
                G, D, checkpoint_path=ckpt, config=cfg, image_size=64,
            )
        assert ei.value.epoch == 1

        # master = epoch-0 best save, untouched by the preemption
        template = GANTrainState.create(
            PConvUNet(base_width=8), Discriminator(base_width=8),
            jax.random.PRNGKey(9), sample_shape=(1, 64, 64, 1),
        )
        _, m_extra = import_pth(ckpt, template)
        assert m_extra.get("preempted") is not True
        assert m_extra["epoch"] == 0

        # preempted.pth = the LATEST state (2 committed epoch-0 steps)
        restored, p_extra = self._assert_preempted_ckpt(
            tmp_path / "preempted.pth", tmp_path
        )
        assert p_extra["epoch"] == 1
        assert int(restored.step) == 2


class TestHumanGuided:
    @staticmethod
    def _make_pairs(tmp_path, rng):
        pairs = []
        for i in range(4):
            img = tmp_path / f"img{i}.png"
            smask = tmp_path / f"smask{i}.png"
            hmask = tmp_path / f"hmask{i}.png"
            Image.fromarray(
                rng.integers(0, 255, (64, 64), dtype=np.uint8)
            ).save(img)
            Image.fromarray(
                (rng.random((64, 64)) > 0.3).astype(np.uint8) * 255
            ).save(smask)
            Image.fromarray(
                (rng.random((64, 64)) > 0.8).astype(np.uint8) * 255
            ).save(hmask)
            pairs.append({
                "image_path": img, "system_mask_path": smask,
                "human_mask_path": hmask, "tile_name": f"nj000{i}",
            })
        return pairs

    def test_preemption_drill(self, tmp_path, monkeypatch):
        """The HG fine-tune honors the same preemption discipline as
        initial training: snapshot + TrainingPreempted, no hard kill."""
        from terra_gan_tpu.training import TrainingPreempted

        ds = DirectMatchDataset(
            self._make_pairs(tmp_path, np.random.default_rng(5)), size=64
        )
        cfg = tiny_config(tmp_path)
        G = PConvUNet(base_width=8)
        variables = jax.jit(G.init, static_argnums=3)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 1)), jnp.ones((1, 64, 64, 1)), False,
        )
        monkeypatch.setenv("TERRA_GAN_TPU_FAULT", "preempt@0:1")
        with pytest.raises(TrainingPreempted) as ei:
            HumanGuidedTrainer(cfg).train(
                G, variables, ds, checkpoint_dir=tmp_path / "hg"
            )
        assert ei.value.epoch == 0
        snap = torch.load(
            tmp_path / "hg" / "preempted.pth", map_location="cpu",
            weights_only=False,
        )
        assert snap["preempted"] is True and snap["epoch"] == 0
        # the snapshot is a loadable generator state (reference layout)
        assert any(
            k.startswith("enc1") for k in snap["model_state_dict"]
        )

    def test_fine_tune(self, tmp_path):
        rng = np.random.default_rng(4)
        pairs = []
        for i in range(4):
            img = tmp_path / f"img{i}.png"
            smask = tmp_path / f"smask{i}.png"
            hmask = tmp_path / f"hmask{i}.png"
            Image.fromarray(
                rng.integers(0, 255, (64, 64), dtype=np.uint8)
            ).save(img)
            Image.fromarray(
                (rng.random((64, 64)) > 0.3).astype(np.uint8) * 255
            ).save(smask)
            Image.fromarray(
                (rng.random((64, 64)) > 0.8).astype(np.uint8) * 255
            ).save(hmask)
            pairs.append({
                "image_path": img, "system_mask_path": smask,
                "human_mask_path": hmask, "tile_name": f"nj000{i}",
            })
        ds = DirectMatchDataset(pairs, size=64)
        cfg = tiny_config(tmp_path)
        G = PConvUNet(base_width=8)
        variables = jax.jit(G.init, static_argnums=3)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 1)), jnp.ones((1, 64, 64, 1)), False,
        )
        trainer = HumanGuidedTrainer(cfg)
        result = trainer.train(
            G, variables, ds, checkpoint_dir=tmp_path / "hg"
        )
        assert result["best_loss"] is not None and result["best_loss"] > 0
        assert (tmp_path / "hg" / "generator_epoch_0.pth").exists()
        assert (tmp_path / "hg" / "best_model.pth").exists()
        # checkpoint loads into reference-format keys
        ck = torch.load(
            tmp_path / "hg" / "best_model.pth", map_location="cpu",
            weights_only=False,
        )
        assert "model_state_dict" in ck
        assert "enc1.input_conv.weight" in ck["model_state_dict"]
