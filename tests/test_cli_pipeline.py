"""End-to-end CLI pipeline test: train -> evaluate -> human_guided_train
on a synthetic Digimap zip (the reference's full L5 flow, SURVEY §3)."""

import zipfile
from pathlib import Path

import numpy as np
import pytest
import yaml
from PIL import Image

cv2 = pytest.importorskip("cv2")
torch = pytest.importorskip("torch")

from terra_gan_tpu.data.asc import write_asc


@pytest.fixture()
def workspace(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("EXPERIMENT_MODE", "true")
    rng = np.random.default_rng(0)
    cfg = {
        "training": {
            "loss_weights": {"perceptual": 0.0, "tv": 0.1, "boundary": 0},
            "modes": {
                "initial": {"epochs": 1, "batch_size": 2},
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
    with open("config.yaml", "w") as f:
        yaml.safe_dump(cfg, f)

    src = tmp_path / "src"
    dsm = src / "getmapping-dsm-2000_x"
    rgb = src / "getmapping_rgb_25cm_x"
    dsm.mkdir(parents=True), rgb.mkdir(parents=True)
    for x in range(3):
        for y in range(3):
            name = f"nj{x:02d}{y:02d}"
            write_asc(dsm / f"{name}_DSM.asc", rng.uniform(0, 100, (64, 64)))
            img = rng.integers(60, 200, (128, 128, 3), dtype=np.uint8)
            cv2.imwrite(str(rgb / f"{name}_rgb.jpg"), img)
    (tmp_path / "data/zips").mkdir(parents=True)
    with zipfile.ZipFile(tmp_path / "data/zips/NJ00.zip", "w") as zf:
        for p in src.rglob("*"):
            if p.is_file():
                zf.write(p, p.relative_to(src))
    return tmp_path


def run_cli(args):
    from terra_gan_tpu.cli.main_pipeline import main

    return main(args)


class TestPipelineCLI:
    @pytest.mark.slow
    def test_full_flow(self, workspace):
        rng = np.random.default_rng(1)

        # ---- train ----
        assert run_cli(["--mode", "train", "--config", "config.yaml"]) == 0
        assert Path("ckpts/master_checkpoint.pth").exists()
        # timestamped copy + metrics json
        assert list(Path("ckpts").glob("master_checkpoint_*.pth"))
        assert list(Path("ckpts").glob("training_metrics_*.json"))
        # splits materialized
        assert (Path("data/processed/NJ00/train/images")).is_dir()

        # master checkpoint loads into the reference torch model
        import sys
        sys.path.insert(0, str(Path(__file__).parent))
        from ref_loader import load_reference_models, reference_available

        if reference_available():
            ref = load_reference_models()
            ck = torch.load(
                "ckpts/master_checkpoint.pth", map_location="cpu",
                weights_only=False,
            )
            ref.generator.PConvUNet().load_state_dict(
                ck["generator_state_dict"]
            )
            assert ck["processed_grids"] == ["NJ00"]

        # ---- evaluate ----
        assert run_cli(["--mode", "evaluate", "--config", "config.yaml"]) == 0
        inpainted = sorted(Path("data/output/NJ00/inpainted").glob("*.png"))
        assert len(inpainted) == 3  # one third of 9 tiles are test split
        assert Image.open(inpainted[0]).size == (500, 500)
        colored = sorted(Path("data/output/NJ00/colored").glob("*.png"))
        assert len(colored) == 3

        # ---- human-guided ----
        ann = Path("data/output/NJ00/human_annotation_masks")
        ann.mkdir(parents=True, exist_ok=True)
        for m in Path("data/processed/NJ00/test/masks").glob(
            "*_mask_resized.png"
        ):
            tile = m.stem.replace("_mask_resized", "")
            hm = (rng.random((64, 64)) > 0.8).astype(np.uint8) * 255
            Image.fromarray(hm).save(ann / f"colored_{tile}_user1.png")
        assert run_cli(
            ["--mode", "human_guided_train", "--grid", "NJ00",
             "--config", "config.yaml"]
        ) == 0
        assert list(Path("ckpts").glob("master_model_human_guided_*.pth"))
        hg = torch.load(
            sorted(Path("ckpts").glob("master_model_human_guided_*.pth"))[-1],
            map_location="cpu", weights_only=False,
        )
        assert hg["human_guided"] is True
        assert hg["grid_square"] == "NJ00"

    @pytest.mark.slow
    def test_mesh_flag_train_and_evaluate(self, workspace):
        """Full driver flow on the virtual 8-device mesh (round-2
        verdict weakness #6): --mesh 4x2 through --mode train (sharded
        batches AND a non-divisible tail batch: 6 train tiles at batch
        4 -> one 4-tile sharded batch + one 2-tile tail) and --mode
        evaluate (mesh-sharded BatchedInpainter). Reference CLI
        surface: main_pipeline.py:114-138."""
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")

        # batch 4 so one batch shards over data=4 and the 2-tile tail
        # takes the data-replicated path
        cfg = yaml.safe_load(Path("config.yaml").read_text())
        cfg["training"]["modes"]["initial"]["batch_size"] = 4
        Path("config.yaml").write_text(yaml.safe_dump(cfg))

        assert run_cli(
            ["--mode", "train", "--config", "config.yaml", "--mesh", "4x2"]
        ) == 0
        assert Path("ckpts/master_checkpoint.pth").exists()

        assert run_cli(
            ["--mode", "evaluate", "--config", "config.yaml", "--mesh", "4x2"]
        ) == 0
        inpainted = sorted(Path("data/output/NJ00/inpainted").glob("*.png"))
        assert len(inpainted) == 3
        assert Image.open(inpainted[0]).size == (500, 500)

    @pytest.mark.slow
    def test_preemption_exit_75_and_resume(self, workspace, monkeypatch):
        """Pod-preemption drill through the real driver: an injected
        preemption (same code path as SIGTERM) saves the latest state to
        preempted.pth (never over the best-model master) and exits 75;
        re-running the same command resumes from it (optimizer state
        included, preempted.pth outranking the load chain), completes,
        and consumes it. The reference's only recovery is re-running
        after a hard kill (SURVEY §5.3)."""
        monkeypatch.setenv("TERRA_GAN_TPU_FAULT", "preempt@0:1")
        assert run_cli(["--mode", "train", "--config", "config.yaml"]) == 75
        # no epoch completed -> no master exists; the latest state went
        # to the dedicated preempted.pth
        assert not Path("ckpts/master_checkpoint.pth").exists()
        ck = torch.load(
            "ckpts/preempted.pth", map_location="cpu", weights_only=False,
        )
        assert ck.get("preempted") is True
        # one optimizer step committed before the batch-1 preempt point
        g_steps = ck["optimizer_G_state_dict"]["state"][0]["step"]
        assert int(g_steps) == 1

        monkeypatch.delenv("TERRA_GAN_TPU_FAULT")
        assert run_cli(["--mode", "train", "--config", "config.yaml"]) == 0
        ck = torch.load(
            "ckpts/master_checkpoint.pth", map_location="cpu",
            weights_only=False,
        )
        assert ck.get("preempted") is not True
        assert ck["processed_grids"] == ["NJ00"]
        # 1 preempted step + 1 resumed epoch x 2 batches: Adam moments
        # carried across the preemption, not reset
        g_steps = ck["optimizer_G_state_dict"]["state"][0]["step"]
        assert int(g_steps) == 3
        # the completed run consumed the preempted checkpoint
        assert not Path("ckpts/preempted.pth").exists()

    @pytest.mark.slow
    def test_hg_preemption_resume(self, workspace, monkeypatch):
        """Human-guided preemption resume: re-running the same command
        must continue from the HG preempted.pth — NOT restart from the
        pre-HG master and silently discard the fine-tune progress."""
        rng = np.random.default_rng(2)
        assert run_cli(["--mode", "train", "--config", "config.yaml"]) == 0

        ann = Path("data/output/NJ00/human_annotation_masks")
        ann.mkdir(parents=True, exist_ok=True)
        for m in Path("data/processed/NJ00/test/masks").glob(
            "*_mask_resized.png"
        ):
            tile = m.stem.replace("_mask_resized", "")
            hm = (rng.random((64, 64)) > 0.8).astype(np.uint8) * 255
            Image.fromarray(hm).save(ann / f"colored_{tile}_user1.png")

        monkeypatch.setenv("TERRA_GAN_TPU_FAULT", "preempt@0:1")
        assert run_cli(
            ["--mode", "human_guided_train", "--grid", "NJ00",
             "--config", "config.yaml"]
        ) == 75
        pre = Path("ckpts/human_guided/preempted.pth")
        assert pre.exists()

        monkeypatch.delenv("TERRA_GAN_TPU_FAULT")
        assert run_cli(
            ["--mode", "human_guided_train", "--grid", "NJ00",
             "--config", "config.yaml"]
        ) == 0
        hg = torch.load(
            sorted(Path("ckpts").glob("master_model_human_guided_*.pth"))[-1],
            map_location="cpu", weights_only=False,
        )
        # the resumed run loaded the preempted HG weights, consumed the
        # file on completion, and recorded the TRUE lineage (the
        # original master, not the now-deleted preempted.pth)
        assert hg["resumed_from_preemption"] is True
        assert hg["source_model"] == str(
            Path("ckpts/master_checkpoint.pth")
        )
        assert not pre.exists()

    @pytest.mark.slow
    def test_vgg_provenance_tagged(self, workspace):
        """Every run and exported checkpoint records which VGG weights
        the perceptual term used (round-2 verdict task #9): the tag
        must land in BOTH the tracker run params and the master .pth."""
        from terra_gan_tpu.models import vgg as vgg_mod

        # a real weights file -> the "pretrained:<path>" branch
        vgg_path = Path("vgg_weights.npz").resolve()
        vgg_mod.save_weights(str(vgg_path), vgg_mod.random_weights(1))

        cfg = yaml.safe_load(Path("config.yaml").read_text())
        cfg["training"]["vgg_weights_path"] = str(vgg_path)
        cfg["experiment_tracking"] = {
            "enabled": True, "tracking_uri": "file:mlruns",
        }
        Path("config.yaml").write_text(yaml.safe_dump(cfg))

        assert run_cli(["--mode", "train", "--config", "config.yaml"]) == 0

        # leg 1: run params in the tracker file store
        param_files = list(Path("mlruns").rglob("params/vgg_weights"))
        assert param_files, "vgg_weights param missing from run params"
        assert param_files[0].read_text() == f"pretrained:{vgg_path}"

        # leg 2: exported master checkpoint
        ck = torch.load(
            "ckpts/master_checkpoint.pth", map_location="cpu",
            weights_only=False,
        )
        assert ck["vgg_weights_provenance"] == f"pretrained:{vgg_path}"

    def test_evaluate_without_model_fails(self, workspace):
        assert run_cli(["--mode", "evaluate", "--config", "config.yaml"]) == 1

    def test_train_without_zips_fails(self, workspace):
        for z in Path("data/zips").glob("*.zip"):
            z.unlink()
        assert run_cli(["--mode", "train", "--config", "config.yaml"]) == 1
