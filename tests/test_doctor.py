"""Install diagnostics CLI (cli/doctor.py).

The reference has no install verification (a broken environment
surfaces mid-run, e.g. main_pipeline.py:209); the doctor runs every
load-bearing path upfront. These tests pin: all checks pass in this
environment, the exit-code contract, and checkpoint inspection on both
supported .pth layouts."""

import json

import jax
import numpy as np
import pytest

from terra_gan_tpu.cli import doctor


class TestChecks:
    def test_all_checks_pass_here(self, capsys):
        assert doctor.main(["--cpu"]) == 0
        out = capsys.readouterr().out
        assert "[FAIL" not in out
        assert "8 checks" in out

    def test_failing_check_sets_exit_code(self, monkeypatch, capsys):
        def boom():
            raise RuntimeError("synthetic failure")

        monkeypatch.setattr(doctor, "_check_native", boom)
        assert doctor.main(["--cpu"]) == 1
        assert "synthetic failure" in capsys.readouterr().out


class TestInspect:
    def test_reference_layout_pth(self, tmp_path, capsys):
        from terra_gan_tpu.models import Discriminator, PConvUNet
        from terra_gan_tpu.training import GANTrainState
        from terra_gan_tpu.training.checkpoint import export_pth

        state = GANTrainState.create(
            PConvUNet(base_width=8), Discriminator(base_width=8),
            jax.random.PRNGKey(0), sample_shape=(1, 32, 32, 1),
        )
        path = tmp_path / "master.pth"
        export_pth(path, state, epoch=7,
                   extra={"vgg_weights_provenance": "random:seed0"})
        assert doctor.main(["--inspect", str(path)]) == 0
        info = json.loads(capsys.readouterr().out)
        assert info["layout"].startswith("reference")
        assert info["epoch"] == 7
        assert info["vgg_weights_provenance"] == "random:seed0"
        assert info["has_discriminator"] is True
        assert info["generator_parameters"] > 1000

    def test_raw_state_dict(self, tmp_path, capsys):
        from terra_gan_tpu.utils.torch_compat import save_pth

        path = tmp_path / "raw.pth"
        save_pth(path, {"enc1.conv.weight": np.zeros((8, 1, 3, 3))})
        assert doctor.main(["--inspect", str(path)]) == 0
        info = json.loads(capsys.readouterr().out)
        assert info["layout"].startswith("raw state dict")
        assert info["generator_tensors"] == 1

    def test_unrecognized_object(self, tmp_path, capsys):
        from terra_gan_tpu.utils.torch_compat import save_pth

        path = tmp_path / "junk.pth"
        save_pth(path, [1, 2, 3])
        assert doctor.main(["--inspect", str(path)]) == 1
