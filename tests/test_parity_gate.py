"""The armed BASELINE_MODEL parity gate (utils/parity_gate.py).

No trained BASELINE_MODEL.pth exists in this environment, so these
tests prove the *harness* end-to-end with fresh-initialized reference
weights saved in the reference's own checkpoint formats
(main_pipeline.py:227-265): wrapped dict, legacy raw state dict, a
perturbed-weights failure case, and the loud-skip paths.
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ref_loader import reference_available
from terra_gan_tpu.utils import parity_gate

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference not mounted"
)


@pytest.fixture(scope="module")
def torch_checkpoint(tmp_path_factory):
    """Fresh-init reference generator saved the way main_pipeline.py does."""
    import torch

    ref = parity_gate._load_reference_models()
    torch.manual_seed(0)
    G = ref.generator.PConvUNet()
    root = tmp_path_factory.mktemp("baseline")
    wrapped = root / "BASELINE_MODEL.pth"
    torch.save(
        {"epoch": 0, "generator_state_dict": G.state_dict()}, wrapped
    )
    raw = root / "raw_state_dict.pth"
    torch.save(G.state_dict(), raw)
    return wrapped, raw


class TestParityGate:
    def test_wrapped_checkpoint_passes(self, torch_checkpoint):
        wrapped, _ = torch_checkpoint
        record = parity_gate.run_gate(wrapped, size=128)
        assert record["parity_gate"] == "pass", record
        assert record["nrmse"] <= 1e-3
        assert np.isfinite(record["hole_rmse"])

    def test_legacy_raw_state_dict_passes(self, torch_checkpoint):
        _, raw = torch_checkpoint
        record = parity_gate.run_gate(raw, size=128)
        assert record["parity_gate"] == "pass", record

    def test_gate_detects_candidate_drift(self, torch_checkpoint, monkeypatch):
        """Sensitivity: perturb only the candidate's weight conversion —
        the gate must fail (both sides loading the same file must not
        make it vacuously green)."""
        from terra_gan_tpu.utils import torch_compat

        real = torch_compat.torch_state_to_generator_vars

        def drifted(sd):
            variables = real(sd)
            k = np.asarray(variables["params"]["enc1"]["kernel"])
            variables["params"]["enc1"]["kernel"] = k + 0.05
            return variables

        monkeypatch.setattr(
            torch_compat, "torch_state_to_generator_vars", drifted
        )
        wrapped, _ = torch_checkpoint
        record = parity_gate.run_gate(wrapped, size=128)
        assert record["parity_gate"] == "fail"
        assert record["nrmse"] > 1e-3

    def test_missing_checkpoint_skips_loudly(self, tmp_path):
        record = parity_gate.run_gate(tmp_path / "nope.pth", size=128)
        assert record["parity_gate"] == "skipped"
        assert "armed" in record["reason"]

    def test_unrecognized_format_fails(self, tmp_path):
        import torch

        weird = tmp_path / "weird.pth"
        torch.save({"something": 1}, weird)
        record = parity_gate.run_gate(weird, size=128)
        assert record["parity_gate"] == "fail"

    def test_cli_json_line(self, torch_checkpoint, capsys):
        wrapped, _ = torch_checkpoint
        rc = parity_gate.main(["--checkpoint", str(wrapped), "--size", "128"])
        assert rc == 0
        record = json.loads(capsys.readouterr().out.strip())
        assert record["parity_gate"] == "pass"
