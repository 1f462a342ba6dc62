"""Config system (SURVEY §5.6): typed schema over the reference YAML
shape, plus the unknown-key warnings (a typo'd knob must not silently
fall back to its default)."""

import logging
from pathlib import Path

import pytest
import yaml

from terra_gan_tpu.config import Config

REF_CONFIG = Path("/root/reference/config.yaml")


class TestUnknownKeyWarnings:
    def test_typo_warns_with_suggestion(self, caplog):
        with caplog.at_level(logging.WARNING, "terra_gan_tpu.config"):
            Config.from_dict({"training": {"remat_stage": ["enc1"]}})
        assert any(
            "training.remat_stage" in r.message
            and "remat_stages" in r.message
            for r in caplog.records
        )

    def test_nested_typo_warns(self, caplog):
        with caplog.at_level(logging.WARNING, "terra_gan_tpu.config"):
            Config.from_dict({
                "training": {"modes": {"initial": {"epoch": 3}}},
                "evaluation": {"metrics": {"iou_treshold": 0.4}},
            })
        msgs = [r.message for r in caplog.records]
        assert any("training.modes.initial.epoch" in m for m in msgs)
        assert any("evaluation.metrics.iou_treshold" in m for m in msgs)

    def test_known_extras_do_not_warn(self, caplog):
        """Every raw-dict read key (vgg_weights_path, compute_dtype) and
        TPU-only addition must load silently."""
        with caplog.at_level(logging.WARNING, "terra_gan_tpu.config"):
            Config.from_dict({
                "training": {
                    "vgg_weights_path": "vgg.npz",
                    "compute_dtype": "bf16",
                    "remat_stages": ["enc1"],
                    "async_checkpoint": True,
                    "vgg_remat": False,
                },
                "evaluation": {"quant": "w8a8"},
            })
        assert not caplog.records

    def test_freeform_sections_not_checked(self, caplog):
        """mask_processing / data / portal stay free-form (the reference
        reads them loosely; detectors take arbitrary tuning keys)."""
        with caplog.at_level(logging.WARNING, "terra_gan_tpu.config"):
            Config.from_dict({
                "mask_processing": {"my_custom_detector": {"knob": 1}},
                "data": {"some_future_key": "x"},
            })
        assert not caplog.records

    @pytest.mark.skipif(
        not REF_CONFIG.exists(), reason="reference not mounted"
    )
    def test_reference_config_loads_warning_free(self, caplog):
        """The reference's own config.yaml (the migration contract) must
        produce zero warnings."""
        with caplog.at_level(logging.WARNING, "terra_gan_tpu.config"):
            cfg = Config.from_dict(
                yaml.safe_load(REF_CONFIG.read_text()) or {}
            )
        assert not caplog.records
        assert cfg.training.initial.batch_size == 32
