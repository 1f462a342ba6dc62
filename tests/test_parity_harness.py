"""Layerwise activation-diff harness (utils/parity_harness.py): the
r1 tool that proves stage-by-stage numerical parity against the torch
reference; plus the trace-summary parser in utils/profiling.py."""

from __future__ import annotations

import gzip
import json
import sys
from pathlib import Path

import pytest

jax = pytest.importorskip("jax")

sys.path.insert(0, str(Path(__file__).parent))
from ref_loader import reference_available  # noqa: E402


@pytest.mark.skipif(
    not reference_available(), reason="torch reference not present"
)
def test_run_harness_stagewise_parity():
    pytest.importorskip("torch")
    from terra_gan_tpu.utils.parity_harness import run_harness

    rows = run_harness(size=64)
    assert rows, "harness returned no stages"
    names = [n for n, _ in rows]
    assert any(n.startswith("enc1") for n in names)
    assert any(n.startswith("dec1") for n in names)
    worst = max(err for _, err in rows)
    # fresh-init torch weights converted to JAX: every stage within
    # the parity gate
    assert worst < 1e-3, dict(rows)


def test_device_op_summary_parses_trace(tmp_path):
    from terra_gan_tpu.utils.profiling import device_op_summary

    trace = {
        "traceEvents": [
            {"ph": "X", "name": "fusion.1", "dur": 1500,
             "args": {"long_name": "%fusion.1 = f32[8]"}},
            {"ph": "X", "name": "fusion.1", "dur": 500,
             "args": {"long_name": "%fusion.1 = f32[8]"}},
            {"ph": "X", "name": "copy.2", "dur": 800},
            {"ph": "M", "name": "meta-only"},
        ]
    }
    d = tmp_path / "plugins" / "profile" / "x"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as fh:
        json.dump(trace, fh)
    rows = device_op_summary(tmp_path, top=5)
    assert rows[0][0].startswith("fusion.1 | %fusion.1")
    assert rows[0][1] == pytest.approx(2.0)  # 2000 us -> 2 ms, summed
    assert rows[1] == ("copy.2", pytest.approx(0.8))
