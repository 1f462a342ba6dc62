"""BASELINE_MODEL activation-parity gate (armed, skip-loudly).

The project north star (BASELINE.json) requires <= 1e-3 normalized RMSE
vs the reference's inpaints when running the reference's trained
weights. No trained `BASELINE_MODEL.pth` ships in this environment, so
the gate is wired to fire the moment one appears (the reference load
path is main_pipeline.py:227-245: `_BASELINE_MODEL/BASELINE_MODEL.pth`,
either a dict with `generator_state_dict` or a raw state dict):

    python -m terra_gan_tpu.utils.parity_gate [--checkpoint P] [--size 512]

prints one JSON line {"parity_gate": "pass"|"fail"|"skipped", ...} and
exits non-zero on fail. The oracle is the actual torch reference
forward (loaded from /root/reference, CPU) on deterministic inputs; the
candidate is this framework's PConvUNet with the same weights imported
via torch_compat. The same machinery is unit-tested against
fresh-initialized reference models, so only the asset is missing — not
the harness.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

DEFAULT_CHECKPOINT = Path("_BASELINE_MODEL/BASELINE_MODEL.pth")
REFERENCE_ROOT = Path("/root/reference")
NRMSE_GATE = 1e-3


def _load_reference_models(reference_root: Path = REFERENCE_ROOT):
    """Import the reference's torch model modules as the oracle."""
    import importlib.util
    import types

    models_dir = reference_root / "mvp_gan/src/models"
    if not (models_dir / "generator.py").exists():
        return None
    pkg_name = "_parity_ref_models"
    if pkg_name in sys.modules:
        return sys.modules[pkg_name]
    pkg = types.ModuleType(pkg_name)
    pkg.__path__ = [str(models_dir)]
    sys.modules[pkg_name] = pkg
    for name in ("pconv", "generator"):
        spec = importlib.util.spec_from_file_location(
            f"{pkg_name}.{name}", models_dir / f"{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"{pkg_name}.{name}"] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, name, mod)
    return pkg


def extract_generator_state(ckpt: Any) -> Optional[Dict[str, np.ndarray]]:
    """Reference checkpoint formats -> generator state dict
    (main_pipeline.py:252-265: wrapped dict or legacy raw state dict)."""
    if not isinstance(ckpt, dict):
        return None
    if "generator_state_dict" in ckpt:
        return ckpt["generator_state_dict"]
    if any(k.startswith("enc1.") for k in ckpt):
        return ckpt
    return None


def run_gate(
    checkpoint: str | Path = DEFAULT_CHECKPOINT,
    size: int = 512,
    batch: int = 1,
    reference_root: Path = REFERENCE_ROOT,
    seed: int = 0,
) -> Dict[str, Any]:
    """Run the parity gate; returns the verdict record (never raises on
    a missing asset — that's a loud skip, not a failure)."""
    checkpoint = Path(checkpoint)
    if not checkpoint.exists():
        return {
            "parity_gate": "skipped",
            "reason": f"checkpoint not found: {checkpoint} — the gate is "
            "armed and will run when the reference .pth is provided",
        }
    ref_models = _load_reference_models(reference_root)
    if ref_models is None:
        return {
            "parity_gate": "skipped",
            "reason": f"torch reference not mounted at {reference_root}",
        }

    import torch

    from ..utils.torch_compat import load_pth, torch_state_to_generator_vars

    raw = load_pth(checkpoint)
    sd = extract_generator_state(raw)
    if sd is None:
        return {
            "parity_gate": "fail",
            "reason": "unrecognized checkpoint format (no generator state)",
        }

    # deterministic inputs: synthetic DSM tile + rectangle-hole mask
    rng = np.random.default_rng(seed)
    image = rng.random((batch, 1, size, size), dtype=np.float32)
    mask = np.ones((batch, 1, size, size), np.float32)
    mask[:, :, size // 4 : size // 2, size // 4 : size // 2] = 0.0
    masked = image * mask

    # --- torch oracle forward (eval mode, the evaluate.py contract) -------
    torch_G = ref_models.generator.PConvUNet()
    torch_G.load_state_dict(
        {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()}
    )
    torch_G.eval()
    with torch.no_grad():
        ref_out = torch_G(
            torch.from_numpy(masked), torch.from_numpy(mask)
        ).numpy()

    # --- this framework's forward on imported weights ---------------------
    import jax
    import jax.numpy as jnp

    from ..models import PConvUNet

    variables = torch_state_to_generator_vars(sd)
    G = PConvUNet()
    out = jax.jit(lambda v, x, m: G.apply(v, x, m, False))(
        jax.tree_util.tree_map(jnp.asarray, variables),
        jnp.asarray(np.transpose(masked, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(mask, (0, 2, 3, 1))),
    )
    got = np.transpose(np.asarray(out), (0, 3, 1, 2))

    scale = float(ref_out.max() - ref_out.min()) or 1.0
    nrmse = float(np.sqrt(np.mean((got - ref_out) ** 2))) / scale
    # the north-star quality number: RMSE restricted to the hole boundary
    hole = mask == 0.0
    hole_rmse = float(np.sqrt(np.mean((got[hole] - ref_out[hole]) ** 2)))
    return {
        "parity_gate": "pass" if nrmse <= NRMSE_GATE else "fail",
        "nrmse": nrmse,
        "hole_rmse": hole_rmse,
        "gate": NRMSE_GATE,
        "checkpoint": str(checkpoint),
        "size": size,
    }


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="BASELINE_MODEL parity gate")
    p.add_argument("--checkpoint", default=str(DEFAULT_CHECKPOINT))
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=1)
    args = p.parse_args(argv)
    record = run_gate(args.checkpoint, size=args.size, batch=args.batch)
    print(json.dumps(record))
    return 1 if record["parity_gate"] == "fail" else 0


if __name__ == "__main__":
    raise SystemExit(main())
