"""Layerwise activation-diff harness (SURVEY §7.3 hard part #2).

Compares per-stage generator activations between this framework and
the PyTorch reference on identical weights, localizing any numerical
divergence to the first offending stage instead of a single end-to-end
RMSE. Usable as a library (tests) and as a CLI debugging tool when the
reference repo is mounted:

    python -m terra_gan_tpu.utils.parity_harness \
        [--checkpoint master.pth] [--size 128] [--seed 0]
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

STAGES = [f"enc{i}" for i in range(1, 8)] + [
    f"dec{i}" for i in range(7, 0, -1)
]


def jax_stage_activations(
    variables: Dict[str, Any], x: np.ndarray, mask: np.ndarray
) -> Dict[str, np.ndarray]:
    """NHWC activations after every PConv stage (eval mode)."""
    import jax
    import jax.numpy as jnp

    from ..models import PConvUNet

    acts: Dict[str, np.ndarray] = {}
    model = PConvUNet()

    _, state = model.apply(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
        jnp.asarray(x * mask), jnp.asarray(mask), False,
        capture_intermediates=lambda mdl, name: name == "__call__",
        mutable=["intermediates"],
    )

    def walk(tree, prefix=""):
        for key, val in tree.items():
            if key == "__call__":
                # flax stores call outputs as tuples per invocation
                out = val[0]
                if isinstance(out, tuple):
                    out = out[0]
                acts[prefix.rstrip("/")] = np.asarray(out)
            elif isinstance(val, dict):
                walk(val, prefix + key + "/")

    walk(state["intermediates"])
    return acts


def torch_stage_activations(
    torch_model, x: np.ndarray, mask: np.ndarray
) -> Dict[str, np.ndarray]:
    """NHWC activations from the reference model via forward hooks."""
    import torch

    acts: Dict[str, np.ndarray] = {}
    hooks = []

    def make_hook(name):
        def hook(_module, _inp, out):
            feat = out[0] if isinstance(out, tuple) else out
            acts[name] = feat.detach().numpy().transpose(0, 2, 3, 1)

        return hook

    for name in STAGES:
        module = getattr(torch_model, name, None)
        if module is not None:
            hooks.append(module.register_forward_hook(make_hook(name)))
    torch_model.eval()
    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x * mask, (0, 3, 1, 2)))
        mt = torch.from_numpy(np.transpose(mask, (0, 3, 1, 2)))
        torch_model(xt, mt)
    for h in hooks:
        h.remove()
    return acts


def compare_stages(
    jax_acts: Dict[str, np.ndarray],
    torch_acts: Dict[str, np.ndarray],
) -> List[Tuple[str, float]]:
    """Per-stage normalized RMSE, in forward order."""
    rows = []
    for name in STAGES:
        ja = jax_acts.get(name)
        ta = torch_acts.get(name)
        if ja is None or ta is None:
            continue
        denom = max(np.abs(ta).max(), 1e-12)
        nrmse = float(np.sqrt(np.mean((ja - ta) ** 2)) / denom)
        rows.append((name, nrmse))
    return rows


def run_harness(
    checkpoint: Optional[str] = None,
    size: int = 128,
    seed: int = 0,
    reference_dir: str = "/root/reference",
) -> List[Tuple[str, float]]:
    import sys
    from pathlib import Path

    import torch

    sys.path.insert(0, str(Path(reference_dir) / "mvp_gan/src/models"))
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_ref_generator", Path(reference_dir) / "mvp_gan/src/models/generator.py"
    )
    gen_mod = importlib.util.module_from_spec(spec)
    # generator.py imports .pconv relatively; load pconv first under the
    # expected name
    pspec = importlib.util.spec_from_file_location(
        "pconv", Path(reference_dir) / "mvp_gan/src/models/pconv.py"
    )
    pmod = importlib.util.module_from_spec(pspec)
    pspec.loader.exec_module(pmod)
    sys.modules["pconv"] = pmod
    gen_src = (Path(reference_dir) / "mvp_gan/src/models/generator.py").read_text()
    namespace: Dict[str, Any] = {}
    exec(
        gen_src.replace("from .pconv import", "from pconv import"),
        namespace,
    )
    tmodel = namespace["PConvUNet"]()

    if checkpoint:
        obj = torch.load(checkpoint, map_location="cpu", weights_only=False)
        sd = obj.get("generator_state_dict", obj)
        tmodel.load_state_dict(sd)
    from .torch_compat import torch_state_to_generator_vars

    variables = torch_state_to_generator_vars(tmodel.state_dict())

    rng = np.random.default_rng(seed)
    x = rng.random((1, size, size, 1), dtype=np.float32)
    mask = (rng.random((1, size, size, 1)) > 0.3).astype(np.float32)

    rows = compare_stages(
        jax_stage_activations(variables, x, mask),
        torch_stage_activations(tmodel, x, mask),
    )
    return rows


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="Layerwise parity harness")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--reference", default="/root/reference")
    args = p.parse_args(argv)
    rows = run_harness(
        args.checkpoint, args.size, args.seed, args.reference
    )
    worst = 0.0
    for name, nrmse in rows:
        flag = " <-- " if nrmse > 1e-3 else ""
        print(f"{name:6s} NRMSE {nrmse:.3e}{flag}")
        worst = max(worst, nrmse)
    print(f"worst stage NRMSE: {worst:.3e} (gate 1e-3)")
    return 0 if worst <= 1e-3 else 1


if __name__ == "__main__":
    raise SystemExit(main())
