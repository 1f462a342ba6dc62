"""`terra-gan-tpu-doctor` — environment and install diagnostics.

The reference has no install verification at all: a broken CUDA setup,
a missing torchvision weight file, or an unwritable mlruns directory
surfaces as a stack trace deep inside a training run (e.g.
main_pipeline.py:209's bare `torch.device(...)`). Production TPU
deployments want the failure BEFORE the job is scheduled, so this tool
runs the framework's load-bearing paths in seconds and reports
PASS/WARN/FAIL per check:

  * versions       — python / jax / flax / optax / numpy
  * backend        — devices visible to JAX (``--cpu`` pins the CPU
                     backend first: probing a TPU runtime from a login
                     host can hang on the remote relay)
  * compile-cache  — persistent compilation cache directory writable
  * native         — the C++ runtime library (terra_io): .asc parse,
                     NaN-aware normalize, box-sum, and the gray8 PNG
                     codec round-trip against PIL
  * model          — tiny PConvUNet jit forward produces finite values
  * mesh           — (data, spatial) mesh + sharded batch placement
  * config         — config file loads through the typed schema
  * checkpoint     — ``--inspect ckpt.pth``: layout, epoch, parameter
                     count, VGG-weight provenance tag

Exit code: 0 when nothing FAILs (WARNs allowed), 1 otherwise.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from typing import Callable, List, Optional, Tuple

PASS, WARN, FAIL, SKIP = "PASS", "WARN", "FAIL", "SKIP"


class _Report:
    def __init__(self) -> None:
        self.rows: List[Tuple[str, str, str]] = []

    def add(self, name: str, status: str, detail: str = "") -> None:
        self.rows.append((name, status, detail))
        print(f"  [{status:4s}] {name}" + (f" — {detail}" if detail else ""))

    def run(self, name: str, fn: Callable[[], Optional[str]]) -> None:
        """fn returns a detail string (PASS) or raises; a returned
        string starting with 'WARN:' downgrades to WARN."""
        try:
            detail = fn() or ""
            if detail.startswith("WARN:"):
                self.add(name, WARN, detail[len("WARN:"):].strip())
            else:
                self.add(name, PASS, detail)
        except Exception as e:  # noqa: BLE001 - each check is a probe
            self.add(name, FAIL, f"{type(e).__name__}: {e}")

    @property
    def failed(self) -> bool:
        return any(s == FAIL for _, s, _ in self.rows)


def _check_versions() -> str:
    import flax
    import jax
    import numpy as np
    import optax

    return (
        f"python {sys.version.split()[0]}, jax {jax.__version__}, "
        f"flax {flax.__version__}, optax {optax.__version__}, "
        f"numpy {np.__version__}"
    )


def _check_backend() -> str:
    import jax

    devs = jax.devices()
    plats = {d.platform for d in devs}
    return f"{len(devs)} device(s) on {'/'.join(sorted(plats))}"


def _check_cache() -> str:
    from ..utils.jax_setup import enable_persistent_cache

    path = enable_persistent_cache()
    probe = Path(path) / ".doctor_probe"
    probe.write_text("ok")
    probe.unlink()
    return f"writable at {path}"


def _check_native() -> str:
    import numpy as np

    from ..utils import native

    if not native.native_available():
        return (
            "WARN: C++ terra_io unavailable (pure-python fallbacks "
            "active: slower .asc parse and PIL-speed PNG codec)"
        )
    rng = np.random.default_rng(0)
    # .asc body parse vs numpy
    body = "\n".join(
        " ".join(f"{v:.3f}" for v in row)
        for row in rng.random((8, 8)) * 100
    )
    parsed = native.parse_asc_body(body, 8, 8, nodata=-9999.0)
    ref = np.loadtxt(body.splitlines())
    np.testing.assert_allclose(parsed, ref, rtol=1e-6)
    # gray8 PNG codec round-trip
    img = rng.integers(0, 255, (64, 64), dtype=np.uint8)
    data = native.png_encode_gray8(img)
    back = native.png_decode_gray8(data)
    np.testing.assert_array_equal(back, img)
    # PIL agrees the bytes are a valid PNG
    import io

    from PIL import Image

    np.testing.assert_array_equal(
        np.asarray(Image.open(io.BytesIO(data)).convert("L")), img
    )
    return "asc parse + png codec round-trips exact"


def _check_model() -> str:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models import PConvUNet

    G = PConvUNet(base_width=8)
    x = jnp.asarray(np.linspace(0, 1, 32 * 32, dtype=np.float32)
                    .reshape(1, 32, 32, 1))
    m = jnp.ones((1, 32, 32, 1), jnp.float32).at[:, 8:16, 8:16].set(0.0)
    variables = jax.jit(G.init, static_argnums=3)(
        jax.random.PRNGKey(0), x, m, False
    )
    out = jax.jit(lambda v, a, b: G.apply(v, a * b, b, False))(
        variables, x, m
    )
    if not bool(jnp.isfinite(out).all()):
        raise RuntimeError("non-finite forward output")
    return "jit forward finite on a 32x32 masked tile"


def _check_quant() -> str:
    """int8 path probe: the w8a8 modes (evaluation.quant, serving
    --quant) need int8 convs and the resident dataflow to lower on this
    backend; a broken path should surface pre-flight, not mid-serving."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models import PConvUNet
    from ..ops.quant import calibrate_quant_scales, quantized_clone

    G = PConvUNet(base_width=8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 32, 32, 1), dtype=np.float32))
    m = jnp.asarray((rng.random((1, 32, 32, 1)) > 0.3).astype(np.float32))
    variables = jax.jit(G.init, static_argnums=3)(
        jax.random.PRNGKey(0), x, m, False
    )
    ref = jax.jit(lambda v, a, b: G.apply(v, a * b, b, False))(
        variables, x, m
    )
    scales = calibrate_quant_scales(G, variables, [(x * m, m)])
    R = quantized_clone(G, "w8a8_resident", scales)
    out = jax.jit(lambda v, a, b: R.apply(v, a * b, b, False))(
        variables, x, m
    )
    err = float(jnp.max(jnp.abs(out - ref)))
    if not np.isfinite(err) or err > 0.1:
        raise RuntimeError(f"w8a8_resident diverges from exact: {err:.3g}")
    return f"w8a8_resident forward lowers; max|err| {err:.1e} vs exact"


def _check_mesh() -> str:
    import jax
    import numpy as np

    from ..parallel import make_mesh, shard_batch

    n = len(jax.devices())
    spatial = 2 if n % 2 == 0 and n >= 2 else 1
    mesh = make_mesh(n, spatial=spatial)
    batch = {"image": np.zeros((max(2, n), 16, 16, 1), np.float32)}
    shard_batch(batch, mesh)
    return f"(data={n // spatial}, spatial={spatial}) mesh shards a batch"


def _check_config(path: Optional[str]) -> str:
    from ..config import load_config

    if path is None:
        example = Path(__file__).resolve().parents[2] / "config.example.yaml"
        if not example.exists():
            return "WARN: no --config given and no config.example.yaml found"
        path = str(example)
    cfg = load_config(path)
    t = cfg.training.initial
    return (
        f"{Path(path).name}: epochs={t.epochs} batch={t.batch_size} "
        f"lr={t.learning_rate}"
    )


def _inspect_checkpoint(path: str) -> int:
    """Print a checkpoint's layout, provenance and parameter digest."""
    import numpy as np

    from ..utils.torch_compat import load_pth

    p = Path(path)
    if p.is_dir():
        print(json.dumps({"path": path, "layout": "orbax-dir"}, indent=2))
        return 0
    obj = load_pth(p)
    info = {"path": path, "bytes": p.stat().st_size}
    if isinstance(obj, dict) and "generator_state_dict" in obj:
        info["layout"] = "reference (main_pipeline.py:386-412 contract)"
        for key in ("epoch", "g_loss", "d_loss", "human_guided",
                    "vgg_weights_provenance", "preempted",
                    "source_model"):
            if key in obj:
                info[key] = obj[key]
        sd = obj["generator_state_dict"]
        info["has_discriminator"] = "discriminator_state_dict" in obj
        info["has_optimizers"] = "optimizer_G_state_dict" in obj
    elif isinstance(obj, dict):
        info["layout"] = "raw state dict (legacy load path)"
        sd = obj
    else:
        info["layout"] = f"unrecognized ({type(obj).__name__})"
        print(json.dumps(info, indent=2))
        return 1
    n_params = n_tensors = 0
    for v in sd.values():
        arr = np.asarray(v)
        n_tensors += 1
        n_params += arr.size
    info["generator_tensors"] = n_tensors
    info["generator_parameters"] = int(n_params)
    print(json.dumps(info, indent=2, default=str))
    return 0


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        description="terra_gan_tpu install / environment diagnostics"
    )
    p.add_argument("--cpu", action="store_true",
                   help="pin the CPU backend before any JAX init "
                        "(skips TPU runtime probing)")
    p.add_argument("--config", default=None,
                   help="config.yaml to validate (default: the "
                        "packaged config.example.yaml if present)")
    p.add_argument("--inspect", default=None, metavar="CKPT",
                   help="inspect a checkpoint (.pth or orbax dir) "
                        "instead of running environment checks")
    args = p.parse_args(argv)

    if args.inspect:
        return _inspect_checkpoint(args.inspect)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    print("terra_gan_tpu doctor")
    r = _Report()
    r.run("versions", _check_versions)
    r.run("backend", _check_backend)
    r.run("compile-cache", _check_cache)
    r.run("native", _check_native)
    r.run("model", _check_model)
    r.run("quant", _check_quant)
    r.run("mesh", _check_mesh)
    r.run("config", lambda: _check_config(args.config))
    n_fail = sum(1 for _, s, _ in r.rows if s == FAIL)
    n_warn = sum(1 for _, s, _ in r.rows if s == WARN)
    print(f"{len(r.rows)} checks: {len(r.rows) - n_fail - n_warn} pass, "
          f"{n_warn} warn, {n_fail} fail")
    return 1 if r.failed else 0


if __name__ == "__main__":
    sys.exit(main())
