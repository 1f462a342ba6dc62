"""AOT inference artifacts: serialized StableHLO export of the generator.

The reference has no deployment story beyond running the repo — its
serving unit is `evaluate.py:30` re-tracing the torch model per
process. Production TPU serving wants a hermetic, versioned artifact:
`jax.export` serializes the jitted eval-mode forward (weights baked
in as constants) to StableHLO bytecode with a versioned calling
convention, loadable by any later JAX — or a non-Python PJRT runtime
— without this package's model code or a Python tracing step.

Properties of the artifact:
  * symbolic batch dimension: one artifact serves every batch size
    (the 512x512 tile geometry is fixed, like the reference contract);
  * multi-platform: lowered for both TPU and CPU by default, so the
    same bytes serve on a TPU pod and in a CPU canary/CI;
  * quantization-aware: exporting a ``quant="w8a8"`` generator bakes
    the int8 weights + static activation scales into the artifact —
    the deployed program IS the calibrated int8-MXU program;
  * self-describing: `describe()` returns the embedded metadata
    (shapes, dtypes, platforms, calling-convention version).

CLI: ``python scripts/export_model.py --checkpoint master_model.pth
--out generator.shlo [--quant w8a8 --calib-dir tiles/]``.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Sequence

_MAGIC = b"TGTPU-EXPORT\x00"
_VERSION = 1


def _forward_fn(generator, variables):
    def forward(image, mask):
        # the eval contract (evaluate.py:52-58): masked input, eval mode
        return generator.apply(variables, image * mask, mask, False)

    return forward


def export_generator(
    generator,
    variables,
    *,
    size: int = 512,
    platforms: Sequence[str] = ("tpu", "cpu"),
    static_batch: Optional[int] = None,
):
    """Export the generator's eval forward as a jax.export.Exported.

    size: tile side (the reference trains/serves 512**2 — train.py:67).
    platforms: lowering targets baked into the artifact; running on any
      other platform raises at call time.
    static_batch: fix the batch dimension instead of the default
      symbolic "b" (some non-JAX PJRT consumers want static shapes).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    fwd = jax.jit(_forward_fn(generator, variables))
    if static_batch is None:
        shape = jexport.symbolic_shape(f"b, {size}, {size}, 1")
    else:
        shape = (static_batch, size, size, 1)
    spec = jax.ShapeDtypeStruct(shape, jnp.float32)
    return jexport.export(fwd, platforms=list(platforms))(spec, spec)


def serialize_generator(generator, variables, **kwargs) -> bytes:
    """Export and frame as a self-describing artifact file body."""
    exp = export_generator(generator, variables, **kwargs)
    payload = exp.serialize()
    meta = {
        "format_version": _VERSION,
        "fn_name": exp.fun_name,
        "platforms": list(exp.platforms),
        "in_shardings": len(exp.in_shardings_hlo),
        "in_avals": [str(a) for a in exp.in_avals],
        "out_avals": [str(a) for a in exp.out_avals],
        "calling_convention_version": exp.calling_convention_version,
        "quant": (
            "w8a8_resident"
            if getattr(generator, "quant_resident", False)
            and getattr(generator, "quant", None) == "w8a8"
            else getattr(generator, "quant", None)
        ),
        "size": kwargs.get("size", 512),
    }
    head = json.dumps(meta).encode()
    return (
        _MAGIC
        + len(head).to_bytes(4, "little")
        + head
        + payload
    )


def save_exported(path: str | Path, generator, variables, **kwargs) -> Dict:
    """serialize_generator to a file; returns the embedded metadata."""
    blob = serialize_generator(generator, variables, **kwargs)
    Path(path).write_bytes(blob)
    return describe(blob)


def _split(blob: bytes):
    if not blob.startswith(_MAGIC):
        raise ValueError("not a terra_gan_tpu export artifact (bad magic)")
    off = len(_MAGIC)
    n = int.from_bytes(blob[off : off + 4], "little")
    meta = json.loads(blob[off + 4 : off + 4 + n].decode())
    return meta, blob[off + 4 + n :]


def describe(path_or_blob: str | Path | bytes) -> Dict:
    """The artifact's embedded metadata (no deserialization/compile)."""
    blob = (
        path_or_blob
        if isinstance(path_or_blob, bytes)
        else Path(path_or_blob).read_bytes()
    )
    return _split(blob)[0]


def load_exported(path_or_blob: str | Path | bytes):
    """Load an artifact into a jitted callable (image, mask) -> tiles.

    The returned callable runs the serialized StableHLO — the model
    code, checkpoint and calibration used at export time are not
    consulted (or needed) at all.
    """
    import jax
    from jax import export as jexport

    blob = (
        path_or_blob
        if isinstance(path_or_blob, bytes)
        else Path(path_or_blob).read_bytes()
    )
    meta, payload = _split(blob)
    exp = jexport.deserialize(bytearray(payload))
    call = jax.jit(exp.call)
    call.meta = meta  # type: ignore[attr-defined]
    return call


def load_variables_for_export(checkpoint: str | Path) -> Dict[str, Any]:
    """Generator variables from any supported checkpoint form
    (.pth reference layout, raw state dict, or orbax native dir)."""
    from ..evaluation.inference import load_generator_variables

    return load_generator_variables(checkpoint)


def calibrated_quant_generator(generator, variables, calib_dir: str | Path,
                               n_tiles: int = 16, size: int = 512,
                               quant: str = "w8a8"):
    """Clone the generator into its w8a8 static-scale form, calibrated
    on up to n_tiles masked image/mask pairs from calib_dir.

    Same loader and layout rules as serving startup calibration
    (serving/server.py --calib-dir): tiles flat in calib_dir or under
    {images,masks}; unmasked tiles excluded (an all-ones mask has
    nothing to inpaint and would skew the static activation scales)."""
    import jax.numpy as jnp

    from ..evaluation.inference import load_calibration_tiles
    from ..ops.quant import calibrate_quant_scales

    tiles = load_calibration_tiles(calib_dir, size, n_tiles)
    if tiles is None:
        raise ValueError(
            f"no masked calibration tile pairs under {calib_dir} "
            "(expected <stem>.png + <stem>_mask_resized.png, flat or "
            "under images/ and masks/)"
        )
    x, m = (jnp.asarray(a) for a in tiles)
    scales = calibrate_quant_scales(generator, variables, [(x * m, m)])
    from ..ops.quant import quantized_clone

    return quantized_clone(generator, quant, scales)


def main(argv=None) -> int:
    """CLI: checkpoint -> artifact (also `scripts/export_model.py` and
    the `terra-gan-tpu-export` console script)."""
    import argparse
    import sys

    p = argparse.ArgumentParser(
        description="Export a generator to a StableHLO inference artifact"
    )
    p.add_argument("--checkpoint", default=None,
                   help=".pth (reference layout or raw state dict) or "
                        "orbax checkpoint; omit for random weights "
                        "(smoke tests)")
    p.add_argument("--out", required=True, help="artifact output path")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--base-width", type=int, default=64)
    p.add_argument("--platforms", default="tpu,cpu",
                   help="comma-separated lowering targets")
    p.add_argument("--fp32", action="store_true",
                   help="fp32 compute (default bf16, the serving mode)")
    p.add_argument("--quant", choices=["w8a8", "w8a8_resident"], default=None,
                   help="bake static-scale int8 quantization into the "
                        "artifact (needs --calib-dir)")
    p.add_argument("--calib-dir", default=None,
                   help="sample tile/mask pairs for --quant calibration")
    p.add_argument("--static-batch", type=int, default=None,
                   help="fix the batch dim instead of symbolic 'b'")
    p.add_argument("--backend", choices=["default", "cpu"],
                   default="default",
                   help="'cpu' pins the local backend — exporting only "
                        "lowers and serializes, so no accelerator is "
                        "needed even for --platforms tpu")
    args = p.parse_args(argv)

    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ..models import PConvUNet
    from ..utils.jax_setup import enable_persistent_cache

    enable_persistent_cache()
    cd = None if args.fp32 else jnp.bfloat16
    generator = PConvUNet(
        base_width=args.base_width, compute_dtype=cd,
        precision="highest" if args.fp32 else None,
    )
    if args.checkpoint:
        variables = load_variables_for_export(args.checkpoint)
    else:
        print("WARNING: no --checkpoint; exporting random weights",
              file=sys.stderr)
        variables = jax.jit(generator.init, static_argnums=3)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.size, args.size, 1)),
            jnp.ones((1, args.size, args.size, 1)),
            False,
        )

    if args.quant:
        if not args.calib_dir:
            p.error("--quant needs --calib-dir (static activation "
                    "scales come from real tiles; see BASELINE.md r3 "
                    "— dynamic scales lose on both speed and quality)")
        generator = calibrated_quant_generator(
            generator, variables, args.calib_dir, size=args.size,
            quant=args.quant,
        )

    meta = save_exported(
        args.out, generator, variables,
        size=args.size,
        platforms=tuple(s.strip() for s in args.platforms.split(",") if s),
        static_batch=args.static_batch,
    )
    meta["bytes"] = Path(args.out).stat().st_size
    print(json.dumps(meta, indent=2))
    return 0
