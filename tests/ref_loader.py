"""Load the reference PyTorch model modules as an oracle for parity tests.

The reference repo (read-only at /root/reference) is only used at test
time as a numerical oracle — nothing from it ships in this package.
Tests that need it skip cleanly when the reference isn't mounted.
"""

import importlib.util
import sys
import types
from pathlib import Path

REFERENCE = Path("/root/reference")


def reference_available() -> bool:
    return (REFERENCE / "mvp_gan/src/models/pconv.py").exists()


def load_reference_models():
    """Import reference pconv/generator/discriminator without executing
    the package __init__ (which drags in mlflow)."""
    models_dir = REFERENCE / "mvp_gan/src/models"
    pkg_name = "_ref_models"
    if pkg_name in sys.modules:
        return sys.modules[pkg_name]
    pkg = types.ModuleType(pkg_name)
    pkg.__path__ = [str(models_dir)]
    sys.modules[pkg_name] = pkg
    for name in ["pconv", "generator", "discriminator"]:
        spec = importlib.util.spec_from_file_location(
            f"{pkg_name}.{name}", models_dir / f"{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"{pkg_name}.{name}"] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, name, mod)
    return pkg
