"""JAX runtime setup helpers.

This environment's TPU is reached through a remote-compile relay where
a cold compile of the full model costs minutes; the persistent
compilation cache makes every subsequent process start in seconds.
"""

from __future__ import annotations

import os
from pathlib import Path


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    import jax

    path = Path(
        cache_dir
        or os.environ.get("TERRA_GAN_TPU_JAX_CACHE")
        or Path.home() / ".cache" / "terra_gan_tpu" / "jax"
    )
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return str(path)
