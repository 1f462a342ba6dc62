"""Fused decoder-tail kernel (ops/pallas/tail_kernel.py) parity tests.

Interpret-mode on the CPU backend: validates the kernel's tap algebra
(phase tables, pre-shifted planes, halo strips, renorm, composite)
against the pure-lax tail oracle, which mirrors the generator's exact
eval-path op sequence (reference semantics:
mvp_gan/src/models/generator.py:50-62, pconv.py:25-50).

The compiled-mode perf story is recorded in BASELINE.md: on this
Mosaic toolchain the kernel compiles and matches, but loses to XLA at
model level, so the model does not use it.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from terra_gan_tpu.ops.pallas.tail_kernel import (  # noqa: E402
    fused_decoder_tail,
    tail_reference,
)


def _make_args(rng, B=1, H=16, C=8, xm_mode="rand", dm_mode="rand"):
    d = jnp.asarray(rng.random((B, H, H, C), dtype=np.float32))
    if dm_mode == "ones":
        dm = jnp.ones((B, H, H, 1), jnp.float32)
    else:
        dm = jnp.asarray((rng.random((B, H, H, 1)) > 0.1).astype(np.float32))
    x = jnp.asarray(rng.random((B, 2 * H, 2 * H, 1), dtype=np.float32))
    if xm_mode == "ones":
        xm = jnp.ones((B, 2 * H, 2 * H, 1), jnp.float32)
    elif xm_mode == "zeros":
        xm = jnp.zeros((B, 2 * H, 2 * H, 1), jnp.float32)
    else:
        xm = jnp.asarray(
            (rng.random((B, 2 * H, 2 * H, 1)) > 0.25).astype(np.float32)
        )
    k_main = jnp.asarray(
        rng.normal(0, 0.05, (3, 3, C, C)).astype(np.float32)
    )
    k_skip = jnp.asarray(
        rng.normal(0, 0.05, (3, 3, 1, C)).astype(np.float32)
    )
    bias = jnp.asarray(rng.normal(0, 0.01, (C,)).astype(np.float32))
    bn_s = jnp.asarray(rng.random(C, dtype=np.float32) + 0.5)
    bn_b = jnp.asarray(rng.normal(0, 0.01, (C,)).astype(np.float32))
    bn_m = jnp.asarray(rng.normal(0, 0.01, (C,)).astype(np.float32))
    bn_v = jnp.asarray(rng.random(C, dtype=np.float32) + 0.5)
    k_fin = jnp.asarray(
        rng.normal(0, 0.05, (3, 3, C, 1)).astype(np.float32)
    )
    b_fin = jnp.asarray([0.01], np.float32)
    return (d, dm, x, xm, k_main, k_skip, bias,
            bn_s, bn_b, bn_m, bn_v, k_fin, b_fin)


class TestTailKernelParity:
    @pytest.mark.parametrize("xm_mode,dm_mode", [
        ("rand", "rand"),
        ("zeros", "ones"),
        ("zeros", "rand"),
    ])
    def test_matches_lax_oracle(self, xm_mode, dm_mode):
        rng = np.random.default_rng(0)
        args = _make_args(rng, xm_mode=xm_mode, dm_mode=dm_mode)
        ref = np.asarray(tail_reference(*args))
        got = np.asarray(
            fused_decoder_tail(*args, interpret=True, compute=jnp.float32)
        )
        assert got.shape == ref.shape
        assert np.abs(got - ref).max() < 1e-4

    def test_preserved_pixels_identity(self):
        """xm == 1 everywhere -> output is exactly the input."""
        rng = np.random.default_rng(1)
        args = _make_args(rng, xm_mode="ones")
        got = np.asarray(
            fused_decoder_tail(*args, interpret=True, compute=jnp.float32)
        )
        assert np.abs(got - np.asarray(args[2])).max() == 0.0

    def test_multi_strip_batch(self):
        """th smaller than 2H exercises the halo-strip decomposition."""
        rng = np.random.default_rng(2)
        args = _make_args(rng, B=2, H=16)
        ref = np.asarray(tail_reference(*args))
        got = np.asarray(
            fused_decoder_tail(
                *args, th=8, interpret=True, compute=jnp.float32
            )
        )
        assert np.abs(got - ref).max() < 1e-4


class TestTailKernelEnvelope:
    def test_rejects_non_2x_geometry(self):
        rng = np.random.default_rng(3)
        args = list(_make_args(rng))
        args[2] = jnp.zeros((1, 30, 32, 1), jnp.float32)  # not 2H
        with pytest.raises(ValueError):
            fused_decoder_tail(*args, interpret=True)

    def test_rejects_odd_strip_height(self):
        rng = np.random.default_rng(4)
        args = _make_args(rng)
        with pytest.raises(ValueError):
            fused_decoder_tail(*args, th=5, interpret=True)
