"""Probe this toolchain's Mosaic support for ops the fused decoder-tail
kernel needs: lane-axis reduction to a W-on-lanes scalar field, lane
concat for K-packed dots, and W-lanes -> C-lanes broadcasts.

Each probe compiles and runs a minimal pallas_call on the real device
and prints ok/fail + max error vs numpy.
"""

from __future__ import annotations

import functools
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn):
    try:
        got, want = fn()
        err = float(np.abs(np.asarray(got) - want).max())
        print(f"{name}: OK maxerr={err:.2e}")
    except Exception as e:
        msg = str(e).splitlines()[0][:160] if str(e) else type(e).__name__
        print(f"{name}: FAIL {msg}")
        if os.environ.get("PROBE_VERBOSE"):
            traceback.print_exc()


ROWS, COLS, C = 16, 64, 64
rng = np.random.default_rng(0)
A = rng.random((ROWS, COLS, C), np.float32).astype(np.float32)
K1 = rng.random((C,), np.float32)
K2 = rng.random((C, C), np.float32)
M = rng.random((ROWS, COLS), np.float32)


def probe_lane_reduce():
    """[rows, cols, C] * k[C] summed over C -> [rows, cols] output
    (C-on-lanes field contracted into a W-on-lanes scalar field)."""

    def kern(a_ref, k_ref, o_ref):
        o_ref[...] = jnp.sum(a_ref[...] * k_ref[0][None, None, :], axis=-1)

    out = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec((ROWS, COLS, C), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, COLS), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, COLS), jnp.float32),
    )(A, K1.reshape(1, C))
    return out, (A * K1).sum(-1)


def probe_matvec_dot():
    """dot_general [rows, cols, C] @ [C, 1] -> padded-lane output."""

    def kern(a_ref, k_ref, o_ref):
        r = jax.lax.dot_general(
            a_ref[...], k_ref[...],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [rows, cols, 1]
        o_ref[...] = r[..., 0]

    out = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec((ROWS, COLS, C), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, COLS), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, COLS), jnp.float32),
    )(A, K1.reshape(C, 1))
    return out, (A @ K1)


def probe_lane_concat_dot():
    """concat two [rows, cols, C] on lanes -> K=2C dot."""

    def kern(a_ref, k_ref, o_ref):
        cat = jnp.concatenate([a_ref[...], a_ref[...] * 2.0], axis=-1)
        o_ref[...] = jax.lax.dot_general(
            cat, k_ref[...],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    out = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec((ROWS, COLS, C), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * C, C), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, COLS, C), lambda: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, COLS, C), jnp.float32),
    )(A, np.concatenate([K2, K2]).astype(np.float32))
    want = np.concatenate([A, A * 2.0], -1) @ np.concatenate([K2, K2])
    return out, want


def probe_mask_broadcast():
    """W-on-lanes scalar field broadcast over C (r1 pattern, control)."""

    def kern(a_ref, m_ref, o_ref):
        o_ref[...] = a_ref[...] * m_ref[...][..., None]

    out = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec((ROWS, COLS, C), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, COLS), lambda: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, COLS, C), lambda: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, COLS, C), jnp.float32),
    )(A, M)
    return out, A * M[..., None]


def probe_row_build():
    """Building an interleave-free U: stacked row ops + static row
    slices (the upsample H-combination pattern)."""

    def kern(d_ref, o_ref):
        top = d_ref[0:ROWS - 1]
        bot = d_ref[1:ROWS]
        o_ref[0 : ROWS - 1] = 0.25 * top + 0.75 * bot
        o_ref[ROWS - 1 :] = d_ref[ROWS - 1 :]

    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec((ROWS, COLS, C), lambda: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, COLS, C), lambda: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, COLS, C), jnp.float32),
    )(A)
    want = np.concatenate(
        [0.25 * A[:-1] + 0.75 * A[1:], A[-1:]], 0
    )
    return out, want


if __name__ == "__main__":
    run("lane_reduce (sum over C -> [rows,cols])", probe_lane_reduce)
    run("matvec_dot  (dot K=C N=1 -> [rows,cols])", probe_matvec_dot)
    run("lane_concat_dot (K=2C packed dot)", probe_lane_concat_dot)
    run("mask_broadcast ([rows,cols] -> C lanes)", probe_mask_broadcast)
    run("row_build (static row-slice writes)", probe_row_build)
