"""Pallas 2x bilinear upsample + exact adjoint (the train-path hot op).

The r4/r5 train roofline (scripts/profile_train.py, BASELINE.md) puts
the decoder upsample pair at the top of the XLA-resistant slack: at
the dec1 shape the forward runs 5.9 ms vs a 0.84 ms byte floor and the
adjoint 9.8 vs 1.6 — every XLA form measured (depthwise conv,
dense-diag, stencil shift/stack) lands ~8x over floor because each
materializes relayout copies between fusions. This kernel computes the
whole stencil in VMEM: one pass over the input, one write of the
output, taps in fp32 on the VPU.

Semantics: EXACTLY ops/resize.py's torch `align_corners=False` stencil
(reference mvp_gan/src/models/generator.py:50-51):

  out[2i]   = 0.25*in[clamp(i-1)] + 0.75*in[i]
  out[2i+1] = 0.75*in[i]          + 0.25*in[clamp(i+1)]   (per axis)

and its exact adjoint (resize.py:77-102):

  dx[i] = 0.25*g[2i-1] + 0.75*g[2i] + 0.75*g[2i+1] + 0.25*g[2i+2]
  (g[-1] == g[0], g[2n] == g[2n-1])                        (per axis)

Design notes (same Mosaic-build constraints as pconv_kernel.py):
  * manual HBM DMA crashes this remote Mosaic build, so the H halo
    rows arrive as two EXTRA row-granularity BlockSpec inputs over the
    same array with clamped index maps — +2 rows per BH-row block
    (~12% input re-read at BH=16), no manual DMA anywhere;
  * blocks keep W on sublanes and C on lanes, so the W interleave is
    a sublane shuffle and the H interleave a major-dim reshape — the
    lane dimension is never resized (the relayouts that cost XLA ~8x
    never touch HBM here);
  * grid (N, H/BH); whole rows stay in-block (W*C per row is <=64 KB
    bf16 at every decoder level of the 512^2 model).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows of input (fwd) / output (bwd) per grid step; H of every decoder
# level is a power of two >= 8, so min(_BH, H) always divides H.
# 16 rows OOMs the 16MB scoped-VMEM stack at the dec1 shape (the fp32
# W-upsampled intermediates are 4x the bf16 block): 8 fits, and the
# halo re-read it costs is +2 rows per 8 on the INPUT stream only
# (~5% of total op bytes).
_BH = 8


def pallas_upsample_enabled(default: bool = False) -> bool:
    """Gate: TERRA_GAN_TPU_PALLAS_UPSAMPLE=1/0 overrides `default`."""
    v = os.environ.get("TERRA_GAN_TPU_PALLAS_UPSAMPLE")
    if v is None:
        return default
    return v.lower() in ("1", "true", "yes")


def _supported(shape) -> bool:
    n, h, w, c = shape
    bh = min(_BH, h)
    return h % bh == 0 and h >= 2 and w >= 2


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _wup(v):
    """(R, W, C) -> (R, 2W, C) bilinear along W (sublane axis)."""
    prev = jnp.concatenate([v[:, :1], v[:, :-1]], axis=1)
    nxt = jnp.concatenate([v[:, 1:], v[:, -1:]], axis=1)
    ev = 0.25 * prev + 0.75 * v
    od = 0.75 * v + 0.25 * nxt
    r, w, c = v.shape
    return jnp.stack([ev, od], axis=2).reshape(r, 2 * w, c)


def _fwd_kernel(body_ref, above_ref, below_ref, out_ref):
    x = body_ref[0].astype(jnp.float32)        # (BH, W, C)
    xa = above_ref[0].astype(jnp.float32)      # (1, W, C) row i0-1 (clamped)
    xb = below_ref[0].astype(jnp.float32)      # (1, W, C) row i0+BH (clamped)
    full = jnp.concatenate([xa, x, xb], axis=0)    # (BH+2, W, C)
    fw = _wup(full)                                # (BH+2, 2W, C)
    cur, up, dn = fw[1:-1], fw[:-2], fw[2:]
    ev = 0.25 * up + 0.75 * cur
    od = 0.75 * cur + 0.25 * dn
    bh, w2, c = cur.shape
    out = jnp.stack([ev, od], axis=1).reshape(2 * bh, w2, c)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(1,))
def _up_fwd(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    n, h, w, c = x.shape
    bh = min(_BH, h)
    grid = (n, h // bh)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bh, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, w, c),
                lambda i, j, _bh=bh: (i, jnp.maximum(j * _bh - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, w, c),
                lambda i, j, _bh=bh, _h=h: (
                    i, jnp.minimum((j + 1) * _bh, _h - 1), 0, 0,
                ),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((1, 2 * bh, 2 * w, c),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w, c), x.dtype),
        interpret=interpret,
    )(x, x, x)


# ---------------------------------------------------------------------------
# adjoint
# ---------------------------------------------------------------------------


# bwd rows of OUTPUT per grid step: the input block is 2x as tall and
# 2x as wide as the fwd kernel's, so the row budget is a quarter
_BH_BWD = 4


def _bwd_kernel(body_ref, above_ref, below_ref, out_ref):
    # H adjoint FIRST (rows shrink 2BH+2 -> BH before the wide-W
    # stage, halving the peak of live fp32 temporaries):
    #   dx_h[k] = .25 L[2k] + .75 L[2k+1] + .75 L[2k+2] + .25 L[2k+3]
    # where L[j] = g[2h0-1+j] (local rows incl. the clamped halos).
    g = body_ref[0]                            # (2BH, 2W, C) rows 2h0..
    full = jnp.concatenate([above_ref[0], g, below_ref[0]], axis=0)
    r, w2, c = full.shape
    rr = full.reshape(r // 2, 2, w2, c)
    re = rr[:, 0].astype(jnp.float32)          # L[0], L[2], ...
    ro = rr[:, 1].astype(jnp.float32)          # L[1], L[3], ...
    dh = (0.25 * re[:-1] + 0.75 * ro[:-1]
          + 0.75 * re[1:] + 0.25 * ro[1:])     # (BH, 2W, C)
    # W adjoint: dx[i] = .25 go[i-1] + .75 ge[i] + .75 go[i] + .25 ge[i+1]
    # with go[-1]==ge[0] (left clamp) and ge[n]==go[n-1] (right clamp)
    v = dh.reshape(dh.shape[0], w2 // 2, 2, c)
    ge, go = v[:, :, 0], v[:, :, 1]
    prev_go = jnp.concatenate([ge[:, :1], go[:, :-1]], axis=1)
    next_ge = jnp.concatenate([ge[:, 1:], go[:, -1:]], axis=1)
    dx = 0.25 * prev_go + 0.75 * ge + 0.75 * go + 0.25 * next_ge
    out_ref[0] = dx.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(1,))
def _up_bwd(g: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    n, h2, w2, c = g.shape
    h = h2 // 2
    bh = min(_BH_BWD, h)
    grid = (n, h // bh)
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2 * bh, w2, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, w2, c),
                lambda i, j, _bh=bh: (
                    i, jnp.maximum(j * 2 * _bh - 1, 0), 0, 0,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, w2, c),
                lambda i, j, _bh=bh, _h2=h2: (
                    i, jnp.minimum((j + 1) * 2 * _bh, _h2 - 1), 0, 0,
                ),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((1, bh, w2 // 2, c),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w2 // 2, c), g.dtype),
        interpret=interpret,
    )(g, g, g)


def upsample2x_fwd_pallas(x: jnp.ndarray, interpret: bool = False):
    """[N,H,W,C] -> [N,2H,2W,C]; raises on unsupported shapes
    (callers pre-check with `supported`)."""
    return _up_fwd(x, interpret)


def upsample2x_bwd_pallas(g: jnp.ndarray, interpret: bool = False):
    """Exact adjoint: [N,2H,2W,C] -> [N,H,W,C]."""
    return _up_bwd(g, interpret)


def supported(shape) -> bool:
    return _supported(shape)
