"""A/B the 2x bilinear upsample forms, forward and adjoint, on TPU.

r4 train profile: the decoder upsample pair is the largest op-level
slack — fwd (depthwise lhs-dilated conv) 5.9 ms vs a 0.84 ms byte
floor, bwd (XLA's transposed depthwise conv) 9.8 ms vs 1.6 — because
depthwise convs starve the MXU (contraction depth 1). Candidate forms:

  fwd:  depthwise   — current production form
        dense-diag  — same taps embedded as K[a,b,ci,co]=t[a]t[b]*I:
                      64x redundant MACs but MXU-shaped; FLOPs are
                      free at this arithmetic intensity
        stencil     — shift/stack (r1: lost 4x to depthwise)
  bwd:  depthwise   — k4 s2 edge-padded depthwise (== XLA's derived)
        dense-diag  — same with the diagonal dense kernel

Measures each at the hot shape (dec1 level: [16,256,256,64] bf16 ->
[16,512,512,64]) and the three next decoder levels, prints ms and the
roofline floor. Informs which form ships in ops/resize.upsample2x_
bilinear's custom_vjp.

    python scripts/exp_upsample_forms.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_HBM_GBS = 819.0


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from terra_gan_tpu.ops.resize import _upsample2x_linear_axis

    def fwd_depthwise(x):
        b, h, w, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        taps = jnp.array([0.25, 0.75, 0.75, 0.25], x.dtype)
        kern = (jnp.outer(taps, taps)[:, :, None, None]
                * jnp.ones((1, 1, 1, c), x.dtype))
        out = lax.conv_general_dilated(
            xp, kern, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
        return out[:, 2: 2 + 2 * h, 2: 2 + 2 * w, :]

    def _diag_kernel(c, dtype):
        taps = np.array([0.25, 0.75, 0.75, 0.25], np.float32)
        k = np.einsum("a,b,ij->abij", taps, taps, np.eye(c, dtype=np.float32))
        return jnp.asarray(k, dtype)

    def fwd_dense(x):
        b, h, w, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        out = lax.conv_general_dilated(
            xp, _diag_kernel(c, x.dtype), (1, 1), ((2, 2), (2, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out[:, 2: 2 + 2 * h, 2: 2 + 2 * w, :]

    def fwd_stencil(x):
        return _upsample2x_linear_axis(_upsample2x_linear_axis(x, 1), 2)

    def bwd_depthwise(g):
        b, h2, w2, c = g.shape
        gp = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        taps = jnp.array([0.25, 0.75, 0.75, 0.25], g.dtype)
        kern = (jnp.outer(taps, taps)[:, :, None, None]
                * jnp.ones((1, 1, 1, c), g.dtype))
        return lax.conv_general_dilated(
            gp, kern, (2, 2), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    def bwd_dense(g):
        b, h2, w2, c = g.shape
        gp = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        return lax.conv_general_dilated(
            gp, _diag_kernel(c, g.dtype), (2, 2), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def _diag_kernel_1d(c, k, dtype, axis):
        taps = np.array([0.25, 0.75, 0.75, 0.25], np.float32)
        eye = np.eye(c, dtype=np.float32)
        if axis == 1:  # H taps: kernel [4, 1, c, c]
            kk = np.einsum("a,ij->aij", taps, eye)[:, None]
        else:  # W taps: kernel [1, 4, c, c]
            kk = np.einsum("a,ij->aij", taps, eye)[None]
        return jnp.asarray(kk, dtype)

    def bwd_sep_depthwise(g):
        b, h2, w2, c = g.shape
        taps = jnp.array([0.25, 0.75, 0.75, 0.25], g.dtype)
        kh = taps[:, None, None, None] * jnp.ones((1, 1, 1, c), g.dtype)
        kw = taps[None, :, None, None] * jnp.ones((1, 1, 1, c), g.dtype)
        y = lax.conv_general_dilated(
            jnp.pad(g, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge"),
            kh, (2, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
        return lax.conv_general_dilated(
            jnp.pad(y, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge"),
            kw, (1, 2), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    def bwd_sep_dense(g):
        b, h2, w2, c = g.shape
        y = lax.conv_general_dilated(
            jnp.pad(g, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge"),
            _diag_kernel_1d(c, 4, g.dtype, 1), (2, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return lax.conv_general_dilated(
            jnp.pad(y, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge"),
            _diag_kernel_1d(c, 4, g.dtype, 2), (1, 2), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def fwd_sep_dense(x):
        b, h, w, c = x.shape
        y = lax.conv_general_dilated(
            jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge"),
            _diag_kernel_1d(c, 4, x.dtype, 1), (1, 1), ((2, 2), (0, 0)),
            lhs_dilation=(2, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[:, 2: 2 + 2 * h]
        return lax.conv_general_dilated(
            jnp.pad(y, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge"),
            _diag_kernel_1d(c, 4, x.dtype, 2), (1, 1), ((0, 0), (2, 2)),
            lhs_dilation=(1, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[:, :, 2: 2 + 2 * w]

    def timed(fn, x, iters=30):
        f = jax.jit(lambda v: jnp.sum(fn(v)))
        float(f(x))
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f(x)
        float(r)
        return (time.perf_counter() - t0) / iters * 1e3

    rng = np.random.default_rng(0)
    shapes = [(16, 256, 256, 64), (16, 128, 128, 128),
              (16, 64, 64, 256), (16, 32, 32, 512)]
    print("forward forms (in -> 2x out):")
    for shp in shapes:
        x = jnp.asarray(rng.standard_normal(shp), jnp.bfloat16)
        nbytes = (np.prod(shp) + 4 * np.prod(shp)) * 2
        floor = nbytes / (PEAK_HBM_GBS * 1e9) * 1e3
        r = {name: timed(fn, x) for name, fn in [
            ("depthwise", fwd_depthwise), ("dense", fwd_dense),
            ("stencil", fwd_stencil), ("sep_dense", fwd_sep_dense)]}
        # numerics check vs stencil
        err = float(jnp.max(jnp.abs(
            fwd_sep_dense(x).astype(jnp.float32)
            - fwd_stencil(x).astype(jnp.float32))))
        print(f"  {shp}: floor {floor:5.2f} ms | " + " ".join(
            f"{k}={v:5.2f}" for k, v in r.items()) + f" | dense-stencil maxerr {err:.4f}")

    print("adjoint forms (2x in -> out):")
    for shp in shapes:
        g = jnp.asarray(
            rng.standard_normal((shp[0], shp[1] * 2, shp[2] * 2, shp[3])),
            jnp.bfloat16,
        )
        nbytes = (np.prod(g.shape) + np.prod(shp)) * 2
        floor = nbytes / (PEAK_HBM_GBS * 1e9) * 1e3
        r = {name: timed(fn, g) for name, fn in [
            ("depthwise", bwd_depthwise), ("dense", bwd_dense),
            ("sep_depthwise", bwd_sep_depthwise),
            ("sep_dense", bwd_sep_dense)]}
        err = float(jnp.max(jnp.abs(
            bwd_sep_dense(g).astype(jnp.float32)
            - bwd_depthwise(g).astype(jnp.float32))))
        print(f"  {shp}: floor {floor:5.2f} ms | " + " ".join(
            f"{k}={v:5.2f}" for k, v in r.items()) + f" | dense-depthwise maxerr {err:.4f}")


if __name__ == "__main__":
    main()
