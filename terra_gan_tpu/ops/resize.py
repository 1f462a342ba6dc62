"""Fixed-factor spatial resampling ops, exact to the reference semantics.

The reference decoder upsamples features with
``torch.nn.functional.interpolate(scale_factor=2, mode='bilinear',
align_corners=False)`` and masks with ``mode='nearest'``
(reference: mvp_gan/src/models/generator.py:50-51,66-67).

With half-pixel centers and an integer factor of 2, bilinear
interpolation reduces to a fixed 2-tap stencil per axis:

  out[2i]   = 0.25 * in[clamp(i-1)] + 0.75 * in[i]
  out[2i+1] = 0.75 * in[i]          + 0.25 * in[clamp(i+1)]

which we implement directly with shifts + interleaving instead of a
gather-based generic resize — it fuses into neighbouring elementwise
ops under XLA and avoids the dynamic-slice lowering of
``jax.image.resize``. All ops are NHWC (TPU-native layout).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _upsample2x_linear_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Double the size of `axis` with torch bilinear (align_corners=False) taps."""
    prev_slice = [slice(None)] * x.ndim
    next_slice = [slice(None)] * x.ndim
    first = [slice(None)] * x.ndim
    last = [slice(None)] * x.ndim
    prev_slice[axis] = slice(None, -1)
    next_slice[axis] = slice(1, None)
    first[axis] = slice(None, 1)
    last[axis] = slice(-1, None)

    x_prev = jnp.concatenate([x[tuple(first)], x[tuple(prev_slice)]], axis=axis)
    x_next = jnp.concatenate([x[tuple(next_slice)], x[tuple(last)]], axis=axis)

    even = 0.25 * x_prev + 0.75 * x
    odd = 0.75 * x + 0.25 * x_next

    stacked = jnp.stack([even, odd], axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = x.shape[axis] * 2
    return stacked.reshape(new_shape)


def _upsample2x_bilinear_conv(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear as ONE depthwise input-dilated conv.

    Same taps as the stencil path (transposed conv k4 s2 with
    [1/4,3/4,3/4,1/4] per axis; edge-pad 1 then crop 2 reproduces the
    torch border clamping exactly — verified tap-for-tap). On TPU this
    is ~4x faster than the shift/stack form at 512^2 (one fused op, no
    interleave copies), but the conv runs at the input dtype's default
    precision — bf16-exact only for bf16 inputs, hence only used for
    them (fp32 parity keeps the exact stencil path).
    """
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    taps = jnp.array([0.25, 0.75, 0.75, 0.25], jnp.float32).astype(x.dtype)
    kern = (jnp.outer(taps, taps)[:, :, None, None]
            * jnp.ones((1, 1, 1, c), x.dtype))
    # NOTE: padding (2,2) + crop measures FASTER than the crop-free
    # ((0,0)) form on v5e (29.8 vs 41.6 ms model-level) — XLA picks a
    # better tiling for the padded conv; keep the crop.
    out = lax.conv_general_dilated(
        xp, kern, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out[:, 2 : 2 + 2 * h, 2 : 2 + 2 * w, :]


def _upsample2x_adjoint(g: jnp.ndarray) -> jnp.ndarray:
    """Exact adjoint of the 2x bilinear upsample: [B,2H,2W,C] -> [B,H,W,C].

    Derived from the stencil:
      dx[i] = 0.25*g[2i-1] + 0.75*g[2i] + 0.75*g[2i+1] + 0.25*g[2i+2]
    per axis, where the clamped borders contribute an extra 0.25*g[0]
    at i=0 and 0.25*g[2n-1] at i=n-1 — which is EXACTLY what edge-
    padding g by 1 on each side feeds into those taps. So the adjoint
    is one depthwise k4 stride-2 conv with the same separable
    [1/4,3/4,3/4,1/4] kernel — the mirror of the forward.

    Measured note (r4 train profile): interleave/parity-split forms of
    this adjoint (reshape to (n,2) + slices + concats) do NOT fuse on
    TPU — each step materializes a relayout copy, +12 GB/step HBM at
    batch 16, slower than this single conv.
    """
    b, h2, w2, c = g.shape
    gp = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    taps = jnp.array([0.25, 0.75, 0.75, 0.25], jnp.float32).astype(g.dtype)
    kern = (jnp.outer(taps, taps)[:, :, None, None]
            * jnp.ones((1, 1, 1, c), g.dtype))
    return lax.conv_general_dilated(
        gp, kern, (2, 2), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _pallas_up_on(shape, dtype) -> bool:
    """Use the Pallas stencil kernel (ops/pallas/upsample_kernel.py)?

    Default OFF: on this toolchain's remote Mosaic build the kernel is
    numerically exact but runs ~7x SLOWER than the depthwise-conv form
    at the dec1 shape (BASELINE.md r5 — the same model-level verdict
    as the fused PConv kernels, ops/pallas/pconv_kernel.py). The hook
    and kernel stay shipped so a toolchain where Mosaic pipelines
    these blocks at bandwidth can flip them on:
    TERRA_GAN_TPU_PALLAS_UPSAMPLE=1 (bf16, single-device — a
    pallas_call inside a pjit-sharded program would block XLA's SPMD
    partitioner, so mesh runs keep the conv forms regardless).
    """
    from .pallas.upsample_kernel import (
        pallas_upsample_enabled, supported,
    )

    return (
        dtype == jnp.bfloat16
        and len(shape) == 4
        and supported(shape)
        and jax.device_count() == 1
        and pallas_upsample_enabled(default=False)
    )


def _upsample2x_bilinear_primal(x: jnp.ndarray) -> jnp.ndarray:
    if x.dtype == jnp.bfloat16:
        if _pallas_up_on(x.shape, x.dtype):
            from .pallas.upsample_kernel import upsample2x_fwd_pallas

            return upsample2x_fwd_pallas(x)
        return _upsample2x_bilinear_conv(x)
    x = _upsample2x_linear_axis(x, axis=1)
    x = _upsample2x_linear_axis(x, axis=2)
    return x


@jax.custom_vjp
def upsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC 2x bilinear upsample, exact torch `align_corners=False` weights.

    Forward: one depthwise input-dilated conv for bf16 (fastest measured
    form), the fused shift/stack stencil otherwise. Backward: the exact
    hand-written adjoint (`_upsample2x_adjoint`) — the same linear map
    as torch's `F.interpolate` backward. The custom_vjp exists so the
    backward FORM is ours to choose (XLA's derived transpose of the
    lhs-dilated depthwise conv is the hook's default shape; a Pallas
    kernel can slot in here without touching callers).
    """
    return _upsample2x_bilinear_primal(x)


def _upsample2x_bilinear_fwd(x):
    return _upsample2x_bilinear_primal(x), None


def _upsample2x_bilinear_bwd(_, g):
    n, h2, w2, c = g.shape
    if g.dtype == jnp.bfloat16 and _pallas_up_on(
        (n, h2 // 2, w2 // 2, c), g.dtype
    ) and h2 % 2 == 0 and w2 % 2 == 0:
        from .pallas.upsample_kernel import upsample2x_bwd_pallas

        return (upsample2x_bwd_pallas(g),)
    return (_upsample2x_adjoint(g),)


upsample2x_bilinear.defvjp(
    _upsample2x_bilinear_fwd, _upsample2x_bilinear_bwd
)


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC 2x nearest upsample: out[2i] = out[2i+1] = in[i] (torch 'nearest')."""
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x


def pad_to_match(x: jnp.ndarray, target_h: int, target_w: int) -> jnp.ndarray:
    """Zero-pad (or crop) NHWC tensor spatially to (target_h, target_w).

    Matches the reference's `_pad_to_match` split: left/top gets diff//2,
    right/bottom the remainder (generator.py:78-84). torch F.pad crops
    when the diff is negative (floor division on the negative side), which
    happens for inputs smaller than 128; reproduced exactly. Shapes are
    static under jit, so this is trace-time arithmetic.
    """
    dh = target_h - x.shape[1]
    dw = target_w - x.shape[2]
    if dh == 0 and dw == 0:
        return x
    pads = [(0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)]
    if all(p0 >= 0 and p1 >= 0 for p0, p1 in pads):
        return jnp.pad(x, pads)
    # torch F.pad with negative entries crops from the corresponding edge
    h0 = max(0, -(dh // 2))
    h1 = x.shape[1] - max(0, -(dh - dh // 2))
    w0 = max(0, -(dw // 2))
    w1 = x.shape[2] - max(0, -(dw - dw // 2))
    x = x[:, h0:h1, w0:w1, :]
    pos = [
        (0, 0),
        (max(0, dh // 2), max(0, dh - dh // 2)),
        (max(0, dw // 2), max(0, dw - dw // 2)),
        (0, 0),
    ]
    if any(p != (0, 0) for p in pos):
        x = jnp.pad(x, pos)
    return x
