"""Partial convolution: the numeric core of the PConv U-Net.

Semantics reproduced exactly from the reference layer
(mvp_gan/src/models/pconv.py:25-50), which deviates from Liu et al.
in one important way: the *bias is inside the renormalization* —
the reference uses a single biased conv and scales its full output:

    out      = (conv(x * m) + b) * ratio
    ratio    = K / (sum_win(m) + 1e-8) * (sum_win(m) > 0)
    new_mask = (sum_win(m) > 0)

where K = kh*kw is the window size and sum_win is the all-ones
"mask conv" (a frozen 1->1 conv of ones, pconv.py:11-16).

TPU-native design decisions vs. the reference:
  * NHWC layout (channels on the 128-lane minor dimension).
  * The ones-conv over the 1-channel mask is an axis-separable box
    sum; we lower it as `lax.reduce_window(add)` instead of a dense
    conv — O(K) work instead of O(K^2) and no MXU occupancy.
  * The feature conv stays a single `lax.conv_general_dilated` so XLA
    tiles it onto the MXU; mask multiply and renormalization fuse
    into its prologue/epilogue.
  * An optional fused Pallas kernel lives in ops/pallas/ and is
    selected via `PConvUNet(use_pallas=True)` or the
    TERRA_GAN_TPU_PALLAS=1 environment flag (CLI).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def mask_window_sum(
    mask: jnp.ndarray,
    kh: int,
    kw: int,
    stride: int,
    padding: int,
    compute_dtype=None,
) -> jnp.ndarray:
    """Box-sum of the mask over the conv window (the frozen ones-conv).

    mask: [B, H, W, 1] float. Returns [B, H', W', 1] float32 counts.

    The op is HBM-bandwidth-bound; when compute_dtype is bfloat16 the
    sum runs in bf16, which is EXACT here — 0/1 masks and window sums
    <= 255 are integers representable in bf16's 8-bit mantissa — while
    halving the traffic.
    """
    # f64 masks (jax_enable_x64 parity runs) keep f64 so the 1e-8-eps
    # ratio division rounds like torch .double(); counts are integers,
    # exact in every dtype here
    acc = jnp.promote_types(mask.dtype, jnp.float32)
    dt = compute_dtype or acc
    return lax.reduce_window(
        mask.astype(dt),
        jnp.zeros((), dt),
        lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    ).astype(acc)


def _s2d_conv_1ch(xm, kernel, padding, pet, precision):
    """Space-to-depth form of a 1-channel k x k stride-2 conv.

    Reshape/transpose phase split (strided-slice concat crashes this
    TPU runtime at scale); tap (ky, kx) of the original kernel lands in
    phase channel 2*(ky%2)+(kx%2) at offset (ky//2, kx//2).
    """
    b, h, w, _ = xm.shape
    k = kernel.shape[0]
    xp = jnp.pad(
        xm[..., 0], ((0, 0), (padding, padding), (padding, padding))
    )
    h2, w2 = (h + 2 * padding) // 2, (w + 2 * padding) // 2
    ph = (
        xp.reshape(b, h2, 2, w2, 2)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, h2, w2, 4)
    )
    k2 = (k + 1) // 2
    cout = kernel.shape[3]
    w4 = jnp.zeros((k2, k2, 4, cout), kernel.dtype)
    for ky in range(k):
        for kx in range(k):
            w4 = w4.at[ky // 2, kx // 2, 2 * (ky % 2) + (kx % 2), :].add(
                kernel[ky, kx, 0, :]
            )
    return lax.conv_general_dilated(
        ph, w4, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=_DN,
        preferred_element_type=pet,
        precision=precision,
    )


def partial_conv2d(
    x: jnp.ndarray,
    mask: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    stride: int,
    padding: int,
    compute_dtype: jnp.dtype | None = None,
    precision=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Partial convolution forward.

    Args:
      x: [B, H, W, C] features.
      mask: [B, H, W, 1] binary validity mask (1 = valid, 0 = hole).
      kernel: [kh, kw, C, O] conv weights.
      bias: [O] conv bias (included in renormalization, see module doc).
      stride, padding: symmetric conv geometry (torch Conv2d semantics).
      compute_dtype: optional dtype for the conv inputs (e.g. bfloat16);
        accumulation is always float32 via preferred_element_type.
      precision: lax.Precision for the conv. For fp32 inputs, pass
        HIGHEST for exact parity with the torch reference — XLA's
        default fp32 conv path uses a lower-precision decomposition
        (~1e-3 relative error, measured on CPU and TPU).

    Returns:
      (out [B, H', W', O] float32, new_mask [B, H', W', 1] float32)
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    window = float(kh * kw)

    xm = x * mask
    if compute_dtype is not None:
        xm = xm.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)

    # Mixed precision: let the conv emit compute_dtype and upcast in a
    # separate op. Forcing preferred_element_type=f32 on bf16 operands
    # makes the conv VJP receive f32 cotangents against bf16 kernels,
    # which lax.conv rejects (bf16 training would break); the MXU still
    # accumulates in f32 internally either way.
    acc_dtype = jnp.promote_types(x.dtype, jnp.float32)
    pet = acc_dtype if compute_dtype is None else None
    if (
        compute_dtype is not None
        and stride == 2
        and x.shape[-1] == 1
        and kh == kw
        and kh % 2 == 1
        and x.shape[1] % 2 == 0
        and x.shape[2] % 2 == 0
        and padding == kh // 2
    ):
        # enc1 fast path: the 1-channel stride-2 conv starves the MXU
        # (GEMM K = k^2); space-to-depth reassociates it as a stride-1
        # conv over 4 phase channels (K = 4*ceil(k/2)^2). Exact same
        # sums (measured reldiff 0 at enc1 shapes), ~20% faster.
        out = _s2d_conv_1ch(xm, kernel, padding, pet, precision)
    else:
        out = lax.conv_general_dilated(
            xm,
            kernel,
            window_strides=(stride, stride),
            padding=((padding, padding), (padding, padding)),
            dimension_numbers=_DN,
            preferred_element_type=pet,
            precision=precision,
        )
    out = out.astype(acc_dtype)

    mask_sum = mask_window_sum(
        mask, kh, kw, stride, padding, compute_dtype=compute_dtype
    )
    # Renormalization ratio; the hard (sum>0) gate zeroes hole-only windows.
    valid = mask_sum > 0.0
    ratio = jnp.where(valid, window / (mask_sum + 1e-8), 0.0)
    # The ratio is data-only (mask carries no gradient); keep XLA from
    # differentiating through the division chain.
    ratio = lax.stop_gradient(ratio)

    out = (out + bias.astype(out.dtype)) * ratio
    new_mask = valid.astype(mask.dtype)
    return out, new_mask


def partial_conv2d_split(
    parts,
    mask: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    stride: int,
    padding: int,
    compute_dtype: jnp.dtype | None = None,
    precision=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Partial conv over an implicit channel concatenation.

    conv(concat(a, b) * m, W) == conv(a*m, W[:, :, :ca]) +
    conv(b*m, W[:, :, ca:]) — mathematically identical to
    `partial_conv2d(jnp.concatenate(parts, -1), ...)` but never
    materializes the concatenated tensor. At 512^2 the concat copy is
    ~15% of decoder time, and splitting also keeps each conv's input
    channel count aligned (the U-Net's 64+1 concat at dec1 otherwise
    runs a misaligned 65-channel conv ~27% slower).
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    window = float(kh * kw)

    acc_dtype = jnp.promote_types(parts[0].dtype, jnp.float32)
    out = None
    offset = 0
    for part in parts:
        ch = part.shape[-1]
        sub_kernel = kernel[:, :, offset : offset + ch, :]
        offset += ch
        xm = part * mask
        if compute_dtype is not None:
            xm = xm.astype(compute_dtype)
            sub_kernel = sub_kernel.astype(compute_dtype)
        contrib = lax.conv_general_dilated(
            xm,
            sub_kernel,
            window_strides=(stride, stride),
            padding=((padding, padding), (padding, padding)),
            dimension_numbers=_DN,
            preferred_element_type=(
                acc_dtype if compute_dtype is None else None
            ),
            precision=precision,
        ).astype(acc_dtype)
        out = contrib if out is None else out + contrib
    assert offset == kernel.shape[2], "parts do not cover kernel channels"

    mask_sum = mask_window_sum(
        mask, kh, kw, stride, padding, compute_dtype=compute_dtype
    )
    valid = mask_sum > 0.0
    ratio = jnp.where(valid, window / (mask_sum + 1e-8), 0.0)
    ratio = lax.stop_gradient(ratio)
    out = (out + bias.astype(out.dtype)) * ratio
    return out, valid.astype(mask.dtype)
