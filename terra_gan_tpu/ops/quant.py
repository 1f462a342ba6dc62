"""Post-training w8a8 quantization for the PConv U-Net eval path.

Motivation (BASELINE.md "int8 MXU study", scripts/exp_int8.py): on
v5e, XLA lowers int8 x int8 -> int32 convs onto the int8 MXU path
(~2x the bf16 peak), and int8 activations halve the HBM bytes of the
bandwidth-bound shallow stages — measured 1.46x on dec1-like shapes,
1.23x on deep 3x3 stages. This module supplies the quantized partial
convolution used by `PConvUNet(quant="w8a8")`.

Scheme (standard symmetric PTQ):
  * weights: per-output-channel int8, scales derived inline from the
    fp32 params at trace time (no checkpoint surgery — any existing
    checkpoint quantizes on the fly; XLA folds the requant of the
    small weight tensors into negligible work per batch).
  * activations: per-tensor int8 on the masked input `x * m`. Scales
    are either STATIC (calibrated floats baked into the trace — the
    fast path: the quantize fuses into one elementwise pass) or
    DYNAMIC (amax computed on device per call — calibration-free, one
    extra read of the activation tensor).
  * accumulation: int32 via preferred_element_type; dequantization,
    bias, mask renormalization, BatchNorm and ReLU all stay in
    fp32/bf16 exactly as the unquantized path
    (reference semantics: mvp_gan/src/models/pconv.py:25-50).

The mask path is untouched: window counts, renorm ratios and mask
updates are bit-identical to the unquantized model, so quantization
perturbs only the feature values, never the validity geometry.

Training never quantizes (round() has no useful gradient and the
reference trains fp32); `PConv2d` routes through this module only
when `train=False`.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from jax import lax

from .pconv import _s2d_conv_1ch, mask_window_sum

_DN = ("NHWC", "HWIO", "NHWC")
_EPS = 1e-12


def _unmasked_quant() -> bool:
    """A/B toggle for the quantize-then-mask input structure (see the
    static-scale branch in partial_conv2d_q8). Default ON: measured
    1212 -> 1233 tiles/s at the 512^2 batch-128 headline shape with
    bit-identical outputs (scripts/exp_quant_fusion.py). Read per trace
    so the experiment script can flip it between compiles."""
    import os

    return os.environ.get("TERRA_GAN_TPU_QUANT_UNMASKED", "1") == "1"


def quantize_weight(kernel: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 quantization of [kh,kw,I,O]."""
    amax = jnp.max(jnp.abs(kernel.astype(jnp.float32)), axis=(0, 1, 2))
    scale = jnp.maximum(amax, _EPS) / 127.0
    w_q = jnp.clip(jnp.round(kernel.astype(jnp.float32) / scale), -127, 127)
    return w_q.astype(jnp.int8), scale


def quantize_act(
    x: jnp.ndarray, scale: Optional[float] = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-tensor int8 quantization.

    scale=None -> dynamic (device amax, one extra pass over x);
    scale=float -> static calibrated scale, baked into the trace.
    """
    if scale is None:
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        scale = jnp.maximum(amax, _EPS) / 127.0
    else:
        scale = jnp.asarray(scale, jnp.float32)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return x_q.astype(jnp.int8), scale


def quantize_out(out: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Producer-side int8 quantization of a stage output (the resident
    mode's epilogue step — fuses into the BN/ReLU chain)."""
    s = jnp.asarray(scale, jnp.float32)
    q = jnp.clip(jnp.round(out.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8)


def fake_quant_act(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Straight-through-estimator fake quantization of an activation.

    Forward value is exactly `dequant(quant(x))` at the static scale —
    the same numbers the deployed int8 path produces — while the
    backward pass treats the round/clip as identity (STE), so training
    adapts the upstream weights to the quantization noise. Used by the
    QAT tail fine-tune (PConvUNet.qat_tail_scales) targeting the
    final-conv int8 win BASELINE.md r3 measured (+4.4% throughput) but
    rejected on PTQ quality (-0.136 dB); the measured fine-tune
    recovers part, not all, of that penalty (BASELINE.md r5).
    """
    dt = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(dt)
    s = jnp.asarray(scale, dt)
    q = jnp.clip(jnp.round(xf / s), -127, 127) * s
    return (xf + lax.stop_gradient(q - xf)).astype(x.dtype)


def fake_quant_weight(kernel: jnp.ndarray) -> jnp.ndarray:
    """STE fake quantization of a conv kernel, per-output-channel
    symmetric — mirrors quantize_weight's inference-time scheme (the
    scale is derived from the live weights, exactly as the deployed
    path derives it from the checkpoint)."""
    dt = jnp.promote_types(kernel.dtype, jnp.float32)
    kf = kernel.astype(dt)
    amax = lax.stop_gradient(jnp.max(jnp.abs(kf), axis=(0, 1, 2)))
    s = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.clip(jnp.round(kf / s), -127, 127) * s
    return (kf + lax.stop_gradient(q - kf)).astype(kernel.dtype)


def int_upsample2x_s8(
    xq: jnp.ndarray, in_scale: float, out_scale: float
) -> jnp.ndarray:
    """2x bilinear upsample of an int8-resident tensor, int8 -> int8.

    torch align_corners=False taps are [1,3,3,1]/4 per axis, so the 2D
    transposed-conv kernel is outer([1,3,3,1])/16 with integer values
    <= 9 — exactly representable in int8. The depthwise input-dilated
    conv accumulates in int32 (exact), and the epilogue requantizes
    y * in_scale/16 to the consumer's scale. Geometry (edge-pad 1,
    conv-pad 2, crop 2) mirrors ops/resize._upsample2x_bilinear_conv
    tap-for-tap. Measured vs the fused bf16 upsample+quantize at the
    dec1 shape (128x256x256x64 -> 512^2): 17.8 vs 22.0 ms, while also
    halving the producer's output write (scripts/exp_up_quant.py).
    """
    b, h, w, c = xq.shape
    xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    taps = jnp.array([1, 3, 3, 1], jnp.int8)
    kern = (jnp.outer(taps, taps)[:, :, None, None]
            * jnp.ones((1, 1, 1, c), jnp.int8))
    y = lax.conv_general_dilated(
        xp, kern, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=_DN,
        feature_group_count=c,
        preferred_element_type=jnp.int32,
    )[:, 2: 2 + 2 * h, 2: 2 + 2 * w, :]
    ratio = jnp.asarray(float(in_scale) / (16.0 * float(out_scale)), jnp.float32)
    q = jnp.clip(jnp.round(y.astype(jnp.float32) * ratio), -127, 127)
    return q.astype(jnp.int8)


def _conv_q8(x_q, w_q, stride, padding):
    return lax.conv_general_dilated(
        x_q, w_q,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )


def partial_conv2d_q8(
    parts: Sequence[jnp.ndarray],
    mask: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    stride: int,
    padding: int,
    act_scales: Optional[Tuple[float, ...]] = None,
    compute_dtype=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """w8a8 partial convolution (single input or implicit channel concat).

    Matches `partial_conv2d`/`partial_conv2d_split` semantics with the
    feature conv in int8: each part is quantized with its own
    activation scale (parts have very different ranges — upsampled
    decoder features vs encoder skips), convolved against the
    per-output-channel-quantized kernel slice, and dequantized before
    the contributions sum in fp32. Bias, renorm and mask update are the
    exact unquantized code path.

    Resident mode: a part may arrive ALREADY int8 (the producer stage
    quantized it in its epilogue; its scale must be supplied in
    act_scales[i]) — then only the int8 mask multiply runs here.
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    window = float(kh * kw)
    float_parts = [p for p in parts if p.dtype != jnp.int8]
    acc_dtype = jnp.promote_types(
        float_parts[0].dtype if float_parts else jnp.float32, jnp.float32
    )

    out = None
    offset = 0
    for i, part in enumerate(parts):
        ch = part.shape[-1]
        sub_kernel = kernel[:, :, offset: offset + ch, :]
        offset += ch
        w_q, s_w = quantize_weight(sub_kernel)
        s_a = act_scales[i] if act_scales is not None else None
        if part.dtype == jnp.int8:
            # resident part: quantized by its producer at scale s_a
            if s_a is None:
                raise ValueError(
                    "int8-resident parts require a static act scale"
                )
            x_q = part * mask.astype(jnp.int8)
            s_x = jnp.asarray(s_a, jnp.float32)
        elif s_a is not None and _unmasked_quant():
            # quantize-then-mask: round(x/s)*m == round(x*m/s) exactly
            # for m in {0,1}, but quantize(x) is a pure elementwise
            # function of the producer's output, so XLA can fuse it
            # into the producing stage's epilogue (BN/ReLU or the
            # upsample conv) instead of paying a separate bf16 read of
            # the full activation; the masked pass then runs in int8.
            x_q, s_x = quantize_act(part, s_a)
            x_q = x_q * mask.astype(jnp.int8)
        else:
            x_q, s_x = quantize_act(part * mask, s_a)
        if (
            len(parts) == 1
            and stride == 2
            and ch == 1
            and kh == kw
            and kh % 2 == 1
            and part.shape[1] % 2 == 0
            and part.shape[2] % 2 == 0
            and padding == kh // 2
        ):
            # enc1 fast path: same space-to-depth reassociation as the
            # bf16 path (1-channel stride-2 convs starve the MXU in any
            # dtype); int8 sums are exact under the phase regrouping
            y32 = _s2d_conv_1ch(x_q, w_q, padding, jnp.int32, None)
        else:
            y32 = _conv_q8(x_q, w_q, stride, padding)
        contrib = y32.astype(acc_dtype) * (s_x * s_w).astype(acc_dtype)
        out = contrib if out is None else out + contrib
    assert offset == kernel.shape[2], "parts do not cover kernel channels"

    mask_sum = mask_window_sum(
        mask, kh, kw, stride, padding, compute_dtype=compute_dtype
    )
    valid = mask_sum > 0.0
    ratio = jnp.where(valid, window / (mask_sum + 1e-8), 0.0)
    out = (out + bias.astype(out.dtype)) * ratio
    return out, valid.astype(mask.dtype)


QUANT_MODES = ("w8a8", "w8a8_resident", "w8a8_resident_full")


def quantized_clone(generator, quant: str, scales):
    """Clone a generator into the requested quantized eval form.

    'w8a8'          — per-stage int8 feature convs, bf16 activations.
    'w8a8_resident' — same convs plus int8-resident inter-stage
                      activations and integer-tap decoder upsampling
                      (PConvUNet.quant_resident; needs the ':out'
                      scales calibrate_quant_scales supplies).
    'w8a8_resident_full' — resident mode extended through the tail:
                      dec1's output is written int8 and the final
                      64->1 conv runs on the int8 MXU (+4.4% measured,
                      BASELINE.md r3). PTQ costs ~0.1-0.4 dB hole PSNR
                      here; checkpoints fine-tuned with the QAT tail
                      (PConvUNet.qat_tail_scales / training.qat_tail
                      in the loop) recover a measured 0.07 of 0.42 dB
                      — a throughput/quality trade, not lossless
                      (BASELINE.md r5, scripts/exp_qat_tail.py).
    """
    if quant == "w8a8_resident_full":
        return generator.clone(
            quant="w8a8", quant_scales=scales, quant_resident=True,
            quant_tail=True,
        )
    if quant == "w8a8_resident":
        return generator.clone(
            quant="w8a8", quant_scales=scales, quant_resident=True
        )
    if quant == "w8a8":
        return generator.clone(quant="w8a8", quant_scales=scales)
    raise ValueError(f"unknown quant mode {quant!r} (expected {QUANT_MODES})")


def calibrate_quant_scales(generator, variables, batches) -> dict:
    """Derive static per-stage activation scales from calibration data.

    Runs eval-mode forwards with amax capture (flax `sow` into the
    `quant_stats` collection) over `batches` (an iterable of
    (image, mask) NHWC arrays) and returns a dict of Python floats:
    ``{stage: (scale_part0, ...)}`` input scales per stage, plus
    ``{f"{stage}:out": scale}`` output scales (used by the int8-
    resident mode's producer-side quantization). Suitable for
    ``PConvUNet(quant="w8a8", quant_scales=...)``. Scales are
    amax/127 over ALL calibration batches (running max).
    """
    import jax

    # pallas stages return before the calibration sows run; calibration
    # always uses the plain lax path (numerically the same model)
    calib = generator.clone(
        quant=None, quant_calib=True, use_pallas=False,
        pallas_stages=frozenset(),
    )

    @jax.jit
    def _run(image, mask):
        _, stats = calib.apply(
            variables, image, mask, False, mutable=["quant_stats"]
        )
        return stats["quant_stats"]

    merged: dict = {}
    for image, mask in batches:
        stats = jax.device_get(_run(image, mask))
        for stage, vals in stats.items():
            dst = merged.setdefault(stage, {})
            for name, v in vals.items():
                dst[name] = max(dst.get(name, 0.0), float(v))
    scales: dict = {}
    for stage, vals in merged.items():
        n_parts = sum(1 for k in vals if k.startswith("amax"))
        scales[stage] = tuple(
            max(vals[f"amax{i}"], _EPS) / 127.0 for i in range(n_parts)
        )
        if "out_amax" in vals:
            scales[f"{stage}:out"] = max(vals["out_amax"], _EPS) / 127.0
    return scales
