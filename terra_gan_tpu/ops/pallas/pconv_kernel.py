"""Fused partial-convolution inference kernel (Pallas/TPU).

One kernel computes a full PConv2d stage in eval mode — conv + bias +
mask renormalization + new-mask computation + eval-BatchNorm affine +
ReLU — with every intermediate in VMEM/registers (the lax path
round-trips each of those through HBM between XLA fusions):

    out      = BN_eval( (conv(x*m) + b) * ratio ) ; ReLU
    ratio    = k^2 / (boxsum(m) + 1e-8) * (boxsum(m) > 0)
    new_mask = boxsum(m) > 0

Design notes (shaped by what this TPU toolchain accepts):
  * grid (batch, cout-tiles); the whole padded feature map is one VMEM
    block per batch element — this covers every U-Net stage whose
    padded map fits the VMEM budget (all but the 2 shallowest
    encoder/decoder stages at 512^2/256^2, which stay on the lax path
    where XLA's conv is already strong). Manual `pl.ds` DMA from HBM
    crashes this remote Mosaic build, so everything uses standard
    pipelined BlockSpecs.
  * stride 1: taps are contiguous [oh, ow] windows of the block.
  * stride 2: Mosaic only supports stride-1 vector slices, so the
    host pre-splits x/mask into 2x2 phases ([4, B, H/2, W/2, C]); tap
    (ky, kx) is then a contiguous window of phase (ky%2, kx%2).
  * the conv is k*k MXU matmuls (window [oh*ow, cin] @ tap [cin, TN])
    accumulated in fp32; the mask box-sum reuses the same windows on
    the VPU; renorm/BN/ReLU fuse into the epilogue.

Training mode keeps the lax path (BatchNorm needs global batch stats).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the input feature-map block (bytes). ~16MB VMEM/core
# must hold x (x2 for pipeline double-buffering), mask, weight tile,
# and output tile; 3MB blocks measured as the safe ceiling on v5e.
_BLOCK_BUDGET = 3 * 1024 * 1024
# Mosaic (this remote-compile build) crashes with an opaque 500 for
# output rows wider than 64 lanes-of-sublanes in this kernel shape —
# measured: oh128 x ow32 compiles, oh32 x ow128 crashes, with or
# without flatten reshapes (dot_general batched over oh included).
# Keep per-program output width within the proven envelope.
_MAX_OW = 64
_MAX_M = 4096


def pallas_enabled(default: bool = False) -> bool:
    v = os.environ.get("TERRA_GAN_TPU_PALLAS")
    if v is None:
        return default
    return v.lower() in ("1", "true", "yes")


# Per-stage A/B at real eval shapes (scripts/stage_bench.py, v5e r2):
# ISOLATED, the fused kernel beats lax only on enc5/enc6 and only at
# batch <= 16 (enc5 1.10 vs 1.39 ms, enc6 1.00 vs 1.06; every covered
# stage loses at batch 32). IN-MODEL even those wins evaporate — the
# kernel call breaks XLA's fusion of the stage with its neighbours and
# the model-level A/B is a wash (27.07 vs 27.19 ms at batch 16, r2).
# The allowlist therefore defaults OFF and is opt-in via
# TERRA_GAN_TPU_PALLAS=auto; the measured-win stages are kept here as
# the set that mode enables.
MEASURED_STAGE_WINS = frozenset({"enc5", "enc6"})
# kept as the (empty) default so callers can express "framework
# default" as None -> pallas_stage_allowlist()
DEFAULT_STAGE_ALLOWLIST = frozenset()
PALLAS_AUTO_MAX_BATCH = 16


def pallas_stage_allowlist() -> frozenset:
    """Stage names that take the kernel in the default model.

    TERRA_GAN_TPU_PALLAS=auto enables the measured-win stages
    (enc5/enc6, batch<=16); =1 force-enables the kernel on every
    in-envelope stage (PConvUNet use_pallas — CLI wiring), =0/unset
    leaves the lax path everywhere (the measured model-level best)."""
    v = (os.environ.get("TERRA_GAN_TPU_PALLAS") or "").lower()
    if v == "auto":
        return MEASURED_STAGE_WINS
    return DEFAULT_STAGE_ALLOWLIST


def _pick_tile(total: int, limit: int) -> int:
    t = min(total, limit)
    while total % t:
        t -= 1
    return t


def _kernel_s1(
    x_ref, m_ref, w_ref, b_ref, bna_ref, bnb_ref, out_ref, mout_ref,
    *, k, oh, ow, cin, tn, window, relu,
):
    # mask is 3D [1, ih, iw] (width on lanes) — a trailing singleton
    # channel would be padded to 128 lanes and blow VMEM. The conv is a
    # dot_general batched over oh ((ow,cin)@(cin,tn) per row): flatten
    # reshapes relayout and crash Mosaic for ow > 64.
    acc = jnp.zeros((oh, ow, tn), jnp.float32)
    msum = jnp.zeros((oh, ow), jnp.float32)
    for ky in range(k):
        for kx in range(k):
            xs = x_ref[0, ky : ky + oh, kx : kx + ow, :]
            ms = m_ref[0, ky : ky + oh, kx : kx + ow]
            acc = acc + jax.lax.dot_general(
                xs * ms[..., None],
                w_ref[ky, kx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            msum = msum + ms
    _epilogue(acc, msum, b_ref, bna_ref, bnb_ref, out_ref, mout_ref,
              oh, ow, tn, window, relu)


def _kernel_s2(
    x_ref, m_ref, w_ref, b_ref, bna_ref, bnb_ref, out_ref, mout_ref,
    *, k, oh, ow, cin, tn, window, relu,
):
    acc = jnp.zeros((oh, ow, tn), jnp.float32)
    msum = jnp.zeros((oh, ow), jnp.float32)
    for ky in range(k):
        for kx in range(k):
            ph = 2 * (ky % 2) + (kx % 2)
            oy, ox = ky // 2, kx // 2
            xs = x_ref[ph, 0, oy : oy + oh, ox : ox + ow, :]
            ms = m_ref[ph, 0, oy : oy + oh, ox : ox + ow]
            acc = acc + jax.lax.dot_general(
                xs * ms[..., None],
                w_ref[ky, kx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            msum = msum + ms
    _epilogue(acc, msum, b_ref, bna_ref, bnb_ref, out_ref, mout_ref,
              oh, ow, tn, window, relu)


def _epilogue(acc, msum, b_ref, bna_ref, bnb_ref, out_ref, mout_ref,
              oh, ow, tn, window, relu):
    # broadcast in (oh, ow, tn) space: a lanes->sublanes reshape of the
    # ratio is an unsupported relayout on Mosaic
    valid = msum > 0.0
    ratio = jnp.where(valid, window / (msum + 1e-8), 0.0)  # (oh, ow)
    out = (acc + b_ref[0]) * ratio[..., None]
    out = out * bna_ref[0] + bnb_ref[0]
    if relu:
        out = jnp.maximum(out, 0.0)
    out_ref[0] = out
    mout_ref[0] = valid.astype(jnp.float32)


def _phase_split(a: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, ...] (H, W even) -> [4, B, H/2, W/2, ...] 2x2 phases.

    Implemented with reshape/transpose, NOT strided-slice concat: the
    strided form reproducibly crashes this TPU runtime at large sizes
    (worker 'kernel fault' at batch 32 x 512^2 — measured)."""
    b, h, w = a.shape[:3]
    rest = a.shape[3:]
    r = a.reshape((b, h // 2, 2, w // 2, 2) + rest)
    # -> [2, 2, B, H/2, W/2, ...] then merge the two phase axes
    perm = (2, 4, 0, 1, 3) + tuple(range(5, r.ndim))
    r = r.transpose(perm)
    return r.reshape((4, b, h // 2, w // 2) + rest)


def _strided_strips_s1(
    x, mask, kernel, bias, padding,
    bn_scale, bn_bias, bn_mean, bn_var, eps, relu, interpret,
):
    """Stride-1 stages too large for one VMEM block: split H into
    overlapping halo strips on the host (one XLA gather), run the
    full-image kernel with strips as extra batch elements, reshape
    back. Extra HBM traffic ~ (TH+k-1)/TH of the input — the fused
    epilogue saves more."""
    b, h, w, cin = x.shape
    k = kernel.shape[0]
    iw = w + 2 * padding
    # strip height: output rows per strip, under the byte budget
    # (incl. halo) AND the Mosaic per-program GEMM row envelope
    rows_budget = max(k, _BLOCK_BUDGET // max(1, iw * cin * 4))
    limit = min(rows_budget - (k - 1), _MAX_M // w)
    th = _pick_tile(h, max(1, limit))
    if th < 8:
        raise ValueError("stride-1 strips degenerate (th < 8)")
    s = h // th

    x_pad = jnp.pad(
        x.astype(jnp.float32),
        ((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )
    m_pad = jnp.pad(
        mask[..., 0].astype(jnp.float32),
        ((0, 0), (padding, padding), (padding, padding)),
    )
    ihs = th + k - 1
    x_strips = jnp.stack(
        [x_pad[:, i * th : i * th + ihs] for i in range(s)], axis=1
    ).reshape(b * s, ihs, iw, cin)
    m_strips = jnp.stack(
        [m_pad[:, i * th : i * th + ihs] for i in range(s)], axis=1
    ).reshape(b * s, ihs, iw)

    out, new_mask = _call_kernel_s1(
        x_strips, m_strips, kernel, bias, k, th, w, cin,
        bn_scale, bn_bias, bn_mean, bn_var, eps, relu, interpret,
    )
    cout = kernel.shape[3]
    out = out.reshape(b, s * th, w, cout)
    new_mask = new_mask.reshape(b, s * th, w)
    return out, new_mask[..., None]


def _bn_affine(cout, bn_scale, bn_bias, bn_mean, bn_var, eps):
    if bn_scale is not None:
        a = bn_scale / jnp.sqrt(bn_var + eps)
        bb = bn_bias - bn_mean * a
    else:
        a = jnp.ones((cout,), jnp.float32)
        bb = jnp.zeros((cout,), jnp.float32)
    return a, bb


def _call_kernel_s1(
    x_in, m_in, kernel, bias, k, oh, ow, cin,
    bn_scale, bn_bias, bn_mean, bn_var, eps, relu, interpret,
):
    """pallas_call for pre-padded stride-1 inputs [N, oh+k-1, ow+k-1, C]."""
    n = x_in.shape[0]
    ih, iw = x_in.shape[1], x_in.shape[2]
    cout = kernel.shape[3]
    a, bb = _bn_affine(cout, bn_scale, bn_bias, bn_mean, bn_var, eps)
    tn = _pick_tile(cout, 128)
    kern = functools.partial(
        _kernel_s1, k=k, oh=oh, ow=ow, cin=cin, tn=tn,
        window=float(k * k), relu=relu,
    )
    return pl.pallas_call(
        kern,
        grid=(n, cout // tn),
        in_specs=[
            pl.BlockSpec(
                (1, ih, iw, cin), lambda bi, ci: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, ih, iw), lambda bi, ci: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k, k, cin, tn), lambda bi, ci: (0, 0, 0, ci),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tn), lambda bi, ci: (0, ci), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tn), lambda bi, ci: (0, ci), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tn), lambda bi, ci: (0, ci), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, oh, ow, tn), lambda bi, ci: (bi, 0, 0, ci),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, oh, ow), lambda bi, ci: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, oh, ow, cout), jnp.float32),
            jax.ShapeDtypeStruct((n, oh, ow), jnp.float32),
        ],
        interpret=interpret,
    )(
        x_in,
        m_in,
        kernel.astype(jnp.float32),
        bias.astype(jnp.float32).reshape(1, cout),
        a.astype(jnp.float32).reshape(1, cout),
        bb.astype(jnp.float32).reshape(1, cout),
    )


def fused_pconv_eval(
    x: jnp.ndarray,
    mask: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    stride: int,
    padding: int,
    bn_scale: Optional[jnp.ndarray] = None,
    bn_bias: Optional[jnp.ndarray] = None,
    bn_mean: Optional[jnp.ndarray] = None,
    bn_var: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
    relu: bool = True,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused eval-mode PConv stage. x: [B,H,W,C], mask: [B,H,W,1].

    Returns (out [B,OH,OW,O], new_mask [B,OH,OW,1]). Raises ValueError
    when the stage doesn't fit this kernel's envelope (caller falls
    back to the lax path).
    """
    b, h, w, cin = x.shape
    kh, kw, wc, cout = kernel.shape
    assert kh == kw and wc == cin
    k = kh
    if stride not in (1, 2):
        raise ValueError(f"unsupported stride {stride}")
    if cin < 8:
        # sub-sublane channel counts degrade to outer products; the lax
        # conv path is better for the 1-channel first stage
        raise ValueError(f"cin={cin} below pallas kernel threshold")
    oh = (h + 2 * padding - k) // stride + 1
    ow = (w + 2 * padding - k) // stride + 1

    ih, iw = h + 2 * padding, w + 2 * padding
    if stride == 2:
        ih += ih % 2
        iw += iw % 2
    if ow > _MAX_OW and not interpret:
        raise ValueError(f"ow={ow} outside pallas toolchain envelope")
    # (an earlier batch<=16 guard was misattributed: the batch-32
    # runtime fault was the strided-slice _phase_split, since replaced
    # by the reshape form — batch 32 validated stable post-fix)
    block_bytes = ih * iw * cin * 4
    if block_bytes > _BLOCK_BUDGET or oh * ow > _MAX_M:
        if stride == 1:
            # tall stride-1 stages: host-side halo strips, same kernel
            return _strided_strips_s1(
                x, mask, kernel, bias, padding,
                bn_scale, bn_bias, bn_mean, bn_var, eps, relu, interpret,
            )
        raise ValueError(
            f"stage outside pallas envelope "
            f"({block_bytes} bytes, M={oh * ow})"
        )

    if bn_scale is not None:
        a = bn_scale / jnp.sqrt(bn_var + eps)
        bb = bn_bias - bn_mean * a
    else:
        a = jnp.ones((cout,), jnp.float32)
        bb = jnp.zeros((cout,), jnp.float32)

    pad_h = (padding, ih - h - padding)
    pad_w = (padding, iw - w - padding)
    x_pad = jnp.pad(x.astype(jnp.float32), ((0, 0), pad_h, pad_w, (0, 0)))
    # mask rides as 3D so its lane dim is W, not a padded singleton C
    m_pad = jnp.pad(mask[..., 0].astype(jnp.float32), ((0, 0), pad_h, pad_w))

    tn = _pick_tile(cout, 128)
    grid = (b, cout // tn)
    common = dict(k=k, oh=oh, ow=ow, cin=cin, tn=tn,
                  window=float(k * k), relu=relu)

    w_spec = pl.BlockSpec(
        (k, k, cin, tn), lambda bi, ci: (0, 0, 0, ci),
        memory_space=pltpu.VMEM,
    )
    vec_spec = pl.BlockSpec(
        (1, tn), lambda bi, ci: (0, ci), memory_space=pltpu.VMEM
    )
    out_specs = [
        pl.BlockSpec(
            (1, oh, ow, tn), lambda bi, ci: (bi, 0, 0, ci),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, oh, ow), lambda bi, ci: (bi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, oh, ow, cout), jnp.float32),
        jax.ShapeDtypeStruct((b, oh, ow), jnp.float32),
    ]

    if stride == 1:
        kern = functools.partial(_kernel_s1, **common)
        in_specs = [
            pl.BlockSpec(
                (1, ih, iw, cin), lambda bi, ci: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, ih, iw), lambda bi, ci: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        x_in, m_in = x_pad, m_pad
    else:
        kern = functools.partial(_kernel_s2, **common)
        x_in, m_in = _phase_split(x_pad), _phase_split(m_pad)
        ih2, iw2 = ih // 2, iw // 2
        in_specs = [
            pl.BlockSpec(
                (4, 1, ih2, iw2, cin), lambda bi, ci: (0, bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (4, 1, ih2, iw2), lambda bi, ci: (0, bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]

    out, new_mask3 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs + [w_spec, vec_spec, vec_spec, vec_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(
        x_in,
        m_in,
        kernel.astype(jnp.float32),
        bias.astype(jnp.float32).reshape(1, cout),
        a.astype(jnp.float32).reshape(1, cout),
        bb.astype(jnp.float32).reshape(1, cout),
    )
    return out, new_mask3[..., None]
