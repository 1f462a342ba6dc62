"""Fused decoder-tail kernel (Pallas/TPU): the last three ops of the
PConv U-Net in one VMEM pass.

The round-2 device profile (BASELINE.md) attributes 24.3 ms of the
52.5 ms batch-32 eval forward to the decoder tail:

    2x bilinear upsample (256^2 -> 512^2)          6.2 ms
    dec1 partial conv + renorm + BN + ReLU        11.6 ms
    final 64->1 conv + sigmoid + composite         6.5 ms

run as separate XLA ops, each round-tripping a 512^2 x 64ch tensor
through HBM (~5 GB of traffic per batch). This kernel computes the
whole tail reading the 256^2 decoder features once plus cheap scalar
planes, and writing only the 512^2 1-channel composite.

Reference semantics reproduced exactly (mvp_gan/src/models/generator.py:50-62,
pconv.py:25-50):
    up   = bilinear2x(d)                 # torch align_corners=False taps
    m512 = max(nearest2x(dm), xm)
    dec1 = ReLU(BN_eval((conv([up, x] * m512, k_cat) + b) * ratio))
           ratio = 9/(boxsum3(m512)+1e-8) * (boxsum3 > 0)
    out  = sigmoid(conv(dec1, k_fin) + b_fin)
    y    = out * (1 - xm) + x * xm

Mosaic layout rules this kernel is built around (measured on this
toolchain — see scripts/probe_mosaic.py and the r1/r2 findings in
BASELINE.md):
  * 3D [rows, W, C] values put C on lanes; slicing W costs only a
    sublane offset, which every elementwise op and dot accepts. All
    feature-tensor tap shifts therefore happen on 3D values.
  * 2D [rows, W] values put W on lanes; a lane-offset slice poisons
    any later reshape/broadcast ("Unsupported reshape" with a vpad
    offset). All scalar fields (masks, skip input, validity) are
    therefore PRE-SHIFTED per conv tap on the host, so the kernel
    only ever slices them at lane-aligned (multiple-of-128) columns.
  * Lane interleaves are unsupported: output columns stay W-phase
    separated (even/odd) end-to-end; the host reassembles with one
    cheap reshape. Stride-2 structure becomes per-phase tap tables.
  * The grid is (batch x H-strips); the host pre-builds overlapping
    halo strips (one XLA gather each) because strided/halo BlockSpecs
    and `pl.ds` HBM slicing crash this build.
  * Mosaic stack-allocates every unrolled-loop temporary, so strip
    height (th) x chunk width (cw) bound VMEM, not the block shapes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# host-side helpers
# ---------------------------------------------------------------------------

def _strips(a: jnp.ndarray, th: int, halo: int, *, edge: bool) -> jnp.ndarray:
    """[B, R, ...] -> [B*S, th+2*halo, ...] overlapping row strips."""
    b, r = a.shape[0], a.shape[1]
    s = r // th
    mode = "edge" if edge else "constant"
    pad = [(0, 0), (halo, halo)] + [(0, 0)] * (a.ndim - 2)
    ap = jnp.pad(a, pad, mode=mode)
    st = jnp.stack(
        [ap[:, i * th : i * th + th + 2 * halo] for i in range(s)], axis=1
    )
    return st.reshape((b * s, th + 2 * halo) + a.shape[2:])


def _phase_w(a: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, R, 2W] -> (even, odd) column planes [B, R, W]."""
    b, r, w2 = a.shape
    ph = a.reshape(b, r, w2 // 2, 2)
    return ph[..., 0], ph[..., 1]


# Per-output-phase tap tables for a stride-1 3x3 conv on the 512 grid,
# expressed on the W-phase planes. Out col 2j (q=0) taps cols
# 2j-1,2j,2j+1 = odd[j-1], even[j], odd[j]; out col 2j+1 (q=1) taps
# even[j], odd[j], even[j+1]. In a zero-padded phase frame (pad col 1)
# that is plane p with padded-col offset o:
_TAPS = {
    0: (("o", 0), ("e", 1), ("o", 1)),
    1: (("e", 1), ("o", 1), ("e", 2)),
}


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _tail_kernel(
    # refs, in order:
    d_ref,            # [1, th//2+4, w+2, c] decoder features (edge-padded)
    me_ref, mo_ref,   # [1, th+4, w+2]  m512 W-phases (zero halos) - V mult
    m_ref,            # [6, th+4, w]    pre-shifted mask tap planes (q*3+kx)
    xv_ref,           # [6, th+4, w]    pre-shifted x*m tap planes
    fv_ref,           # [1, th+4, w]    in-image row validity (1/0)
    xce_ref, xco_ref,   # [1, th, w]    composite x W-phases
    xmce_ref, xmco_ref, # [1, th, w]    composite mask W-phases
    wmain_ref,        # [3, 3c, c]      dec1 kernel, kx-stacked per ky
    wskip_ref,        # [9, c]
    bias_ref, bna_ref, bnb_ref,  # [1, c]
    wfin_ref,         # [9, c]
    bfin_ref,         # [1, 1]
    oute_ref, outo_ref,  # [1, th, w]   composite W-phases
    *, th: int, w: int, c: int, cw: int, compute,
):
    """One program = one H-strip of one batch element. See module doc."""
    rows_u = th + 4
    f32 = jnp.float32
    ds = d_ref[0].astype(compute)  # [th//2+4, w+2, c]

    # ---- 2x bilinear upsample, never interleaved ---------------------
    # H first (rows are untiled leading-dim indices: free slicing),
    # then W phases (sublane-offset adds on 3D values: supported).
    hrows = []
    for r in range(rows_u):
        if r % 2 == 0:
            a, b2 = ds[r // 2], ds[r // 2 + 1]
            hrows.append(0.25 * a + 0.75 * b2)
        else:
            a, b2 = ds[(r - 3) // 2 + 2], ds[(r - 3) // 2 + 3]
            hrows.append(0.75 * a + 0.25 * b2)
    hu = jnp.stack(hrows, axis=0)  # [th+4, w+2, c]

    ue = jnp.concatenate(
        [hu[:, :1], 0.25 * hu[:, :-1] + 0.75 * hu[:, 1:]], axis=1
    )
    uo = jnp.concatenate(
        [0.75 * hu[:, :-1] + 0.25 * hu[:, 1:], hu[:, -1:]], axis=1
    )

    # V = U * m512: the [..., None] broadcast happens on the FULL ref
    # value (offset {0,0}) — the one 2D->3D form this build accepts.
    ve = ue * me_ref[0][..., None].astype(compute)
    vo = uo * mo_ref[0][..., None].astype(compute)

    n_chunks = w // cw
    dec_phases = []
    for q in (0, 1):
        # V taps in the padded frame (sublane offsets on 3D values)
        if q == 0:
            vtaps, offs = (vo, ve, vo), (0, 1, 1)
        else:
            vtaps, offs = (ve, vo, ve), (1, 1, 2)

        chunks = []
        for ci in range(n_chunks):
            j0 = ci * cw
            msum = jnp.zeros((th + 2, cw), f32)
            acc = jnp.zeros((th + 2, cw, c), f32)
            for ky in range(3):
                row = slice(ky, ky + th + 2)
                for kx in range(3):
                    # main conv tap: K=c dot (sublane-offset V slice)
                    acc = acc + jax.lax.dot_general(
                        vtaps[kx][row, j0 + offs[kx] : j0 + offs[kx] + cw],
                        wmain_ref[ky, kx * c : (kx + 1) * c],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=f32,
                    )
                    # scalar fields: lane-aligned slices of pre-shifted
                    # planes only (j0 is a multiple of the lane tile)
                    t = 3 * q + kx
                    m2 = m_ref[0, t, row, j0 : j0 + cw].astype(f32)
                    msum = msum + m2
                    # [..., None] on 2D values is 32-bit-only on this
                    # toolchain: keep the skip product in f32
                    xv2 = xv_ref[0, t, row, j0 : j0 + cw].astype(f32)
                    acc = acc + (
                        xv2[..., None] * wskip_ref[3 * ky + kx][None, None, :]
                    )
            ratio = jnp.where(msum > 0.0, 9.0 / (msum + 1e-8), 0.0)
            dec1 = (acc + bias_ref[0]) * ratio[..., None]
            dec1 = dec1 * bna_ref[0] + bnb_ref[0]
            chunks.append(jnp.maximum(dec1, 0.0).astype(compute))
        zero_col = jnp.zeros((th + 2, 1, c), compute)
        dec_phases.append(
            jnp.concatenate([zero_col] + chunks + [zero_col], axis=1)
        )  # [th+2, w+2, c]; cols 0 / w+1 are the final conv's zero pad

    de, do = dec_phases

    # ---- final conv + sigmoid + composite -----------------------------
    for q in (0, 1):
        if q == 0:
            ftaps, foffs = (do, de, do), (0, 1, 1)
            xc_ref, xmc_ref, out_ref = xce_ref, xmce_ref, oute_ref
        else:
            ftaps, foffs = (de, do, de), (1, 1, 2)
            xc_ref, xmc_ref, out_ref = xco_ref, xmco_ref, outo_ref
        for ci in range(n_chunks):
            j0 = ci * cw
            f = jnp.zeros((th, cw), f32)
            for ky in range(3):
                row = slice(ky, ky + th)
                # dec1 rows outside the image stand in for the final
                # conv's zero padding: gate each ky tap by the row
                # validity plane (dec1 row rr+ky <-> fv strip row
                # rr+ky+1); fv slices are lane-aligned 2D
                fvk = fv_ref[0, ky + 1 : ky + 1 + th, j0 : j0 + cw]
                tap = jnp.zeros((th, cw), f32)
                for kx in range(3):
                    tap = tap + jnp.sum(
                        ftaps[kx][row, j0 + foffs[kx] : j0 + foffs[kx] + cw]
                        .astype(f32)
                        * wfin_ref[3 * ky + kx][None, None, :],
                        axis=-1,
                    )
                f = f + tap * fvk
            o = jax.nn.sigmoid(f + bfin_ref[0, 0])
            xq = xc_ref[0, :, j0 : j0 + cw]
            mq = xmc_ref[0, :, j0 : j0 + cw]
            out_ref[0, :, j0 : j0 + cw] = o * (1.0 - mq) + xq * mq


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------

def fused_decoder_tail(
    d: jnp.ndarray,
    dm: jnp.ndarray,
    x: jnp.ndarray,
    xm: jnp.ndarray,
    k_main: jnp.ndarray,
    k_skip: jnp.ndarray,
    bias: jnp.ndarray,
    bn_scale: jnp.ndarray,
    bn_bias: jnp.ndarray,
    bn_mean: jnp.ndarray,
    bn_var: jnp.ndarray,
    k_fin: jnp.ndarray,
    b_fin: jnp.ndarray,
    eps: float = 1e-5,
    th: int = 8,
    cw: int = 128,
    interpret: bool = False,
    compute=jnp.bfloat16,
) -> jnp.ndarray:
    """Fused eval-mode decoder tail. Returns the composite [B,2H,2W,1].

    d: [B,H,W,C] dec2 features; dm: [B,H,W,1] dec2 mask;
    x/xm: [B,2H,2W,1] input image / mask.
    k_main: [3,3,C,C]; k_skip: [3,3,1,C]; k_fin: [3,3,C,1].
    Raises ValueError outside the kernel envelope (caller falls back).
    """
    b, h, w, c = d.shape
    if x.shape[1] != 2 * h or x.shape[2] != 2 * w:
        raise ValueError("tail kernel needs exact 2x geometry")
    th = min(th, 2 * h)
    if (2 * h) % th or th % 2:
        raise ValueError(f"2H={2*h} not divisible by even th={th}")
    cw = min(cw, w)
    if w % cw or (cw % 128 and cw != w):
        # chunk starts must be lane-tile aligned (or a single chunk)
        raise ValueError(f"w={w} has no lane-aligned chunk width near {cw}")
    s = (2 * h) // th

    f32 = jnp.float32
    # phase planes at the 512 grid
    xe, xo = _phase_w(x[..., 0].astype(f32))
    xme, xmo = _phase_w(xm[..., 0].astype(f32))
    dm2 = jnp.repeat(dm[..., 0].astype(f32), 2, axis=1)  # nearest rows
    me = jnp.maximum(dm2, xme)
    mo = jnp.maximum(dm2, xmo)
    fv = jnp.ones((b, 2 * h, w), f32)

    def wpad(a):
        return jnp.pad(a, ((0, 0), (0, 0), (1, 1)))

    mep, mop = wpad(me), wpad(mo)
    xvep, xvop = wpad(xe * me), wpad(xo * mo)

    def tap_planes(pe, po):
        """[6, ...]-stacked pre-shifted tap planes, index = q*3 + kx."""
        sel = {"e": pe, "o": po}
        return [sel[p][:, :, o : o + w] for q in (0, 1) for p, o in _TAPS[q]]

    m_planes = jnp.stack(tap_planes(mep, mop), axis=1)    # [B, 6, R, w]
    xv_planes = jnp.stack(tap_planes(xvep, xvop), axis=1)

    d_pad = jnp.pad(
        d.astype(compute), ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge"
    )
    d_str = _strips(d_pad, th // 2, 2, edge=True)
    me_str = _strips(mep, th, 2, edge=False)
    mo_str = _strips(mop, th, 2, edge=False)
    # strip the stacked planes: [B, 6, R, w] -> [B*S, 6, th+4, w]
    def _strips6(a):
        at = a.transpose(0, 2, 1, 3)  # [B, R, 6, w]
        st = _strips(at, th, 2, edge=False)  # [B*S, th+4, 6, w]
        return st.transpose(0, 2, 1, 3)

    m_str = _strips6(m_planes)
    xv_str = _strips6(xv_planes)
    fv_str = _strips(fv, th, 2, edge=False)
    xce = _strips(xe, th, 0, edge=False)
    xco = _strips(xo, th, 0, edge=False)
    xmce = _strips(xme, th, 0, edge=False)
    xmco = _strips(xmo, th, 0, edge=False)

    # weight packing
    wmain = jnp.concatenate(
        [k_main[ky, kx] for ky in range(3) for kx in range(3)], axis=0
    ).reshape(3, 3 * c, c).astype(compute)
    wskip = k_skip.reshape(9, c).astype(f32)
    wfin = k_fin.reshape(9, c).astype(f32)
    bn_a = (bn_scale / jnp.sqrt(bn_var + eps)).astype(f32)
    bn_b = (bn_bias - bn_mean * bn_a).astype(f32)

    n = b * s
    hs4 = th // 2 + 4
    kern = functools.partial(
        _tail_kernel, th=th, w=w, c=c, cw=cw, compute=compute,
    )
    halo_spec = pl.BlockSpec(
        (1, th + 4, w + 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    plane6_spec = pl.BlockSpec(
        (1, 6, th + 4, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    flat_spec = pl.BlockSpec(
        (1, th, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    vec_spec = pl.BlockSpec(
        (1, c), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out_specs = [flat_spec, flat_spec]
    oute, outo = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(
                (1, hs4, w + 2, c), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            halo_spec, halo_spec,
            plane6_spec, plane6_spec,
            pl.BlockSpec((1, th + 4, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            flat_spec, flat_spec, flat_spec, flat_spec,
            pl.BlockSpec((3, 3 * c, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec_spec, vec_spec, vec_spec,
            pl.BlockSpec((9, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((n, th, w), f32),
            jax.ShapeDtypeStruct((n, th, w), f32),
        ],
        interpret=interpret,
    )(
        d_str, me_str, mo_str, m_str, xv_str, fv_str,
        xce, xco, xmce, xmco,
        wmain, wskip,
        bias.reshape(1, c).astype(f32),
        bn_a.reshape(1, c), bn_b.reshape(1, c),
        wfin,
        b_fin.reshape(1, 1).astype(f32),
    )

    oute = oute.reshape(b, 2 * h, w)
    outo = outo.reshape(b, 2 * h, w)
    out = jnp.stack([oute, outo], axis=-1).reshape(b, 2 * h, 2 * w)
    return out[..., None]


def tail_reference(
    d, dm, x, xm, k_main, k_skip, bias,
    bn_scale, bn_bias, bn_mean, bn_var, k_fin, b_fin, eps: float = 1e-5,
) -> jnp.ndarray:
    """Pure-lax tail with the generator's exact op sequence (oracle for
    the fused kernel's tests; mirrors models/generator.py eval path)."""
    from ...ops.pconv import partial_conv2d_split
    from ...ops.resize import upsample2x_bilinear, upsample2x_nearest

    up = upsample2x_bilinear(d)
    um = upsample2x_nearest(dm)
    m512 = jnp.maximum(um, xm)
    k_cat = jnp.concatenate([k_main, k_skip], axis=2)
    out, _ = partial_conv2d_split(
        (up, x.astype(up.dtype)), m512, k_cat, bias, 1, 1,
        compute_dtype=None if up.dtype == jnp.float32 else up.dtype,
    )
    a = bn_scale / jnp.sqrt(bn_var + eps)
    h = (out - bn_mean) * a + bn_bias
    h = jax.nn.relu(h)
    f = jax.lax.conv_general_dilated(
        h.astype(d.dtype), k_fin.astype(d.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32) + b_fin
    o = jax.nn.sigmoid(f)
    return o * (1.0 - xm) + x * xm
