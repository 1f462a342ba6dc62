"""Experiments on the decoder tail (upsample -> dec1 -> final conv).

The round-2 inference profile (BASELINE.md) attributes 24.3 of the
52.5 ms batch-32 forward to the tail: dec1 conv+epilogue 11.6 ms,
final 64->1 conv 6.5 ms (a layout pathology for its 9.7 GFLOP), and
the 256->512 upsample 6.2 ms. This script times isolated variants on
the real device to pick winners before wiring them into the model.

Usage: python scripts/exp_tail.py [--batch 32] [--variants v0,v1,...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--variants", default="")
    p.add_argument("--profile", action="store_true",
                   help="trace the last selected variant, print top ops")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from terra_gan_tpu.ops.pconv import mask_window_sum
    from terra_gan_tpu.ops.resize import upsample2x_bilinear, upsample2x_nearest

    B = args.batch
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.random((B, 256, 256, 64), dtype=np.float32)).astype(
        jnp.bfloat16
    )  # dec2 output
    dm = jnp.asarray(
        (rng.random((B, 256, 256, 1)) > 0.1).astype(np.float32)
    )  # dec2 mask
    x = jnp.asarray(rng.random((B, 512, 512, 1), dtype=np.float32))
    xm = jnp.asarray((rng.random((B, 512, 512, 1)) > 0.25).astype(np.float32))

    k_main = jnp.asarray(
        rng.normal(0, 0.05, (3, 3, 64, 64)).astype(np.float32)
    ).astype(jnp.bfloat16)
    k_skip = jnp.asarray(
        rng.normal(0, 0.05, (3, 3, 1, 64)).astype(np.float32)
    ).astype(jnp.bfloat16)
    bias = jnp.asarray(rng.normal(0, 0.01, (64,)).astype(np.float32))
    bn_a = jnp.asarray(rng.random(64, dtype=np.float32) + 0.5)
    bn_b = jnp.asarray(rng.normal(0, 0.01, (64,)).astype(np.float32))
    k_fin = jnp.asarray(
        rng.normal(0, 0.05, (3, 3, 64, 1)).astype(np.float32)
    ).astype(jnp.bfloat16)
    b_fin = jnp.asarray([0.01], np.float32)

    DN = ("NHWC", "HWIO", "NHWC")

    def conv(a, k, pad=1):
        return lax.conv_general_dilated(
            a, k, (1, 1), ((pad, pad), (pad, pad)), dimension_numbers=DN
        )

    def dec1_lax(up, m512):
        """Reference tail pconv: split conv + renorm + BN + ReLU."""
        out = conv(up * m512.astype(up.dtype), k_main) + conv(
            (x * m512).astype(up.dtype), k_skip
        )
        msum = mask_window_sum(m512, 3, 3, 1, 1, compute_dtype=jnp.bfloat16)
        valid = msum > 0
        ratio = jnp.where(valid, 9.0 / (msum + 1e-8), 0.0)
        h = (out.astype(jnp.float32) + bias) * ratio
        h = h * bn_a + bn_b
        h = jnp.maximum(h, 0.0).astype(jnp.bfloat16)
        return h, valid.astype(jnp.float32)

    def final_composite(h, kf, mask):
        o = conv(h, kf).astype(jnp.float32) + b_fin
        o = jax.nn.sigmoid(o[..., :1])
        return o * (1.0 - mask) + x * mask

    def v0(d, dm):
        """Current model tail."""
        up = upsample2x_bilinear(d)
        um = upsample2x_nearest(dm)
        m512 = jnp.maximum(um, xm)
        h, _ = dec1_lax(up, m512)
        return final_composite(h, k_fin, xm)

    def v1(d, dm):
        """Final conv with cout padded to 8."""
        up = upsample2x_bilinear(d)
        um = upsample2x_nearest(dm)
        m512 = jnp.maximum(um, xm)
        h, _ = dec1_lax(up, m512)
        kf8 = jnp.concatenate(
            [k_fin, jnp.zeros((3, 3, 64, 7), k_fin.dtype)], axis=3
        )
        return final_composite(h, kf8, xm)

    def v2(d, dm):
        """Final conv with cout padded to 128."""
        up = upsample2x_bilinear(d)
        um = upsample2x_nearest(dm)
        m512 = jnp.maximum(um, xm)
        h, _ = dec1_lax(up, m512)
        kf128 = jnp.concatenate(
            [k_fin, jnp.zeros((3, 3, 64, 127), k_fin.dtype)], axis=3
        )
        return final_composite(h, kf128, xm)

    def v3(d, dm):
        """Upsample via stencil (shift/stack) form instead of dilated conv."""
        from terra_gan_tpu.ops.resize import _upsample2x_linear_axis

        up = _upsample2x_linear_axis(_upsample2x_linear_axis(d, 1), 2)
        um = upsample2x_nearest(dm)
        m512 = jnp.maximum(um, xm)
        h, _ = dec1_lax(up, m512)
        return final_composite(h, k_fin, xm)

    def v4(d, dm):
        """Upsample folded into dec1: 4 phase convs on the d-grid with
        combined (bilinear (*) dec1) kernels. INTERIOR-ONLY numerics
        (borders wrong by design here); measures the perf ceiling of
        the fold before investing in exact border corrections."""
        # build combined kernels K_pq [3,3,64,64] from k_main and the
        # 2-tap bilinear stencil: U[2i+p] taps d[i+di] with weights
        # wrow[p][di]; dec1 out row (2i+p) taps U rows via k3.
        w_even = {-1: 0.25, 0: 0.75}   # U[2i]   = .25 d[i-1] + .75 d[i]
        w_odd = {0: 0.75, 1: 0.25}     # U[2i+1] = .75 d[i]   + .25 d[i+1]

        def taps_for(p, ky):
            # U row index 2i+p+ky-1 -> phase & d-offset
            r = p + ky - 1
            i_off, ph = divmod(r, 2)
            w = w_even if ph == 0 else w_odd
            return {i_off + di: c for di, c in w.items()}

        km = np.asarray(k_main, np.float32)
        outs = []
        msum512 = mask_window_sum(
            jnp.maximum(upsample2x_nearest(dm), xm), 3, 3, 1, 1,
            compute_dtype=jnp.bfloat16,
        )
        for p in (0, 1):
            for q in (0, 1):
                K = np.zeros((3, 3, 64, 64), np.float32)
                for ky in range(3):
                    for kx in range(3):
                        ty = taps_for(p, ky)
                        tx = taps_for(q, kx)
                        for dy, cy in ty.items():
                            for dx, cx in tx.items():
                                K[dy + 1, dx + 1] += cy * cx * km[ky, kx]
                outs.append((p, q, jnp.asarray(K).astype(jnp.bfloat16)))

        # phase-split the 512-grid inputs once (reshape form)
        def ps(a):
            b, h, w, c = a.shape
            return a.reshape(b, h // 2, 2, w // 2, 2, c)

        xs = ps((x * jnp.maximum(upsample2x_nearest(dm), xm)).astype(jnp.bfloat16))
        ms = ps(msum512)
        phases = []
        dmask = dm.astype(jnp.bfloat16)
        dmasked = d * dmask
        for p, q, K in outs:
            o = conv(dmasked, K)  # [B,256,256,64]
            o = o + conv(xs[:, :, p, :, q, :], k_skip)
            msum_pq = ms[:, :, p, :, q, :]
            valid = msum_pq > 0
            ratio = jnp.where(valid, 9.0 / (msum_pq + 1e-8), 0.0)
            h = (o.astype(jnp.float32) + bias) * ratio
            h = jnp.maximum(h * bn_a + bn_b, 0.0).astype(jnp.bfloat16)
            phases.append(h)
        # final conv per output phase: consumes the 4 dec1 phases with
        # 2x2 kernels; here approximated by a 4x(2,2,256,1) conv stack
        cat = jnp.concatenate(phases, axis=-1)  # [B,256,256,256]
        fin = []
        kf = np.asarray(k_fin, np.float32)
        for p in (0, 1):
            for q in (0, 1):
                Kf = np.zeros((2, 2, 256, 1), np.float32)
                for ky in range(3):
                    for kx in range(3):
                        r, s = p + ky - 1, q + kx - 1
                        iy, phy = divmod(r, 2)
                        ix, phx = divmod(s, 2)
                        ch = (phy * 2 + phx) * 64
                        # size-2 window rows {i-1,i} for p=0, {i,i+1} for p=1
                        Kf[iy + 1 - p, ix + 1 - q, ch : ch + 64, 0] += (
                            kf[ky, kx, :, 0]
                        )
                o = lax.conv_general_dilated(
                    cat, jnp.asarray(Kf).astype(jnp.bfloat16), (1, 1),
                    ((1 - p, p), (1 - q, q)), dimension_numbers=DN,
                )
                fin.append(o)
        of = jnp.stack(fin, axis=3).astype(jnp.float32) + b_fin
        of = of.reshape(B, 256, 256, 2, 2, 1)
        of = of.transpose(0, 1, 3, 2, 4, 5).reshape(B, 512, 512, 1)
        o = jax.nn.sigmoid(of)
        return o * (1.0 - xm) + x * xm

    def v5(d, dm):
        """EXACT space-to-depth tail: the whole tail on the 256 grid.

        out[2i+p, 2j+q] channels live as S2D phase blocks; the 2x
        upsample becomes elementwise phase combos (no interleave), dec1
        becomes four 2x2 convs with K=1040 (one per output phase,
        zero-structure exact), the final conv one 3x3-coarse cout=4
        conv, and the only interleave is the 1-channel un-S2D at the
        very end. Exact semantics everywhere including borders: edge-
        padded d reproduces bilinear clamping; coarse zero-padding
        reproduces the 512-grid conv zero padding through V=0.
        """
        f32 = jnp.float32
        cdt = d.dtype

        def ps4(a):  # [B,512,512,1] -> {(p,q): [B,256,256,1]}
            b_, h_, w_, c_ = a.shape
            r = a.reshape(b_, h_ // 2, 2, w_ // 2, 2, c_)
            return {(p, q): r[:, :, p, :, q, :] for p in (0, 1)
                    for q in (0, 1)}

        PQ = [(p, q) for p in (0, 1) for q in (0, 1)]
        xm_p, x_p = ps4(xm), ps4(x)
        m_p = {pq: jnp.maximum(dm, xm_p[pq]) for pq in PQ}

        # U phases + mask multiply + x*m skip channels, all elementwise
        dp = jnp.pad(d, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        taps = {0: ((0, 0.25), (1, 0.75)), 1: ((1, 0.75), (2, 0.25))}
        blocks = []
        for p, q in PQ:
            u = None
            for oy, wy in taps[p]:
                for ox, wx in taps[q]:
                    t = dp[:, oy : oy + 256, ox : ox + 256, :] * cdt.type(
                        wy * wx
                    )
                    u = t if u is None else u + t
            blocks.append(u * m_p[(p, q)].astype(cdt))
        for p, q in PQ:
            blocks.append((x_p[(p, q)] * m_p[(p, q)]).astype(cdt))
        V = jnp.concatenate(blocks, axis=-1)  # [B,256,256,260]

        # renorm ratio per phase from the 512-grid box-sum
        msum512 = mask_window_sum(
            jnp.maximum(upsample2x_nearest(dm), xm), 3, 3, 1, 1,
            compute_dtype=jnp.bfloat16,
        )
        ms_p = ps4(msum512.astype(f32))

        # dec1: one 2x2 conv per output phase (K = 2*2*260 = 1040)
        km = np.asarray(k_main, np.float32)
        ks = np.asarray(k_skip, np.float32)
        dec_p = {}
        for p, q in PQ:
            K = np.zeros((2, 2, 260, 64), np.float32)
            for ky in range(3):
                r = p + ky - 1
                dy, py = r // 2, r % 2
                a = dy - (-1 if p == 0 else 0)
                for kx in range(3):
                    s = q + kx - 1
                    dx, px = s // 2, s % 2
                    b2 = dx - (-1 if q == 0 else 0)
                    ch = (py * 2 + px) * 64
                    K[a, b2, ch : ch + 64, :] += km[ky, kx]
                    K[a, b2, 256 + py * 2 + px, :] += ks[ky, kx, 0]
            pad_y = (1, 0) if p == 0 else (0, 1)
            pad_x = (1, 0) if q == 0 else (0, 1)
            o = lax.conv_general_dilated(
                V, jnp.asarray(K).astype(cdt), (1, 1), (pad_y, pad_x),
                dimension_numbers=DN,
            ).astype(f32)
            msum_pq = ms_p[(p, q)]
            ratio = jnp.where(msum_pq > 0, 9.0 / (msum_pq + 1e-8), 0.0)
            hpq = (o + bias) * ratio
            hpq = hpq * bn_a + bn_b
            dec_p[(p, q)] = jnp.maximum(hpq, 0.0).astype(cdt)
        D = jnp.concatenate([dec_p[pq] for pq in PQ], axis=-1)

        # final conv: one 3x3-coarse conv, cout = 4 output phases
        kf = np.asarray(k_fin, np.float32)
        KF = np.zeros((3, 3, 256, 4), np.float32)
        for oi, (p, q) in enumerate(PQ):
            for ky in range(3):
                r = p + ky - 1
                dy, py = r // 2, r % 2
                for kx in range(3):
                    s = q + kx - 1
                    dx, px = s // 2, s % 2
                    ch = (py * 2 + px) * 64
                    KF[dy + 1, dx + 1, ch : ch + 64, oi] += kf[ky, kx, :, 0]
        f4 = lax.conv_general_dilated(
            D, jnp.asarray(KF).astype(cdt), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=DN,
        ).astype(f32) + b_fin
        o4 = jax.nn.sigmoid(f4)
        xm4 = jnp.concatenate([xm_p[pq] for pq in PQ], axis=-1)
        x4 = jnp.concatenate([x_p[pq] for pq in PQ], axis=-1)
        y4 = o4 * (1.0 - xm4) + x4 * xm4

        # un-S2D the 1-channel composite
        y = y4.reshape(B, 256, 256, 2, 2)
        y = y.transpose(0, 1, 3, 2, 4).reshape(B, 512, 512, 1)
        return y

    def v6(d, dm):
        """v5 without the giant concat: split convs per input phase
        block, skip conv as an elementwise phase stencil, epilogue fed
        by the conv sum (fusable)."""
        f32 = jnp.float32
        cdt = d.dtype

        def ps4(a):
            b_, h_, w_, c_ = a.shape
            r = a.reshape(b_, h_ // 2, 2, w_ // 2, 2, c_)
            return {(p, q): r[:, :, p, :, q, :] for p in (0, 1)
                    for q in (0, 1)}

        PQ = [(p, q) for p in (0, 1) for q in (0, 1)]
        xm_p, x_p = ps4(xm), ps4(x)
        m_p = {pq: jnp.maximum(dm, xm_p[pq]) for pq in PQ}

        dp = jnp.pad(d, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        taps = {0: ((0, 0.25), (1, 0.75)), 1: ((1, 0.75), (2, 0.25))}
        Vb, XVb = {}, {}
        for p, q in PQ:
            u = None
            for oy, wy in taps[p]:
                for ox, wx in taps[q]:
                    t = dp[:, oy : oy + 256, ox : ox + 256, :] * cdt.type(
                        wy * wx
                    )
                    u = t if u is None else u + t
            Vb[(p, q)] = u * m_p[(p, q)].astype(cdt)
            XVb[(p, q)] = (x_p[(p, q)] * m_p[(p, q)]).astype(f32)

        msum512 = mask_window_sum(
            jnp.maximum(upsample2x_nearest(dm), xm), 3, 3, 1, 1,
            compute_dtype=jnp.bfloat16,
        )
        ms_p = ps4(msum512.astype(f32))

        km = np.asarray(k_main, np.float32)
        ks = np.asarray(k_skip, np.float32)
        # pre-assemble per (output phase, input phase) 2x2 kernels and
        # per-output-phase skip stencils on the padded skip planes
        dec_p = {}
        for p, q in PQ:
            Ks = {pq: np.zeros((2, 2, 64, 64), np.float32) for pq in PQ}
            skt = []  # (input phase, oy, ox, weight vector)
            for ky in range(3):
                r = p + ky - 1
                dy, py = r // 2, r % 2
                a = dy - (-1 if p == 0 else 0)
                for kx in range(3):
                    s = q + kx - 1
                    dx, px = s // 2, s % 2
                    b2 = dx - (-1 if q == 0 else 0)
                    Ks[(py, px)][a, b2] += km[ky, kx]
                    skt.append(((py, px), dy, dx, ks[ky, kx, 0]))
            pad_y = (1, 0) if p == 0 else (0, 1)
            pad_x = (1, 0) if q == 0 else (0, 1)
            o = None
            for pq in PQ:
                c = lax.conv_general_dilated(
                    Vb[pq], jnp.asarray(Ks[pq]).astype(cdt), (1, 1),
                    (pad_y, pad_x), dimension_numbers=DN,
                )
                o = c if o is None else o + c
            # skip contribution: shifted 1-channel planes x weight vecs
            sk = None
            for pq, dy, dx, wv in skt:
                pl = jnp.pad(
                    XVb[pq][..., 0], ((0, 0), (1, 1), (1, 1))
                )[:, 1 + dy : 257 + dy, 1 + dx : 257 + dx]
                t = pl[..., None] * jnp.asarray(wv)
                sk = t if sk is None else sk + t
            msum_pq = ms_p[(p, q)]
            ratio = jnp.where(msum_pq > 0, 9.0 / (msum_pq + 1e-8), 0.0)
            hpq = (o.astype(f32) + sk + bias) * ratio
            hpq = hpq * bn_a + bn_b
            dec_p[(p, q)] = jnp.maximum(hpq, 0.0).astype(cdt)

        kf = np.asarray(k_fin, np.float32)
        f4 = None
        # final conv as 4 split convs over the phase blocks (cout=4)
        KFb = {pq: np.zeros((3, 3, 64, 4), np.float32) for pq in PQ}
        for oi, (p, q) in enumerate(PQ):
            for ky in range(3):
                r = p + ky - 1
                dy, py = r // 2, r % 2
                for kx in range(3):
                    s = q + kx - 1
                    dx, px = s // 2, s % 2
                    KFb[(py, px)][dy + 1, dx + 1, :, oi] += kf[ky, kx, :, 0]
        for pq in PQ:
            c = lax.conv_general_dilated(
                dec_p[pq], jnp.asarray(KFb[pq]).astype(cdt), (1, 1),
                ((1, 1), (1, 1)), dimension_numbers=DN,
            )
            f4 = c if f4 is None else f4 + c
        f4 = f4.astype(f32) + b_fin
        o4 = jax.nn.sigmoid(f4)
        xm4 = jnp.concatenate([xm_p[pq] for pq in PQ], axis=-1)
        x4 = jnp.concatenate([x_p[pq] for pq in PQ], axis=-1)
        y4 = o4 * (1.0 - xm4) + x4 * xm4
        y = y4.reshape(B, 256, 256, 2, 2)
        y = y.transpose(0, 1, 3, 2, 4).reshape(B, 512, 512, 1)
        return y

    variants = {"v0": v0, "v1": v1, "v2": v2, "v3": v3, "v4": v4,
                "v5": v5, "v6": v6}
    pick = args.variants.split(",") if args.variants else list(variants)

    ref = None
    for name in pick:
        fn = jax.jit(variants[name])
        out = fn(d, dm)
        s = float(jnp.sum(out))  # compile+sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(d, dm)
        float(jnp.sum(out))
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        if name == "v0":
            ref = np.asarray(out)
            diff = 0.0
        else:
            a = np.asarray(out)
            # interior-only comparison (v4 borders intentionally wrong)
            diff = float(
                np.abs(a[:, 4:-4, 4:-4] - ref[:, 4:-4, 4:-4]).max()
            )
        print(f"{name}: {ms:7.2f} ms  interior-maxdiff={diff:.2e}  sum={s:.1f}")

    if args.profile:
        import shutil

        from terra_gan_tpu.utils.profiling import device_op_summary, trace

        shutil.rmtree("/tmp/tgt_exp_tail", ignore_errors=True)
        with trace("/tmp/tgt_exp_tail"):
            for _ in range(5):
                out = fn(d, dm)
            float(jnp.sum(out))
        for nm, ms in device_op_summary("/tmp/tgt_exp_tail", top=20):
            print(f"{ms / 5:9.3f} ms  {nm[:120]}")


if __name__ == "__main__":
    main()
