"""Native host-IO library (native/terra_io.cpp via ctypes).

Skips cleanly when the toolchain can't build the library; when built,
the native paths must match the numpy fallbacks bit-for-bit.
"""

import numpy as np
import pytest

from terra_gan_tpu.utils.native import (
    box_sum_u8,
    native_available,
    normalize_u8,
    parse_asc_body,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library not built"
)


def test_parse_matches_numpy():
    rng = np.random.default_rng(0)
    data = rng.uniform(-100, 400, (64, 64))
    data[3, :5] = -9999.0
    body = "\n".join(
        " ".join(f"{v:.3f}" for v in row) for row in data
    )
    got = parse_asc_body(body, 64, 64, -9999.0)
    want = np.array(body.split(), dtype=np.float64).reshape(64, 64)
    want[want == -9999.0] = np.nan
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    np.testing.assert_allclose(
        got[~np.isnan(got)], want[~np.isnan(want)]
    )


def test_parse_truncated_body_returns_none():
    assert parse_asc_body("1.0 2.0 3.0", 2, 2, -9999.0) is None


def test_normalize_bitexact_vs_numpy():
    rng = np.random.default_rng(1)
    data = rng.uniform(-5, 250, (50, 50))
    data[0, 0] = np.nan
    got = normalize_u8(data)
    lo, hi = np.nanmin(data), np.nanmax(data)
    want = np.nan_to_num(255 * (data - lo) / (hi - lo), nan=0.0).astype(
        np.uint8
    )
    np.testing.assert_array_equal(got, want)


def test_normalize_flat_and_all_nan():
    assert (normalize_u8(np.full((4, 4), 3.0)) == 0).all()
    assert normalize_u8(np.full((4, 4), np.nan)) is None


def test_box_sum_matches_bruteforce():
    rng = np.random.default_rng(2)
    m = (rng.random((33, 47)) > 0.5).astype(np.uint8)
    k, s, p = 5, 2, 2
    got = box_sum_u8(m, k, s, p)
    padded = np.pad(m, p)
    oh = (33 + 2 * p - k) // s + 1
    ow = (47 + 2 * p - k) // s + 1
    want = np.zeros((oh, ow), np.int32)
    for y in range(oh):
        for x in range(ow):
            want[y, x] = padded[y * s : y * s + k, x * s : x * s + k].sum()
    np.testing.assert_array_equal(got, want)


class TestPngCodec:
    """Fast gray8 PNG codec (encode: Sub+zlib-1 huffman-only; decode:
    all five PNG filters). Lossless: every roundtrip is pixel-exact,
    cross-checked against PIL in both directions."""

    def _images(self):
        rng = np.random.default_rng(5)
        x, y = np.meshgrid(np.linspace(0, 8, 97), np.linspace(0, 8, 113))
        dsm = ((np.sin(x) + np.cos(y * 1.3) + 2) / 4 * 255).astype(np.uint8)
        return {
            "dsm": dsm,
            "noise": rng.integers(0, 256, (64, 64), dtype=np.uint8),
            "flat": np.full((32, 48), 77, np.uint8),
            "mask": (rng.random((50, 40)) > 0.7).astype(np.uint8) * 255,
            "tiny": np.array([[0, 255]], np.uint8),
        }

    def test_encode_decodes_identically_via_pil(self):
        import io
        from PIL import Image
        from terra_gan_tpu.utils.native import png_encode_gray8

        for name, img in self._images().items():
            for filt in (0, 1, 2):
                data = png_encode_gray8(img, filter=filt)
                assert data is not None, name
                back = np.asarray(Image.open(io.BytesIO(data)))
                np.testing.assert_array_equal(back, img, err_msg=name)

    def test_decode_handles_pil_output(self):
        import io
        from PIL import Image
        from terra_gan_tpu.utils.native import png_decode_gray8

        for name, img in self._images().items():
            for level in (1, 6):
                buf = io.BytesIO()
                Image.fromarray(img).save(buf, format="PNG",
                                          compress_level=level)
                got = png_decode_gray8(buf.getvalue())
                assert got is not None, name
                np.testing.assert_array_equal(got, img, err_msg=name)

    def test_native_roundtrip(self):
        from terra_gan_tpu.utils.native import (
            png_decode_gray8, png_encode_gray8,
        )

        for name, img in self._images().items():
            got = png_decode_gray8(png_encode_gray8(img))
            np.testing.assert_array_equal(got, img, err_msg=name)

    def test_strategies_and_levels(self):
        from terra_gan_tpu.utils import native as nat

        img = self._images()["dsm"]
        for strat in (nat.Z_DEFAULT_STRATEGY, nat.Z_FILTERED,
                      nat.Z_HUFFMAN_ONLY, nat.Z_RLE):
            for level in (1, 3):
                data = nat.png_encode_gray8(img, level=level, strategy=strat)
                got = nat.png_decode_gray8(data)
                np.testing.assert_array_equal(got, img)

    def test_decode_rejects_unsupported(self):
        import io
        from PIL import Image
        from terra_gan_tpu.utils.native import png_decode_gray8

        # RGB PNG -> unsupported (caller must fall back to PIL)
        rgb = np.zeros((8, 8, 3), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(rgb).save(buf, format="PNG")
        assert png_decode_gray8(buf.getvalue()) is None
        # not a PNG at all
        assert png_decode_gray8(b"definitely not a png") is None
        assert png_decode_gray8(b"") is None

    def test_shape_fuzz_roundtrip(self):
        """Edge shapes are the classic codec killers: 1x1, Nx1, 1xN,
        odd primes, and width just over a zlib block boundary — every
        one must roundtrip pixel-exact natively AND decode identically
        via PIL."""
        import io
        from PIL import Image
        from terra_gan_tpu.utils.native import (
            png_decode_gray8, png_encode_gray8,
        )

        rng = np.random.default_rng(11)
        shapes = [(1, 1), (1, 7), (7, 1), (3, 257), (257, 3),
                  (131, 251), (1, 512), (512, 1)]
        shapes += [tuple(rng.integers(1, 300, 2)) for _ in range(20)]
        for shape in shapes:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            for filt in (0, 1, 2):
                data = png_encode_gray8(img, filter=filt)
                assert data is not None, shape
                np.testing.assert_array_equal(
                    png_decode_gray8(data), img, err_msg=str(shape)
                )
                np.testing.assert_array_equal(
                    np.atleast_2d(np.asarray(Image.open(io.BytesIO(data)))),
                    img, err_msg=str(shape),
                )
