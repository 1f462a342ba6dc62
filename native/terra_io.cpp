// terra_io: native host-side data-loader kernels.
//
// The ingestion hot loop (SURVEY §3.1 hot loop #1) parses ESRI ASCII
// grids and normalizes them per tile before the detectors run. Python
// text parsing (numpy fromstring/split) is the dominant cost for large
// grids; this library provides:
//
//   terra_parse_asc     — single-pass strtod parse of the numeric body
//                         of an .asc file (after the 6-line header),
//                         NODATA mapped to NaN.
//   terra_normalize_u8  — per-tile min-max normalization (NaN-aware)
//                         to uint8, flat tiles -> 0 (the contract of
//                         utils/data_extraction.py:60-115).
//   terra_box_sum_u8    — integral-image box sum over a binary mask
//                         (host-side mask analytics).
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>

extern "C" {

// Parse `count` whitespace-separated doubles from text[0..len) into out.
// Values equal to `nodata` become NaN. Returns the number parsed.
long terra_parse_asc(const char* text, long len, double* out, long count,
                     double nodata) {
    const char* p = text;
    const char* end = text + len;
    long n = 0;
    while (n < count && p < end) {
        char* next = nullptr;
        double v = strtod(p, &next);
        if (next == p) {  // not a number: skip one byte (whitespace etc.)
            ++p;
            continue;
        }
        out[n++] = (v == nodata) ? NAN : v;
        p = next;
    }
    return n;
}

// NaN-aware per-tile min-max normalization to uint8 (0..255).
// Returns 0 on success, 1 when every value is NaN (all-NODATA tile).
// Flat tiles (min == max) produce all zeros; NaN cells map to 0.
int terra_normalize_u8(const double* in, long count, uint8_t* out) {
    double lo = INFINITY, hi = -INFINITY;
    for (long i = 0; i < count; ++i) {
        double v = in[i];
        if (!std::isnan(v)) {
            if (v < lo) lo = v;
            if (v > hi) hi = v;
        }
    }
    if (lo > hi) return 1;  // all NaN
    const double range = hi - lo;
    if (range == 0.0) {
        memset(out, 0, (size_t)count);
        return 0;
    }
    for (long i = 0; i < count; ++i) {
        double v = in[i];
        if (std::isnan(v)) {
            out[i] = 0;
        } else {
            // same operation order as the numpy path (255*(v-lo))/range
            // so uint8 truncation matches bit-for-bit
            double s = (255.0 * (v - lo)) / range;
            out[i] = (uint8_t)(s < 0 ? 0 : (s > 255 ? 255 : s));
        }
    }
    return 0;
}

// Box sum over a uint8 binary image via integral image.
// in: [h, w] row-major; out: [oh, ow] int32 with oh = (h + 2p - k)/s + 1.
void terra_box_sum_u8(const uint8_t* in, long h, long w, long k, long s,
                      long p, int32_t* out) {
    const long ih = h + 2 * p, iw = w + 2 * p;
    // integral image with one extra row/col of zeros
    long* integ = (long*)calloc((size_t)((ih + 1) * (iw + 1)), sizeof(long));
    if (!integ) return;
    for (long y = 0; y < ih; ++y) {
        long row = 0;
        for (long x = 0; x < iw; ++x) {
            const long sy = y - p, sx = x - p;
            const int v =
                (sy >= 0 && sy < h && sx >= 0 && sx < w && in[sy * w + sx])
                    ? 1
                    : 0;
            row += v;
            integ[(y + 1) * (iw + 1) + (x + 1)] =
                integ[y * (iw + 1) + (x + 1)] + row;
        }
    }
    const long oh = (ih - k) / s + 1, ow = (iw - k) / s + 1;
    for (long oy = 0; oy < oh; ++oy) {
        const long y0 = oy * s, y1 = y0 + k;
        for (long ox = 0; ox < ow; ++ox) {
            const long x0 = ox * s, x1 = x0 + k;
            out[oy * ow + ox] = (int32_t)(
                integ[y1 * (iw + 1) + x1] - integ[y0 * (iw + 1) + x1] -
                integ[y1 * (iw + 1) + x0] + integ[y0 * (iw + 1) + x0]);
        }
    }
    free(integ);
}

}  // extern "C"
