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
//   terra_png_encode_gray8 / terra_png_decode_gray8
//                       — fast 8-bit grayscale PNG codec (Up-filtered
//                         zlib-1 encode, full 5-filter decode). The
//                         grid-scale e2e loop writes hundreds of tile
//                         PNGs per parent grid; PIL's encoder was the
//                         dominant host phase after device fetch
//                         (BASELINE.md r2 grid-e2e analysis; the loop
//                         replaced: reference main_pipeline.py:497-539).
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
// Build: make -C native   (g++ -O3 -shared -fPIC -lz)

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>

#include <zlib.h>

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

// ---------------------------------------------------------------------------
// PNG codec (8-bit grayscale, color type 0, non-interlaced)
// ---------------------------------------------------------------------------

static void png_put_u32(uint8_t* p, uint32_t v) {
    p[0] = (uint8_t)(v >> 24);
    p[1] = (uint8_t)(v >> 16);
    p[2] = (uint8_t)(v >> 8);
    p[3] = (uint8_t)v;
}

static uint32_t png_get_u32(const uint8_t* p) {
    return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
           ((uint32_t)p[2] << 8) | (uint32_t)p[3];
}

// Write one chunk (length + type + data + CRC) at out; returns bytes written.
static long png_chunk(uint8_t* out, const char* type, const uint8_t* data,
                      uint32_t len) {
    png_put_u32(out, len);
    memcpy(out + 4, type, 4);
    if (len) memcpy(out + 8, data, len);
    uint32_t crc = crc32(0L, out + 4, len + 4);
    png_put_u32(out + 8 + len, crc);
    return 12 + (long)len;
}

// Encode a [h, w] row-major gray8 image as a PNG.
//   level:    zlib level (1 = the measured speed/size sweet spot for tiles)
//   filter:   0 = None, 1 = Sub, 2 = Up (applied to every row; Up degrades
//             to None on row 0 per the PNG spec's zero-previous-row rule)
//   strategy: zlib strategy constant (0 default, 1 filtered, 2
//             huffman-only, 3 RLE). Sub + huffman-only measured both
//             fastest AND smallest on DSM tiles (residuals are
//             near-zero-centered noise, so LZ matches buy nothing).
// Returns the encoded byte count, or -1 on error / insufficient out_cap.
long terra_png_encode_gray8(const uint8_t* img, long h, long w, int level,
                            int filter, int strategy, uint8_t* out,
                            long out_cap) {
    if (h <= 0 || w <= 0 || filter < 0 || filter > 2) return -1;
    if (strategy < 0 || strategy > 4) return -1;
    const long raw_len = h * (w + 1);
    uint8_t* raw = (uint8_t*)malloc((size_t)raw_len);
    if (!raw) return -1;
    for (long y = 0; y < h; ++y) {
        uint8_t* dst = raw + y * (w + 1);
        const uint8_t* row = img + y * w;
        dst[0] = (uint8_t)filter;
        if (filter == 0 || (filter == 2 && y == 0)) {
            if (filter == 2) dst[0] = 0;  // Up on row 0 == None; save work
            memcpy(dst + 1, row, (size_t)w);
        } else if (filter == 1) {  // Sub: row[x] - row[x-1]
            dst[1] = row[0];
            for (long x = 1; x < w; ++x)
                dst[1 + x] = (uint8_t)(row[x] - row[x - 1]);
        } else {  // Up: row[x] - prev[x]
            const uint8_t* prev = row - w;
            for (long x = 0; x < w; ++x)
                dst[1 + x] = (uint8_t)(row[x] - prev[x]);
        }
    }
    uLongf zcap = compressBound((uLong)raw_len);
    uint8_t* zbuf = (uint8_t*)malloc(zcap);
    if (!zbuf) { free(raw); return -1; }
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    int rc = deflateInit2(&zs, level, Z_DEFLATED, 15, 8, strategy);
    if (rc == Z_OK) {
        zs.next_in = raw;
        zs.avail_in = (uInt)raw_len;
        zs.next_out = zbuf;
        zs.avail_out = (uInt)zcap;
        rc = deflate(&zs, Z_FINISH);
        zcap = zs.total_out;
        deflateEnd(&zs);
        rc = (rc == Z_STREAM_END) ? Z_OK : Z_BUF_ERROR;
    }
    free(raw);
    if (rc != Z_OK) { free(zbuf); return -1; }
    const long total = 8 + 12 + 13 + 12 + (long)zcap + 12;
    if (total > out_cap) { free(zbuf); return -1; }

    static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    uint8_t* p = out;
    memcpy(p, sig, 8);
    p += 8;
    uint8_t ihdr[13];
    png_put_u32(ihdr, (uint32_t)w);
    png_put_u32(ihdr + 4, (uint32_t)h);
    ihdr[8] = 8;   // bit depth
    ihdr[9] = 0;   // color type: grayscale
    ihdr[10] = 0;  // compression
    ihdr[11] = 0;  // filter method
    ihdr[12] = 0;  // no interlace
    p += png_chunk(p, "IHDR", ihdr, 13);
    p += png_chunk(p, "IDAT", zbuf, (uint32_t)zcap);
    p += png_chunk(p, "IEND", nullptr, 0);
    free(zbuf);
    return (long)(p - out);
}

static inline uint8_t paeth(uint8_t a, uint8_t b, uint8_t c) {
    int pp = (int)a + (int)b - (int)c;
    int pa = abs(pp - (int)a), pb = abs(pp - (int)b), pc = abs(pp - (int)c);
    if (pa <= pb && pa <= pc) return a;
    return (pb <= pc) ? b : c;
}

// Decode an 8-bit grayscale non-interlaced PNG into out ([h, w] row-major).
// Handles all five PNG filters. Returns 0 on success and fills *oh/*ow;
// 1 = not a PNG / structurally broken, 2 = unsupported format (caller
// should fall back to a general decoder), 3 = out_cap too small.
int terra_png_decode_gray8(const uint8_t* png, long len, uint8_t* out,
                           long out_cap, long* oh, long* ow) {
    static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    if (len < 8 + 25 || memcmp(png, sig, 8) != 0) return 1;
    long pos = 8;
    long w = 0, h = 0;
    int seen_ihdr = 0;
    uint8_t* zdata = nullptr;
    long zlen = 0, zcap_alloc = 0;
    while (pos + 12 <= len) {
        uint32_t clen = png_get_u32(png + pos);
        if (pos + 12 + (long)clen > len) { free(zdata); return 1; }
        const uint8_t* type = png + pos + 4;
        const uint8_t* data = png + pos + 8;
        if (memcmp(type, "IHDR", 4) == 0) {
            if (clen != 13) { free(zdata); return 1; }
            w = (long)png_get_u32(data);
            h = (long)png_get_u32(data + 4);
            // gray8, deflate, standard filtering, non-interlaced only
            if (data[8] != 8 || data[9] != 0 || data[10] != 0 ||
                data[11] != 0 || data[12] != 0) {
                free(zdata);
                return 2;
            }
            seen_ihdr = 1;
        } else if (memcmp(type, "IDAT", 4) == 0) {
            if (!seen_ihdr) { free(zdata); return 1; }
            if (zlen + (long)clen > zcap_alloc) {
                zcap_alloc = (zlen + (long)clen) * 2 + 4096;
                uint8_t* nz = (uint8_t*)realloc(zdata, (size_t)zcap_alloc);
                if (!nz) { free(zdata); return 1; }
                zdata = nz;
            }
            memcpy(zdata + zlen, data, clen);
            zlen += (long)clen;
        } else if (memcmp(type, "IEND", 4) == 0) {
            break;
        }
        pos += 12 + (long)clen;
    }
    if (!seen_ihdr || !zdata || h <= 0 || w <= 0) { free(zdata); return 1; }
    if (h * w > out_cap) { free(zdata); return 3; }
    const long raw_len = h * (w + 1);
    uint8_t* raw = (uint8_t*)malloc((size_t)raw_len);
    if (!raw) { free(zdata); return 1; }
    uLongf dlen = (uLongf)raw_len;
    int rc = uncompress(raw, &dlen, zdata, (uLong)zlen);
    free(zdata);
    if (rc != Z_OK || (long)dlen != raw_len) { free(raw); return 1; }
    for (long y = 0; y < h; ++y) {
        const uint8_t* src = raw + y * (w + 1);
        uint8_t* dst = out + y * w;
        const uint8_t* up = (y > 0) ? dst - w : nullptr;
        const uint8_t f = src[0];
        switch (f) {
            case 0:
                memcpy(dst, src + 1, (size_t)w);
                break;
            case 1:  // Sub
                dst[0] = src[1];
                for (long x = 1; x < w; ++x)
                    dst[x] = (uint8_t)(src[1 + x] + dst[x - 1]);
                break;
            case 2:  // Up
                for (long x = 0; x < w; ++x)
                    dst[x] = (uint8_t)(src[1 + x] + (up ? up[x] : 0));
                break;
            case 3:  // Average
                for (long x = 0; x < w; ++x) {
                    const int a = x > 0 ? dst[x - 1] : 0;
                    const int b = up ? up[x] : 0;
                    dst[x] = (uint8_t)(src[1 + x] + ((a + b) >> 1));
                }
                break;
            case 4:  // Paeth
                for (long x = 0; x < w; ++x) {
                    const uint8_t a = x > 0 ? dst[x - 1] : 0;
                    const uint8_t b = up ? up[x] : 0;
                    const uint8_t c = (x > 0 && up) ? up[x - 1] : 0;
                    dst[x] = (uint8_t)(src[1 + x] + paeth(a, b, c));
                }
                break;
            default:
                free(raw);
                return 1;
        }
    }
    free(raw);
    *oh = h;
    *ow = w;
    return 0;
}

}  // extern "C"
