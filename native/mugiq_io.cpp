// mugiq_io — native IO for lattice gauge configurations.
//
// Replaces the QIO/LIME + NERSC readers the reference consumes through QUDA
// (read_gauge_field, /root/reference/tests/loop.cpp:849-851) with a small
// self-contained C++ library exposed to python via ctypes
// (mugiq_tpu/io/native.py).  Production gauge configs are multi-GB; the hot
// operations (byte swap to host endianness, SU(3) third-row reconstruction,
// NERSC checksum) are done here in C++ with OpenMP-free portable loops that
// compilers vectorise well.
//
// LIME format (SciDAC interchange):
//   magic 0x456789ab (big-endian u32), version u16, msg/flag bits u16,
//   data length u64 BE, 128-byte type string, data padded to 8 bytes.
//
// Build: cc -O3 -shared -fPIC -o libmugiq_io.so mugiq_io.cpp  (see
// native/Makefile; built on demand by io/native.py).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>

extern "C" {

// ---------------------------------------------------------------------------
// byte swapping
// ---------------------------------------------------------------------------

void mugiq_byteswap32(void *data, int64_t n) {
    uint32_t *p = static_cast<uint32_t *>(data);
    for (int64_t i = 0; i < n; ++i) {
        uint32_t v = p[i];
        p[i] = ((v & 0xFF000000u) >> 24) | ((v & 0x00FF0000u) >> 8) |
               ((v & 0x0000FF00u) << 8) | ((v & 0x000000FFu) << 24);
    }
}

void mugiq_byteswap64(void *data, int64_t n) {
    uint64_t *p = static_cast<uint64_t *>(data);
    for (int64_t i = 0; i < n; ++i) {
        uint64_t v = p[i];
        v = ((v & 0xFF00FF00FF00FF00ull) >> 8) | ((v & 0x00FF00FF00FF00FFull) << 8);
        v = ((v & 0xFFFF0000FFFF0000ull) >> 16) | ((v & 0x0000FFFF0000FFFFull) << 16);
        p[i] = (v >> 32) | (v << 32);
    }
}

// ---------------------------------------------------------------------------
// NERSC checksum: u32 sum of all 32-bit data words (file byte order already
// swapped to host by the caller or not — caller passes the raw buffer)
// ---------------------------------------------------------------------------

uint32_t mugiq_nersc_checksum32(const void *data, int64_t n_words) {
    const uint32_t *p = static_cast<const uint32_t *>(data);
    uint64_t acc = 0;
    for (int64_t i = 0; i < n_words; ++i) acc += p[i];
    return static_cast<uint32_t>(acc & 0xFFFFFFFFull);
}

// ---------------------------------------------------------------------------
// SU(3) third-row reconstruction: row3 = conj(row1 x row2)
// links: [n_links][rows][3][2] doubles, two-row input (rows=2) written into
// a three-row output buffer.
// ---------------------------------------------------------------------------

void mugiq_su3_reconstruct(const double *two_row, double *three_row,
                           int64_t n_links) {
    for (int64_t l = 0; l < n_links; ++l) {
        const double *in = two_row + l * 12;   // 2 rows x 3 cols x (re, im)
        double *out = three_row + l * 18;
        memcpy(out, in, 12 * sizeof(double));
        // r3 = conj(r1 x r2); cross product of complex 3-vectors
        for (int c = 0; c < 3; ++c) {
            int i = (c + 1) % 3, j = (c + 2) % 3;
            double a_re = in[2 * i], a_im = in[2 * i + 1];
            double b_re = in[6 + 2 * j], b_im = in[6 + 2 * j + 1];
            double c_re = in[2 * j], c_im = in[2 * j + 1];
            double d_re = in[6 + 2 * i], d_im = in[6 + 2 * i + 1];
            // (a*b - c*d), then conjugate
            double re = (a_re * b_re - a_im * b_im) - (c_re * d_re - c_im * d_im);
            double im = (a_re * b_im + a_im * b_re) - (c_re * d_im + c_im * d_re);
            out[12 + 2 * c] = re;
            out[12 + 2 * c + 1] = -im;
        }
    }
}

// ---------------------------------------------------------------------------
// LIME record walker.
// Fills caller-provided arrays with (offset, length) of each record payload
// and copies the 128-char type strings.  Returns the number of records, or
// -1 on format error.
// ---------------------------------------------------------------------------

static uint64_t be64(const unsigned char *b) {
    uint64_t v = 0;
    for (int i = 0; i < 8; ++i) v = (v << 8) | b[i];
    return v;
}

static uint32_t be32(const unsigned char *b) {
    return (uint32_t(b[0]) << 24) | (uint32_t(b[1]) << 16) |
           (uint32_t(b[2]) << 8) | uint32_t(b[3]);
}

int mugiq_lime_scan(const char *path, int max_records,
                    int64_t *offsets, int64_t *lengths, char *types /*128 each*/) {
    FILE *f = fopen(path, "rb");
    if (!f) return -1;
    int n = 0;
    unsigned char hdr[144];
    int64_t pos = 0;
    while (n < max_records && fread(hdr, 1, 144, f) == 144) {
        if (be32(hdr) != 0x456789abu) break;
        uint64_t dlen = be64(hdr + 8);
        memcpy(types + 128 * n, hdr + 16, 128);
        offsets[n] = pos + 144;
        lengths[n] = static_cast<int64_t>(dlen);
        ++n;
        uint64_t padded = (dlen + 7) & ~7ull;
        pos += 144 + static_cast<int64_t>(padded);
        if (fseek(f, pos, SEEK_SET) != 0) break;
    }
    fclose(f);
    return n;
}

// Read `length` bytes at `offset` into buf.  Returns 0 on success.
int mugiq_read_at(const char *path, int64_t offset, int64_t length, void *buf) {
    FILE *f = fopen(path, "rb");
    if (!f) return -1;
    if (fseek(f, offset, SEEK_SET) != 0) { fclose(f); return -2; }
    size_t got = fread(buf, 1, static_cast<size_t>(length), f);
    fclose(f);
    return got == static_cast<size_t>(length) ? 0 : -3;
}

}  // extern "C"
