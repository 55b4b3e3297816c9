// frad_native — C++ fast paths for FrAD's byte-serial host kernels.
//
// The TPU tensor domain (DCT/masking/quant) lives in JAX/Pallas; these are
// the inherently bit/byte-serial stages that the reference implements as
// Python bit-strings and per-chunk loops (reference p1tools.py:49-74,
// ecc.py:6-25, common.py:4-10). Exposed via a plain C ABI for ctypes.
//
// Build: python -m frad_python_tpu.native.build   (g++ -O3 -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <cstddef>
#include <cstdlib>
#include <cstring>

#include <atomic>
#include <thread>
#include <vector>

#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// CRC-16/ANSI (poly 0xA001 reflected, init 0) — matches reference common.py
// ---------------------------------------------------------------------------
static uint16_t crc16_table[256];
static bool crc16_init_done = false;

static void crc16_init() {
    for (int i = 0; i < 256; i++) {
        uint16_t c = (uint16_t)i;
        for (int j = 0; j < 8; j++)
            c = (c & 1) ? (uint16_t)((c >> 1) ^ 0xA001) : (uint16_t)(c >> 1);
        crc16_table[i] = c;
    }
    crc16_init_done = true;
}

uint16_t frad_crc16_ansi(const uint8_t* data, size_t n) {
    if (!crc16_init_done) crc16_init();
    uint16_t crc = 0;
    for (size_t i = 0; i < n; i++)
        crc = (uint16_t)((crc >> 8) ^ crc16_table[(crc ^ data[i]) & 0xFF]);
    return crc;
}

// ---------------------------------------------------------------------------
// Exp-Golomb-Rice stream codec — wire format per reference p1tools.py:49-74
// ---------------------------------------------------------------------------
static inline int bit_width_u64(uint64_t v) {
    return v ? 64 - __builtin_clzll(v) : 0;
}

struct BitWriter {
    uint8_t* out;
    size_t byte_pos;
    uint64_t acc;
    int acc_bits;
};

static inline void bw_put(BitWriter* w, uint64_t value, int nbits) {
    // nbits <= 57 guaranteed by caller splitting; general path for <= 64
    while (nbits > 0) {
        int space = 64 - w->acc_bits;
        int take = nbits < space ? nbits : space;
        uint64_t seg = (nbits == 64 && take == 64)
            ? value
            : (value >> (nbits - take)) & ((take == 64) ? ~0ull : ((1ull << take) - 1));
        w->acc = (w->acc << take) | seg;
        w->acc_bits += take;
        nbits -= take;
        if (w->acc_bits == 64) {
            for (int b = 0; b < 8; b++)
                w->out[w->byte_pos + b] = (uint8_t)(w->acc >> (56 - 8 * b));
            w->byte_pos += 8;
            w->acc = 0;
            w->acc_bits = 0;
        }
    }
}

static inline void bw_flush(BitWriter* w) {
    while (w->acc_bits > 0) {
        int shift = w->acc_bits - 8;
        uint8_t byte = shift >= 0 ? (uint8_t)(w->acc >> shift)
                                  : (uint8_t)(w->acc << -shift);
        w->out[w->byte_pos++] = byte;
        w->acc_bits -= 8;
    }
    w->acc = 0;
    w->acc_bits = 0;
}

// Returns bytes written (including the k header byte). `out` must hold at
// least 1 + (17*n + 8) bytes (worst case 130-bit codes).
size_t frad_egr_encode(const int64_t* data, size_t n, uint8_t* out) {
    if (n == 0) { out[0] = 0; return 1; }

    uint64_t dmax = 0;
    for (size_t i = 0; i < n; i++) {
        uint64_t a = (uint64_t)(data[i] < 0 ? -data[i] : data[i]);
        if (a > dmax) dmax = a;
    }
    int k = dmax ? bit_width_u64(dmax - 1) : 0;   // == ceil(log2(dmax)), 0 for dmax<=1
    out[0] = (uint8_t)k;

    BitWriter w = {out, 1, 0, 0};
    const uint64_t base = 1ull << k;

    for (size_t i = 0; i < n; i++) {
        int64_t x = data[i];
        uint64_t mapped = x > 0 ? (uint64_t)((x << 1) - 1) : (uint64_t)((-x) << 1);
        uint64_t v = mapped + base;
        int blen = bit_width_u64(v);
        int code_len = 2 * blen - k - 1;           // zeros + digits
        if (code_len <= 64) {
            bw_put(&w, v, code_len);               // leading zeros implicit
        } else {
            bw_put(&w, 0, code_len - blen);
            bw_put(&w, v, blen);
        }
    }
    bw_flush(&w);
    return w.byte_pos;
}

// Returns number of decoded symbols. `out` must hold 8*(nbytes-1) entries.
// Word-buffered: unary prefixes via count-leading-zeros on a 64-bit
// accumulator, value bits extracted with one shift+mask per symbol.
size_t frad_egr_decode(const uint8_t* bytes, size_t nbytes, int64_t* out) {
    if (nbytes < 1) return 0;
    const int k = bytes[0];
    const uint8_t* p = bytes + 1;
    const size_t n = nbytes - 1;
    size_t byte_pos = 0;
    uint64_t acc = 0;        // low `acc_bits` bits valid, MSB-first order
    int acc_bits = 0;
    size_t count = 0;
    const int64_t base = (int64_t)(1ull << k);

    for (;;) {
        // refill
        while (acc_bits <= 56 && byte_pos < n) {
            acc = (acc << 8) | p[byte_pos++];
            acc_bits += 8;
        }
        if (acc_bits == 0) break;

        // unary zero run
        uint64_t m = 0;
        while (acc == 0) {
            m += (uint64_t)acc_bits;
            acc_bits = 0;
            if (byte_pos >= n) return count;       // trailing padding
            while (acc_bits <= 56 && byte_pos < n) {
                acc = (acc << 8) | p[byte_pos++];
                acc_bits += 8;
            }
            if (acc_bits == 0) return count;
        }
        int lead = acc_bits - bit_width_u64(acc);
        m += (uint64_t)lead;
        acc_bits -= lead;                          // zeros are implicit

        uint64_t need = m + (uint64_t)k + 1;       // value bits incl. the 1
        uint64_t v;
        if (need <= 57) {
            while ((uint64_t)acc_bits < need && byte_pos < n) {
                acc = (acc << 8) | p[byte_pos++];
                acc_bits += 8;
            }
            uint64_t take = need < (uint64_t)acc_bits ? need : (uint64_t)acc_bits;
            v = (acc >> (acc_bits - (int)take)) & ((take == 64) ? ~0ull : ((1ull << take) - 1));
            acc_bits -= (int)take;
            acc &= (acc_bits == 64) ? ~0ull : ((1ull << acc_bits) - 1);
        } else {
            // corrupt/huge codeword: bit-by-bit fallback with truncation
            v = 0;
            uint64_t got = 0;
            while (got < need) {
                if (acc_bits == 0) {
                    if (byte_pos >= n) break;
                    acc = p[byte_pos++];
                    acc_bits = 8;
                }
                v = (v << 1) | ((acc >> (acc_bits - 1)) & 1);
                acc_bits--;
                acc &= (1ull << acc_bits) - 1;
                got++;
            }
        }
        int64_t nval = (int64_t)v - base;
        out[count++] = (nval & 1) ? ((nval + 1) >> 1) : -(nval >> 1);
    }
    return count;
}

// ---------------------------------------------------------------------------
// Reed-Solomon GF(2^8), prim 0x11D, generator 2, fcr 0 — reedsolo wire compat
// ---------------------------------------------------------------------------
static uint8_t gf_exp[512];
static int16_t gf_log[256];
static bool gf_init_done = false;

static void gf_init() {
    int x = 1;
    for (int i = 0; i < 255; i++) {
        gf_exp[i] = (uint8_t)x;
        gf_log[x] = (int16_t)i;
        x <<= 1;
        if (x & 0x100) x ^= 0x11D;
    }
    for (int i = 255; i < 510; i++) gf_exp[i] = gf_exp[i - 255];
    gf_log[0] = 0;
    gf_init_done = true;
}

static inline uint8_t gmul(uint8_t a, uint8_t b) {
    if (!a || !b) return 0;
    return gf_exp[gf_log[a] + gf_log[b]];
}
static inline uint8_t gdiv(uint8_t a, uint8_t b) {
    if (!a) return 0;
    return gf_exp[(gf_log[a] - gf_log[b] + 255) % 255];
}
static inline uint8_t gpow2(int n) {               // 2^n, n may be negative
    int e = n % 255;
    if (e < 0) e += 255;
    return gf_exp[e];
}

// generator polynomial cache (high-first, degree nsym, nsym <= 255)
static uint8_t gen_cache[256][256];
static bool gen_have[256];

static const uint8_t* gen_poly(int nsym) {
    if (gen_have[nsym]) return gen_cache[nsym];
    uint8_t g[257];
    int glen = 1;
    g[0] = 1;
    for (int i = 0; i < nsym; i++) {
        uint8_t root = gpow2(i);
        uint8_t nxt[257];
        memset(nxt, 0, glen + 1);
        for (int j = 0; j < glen; j++) {
            nxt[j] ^= g[j];
            nxt[j + 1] ^= gmul(g[j], root);
        }
        glen++;
        memcpy(g, nxt, glen);
    }
    memcpy(gen_cache[nsym], g, glen);
    gen_have[nsym] = true;
    return gen_cache[nsym];
}

// Feedback-multiple table per generator: T[fb*nsym + j] = fb * g[j+1].
// Turns the LFSR inner loop from nsym log/exp lookups per input byte
// into one contiguous row XOR (vectorised at -O3) — the encode is the
// hot half of every ECC armor / repair re-armor pass. Keyed by nsym
// (the generator is unique per nsym at fixed fcr/prim); built lazily
// under an atomic CAS since the framer runs threaded.
static std::atomic<uint8_t*> fb_cache[256];

static const uint8_t* fb_table(size_t nsym) {
    uint8_t* t = fb_cache[nsym].load(std::memory_order_acquire);
    if (t) return t;
    const uint8_t* g = gen_poly((int)nsym);
    uint8_t* fresh = (uint8_t*)calloc(256 * nsym, 1);
    if (!fresh) return nullptr;   // caller falls back to the log/exp loop
    for (int fb = 1; fb < 256; fb++) {
        int lf = gf_log[fb];
        for (size_t j = 0; j < nsym; j++)
            fresh[(size_t)fb * nsym + j] =
                g[j + 1] ? gf_exp[lf + gf_log[g[j + 1]]] : 0;
    }
    uint8_t* expect = nullptr;
    if (!fb_cache[nsym].compare_exchange_strong(expect, fresh)) {
        free(fresh);        // another thread won with identical content
        return expect;
    }
    return fresh;
}

static void rs_encode_one(const uint8_t* msg, size_t dsize, size_t nsym,
                          const uint8_t* g, uint8_t* rem) {
    const uint8_t* fbt = fb_table(nsym);   // generator unique at fixed
    // synthetic division in a sliding scratch window: no per-byte
    // register shift, just a forward row XOR the compiler vectorises
    uint8_t stack_buf[768];                // dsize, nsym are u8 in the
    uint8_t* buf = stack_buf;              // wire format; guard anyway
    std::vector<uint8_t> heap_buf;
    if (dsize + nsym > sizeof stack_buf) {
        heap_buf.resize(dsize + nsym);
        buf = heap_buf.data();
    }
    memcpy(buf, msg, dsize);
    memset(buf + dsize, 0, nsym);
    for (size_t i = 0; i < dsize; i++) {
        uint8_t fb = buf[i];
        if (!fb) continue;
        uint8_t* dst = buf + i + 1;
        if (fbt) {
            const uint8_t* row = fbt + (size_t)fb * nsym;
            size_t j = 0;
            for (; j + 8 <= nsym; j += 8) {  // unaligned u64 XOR lanes
                uint64_t a, b;
                memcpy(&a, dst + j, 8);
                memcpy(&b, row + j, 8);
                a ^= b;
                memcpy(dst + j, &a, 8);
            }
            for (; j < nsym; j++) dst[j] ^= row[j];
        } else {                             // table alloc failed: log/exp
            int lf = gf_log[fb];
            for (size_t j = 0; j < nsym; j++)
                if (g[j + 1]) dst[j] ^= gf_exp[lf + gf_log[g[j + 1]]];
        }
    }
    memcpy(rem, buf + dsize, nsym);
}

void frad_rs_encode_blocks(const uint8_t* data, size_t nblocks, size_t dsize,
                           size_t nsym, uint8_t* parity) {
    if (nsym == 0) return;
    if (nsym > 255) {    // would index past the [256] static caches
        memset(parity, 0, nblocks * nsym);
        return;
    }
    if (!gf_init_done) gf_init();
    const uint8_t* g = gen_poly((int)nsym);
    for (size_t b = 0; b < nblocks; b++)
        rs_encode_one(data + b * dsize, dsize, nsym, g, parity + b * nsym);
}

// Berlekamp-Massey; returns locator degree (low-first in loc_out), -1 on fail.
static int bm_locator(const uint8_t* synd, int nsym, uint8_t* loc_out) {
    uint8_t err[260], old_[260];
    int elen = 1, olen = 1;
    err[0] = 1; old_[0] = 1;
    for (int i = 0; i < nsym; i++) {
        uint8_t delta = synd[i];
        for (int j = 1; j < elen; j++)
            delta ^= gmul(err[elen - 1 - j], synd[i - j]);
        old_[olen++] = 0;
        if (delta) {
            if (olen > elen) {
                uint8_t newl[260];
                for (int j = 0; j < olen; j++) newl[j] = gmul(old_[j], delta);
                int nlen = olen;
                for (int j = 0; j < elen; j++) old_[j] = gdiv(err[j], delta);
                olen = elen;
                memcpy(err, newl, nlen);
                elen = nlen;
            }
            // err += delta * old_  (high-first, right-aligned XOR)
            uint8_t sum[260];
            int n = elen > olen ? elen : olen;
            memset(sum, 0, n);
            for (int j = 0; j < elen; j++) sum[j + n - elen] ^= err[j];
            for (int j = 0; j < olen; j++) sum[j + n - olen] ^= gmul(delta, old_[j]);
            memcpy(err, sum, n);
            elen = n;
        }
    }
    int lead = 0;
    while (lead < elen && err[lead] == 0) lead++;
    int deg = elen - lead - 1;
    if (deg < 0 || deg * 2 > nsym) return -1;
    for (int j = 0; j <= deg; j++) loc_out[j] = err[elen - 1 - j];  // low-first
    return deg;
}

// Multiply-by-alpha^j tables for Horner syndrome evaluation: 256 B per
// syndrome index, built lazily per nsym (same CAS pattern as fb_table).
// Turns the inner step into one L1 table load + XOR instead of a
// branchy log/exp multiply.
static std::atomic<uint8_t*> synd_cache[256];

static const uint8_t* synd_table(size_t nsym) {
    uint8_t* t = synd_cache[nsym].load(std::memory_order_acquire);
    if (t) return t;
    uint8_t* fresh = (uint8_t*)calloc(256 * nsym, 1);
    if (!fresh) return nullptr;   // caller falls back to the log/exp loop
    for (size_t j = 0; j < nsym; j++) {
        uint8_t aj = gpow2((int)j);
        for (int v = 1; v < 256; v++)
            fresh[j * 256 + v] = gmul((uint8_t)v, aj);
    }
    uint8_t* expect = nullptr;
    if (!synd_cache[nsym].compare_exchange_strong(expect, fresh)) {
        free(fresh);
        return expect;
    }
    return fresh;
}

static bool rs_synd(const uint8_t* c, size_t blen, size_t nsym, uint8_t* synd) {
    const uint8_t* tab = synd_table(nsym);
    bool clean = true;
    for (size_t j = 0; j < nsym; j++) {
        uint8_t s = 0;
        if (tab) {
            const uint8_t* mul_aj = tab + j * 256;
            for (size_t i = 0; i < blen; i++) s = mul_aj[s] ^ c[i];
        } else {                             // table alloc failed: log/exp
            uint8_t aj = gpow2((int)j);
            for (size_t i = 0; i < blen; i++) s = gmul(s, aj) ^ c[i];
        }
        synd[j] = s;
        if (s) clean = false;
    }
    return clean;
}

// Repair one codeword in place; true if clean/corrected (else caller
// zero-fills, reference ecc.py:22).
static bool rs_decode_one(uint8_t* c, size_t blen, size_t nsym) {
        uint8_t synd[256];
        if (rs_synd(c, blen, nsym, synd)) return true;

        bool fixed = false;
        uint8_t loc[260];
        int deg = bm_locator(synd, (int)nsym, loc);
        if (deg > 0) {
            int err_pos[256];
            int nerr = 0;
            for (size_t i = 0; i < blen && nerr <= deg; i++) {
                uint8_t xinv = gpow2(-(int)(blen - 1 - i));
                uint8_t val = 0;
                for (int j = deg; j >= 0; j--) val = gmul(val, xinv) ^ loc[j];
                if (val == 0) err_pos[nerr++] = (int)i;
            }
            if (nerr == deg) {
                // Forney: omega = synd * loc mod x^nsym (low-first)
                uint8_t omega[256];
                memset(omega, 0, nsym);
                for (size_t i = 0; i < nsym; i++) {
                    if (!synd[i]) continue;
                    for (int j = 0; j <= deg && i + (size_t)j < nsym; j++)
                        omega[i + j] ^= gmul(synd[i], loc[j]);
                }
                bool good = true;
                for (int e = 0; e < nerr && good; e++) {
                    int posi = err_pos[e];
                    uint8_t x = gpow2((int)(blen - 1 - posi));
                    uint8_t xinv = gpow2(-(int)(blen - 1 - posi));
                    uint8_t om = 0;
                    for (int j = (int)nsym - 1; j >= 0; j--)
                        om = gmul(om, xinv) ^ omega[j];
                    uint8_t den = 0;
                    for (int j = 1; j <= deg; j += 2) {
                        uint8_t xp = 1;
                        for (int q = 0; q < j - 1; q++) xp = gmul(xp, xinv);
                        den ^= gmul(loc[j], xp);
                    }
                    if (!den) { good = false; break; }
                    c[posi] ^= gmul(x, gdiv(om, den));
                }
                if (good) {
                    uint8_t s2[256];
                    fixed = rs_synd(c, blen, nsym, s2);
                }
            }
        }
        if (!fixed) memset(c, 0, blen);
        return fixed;
}

// Repairs codewords in place; ok[b]=1 if clean/corrected, 0 if zero-filled.
void frad_rs_decode_blocks(uint8_t* cw, size_t nblocks, size_t blen,
                           size_t nsym, uint8_t* ok) {
    if (nsym == 0) { memset(ok, 1, nblocks); return; }
    if (nsym > 255 || blen < nsym) {  // would index past the [256] statics
        memset(ok, 0, nblocks);
        memset(cw, 0, nblocks * blen);
        return;
    }
    if (!gf_init_done) gf_init();
    for (size_t b = 0; b < nblocks; b++)
        ok[b] = rs_decode_one(cw + b * blen, blen, nsym) ? 1 : 0;
}

// ---------------------------------------------------------------------------
// Host transfer-format converters. The bench host has 2 cores shared with
// the PJRT tunnel daemon, so these memory-bound conversions must be single
// pass (numpy's strided multi-temporary version measured 20+ s on the hi-res
// config where this loop takes < 0.5 s).
// ---------------------------------------------------------------------------

static void run_striped(size_t n, int nthreads, void (*fn)(size_t, size_t, void*),
                        void* ctx) {
    if (nthreads < 1) nthreads = 1;
    if ((size_t)nthreads > 1 && n >= 1u << 16) {
        std::vector<std::thread> ts;
        size_t per = (n + nthreads - 1) / nthreads;
        for (int t = 0; t < nthreads; t++) {
            size_t lo = per * t, hi = lo + per < n ? lo + per : n;
            if (lo >= hi) break;
            ts.emplace_back(fn, lo, hi, ctx);
        }
        for (auto& th : ts) th.join();
    } else {
        fn(0, n, ctx);
    }
}

struct I24Ctx { const uint8_t* raw; double* out; };

static void i24_span(size_t lo, size_t hi, void* vctx) {
    I24Ctx* c = (I24Ctx*)vctx;
    const double scale = 1.0 / (double)(1 << 23);
    const uint8_t* p = c->raw + 3 * lo;
    for (size_t i = lo; i < hi; i++, p += 3) {
        int32_t v = (int32_t)p[0] | ((int32_t)p[1] << 8) | ((int32_t)p[2] << 16);
        v = (v ^ 0x800000) - 0x800000;   // sign-extend 24 -> 32
        c->out[i] = (double)v * scale;
    }
}

// Packed little-endian int24 triples -> f64 in [-1, 1) (x / 2^23).
void frad_i24_to_f64(const uint8_t* raw, size_t nsamples, double* out,
                     int nthreads) {
    I24Ctx ctx = {raw, out};
    run_striped(nsamples, nthreads, i24_span, &ctx);
}

struct I16Ctx { const int16_t* in; double* out; double scale; };

static void i16_span(size_t lo, size_t hi, void* vctx) {
    I16Ctx* c = (I16Ctx*)vctx;
    for (size_t i = lo; i < hi; i++) c->out[i] = (double)c->in[i] * c->scale;
}

// int16 -> f64 * scale (P1's i16 PCM transfer format, scale = 1/32768).
void frad_i16_to_f64(const int16_t* in, size_t n, double scale, double* out,
                     int nthreads) {
    I16Ctx ctx = {in, out, scale};
    run_striped(n, nthreads, i16_span, &ctx);
}

struct F64I24Ctx { const double* in; uint8_t* out; };

static void f64_i24_span(size_t lo, size_t hi, void* vctx) {
    F64I24Ctx* c = (F64I24Ctx*)vctx;
    const double scale = (double)(1 << 23);
    uint8_t* p = c->out + 3 * lo;
    for (size_t i = lo; i < hi; i++, p += 3) {
        long long v = llrint(c->in[i] * scale);   // nearest-even, like np.rint
        if (v > 0x7FFFFF) v = 0x7FFFFF;
        if (v < -0x800000) v = -0x800000;
        uint32_t u = (uint32_t)v & 0xFFFFFF;
        p[0] = (uint8_t)(u & 0xFF);
        p[1] = (uint8_t)((u >> 8) & 0xFF);
        p[2] = (uint8_t)(u >> 16);
    }
}

// f64 PCM in [-1, 1) -> packed little-endian int24 triples (x * 2^23).
// Inverse of frad_i24_to_f64; the encode-upload transfer format.
void frad_f64_to_i24(const double* in, size_t nsamples, uint8_t* out,
                     int nthreads) {
    F64I24Ctx ctx = {in, out};
    run_striped(nsamples, nthreads, f64_i24_span, &ctx);
}

struct F64I16Ctx { const double* in; int16_t* out; double scale; };

static void f64_i16_span(size_t lo, size_t hi, void* vctx) {
    F64I16Ctx* c = (F64I16Ctx*)vctx;
    for (size_t i = lo; i < hi; i++) {
        long long v = llrint(c->in[i] * c->scale);
        if (v > 32767) v = 32767;
        if (v < -32768) v = -32768;
        c->out[i] = (int16_t)v;
    }
}

// f64 PCM -> int16 * scale (P1's i16 upload format, scale = 32768).
void frad_f64_to_i16(const double* in, size_t n, double scale, int16_t* out,
                     int nthreads) {
    F64I16Ctx ctx = {in, out, scale};
    run_striped(n, nthreads, f64_i16_span, &ctx);
}

// ---------------------------------------------------------------------------
// Batched lossy-profile payload unpack: raw-inflate + EGR decode + untrim,
// one pass per frame, C++ threads. Replaces the per-frame Python chain
// (zlib.decompress -> egr_decode -> astype -> np.pad -> np.stack) that
// contends with the PJRT tunnel for the host's 2 cores.
// Wire format (reference profile1.py:43-50 / profile2.py:48-54):
//   P1: DEFLATE( [u32be thres_len][thres EGR][freqs EGR] )
//   P2: DEFLATE( [u16be lpc_len][lpc EGR][u32be thres_len][thres EGR][freqs] )
// ---------------------------------------------------------------------------

// EGR decode writing at most `cap` symbols as f32 (decoding stops at cap —
// callers never read past the untrimmed fsize*channels). Mirrors
// frad_egr_decode above.
static size_t egr_decode_f32(const uint8_t* bytes, size_t nbytes, float* out,
                             size_t cap) {
    if (nbytes < 1 || cap == 0) return 0;
    const int k = bytes[0];
    const uint8_t* p = bytes + 1;
    const size_t n = nbytes - 1;
    size_t byte_pos = 0;
    uint64_t acc = 0;
    int acc_bits = 0;
    size_t count = 0;
    const int64_t base = (int64_t)(1ull << k);

    for (;;) {
        while (acc_bits <= 56 && byte_pos < n) {
            acc = (acc << 8) | p[byte_pos++];
            acc_bits += 8;
        }
        if (acc_bits == 0) break;

        uint64_t m = 0;
        while (acc == 0) {
            m += (uint64_t)acc_bits;
            acc_bits = 0;
            if (byte_pos >= n) return count;
            while (acc_bits <= 56 && byte_pos < n) {
                acc = (acc << 8) | p[byte_pos++];
                acc_bits += 8;
            }
            if (acc_bits == 0) return count;
        }
        int lead = acc_bits - bit_width_u64(acc);
        m += (uint64_t)lead;
        acc_bits -= lead;

        uint64_t need = m + (uint64_t)k + 1;
        uint64_t v;
        if (need <= 57) {
            while ((uint64_t)acc_bits < need && byte_pos < n) {
                acc = (acc << 8) | p[byte_pos++];
                acc_bits += 8;
            }
            uint64_t take = need < (uint64_t)acc_bits ? need : (uint64_t)acc_bits;
            v = (acc >> (acc_bits - (int)take)) & ((take == 64) ? ~0ull : ((1ull << take) - 1));
            acc_bits -= (int)take;
            acc &= (acc_bits == 64) ? ~0ull : ((1ull << acc_bits) - 1);
        } else {
            v = 0;
            uint64_t got = 0;
            while (got < need) {
                if (acc_bits == 0) {
                    if (byte_pos >= n) break;
                    acc = p[byte_pos++];
                    acc_bits = 8;
                }
                v = (v << 1) | ((acc >> (acc_bits - 1)) & 1);
                acc_bits--;
                acc &= (1ull << acc_bits) - 1;
                got++;
            }
        }
        int64_t nval = (int64_t)v - base;
        int64_t sym = (nval & 1) ? ((nval + 1) >> 1) : -(nval >> 1);
        out[count++] = (float)sym;
        if (count >= cap) return count;
    }
    return count;
}

// Raw (wbits=-15) inflate into a growable buffer. Mirrors Python
// zlib.decompress: any error or missing stream end -> false.
static bool raw_inflate(const uint8_t* src, size_t n, std::vector<uint8_t>& dst) {
    z_stream zs;
    memset(&zs, 0, sizeof zs);
    if (inflateInit2(&zs, -15) != Z_OK) return false;
    size_t capgr = n * 4 + 1024;
    dst.resize(capgr);
    zs.next_in = const_cast<Bytef*>(src);
    zs.avail_in = (uInt)n;
    int ret;
    for (;;) {
        if (zs.total_out == dst.size()) dst.resize(dst.size() * 2);
        zs.next_out = dst.data() + zs.total_out;
        zs.avail_out = (uInt)(dst.size() - zs.total_out);
        ret = inflate(&zs, Z_FINISH);
        if (ret == Z_STREAM_END) break;
        if (ret == Z_BUF_ERROR && zs.avail_out == 0) continue;  // grow
        inflateEnd(&zs);
        return false;                       // corrupt or truncated
    }
    dst.resize(zs.total_out);
    inflateEnd(&zs);
    return true;
}

struct P1Ctx {
    const uint8_t* payloads;
    const int64_t* offsets;
    int64_t nframes, fq_len, tq_len, lq_len;
    float *fq, *tq, *lq;
    uint8_t* ok;
    std::atomic<int64_t>* next;
};

static void p1_unpack_worker(P1Ctx* c) {
    std::vector<uint8_t> buf;
    for (;;) {
        int64_t i = c->next->fetch_add(1);
        if (i >= c->nframes) return;
        float* fqr = c->fq + i * c->fq_len;
        float* tqr = c->tq + i * c->tq_len;
        float* lqr = c->lq_len ? c->lq + i * c->lq_len : nullptr;
        memset(fqr, 0, sizeof(float) * c->fq_len);
        memset(tqr, 0, sizeof(float) * c->tq_len);
        if (lqr) memset(lqr, 0, sizeof(float) * c->lq_len);
        c->ok[i] = 0;

        const uint8_t* src = c->payloads + c->offsets[i];
        size_t len = (size_t)(c->offsets[i + 1] - c->offsets[i]);
        if (!raw_inflate(src, len, buf)) continue;
        const uint8_t* q = buf.data();
        size_t m = buf.size(), off = 0;

        const uint8_t* lq_src = nullptr;     // decode deferred until the
        size_t lq_src_len = 0;               // whole layout validates, so
        if (c->lq_len) {                     // early-continue paths leave
            // P2: [u16be lpc_len][lpc]      // lqr at its zero contract
            if (m < 6) continue;             // reference profile2.py:47-48
            size_t ll = ((size_t)q[0] << 8) | q[1];
            off = 2;
            if (ll > m - off) ll = m - off;  // short slice, like Python's
            lq_src = q + off;
            lq_src_len = ll;
            off += ll;
        }
        if (m - off < 4) continue;           // reference profile1.py layout
        if (lq_src) egr_decode_f32(lq_src, lq_src_len, lqr, (size_t)c->lq_len);
        size_t tl = ((size_t)q[off] << 24) | ((size_t)q[off + 1] << 16)
                  | ((size_t)q[off + 2] << 8) | q[off + 3];
        off += 4;
        if (tl > m - off) tl = m - off;
        egr_decode_f32(q + off, tl, tqr, (size_t)c->tq_len);
        off += tl;
        egr_decode_f32(q + off, m - off, fqr, (size_t)c->fq_len);
        c->ok[i] = 1;
    }
}

// Unpack `nframes` DEFLATEd lossy payloads into zero-padded f32 rows:
// fq [nframes, fq_len], tq [nframes, tq_len], lq [nframes, lq_len]
// (lq_len == 0 -> profile-1 layout, lq may be null). ok[i] = 1 when the
// frame inflated cleanly, else the rows stay zero (decoder's zero-frame
// path, reference profile1.py:59-64).
void frad_p1_unpack_batch(const uint8_t* payloads, const int64_t* offsets,
                          int64_t nframes, int64_t fq_len, int64_t tq_len,
                          int64_t lq_len, float* fq, float* tq, float* lq,
                          uint8_t* ok, int nthreads) {
    std::atomic<int64_t> next(0);
    P1Ctx ctx = {payloads, offsets, nframes, fq_len, tq_len, lq_len,
                 fq, tq, lq, ok, &next};
    if (nthreads < 1) nthreads = 1;
    if (nthreads == 1 || nframes < 8) {
        p1_unpack_worker(&ctx);
        return;
    }
    std::vector<std::thread> ts;
    for (int t = 0; t < nthreads; t++) ts.emplace_back(p1_unpack_worker, &ctx);
    for (auto& th : ts) th.join();
}

// ---------------------------------------------------------------------------
// Batched lossy-profile payload ASSEMBLY (the encode-side mirror of
// frad_p1_unpack_batch): per frame, serialise the device-packed EGR
// words, EGR-encode the threshold row, lay out the reference wire format
//   DEFLATE( [u32be thres_len][thres EGR][k byte][freq EGR bytes] )
// (reference profile1.py:43-50) and raw-deflate it — one C++ pass with
// threads instead of B Python (words_to_stream + golomb + zlib) tasks.
// Deflate parameters match CPython's zlib.compress(wbits=-15): default
// level, memLevel 8 — byte-identical output (same zlib).
// ---------------------------------------------------------------------------

struct P1PackCtx {
    const uint32_t* words;        // [B, W] host words (stream = BE bytes)
    const int64_t* nbits;         // [B] total stream bits
    const int64_t* ks;            // [B] EGR k parameter
    const uint8_t* skip;          // [B] 1 -> overflow frame, host fallback
    int64_t nframes, wlen, tlen;
    const int64_t* tq;            // [B, tlen] threshold ints
    uint8_t* out;                 // [B * cap]
    int64_t cap;
    int64_t* out_len;             // [B] payload bytes (0 when skipped/error)
    std::atomic<int64_t>* next;
};

static void p1_pack_worker(P1PackCtx* c) {
    std::vector<uint8_t> frad;
    frad.reserve((size_t)(4 + 17 * c->tlen + 16 + 1 + 4 * c->wlen));
    z_stream zs;
    memset(&zs, 0, sizeof zs);
    bool zinit = deflateInit2(&zs, Z_DEFAULT_COMPRESSION, Z_DEFLATED, -15, 8,
                              Z_DEFAULT_STRATEGY) == Z_OK;
    for (;;) {
        int64_t i = c->next->fetch_add(1);
        if (i >= c->nframes) break;
        c->out_len[i] = 0;
        if (c->skip[i] || !zinit) continue;

        frad.resize(4 + 1 + 17 * (size_t)c->tlen + 8);
        size_t tl = frad_egr_encode(c->tq + i * c->tlen, (size_t)c->tlen,
                                    frad.data() + 4);
        frad[0] = (uint8_t)(tl >> 24); frad[1] = (uint8_t)(tl >> 16);
        frad[2] = (uint8_t)(tl >> 8);  frad[3] = (uint8_t)tl;
        frad.resize(4 + tl);

        // freq stream: k header byte + first ceil(nbits/8) BE word bytes
        frad.push_back((uint8_t)c->ks[i]);
        size_t nb = (size_t)((c->nbits[i] + 7) / 8);
        const uint32_t* w = c->words + i * c->wlen;
        size_t full = nb / 4;
        for (size_t j = 0; j < full; j++) {
            uint32_t v = w[j];
            frad.push_back((uint8_t)(v >> 24)); frad.push_back((uint8_t)(v >> 16));
            frad.push_back((uint8_t)(v >> 8));  frad.push_back((uint8_t)v);
        }
        for (size_t b = full * 4; b < nb; b++)
            frad.push_back((uint8_t)(w[b / 4] >> (24 - 8 * (b % 4))));

        deflateReset(&zs);
        zs.next_in = frad.data();
        zs.avail_in = (uInt)frad.size();
        zs.next_out = c->out + i * c->cap;
        zs.avail_out = (uInt)c->cap;
        if (deflate(&zs, Z_FINISH) == Z_STREAM_END)
            c->out_len[i] = (int64_t)zs.total_out;
        // else: out_len stays 0 -> caller re-packs on the host path
    }
    if (zinit) deflateEnd(&zs);
}

void frad_p1_pack_batch(const uint32_t* words, const int64_t* nbits,
                        const int64_t* ks, const uint8_t* skip,
                        int64_t nframes, int64_t wlen,
                        const int64_t* tq, int64_t tlen,
                        uint8_t* out, int64_t cap, int64_t* out_len,
                        int nthreads) {
    std::atomic<int64_t> next(0);
    P1PackCtx ctx = {words, nbits, ks, skip, nframes, wlen, tlen,
                     tq, out, cap, out_len, &next};
    if (nthreads < 1) nthreads = 1;
    if (nthreads == 1 || nframes < 8) {
        p1_pack_worker(&ctx);
        return;
    }
    std::vector<std::thread> ts;
    for (int t = 0; t < nthreads; t++) ts.emplace_back(p1_pack_worker, &ctx);
    for (auto& th : ts) th.join();
}

// ---------------------------------------------------------------------------
// Batched frame assembly: RS armor + ASFH header + CRC for every frame of
// a batch in one threaded C++ pass, writing the final byte stream directly
// (replaces the per-frame Python ecc.encode + ASFH.write chain, reference
// encoder.py:102-104 / asfh.py:51-73). The caller precomputes output
// offsets (armored sizes are deterministic) so frames can be written
// concurrently into one buffer.
// ---------------------------------------------------------------------------

struct FramePackCtx {
    const uint8_t* payloads;
    const int64_t* offsets;       // [B+1] raw payload offsets
    int64_t nframes;
    const uint8_t* bdis;          // [B] bit-depth index
    const uint32_t* fsizes;       // [B] per-frame sample count
    const uint8_t* fsize_idx;     // [B] CSS frame-size index (compact)
    int profile, is_compact, channels;
    uint32_t srate;
    int srate_idx, overlap_ratio, little_endian;
    int ecc, ecc_dsize, ecc_codesize;
    const uint8_t* gen;           // RS generator poly (precomputed)
    uint8_t* out;
    const int64_t* out_offsets;   // [B+1]
    std::atomic<int64_t>* next;
};

// Armored size of a raw payload (mirrors container/ecc.py::encode).
static inline int64_t armored_len(int64_t rawlen, int dsize, int csize) {
    if (rawlen <= 0 || csize <= 0) return rawlen < 0 ? 0 : rawlen;
    int64_t nfull = rawlen / dsize;
    int64_t rem = rawlen - nfull * dsize;
    return rawlen + (nfull + (rem ? 1 : 0)) * csize;
}

static void frame_pack_worker(FramePackCtx* c) {
    for (;;) {
        int64_t i = c->next->fetch_add(1);
        if (i >= c->nframes) return;
        const uint8_t* raw = c->payloads + c->offsets[i];
        int64_t rawlen = c->offsets[i + 1] - c->offsets[i];
        uint8_t* dst = c->out + c->out_offsets[i];

        bool armor = c->ecc && c->ecc_codesize > 0 && rawlen > 0;
        int64_t alen = armor
            ? armored_len(rawlen, c->ecc_dsize, c->ecc_codesize) : rawlen;
        int hlen = c->is_compact ? (c->ecc ? 16 : 12) : 32;
        int ext = alen >= 0xFFFFFFFFll ? 8 : 0;
        uint8_t* body = dst + hlen + ext;

        if (armor) {
            const int ds = c->ecc_dsize, cs = c->ecc_codesize;
            int64_t nfull = rawlen / ds;
            const uint8_t* src = raw;
            uint8_t* w = body;
            for (int64_t b = 0; b < nfull; b++) {
                memcpy(w, src, ds);
                rs_encode_one(src, ds, cs, c->gen, w + ds);
                src += ds;
                w += ds + cs;
            }
            int64_t rem = rawlen - nfull * ds;
            if (rem) {
                memcpy(w, src, rem);
                rs_encode_one(src, rem, cs, c->gen, w + rem);
            }
        } else if (rawlen > 0) {
            memcpy(body, raw, rawlen);
        }

        // header (reference asfh.py:51-73 wire layout)
        dst[0] = 0xFF; dst[1] = 0xD0; dst[2] = 0xD2; dst[3] = 0x98;
        uint32_t lenfield = ext ? 0xFFFFFFFFu : (uint32_t)alen;
        dst[4] = (uint8_t)(lenfield >> 24); dst[5] = (uint8_t)(lenfield >> 16);
        dst[6] = (uint8_t)(lenfield >> 8);  dst[7] = (uint8_t)lenfield;
        dst[8] = (uint8_t)(((c->profile & 7) << 5) | ((c->ecc ? 1 : 0) << 4)
                           | ((c->little_endian ? 1 : 0) << 3)
                           | (c->bdis[i] & 7));
        if (c->is_compact) {
            uint16_t css = (uint16_t)((((c->channels - 1) & 0x3F) << 10)
                                      | ((c->srate_idx & 0xF) << 6)
                                      | ((c->fsize_idx[i] & 0x1F) << 1));
            dst[9] = (uint8_t)(css >> 8); dst[10] = (uint8_t)css;
            int ov = c->overlap_ratio - 1;
            dst[11] = (uint8_t)(ov > 0 ? ov : 0);
            if (c->ecc) {
                dst[12] = (uint8_t)c->ecc_dsize;
                dst[13] = (uint8_t)c->ecc_codesize;
                uint16_t crc = frad_crc16_ansi(body, (size_t)alen);
                dst[14] = (uint8_t)(crc >> 8); dst[15] = (uint8_t)crc;
            }
        } else {
            dst[9] = (uint8_t)(c->channels - 1);
            dst[10] = (uint8_t)(c->ecc ? c->ecc_dsize : 0);
            dst[11] = (uint8_t)(c->ecc ? c->ecc_codesize : 0);
            dst[12] = (uint8_t)(c->srate >> 24); dst[13] = (uint8_t)(c->srate >> 16);
            dst[14] = (uint8_t)(c->srate >> 8);  dst[15] = (uint8_t)c->srate;
            memset(dst + 16, 0, 8);
            uint32_t fs = c->fsizes[i];
            dst[24] = (uint8_t)(fs >> 24); dst[25] = (uint8_t)(fs >> 16);
            dst[26] = (uint8_t)(fs >> 8);  dst[27] = (uint8_t)fs;
            uint32_t crc = (uint32_t)crc32(0L, body, (uInt)alen);
            dst[28] = (uint8_t)(crc >> 24); dst[29] = (uint8_t)(crc >> 16);
            dst[30] = (uint8_t)(crc >> 8);  dst[31] = (uint8_t)crc;
        }
        if (ext) {
            uint64_t a = (uint64_t)alen;
            for (int b = 0; b < 8; b++)
                dst[hlen + b] = (uint8_t)(a >> (56 - 8 * b));
        }
    }
}

void frad_frame_pack_batch(
        const uint8_t* payloads, const int64_t* offsets, int64_t nframes,
        const uint8_t* bdis, const uint32_t* fsizes, const uint8_t* fsize_idx,
        int profile, int is_compact, int channels, uint32_t srate,
        int srate_idx, int overlap_ratio, int little_endian,
        int ecc, int ecc_dsize, int ecc_codesize,
        uint8_t* out, const int64_t* out_offsets, int nthreads) {
    if (!gf_init_done) gf_init();
    const uint8_t* gen = (ecc && ecc_codesize > 0) ? gen_poly(ecc_codesize)
                                                   : nullptr;
    if (gen) fb_table(ecc_codesize);  // warm before threads
    std::atomic<int64_t> next(0);
    FramePackCtx ctx = {payloads, offsets, nframes, bdis, fsizes, fsize_idx,
                        profile, is_compact, channels, srate, srate_idx,
                        overlap_ratio, little_endian, ecc, ecc_dsize,
                        ecc_codesize, gen, out, out_offsets, &next};
    if (nthreads < 1) nthreads = 1;
    if (nthreads == 1 || nframes < 8) {
        frame_pack_worker(&ctx);
        return;
    }
    std::vector<std::thread> ts;
    for (int t = 0; t < nthreads; t++) ts.emplace_back(frame_pack_worker, &ctx);
    for (auto& th : ts) th.join();
}

// ---------------------------------------------------------------------------
// Batched ECC unarmor: per frame, CRC-verify the armored payload, strip
// parity (clean / no-repair) or RS-correct block-by-block (damaged +
// fix_error), writing raw payloads at caller-computed offsets. Replaces
// the per-frame Python asfh.payload_crc_matches + ecc.decode chain
// (reference decoder.py:63-68, ecc.py:14-25).
// ---------------------------------------------------------------------------

struct UnarmorCtx {
    const uint8_t* payloads;
    const int64_t* offsets;       // [B+1] armored payload offsets
    int64_t nframes;
    int dsize, csize;
    const uint32_t* crcs;         // [B] header CRC values
    int crc_is16, fix_error;
    uint8_t* out;
    const int64_t* out_offsets;   // [B+1] raw payload offsets
    uint8_t* ok;                  // [B] 1 = clean or fully repaired
    std::atomic<int64_t>* next;
};

static void unarmor_worker(UnarmorCtx* c) {
    const int bs = c->dsize + c->csize;
    std::vector<uint8_t> cw(bs);
    for (;;) {
        int64_t i = c->next->fetch_add(1);
        if (i >= c->nframes) return;
        const uint8_t* src = c->payloads + c->offsets[i];
        int64_t plen = c->offsets[i + 1] - c->offsets[i];
        uint8_t* dst = c->out + c->out_offsets[i];

        bool clean = c->crc_is16
            ? frad_crc16_ansi(src, (size_t)plen) == (uint16_t)c->crcs[i]
            : (uint32_t)crc32(0L, src, (uInt)plen) == c->crcs[i];
        bool repair = c->fix_error && !clean;

        int64_t nfull = plen / bs;
        int64_t rem = plen - nfull * bs;
        bool all_ok = true;
        for (int64_t b = 0; b < nfull; b++) {
            const uint8_t* blk = src + b * bs;
            uint8_t* o = dst + b * c->dsize;
            if (repair) {
                memcpy(cw.data(), blk, bs);
                if (!rs_decode_one(cw.data(), bs, c->csize)) all_ok = false;
                memcpy(o, cw.data(), c->dsize);
            } else {
                memcpy(o, blk, c->dsize);
            }
        }
        if (rem) {
            int64_t keep = rem - c->csize;
            if (keep > 0) {
                const uint8_t* blk = src + nfull * bs;
                uint8_t* o = dst + nfull * c->dsize;
                if (repair) {
                    memcpy(cw.data(), blk, rem);
                    if (!rs_decode_one(cw.data(), rem, c->csize)) all_ok = false;
                    memcpy(o, cw.data(), keep);
                } else {
                    memcpy(o, blk, keep);
                }
            }
        }
        c->ok[i] = (clean || (repair && all_ok)) ? 1 : 0;
    }
}

void frad_unarmor_batch(
        const uint8_t* payloads, const int64_t* offsets, int64_t nframes,
        int dsize, int csize, const uint32_t* crcs, int crc_is16,
        int fix_error, uint8_t* out, const int64_t* out_offsets,
        uint8_t* ok, int nthreads) {
    if (!gf_init_done) gf_init();
    if (csize > 0) {                  // warm caches before threads
        gen_poly(csize);
        fb_table(csize);
        synd_table(csize);
    }
    std::atomic<int64_t> next(0);
    UnarmorCtx ctx = {payloads, offsets, nframes, dsize, csize, crcs,
                      crc_is16, fix_error, out, out_offsets, ok, &next};
    if (nthreads < 1) nthreads = 1;
    if (nthreads == 1 || nframes < 8) {
        unarmor_worker(&ctx);
        return;
    }
    std::vector<std::thread> ts;
    for (int t = 0; t < nthreads; t++) ts.emplace_back(unarmor_worker, &ctx);
    for (auto& th : ts) th.join();
}

// ---------------------------------------------------------------------------
// Truncated-float packings for the lossless profiles (threaded, single
// pass). Byte-for-byte identical to ops/packing.pack_floats/unpack_floats
// (reference profile0.py:29-42 trim / :52-66 pad+scrub); the numpy
// versions build strided temporaries that dominate profile-4 encode time.
// Depths: 16/24/32/48/64 (12-bit stays on the numpy nibble path).
// ---------------------------------------------------------------------------

struct PackFloatsCtx {
    const double* in;
    uint8_t* out;
    int bits, little;
};

static void pack_floats_span(size_t lo, size_t hi, void* vctx) {
    PackFloatsCtx* c = (PackFloatsCtx*)vctx;
    const double* in = c->in;
    switch (c->bits) {
    case 16: {
        uint8_t* p = c->out + 2 * lo;
        for (size_t i = lo; i < hi; i++, p += 2) {
            _Float16 h = (_Float16)in[i];
            uint16_t u;
            memcpy(&u, &h, 2);
            if (c->little) { p[0] = (uint8_t)u; p[1] = (uint8_t)(u >> 8); }
            else { p[0] = (uint8_t)(u >> 8); p[1] = (uint8_t)u; }
        }
        break;
    }
    case 24: {
        uint8_t* p = c->out + 3 * lo;
        for (size_t i = lo; i < hi; i++, p += 3) {
            float f = (float)in[i];
            uint32_t u;
            memcpy(&u, &f, 4);
            if (c->little) {            // bytes 1..3 of the LE f32
                p[0] = (uint8_t)(u >> 8); p[1] = (uint8_t)(u >> 16);
                p[2] = (uint8_t)(u >> 24);
            } else {                    // top 3 bytes of the BE f32
                p[0] = (uint8_t)(u >> 24); p[1] = (uint8_t)(u >> 16);
                p[2] = (uint8_t)(u >> 8);
            }
        }
        break;
    }
    case 32: {
        uint8_t* p = c->out + 4 * lo;
        for (size_t i = lo; i < hi; i++, p += 4) {
            float f = (float)in[i];
            uint32_t u;
            memcpy(&u, &f, 4);
            if (c->little) {
                p[0] = (uint8_t)u; p[1] = (uint8_t)(u >> 8);
                p[2] = (uint8_t)(u >> 16); p[3] = (uint8_t)(u >> 24);
            } else {
                p[0] = (uint8_t)(u >> 24); p[1] = (uint8_t)(u >> 16);
                p[2] = (uint8_t)(u >> 8);  p[3] = (uint8_t)u;
            }
        }
        break;
    }
    case 48: {
        uint8_t* p = c->out + 6 * lo;
        for (size_t i = lo; i < hi; i++, p += 6) {
            uint64_t u;
            memcpy(&u, &in[i], 8);
            if (c->little)              // bytes 2..7 of the LE f64
                for (int b = 0; b < 6; b++) p[b] = (uint8_t)(u >> (16 + 8 * b));
            else                        // top 6 bytes of the BE f64
                for (int b = 0; b < 6; b++) p[b] = (uint8_t)(u >> (56 - 8 * b));
        }
        break;
    }
    default: {  // 64
        uint8_t* p = c->out + 8 * lo;
        for (size_t i = lo; i < hi; i++, p += 8) {
            uint64_t u;
            memcpy(&u, &in[i], 8);
            if (c->little)
                for (int b = 0; b < 8; b++) p[b] = (uint8_t)(u >> (8 * b));
            else
                for (int b = 0; b < 8; b++) p[b] = (uint8_t)(u >> (56 - 8 * b));
        }
        break;
    }
    }
}

void frad_pack_floats(const double* in, size_t n, int bits, int little,
                      uint8_t* out, int nthreads) {
    PackFloatsCtx ctx = {in, out, bits, little};
    run_striped(n, nthreads, pack_floats_span, &ctx);
}

// ---------------------------------------------------------------------------
// Per-row max|x| over an [rows, cols] f64 matrix — the lossless profiles'
// bit-depth escalation probe (reference profile0.py:24-26). One striped
// pass instead of numpy's two (max + -min) full-matrix reductions.
// ---------------------------------------------------------------------------

// Fused per-row pack + max|x|: one read of the matrix instead of a
// maxabs pass followed by a pack pass (profile 4's encode is nothing but
// these two passes, so the second read shows directly on the clock).
// The caller verifies afterwards that no row escaped the container range
// (bit-depth escalation, reference profile0.py:24-26) and re-packs the
// rare escalated batch on the split path.
struct PackMaxCtx {
    const double* in;
    uint8_t* out;
    double* maxabs;
    size_t cols;
    int bits, little;
};

static void pack_max_span(size_t lo, size_t hi, void* vctx) {
    PackMaxCtx* c = (PackMaxCtx*)vctx;
    size_t bpv = (size_t)c->bits / 8;          // bytes per stored value
    for (size_t r = lo; r < hi; r++) {
        const double* p = c->in + r * c->cols;
        double m = 0.0;
        for (size_t j = 0; j < c->cols; j++) {
            double a = std::fabs(p[j]);
            if (a > m) m = a;
        }
        c->maxabs[r] = m;
        frad_pack_floats(p, c->cols, c->bits, c->little,
                         c->out + r * c->cols * bpv, 1);
    }
}

void frad_pack_floats_maxabs(const double* in, size_t rows, size_t cols,
                             int bits, int little, uint8_t* out,
                             double* maxabs, int nthreads) {
    PackMaxCtx ctx = {in, out, maxabs, cols, bits, little};
    if (rows * cols < (size_t)1 << 16) nthreads = 1;
    if (nthreads < 1) nthreads = 1;
    if (nthreads == 1 || rows < (size_t)nthreads) {
        pack_max_span(0, rows, &ctx);
        return;
    }
    std::vector<std::thread> ts;
    size_t per = (rows + nthreads - 1) / nthreads;
    for (int t = 0; t < nthreads; t++) {
        size_t lo = per * t, hi = lo + per < rows ? lo + per : rows;
        if (lo >= hi) break;
        ts.emplace_back(pack_max_span, lo, hi, &ctx);
    }
    for (auto& th : ts) th.join();
}

struct MaxAbsCtx { const double* in; double* out; size_t cols; };

static void maxabs_span(size_t lo, size_t hi, void* vctx) {
    MaxAbsCtx* c = (MaxAbsCtx*)vctx;
    for (size_t r = lo; r < hi; r++) {
        const double* p = c->in + r * c->cols;
        double m = 0.0;
        for (size_t j = 0; j < c->cols; j++) {
            double a = std::fabs(p[j]);
            if (a > m) m = a;
        }
        c->out[r] = m;
    }
}

void frad_maxabs_rows(const double* in, size_t rows, size_t cols,
                      double* out, int nthreads) {
    MaxAbsCtx ctx = {in, out, cols};
    // run_striped's element gate is sized for flat arrays; the work here
    // is rows*cols, so thread whenever the matrix (not the row count) is
    // large enough to amortise the spawn
    if (rows * cols < (size_t)1 << 16) nthreads = 1;
    if (nthreads < 1) nthreads = 1;
    if (nthreads == 1 || rows < (size_t)nthreads) {
        maxabs_span(0, rows, &ctx);
        return;
    }
    std::vector<std::thread> ts;
    size_t per = (rows + nthreads - 1) / nthreads;
    for (int t = 0; t < nthreads; t++) {
        size_t lo = per * t, hi = lo + per < rows ? lo + per : rows;
        if (lo >= hi) break;
        ts.emplace_back(maxabs_span, lo, hi, &ctx);
    }
    for (auto& th : ts) th.join();
}

struct UnpackFloatsCtx {
    const uint8_t* in;
    double* out;
    int bits, little;
};

static inline double scrub(double v) { return std::isfinite(v) ? v : 0.0; }

static void unpack_floats_span(size_t lo, size_t hi, void* vctx) {
    UnpackFloatsCtx* c = (UnpackFloatsCtx*)vctx;
    switch (c->bits) {
    case 16: {
        const uint8_t* p = c->in + 2 * lo;
        for (size_t i = lo; i < hi; i++, p += 2) {
            uint16_t u = c->little ? (uint16_t)(p[0] | (p[1] << 8))
                                   : (uint16_t)((p[0] << 8) | p[1]);
            _Float16 h;
            memcpy(&h, &u, 2);
            c->out[i] = scrub((double)h);
        }
        break;
    }
    case 24: {
        const uint8_t* p = c->in + 3 * lo;
        for (size_t i = lo; i < hi; i++, p += 3) {
            uint32_t u = c->little
                ? ((uint32_t)p[0] << 8) | ((uint32_t)p[1] << 16) | ((uint32_t)p[2] << 24)
                : ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) | ((uint32_t)p[2] << 8);
            float f;
            memcpy(&f, &u, 4);
            c->out[i] = scrub((double)f);
        }
        break;
    }
    case 32: {
        const uint8_t* p = c->in + 4 * lo;
        for (size_t i = lo; i < hi; i++, p += 4) {
            uint32_t u = c->little
                ? (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) | ((uint32_t)p[3] << 24)
                : ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) | ((uint32_t)p[2] << 8) | (uint32_t)p[3];
            float f;
            memcpy(&f, &u, 4);
            c->out[i] = scrub((double)f);
        }
        break;
    }
    case 48: {
        const uint8_t* p = c->in + 6 * lo;
        for (size_t i = lo; i < hi; i++, p += 6) {
            uint64_t u = 0;
            if (c->little)
                for (int b = 0; b < 6; b++) u |= (uint64_t)p[b] << (16 + 8 * b);
            else
                for (int b = 0; b < 6; b++) u |= (uint64_t)p[b] << (56 - 8 * b);
            double d;
            memcpy(&d, &u, 8);
            c->out[i] = scrub(d);
        }
        break;
    }
    default: {  // 64
        const uint8_t* p = c->in + 8 * lo;
        for (size_t i = lo; i < hi; i++, p += 8) {
            uint64_t u = 0;
            if (c->little)
                for (int b = 0; b < 8; b++) u |= (uint64_t)p[b] << (8 * b);
            else
                for (int b = 0; b < 8; b++) u |= (uint64_t)p[b] << (56 - 8 * b);
            double d;
            memcpy(&d, &u, 8);
            c->out[i] = scrub(d);
        }
        break;
    }
    }
}

void frad_unpack_floats(const uint8_t* in, size_t n, int bits, int little,
                        double* out, int nthreads) {
    UnpackFloatsCtx ctx = {in, out, bits, little};
    run_striped(n, nthreads, unpack_floats_span, &ctx);
}

// ---------------------------------------------------------------------------
// Batched ASFH frame scan — the decoder's structural hot loop.
// Replicates container/asfh.py read() + pipeline._parse_frames exactly
// (PFB/CSS layouts: reference tools/asfh.py:6-32; incremental parse:
// reference tools/asfh.py:89-134). Per-frame Python parsing costs
// ~5 us/frame; this scan is ~50 ns/frame.
// ---------------------------------------------------------------------------

static const uint32_t css_srates[12] = {96000, 88200, 64000, 48000, 44100,
                                        32000, 24000, 22050, 16000, 12000,
                                        11025, 8000};

static inline uint32_t be32(const uint8_t* p) {
    return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16)
         | ((uint32_t)p[2] << 8) | p[3];
}

// returns #frames parsed; *tail_pos = offset where the (possibly empty)
// unparsed tail begins, or -1 for "no tail" (scan consumed everything
// after the last frame and found no further sign), or -2 on a CSS srate
// index the Python tables would throw for (caller raises IndexError).
int64_t frad_frame_parse_batch(
        const uint8_t* s, int64_t n, int64_t cap,
        int64_t* pay_off, int64_t* pay_len, uint8_t* is_ff,
        uint8_t* pfbs, uint16_t* chans, uint32_t* srates, uint32_t* fsizes,
        uint8_t* olaps, uint8_t* eccds, uint8_t* ecccs, uint32_t* crcs,
        int32_t* hdrlens, int64_t* tail_pos) {
    static const uint8_t SIGN[4] = {0xff, 0xd0, 0xd2, 0x98};
    int64_t pos = 0, cnt = 0;
    *tail_pos = -1;
    while (cnt < cap) {
        const uint8_t* hit = (pos + 4 <= n)
            ? (const uint8_t*)memmem(s + pos, (size_t)(n - pos), SIGN, 4)
            : nullptr;
        if (!hit) return cnt;                    // no further sign: no tail
        int64_t idx = hit - s;
        if (idx + 9 > n) { *tail_pos = idx; return cnt; }
        uint64_t frmbytes = be32(s + idx + 4);
        uint8_t pfb = s[idx + 8];
        int profile = pfb >> 5;
        bool ecc = (pfb >> 4) & 1;
        int64_t hdr;
        uint16_t ch = 0; uint32_t sr = 0, fs = 0, crc = 0;
        uint8_t ol = 0, ed = 0, ec = 0, ff = 0;
        if (profile == 1 || profile == 2) {      // compact
            if (idx + 12 > n) { *tail_pos = idx; return cnt; }
            uint16_t css = ((uint16_t)s[idx + 9] << 8) | s[idx + 10];
            ch = (css >> 10) + 1;
            int sri = (css >> 6) & 0xf;
            if (sri >= 12) { *tail_pos = -2; return cnt; }
            sr = css_srates[sri];
            int fsi = (css >> 1) & 0x1f;
            static const int bases[4] = {128, 160, 192, 224};
            fs = (uint32_t)bases[fsi & 3] << (fsi >> 2);
            if (css & 1) {                       // force-flush terminator
                ff = 1; hdr = 12;
                pay_off[cnt] = idx + hdr; pay_len[cnt] = 0;
                goto record;
            }
            ol = s[idx + 11];
            if (ol) ol += 1;
            if (ecc) {
                if (idx + 16 > n) { *tail_pos = idx; return cnt; }
                ed = s[idx + 12]; ec = s[idx + 13];
                crc = ((uint32_t)s[idx + 14] << 8) | s[idx + 15];
                hdr = 16;
            } else hdr = 12;
        } else {                                 // lossless 32-byte header
            if (idx + 32 > n) { *tail_pos = idx; return cnt; }
            ch = s[idx + 9] + 1;
            ed = s[idx + 10]; ec = s[idx + 11];
            sr = be32(s + idx + 12);
            fs = be32(s + idx + 24);
            crc = be32(s + idx + 28);
            hdr = 32;
        }
        if (frmbytes == 0xffffffffull) {         // u64 length escape
            if (idx + hdr + 8 > n) { *tail_pos = idx; return cnt; }
            frmbytes = 0;
            for (int b = 0; b < 8; b++)
                frmbytes = (frmbytes << 8) | s[idx + hdr + b];
            hdr += 8;
        }
        if (idx + hdr + (int64_t)frmbytes > n) { *tail_pos = idx; return cnt; }
        pay_off[cnt] = idx + hdr;
        pay_len[cnt] = (int64_t)frmbytes;
    record:
        is_ff[cnt] = ff;
        pfbs[cnt] = pfb;
        chans[cnt] = ch; srates[cnt] = sr; fsizes[cnt] = fs;
        olaps[cnt] = ol; eccds[cnt] = ed; ecccs[cnt] = ec; crcs[cnt] = crc;
        hdrlens[cnt] = (int32_t)hdr;
        pos = ff ? idx + hdr : idx + hdr + (int64_t)frmbytes;
        cnt++;
    }
    return cnt;
}

} // extern "C"
