// BN254 G1 host runtime: base-field Montgomery arithmetic, Jacobian group
// ops, Pippenger MSM, fixed-base batch scalar-mul, and Keccak-256.
//
// This is the native-runtime analog of what the Go reference outsources to
// gnark-crypto (Go + x86-64 assembly Montgomery mul; used from
// prover/gadget/{hints,setup,prove,verify}.go for the GKR io commitment
// MSMs and Keccak randomness derivation). The TPU framework keeps the GKR
// prover itself on-device; this library serves the once-per-proof
// host-side commitment path, where pure Python (gadget/bn254_g1.py, the
// fallback) is ~10^3x too slow at 2^20-hash batches.
//
// ABI: every field element / coordinate crosses the boundary as 4 x uint64
// little-endian limbs in PLAIN (non-Montgomery) representation; points are
// Jacobian (X, Y, Z), 12 limbs, Z==0 encoding infinity. Scalars are 4
// limbs, caller-reduced mod r. Conversion to/from Montgomery form happens
// inside the library.
//
// Build: g++ -O3 -shared -fPIC (see gkr_mimc_tpu/native/__init__.py).

#include <cstdint>
#include <cstring>
#include <vector>
#include <thread>

typedef unsigned __int128 u128;

// ---------------------------------------------------------------------------
// Fp: base field, 4x64 Montgomery
// ---------------------------------------------------------------------------

struct Fp { uint64_t l[4]; };

static const Fp P      = {{0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL,
                           0xb85045b68181585dULL, 0x30644e72e131a029ULL}};
static const Fp R2     = {{0xf32cfc5b538afa89ULL, 0xb5e71911d44501fbULL,
                           0x47ab1eff0a417ff6ULL, 0x06d89f71cab8351fULL}};
static const Fp ONE_M  = {{0xd35d438dc58f0d9dULL, 0x0a78eb28f5c70b3dULL,
                           0x666ea36f7879462cULL, 0x0e0a77c19a07df2fULL}}; // R mod P
static const uint64_t PINV = 0x87d20782e4866389ULL; // -P^-1 mod 2^64

static inline bool fp_is_zero(const Fp &a) {
    return (a.l[0] | a.l[1] | a.l[2] | a.l[3]) == 0;
}

static inline bool fp_geq_p(const Fp &a) {
    for (int i = 3; i >= 0; --i) {
        if (a.l[i] > P.l[i]) return true;
        if (a.l[i] < P.l[i]) return false;
    }
    return true; // equal
}

static inline void fp_sub_p(Fp &a) {
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a.l[i] - P.l[i] - borrow;
        a.l[i] = (uint64_t)d;
        borrow = (d >> 64) & 1;
    }
}

static inline Fp fp_add(const Fp &a, const Fp &b) {
    Fp r;
    u128 carry = 0;
    for (int i = 0; i < 4; ++i) {
        u128 s = (u128)a.l[i] + b.l[i] + carry;
        r.l[i] = (uint64_t)s;
        carry = s >> 64;
    }
    if (carry || fp_geq_p(r)) fp_sub_p(r);
    return r;
}

static inline Fp fp_sub(const Fp &a, const Fp &b) {
    Fp r;
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a.l[i] - b.l[i] - borrow;
        r.l[i] = (uint64_t)d;
        borrow = (d >> 64) & 1;
    }
    if (borrow) { // add P back
        u128 carry = 0;
        for (int i = 0; i < 4; ++i) {
            u128 s = (u128)r.l[i] + P.l[i] + carry;
            r.l[i] = (uint64_t)s;
            carry = s >> 64;
        }
    }
    return r;
}

// CIOS Montgomery multiplication, 4 limbs.
static inline Fp fp_mul(const Fp &a, const Fp &b) {
    uint64_t t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; ++i) {
        u128 carry = 0;
        for (int j = 0; j < 4; ++j) {
            u128 s = (u128)a.l[j] * b.l[i] + t[j] + carry;
            t[j] = (uint64_t)s;
            carry = s >> 64;
        }
        u128 s = (u128)t[4] + carry;
        t[4] = (uint64_t)s;
        t[5] = (uint64_t)(s >> 64);

        uint64_t m = t[0] * PINV;
        carry = ((u128)m * P.l[0] + t[0]) >> 64;
        for (int j = 1; j < 4; ++j) {
            u128 s2 = (u128)m * P.l[j] + t[j] + carry;
            t[j - 1] = (uint64_t)s2;
            carry = s2 >> 64;
        }
        u128 s3 = (u128)t[4] + carry;
        t[3] = (uint64_t)s3;
        t[4] = t[5] + (uint64_t)(s3 >> 64);
    }
    Fp r = {{t[0], t[1], t[2], t[3]}};
    if (t[4] || fp_geq_p(r)) fp_sub_p(r);
    return r;
}

static inline Fp fp_sqr(const Fp &a) { return fp_mul(a, a); }

static inline Fp fp_dbl(const Fp &a) { return fp_add(a, a); }

static inline Fp fp_to_mont(const Fp &a) { return fp_mul(a, R2); }

static inline Fp fp_from_mont(const Fp &a) {
    Fp one = {{1, 0, 0, 0}};
    return fp_mul(a, one);
}

// ---------------------------------------------------------------------------
// G1: y^2 = x^3 + 3, Jacobian coordinates over Fp (Montgomery form)
// ---------------------------------------------------------------------------

struct G1 { Fp x, y, z; };

static inline bool g1_is_inf(const G1 &p) { return fp_is_zero(p.z); }

static inline void g1_set_inf(G1 &p) {
    std::memset(&p, 0, sizeof(G1));
    p.y = ONE_M;
}

// dbl-2009-l
static void g1_double(G1 &r, const G1 &p) {
    if (g1_is_inf(p) || fp_is_zero(p.y)) { g1_set_inf(r); return; }
    Fp a = fp_sqr(p.x);
    Fp b = fp_sqr(p.y);
    Fp c = fp_sqr(b);
    Fp t = fp_add(p.x, b);
    Fp d = fp_dbl(fp_sub(fp_sqr(t), fp_add(a, c)));
    Fp e = fp_add(fp_dbl(a), a);
    Fp f = fp_sqr(e);
    Fp x3 = fp_sub(f, fp_dbl(d));
    Fp c8 = fp_dbl(fp_dbl(fp_dbl(c)));
    Fp y3 = fp_sub(fp_mul(e, fp_sub(d, x3)), c8);
    Fp z3 = fp_dbl(fp_mul(p.y, p.z));
    r.x = x3; r.y = y3; r.z = z3;
}

// add-2007-bl
static void g1_add(G1 &r, const G1 &p, const G1 &q) {
    if (g1_is_inf(p)) { r = q; return; }
    if (g1_is_inf(q)) { r = p; return; }
    Fp z1z1 = fp_sqr(p.z);
    Fp z2z2 = fp_sqr(q.z);
    Fp u1 = fp_mul(p.x, z2z2);
    Fp u2 = fp_mul(q.x, z1z1);
    Fp s1 = fp_mul(fp_mul(p.y, z2z2), q.z);
    Fp s2 = fp_mul(fp_mul(q.y, z1z1), p.z);
    Fp h = fp_sub(u2, u1);
    if (fp_is_zero(h)) {
        if (std::memcmp(&s1, &s2, sizeof(Fp)) != 0) { g1_set_inf(r); return; }
        g1_double(r, p);
        return;
    }
    Fp i = fp_sqr(fp_dbl(h));
    Fp j = fp_mul(h, i);
    Fp rr = fp_dbl(fp_sub(s2, s1));
    Fp v = fp_mul(u1, i);
    Fp x3 = fp_sub(fp_sub(fp_sqr(rr), j), fp_dbl(v));
    Fp y3 = fp_sub(fp_mul(rr, fp_sub(v, x3)), fp_dbl(fp_mul(s1, j)));
    Fp zs = fp_add(p.z, q.z);
    Fp z3 = fp_mul(fp_sub(fp_sub(fp_sqr(zs), z1z1), z2z2), h);
    r.x = x3; r.y = y3; r.z = z3;
}

// ---------------------------------------------------------------------------
// ABI conversion
// ---------------------------------------------------------------------------

static G1 g1_load(const uint64_t *limbs) {
    G1 p;
    Fp x, y, z;
    std::memcpy(x.l, limbs, 32);
    std::memcpy(y.l, limbs + 4, 32);
    std::memcpy(z.l, limbs + 8, 32);
    p.x = fp_to_mont(x);
    p.y = fp_to_mont(y);
    p.z = fp_to_mont(z);
    return p;
}

static void g1_store(uint64_t *limbs, const G1 &p) {
    Fp x = fp_from_mont(p.x), y = fp_from_mont(p.y), z = fp_from_mont(p.z);
    std::memcpy(limbs, x.l, 32);
    std::memcpy(limbs + 4, y.l, 32);
    std::memcpy(limbs + 8, z.l, 32);
}

static inline int scalar_window(const uint64_t *s, int shift, int c) {
    // bits [shift, shift+c) of a 256-bit little-endian scalar
    int limb = shift >> 6, off = shift & 63;
    uint64_t v = s[limb] >> off;
    if (off + c > 64 && limb + 1 < 4) v |= s[limb + 1] << (64 - off);
    return (int)(v & ((1ULL << c) - 1));
}

// ---------------------------------------------------------------------------
// Exports
// ---------------------------------------------------------------------------

extern "C" {

// out(12) = sum_i scalars(4*i..) * points(12*i..)   [Pippenger]
void gkr_g1_msm(const uint64_t *points, const uint64_t *scalars,
                uint64_t n, uint64_t *out) {
    G1 total;
    g1_set_inf(total);
    if (n == 0) { g1_store(out, total); return; }

    std::vector<G1> pts(n);
    for (uint64_t i = 0; i < n; ++i) pts[i] = g1_load(points + 12 * i);

    int c;
    {   // window bits ~ log2(n), clamped (same heuristic as the fallback)
        int bl = 0;
        for (uint64_t t = n; t; t >>= 1) ++bl;
        c = bl < 2 ? 2 : (bl > 16 ? 16 : bl);
    }
    const int nbits = 254;
    const int nwin = (nbits + c - 1) / c;

    // each window's bucket reduction is independent: parallelize, then do
    // the sequential double-and-add combine over per-window sums.
    std::vector<G1> winsum(nwin);
    unsigned nthreads = std::thread::hardware_concurrency();
    if (nthreads == 0) nthreads = 1;
    if (nthreads > (unsigned)nwin) nthreads = (unsigned)nwin;

    auto do_windows = [&](int begin, int end) {
        std::vector<G1> buckets((size_t)1 << c);
        for (int w = begin; w < end; ++w) {
            for (auto &b : buckets) g1_set_inf(b);
            int shift = w * c;
            for (uint64_t i = 0; i < n; ++i) {
                int idx = scalar_window(scalars + 4 * i, shift, c);
                if (idx) g1_add(buckets[idx - 1], buckets[idx - 1], pts[i]);
            }
            G1 run, acc;
            g1_set_inf(run);
            g1_set_inf(acc);
            for (int b = (1 << c) - 2; b >= 0; --b) {
                g1_add(run, run, buckets[b]);
                g1_add(acc, acc, run);
            }
            winsum[w] = acc;
        }
    };

    if (nthreads <= 1) {
        do_windows(0, nwin);
    } else {
        std::vector<std::thread> th;
        int per = (nwin + nthreads - 1) / nthreads;
        for (unsigned t = 0; t < nthreads; ++t) {
            int b = t * per, e = b + per > nwin ? nwin : b + per;
            if (b < e) th.emplace_back(do_windows, b, e);
        }
        for (auto &t : th) t.join();
    }

    for (int w = nwin - 1; w >= 0; --w) {
        if (!g1_is_inf(total))
            for (int k = 0; k < c; ++k) g1_double(total, total);
        g1_add(total, total, winsum[w]);
    }
    g1_store(out, total);
}

// out(12*i..) = scalars(4*i..) * base(12)   [fixed-base, 8-bit windows]
void gkr_g1_batch_scalar_mul(const uint64_t *base, const uint64_t *scalars,
                             uint64_t n, uint64_t *out) {
    const int c = 8, nwin = 32, tbl = (1 << c) - 1;
    G1 b = g1_load(base);

    // table[w][j-1] = j * 2^(8w) * base
    std::vector<G1> table((size_t)nwin * tbl);
    for (int w = 0; w < nwin; ++w) {
        G1 run = b;
        for (int j = 1; j <= tbl; ++j) {
            table[(size_t)w * tbl + (j - 1)] = run;
            if (j < tbl) g1_add(run, run, b);
        }
        if (w + 1 < nwin) {
            g1_add(b, run, b); // run == 255*b, so b <- 256*b
        }
    }

    unsigned nthreads = std::thread::hardware_concurrency();
    if (nthreads == 0) nthreads = 1;
    auto worker = [&](uint64_t begin, uint64_t end) {
        for (uint64_t i = begin; i < end; ++i) {
            G1 acc;
            g1_set_inf(acc);
            const uint64_t *s = scalars + 4 * i;
            for (int w = 0; w < nwin; ++w) {
                int idx = scalar_window(s, w * c, c);
                if (idx) g1_add(acc, acc, table[(size_t)w * tbl + (idx - 1)]);
            }
            g1_store(out + 12 * i, acc);
        }
    };
    if (nthreads <= 1 || n < 64) {
        worker(0, n);
    } else {
        std::vector<std::thread> th;
        uint64_t per = (n + nthreads - 1) / nthreads;
        for (unsigned t = 0; t < nthreads; ++t) {
            uint64_t bgn = t * per, e = bgn + per > n ? n : bgn + per;
            if (bgn < e) th.emplace_back(worker, bgn, e);
        }
        for (auto &t : th) t.join();
    }
}

// out(12) = a(12) + b(12)
void gkr_g1_add(const uint64_t *a, const uint64_t *b, uint64_t *out) {
    G1 r;
    g1_add(r, g1_load(a), g1_load(b));
    g1_store(out, r);
}

// ---------------------------------------------------------------------------
// Keccak-256 (legacy 0x01 padding, as hints.go:151 sha3.NewLegacyKeccak256)
// ---------------------------------------------------------------------------

static const uint64_t KRC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

static inline uint64_t rotl64(uint64_t x, int n) {
    return n == 0 ? x : (x << n) | (x >> (64 - n));
}

static void keccak_f(uint64_t st[25]) {
    static const int rot[5][5] = {{0, 36, 3, 41, 18},
                                  {1, 44, 10, 45, 2},
                                  {62, 6, 43, 15, 61},
                                  {28, 55, 25, 21, 56},
                                  {27, 20, 39, 8, 14}};
    for (int round = 0; round < 24; ++round) {
        uint64_t c[5], d[5];
        for (int x = 0; x < 5; ++x)
            c[x] = st[x] ^ st[x + 5] ^ st[x + 10] ^ st[x + 15] ^ st[x + 20];
        for (int x = 0; x < 5; ++x) {
            d[x] = c[(x + 4) % 5] ^ rotl64(c[(x + 1) % 5], 1);
            for (int y = 0; y < 5; ++y) st[x + 5 * y] ^= d[x];
        }
        uint64_t bb[25];
        for (int x = 0; x < 5; ++x)
            for (int y = 0; y < 5; ++y)
                bb[y + 5 * ((2 * x + 3 * y) % 5)] = rotl64(st[x + 5 * y], rot[x][y]);
        for (int x = 0; x < 5; ++x)
            for (int y = 0; y < 5; ++y)
                st[x + 5 * y] =
                    bb[x + 5 * y] ^ ((~bb[(x + 1) % 5 + 5 * y]) & bb[(x + 2) % 5 + 5 * y]);
        st[0] ^= KRC[round];
    }
}

void gkr_keccak256(const uint8_t *data, uint64_t len, uint8_t *out32) {
    const uint64_t rate = 136;
    uint64_t st[25];
    std::memset(st, 0, sizeof(st));
    uint64_t off = 0;
    while (len - off >= rate) {
        for (uint64_t i = 0; i < rate / 8; ++i) {
            uint64_t w;
            std::memcpy(&w, data + off + 8 * i, 8);
            st[i] ^= w;
        }
        keccak_f(st);
        off += rate;
    }
    uint8_t block[136];
    std::memset(block, 0, sizeof(block));
    std::memcpy(block, data + off, len - off);
    block[len - off] = 0x01;
    block[rate - 1] |= 0x80;
    for (uint64_t i = 0; i < rate / 8; ++i) {
        uint64_t w;
        std::memcpy(&w, block + 8 * i, 8);
        st[i] ^= w;
    }
    keccak_f(st);
    std::memcpy(out32, st, 32);
}

} // extern "C"

// ---------------------------------------------------------------------------
// Fr: scalar field, 4x64 Montgomery (for the Groth16 computeH NTTs)
// ---------------------------------------------------------------------------

struct Fr { uint64_t l[4]; };

static const Fr FRP   = {{0x43e1f593f0000001ULL, 0x2833e84879b97091ULL,
                          0xb85045b68181585dULL, 0x30644e72e131a029ULL}};
static const Fr FR_R2 = {{0x1bb8e645ae216da7ULL, 0x53fe3ab1e35c59e3ULL,
                          0x8c49833d53bb8085ULL, 0x0216d0b17f4e44a5ULL}};
static const uint64_t FR_PINV = 0xc2e1f593efffffffULL; // -r^-1 mod 2^64

static inline bool fr_geq_p(const Fr &a) {
    for (int i = 3; i >= 0; --i) {
        if (a.l[i] > FRP.l[i]) return true;
        if (a.l[i] < FRP.l[i]) return false;
    }
    return true;
}

static inline void fr_sub_p(Fr &a) {
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a.l[i] - FRP.l[i] - borrow;
        a.l[i] = (uint64_t)d;
        borrow = (d >> 64) & 1;
    }
}

static inline Fr fr_add(const Fr &a, const Fr &b) {
    Fr r;
    u128 carry = 0;
    for (int i = 0; i < 4; ++i) {
        u128 s = (u128)a.l[i] + b.l[i] + carry;
        r.l[i] = (uint64_t)s;
        carry = s >> 64;
    }
    if (carry || fr_geq_p(r)) fr_sub_p(r);
    return r;
}

static inline Fr fr_sub(const Fr &a, const Fr &b) {
    Fr r;
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a.l[i] - b.l[i] - borrow;
        r.l[i] = (uint64_t)d;
        borrow = (d >> 64) & 1;
    }
    if (borrow) {
        u128 carry = 0;
        for (int i = 0; i < 4; ++i) {
            u128 s = (u128)r.l[i] + FRP.l[i] + carry;
            r.l[i] = (uint64_t)s;
            carry = s >> 64;
        }
    }
    return r;
}

static inline Fr fr_mul(const Fr &a, const Fr &b) {
    uint64_t t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; ++i) {
        u128 carry = 0;
        for (int j = 0; j < 4; ++j) {
            u128 s = (u128)a.l[j] * b.l[i] + t[j] + carry;
            t[j] = (uint64_t)s;
            carry = s >> 64;
        }
        u128 s = (u128)t[4] + carry;
        t[4] = (uint64_t)s;
        t[5] = (uint64_t)(s >> 64);

        uint64_t m = t[0] * FR_PINV;
        carry = ((u128)m * FRP.l[0] + t[0]) >> 64;
        for (int j = 1; j < 4; ++j) {
            u128 s2 = (u128)m * FRP.l[j] + t[j] + carry;
            t[j - 1] = (uint64_t)s2;
            carry = s2 >> 64;
        }
        u128 s3 = (u128)t[4] + carry;
        t[3] = (uint64_t)s3;
        t[4] = t[5] + (uint64_t)(s3 >> 64);
    }
    Fr r = {{t[0], t[1], t[2], t[3]}};
    if (t[4] || fr_geq_p(r)) fr_sub_p(r);
    return r;
}

static inline Fr fr_to_mont(const Fr &a) { return fr_mul(a, FR_R2); }

static inline Fr fr_from_mont(const Fr &a) {
    Fr one = {{1, 0, 0, 0}};
    return fr_mul(a, one);
}

static Fr fr_pow(Fr base, const Fr &e_plain) {
    Fr one = {{1, 0, 0, 0}};
    Fr res = fr_to_mont(one);
    for (int limb = 3; limb >= 0; --limb) {
        for (int bit = 63; bit >= 0; --bit) {
            res = fr_mul(res, res);
            if ((e_plain.l[limb] >> bit) & 1) res = fr_mul(res, base);
        }
    }
    return res;
}

static Fr fr_inv(const Fr &a_mont) {
    // a^(r-2) via pow
    Fr e = FRP;
    u128 borrow = 2;
    for (int i = 0; i < 4 && borrow; ++i) {
        u128 d = (u128)e.l[i] - borrow;
        e.l[i] = (uint64_t)d;
        borrow = (d >> 64) & 1;
    }
    return fr_pow(a_mont, e);
}

// in-place iterative radix-2 NTT over fr (Montgomery values), natural order
// in, natural order out (bit-reversal inside). root_m = Montgomery d-th root.
static void fr_ntt(Fr *a, uint64_t d, Fr root_m) {
    // bit-reversal permutation
    for (uint64_t i = 1, j = 0; i < d; ++i) {
        uint64_t bit = d >> 1;
        for (; j & bit; bit >>= 1) j ^= bit;
        j ^= bit;
        if (i < j) { Fr t = a[i]; a[i] = a[j]; a[j] = t; }
    }
    for (uint64_t len = 2; len <= d; len <<= 1) {
        // w_len = root^(d/len)
        Fr wlen = root_m;
        for (uint64_t k = len; k < d; k <<= 1) wlen = fr_mul(wlen, wlen);
        for (uint64_t i = 0; i < d; i += len) {
            Fr one = {{1, 0, 0, 0}};
            Fr w = fr_to_mont(one);
            for (uint64_t j = 0; j < len / 2; ++j) {
                Fr u = a[i + j];
                Fr v = fr_mul(a[i + j + len / 2], w);
                a[i + j] = fr_add(u, v);
                a[i + j + len / 2] = fr_sub(u, v);
                w = fr_mul(w, wlen);
            }
        }
    }
}

extern "C" {

// Groth16 computeH: given per-constraint values a, b, c (n plain 4x64
// values each), domain size d (power of two >= n), write the d quotient
// coefficients h(X) = (A(X)B(X) - C(X)) / (X^d - 1) evaluated... i.e. the
// coefficient vector of h, plain form, into out (d values; the top
// coefficient is zero). Mirrors prover/gadget/prove.go computeH
// (ifft -> coset fft -> pointwise -> coset ifft) with our own coset g = 5.
void gkr_fr_compute_h(const uint64_t *a, const uint64_t *b, const uint64_t *c,
                      uint64_t n, uint64_t d, uint64_t *out) {
    std::vector<Fr> A(d), B(d), C(d);
    Fr zero = {{0, 0, 0, 0}};
    for (uint64_t i = 0; i < d; ++i) {
        if (i < n) {
            Fr t;
            std::memcpy(t.l, a + 4 * i, 32);
            A[i] = fr_to_mont(t);
            std::memcpy(t.l, b + 4 * i, 32);
            B[i] = fr_to_mont(t);
            std::memcpy(t.l, c + 4 * i, 32);
            C[i] = fr_to_mont(t);
        } else {
            A[i] = B[i] = C[i] = zero;
        }
    }

    // omega = 5^((r-1)/d), g = 5 (multiplicative generator)
    Fr five = {{5, 0, 0, 0}};
    Fr g_m = fr_to_mont(five);
    Fr e = FRP;
    e.l[0] -= 1; // r-1 (no borrow: low limb is odd)
    // divide r-1 by d (d power of two)
    for (uint64_t t = d; t > 1; t >>= 1) {
        // e >>= 1
        for (int i = 0; i < 4; ++i) {
            e.l[i] >>= 1;
            if (i < 3) e.l[i] |= e.l[i + 1] << 63;
        }
    }
    Fr omega_m = fr_pow(g_m, e); // fr_pow takes a plain exponent

    Fr omega_inv_m = fr_inv(omega_m);

    // d^{-1} (for inverse NTT scaling)
    Fr d_plain = {{d, 0, 0, 0}};
    Fr dinv_m = fr_inv(fr_to_mont(d_plain));

    auto intt = [&](std::vector<Fr> &v) {
        fr_ntt(v.data(), d, omega_inv_m);
        for (uint64_t i = 0; i < d; ++i) v[i] = fr_mul(v[i], dinv_m);
    };

    // 1. interpolate on the omega-domain
    intt(A); intt(B); intt(C);

    // 2. evaluate on the coset g*omega^i: scale coeff j by g^j, then NTT
    auto coset_scale = [&](std::vector<Fr> &v, const Fr &gg) {
        Fr one = {{1, 0, 0, 0}};
        Fr acc = fr_to_mont(one);
        for (uint64_t i = 0; i < d; ++i) {
            v[i] = fr_mul(v[i], acc);
            acc = fr_mul(acc, gg);
        }
    };
    coset_scale(A, g_m); fr_ntt(A.data(), d, omega_m);
    coset_scale(B, g_m); fr_ntt(B.data(), d, omega_m);
    coset_scale(C, g_m); fr_ntt(C.data(), d, omega_m);

    // 3. h_evals = (A o B - C) / Z(coset), Z(g*omega^i) = g^d - 1 (const)
    Fr gd = fr_pow(g_m, d_plain);
    Fr one_p = {{1, 0, 0, 0}};
    Fr zinv_m = fr_inv(fr_sub(gd, fr_to_mont(one_p)));
    for (uint64_t i = 0; i < d; ++i) {
        Fr h = fr_sub(fr_mul(A[i], B[i]), C[i]);
        A[i] = fr_mul(h, zinv_m);
    }

    // 4. back to coefficients: iNTT on the coset, un-scale by g^{-i}
    intt(A);
    Fr ginv_m = fr_inv(g_m);
    coset_scale(A, ginv_m);

    for (uint64_t i = 0; i < d; ++i) {
        Fr t = fr_from_mont(A[i]);
        std::memcpy(out + 4 * i, t.l, 32);
    }
}

} // extern "C"

// ---------------------------------------------------------------------------
// Fp2 / G2: y^2 = x^3 + 3/(9+u) over Fp2 = Fp[u]/(u^2+1)
// ---------------------------------------------------------------------------

struct Fp2 { Fp c0, c1; };

static inline bool fp2_is_zero(const Fp2 &a) {
    return fp_is_zero(a.c0) && fp_is_zero(a.c1);
}

static inline Fp2 fp2_add(const Fp2 &a, const Fp2 &b) {
    return {fp_add(a.c0, b.c0), fp_add(a.c1, b.c1)};
}

static inline Fp2 fp2_sub(const Fp2 &a, const Fp2 &b) {
    return {fp_sub(a.c0, b.c0), fp_sub(a.c1, b.c1)};
}

static inline Fp2 fp2_dbl(const Fp2 &a) { return fp2_add(a, a); }

static inline Fp2 fp2_mul(const Fp2 &a, const Fp2 &b) {
    // Karatsuba with u^2 = -1
    Fp t0 = fp_mul(a.c0, b.c0);
    Fp t1 = fp_mul(a.c1, b.c1);
    Fp t2 = fp_mul(fp_add(a.c0, a.c1), fp_add(b.c0, b.c1));
    return {fp_sub(t0, t1), fp_sub(fp_sub(t2, t0), t1)};
}

static inline Fp2 fp2_sqr(const Fp2 &a) { return fp2_mul(a, a); }

struct G2 { Fp2 x, y, z; };

static inline bool g2_is_inf(const G2 &p) { return fp2_is_zero(p.z); }

static inline void g2_set_inf(G2 &p) {
    std::memset(&p, 0, sizeof(G2));
    p.y.c0 = ONE_M;
}

static void g2_double(G2 &r, const G2 &p) {
    if (g2_is_inf(p) || fp2_is_zero(p.y)) { g2_set_inf(r); return; }
    Fp2 a = fp2_sqr(p.x);
    Fp2 b = fp2_sqr(p.y);
    Fp2 c = fp2_sqr(b);
    Fp2 t = fp2_add(p.x, b);
    Fp2 d = fp2_dbl(fp2_sub(fp2_sqr(t), fp2_add(a, c)));
    Fp2 e = fp2_add(fp2_dbl(a), a);
    Fp2 f = fp2_sqr(e);
    Fp2 x3 = fp2_sub(f, fp2_dbl(d));
    Fp2 c8 = fp2_dbl(fp2_dbl(fp2_dbl(c)));
    Fp2 y3 = fp2_sub(fp2_mul(e, fp2_sub(d, x3)), c8);
    Fp2 z3 = fp2_dbl(fp2_mul(p.y, p.z));
    r.x = x3; r.y = y3; r.z = z3;
}

static void g2_add(G2 &r, const G2 &p, const G2 &q) {
    if (g2_is_inf(p)) { r = q; return; }
    if (g2_is_inf(q)) { r = p; return; }
    Fp2 z1z1 = fp2_sqr(p.z);
    Fp2 z2z2 = fp2_sqr(q.z);
    Fp2 u1 = fp2_mul(p.x, z2z2);
    Fp2 u2 = fp2_mul(q.x, z1z1);
    Fp2 s1 = fp2_mul(fp2_mul(p.y, z2z2), q.z);
    Fp2 s2 = fp2_mul(fp2_mul(q.y, z1z1), p.z);
    Fp2 h = fp2_sub(u2, u1);
    if (fp2_is_zero(h)) {
        if (std::memcmp(&s1, &s2, sizeof(Fp2)) != 0) { g2_set_inf(r); return; }
        g2_double(r, p);
        return;
    }
    Fp2 i = fp2_sqr(fp2_dbl(h));
    Fp2 j = fp2_mul(h, i);
    Fp2 rr = fp2_dbl(fp2_sub(s2, s1));
    Fp2 v = fp2_mul(u1, i);
    Fp2 x3 = fp2_sub(fp2_sub(fp2_sqr(rr), j), fp2_dbl(v));
    Fp2 y3 = fp2_sub(fp2_mul(rr, fp2_sub(v, x3)), fp2_dbl(fp2_mul(s1, j)));
    Fp2 zs = fp2_add(p.z, q.z);
    Fp2 z3 = fp2_mul(fp2_sub(fp2_sub(fp2_sqr(zs), z1z1), z2z2), h);
    r.x = x3; r.y = y3; r.z = z3;
}

static G2 g2_load(const uint64_t *limbs) {
    G2 p;
    Fp t;
    std::memcpy(t.l, limbs, 32);      p.x.c0 = fp_to_mont(t);
    std::memcpy(t.l, limbs + 4, 32);  p.x.c1 = fp_to_mont(t);
    std::memcpy(t.l, limbs + 8, 32);  p.y.c0 = fp_to_mont(t);
    std::memcpy(t.l, limbs + 12, 32); p.y.c1 = fp_to_mont(t);
    std::memcpy(t.l, limbs + 16, 32); p.z.c0 = fp_to_mont(t);
    std::memcpy(t.l, limbs + 20, 32); p.z.c1 = fp_to_mont(t);
    return p;
}

static void g2_store(uint64_t *limbs, const G2 &p) {
    Fp t;
    t = fp_from_mont(p.x.c0); std::memcpy(limbs, t.l, 32);
    t = fp_from_mont(p.x.c1); std::memcpy(limbs + 4, t.l, 32);
    t = fp_from_mont(p.y.c0); std::memcpy(limbs + 8, t.l, 32);
    t = fp_from_mont(p.y.c1); std::memcpy(limbs + 12, t.l, 32);
    t = fp_from_mont(p.z.c0); std::memcpy(limbs + 16, t.l, 32);
    t = fp_from_mont(p.z.c1); std::memcpy(limbs + 20, t.l, 32);
}

extern "C" {

// out(24) = sum_i scalars(4*i..) * points(24*i..)   [Pippenger over G2]
void gkr_g2_msm(const uint64_t *points, const uint64_t *scalars,
                uint64_t n, uint64_t *out) {
    G2 total;
    g2_set_inf(total);
    if (n == 0) { g2_store(out, total); return; }

    std::vector<G2> pts(n);
    for (uint64_t i = 0; i < n; ++i) pts[i] = g2_load(points + 24 * i);

    int c;
    {
        int bl = 0;
        for (uint64_t t = n; t; t >>= 1) ++bl;
        c = bl < 2 ? 2 : (bl > 16 ? 16 : bl);
    }
    const int nbits = 254;
    const int nwin = (nbits + c - 1) / c;

    std::vector<G2> winsum(nwin);
    unsigned nthreads = std::thread::hardware_concurrency();
    if (nthreads == 0) nthreads = 1;
    if (nthreads > (unsigned)nwin) nthreads = (unsigned)nwin;

    auto do_windows = [&](int begin, int end) {
        std::vector<G2> buckets((size_t)1 << c);
        for (int w = begin; w < end; ++w) {
            for (auto &b : buckets) g2_set_inf(b);
            int shift = w * c;
            for (uint64_t i = 0; i < n; ++i) {
                int idx = scalar_window(scalars + 4 * i, shift, c);
                if (idx) g2_add(buckets[idx - 1], buckets[idx - 1], pts[i]);
            }
            G2 run, acc;
            g2_set_inf(run);
            g2_set_inf(acc);
            for (int b = (1 << c) - 2; b >= 0; --b) {
                g2_add(run, run, buckets[b]);
                g2_add(acc, acc, run);
            }
            winsum[w] = acc;
        }
    };

    if (nthreads <= 1) {
        do_windows(0, nwin);
    } else {
        std::vector<std::thread> th;
        int per = (nwin + nthreads - 1) / nthreads;
        for (unsigned t = 0; t < nthreads; ++t) {
            int b = t * per, e = b + per > nwin ? nwin : b + per;
            if (b < e) th.emplace_back(do_windows, b, e);
        }
        for (auto &t : th) t.join();
    }

    for (int w = nwin - 1; w >= 0; --w) {
        if (!g2_is_inf(total))
            for (int k = 0; k < c; ++k) g2_double(total, total);
        g2_add(total, total, winsum[w]);
    }
    g2_store(out, total);
}

// out(24*i..) = scalars(4*i..) * base(24)   [fixed-base, 8-bit windows]
void gkr_g2_batch_scalar_mul(const uint64_t *base, const uint64_t *scalars,
                             uint64_t n, uint64_t *out) {
    const int c = 8, nwin = 32, tbl = (1 << c) - 1;
    G2 b = g2_load(base);

    std::vector<G2> table((size_t)nwin * tbl);
    for (int w = 0; w < nwin; ++w) {
        G2 run = b;
        for (int j = 1; j <= tbl; ++j) {
            table[(size_t)w * tbl + (j - 1)] = run;
            if (j < tbl) g2_add(run, run, b);
        }
        if (w + 1 < nwin) g2_add(b, run, b);
    }

    unsigned nthreads = std::thread::hardware_concurrency();
    if (nthreads == 0) nthreads = 1;
    auto worker = [&](uint64_t begin, uint64_t end) {
        for (uint64_t i = begin; i < end; ++i) {
            G2 acc;
            g2_set_inf(acc);
            const uint64_t *s = scalars + 4 * i;
            for (int w = 0; w < nwin; ++w) {
                int idx = scalar_window(s, w * c, c);
                if (idx) g2_add(acc, acc, table[(size_t)w * tbl + (idx - 1)]);
            }
            g2_store(out + 24 * i, acc);
        }
    };
    if (nthreads <= 1 || n < 64) {
        worker(0, n);
    } else {
        std::vector<std::thread> th;
        uint64_t per = (n + nthreads - 1) / nthreads;
        for (unsigned t = 0; t < nthreads; ++t) {
            uint64_t bgn = t * per, e = bgn + per > n ? n : bgn + per;
            if (bgn < e) th.emplace_back(worker, bgn, e);
        }
        for (auto &t : th) t.join();
    }
}

// out(24) = a(24) + b(24)
void gkr_g2_add(const uint64_t *a, const uint64_t *b, uint64_t *out) {
    G2 r;
    g2_add(r, g2_load(a), g2_load(b));
    g2_store(out, r);
}

} // extern "C"
