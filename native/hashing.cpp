// Batched Poseidon2-KoalaBear-16 hashing for the host prover hot path.
//
// Exact semantics of ziren_tpu/core/poseidon2.py (the pinned reference
// permutation: initial external layer, 4+13+4 rounds, x^3 sbox), exposed as
// row-parallel C ABI entry points consumed via ctypes
// (ziren_tpu/core/p2_native.py). Multithreaded over rows with std::thread.
//
// Build: g++ -O3 -shared -fPIC -o libziren_hashing.so hashing.cpp -lpthread

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

static const uint64_t KB_P = 2130706433ull;  // 2^31 - 2^24 + 1

#include "poseidon2_rc.inc"

static const uint64_t DIAG[16] = {
    KB_P - 2,
    1,
    2,
    (KB_P + 1) >> 1,
    3,
    4,
    (KB_P - 1) >> 1,
    KB_P - 3,
    KB_P - 4,
    KB_P - ((KB_P - 1) >> 8),
    KB_P - ((KB_P - 1) >> 3),
    KB_P - 127,
    (KB_P - 1) >> 8,
    (KB_P - 1) >> 3,
    (KB_P - 1) >> 4,
    127,
};

static inline uint64_t sbox3(uint64_t x) {
  // x < 2^35 is fine: (x*x) < 2^70 would overflow, so reduce first.
  x %= KB_P;
  uint64_t x2 = (x * x) % KB_P;
  return (x2 * x) % KB_P;
}

// M4 block add-chain on 4 lanes (values < p in, < 8p out, exact in uint64).
static inline void m4(uint64_t& x0, uint64_t& x1, uint64_t& x2, uint64_t& x3) {
  uint64_t t01 = x0 + x1;
  uint64_t t23 = x2 + x3;
  uint64_t t0123 = t01 + t23;
  uint64_t t01123 = t0123 + x1;
  uint64_t t01233 = t0123 + x3;
  uint64_t o3 = t01233 + 2 * x0;
  uint64_t o1 = t01123 + 2 * x2;
  uint64_t o0 = t01123 + t01;
  uint64_t o2 = t01233 + t23;
  x0 = o0; x1 = o1; x2 = o2; x3 = o3;
}

static inline void external_layer(uint64_t s[16]) {
  for (int b = 0; b < 16; b += 4) m4(s[b], s[b + 1], s[b + 2], s[b + 3]);
  uint64_t sums[4];
  for (int k = 0; k < 4; k++)
    sums[k] = s[k] + s[k + 4] + s[k + 8] + s[k + 12];  // < 32p < 2^36
  for (int i = 0; i < 16; i++) s[i] = (s[i] + sums[i & 3]) % KB_P;
}

static void permute(uint64_t s[16]) {
  external_layer(s);
  for (int r = 0; r < 4; r++) {
    for (int i = 0; i < 16; i++) s[i] = sbox3(s[i] + P2_RC[r][i]);
    external_layer(s);
  }
  for (int r = 0; r < 13; r++) {
    s[0] = sbox3(s[0] + P2_RC[4 + r][0]);
    uint64_t total = 0;
    for (int i = 0; i < 16; i++) total += s[i];  // < 16p
    for (int i = 0; i < 16; i++) s[i] = (s[i] * DIAG[i] + total) % KB_P;
  }
  for (int r = 0; r < 4; r++) {
    for (int i = 0; i < 16; i++) s[i] = sbox3(s[i] + P2_RC[17 + r][i]);
    external_layer(s);
  }
}

template <typename F>
static void parallel_rows(uint64_t n, F fn) {
  unsigned hw = std::thread::hardware_concurrency();
  unsigned nt = hw ? (hw > 16 ? 16 : hw) : 4;
  if (n < 2048 || nt <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> ts;
  uint64_t chunk = (n + nt - 1) / nt;
  for (unsigned t = 0; t < nt; t++) {
    uint64_t lo = t * chunk, hi = lo + chunk > n ? n : lo + chunk;
    if (lo >= hi) break;
    ts.emplace_back([=] { fn(lo, hi); });
  }
  for (auto& t : ts) t.join();
}

extern "C" {

// PaddingFreeSponge over rows: (n, w) canonical uint32 -> (n, 8).
void ziren_p2_hash_rows(const uint32_t* rows, uint64_t n, uint32_t w,
                        uint32_t* out) {
  parallel_rows(n, [=](uint64_t lo, uint64_t hi) {
    for (uint64_t r = lo; r < hi; r++) {
      uint64_t s[16] = {0};
      const uint32_t* row = rows + r * w;
      for (uint32_t i = 0; i < w; i += 8) {
        uint32_t c = w - i < 8 ? w - i : 8;
        for (uint32_t j = 0; j < c; j++) s[j] = row[i + j];
        permute(s);
      }
      for (int j = 0; j < 8; j++) out[r * 8 + j] = (uint32_t)s[j];
    }
  });
}

// TruncatedPermutation 2-to-1 on separate left/right arrays: (n,8)x2 -> (n,8).
void ziren_p2_compress(const uint32_t* left, const uint32_t* right, uint64_t n,
                       uint32_t* out) {
  parallel_rows(n, [=](uint64_t lo, uint64_t hi) {
    for (uint64_t r = lo; r < hi; r++) {
      uint64_t s[16];
      for (int j = 0; j < 8; j++) s[j] = left[r * 8 + j];
      for (int j = 0; j < 8; j++) s[8 + j] = right[r * 8 + j];
      permute(s);
      for (int j = 0; j < 8; j++) out[r * 8 + j] = (uint32_t)s[j];
    }
  });
}

// Adjacent-pair compression of one tree level: (2k, 8) -> (k, 8).
void ziren_p2_compress_pairs(const uint32_t* digests, uint64_t k,
                             uint32_t* out) {
  parallel_rows(k, [=](uint64_t lo, uint64_t hi) {
    for (uint64_t r = lo; r < hi; r++) {
      uint64_t s[16];
      for (int j = 0; j < 16; j++) s[j] = digests[r * 16 + j];
      permute(s);
      for (int j = 0; j < 8; j++) out[r * 8 + j] = (uint32_t)s[j];
    }
  });
}

// In-place batched permutation: (n, 16).
void ziren_p2_permute(uint32_t* states, uint64_t n) {
  parallel_rows(n, [=](uint64_t lo, uint64_t hi) {
    for (uint64_t r = lo; r < hi; r++) {
      uint64_t s[16];
      for (int j = 0; j < 16; j++) s[j] = states[r * 16 + j];
      permute(s);
      for (int j = 0; j < 16; j++) states[r * 16 + j] = (uint32_t)s[j];
    }
  });
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Septic extension F_{p^7} = F_p[z]/(z^7 + 2z - 8) and the curve lift
// (y^2 = x^3 + 3z x - 3): Cipolla square roots + hash-to-curve, the host
// GlobalChip hot path. Exact semantics of ziren_tpu/core/septic.py.
// ---------------------------------------------------------------------------

static void smul7(const uint64_t* a, const uint64_t* b, uint64_t* out) {
  unsigned __int128 raw[13] = {};
  for (int i = 0; i < 7; i++)
    for (int j = 0; j < 7; j++)
      raw[i + j] += (unsigned __int128)a[i] * b[j];
  for (int k = 12; k > 6; k--) {
    uint64_t c = (uint64_t)(raw[k] % KB_P);
    raw[k - 7] += (unsigned __int128)8 * c;
    raw[k - 6] += (unsigned __int128)2 * (KB_P - c);
  }
  for (int i = 0; i < 7; i++) out[i] = (uint64_t)(raw[i] % KB_P);
}

// bits (LSB-first) of (p^7 - 1)/2 and (p^7 + 1)/2, computed once
static std::vector<int> g_half_bits, g_cip_bits;

static std::vector<int> bignum_bits(const std::vector<uint64_t>& digits32) {
  std::vector<int> bits;
  for (size_t d = 0; d < digits32.size(); d++)
    for (int b = 0; b < 32; b++) bits.push_back((digits32[d] >> b) & 1);
  while (!bits.empty() && bits.back() == 0) bits.pop_back();
  return bits;
}

static void septic_init() {
  if (!g_half_bits.empty()) return;
  // p^7 in base-2^32 digits
  std::vector<uint64_t> num = {1};
  for (int it = 0; it < 7; it++) {
    uint64_t carry = 0;
    for (auto& d : num) {
      unsigned __int128 t = (unsigned __int128)d * KB_P + carry;
      d = (uint64_t)(t & 0xFFFFFFFFull);
      carry = (uint64_t)(t >> 32);
    }
    while (carry) {
      num.push_back(carry & 0xFFFFFFFFull);
      carry >>= 32;
    }
  }
  num[0] -= 1;               // p^7 - 1 (p odd => p^7 odd => no borrow)
  std::vector<uint64_t> half = num;
  for (size_t d = 0; d < half.size(); d++) {  // >> 1
    half[d] >>= 1;
    if (d + 1 < half.size() && (half[d + 1] & 1))
      half[d] |= 0x80000000ull;
  }
  g_half_bits = bignum_bits(half);
  std::vector<uint64_t> cip = half;  // (p^7+1)/2 = (p^7-1)/2 + 1
  for (size_t d = 0; d < cip.size(); d++) {
    cip[d] += 1;
    if (cip[d] <= 0xFFFFFFFFull) break;
    cip[d] = 0;
  }
  g_cip_bits = bignum_bits(cip);
}

static void spow_bits(const uint64_t* a, const std::vector<int>& bits,
                      uint64_t* out) {
  uint64_t result[7] = {1, 0, 0, 0, 0, 0, 0};
  uint64_t base[7];
  for (int i = 0; i < 7; i++) base[i] = a[i];
  for (size_t k = 0; k < bits.size(); k++) {
    if (bits[k]) smul7(result, base, result);
    if (k + 1 < bits.size()) smul7(base, base, base);
  }
  for (int i = 0; i < 7; i++) out[i] = result[i];
}

static bool is_square7(const uint64_t* a) {
  uint64_t r[7];
  spow_bits(a, g_half_bits, r);
  if (r[0] != 1) return false;
  for (int i = 1; i < 7; i++)
    if (r[i] != 0) return false;
  return true;
}

// Cipolla sqrt; returns false if non-square. Matches septic.py::ssqrt.
static bool ssqrt7(const uint64_t* a, uint64_t* out) {
  bool zero = true;
  for (int i = 0; i < 7; i++)
    if (a[i]) zero = false;
  if (zero) {
    for (int i = 0; i < 7; i++) out[i] = 0;
    return true;
  }
  if (!is_square7(a)) return false;
  uint64_t t[7] = {};
  for (uint64_t cand = 1; cand < 1000; cand++) {
    for (int i = 0; i < 7; i++) t[i] = 0;
    t[0] = cand % KB_P;
    uint64_t t2[7], d[7];
    smul7(t, t, t2);
    for (int i = 0; i < 7; i++) d[i] = (t2[i] + KB_P - a[i]) % KB_P;
    if (!is_square7(d)) break;
  }
  uint64_t t2[7], d[7];
  smul7(t, t, t2);
  for (int i = 0; i < 7; i++) d[i] = (t2[i] + KB_P - a[i]) % KB_P;
  // (t + w)^((q+1)/2) in F_q[w]/(w^2 - d)
  uint64_t xr[7], xi[7] = {1, 0, 0, 0, 0, 0, 0};
  uint64_t rr[7] = {1, 0, 0, 0, 0, 0, 0}, ri[7] = {};
  for (int i = 0; i < 7; i++) xr[i] = t[i];
  for (size_t k = 0; k < g_cip_bits.size(); k++) {
    if (g_cip_bits[k]) {
      uint64_t nrr[7], nri[7], tmp1[7], tmp2[7];
      smul7(rr, xr, tmp1);
      smul7(ri, xi, tmp2);
      smul7(tmp2, d, tmp2);
      for (int i = 0; i < 7; i++) nrr[i] = (tmp1[i] + tmp2[i]) % KB_P;
      smul7(rr, xi, tmp1);
      smul7(ri, xr, tmp2);
      for (int i = 0; i < 7; i++) nri[i] = (tmp1[i] + tmp2[i]) % KB_P;
      for (int i = 0; i < 7; i++) {
        rr[i] = nrr[i];
        ri[i] = nri[i];
      }
    }
    uint64_t nxr[7], nxi[7], s1[7], s2[7];
    smul7(xr, xr, s1);
    smul7(xi, xi, s2);
    smul7(s2, d, s2);
    for (int i = 0; i < 7; i++) nxr[i] = (s1[i] + s2[i]) % KB_P;
    smul7(xr, xi, nxi);
    for (int i = 0; i < 7; i++) nxi[i] = (2 * nxi[i]) % KB_P;
    for (int i = 0; i < 7; i++) {
      xr[i] = nxr[i];
      xi[i] = nxi[i];
    }
  }
  for (int i = 0; i < 7; i++)
    if (ri[i]) return false;  // imaginary residue: shouldn't happen
  for (int i = 0; i < 7; i++) out[i] = rr[i];
  return true;
}

extern "C" {

// Hash-to-curve for n messages (n, 7) -> xs (n, 7), ys (n, 7), offsets (n,).
// y returned in the receive range [1, (p-1)/2] on coefficient 6.
void ziren_septic_lift_x(const uint32_t* msgs, uint64_t n, uint32_t* xs,
                         uint32_t* ys, uint32_t* offsets) {
  septic_init();
  parallel_rows(n, [=](uint64_t lo, uint64_t hi) {
    for (uint64_t r = lo; r < hi; r++) {
      uint64_t m[7];
      for (int i = 0; i < 7; i++) m[i] = msgs[r * 7 + i];
      uint32_t off = 0xFFFFFFFFu;
      uint64_t x[7] = {}, y[7] = {};
      for (uint32_t o = 0; o < 256; o++) {
        for (int i = 0; i < 7; i++) x[i] = m[i];
        x[6] = (m[6] * 256 + o) % KB_P;
        // rhs = x^3 + 3 z x - 3
        uint64_t x2[7], x3[7];
        smul7(x, x, x2);
        smul7(x2, x, x3);
        uint64_t az[7] = {0, 3, 0, 0, 0, 0, 0}, ax[7];
        smul7(az, x, ax);
        uint64_t rhs[7];
        for (int i = 0; i < 7; i++) rhs[i] = (x3[i] + ax[i]) % KB_P;
        rhs[0] = (rhs[0] + KB_P - 3) % KB_P;
        if (!ssqrt7(rhs, y)) continue;
        if (y[6] == 0) continue;  // exception point
        if (y[6] > (KB_P - 1) / 2)
          for (int i = 0; i < 7; i++) y[i] = y[i] ? KB_P - y[i] : 0;
        off = o;
        break;
      }
      offsets[r] = off;  // 0xFFFFFFFF signals failure (checked host-side)
      for (int i = 0; i < 7; i++) {
        xs[r * 7 + i] = (uint32_t)x[i];
        ys[r * 7 + i] = (uint32_t)y[i];
      }
    }
  });
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Radix-2 DIT NTT over KoalaBear, column-wise on a row-major (n, w) matrix.
// Exact semantics of ziren_tpu/core/ntt.py::_butterflies: input rows already
// in bit-reversed order, output natural order; `post_scale` multiplies every
// element at the end (1 for forward, n^-1 for inverse).
// ---------------------------------------------------------------------------

static uint64_t modpow(uint64_t b, uint64_t e) {
  uint64_t r = 1;
  b %= KB_P;
  while (e) {
    if (e & 1) r = (r * b) % KB_P;
    b = (b * b) % KB_P;
    e >>= 1;
  }
  return r;
}

extern "C" {

// data: (n, w) uint32 canonical, rows pre-bit-reversed; in-place butterflies.
void ziren_ntt(uint32_t* data, uint64_t n, uint32_t w, uint32_t root,
               uint32_t post_scale) {
  int log_n = 0;
  while ((1ull << log_n) < n) log_n++;
  // twiddle tables per stage (shared, computed once)
  std::vector<std::vector<uint32_t>> tw(log_n);
  for (int stage = 0; stage < log_n; stage++) {
    uint64_t half = 1ull << stage;
    uint64_t w_span = modpow(root, n >> (stage + 1));
    tw[stage].resize(half);
    uint64_t acc = 1;
    for (uint64_t i = 0; i < half; i++) {
      tw[stage][i] = (uint32_t)acc;
      acc = (acc * w_span) % KB_P;
    }
  }
  unsigned hw = std::thread::hardware_concurrency();
  unsigned nt = hw ? (hw > 16 ? 16 : hw) : 4;
  if ((uint64_t)n * w < (1ull << 16)) nt = 1;
  if (nt > w) nt = w ? w : 1;
  auto work = [&](uint32_t c0, uint32_t c1) {
    uint32_t bw = c1 - c0;
    for (int stage = 0; stage < log_n; stage++) {
      uint64_t half = 1ull << stage;
      uint64_t span = half << 1;
      const uint32_t* t = tw[stage].data();
      for (uint64_t base = 0; base < n; base += span) {
        for (uint64_t i = 0; i < half; i++) {
          uint64_t twi = t[i];
          uint32_t* lo = data + (base + i) * w + c0;
          uint32_t* hi = data + (base + i + half) * w + c0;
          for (uint32_t c = 0; c < bw; c++) {
            uint64_t tv = (hi[c] * twi) % KB_P;
            uint64_t l = lo[c];
            uint64_t nl = l + tv;
            if (nl >= KB_P) nl -= KB_P;
            uint64_t nh = l + KB_P - tv;
            if (nh >= KB_P) nh -= KB_P;
            lo[c] = (uint32_t)nl;
            hi[c] = (uint32_t)nh;
          }
        }
      }
    }
    if (post_scale != 1) {
      uint64_t s = post_scale;
      for (uint64_t r = 0; r < n; r++) {
        uint32_t* row = data + r * w + c0;
        for (uint32_t c = 0; c < bw; c++)
          row[c] = (uint32_t)((row[c] * s) % KB_P);
      }
    }
  };
  if (nt <= 1) {
    work(0, w);
    return;
  }
  std::vector<std::thread> ts;
  uint32_t chunk = (w + nt - 1) / nt;
  for (unsigned t = 0; t < nt; t++) {
    uint32_t c0 = t * chunk, c1 = c0 + chunk > w ? w : c0 + chunk;
    if (c0 >= c1) break;
    ts.emplace_back([&work, c0, c1] { work(c0, c1); });
  }
  for (auto& th : ts) th.join();
}

}  // extern "C"
