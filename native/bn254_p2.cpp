// Poseidon2 over the BN254 scalar field — the outer (wrap) config's hot
// hashing path (reference: crates/recursion/core/src/stark/config.rs
// KoalaBearPoseidon2Outer; permutation structure per
// gnark-ffi/go/zkm/poseidon2/poseidon2.go: width 3, 8 external + 56
// internal rounds, x^5 sbox, external M = I + J, internal diag(1,1,2) + J).
//
// Fr arithmetic: 4x64 Montgomery (CIOS). I/O is canonical 4xu64 LE limbs.
// Bit-identical to ziren_tpu/core/bn254.py (differential-tested).
//
// Exports (C ABI, ctypes):
//   bn254_hash_rows(rows u32[n*w], n, w, out u64[n*4])
//       MultiField32PaddingFreeSponge per row: chunks of 16 u32 packed
//       8-per-Fr base 2^32 LE into state[0..2], permute, digest=state[0].
//   bn254_compress_pairs(in u64[2n*4], n, out u64[n*4])
//       TruncatedPermutation<2,1,3>: [l, r, 0] -> permute -> state[0].
//   bn254_permute_batch(states u64[n*12], n)  (in-place, canonical)

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include "bn254_rc.inc"

typedef __uint128_t u128;
typedef uint64_t u64;
typedef uint32_t u32;

struct Fr { u64 v[4]; };

static inline bool geq_p(const u64 a[4]) {
  for (int i = 3; i >= 0; --i) {
    if (a[i] > FR_P[i]) return true;
    if (a[i] < FR_P[i]) return false;
  }
  return true;  // equal
}

static inline void sub_p(u64 a[4]) {
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a[i] - FR_P[i] - borrow;
    a[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
}

static inline Fr fr_add(const Fr &a, const Fr &b) {
  Fr r;
  u128 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)a.v[i] + b.v[i] + carry;
    r.v[i] = (u64)s;
    carry = s >> 64;
  }
  if (carry || geq_p(r.v)) sub_p(r.v);
  return r;
}

// CIOS Montgomery multiplication
static inline Fr fr_mul(const Fr &a, const Fr &b) {
  u64 t[5] = {0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    u128 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 s = (u128)t[j] + (u128)a.v[i] * b.v[j] + carry;
      t[j] = (u64)s;
      carry = s >> 64;
    }
    u128 s4 = (u128)t[4] + carry;
    u64 t4 = (u64)s4;
    u64 t5 = (u64)(s4 >> 64);

    u64 m = t[0] * FR_N0;
    u128 c = ((u128)t[0] + (u128)m * FR_P[0]) >> 64;
    for (int j = 1; j < 4; ++j) {
      u128 s = (u128)t[j] + (u128)m * FR_P[j] + c;
      t[j - 1] = (u64)s;
      c = s >> 64;
    }
    u128 s = (u128)t4 + c;
    t[3] = (u64)s;
    t[4] = t5 + (u64)(s >> 64);
  }
  Fr r;
  memcpy(r.v, t, 32);
  if (t[4] || geq_p(r.v)) sub_p(r.v);
  return r;
}

static inline Fr fr_from_canonical(const u64 limbs[4]) {
  Fr a;
  memcpy(a.v, limbs, 32);
  while (geq_p(a.v)) sub_p(a.v);
  Fr r2;
  memcpy(r2.v, FR_R2, 32);
  return fr_mul(a, r2);
}

static inline void fr_to_canonical(const Fr &a, u64 out[4]) {
  // Montgomery reduce by multiplying with 1 (a * R^-1 mod p)
  Fr unit;
  unit.v[0] = 1; unit.v[1] = unit.v[2] = unit.v[3] = 0;
  Fr r = fr_mul(a, unit);
  memcpy(out, r.v, 32);
}

static inline Fr fr_sbox(const Fr &x) {
  Fr x2 = fr_mul(x, x);
  Fr x4 = fr_mul(x2, x2);
  return fr_mul(x4, x);
}

static void permute(Fr s[3]) {
  // initial external linear layer: s_i += sum
  Fr t = fr_add(fr_add(s[0], s[1]), s[2]);
  s[0] = fr_add(s[0], t);
  s[1] = fr_add(s[1], t);
  s[2] = fr_add(s[2], t);
  Fr rc;
  for (int r = 0; r < 4; ++r) {
    for (int k = 0; k < 3; ++k) {
      memcpy(rc.v, RC3_MONT[r][k], 32);
      s[k] = fr_sbox(fr_add(s[k], rc));
    }
    t = fr_add(fr_add(s[0], s[1]), s[2]);
    s[0] = fr_add(s[0], t);
    s[1] = fr_add(s[1], t);
    s[2] = fr_add(s[2], t);
  }
  for (int r = 4; r < 60; ++r) {
    memcpy(rc.v, RC3_MONT[r][0], 32);
    s[0] = fr_sbox(fr_add(s[0], rc));
    t = fr_add(fr_add(s[0], s[1]), s[2]);
    s[0] = fr_add(s[0], t);
    s[1] = fr_add(s[1], t);
    s[2] = fr_add(fr_add(s[2], s[2]), t);  // diag entry 2
  }
  for (int r = 60; r < 64; ++r) {
    for (int k = 0; k < 3; ++k) {
      memcpy(rc.v, RC3_MONT[r][k], 32);
      s[k] = fr_sbox(fr_add(s[k], rc));
    }
    t = fr_add(fr_add(s[0], s[1]), s[2]);
    s[0] = fr_add(s[0], t);
    s[1] = fr_add(s[1], t);
    s[2] = fr_add(s[2], t);
  }
}

// pack up to 8 u32 (base 2^32 LE) into one canonical-then-Montgomery Fr
static inline Fr pack_reduce32(const u32 *vals, int k) {
  u64 limbs[4] = {0, 0, 0, 0};
  for (int i = 0; i < k; ++i) limbs[i / 2] |= (u64)vals[i] << (32 * (i & 1));
  return fr_from_canonical(limbs);
}

static void hash_rows_range(const u32 *rows, u64 w, u64 lo, u64 hi,
                            u64 *out) {
  for (u64 r = lo; r < hi; ++r) {
    const u32 *row = rows + r * w;
    Fr s[3];
    memset(s, 0, sizeof(s));
    for (u64 c0 = 0; c0 < w; c0 += 16) {
      int chunk = (int)((w - c0 < 16) ? (w - c0) : 16);
      for (int j = 0; j < chunk; j += 8) {
        int k = (chunk - j < 8) ? (chunk - j) : 8;
        s[j / 8] = pack_reduce32(row + c0 + j, k);
      }
      permute(s);
    }
    fr_to_canonical(s[0], out + r * 4);
  }
}

static unsigned n_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n ? n : 4;
}

extern "C" {

void bn254_hash_rows(const u32 *rows, u64 n, u32 w, u64 *out) {
  unsigned nt = n_threads();
  if (n < 64 || nt <= 1) {
    hash_rows_range(rows, w, 0, n, out);
    return;
  }
  std::vector<std::thread> ts;
  u64 step = (n + nt - 1) / nt;
  for (unsigned t = 0; t < nt; ++t) {
    u64 lo = t * step, hi = (lo + step < n) ? lo + step : n;
    if (lo >= hi) break;
    ts.emplace_back(hash_rows_range, rows, (u64)w, lo, hi, out);
  }
  for (auto &t : ts) t.join();
}

void bn254_compress_pairs(const u64 *in, u64 n, u64 *out) {
  auto run = [&](u64 lo, u64 hi) {
    for (u64 i = lo; i < hi; ++i) {
      Fr s[3];
      s[0] = fr_from_canonical(in + 8 * i);
      s[1] = fr_from_canonical(in + 8 * i + 4);
      memset(&s[2], 0, sizeof(Fr));
      permute(s);
      fr_to_canonical(s[0], out + 4 * i);
    }
  };
  unsigned nt = n_threads();
  if (n < 64 || nt <= 1) {
    run(0, n);
    return;
  }
  std::vector<std::thread> ts;
  u64 step = (n + nt - 1) / nt;
  for (unsigned t = 0; t < nt; ++t) {
    u64 lo = t * step, hi = (lo + step < n) ? lo + step : n;
    if (lo >= hi) break;
    ts.emplace_back(run, lo, hi);
  }
  for (auto &t : ts) t.join();
}

void bn254_permute_batch(u64 *states, u64 n) {
  for (u64 i = 0; i < n; ++i) {
    Fr s[3];
    for (int k = 0; k < 3; ++k) s[k] = fr_from_canonical(states + 12 * i + 4 * k);
    permute(s);
    for (int k = 0; k < 3; ++k) fr_to_canonical(s[k], states + 12 * i + 4 * k);
  }
}

}  // extern "C"
