// Radix-2 NTT over the BN254 scalar field — the Groth16 QAP hot path
// (snark/groth16.py h(X) computation at wrap-circuit scale: domains of
// 2^22+ elements, where a python NTT would take tens of minutes).
//
// Fr arithmetic: 4x64 Montgomery CIOS (constants shared with bn254_p2.cpp
// via bn254_rc.inc). One twiddle table of root powers serves every level
// (w_len^i = root^(i * n/len)). Butterflies are threaded per level over
// the flat butterfly index space.
//
// Exports (C ABI, ctypes):
//   bn254_ntt(vals u64[n*4] in/out canonical, n, root u64[4] canonical
//             primitive n-th root for the FORWARD transform, invert,
//             n_inv u64[4] canonical)
//     invert != 0: uses root^-1 (caller passes the inverse root) and
//     scales by n_inv. Caller supplies both precomputed.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

typedef __uint128_t u128;
typedef uint64_t u64;
typedef uint32_t u32;

#include "bn254_rc.inc"

struct Fr { u64 v[4]; };

static inline bool geq_p(const u64 a[4]) {
  for (int i = 3; i >= 0; --i) {
    if (a[i] > FR_P[i]) return true;
    if (a[i] < FR_P[i]) return false;
  }
  return true;
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

static inline Fr fr_sub(const Fr &a, const Fr &b) {
  Fr r;
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a.v[i] - b.v[i] - borrow;
    r.v[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
  if (borrow) {
    u128 carry = 0;
    for (int i = 0; i < 4; ++i) {
      u128 s = (u128)r.v[i] + FR_P[i] + carry;
      r.v[i] = (u64)s;
      carry = s >> 64;
    }
  }
  return r;
}

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

static inline Fr to_mont(const Fr &a) {
  Fr r2;
  memcpy(r2.v, FR_R2, 32);
  return fr_mul(a, r2);
}

static inline Fr from_mont(const Fr &a) {
  Fr one = {{1, 0, 0, 0}};
  return fr_mul(a, one);
}

extern "C" {

void bn254_ntt(u64 *vals, u64 n, const u64 *root, int invert,
               const u64 *n_inv) {
  Fr *a = reinterpret_cast<Fr *>(vals);
  unsigned nthreads = std::thread::hardware_concurrency();
  if (nthreads == 0) nthreads = 4;

  auto par = [&](u64 total, auto fn) {
    if (total < 4096 || nthreads <= 1) {
      fn((u64)0, total);
      return;
    }
    std::vector<std::thread> ts;
    u64 chunk = (total + nthreads - 1) / nthreads;
    for (unsigned t = 0; t < nthreads; ++t) {
      u64 lo = t * chunk, hi = lo + chunk > total ? total : lo + chunk;
      if (lo >= hi) break;
      ts.emplace_back(fn, lo, hi);
    }
    for (auto &t : ts) t.join();
  };

  par(n, [&](u64 lo, u64 hi) {
    for (u64 i = lo; i < hi; ++i) a[i] = to_mont(a[i]);
  });

  // bit-reversal permutation
  {
    u64 j = 0;
    for (u64 i = 1; i < n; ++i) {
      u64 bit = n >> 1;
      while (j & bit) {
        j ^= bit;
        bit >>= 1;
      }
      j |= bit;
      if (i < j) {
        Fr tmp = a[i];
        a[i] = a[j];
        a[j] = tmp;
      }
    }
  }

  // one table of root powers serves all levels: w_len^i = root^(i * n/len)
  Fr rootm = to_mont(*reinterpret_cast<const Fr *>(root));
  std::vector<Fr> tw(n / 2);
  if (n >= 2) {
    Fr one = {{1, 0, 0, 0}};
    tw[0] = to_mont(one);
    for (u64 i = 1; i < n / 2; ++i) tw[i] = fr_mul(tw[i - 1], rootm);
  }

  for (u64 length = 2; length <= n; length <<= 1) {
    u64 half = length >> 1;
    u64 stride = n / length;
    u64 nbf = n / 2;  // total butterflies this level
    par(nbf, [&](u64 lo, u64 hi) {
      for (u64 f = lo; f < hi; ++f) {
        u64 blk = f / half, i = f % half;
        u64 base = blk * length;
        Fr u = a[base + i];
        Fr v = fr_mul(a[base + i + half], tw[i * stride]);
        a[base + i] = fr_add(u, v);
        a[base + i + half] = fr_sub(u, v);
      }
    });
  }

  Fr scale;
  bool do_scale = invert != 0;
  if (do_scale) scale = to_mont(*reinterpret_cast<const Fr *>(n_inv));
  par(n, [&](u64 lo, u64 hi) {
    for (u64 i = lo; i < hi; ++i) {
      if (do_scale) a[i] = fr_mul(a[i], scale);
      a[i] = from_mont(a[i]);
    }
  });
}

}  // extern "C"
