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

static inline Fr fr_pow(const Fr &a_mont, const u64 e[4]) {
  // square-and-multiply; result in Montgomery form (a_mont in Montgomery)
  Fr one = {{1, 0, 0, 0}};
  Fr r = to_mont(one);
  Fr base = a_mont;
  for (int limb = 0; limb < 4; ++limb) {
    for (int bit = 0; bit < 64; ++bit) {
      if ((e[limb] >> bit) & 1) r = fr_mul(r, base);
      base = fr_mul(base, base);
    }
  }
  return r;
}

static inline void p_minus_2(u64 e[4]) {
  u64 b = 2;
  for (int i = 0; i < 4; ++i) {
    u64 v = FR_P[i];
    e[i] = v - b;
    b = (v < b) ? 1 : 0;
  }
}

static inline Fr fr_inv_mont(const Fr &a_mont) {
  u64 e[4];
  p_minus_2(e);
  return fr_pow(a_mont, e);
}

// Shared thread-parallel driver for the vector kernels below.
template <typename Fn>
static void fr_par(u64 total, Fn fn) {
  unsigned nthreads = std::thread::hardware_concurrency();
  if (nthreads == 0) nthreads = 4;
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
}

extern "C" {

// Fr VECTOR KERNELS — the SNARK layer's pointwise hot loops
// (snark/plonk.py quotient/grand-product/fold passes, snark/groth16.py
// coset combine). All buffers are canonical-form 4x64 LE limbs.
// Reference analogue: gnark's field vector ops behind backend/plonk —
// rebuilt here so the python prover's O(n) passes run native+threaded.

// op: 0=add, 1=sub, 2=mul. out may alias a or b.
void bn254_fr_vec_op(const u64 *a, const u64 *b, u64 n, int op, u64 *out) {
  const Fr *A = reinterpret_cast<const Fr *>(a);
  const Fr *B = reinterpret_cast<const Fr *>(b);
  Fr *O = reinterpret_cast<Fr *>(out);
  if (op == 2) {
    Fr r2;
    memcpy(r2.v, FR_R2, 32);
    fr_par(n, [&](u64 lo, u64 hi) {
      for (u64 i = lo; i < hi; ++i)
        O[i] = fr_mul(fr_mul(A[i], r2), B[i]);  // a*b canonical: 2 montmuls
    });
  } else if (op == 1) {
    fr_par(n, [&](u64 lo, u64 hi) {
      for (u64 i = lo; i < hi; ++i) O[i] = fr_sub(A[i], B[i]);
    });
  } else {
    fr_par(n, [&](u64 lo, u64 hi) {
      for (u64 i = lo; i < hi; ++i) O[i] = fr_add(A[i], B[i]);
    });
  }
}

// out = a * s (scalar); one montmul per element.
void bn254_fr_vec_scale(const u64 *a, const u64 *s, u64 n, u64 *out) {
  const Fr *A = reinterpret_cast<const Fr *>(a);
  Fr *O = reinterpret_cast<Fr *>(out);
  Fr sm = to_mont(*reinterpret_cast<const Fr *>(s));
  fr_par(n, [&](u64 lo, u64 hi) {
    for (u64 i = lo; i < hi; ++i) O[i] = fr_mul(A[i], sm);
  });
}

// acc += s * c (scalar s, vector c) — the linearization accumulate.
void bn254_fr_vec_axpy(u64 *acc, const u64 *s, const u64 *c, u64 n) {
  Fr *A = reinterpret_cast<Fr *>(acc);
  const Fr *C = reinterpret_cast<const Fr *>(c);
  Fr sm = to_mont(*reinterpret_cast<const Fr *>(s));
  fr_par(n, [&](u64 lo, u64 hi) {
    for (u64 i = lo; i < hi; ++i) A[i] = fr_add(A[i], fr_mul(C[i], sm));
  });
}

// out[i] = start * base^i — geometric progression (coset shifts, domain
// points). Threads jump-start with fr_pow(base, lo).
void bn254_fr_powers(const u64 *base, const u64 *start, u64 n, u64 *out) {
  Fr *O = reinterpret_cast<Fr *>(out);
  Fr bm = to_mont(*reinterpret_cast<const Fr *>(base));
  Fr st = *reinterpret_cast<const Fr *>(start);
  fr_par(n, [&](u64 lo, u64 hi) {
    u64 e[4] = {lo, 0, 0, 0};
    Fr cur = fr_mul(st, fr_pow(bm, e));  // canonical: st * base^lo
    for (u64 i = lo; i < hi; ++i) {
      O[i] = cur;
      cur = fr_mul(cur, bm);
    }
  });
}

// Horner evaluation: out = sum coeffs[k] x^k (coeffs[0] = constant term).
void bn254_fr_horner(const u64 *coeffs, u64 n, const u64 *x, u64 *out) {
  const Fr *C = reinterpret_cast<const Fr *>(coeffs);
  Fr xm = to_mont(*reinterpret_cast<const Fr *>(x));
  Fr acc = {{0, 0, 0, 0}};
  for (u64 k = n; k-- > 0;) acc = fr_add(fr_mul(acc, xm), C[k]);
  memcpy(out, acc.v, 32);
}

// Synthetic division: out (len n-1) = (p(X) - p(x0)) / (X - x0).
void bn254_fr_div_linear(const u64 *coeffs, u64 n, const u64 *x0, u64 *out) {
  const Fr *C = reinterpret_cast<const Fr *>(coeffs);
  Fr *O = reinterpret_cast<Fr *>(out);
  Fr xm = to_mont(*reinterpret_cast<const Fr *>(x0));
  Fr acc = {{0, 0, 0, 0}};
  for (u64 k = n; k-- > 1;) {
    acc = fr_add(fr_mul(acc, xm), C[k]);
    O[k - 1] = acc;
  }
}

// Running products: out[0] = 1, out[i] = a[0] * ... * a[i-1] (the Plonk
// grand-product z over H). Sequential — one montmul per element.
void bn254_fr_prefix_mul(const u64 *a, u64 n, u64 *out) {
  const Fr *A = reinterpret_cast<const Fr *>(a);
  Fr *O = reinterpret_cast<Fr *>(out);
  Fr r2;
  memcpy(r2.v, FR_R2, 32);
  Fr one = {{1, 0, 0, 0}};
  Fr run = one;  // canonical
  for (u64 i = 0; i < n; ++i) {
    O[i] = run;
    run = fr_mul(fr_mul(run, r2), A[i]);
  }
}

// Batched inversion (Montgomery trick), 0 -> 0. Chunked so per-task
// scratch stays bounded (~16 MB) on multi-GB domains.
void bn254_fr_batch_inv(const u64 *a, u64 n, u64 *out) {
  const Fr *A = reinterpret_cast<const Fr *>(a);
  Fr *O = reinterpret_cast<Fr *>(out);
  const u64 CHUNK = 1ull << 18;
  u64 ntasks = (n + CHUNK - 1) / CHUNK;
  fr_par(ntasks, [&](u64 tlo, u64 thi) {
    std::vector<Fr> am(CHUNK), pre(CHUNK);
    Fr r2;
    memcpy(r2.v, FR_R2, 32);
    Fr one = {{1, 0, 0, 0}};
    Fr one_m = to_mont(one);
    for (u64 t = tlo; t < thi; ++t) {
      u64 lo = t * CHUNK, hi = lo + CHUNK > n ? n : lo + CHUNK;
      u64 m = hi - lo;
      Fr run = one_m;
      for (u64 i = 0; i < m; ++i) {
        am[i] = fr_mul(A[lo + i], r2);  // to mont
        bool zero = !(am[i].v[0] | am[i].v[1] | am[i].v[2] | am[i].v[3]);
        pre[i] = run;
        if (!zero) run = fr_mul(run, am[i]);
      }
      Fr inv = fr_inv_mont(run);
      for (u64 i = m; i-- > 0;) {
        bool zero = !(am[i].v[0] | am[i].v[1] | am[i].v[2] | am[i].v[3]);
        if (zero) {
          Fr z = {{0, 0, 0, 0}};
          O[lo + i] = z;
        } else {
          O[lo + i] = from_mont(fr_mul(inv, pre[i]));
          inv = fr_mul(inv, am[i]);
        }
      }
    }
  });
}

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
