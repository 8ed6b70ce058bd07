// BN254 (alt_bn128) G1/G2 arithmetic + Pippenger MSM — the Groth16
// prover's hot path (reference: gnark's MSM behind gnark-ffi; here an
// in-house implementation backing ziren_tpu/snark/groth16.py).
//
// Fq arithmetic: 4x64 Montgomery CIOS (same structure as bn254_p2.cpp's
// Fr). G1 is y^2 = x^3 + 3 over Fq; G2 the sextic twist over
// Fq2 = Fq[u]/(u^2+1) with b' = 3/(9+u). Points cross the FFI as
// canonical LE limbs, affine; infinity travels as an explicit flag.
//
// Exports (C ABI, ctypes):
//   bn254_g1_msm(pts u64[n*8], scalars u64[n*4], n, out u64[9])
//       variable-base Pippenger; out = (x, y, inf_flag).
//   bn254_g1_fixed(base u64[8], scalars u64[n*4], n, out u64[n*9])
//       many scalars on one base via a shared 4-bit window table,
//       batch-normalized to affine.
//   bn254_g2_msm(pts u64[n*16], scalars u64[n*4], n, out u64[17])
//   bn254_g2_fixed(base u64[16], scalars u64[n*4], n, out u64[n*17])

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

typedef __uint128_t u128;
typedef uint64_t u64;
typedef uint32_t u32;

#include "bn254_curve_consts.inc"

struct Fq { u64 v[4]; };

static inline bool fq_geq_p(const u64 a[4]) {
  for (int i = 3; i >= 0; --i) {
    if (a[i] > FQ_P[i]) return true;
    if (a[i] < FQ_P[i]) return false;
  }
  return true;
}

static inline void fq_sub_p(u64 a[4]) {
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a[i] - FQ_P[i] - borrow;
    a[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
}

static inline Fq fq_add(const Fq &a, const Fq &b) {
  Fq r;
  u128 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)a.v[i] + b.v[i] + carry;
    r.v[i] = (u64)s;
    carry = s >> 64;
  }
  if (carry || fq_geq_p(r.v)) fq_sub_p(r.v);
  return r;
}

static inline Fq fq_sub(const Fq &a, const Fq &b) {
  Fq r;
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a.v[i] - b.v[i] - borrow;
    r.v[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
  if (borrow) {
    u128 carry = 0;
    for (int i = 0; i < 4; ++i) {
      u128 s = (u128)r.v[i] + FQ_P[i] + carry;
      r.v[i] = (u64)s;
      carry = s >> 64;
    }
  }
  return r;
}

static inline Fq fq_mul(const Fq &a, const Fq &b) {
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

    u64 m = t[0] * FQ_N0;
    u128 c = ((u128)t[0] + (u128)m * FQ_P[0]) >> 64;
    for (int j = 1; j < 4; ++j) {
      u128 s = (u128)t[j] + (u128)m * FQ_P[j] + c;
      t[j - 1] = (u64)s;
      c = s >> 64;
    }
    u128 s = (u128)t4 + c;
    t[3] = (u64)s;
    t[4] = t5 + (u64)(s >> 64);
  }
  Fq r;
  memcpy(r.v, t, 32);
  if (t[4] || fq_geq_p(r.v)) fq_sub_p(r.v);
  return r;
}

static inline Fq fq_dbl(const Fq &a) { return fq_add(a, a); }

static inline bool fq_is_zero(const Fq &a) {
  return !(a.v[0] | a.v[1] | a.v[2] | a.v[3]);
}

static const Fq FQ_ZERO = {{0, 0, 0, 0}};

static inline Fq fq_one() {
  Fq r;
  memcpy(r.v, FQ_R, 32);
  return r;
}

static inline Fq fq_neg(const Fq &a) {
  if (fq_is_zero(a)) return a;
  Fq p;
  memcpy(p.v, FQ_P, 32);
  return fq_sub(p, a);
}

static Fq fq_inv(const Fq &a) {
  // Fermat: a^(p-2); p-2 scanned MSB->LSB
  u64 e[4];
  memcpy(e, FQ_P, 32);
  // subtract 2
  u128 borrow = 2;
  for (int i = 0; i < 4 && borrow; ++i) {
    u128 d = (u128)e[i] - borrow;
    e[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
  Fq result = fq_one(), base = a;
  for (int limb = 0; limb < 4; ++limb)
    for (int bit = 0; bit < 64; ++bit) {
      if ((e[limb] >> bit) & 1) result = fq_mul(result, base);
      base = fq_mul(base, base);
    }
  return result;
}

static inline Fq fq_from_canonical(const u64 limbs[4]) {
  Fq a;
  memcpy(a.v, limbs, 32);
  Fq r2;
  memcpy(r2.v, FQ_R2, 32);
  return fq_mul(a, r2);
}

static inline void fq_to_canonical(const Fq &a, u64 out[4]) {
  Fq one = {{1, 0, 0, 0}};  // multiplying by raw 1 removes the R factor
  Fq c = fq_mul(a, one);
  memcpy(out, c.v, 32);
}

// ---------------------------------------------------------------------------
// Fq2 = Fq[u]/(u^2 + 1)
// ---------------------------------------------------------------------------

struct Fq2 { Fq c0, c1; };

static inline Fq2 f2_add(const Fq2 &a, const Fq2 &b) {
  return {fq_add(a.c0, b.c0), fq_add(a.c1, b.c1)};
}
static inline Fq2 f2_sub(const Fq2 &a, const Fq2 &b) {
  return {fq_sub(a.c0, b.c0), fq_sub(a.c1, b.c1)};
}
static inline Fq2 f2_mul(const Fq2 &a, const Fq2 &b) {
  Fq t0 = fq_mul(a.c0, b.c0);
  Fq t1 = fq_mul(a.c1, b.c1);
  Fq t2 = fq_mul(fq_add(a.c0, a.c1), fq_add(b.c0, b.c1));
  return {fq_sub(t0, t1), fq_sub(t2, fq_add(t0, t1))};
}
static inline Fq2 f2_dbl(const Fq2 &a) { return {fq_dbl(a.c0), fq_dbl(a.c1)}; }
static inline bool f2_is_zero(const Fq2 &a) {
  return fq_is_zero(a.c0) && fq_is_zero(a.c1);
}
static inline Fq2 f2_one() { return {fq_one(), FQ_ZERO}; }
static inline Fq2 f2_zero() { return {FQ_ZERO, FQ_ZERO}; }
static inline Fq2 f2_inv(const Fq2 &a) {
  Fq norm = fq_add(fq_mul(a.c0, a.c0), fq_mul(a.c1, a.c1));
  Fq ni = fq_inv(norm);
  return {fq_mul(a.c0, ni), fq_neg(fq_mul(a.c1, ni))};
}

// ---------------------------------------------------------------------------
// Jacobian points, templated over the coordinate field via macros-free
// duplication (G1 over Fq, G2 over Fq2) — same formulas (a = 0 curve)
// ---------------------------------------------------------------------------

template <typename F>
struct Pt { F x, y, z; };  // z == 0 <=> infinity

template <typename F> static inline F f_add(const F &a, const F &b);
template <typename F> static inline F f_sub(const F &a, const F &b);
template <typename F> static inline F f_mul(const F &a, const F &b);
template <typename F> static inline F f_dbl(const F &a);
template <typename F> static inline bool f_is0(const F &a);
template <typename F> static inline F f_one();
template <typename F> static inline F f_zero();

template <> inline Fq f_add(const Fq &a, const Fq &b) { return fq_add(a, b); }
template <> inline Fq f_sub(const Fq &a, const Fq &b) { return fq_sub(a, b); }
template <> inline Fq f_mul(const Fq &a, const Fq &b) { return fq_mul(a, b); }
template <> inline Fq f_dbl(const Fq &a) { return fq_dbl(a); }
template <> inline bool f_is0(const Fq &a) { return fq_is_zero(a); }
template <> inline Fq f_one() { return fq_one(); }
template <> inline Fq f_zero() { return FQ_ZERO; }

template <> inline Fq2 f_add(const Fq2 &a, const Fq2 &b) { return f2_add(a, b); }
template <> inline Fq2 f_sub(const Fq2 &a, const Fq2 &b) { return f2_sub(a, b); }
template <> inline Fq2 f_mul(const Fq2 &a, const Fq2 &b) { return f2_mul(a, b); }
template <> inline Fq2 f_dbl(const Fq2 &a) { return f2_dbl(a); }
template <> inline bool f_is0(const Fq2 &a) { return f2_is_zero(a); }
template <> inline Fq2 f_one() { return f2_one(); }
template <> inline Fq2 f_zero() { return f2_zero(); }

template <typename F>
static inline bool pt_is_inf(const Pt<F> &p) { return f_is0<F>(p.z); }

template <typename F>
static Pt<F> pt_dbl(const Pt<F> &p) {
  if (pt_is_inf(p)) return p;
  // dbl-2009-l (a=0): A=X^2, B=Y^2, C=B^2, D=2((X+B)^2-A-C), E=3A, F=E^2
  F A = f_mul(p.x, p.x);
  F B = f_mul(p.y, p.y);
  F C = f_mul(B, B);
  F t = f_add(p.x, B);
  F D = f_sub(f_sub(f_mul(t, t), A), C);
  D = f_dbl(D);
  F E = f_add(f_dbl(A), A);
  F Fv = f_mul(E, E);
  Pt<F> r;
  r.x = f_sub(Fv, f_dbl(D));
  F C8 = f_dbl(f_dbl(f_dbl(C)));
  r.y = f_sub(f_mul(E, f_sub(D, r.x)), C8);
  r.z = f_dbl(f_mul(p.y, p.z));
  return r;
}

template <typename F>
static Pt<F> pt_add(const Pt<F> &p, const Pt<F> &q) {
  if (pt_is_inf(p)) return q;
  if (pt_is_inf(q)) return p;
  // add-2007-bl
  F Z1Z1 = f_mul(p.z, p.z);
  F Z2Z2 = f_mul(q.z, q.z);
  F U1 = f_mul(p.x, Z2Z2);
  F U2 = f_mul(q.x, Z1Z1);
  F S1 = f_mul(f_mul(p.y, q.z), Z2Z2);
  F S2 = f_mul(f_mul(q.y, p.z), Z1Z1);
  F H = f_sub(U2, U1);
  F rr = f_dbl(f_sub(S2, S1));
  if (f_is0(H)) {
    if (f_is0(rr)) return pt_dbl(p);
    Pt<F> inf = {f_one<F>(), f_one<F>(), f_zero<F>()};
    return inf;
  }
  F I = f_mul(f_dbl(H), f_dbl(H));
  F J = f_mul(H, I);
  F V = f_mul(U1, I);
  Pt<F> r;
  r.x = f_sub(f_sub(f_mul(rr, rr), J), f_dbl(V));
  r.y = f_sub(f_mul(rr, f_sub(V, r.x)), f_dbl(f_mul(S1, J)));
  F zs = f_add(p.z, q.z);
  r.z = f_mul(f_sub(f_sub(f_mul(zs, zs), Z1Z1), Z2Z2), H);
  return r;
}

// mixed add: q affine (z = 1)
template <typename F>
static Pt<F> pt_add_affine(const Pt<F> &p, const F &qx, const F &qy) {
  if (pt_is_inf(p)) {
    Pt<F> r = {qx, qy, f_one<F>()};
    return r;
  }
  F Z1Z1 = f_mul(p.z, p.z);
  F U2 = f_mul(qx, Z1Z1);
  F S2 = f_mul(f_mul(qy, p.z), Z1Z1);
  F H = f_sub(U2, p.x);
  F rr = f_dbl(f_sub(S2, p.y));
  if (f_is0(H)) {
    if (f_is0(rr)) return pt_dbl(p);
    Pt<F> inf = {f_one<F>(), f_one<F>(), f_zero<F>()};
    return inf;
  }
  F HH = f_mul(H, H);
  F I = f_dbl(f_dbl(HH));
  F J = f_mul(H, I);
  F V = f_mul(p.x, I);
  Pt<F> r;
  r.x = f_sub(f_sub(f_mul(rr, rr), J), f_dbl(V));
  r.y = f_sub(f_mul(rr, f_sub(V, r.x)), f_dbl(f_mul(p.y, J)));
  F zh = f_add(p.z, H);
  r.z = f_sub(f_sub(f_mul(zh, zh), Z1Z1), HH);
  return r;
}

// ---------------------------------------------------------------------------
// Pippenger MSM (scalars canonical 4x64 LE)
// ---------------------------------------------------------------------------

static inline unsigned scalar_window(const u64 s[4], unsigned start,
                                     unsigned c) {
  unsigned limb = start >> 6, off = start & 63;
  u64 lo = s[limb] >> off;
  if (off + c > 64 && limb + 1 < 4) lo |= s[limb + 1] << (64 - off);
  return (unsigned)(lo & ((1u << c) - 1));
}

template <typename F>
static Pt<F> msm(const F *xs, const F *ys, const u64 *scalars, size_t n) {
  Pt<F> inf = {f_one<F>(), f_one<F>(), f_zero<F>()};
  if (n == 0) return inf;
  unsigned c = n < 32 ? 3 : (n < 1024 ? 7 : (n < 65536 ? 11 : 14));
  unsigned nwin = (254 + c - 1) / c;
  size_t nbuck = ((size_t)1 << c) - 1;

  unsigned nthreads = std::thread::hardware_concurrency();
  if (nthreads == 0) nthreads = 4;
  if (nthreads > nwin) nthreads = nwin;
  std::vector<Pt<F>> win_res(nwin, inf);

  auto worker = [&](unsigned tid) {
    std::vector<Pt<F>> buckets(nbuck);
    for (unsigned w = tid; w < nwin; w += nthreads) {
      for (size_t b = 0; b < nbuck; ++b) buckets[b] = inf;
      for (size_t i = 0; i < n; ++i) {
        unsigned digit = scalar_window(scalars + 4 * i, w * c, c);
        if (digit)
          buckets[digit - 1] = pt_add_affine(buckets[digit - 1], xs[i], ys[i]);
      }
      Pt<F> run = inf, sum = inf;
      for (size_t b = nbuck; b > 0; --b) {
        run = pt_add(run, buckets[b - 1]);
        sum = pt_add(sum, run);
      }
      win_res[w] = sum;
    }
  };
  std::vector<std::thread> ts;
  for (unsigned t = 0; t < nthreads; ++t) ts.emplace_back(worker, t);
  for (auto &t : ts) t.join();

  Pt<F> acc = inf;
  for (unsigned w = nwin; w > 0; --w) {
    for (unsigned k = 0; k < c; ++k) acc = pt_dbl(acc);
    acc = pt_add(acc, win_res[w - 1]);
  }
  return acc;
}

// fixed-base: one 4-bit window table shared across all scalars
template <typename F>
static void fixed_base(const F &bx, const F &by, const u64 *scalars, size_t n,
                       Pt<F> *out) {
  const unsigned c = 4;
  const unsigned nwin = (254 + c - 1) / c;  // 64
  Pt<F> inf = {f_one<F>(), f_one<F>(), f_zero<F>()};
  // table[w][d] = d * 16^w * B
  std::vector<Pt<F>> table(nwin * 15);
  Pt<F> base = {bx, by, f_one<F>()};
  for (unsigned w = 0; w < nwin; ++w) {
    Pt<F> acc = inf;
    for (unsigned d = 1; d <= 15; ++d) {
      acc = pt_add(acc, base);
      table[w * 15 + d - 1] = acc;
    }
    for (unsigned k = 0; k < c; ++k) base = pt_dbl(base);
  }
  unsigned nthreads = std::thread::hardware_concurrency();
  if (nthreads == 0) nthreads = 4;
  auto worker = [&](unsigned tid) {
    for (size_t i = tid; i < n; i += nthreads) {
      Pt<F> acc = inf;
      for (unsigned w = 0; w < nwin; ++w) {
        unsigned digit = scalar_window(scalars + 4 * i, w * c, c);
        if (digit) acc = pt_add(acc, table[w * 15 + digit - 1]);
      }
      out[i] = acc;
    }
  };
  std::vector<std::thread> ts;
  for (unsigned t = 0; t < nthreads; ++t) ts.emplace_back(worker, t);
  for (auto &t : ts) t.join();
}

// ---------------------------------------------------------------------------
// FFI marshalling
// ---------------------------------------------------------------------------

static void g1_out(const Pt<Fq> &p, u64 *out) {
  if (pt_is_inf(p)) {
    memset(out, 0, 8 * 8);
    out[8] = 1;
    return;
  }
  Fq zi = fq_inv(p.z);
  Fq zi2 = fq_mul(zi, zi);
  Fq zi3 = fq_mul(zi2, zi);
  fq_to_canonical(fq_mul(p.x, zi2), out);
  fq_to_canonical(fq_mul(p.y, zi3), out + 4);
  out[8] = 0;
}

static void g2_out(const Pt<Fq2> &p, u64 *out) {
  if (pt_is_inf(p)) {
    memset(out, 0, 16 * 8);
    out[16] = 1;
    return;
  }
  Fq2 zi = f2_inv(p.z);
  Fq2 zi2 = f2_mul(zi, zi);
  Fq2 zi3 = f2_mul(zi2, zi);
  Fq2 x = f2_mul(p.x, zi2), y = f2_mul(p.y, zi3);
  fq_to_canonical(x.c0, out);
  fq_to_canonical(x.c1, out + 4);
  fq_to_canonical(y.c0, out + 8);
  fq_to_canonical(y.c1, out + 12);
  out[16] = 0;
}

extern "C" {

void bn254_g1_msm(const u64 *pts, const u64 *scalars, u64 n, u64 *out) {
  std::vector<Fq> xs(n), ys(n);
  for (u64 i = 0; i < n; ++i) {
    xs[i] = fq_from_canonical(pts + 8 * i);
    ys[i] = fq_from_canonical(pts + 8 * i + 4);
  }
  g1_out(msm<Fq>(xs.data(), ys.data(), scalars, n), out);
}

void bn254_g1_fixed(const u64 *base, const u64 *scalars, u64 n, u64 *out) {
  Fq bx = fq_from_canonical(base), by = fq_from_canonical(base + 4);
  std::vector<Pt<Fq>> res(n);
  fixed_base<Fq>(bx, by, scalars, n, res.data());
  for (u64 i = 0; i < n; ++i) g1_out(res[i], out + 9 * i);
}

void bn254_g2_msm(const u64 *pts, const u64 *scalars, u64 n, u64 *out) {
  std::vector<Fq2> xs(n), ys(n);
  for (u64 i = 0; i < n; ++i) {
    xs[i] = {fq_from_canonical(pts + 16 * i),
             fq_from_canonical(pts + 16 * i + 4)};
    ys[i] = {fq_from_canonical(pts + 16 * i + 8),
             fq_from_canonical(pts + 16 * i + 12)};
  }
  g2_out(msm<Fq2>(xs.data(), ys.data(), scalars, n), out);
}

void bn254_g2_fixed(const u64 *base, const u64 *scalars, u64 n, u64 *out) {
  Fq2 bx = {fq_from_canonical(base), fq_from_canonical(base + 4)};
  Fq2 by = {fq_from_canonical(base + 8), fq_from_canonical(base + 12)};
  std::vector<Pt<Fq2>> res(n);
  fixed_base<Fq2>(bx, by, scalars, n, res.data());
  for (u64 i = 0; i < n; ++i) g2_out(res[i], out + 17 * i);
}

}  // extern "C"
