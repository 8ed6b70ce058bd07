"""KoalaBear field arithmetic on device (JAX / XLA / TPU path).

Device representation: **Montgomery form with R = 2^32**, stored as uint32.
TPUs have no 64-bit integer mulhi, so products are assembled from 16-bit limb
multiplies (all uint32 ops, VPU-friendly). Montgomery commutes with the
permutation/hash structure, so traces live in Montgomery form on device end to
end; canonical encode/decode happens only at host boundaries.

    mont(x) = x * 2^32 mod p
    mont_mul(mont(a), mont(b)) = mont(a*b)

The reduction is a standard REDC:
    m = lo * MU mod 2^32        (MU = -p^{-1} mod 2^32)
    t = hi + mulhi(m, p) + (lo != 0)
    t -= p if t >= p
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ziren_tpu.core import field as F


def _cpu_backend() -> bool:
    try:
        return jax.default_backend() == "cpu"
    except Exception:  # pragma: no cover - backend init failure
        return True


# On CPU the REDC is computed with native 64-bit products (~4x fewer XLA ops
# per mont_mul -> much faster tracing/compilation of chip kernels); on TPU,
# which has no 64-bit integer mulhi, it is assembled from 16-bit limb
# multiplies. Both paths compute the identical function bit for bit.
_U64 = _cpu_backend()
if _U64:
    jax.config.update("jax_enable_x64", True)

# numpy scalars (NOT jnp): they embed as jaxpr literals, which keeps every
# jf.* helper usable inside Pallas kernel bodies (captured device-array
# constants are rejected by pallas_call)
P = np.uint32(F.P_INT)
MU = np.uint32(F.MONTY_MU)
R1 = np.uint32(F.MONTY_R)  # mont(1)
R2 = np.uint32(F.MONTY_R2)  # mont(2^32) — encoding multiplier
_P_HI16 = np.uint32(F.P_INT >> 16)  # 0x7f00
_MASK16 = np.uint32(0xFFFF)
_P64 = np.uint64(F.P_INT)
_S32 = np.uint64(32)


def _mul_wide(a, b):
    """Full 64-bit product of uint32 inputs as (hi, lo) uint32 pair."""
    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    m00 = a0 * b0
    m10 = a1 * b0
    m01 = a0 * b1
    m11 = a1 * b1
    mid = m10 + m01
    mid_carry = (mid < m10).astype(jnp.uint32)  # wrapped -> carry of 2^32
    lo = m00 + (mid << 16)
    lo_carry = (lo < m00).astype(jnp.uint32)
    hi = m11 + (mid >> 16) + (mid_carry << 16) + lo_carry
    return hi, lo


def _mulhi_p(m):
    """High 32 bits of m * p for p = 0x7f00_0001 (2 multiplies)."""
    m0 = m & _MASK16
    m1 = m >> 16
    c = m0 * _P_HI16  # < 2^31
    s = m1 * _P_HI16 + (c >> 16)  # < 2^30 + 2^15
    low = ((c & _MASK16) << 16) + m  # wrapping
    carry = (low < m).astype(jnp.uint32)
    return s + carry


def mont_mul(a, b):
    """Montgomery product on uint32 arrays (mont in -> mont out)."""
    if _U64:
        prod = jnp.asarray(a).astype(jnp.uint64) * jnp.asarray(b).astype(jnp.uint64)
        lo = prod.astype(jnp.uint32)
        hi = (prod >> _S32).astype(jnp.uint32)
        m = lo * MU  # wrapping low product
        mp_hi = ((m.astype(jnp.uint64) * _P64) >> _S32).astype(jnp.uint32)
        t = hi + mp_hi + (lo != 0).astype(jnp.uint32)
        return jnp.where(t >= P, t - P, t)
    hi, lo = _mul_wide(a, b)
    m = lo * MU  # wrapping low product
    t = hi + _mulhi_p(m) + (lo != 0).astype(jnp.uint32)
    return jnp.where(t >= P, t - P, t)


def madd(a, b):
    s = a + b
    return jnp.where(s >= P, s - P, s)


def msub(a, b):
    d = a - b
    return jnp.where(a < b, d + P, d)


def mneg(a):
    return jnp.where(a == 0, a, P - a)


def mont_encode(x):
    """canonical uint32 -> Montgomery form."""
    return mont_mul(x.astype(jnp.uint32), R2)


def mont_decode(x):
    """Montgomery form -> canonical uint32 (REDC with hi=0)."""
    m = x * MU
    if _U64:
        mp_hi = ((m.astype(jnp.uint64) * _P64) >> _S32).astype(jnp.uint32)
    else:
        mp_hi = _mulhi_p(m)
    t = mp_hi + (x != 0).astype(jnp.uint32)
    return jnp.where(t >= P, t - P, t)


def mont_pow(a, e: int):
    """a**e for a static integer exponent (square-and-multiply, unrolled)."""
    result = jnp.full_like(a, R1)
    base = a
    while e > 0:
        if e & 1:
            result = mont_mul(result, base)
        base = mont_mul(base, base)
        e >>= 1
    return result


def minv(a):
    """Batched inverse via Fermat (a^(p-2)); 0 maps to 0."""
    return mont_pow(a, F.P_INT - 2)


# ---------------------------------------------------------------------------
# Quartic extension (x^4 = 3) on device. Layout: (..., 4) uint32 mont arrays.
# ---------------------------------------------------------------------------


def emul(a, b):
    """Ext4 schoolbook multiply; inputs/outputs (..., 4) in mont form."""
    a0, a1, a2, a3 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    b0, b1, b2, b3 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]

    def m(x, y):
        return mont_mul(x, y)

    def x3(v):  # multiply by W=3 (two adds)
        return madd(madd(v, v), v)

    c0 = madd(m(a0, b0), x3(madd(madd(m(a1, b3), m(a2, b2)), m(a3, b1))))
    c1 = madd(madd(m(a0, b1), m(a1, b0)), x3(madd(m(a2, b3), m(a3, b2))))
    c2 = madd(madd(m(a0, b2), m(a1, b1)), madd(m(a2, b0), x3(m(a3, b3))))
    c3 = madd(madd(m(a0, b3), m(a1, b2)), madd(m(a2, b1), m(a3, b0)))
    return jnp.stack([c0, c1, c2, c3], axis=-1)


def eadd(a, b):
    return madd(a, b)


def esub(a, b):
    return msub(a, b)


def emul_base(a, b):
    """ext (..., 4) * base (...,)."""
    return mont_mul(a, b[..., None])


def efrom_base(a):
    return jnp.stack([a, jnp.zeros_like(a), jnp.zeros_like(a), jnp.zeros_like(a)], axis=-1)


_GAMMA_POWERS = [
    [pow(pow(3, (F.P_INT - 1) // 4, F.P_INT), k * i, F.P_INT) for i in range(4)]
    for k in range(4)
]


def _frob_consts(k: int):
    vals = [(v << 32) % F.P_INT for v in _GAMMA_POWERS[k]]  # mont-encoded
    return jnp.array(vals, dtype=jnp.uint32)


def efrobenius(a, k: int = 1):
    return mont_mul(a, _frob_consts(k))


def einv(a):
    """Ext4 inverse via the norm map; zero maps to zero."""
    b = emul(efrobenius(a, 1), efrobenius(a, 2))
    b = emul(b, efrobenius(a, 3))
    norm = emul(a, b)[..., 0]
    return emul_base(b, minv(norm))


def to_host(x) -> np.ndarray:
    """Device mont array -> canonical numpy uint32."""
    return np.asarray(jax.device_get(mont_decode(x)), dtype=np.uint32)


def from_host(x) -> jnp.ndarray:
    """Canonical numpy uint32 -> device mont array."""
    return mont_encode(jnp.asarray(np.asarray(x, dtype=np.uint32)))
