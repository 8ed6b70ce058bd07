"""Radix-2 NTT / coset LDE on device (JAX path, Montgomery form).

Device counterpart of core/ntt.py: iterative DIT butterflies over uint32
Montgomery lattices (mont_mul = 16-bit limb mulhi emulation, VPU-friendly;
see ops/jfield.py). The stage loop is unrolled at trace time (log n stages);
twiddles are precomputed per stage as constants. Matches the host NTT
bit-exactly after Montgomery decode.

TPU-scaling note (SURVEY.md §7): for pod-scale transforms the stages above
VMEM capacity run as a four-step NTT with the transpose exchanged all-to-all
across the mesh; this single-chip kernel is the building block.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ziren_tpu.core import field as F
from . import jfield as jf


def _stage_twiddles(log_n: int) -> list:
    """Montgomery-form twiddle tables per stage (natural DIT order)."""
    n = 1 << log_n
    root = F.two_adic_generator(log_n)
    out = []
    for stage in range(log_n):
        half = 1 << stage
        w_span = pow(root, n >> (stage + 1), F.P_INT)
        tw = F.powers(w_span, half).astype(np.uint64)
        out.append(jnp.asarray((tw << np.uint64(32)) % np.uint64(F.P_INT), dtype=jnp.uint32))
    return out


@partial(jax.jit, static_argnames=("log_n", "inverse"))
def ntt_mont(mat, log_n: int, inverse: bool = False):
    """(n, w) mont matrix (bit-reversed row order in) -> natural order out.

    Callers pass natural-order input through `bitrev` first; this kernel is
    the butterfly cascade only.
    """
    n = 1 << log_n
    x = mat
    tws = _stage_twiddles(log_n)
    if inverse:
        inv_tables = []
        root_inv = pow(F.two_adic_generator(log_n), F.P_INT - 2, F.P_INT)
        for stage in range(log_n):
            half = 1 << stage
            w_span = pow(root_inv, n >> (stage + 1), F.P_INT)
            tw = F.powers(w_span, half).astype(np.uint64)
            inv_tables.append(
                jnp.asarray((tw << np.uint64(32)) % np.uint64(F.P_INT), dtype=jnp.uint32)
            )
        tws = inv_tables
    for stage in range(log_n):
        half = 1 << stage
        span = half << 1
        blocks = x.reshape(n // span, span, -1)
        lo = blocks[:, :half, :]
        hi = blocks[:, half:, :]
        t = jf.mont_mul(hi, tws[stage][None, :, None])
        new_lo = jf.madd(lo, t)
        new_hi = jf.msub(lo, t)
        x = jnp.concatenate([new_lo, new_hi], axis=1).reshape(n, -1)
    if inverse:
        n_inv = (pow(n, F.P_INT - 2, F.P_INT) << 32) % F.P_INT
        x = jf.mont_mul(x, jnp.uint32(n_inv))
    return x


def bitrev_rows(mat_np: np.ndarray) -> np.ndarray:
    n = mat_np.shape[0]
    return mat_np[F.bit_reverse_indices(n.bit_length() - 1)]


def ntt_device(mat_np: np.ndarray) -> np.ndarray:
    """Host-facing helper: canonical (n, w) -> NTT evals, via the device."""
    n = mat_np.shape[0]
    log_n = n.bit_length() - 1
    x = jf.from_host(bitrev_rows(mat_np))
    out = ntt_mont(x, log_n)
    return jf.to_host(out)


def intt_device(mat_np: np.ndarray) -> np.ndarray:
    n = mat_np.shape[0]
    log_n = n.bit_length() - 1
    x = jf.from_host(bitrev_rows(mat_np))
    out = ntt_mont(x, log_n, inverse=True)
    return jf.to_host(out)


def coset_lde_device(evals_np: np.ndarray, added_bits: int, shift: int) -> np.ndarray:
    """Coset LDE through the device NTT kernels (canonical in/out)."""
    n = evals_np.shape[0]
    coeffs = intt_device(evals_np)
    sh = F.powers(shift, n)
    scaled = F.fmul(coeffs, sh[:, None])
    big = np.zeros((n << added_bits, evals_np.shape[1]), dtype=np.uint32)
    big[:n] = scaled
    return ntt_device(big)
