"""Poseidon2-KoalaBear-16 permutation on device (JAX), Montgomery form.

Bit-identical to `ziren_tpu.core.poseidon2.permute` (the host reference) after
Montgomery decode. Vectorized over leading axes: state shape (..., 16).

Montgomery commutes with the permutation: adds and multiplies act on
representatives, and all constants (round constants, internal diagonal) are
pre-encoded, so perm_mont(mont(x)) == mont(perm(x)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ziren_tpu.core import field as F
from ziren_tpu.core import poseidon2 as hp2
from . import jfield as jf

WIDTH = 16
RATE = 8
OUT = 8


def _mont_const(v: np.ndarray) -> jnp.ndarray:
    return jnp.asarray((v.astype(np.uint64) << np.uint64(32)) % np.uint64(F.P_INT), dtype=jnp.uint32)


RC_MONT = _mont_const(hp2.RC)  # (30, 16)
DIAG_MONT = _mont_const(hp2.INTERNAL_DIAG)  # (16,)


def _external_linear_layer(state):
    """M_E on (..., 16): blockwise M4 circulant + block-position sums."""
    cols = [state[..., i] for i in range(WIDTH)]
    out = [None] * WIDTH
    for j in range(0, WIDTH, 4):
        x0, x1, x2, x3 = cols[j], cols[j + 1], cols[j + 2], cols[j + 3]
        t01 = jf.madd(x0, x1)
        t23 = jf.madd(x2, x3)
        t0123 = jf.madd(t01, t23)
        t01123 = jf.madd(t0123, x1)
        t01233 = jf.madd(t0123, x3)
        out[j + 3] = jf.madd(t01233, jf.madd(x0, x0))
        out[j + 1] = jf.madd(t01123, jf.madd(x2, x2))
        out[j + 0] = jf.madd(t01123, t01)
        out[j + 2] = jf.madd(t01233, t23)
    sums = [
        jf.madd(jf.madd(out[k], out[k + 4]), jf.madd(out[k + 8], out[k + 12]))
        for k in range(4)
    ]
    out = [jf.madd(out[j], sums[j % 4]) for j in range(WIDTH)]
    return jnp.stack(out, axis=-1)


def _sbox(x):
    return jf.mont_mul(jf.mont_mul(x, x), x)


def _external_round(state, rc):
    state = jf.madd(state, rc)
    state = _sbox(state)
    return _external_linear_layer(state)


def _internal_round(state, rc0):
    s0 = jf.madd(state[..., 0], rc0)
    s0 = _sbox(s0)
    state = state.at[..., 0].set(s0)
    # matmul_internal: state[i] = diag[i]*state[i] + sum(state)
    total = s0
    for i in range(1, WIDTH):
        total = jf.madd(total, state[..., i])
    return jf.madd(jf.mont_mul(state, DIAG_MONT), total[..., None])


def permute(state):
    """Poseidon2 permutation on mont-form state (..., 16).

    Rounds are rolled into lax.scans (constants as scan inputs) to keep the
    traced graph small — compile time matters more than the negligible loop
    overhead.
    """
    state = _external_linear_layer(state)
    state, _ = jax.lax.scan(
        lambda s, rc: (_external_round(s, rc), None), state, RC_MONT[0:4]
    )
    state, _ = jax.lax.scan(
        lambda s, rc0: (_internal_round(s, rc0), None), state, RC_MONT[4:17, 0]
    )
    state, _ = jax.lax.scan(
        lambda s, rc: (_external_round(s, rc), None), state, RC_MONT[17:21]
    )
    return state


@jax.jit
def hash_rows(rows):
    """PaddingFreeSponge over rows: (n, w) mont -> (n, 8) mont digests.

    The absorb loop is a lax.scan over full-rate chunks (plus one unrolled
    partial chunk) — wide trace matrices would otherwise unroll w/8
    permutations into one giant XLA graph, dominating compile time on both
    the CPU mesh and the tunneled-TPU path."""
    n, w = rows.shape
    state = jnp.zeros((n, WIDTH), dtype=jnp.uint32)
    full = w // RATE
    if full:
        chunks = rows[:, : full * RATE].reshape(n, full, RATE)
        chunks = jnp.moveaxis(chunks, 1, 0)  # (full, n, RATE)

        def absorb(s, ch):
            s = jnp.concatenate([ch, s[:, RATE:]], axis=1)
            return permute(s), None

        state, _ = jax.lax.scan(absorb, state, chunks)
    if w % RATE:
        state = jax_dynamic_overwrite(state, rows[:, full * RATE :])
        state = permute(state)
    return state[:, :OUT]


def jax_dynamic_overwrite(state, chunk):
    c = chunk.shape[1]
    return jnp.concatenate([chunk, state[:, c:]], axis=1)


@jax.jit
def compress_pairs(digests):
    """(2k, 8) mont digests -> (k, 8): perm(concat of adjacent pairs)[..8]."""
    k = digests.shape[0] // 2
    pairs = digests.reshape(k, 16)
    return permute(pairs)[:, :OUT]
