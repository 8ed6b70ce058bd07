"""Poseidon2-KoalaBear-16 permutation on device (JAX), Montgomery form.

Bit-identical to `ziren_tpu.core.poseidon2.permute` (the host reference) after
Montgomery decode. Vectorized over leading axes: state shape (..., 16).

Montgomery commutes with the permutation: adds and multiplies act on
representatives, and all constants (round constants, internal diagonal) are
pre-encoded, so perm_mont(mont(x)) == mont(perm(x)).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ziren_tpu.core import field as F
from ziren_tpu.core import poseidon2 as hp2
from . import jfield as jf

WIDTH = 16
RATE = 8
OUT = 8


def pallas_mode():
    """None (off) | "tpu" (real Mosaic kernels) | "interpret" (CPU tests).

    Default: Pallas on every non-CPU backend — the stock XLA lowering of
    the sponge is the fallback and the bit-exactness oracle. The flag is
    part of the AOT cache key (stark/aot.py mixes it into code_version)."""
    env = os.environ.get("ZIREN_PALLAS")
    if env == "0":
        return None
    if env == "interpret":
        return "interpret"
    try:
        return "tpu" if jax.default_backend() != "cpu" else None
    except Exception:  # pragma: no cover
        return None


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

    Dispatches to the Pallas sponge kernel (below) on accelerator
    backends; the stock XLA lowering is the fallback + oracle. The absorb
    loop there is a lax.scan over full-rate chunks (plus one unrolled
    partial chunk) — wide trace matrices would otherwise unroll w/8
    permutations into one giant XLA graph, dominating compile time on both
    the CPU mesh and the tunneled-TPU path."""
    mode = pallas_mode()
    n, w = rows.shape
    if mode is not None and n >= 1024 and w >= 2 and (n & (n - 1)) == 0:
        return hash_rows_pallas(rows, mode)
    return _hash_rows_xla(rows)


def _hash_rows_xla(rows):
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


# ---------------------------------------------------------------------------
# Pallas TPU sponge kernel (blocked transposed-state layout)
# ---------------------------------------------------------------------------
#
# The VPU wants the 16 state elements on the SUBLANE axis and the hashed
# rows on the LANE axis. The state is stored (16, R) in POSITION-MAJOR
# order: row k*4+j holds element 4j+k (the 4x4 index transpose — a
# self-inverse permutation), so the M4 block layer operates on contiguous
# (4, R) sublane slices x_k = state[4k:4k+4] covering all four blocks at
# once, and the cross-block sums are sublane reductions. The input matrix
# is transposed once outside the kernel ((n, w) -> (w, n)) so each
# absorbed rate-chunk is a plain (8, R) sublane slice. Bit-identical to
# the stock XLA path (tests exercise interpret mode on CPU and the real
# kernel differentially on device).

_P64 = np.uint64(F.P_INT)
_RC_NP = ((hp2.RC.astype(np.uint64) << np.uint64(32)) % _P64).astype(np.uint32)
_DIAG_NP = (
    (hp2.INTERNAL_DIAG.astype(np.uint64) << np.uint64(32)) % _P64
).astype(np.uint32)
# position-major permutation: element e lives at row PERM[e] (self-inverse)
_PERM = np.array([(e % 4) * 4 + e // 4 for e in range(16)])


def _ext_lin_blocked(state):
    """M_E on position-major (16, R): x_k = state[4k:4k+4] is position k
    of all four M4 blocks."""
    x0, x1, x2, x3 = state[0:4], state[4:8], state[8:12], state[12:16]
    t01 = jf.madd(x0, x1)
    t23 = jf.madd(x2, x3)
    t0123 = jf.madd(t01, t23)
    t01123 = jf.madd(t0123, x1)
    t01233 = jf.madd(t0123, x3)
    o3 = jf.madd(t01233, jf.madd(x0, x0))
    o1 = jf.madd(t01123, jf.madd(x2, x2))
    o0 = jf.madd(t01123, t01)
    o2 = jf.madd(t01233, t23)
    outs = []
    for ok in (o0, o1, o2, o3):
        t = jf.madd(ok[0:2], ok[2:4])
        s = jf.madd(t[0:1], t[1:2])
        outs.append(jf.madd(ok, s))
    return jnp.concatenate(outs, axis=0)


def permute_blocked(state, rc_p, diag_p):
    """Poseidon2 permutation on position-major mont state (16, R); rc_p
    (30, 16) and diag_p (16, 1) are PERM-reordered kernel inputs (Pallas
    rejects captured consts). Rounds are unrolled (static structure); the
    chunk loop around it is the only dynamic control flow."""
    state = _ext_lin_blocked(state)
    for r in range(4):
        state = _sbox(jf.madd(state, rc_p[r][:, None]))
        state = _ext_lin_blocked(state)
    for r in range(4, 17):
        # element 0 is position 0, block 0 = row 0 in this layout
        s0 = _sbox(jf.madd(state[0:1], rc_p[r, 0]))
        state = jnp.concatenate([s0, state[1:]], axis=0)
        t = jf.madd(state[:8], state[8:])
        t = jf.madd(t[:4], t[4:])
        t = jf.madd(t[:2], t[2:])
        total = jf.madd(t[0:1], t[1:2])
        state = jf.madd(jf.mont_mul(state, diag_p), total)
    for r in range(17, 21):
        state = _sbox(jf.madd(state, rc_p[r][:, None]))
        state = _ext_lin_blocked(state)
    return state


def hash_rows_pallas(rows, mode):
    """(n, w) mont -> (n, 8) digests through the Pallas sponge kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, w = rows.shape
    lanes = 512
    while w * lanes * 4 > (3 << 20) and lanes > 128:
        lanes //= 2
    if n % lanes:
        return _hash_rows_xla(rows)
    full = w // RATE
    rem = w % RATE

    def kernel(rc_ref, diag_ref, in_ref, out_ref):
        rc_p = rc_ref[:]
        diag_p = diag_ref[:]

        def absorb_at(chunk, state):
            # chunk (8, R): element e -> row _PERM[e] via the 4x4 index
            # transpose (one sublane shuffle per chunk)
            c = chunk.reshape(2, 4, lanes).transpose(1, 0, 2)  # (4, 2, R)
            s = state.reshape(4, 4, lanes)
            s = jnp.concatenate([c, s[:, 2:4]], axis=1)
            return permute_blocked(s.reshape(16, lanes), rc_p, diag_p)

        state = jnp.zeros((WIDTH, lanes), dtype=jnp.uint32)
        if full:
            def body(c, st):
                return absorb_at(in_ref[pl.ds(c * RATE, RATE), :], st)

            state = jax.lax.fori_loop(0, full, body, state)
        if rem:
            # elements 0..rem-1 from the tail columns; rem..7 keep their
            # current values (read back via the inverse transpose)
            elems = state.reshape(4, 4, lanes).transpose(1, 0, 2)
            padded = jnp.concatenate(
                [in_ref[full * RATE :, :],
                 elems.reshape(16, lanes)[rem:RATE]], axis=0)
            state = absorb_at(padded, state)
        s = state.reshape(4, 4, lanes)[:, :2]
        out_ref[:] = s.transpose(1, 0, 2).reshape(OUT, lanes)

    rep = lambda i: (0, 0)
    out = pl.pallas_call(
        kernel,
        grid=(n // lanes,),
        in_specs=[
            pl.BlockSpec((30, WIDTH), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((WIDTH, 1), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((w, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (OUT, lanes), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((OUT, n), jnp.uint32),
        interpret=(mode == "interpret"),
    )(jnp.asarray(_RC_NP[:, _PERM]), jnp.asarray(_DIAG_NP[_PERM])[:, None],
      rows.T)
    return out.T
