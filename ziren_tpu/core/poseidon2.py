"""Poseidon2 permutation over KoalaBear, width 16 (host path, numpy).

Exact semantics of the reference's `Poseidon2KoalaBear<16>` as pinned by its
AIR (reference: crates/core/machine/src/operations/poseidon2/air.rs):

  * initial external linear layer applied to the input state
  * 4 initial external rounds: +RC[r], x^3 sbox (all lanes), external layer
  * 13 internal rounds: +RC[4+r][0] on lane 0, x^3 on lane 0, then
    state[i] = diag[i]*state[i] + sum(state)
  * 4 terminal external rounds with RC rows 17..20

The external linear layer applies the 4x4 matrix
  [[2,3,1,1],[1,2,3,1],[1,1,2,3],[3,1,1,2]]
blockwise then adds the per-position-block column sums (apply_m_4_mut /
external_linear_layer_mut in the reference AIR).

Sponge constructions (reference: crates/stark/src/kb31_poseidon2.rs):
  * hash   = PaddingFreeSponge<perm, 16, 8, 8>: overwrite-absorb in rate-8
    chunks (permuting after each, including a final partial chunk), squeeze
    state[..8].
  * compress = TruncatedPermutation<perm, 2, 8, 16>: perm(l || r)[..8].

All functions are vectorized: `state` has shape (..., 16) uint32 canonical.
"""

from __future__ import annotations

import numpy as np

from . import field as F
from .poseidon2_constants import RC_16_30

WIDTH = 16
RATE = 8
OUT = 8
NUM_EXTERNAL_ROUNDS = 8
NUM_INTERNAL_ROUNDS = 13

P = F.P_INT

# internal diagonal (reference: operations/poseidon2/air.rs INTERNAL_DIAG_MONTY_16)
INTERNAL_DIAG = np.array(
    [
        P - 2,
        1,
        2,
        (P + 1) >> 1,
        3,
        4,
        (P - 1) >> 1,
        P - 3,
        P - 4,
        P - ((P - 1) >> 8),
        P - ((P - 1) >> 3),
        P - 127,
        (P - 1) >> 8,
        (P - 1) >> 3,
        (P - 1) >> 4,
        127,
    ],
    dtype=np.uint32,
)

RC = np.array(RC_16_30, dtype=np.uint32)  # (30, 16)


def _external_linear_layer(state: np.ndarray) -> np.ndarray:
    """Apply M_E: blockwise M4 then add block-position sums. state (..., 16)."""
    x = state.astype(np.uint64)
    out = np.empty_like(x)
    for j in range(0, WIDTH, 4):
        x0, x1, x2, x3 = x[..., j], x[..., j + 1], x[..., j + 2], x[..., j + 3]
        t01 = x0 + x1
        t23 = x2 + x3
        t0123 = t01 + t23
        t01123 = t0123 + x1
        t01233 = t0123 + x3
        out[..., j + 3] = (t01233 + 2 * x0) % P
        out[..., j + 1] = (t01123 + 2 * x2) % P
        out[..., j + 0] = (t01123 + t01) % P
        out[..., j + 2] = (t01233 + t23) % P
    # per-position-in-block sums: s[k] = sum over blocks of out[..., 4*b+k]
    s = np.zeros(x.shape[:-1] + (4,), dtype=np.uint64)
    for k in range(4):
        s[..., k] = (out[..., k] + out[..., k + 4] + out[..., k + 8] + out[..., k + 12]) % P
    for j in range(WIDTH):
        out[..., j] = (out[..., j] + s[..., j % 4]) % P
    return out.astype(np.uint32)


def _sbox(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    x2 = (x * x) % P
    return ((x2 * x) % P).astype(np.uint32)


def permute(state: np.ndarray) -> np.ndarray:
    """Poseidon2 permutation; state shape (..., 16) canonical uint32."""
    state = np.asarray(state, dtype=np.uint32)
    assert state.shape[-1] == WIDTH
    state = _external_linear_layer(state)
    # initial external rounds (RC rows 0..3)
    for r in range(NUM_EXTERNAL_ROUNDS // 2):
        state = F.fadd(state, RC[r])
        state = _sbox(state)
        state = _external_linear_layer(state)
    # internal rounds (RC rows 4..16, element 0)
    for r in range(NUM_INTERNAL_ROUNDS):
        s0 = F.fadd(state[..., 0], RC[4 + r][0])
        s0 = _sbox(s0)
        state = state.copy()
        state[..., 0] = s0
        # matmul_internal: state[i] = diag[i]*state[i] + sum(state)
        total = np.sum(state.astype(np.uint64), axis=-1) % P
        state = (
            (state.astype(np.uint64) * INTERNAL_DIAG.astype(np.uint64)) % P
            + total[..., None]
        ) % P
        state = state.astype(np.uint32)
    # terminal external rounds (RC rows 17..20)
    for r in range(NUM_EXTERNAL_ROUNDS // 2):
        state = F.fadd(state, RC[17 + r])
        state = _sbox(state)
        state = _external_linear_layer(state)
    return state


def hash_iter(inputs) -> np.ndarray:
    """PaddingFreeSponge hash of a flat sequence of field elements -> (8,)."""
    inputs = np.asarray(list(inputs), dtype=np.uint32).reshape(-1)
    state = np.zeros(WIDTH, dtype=np.uint32)
    for i in range(0, len(inputs), RATE):
        chunk = inputs[i : i + RATE]
        state[: len(chunk)] = chunk
        state = permute(state)
    return state[:OUT].copy()


def hash_rows(rows: np.ndarray) -> np.ndarray:
    """Vectorized PaddingFreeSponge over rows: (n, w) -> (n, 8)."""
    rows = np.asarray(rows, dtype=np.uint32)
    n, w = rows.shape
    state = np.zeros((n, WIDTH), dtype=np.uint32)
    for i in range(0, w, RATE):
        chunk = rows[:, i : i + RATE]
        state[:, : chunk.shape[1]] = chunk
        state = permute(state)
    return state[:, :OUT].copy()


def compress(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """TruncatedPermutation 2-to-1: (..., 8), (..., 8) -> (..., 8)."""
    state = np.concatenate(
        [np.asarray(left, dtype=np.uint32), np.asarray(right, dtype=np.uint32)],
        axis=-1,
    )
    return permute(state)[..., :OUT]
