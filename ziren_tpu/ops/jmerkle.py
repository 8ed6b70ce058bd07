"""Poseidon2 Merkle commitment on device (JAX path, Montgomery form).

Device analogue of core/merkle.py for the common case of a single
power-of-two-height matrix: row leaf hashing (PaddingFreeSponge) followed by
log2(n) compress levels. Multi-matrix injection trees are composed by the
host orchestrator from these two kernels; the digests are bit-identical to
the host tree after Montgomery decode.

(reference: crates/stark/src/kb31_poseidon2.rs ValMmcs Merkle commit — the
leaf/compress structure here is the TPU-hot path: leaf hashing is
embarrassingly row-parallel; cap reduction is a log-depth scan.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import jposeidon2 as jp2


@jax.jit
def leaf_hashes(mat):
    """(n, w) mont matrix -> (n, 8) leaf digests."""
    return jp2.hash_rows(mat)


def merkle_root(mat):
    """(n, w) mont matrix -> (8,) root digest (n a power of two)."""
    digests = jp2.hash_rows(mat)
    n = digests.shape[0]
    while n > 1:
        digests = jp2.compress_pairs(digests)
        n //= 2
    return digests[0]


@partial(jax.jit, static_argnames=("levels",))
def compress_levels(digests, levels: int):
    """Fold `levels` compress levels: (n, 8) -> (n >> levels, 8)."""
    for _ in range(levels):
        digests = jp2.compress_pairs(digests)
    return digests
