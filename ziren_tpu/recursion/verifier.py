"""Traced verifier building blocks (reference: crates/recursion/circuit —
the in-circuit Merkle/challenger/FRI components; written against the DSL
so they prove on the recursion machine)."""

from __future__ import annotations

from .dsl import Felt, Tracer


def traced_compress(t: Tracer, left8, right8):
    """TruncatedPermutation 2-to-1 over two 8-felt digests."""
    return t.poseidon2(list(left8) + list(right8))[:8]


def traced_hash_rows(t: Tracer, felts):
    """PaddingFreeSponge over a flat felt list (rate 8)."""
    state = [t.const(0) for _ in range(16)]
    for i in range(0, len(felts), 8):
        chunk = felts[i : i + 8]
        state = chunk + state[len(chunk):]
        state = t.poseidon2(state)
    return state[:8]


def traced_merkle_verify(t: Tracer, leaf_felts, index_bits, path, root8):
    """Recompute a Merkle root from an opened row, sibling path and index
    bits (all DSL handles); asserts equality with `root8`
    (mirrors core/merkle.py verify_opening for a single matrix)."""
    digest = traced_hash_rows(t, list(leaf_felts))
    for bit, sibling in zip(index_bits, path):
        left = [t.select(bit, s, d) for s, d in zip(sibling, digest)]
        right = [t.select(bit, d, s) for d, s in zip(digest, sibling)]
        digest = traced_compress(t, left, right)
    for d, r in zip(digest, root8):
        t.assert_eq(d, r)
    return digest
