"""Intra-proof ICI sharding: ONE commit spread across mesh devices.

The data-parallel path (stark/sharded.py) gives each device a whole shard;
this module is the orthogonal axis (SURVEY §2.14 "intra-kernel SIMD" row):
a SINGLE shard's hot commit kernel — Poseidon2 Merkle leaf hashing — runs
row-sharded over a mesh, with the Merkle cap reduced across devices by an
ICI collective (all_gather of per-device subtree roots, then the log2(N)
top compress levels computed redundantly on every device). Against one
device the result is bit-identical to jpcs.merkle_commit_device /
core.merkle.commit: leaf hashing is embarrassingly row-parallel and the
tree's bottom log2(n/N) levels never cross a device boundary.

This is the building block for cutting single-shard latency (the recursion
tree's critical path) below one chip's roofline — the reference's analogue
is intra-kernel SIMD + rayon inside one shard commit
(crates/stark/src/prover.rs:258-296, quotient.rs:46-60).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ziren_tpu.ops import jposeidon2 as jp2


def commit_row_sharded(mat, mesh: Mesh, axis: str = "row"):
    """Merkle commit of one bit-reversed mont matrix (n, w), rows sharded
    over `mesh`'s `axis`. Returns (root (8,), leaf_digests (n, 8)) with the
    root replicated on every device.

    n must be a power of two divisible by the mesh size; the per-device
    row block (n/N) must itself be a power of two >= 1.
    """
    n = int(mat.shape[0])
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names if a == axis]))
    assert n % n_dev == 0 and (n & (n - 1)) == 0
    block = n // n_dev
    assert block >= 1 and (block & (block - 1)) == 0
    local_levels = block.bit_length() - 1
    top_levels = n_dev.bit_length() - 1

    def body(mat_blk):
        digests = jp2.hash_rows(mat_blk)  # (block, 8)
        sub = digests
        for _ in range(local_levels):
            sub = jp2.compress_pairs(sub)  # -> (1, 8) subtree root
        # ICI: gather every device's subtree root, fold the cap everywhere
        caps = jax.lax.all_gather(sub[0], axis)  # (N, 8)
        root = caps
        for _ in range(top_levels):
            root = jp2.compress_pairs(root)
        return root[0], digests

    fn = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=P(axis),
            out_specs=(P(), P(axis)),
            check_vma=False,
        )
    )
    return fn(mat)


def leaf_hash_row_sharded(mat, mesh: Mesh, axis: str = "row"):
    """Row-sharded leaf hashing only: (n, w) mont -> (n, 8) digests,
    each device hashing its own row block (no cross-device traffic)."""

    def body(mat_blk):
        return jp2.hash_rows(mat_blk)

    fn = jax.jit(
        jax.shard_map(
            body, mesh=mesh, in_specs=P(axis), out_specs=P(axis),
            check_vma=False,
        )
    )
    return fn(mat)
