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

from ziren_tpu.ops import jfield as jf
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


def ntt_mesh(mat, mesh: Mesh, axis: str = "row"):
    """Four-step NTT of (n, w) over a mesh: local small NTTs + the
    butterfly TRANSPOSE exchanged by `all_to_all` over ICI (SURVEY §2.14:
    "NTT butterfly all-to-all"; the single-chip cascade is ops/jntt.py).

    n = n1 * n2 with rows split j = j2 + n2*j1:
      1. all_to_all transpose -> each device holds full-j1 rows;
         local length-n1 NTTs:  U[j2, k1] = sum_j1 w^(n2 j1 k1) x[j2+n2 j1]
      2. twiddle  V = U * w^(j2 k1)   (the sharded twiddle matrix)
      3. all_to_all transpose back; local length-n2 NTTs over j2:
         W[k1, k2] = X[k1 + n1 k2]
    Returns the natural-order NTT (n, w), bit-identical to core/ntt.ntt.
    """
    from ziren_tpu.core import field as F
    from ziren_tpu.ops import jpcs

    n, w = int(mat.shape[0]), int(mat.shape[1])
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names if a == axis]))
    log_n = n.bit_length() - 1
    log_n1 = log_n // 2
    n1 = 1 << log_n1
    n2 = n // n1
    assert n1 % n_dev == 0 and n2 % n_dev == 0, "mesh must divide both axes"
    root = F.two_adic_generator(log_n)
    # full twiddle matrix w^(j2*k1), mont, sharded along j2 like the data
    p64 = np.uint64(F.P_INT)
    w_j2 = F.powers(root, n2).astype(np.uint64)
    tw = np.ones((n2, n1), dtype=np.uint64)
    for col in range(1, n1):
        tw[:, col] = (tw[:, col - 1] * w_j2) % p64
    tw_mont = jnp.asarray(((tw << np.uint64(32)) % p64).astype(np.uint32))

    br1 = np.asarray(jpcs.bitrev_idx(log_n1))
    br2 = np.asarray(jpcs.bitrev_idx(log_n - log_n1))

    def body(x_blk, tw_blk):
        # x_blk: (n1/D, n2, w) — j1 block-sharded; exchange so each device
        # holds the FULL j1 axis for its j2 chunk
        a = jax.lax.all_to_all(x_blk, axis, 1, 0, tiled=True)
        a = a.transpose(1, 0, 2)  # (n2/D, n1, w): rows j2_local
        u = jax.vmap(
            lambda m: jpcs._ntt_bitrev_in(m[br1], log_n1)
        )(a)  # (j2_loc, k1, w)
        v = jf.mont_mul(u, tw_blk[:, :, None])
        # exchange back: k1 block-sharded, full j2 axis
        b = jax.lax.all_to_all(v.transpose(1, 0, 2), axis, 0, 1, tiled=True)
        # (n1/D, n2, w): local length-n2 NTT over j2 for each k1 row
        return jax.vmap(
            lambda m: jpcs._ntt_bitrev_in(m[br2], log_n - log_n1)
        )(b)  # (k1_loc, k2, w)

    fn = jax.jit(
        jax.shard_map(
            body, mesh=mesh, in_specs=(P(axis), P(axis)),
            out_specs=P(axis), check_vma=False,
        )
    )
    x = mat.reshape(n1, n2, w)
    out = fn(x, tw_mont)  # (n1, n2, w): [k1, k2] = X[k1 + n1 k2]
    return out.transpose(1, 0, 2).reshape(n, w)


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
