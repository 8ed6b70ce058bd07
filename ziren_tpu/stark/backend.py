"""Prover compute backends: host (numpy) and device (JAX/TPU).

The device backend runs the commit hot path — coset LDE (radix-2 NTT
butterflies) and the Poseidon2 Merkle tree (leaf hashing + compression
levels) — on the accelerator in Montgomery form, returning canonical
numpy matrices so the host orchestration (Fiat-Shamir, openings) is
unchanged. Select with ZIREN_DEVICE=1 or backend="device".

This is the single-chip kernel path; the multi-chip `shard_map` variant
(rows sharded across the mesh, cap reduction via collectives) is validated
in __graft_entry__.dryrun_multichip and lands with the distributed prover.
"""

from __future__ import annotations

import os

import numpy as np

from ziren_tpu.core import field as F
from ziren_tpu.core import merkle, ntt


def backend_name() -> str:
    return "device" if os.environ.get("ZIREN_DEVICE") == "1" else "host"


def coset_lde(coeffs: np.ndarray, added_bits: int, shift: int) -> np.ndarray:
    """Monomial coefficients -> evals over shift*H' (natural order)."""
    if backend_name() == "device" and coeffs.shape[0] >= 256:
        from ziren_tpu.ops import jntt

        n = coeffs.shape[0]
        sh = F.powers(shift, n)
        scaled = F.fmul(coeffs, sh[:, None])
        big = np.zeros((n << added_bits, coeffs.shape[1]), dtype=np.uint32)
        big[:n] = scaled
        return jntt.ntt_device(big)
    return ntt.coset_eval(coeffs, added_bits, shift)


def merkle_commit(bitrev_mats: list) -> merkle.MerkleTree:
    """Commit a batch of bit-reversed LDE matrices."""
    if backend_name() == "device":
        heights = {m.shape[0] for m in bitrev_mats}
        if min(heights) >= 256 and len(heights) <= 4:
            return _merkle_commit_device(bitrev_mats)
    return merkle.commit(bitrev_mats)


def _merkle_commit_device(mats: list) -> merkle.MerkleTree:
    import jax.numpy as jnp

    from ziren_tpu.ops import jfield as jf
    from ziren_tpu.ops import jposeidon2 as jp2

    mats = [np.ascontiguousarray(np.asarray(m, np.uint32)) for m in mats]
    heights = sorted({m.shape[0] for m in mats}, reverse=True)
    max_h = heights[0]

    def rows_at(h):
        group = [m for m in mats if m.shape[0] == h]
        return np.concatenate(group, axis=1) if len(group) > 1 else group[0]

    cur_dev = jp2.hash_rows(jf.from_host(rows_at(max_h)))
    levels = [np.asarray(jf.to_host(cur_dev), np.uint32)]
    h = max_h
    while h > 1:
        h //= 2
        cur_dev = jp2.compress_pairs(cur_dev)
        if any(m.shape[0] == h for m in mats):
            inj = jp2.hash_rows(jf.from_host(rows_at(h)))
            cur_dev = jp2.permute(
                jnp.concatenate([cur_dev, inj], axis=1)
            )[:, :8]
        levels.append(np.asarray(jf.to_host(cur_dev), np.uint32))
    return merkle.MerkleTree(mats, levels)
