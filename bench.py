"""Benchmark entry point. Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Current benchmark: device Poseidon2-16 permutation throughput (the prover's
dominating kernel: Merkle leaf hashing + compression; see SURVEY.md §3.2).
Baseline for the ratio: the reference's CPU prover hashes ~2^21-row LDEs for
fibonacci(58218) in ~15 s end-to-end; a practical single-socket CPU Poseidon2
rate is ~2-4 M perm/s (Plonky3 AVX2, 32 cores). We pin vs_baseline against
3.0 M perm/s until the end-to-end fibonacci prove benchmark lands, at which
point this switches to proving kHz vs BASELINE.md.
"""

from __future__ import annotations

import json
import time

import numpy as np


def bench_poseidon2(batch=1 << 16, width=16, iters=8):
    import jax
    from ziren_tpu.ops import jposeidon2 as jp2

    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    states = jnp.asarray(
        rng.integers(0, 2130706433, size=(batch, width), dtype=np.uint32)
    )
    perm = jax.jit(jp2.permute)
    perm(states).block_until_ready()  # compile
    t0 = time.perf_counter()
    out = states
    for _ in range(iters):
        out = perm(out)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    perms_per_s = bench_poseidon2()
    cpu_baseline = 3.0e6  # single-socket CPU Poseidon2 perm/s (see docstring)
    print(
        json.dumps(
            {
                "metric": "poseidon2_permutations_per_s",
                "value": round(perms_per_s),
                "unit": "perm/s",
                "vs_baseline": round(perms_per_s / cpu_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
