"""Prover backend selection.

"device": the TPU-resident shard prover (stark/jprover.py) — commit, perm
trace, quotient and FRI open all run on the accelerator; only the
Fiat-Shamir challenger and the executor stay host-side.

"host": the numpy/native oracle prover (stark/prover.py) — the differential
reference for the device path and the fast path on CPU-only machines.

ZIREN_DEVICE=1/0 forces; the default is device whenever JAX has an
accelerator backend.
"""

from __future__ import annotations

import os

_AUTO: list = []


def backend_name() -> str:
    env = os.environ.get("ZIREN_DEVICE")
    if env == "1":
        return "device"
    if env == "0":
        return "host"
    if not _AUTO:
        try:
            import jax

            _AUTO.append("device" if jax.default_backend() != "cpu" else "host")
        except Exception:
            _AUTO.append("host")
    return _AUTO[0]
