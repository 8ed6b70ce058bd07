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
_CACHE_SET: list = []


def ensure_compile_cache() -> None:
    """Force the persistent XLA compile cache ON via jax.config (NOT env
    vars: this container pre-imports jax at interpreter startup through
    sitecustomize, so JAX_COMPILATION_CACHE_DIR set afterwards is silently
    ignored — that cost a full recompile of every kernel per process).
    Remote (tunneled-TPU) compiles run 30-90 s each; the cache turns every
    warm run's compile cost to ~zero."""
    if _CACHE_SET:
        return
    _CACHE_SET.append(True)
    try:
        import jax

        path = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", "/root/.cache/ziren_jax"
        )
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def backend_name() -> str:
    env = os.environ.get("ZIREN_DEVICE")
    if env == "1":
        ensure_compile_cache()
        return "device"
    if env == "0":
        return "host"
    if not _AUTO:
        try:
            import jax

            _AUTO.append("device" if jax.default_backend() != "cpu" else "host")
        except Exception:
            _AUTO.append("host")
    if _AUTO[0] == "device":
        ensure_compile_cache()
    return _AUTO[0]
