"""Disk-backed AOT kernel cache (jax.export) — per-PROCESS warmup killer.

The persistent XLA compilation cache removes *compiles*, but every fresh
process still pays Python tracing + MLIR lowering + module hashing for each
jitted kernel. For the fused per-chip quotient/permutation folders this is
the dominant cold-start cost (~10^6 traced field ops per MIPS machine): a
warm-cache bench child was spending 10+ minutes rebuilding graphs that
never change.

jax.export serializes the lowered StableHLO once; `deserialize(...).call`
skips tracing entirely (measured on the tunneled TPU: deserialize ~2 ms vs
minutes of tracing). Artifacts are keyed by

    sha256(code_version ++ caller key ++ arg avals ++ backend)

where code_version hashes every kernel-defining source file, so any edit
to field/hash/folder/chip code invalidates the whole cache. Failures fall
back to plain jit (ZIREN_AOT=0 disables the layer).
"""

from __future__ import annotations

import hashlib
import os
import threading

_MEM: dict = {}
_LOCK = threading.Lock()
_CODE_HASH: list = []

# every source whose change alters kernel graphs (chip eval() included)
_SOURCES = (
    "ops/jfield.py", "ops/jposeidon2.py", "ops/jpcs.py", "ops/jmerkle.py",
    "ops/jchallenger.py", "ops/jntt.py",
    "stark/jfolder.py", "stark/folder.py", "stark/permutation.py",
    "stark/jprover.py", "stark/chip.py",
    "recursion/machine.py",
)


def enabled() -> bool:
    return os.environ.get("ZIREN_AOT", "1") != "0"


def code_version() -> str:
    if not _CODE_HASH:
        import glob

        import jax

        import ziren_tpu

        base = os.path.dirname(ziren_tpu.__file__)
        h = hashlib.sha256(jax.__version__.encode())
        for rel in _SOURCES:
            p = os.path.join(base, rel)
            if os.path.exists(p):
                with open(p, "rb") as f:
                    h.update(f.read())
        for p in sorted(glob.glob(os.path.join(base, "machine", "*.py"))):
            with open(p, "rb") as f:
                h.update(f.read())
        # kernel-selection flags change the traced graph with identical
        # sources — they must key the cache too
        from ziren_tpu.ops import jposeidon2 as _jp2

        h.update(repr(("pallas", _jp2.pallas_mode())).encode())
        _CODE_HASH.append(h.hexdigest()[:16])
    return _CODE_HASH[0]


def aot_dir() -> str:
    d = os.environ.get("ZIREN_AOT_DIR", "/root/.cache/ziren_aot")
    os.makedirs(d, exist_ok=True)
    return d


def _flat_avals(args):
    import jax

    leaves = jax.tree_util.tree_leaves(args)
    return tuple(
        (tuple(getattr(l, "shape", ())), str(getattr(l, "dtype", type(l))))
        for l in leaves
    )


def call_cached(key, fn, *args):
    """Call `fn(*args)` through the exported-artifact cache.

    fn must be jit-compatible with static Python structure fixed by `key`
    (the caller's structural cache key — chip identity, shapes, statics).
    On the first process ever, exports + saves; on later processes,
    deserializes (no tracing). Any failure falls back to jit."""
    import jax

    # Inside an enclosing trace (fused/stage kernels, shard_map bodies),
    # inline the function into that trace: exporting with tracer inputs
    # is not possible, and the outer artifact captures the graph anyway.
    if any(
        isinstance(l, jax.core.Tracer)
        for l in jax.tree_util.tree_leaves(args)
    ):
        return fn(*args)

    if not enabled():
        return _plain(key, fn, args)
    digest = hashlib.sha256(
        repr((code_version(), key, _flat_avals(args),
              jax.default_backend())).encode()
    ).hexdigest()
    art = _MEM.get(digest)
    first = art is None
    if first:
        with _LOCK:
            art = _MEM.get(digest)
            if art is None:
                art = _load_or_export(digest, fn, args)
                if art != "fallback":
                    # ONE jitted wrapper per artifact: Exported.call
                    # builds a fresh traced wrapper on every invocation
                    # (~0.25 s of Python per call — measured as the
                    # dominant warm-run cost); a cached jax.jit around it
                    # hits the pjit fast path on every later call.
                    art = jax.jit(art.call)
                _MEM[digest] = art
    if art == "fallback":
        return _plain(key, fn, args)
    if first and os.environ.get("ZIREN_AOT_LOG"):
        import time

        t0 = time.perf_counter()
        out = art(*args)
        print(f"[aot] first call {key[0]} {digest[:8]} "
              f"{time.perf_counter() - t0:.2f}s", flush=True)
        return out
    return art(*args)


def _load_or_export(digest, fn, args):
    import jax
    import jax.export as jex

    path = os.path.join(aot_dir(), digest + ".jexp")
    if os.path.exists(path):
        try:
            import time

            t0 = time.perf_counter()
            with open(path, "rb") as f:
                art = jex.deserialize(bytearray(f.read()))
            if os.environ.get("ZIREN_AOT_LOG"):
                print(f"[aot] deserialize {digest[:8]} "
                      f"{time.perf_counter() - t0:.2f}s", flush=True)
            return art
        except Exception:
            pass
    try:
        exp = jex.export(jax.jit(fn))(*args)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(exp.serialize())
        os.replace(tmp, path)
        return exp
    except Exception:
        return "fallback"


def _manifest_path(name: str) -> str:
    return os.path.join(aot_dir(), f"manifest-{name}.txt")


def save_manifest(name: str) -> int:
    """Record every artifact digest this process touched, so the next
    process can prewarm them in parallel instead of paying ~0.25 s per
    lazy sequential load (the round-4 warm-start anatomy: ~300 s of
    executable reads). Returns the number of digests recorded."""
    digests = sorted(d for d, a in _MEM.items() if a != "fallback")
    tmp = _manifest_path(name) + f".tmp{os.getpid()}"
    with open(tmp, "w") as f:
        f.write("\n".join(digests))
    os.replace(tmp, _manifest_path(name))
    return len(digests)


def prewarm(name: str, workers: int = 8, execute: bool = True) -> int:
    """Deserialize (and optionally compile+run on zeros) every artifact in
    the named manifest, concurrently. Missing/invalid entries are skipped
    — the lazy path will handle them. Returns artifacts warmed."""
    path = _manifest_path(name)
    if not (enabled() and os.path.exists(path)):
        return 0
    with open(path) as f:
        digests = [d.strip() for d in f if d.strip()]
    digests = [d for d in digests if d not in _MEM]
    if not digests:
        return 0
    import concurrent.futures

    import jax.export as jex

    def load(digest):
        import jax

        p = os.path.join(aot_dir(), digest + ".jexp")
        try:
            with open(p, "rb") as f:
                art = jex.deserialize(bytearray(f.read()))
            jfn = jax.jit(art.call)
            if execute:
                # compile WITHOUT running: a compile-cache hit still pays
                # the executable load (~0.25 s serial on the tunneled
                # backend); running the kernel on zeros would serialize
                # real device compute behind it. The COMPILED object is
                # what gets cached — a later jit call would not reuse the
                # explicit AOT compilation.
                avals = [
                    jax.ShapeDtypeStruct(a.shape, a.dtype)
                    for a in art.in_avals
                ]
                jfn = jfn.lower(*avals).compile()
            with _LOCK:
                _MEM.setdefault(digest, jfn)
            return 1
        except Exception:
            return 0

    with concurrent.futures.ThreadPoolExecutor(max_workers=workers) as pool:
        return sum(pool.map(load, digests))


_PLAIN: dict = {}


def _plain(key, fn, args):
    import jax

    jfn = _PLAIN.get(key)
    if jfn is None:
        if len(_PLAIN) > 256:
            _PLAIN.clear()
        jfn = _PLAIN[key] = jax.jit(fn)
    return jfn(*args)


def aot_jit(fn=None, *, static_argnames=()):
    """Drop-in replacement for @jax.jit(static_argnames=...) that routes
    through the exported-artifact cache: warm processes skip tracing.
    Static arguments MUST be passed as keyword arguments at call sites
    (they are baked into the artifact and its key)."""
    static_argnames = tuple(static_argnames)

    def deco(f):
        import functools

        @functools.wraps(f)
        def wrapper(*args, **kwargs):
            statics = tuple(
                (k, kwargs.pop(k)) for k in static_argnames if k in kwargs
            )
            assert not kwargs, (
                f"{f.__qualname__}: non-static kwargs unsupported under "
                f"aot_jit: {sorted(kwargs)}")
            if statics:
                skw = dict(statics)

                def run(*a, _f=f, _kw=skw):
                    return _f(*a, **_kw)
            else:
                run = f
            key = (f.__module__, f.__qualname__, statics)
            return call_cached(key, run, *args)

        return wrapper

    return deco(fn) if fn is not None else deco
