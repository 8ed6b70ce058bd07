"""Wire serialization for the prover RPC (reference: crates/cuda's bincode
payloads, proto/api.proto).

The reference's bincode payloads are data-only; plain pickle would hand
anyone who can reach the port (or MITM a response) arbitrary code
execution. This module keeps pickle's convenience for our dataclass-heavy
payloads but restricts DESERIALIZATION to an allowlist: only classes from
`ziren_tpu.*` plus numpy's array-reconstruction helpers resolve; every
other global (os.system, subprocess, functions in general) raises.

Unpickling an allowlisted class never runs attacker-chosen code: dataclass
instances are rebuilt via object.__new__ + __dict__ update, enums via the
Enum class call, numpy arrays via `_reconstruct` — none of which execute
payload-controlled callables. The service still binds loopback by default;
this is defense in depth for the machine-room DCN deployments the twirp
layout targets.
"""

from __future__ import annotations

import io
import pickle

# numpy reconstruction helpers are data-only: they allocate an array and
# fill it from bytes. (numpy moved multiarray under _core in numpy 2.)
_NUMPY_ALLOWED = {
    ("numpy", "ndarray"),
    ("numpy", "dtype"),
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy._core.multiarray", "scalar"),
    ("numpy._core.numeric", "_frombuffer"),
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy.core.numeric", "_frombuffer"),
}

_BUILTIN_ALLOWED = {
    ("builtins", "bytearray"),
    ("builtins", "bytes"),
    ("builtins", "complex"),
    ("builtins", "frozenset"),
    ("builtins", "range"),
    ("builtins", "set"),
    ("collections", "OrderedDict"),
    ("collections", "defaultdict"),
    ("collections", "Counter"),
}


class WireError(pickle.UnpicklingError):
    pass


class _RestrictedUnpickler(pickle.Unpickler):
    def find_class(self, module: str, name: str):
        key = (module, name)
        if key in _NUMPY_ALLOWED or key in _BUILTIN_ALLOWED:
            return super().find_class(module, name)
        if module == "ziren_tpu" or module.startswith("ziren_tpu."):
            obj = super().find_class(module, name)
            # classes only: a module-level *function* reached via the
            # REDUCE opcode would be called with attacker-chosen args
            if isinstance(obj, type):
                return obj
            raise WireError(f"non-class global {module}.{name} refused")
        raise WireError(f"global {module}.{name} is not allowlisted")


def dumps(obj) -> bytes:
    return pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)


def loads(data: bytes):
    return _RestrictedUnpickler(io.BytesIO(data)).load()
