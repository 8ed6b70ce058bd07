"""Whole-shard fused device prover: ONE executable per (machine, shape).

The eager device prover (stark/jprover.py) dispatches ~1000 small kernels
per shard; on the tunneled accelerator every executable load costs ~0.25 s
and every eager op ~2.5 ms of Python dispatch, so a warm bench run spent
~10x longer loading/dispatching than proving. Here the ENTIRE shard prove —
byte-plane unpack, Montgomery encode, coset LDE, Poseidon2 Merkle commits,
the device Fiat-Shamir transcript, LogUp permutation traces, fused quotient
folds, FRI commit/open and the PoW grind — is one traced function
(stark/sharded.py's `_build_prove_fn`, the same graph `shard_map` batches
over a mesh), jax.export-ed ONCE per (vk, shape, fri) and replayed from
disk with zero tracing in warm processes
(reference hot path: crates/stark/src/prover.rs:296-652).

The proof crosses back as ONE flat u32 device vector per shard (the
tunneled transport is latency-bound); the host slices it back into a
ShardProof with a (treedef, shapes) meta pickled next to the artifact.

Gated to real accelerators by default: XLA:CPU's codegen chokes on the
fused constraint blocks (ZIREN_FUSED=1 forces it on for CPU-mesh tests of
small machines).
"""

from __future__ import annotations

import hashlib
import os
import pickle

import numpy as np

from . import aot
from .proof import MachineProof


def enabled() -> bool:
    """Opt-in (ZIREN_FUSED=1). The whole-MIPS-machine module measured
    ~44 MB of MLIR and the axon remote compile helper OOM-kills at that
    size (SIGKILL after ~1 h), so the fused path is for SMALL machines
    (engine-level, recursion-scale) until stage-level splitting lands;
    the eager per-chip AOT path stays the default device prover."""
    return os.environ.get("ZIREN_FUSED") == "1"


def _machine_key(machine, pk, chips, trace_domains):
    fri = machine.config.fri
    return (
        tuple((c.name, d.log_n) for c, d in zip(chips, trace_domains)),
        machine.num_public_values,
        fri.log_blowup, fri.num_queries, fri.proof_of_work_bits,
        getattr(machine.config, "commit_kind", "kb"),
        np.asarray(pk.vk.commit, np.uint32).tobytes(),
        tuple(int(x) for x in pk.vk.extra_observations),
    )


class _FusedShard:
    """One exported whole-shard prove: call(pv, mains_packed, preps) ->
    flat u32 device vector; `meta` rebuilds the output pytree."""

    def __init__(self, fn, meta):
        self.fn = fn
        self.meta = meta

    def __call__(self, pv, mains_packed, preps):
        return self.fn(pv, mains_packed, preps)


_MEM: dict = {}


def _flat_avals(args):
    import jax

    leaves = jax.tree_util.tree_leaves(args)
    return tuple(
        (tuple(getattr(l, "shape", ())), str(getattr(l, "dtype", type(l))))
        for l in leaves
    )


def get_fused_fn(machine, pk, chips, trace_domains, example_args):
    """Build (or load) the fused single-shard prover for this machine
    shape. example_args = (pv, mains_packed, preps) with the batch's real
    shapes/dtypes. Returns a _FusedShard."""
    import jax
    import jax.numpy as jnp

    from . import sharded

    key = _machine_key(machine, pk, chips, trace_domains)
    digest = hashlib.sha256(
        repr((aot.code_version(), "fused_shard", key,
              _flat_avals(example_args), jax.default_backend())).encode()
    ).hexdigest()
    hit = _MEM.get(digest)
    if hit is not None:
        return hit

    ch_template = machine.config.challenger()
    pk.vk.observe_into(ch_template)
    prove_one = sharded._build_prove_fn(
        machine, pk, chips, trace_domains, ch_template
    )

    meta_box = []

    def fused(pv_raw, mains_packed, preps_raw):
        out = prove_one(pv_raw, list(mains_packed), list(preps_raw))
        leaves, treedef = jax.tree_util.tree_flatten(out)
        shapes = [tuple(l.shape) for l in leaves]
        meta_box.append((treedef, shapes))
        flats = [l.reshape(-1).astype(jnp.uint32) for l in leaves]
        return jnp.concatenate(flats) if flats else jnp.zeros(0, jnp.uint32)

    meta_path = os.path.join(aot.aot_dir(), digest + ".meta")
    art_path = os.path.join(aot.aot_dir(), digest + ".jexp")
    if aot.enabled() and os.path.exists(art_path) and os.path.exists(meta_path):
        try:
            import jax.export as jex

            with open(art_path, "rb") as f:
                art = jex.deserialize(bytearray(f.read()))
            with open(meta_path, "rb") as f:
                meta = pickle.load(f)
            fs = _FusedShard(jax.jit(art.call), meta)
            _MEM[digest] = fs
            return fs
        except Exception:
            pass

    # first process for this shape: trace (+ export when AOT is on)
    if aot.enabled():
        try:
            import jax.export as jex

            exp = jex.export(jax.jit(fused))(*example_args)
            meta = meta_box[0]
            tmp = art_path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(exp.serialize())
            os.replace(tmp, art_path)
            tmpm = meta_path + f".tmp{os.getpid()}"
            with open(tmpm, "wb") as f:
                pickle.dump(meta, f)
            os.replace(tmpm, meta_path)
            fs = _FusedShard(jax.jit(exp.call), meta)
            _MEM[digest] = fs
            return fs
        except Exception:
            meta_box.clear()

    jfn = jax.jit(fused)
    # a throwaway trace fills meta_box without running the computation
    jax.eval_shape(fused, *example_args)
    fs = _FusedShard(jfn, meta_box[0])
    _MEM[digest] = fs
    return fs


def _unflatten(flat_np, meta):
    import jax

    treedef, shapes = meta
    flat_np = np.asarray(flat_np)
    leaves, off = [], 0
    for shp in shapes:
        size = int(np.prod(shp)) if shp else 1
        leaves.append(flat_np[off : off + size].reshape(shp))
        off += size
    return jax.tree_util.tree_unflatten(treedef, leaves)


def rounds_meta_for(machine, pk, chips, trace_domains):
    """Static opened-values layout (shared with stark/sharded.py)."""
    from .sharded import _pts_meta

    out = []
    if pk.chip_information:
        out.append(
            [
                (dims[1], len(_pts_meta(dom, lo)))
                for _n2, dom, dims, lo in pk.chip_information
            ]
        )
    out.append(
        [
            (c.width, len(_pts_meta(d, c.local_only)))
            for c, d in zip(chips, trace_domains)
        ]
    )
    out.append([(c.perm_width * 4, 2) for c in chips])
    quot = []
    for c in chips:
        quot += [(4, 1)] * c.quotient_degree
    out.append(quot)
    return out


def prove_shards_fused(machine, pk, records, grid: int = 1) -> MachineProof:
    """Prove `records` by streaming each shard through its group's fused
    executable (async device dispatches; a single fetch per shard at the
    end). Records are grouped by chip-set signature — shards with the same
    included chips share ONE executable (deferred-event memory shards and
    precompile shards form their own small groups). Bit-identical to the
    eager device / host oracle paths."""
    import jax
    import jax.numpy as jnp

    from .jprover import assemble_proof, pack_planes
    from .shape import fix_shape

    n = len(records)
    assert n >= 1
    shape, fixed = fix_shape(machine, records, grid)

    pv_of = lambda r: np.asarray(
        r.public_values.to_list()
        if hasattr(r.public_values, "to_list")
        else list(r.public_values),
        dtype=np.uint32,
    )
    pv_list = [pv_of(r) for r in records]
    preps = tuple(
        jnp.asarray(pk.preprocessed_by_name[name])
        for name, _d, _dims, _lo in pk.chip_information
    )

    # group shards by chip-set signature (heights are batch-wide already)
    groups: dict = {}
    for i in range(n):
        sig = tuple((c.name, t.shape) for c, t in fixed[i])
        groups.setdefault(sig, []).append(i)

    pcs_host = machine.config.pcs
    fri = machine.config.fri
    flats = [None] * n
    group_meta = {}
    for sig, idxs in groups.items():
        i0 = idxs[0]
        order = sorted(
            range(len(fixed[i0])), key=lambda k: -fixed[i0][k][1].shape[0]
        )
        chips = [fixed[i0][k][0] for k in order]
        trace_domains = [
            pcs_host.natural_domain_for_degree(fixed[i0][k][1].shape[0])
            for k in order
        ]
        # group-wide byte-plane partition per chip: every shard in the
        # group packs alike, so one executable covers them all
        partitions = []
        for o in order:
            mx = np.zeros(fixed[i0][o][1].shape[1], np.uint64)
            for i in idxs:
                np.maximum(mx, fixed[i][o][1].max(axis=0), out=mx)
            partitions.append(
                (np.flatnonzero(mx >= 1 << 8), np.flatnonzero(mx >= 1 << 16))
            )

        def shard_args(i):
            mains = []
            for o, (c1, c2) in zip(order, partitions):
                p0, p1, p2, inv1, inv2 = pack_planes(fixed[i][o][1], c1, c2)
                mains.append(
                    (jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2),
                     jnp.asarray(inv1), jnp.asarray(inv2))
                )
            return jnp.asarray(pv_list[i]), tuple(mains), preps

        args0 = shard_args(idxs[0])
        fs = get_fused_fn(machine, pk, chips, trace_domains, args0)
        group_meta[sig] = (
            fs, chips, trace_domains,
            rounds_meta_for(machine, pk, chips, trace_domains),
        )
        flats[idxs[0]] = fs(*args0)
        for i in idxs[1:]:
            flats[i] = fs(*shard_args(i))

    got_all = jax.device_get(flats)

    shard_proofs = []
    for i in range(n):
        sig = tuple((c.name, t.shape) for c, t in fixed[i])
        fs, chips, trace_domains, rmeta = group_meta[sig]
        got = _unflatten(got_all[i], fs.meta)
        shard_proofs.append(
            assemble_proof(
                pk, chips, trace_domains, rmeta, fri, got,
                [int(v) for v in pv_list[i]],
                [np.asarray(g, np.uint32) for g in got["gsums"]],
                has_prep=bool(pk.chip_information),
            )
        )
    return MachineProof(shard_proofs)
