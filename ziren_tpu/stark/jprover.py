"""Device-resident shard prover: the TPU runs commit -> perm -> quotient ->
FRI open AND the Fiat-Shamir transcript; the host runs only the executor
and trace generation (reference hot path: crates/stark/src/prover.rs:296-652).

ZERO host<->device synchronization per shard: the duplex challenger lives
on device (ops/jchallenger.py) — its buffer structure is shape-determined,
so the entire prove is a stream of async device dispatches with ONE
blocking fetch at the end that pulls the finished proof. This is what makes
the prover latency-tolerant on accelerators behind a slow transport.

Produces proofs bit-identical to stark/prover.py (the host oracle); the
default differential test proves the same record through both paths.
Exception: chips shorter than DEVICE_MIN_HEIGHT prove through the host
numpy folders (identical values) — that path fetches the LogUp/quotient
challenges, so set ZIREN_DEVICE_MIN_HEIGHT=0 (the accelerator default) for
the fully-async pipeline.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .aot import aot_jit
from .backend import ensure_compile_cache

ensure_compile_cache()

from ziren_tpu.core import ext as E
from ziren_tpu.core import field as F
from ziren_tpu.ops import jfield as jf
from ziren_tpu.ops import jpcs
from ziren_tpu.ops.jchallenger import JChallenger
from . import jfolder
from .folder import QuotientFolder, TraceFolder
from .pcs import FriProof, QueryProof
from .permutation import generate_permutation_trace
from .proof import (
    AirOpenedValues,
    ChipOpenedValues,
    ShardCommitment,
    ShardProof,
)


def _default_min_height() -> int:
    env = os.environ.get("ZIREN_DEVICE_MIN_HEIGHT")
    if env is not None:
        return int(env)
    try:
        cpu = jax.default_backend() == "cpu"
    except Exception:  # pragma: no cover
        cpu = True
    # On CPU, tracing+compiling a kernel per tiny chip costs more than it
    # saves; on a real accelerator EVERY chip goes through device kernels
    # so the prove stays sync-free end to end.
    return 1024 if cpu else 0


DEVICE_MIN_HEIGHT = _default_min_height()


def _to_dev(mat: np.ndarray) -> jnp.ndarray:
    """Canonical host matrix -> device mont (upload then encode on device)."""
    return jf.mont_encode(jnp.asarray(np.ascontiguousarray(mat)))


# Packed upload threshold: matrices at least this big go over the wire as
# byte planes (the accelerator transport is bandwidth-bound at ~20 MB/s;
# zkVM traces are overwhelmingly byte-range values, so plane packing cuts
# the bytes moved ~3.5x). Smaller matrices keep the plain path — their
# upload is cheap and reusing the existing mont_encode kernels avoids
# minting new compile-cache entries for dozens of small shapes.
_PACK_MIN_BYTES = 1 << 20


def pack_planes(mat: np.ndarray, c1=None, c2=None):
    """Byte-plane wire format of a canonical u32 matrix.

    Returns (p0, p1, p2, inv1, inv2):
      p0 (n, w)  u8  = mat & 0xff                      (always)
      p1 (n, k1) u8  = (mat >> 8) & 0xff   for cols with max >= 2^8
      p2 (n, k2) u16 = mat >> 16           for cols with max >= 2^16
    k1/k2 are padded to a multiple of 4 (index -> an appended zeros column
    on device) so the jit cache keys on (n, w, k1pad, k2pad) — stable
    across shards even when a single column's range drifts past a byte
    boundary between shards. c1/c2 override the column partition (batched
    callers pass the batch-wide partition so every shard packs alike)."""
    n, w = mat.shape
    if c1 is None or c2 is None:
        mx = mat.max(axis=0) if n else np.zeros(w, np.uint32)
        c1 = np.flatnonzero(mx >= 1 << 8)
        c2 = np.flatnonzero(mx >= 1 << 16)
    p0 = (mat & 0xFF).astype(np.uint8)
    p1 = ((mat[:, c1] >> 8) & 0xFF).astype(np.uint8)
    p2 = (mat[:, c2] >> 16).astype(np.uint16)
    k1p = -len(c1) % 4
    k2p = -len(c2) % 4
    if k1p:
        p1 = np.concatenate([p1, np.zeros((n, k1p), np.uint8)], axis=1)
    if k2p:
        p2 = np.concatenate([p2, np.zeros((n, k2p), np.uint16)], axis=1)
    # gather indices: default -> the zeros column appended on device
    inv1 = np.full(w, p1.shape[1], np.int32)
    inv1[c1] = np.arange(len(c1), dtype=np.int32)
    inv2 = np.full(w, p2.shape[1], np.int32)
    inv2[c2] = np.arange(len(c2), dtype=np.int32)
    return p0, p1, p2, inv1, inv2


def unpack_u32(p0, p1, p2, inv1, inv2):
    """Traced reassembly of byte planes into the full u32 matrix."""
    n = p0.shape[0]
    x = p0.astype(jnp.uint32)
    if p1.shape[1]:
        pad1 = jnp.concatenate([p1, jnp.zeros((n, 1), jnp.uint8)], axis=1)
        x = x | (jnp.take(pad1, inv1, axis=1).astype(jnp.uint32) << 8)
    if p2.shape[1]:
        pad2 = jnp.concatenate([p2, jnp.zeros((n, 1), jnp.uint16)], axis=1)
        x = x | (jnp.take(pad2, inv2, axis=1).astype(jnp.uint32) << 16)
    return x


def _to_dev_packed(mat: np.ndarray) -> jnp.ndarray:
    """Canonical host matrix -> device mont via byte-plane packing (the
    accelerator transport is bandwidth-bound; zkVM traces are mostly
    byte-range values, so plane packing cuts the bytes moved ~3.5x)."""
    mat = np.ascontiguousarray(mat)
    n, w = mat.shape
    if mat.nbytes < _PACK_MIN_BYTES or n == 0 or w == 0:
        return _to_dev(mat)
    p0, p1, p2, inv1, inv2 = pack_planes(mat)
    return _unpack_encode(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2),
        jnp.asarray(inv1), jnp.asarray(inv2),
    )


def upload_traces_packed(traces: list) -> list:
    """Upload a whole shard's trace matrices as ONE wire buffer.

    The tunneled accelerator pays a fixed per-transfer latency that
    dominates when a shard means ~180 small uploads (3 byte planes + 2
    gather indexes x ~36 chips). All planes and indexes are concatenated
    into a single u8 buffer host-side, shipped once, and sliced/unpacked/
    mont-encoded on device. Returns the per-trace mont device matrices.

    CPU backend: falls back to per-matrix uploads — there is no transport
    latency to amortize, and the fused whole-shard unpack graph chokes
    XLA:CPU's codegen for tens of minutes (per-matrix kernels cache by
    (rows, width) and stay warm)."""
    try:
        if jax.default_backend() == "cpu":
            return [_to_dev_packed(t) for t in traces]
    except Exception:  # pragma: no cover
        pass
    metas = []  # (kind, ...) per trace
    segs = []

    def seg(arr):
        a = np.ascontiguousarray(arr).view(np.uint8).reshape(-1)
        off = sum(s.size for s in segs)
        segs.append(a)
        return off, a.size

    for t in traces:
        t = np.ascontiguousarray(t)
        n, w = t.shape
        if t.nbytes < _PACK_MIN_BYTES or n == 0 or w == 0:
            metas.append(("plain", (n, w), seg(t)))
            continue
        p0, p1, p2, inv1, inv2 = pack_planes(t)
        metas.append((
            "packed", (n, w, p1.shape[1], p2.shape[1]),
            seg(p0), seg(p1), seg(p2), seg(inv1), seg(inv2),
        ))
    if not segs:
        return [_to_dev(t) for t in traces]
    big_host = np.concatenate(segs)
    meta_key = tuple(
        (m[0],) + (m[1],) + tuple(m[2:]) for m in metas
    ) + (big_host.size,)
    fn = _UNPACK_ALL_CACHE.get(meta_key)
    if fn is None:
        fn = jax.jit(lambda big: _unpack_all(big, metas))
        if len(_UNPACK_ALL_CACHE) > 64:
            _UNPACK_ALL_CACHE.clear()
        _UNPACK_ALL_CACHE[meta_key] = fn
    return list(fn(jnp.asarray(big_host)))


_UNPACK_ALL_CACHE: dict = {}


def _u32_from_bytes(b):
    """(..., 4) u8 -> (...) u32 little-endian."""
    b = b.astype(jnp.uint32)
    return b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16) | (b[..., 3] << 24)


def _unpack_all(big, metas):
    """Traced: slice one wire buffer into every trace matrix, unpack byte
    planes and mont-encode — ONE device dispatch for the whole shard."""
    out = []
    for m in metas:
        if m[0] == "plain":
            (n, w), (off, sz) = m[1], m[2]
            raw = _u32_from_bytes(big[off : off + sz].reshape(n, w, 4))
            out.append(jf.mont_encode(raw))
            continue
        _kind, (n, w, k1, k2), s0, s1, s2, si1, si2 = m
        p0 = big[s0[0] : s0[0] + s0[1]].reshape(n, w)
        p1 = big[s1[0] : s1[0] + s1[1]].reshape(n, k1)
        p2b = big[s2[0] : s2[0] + s2[1]].reshape(n, k2, 2).astype(jnp.uint32)
        p2 = (p2b[..., 0] | (p2b[..., 1] << 8)).astype(jnp.uint16)
        inv1 = _u32_from_bytes(
            big[si1[0] : si1[0] + si1[1]].reshape(w, 4)
        ).astype(jnp.int32)
        inv2 = _u32_from_bytes(
            big[si2[0] : si2[0] + si2[1]].reshape(w, 4)
        ).astype(jnp.int32)
        out.append(jf.mont_encode(unpack_u32(p0, p1, p2, inv1, inv2)))
    return out


def flatten_fetch(tree):
    """Concatenate every leaf of a fetch pytree into ONE device u32 vector
    (one transfer instead of hundreds of latency-bound small ones).
    Returns (flat_device_array, (treedef, shapes))."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    shapes = []
    flats = []
    for l in leaves:
        arr = jnp.asarray(l)
        shapes.append(arr.shape)
        flats.append(arr.reshape(-1).astype(jnp.uint32))
    flat = (
        jnp.concatenate(flats) if flats else jnp.zeros((0,), jnp.uint32)
    )
    return flat, (treedef, shapes)


def flatten_fetch_decode(tree_mont):
    """flatten_fetch + per-leaf Montgomery decode as ONE kernel call.

    The eager form (decode per leaf, reshape per leaf, concat) costs
    3 dispatches per leaf x ~500 leaves per shard — on a dispatch-bound
    transport that is seconds of pure Python. Every leaf must be mont
    form (encode canonical scalars before adding them to the tree)."""
    import hashlib as _h

    from . import aot

    leaves, treedef = jax.tree_util.tree_flatten(tree_mont)
    shapes = [tuple(jnp.shape(l)) for l in leaves]
    if not leaves:
        return jnp.zeros((0,), jnp.uint32), (treedef, shapes)
    key = ("flat_decode",
           _h.sha256(repr((str(treedef), shapes)).encode()).hexdigest()[:16])

    def run(*ls):
        return jnp.concatenate(
            [jf.mont_decode(jnp.asarray(l)).reshape(-1) for l in ls]
        )

    flat = aot.call_cached(key, run, *leaves)
    return flat, (treedef, shapes)


def unflatten_fetch(flat_np, meta):
    """Host-side inverse of flatten_fetch over the fetched numpy vector."""
    treedef, shapes = meta
    flat_np = np.asarray(flat_np)
    leaves = []
    off = 0
    for shp in shapes:
        size = int(np.prod(shp)) if shp else 1
        leaves.append(flat_np[off : off + size].reshape(shp))
        off += size
    return jax.tree_util.tree_unflatten(treedef, leaves)


@aot_jit
def _unpack_encode(p0, p1, p2, inv1, inv2):
    """Reassemble byte planes into the full u32 matrix and mont-encode."""
    return jf.mont_encode(unpack_u32(p0, p1, p2, inv1, inv2))


def _device_pk(machine, pk):
    """Device commit of the preprocessed traces, cached on the pk PER
    DEVICE: the round-robin multi-device path (machine.prove(devices=...))
    mixes each shard's arrays with the pk data, and exported kernels
    require all arguments co-located."""
    import jax

    try:
        cur = jax.config.jax_default_device or jax.devices()[0]
    except Exception:  # pragma: no cover
        cur = None
    dev_key = getattr(cur, "id", None)
    cache = getattr(pk, "_device_data_cache", None)
    if cache is None:
        cache = pk._device_data_cache = {}
    hit = cache.get(dev_key)
    if hit is not None:
        return hit
    if pk.data is None:
        cache[dev_key] = (None, {})
        return cache[dev_key]
    fri = machine.config.fri
    doms_mats = []
    prep_dev = {}
    for name, dom, _dims, _lo in pk.chip_information:
        m = _to_dev(pk.preprocessed_by_name[name])
        prep_dev[name] = m
        doms_mats.append((dom, m))
    commit, data = jpcs.commit(doms_mats, fri.log_blowup)
    assert np.array_equal(
        jpcs.ext_from_mont_host(commit), np.asarray(pk.commit, np.uint32)
    ), "device preprocessed commit does not match host pk"
    cache[dev_key] = (data, prep_dev)
    return cache[dev_key]


def prove_shard_device(machine, pk, record, challenger):
    """Device counterpart of stark.prover.prove_shard. `challenger` is the
    post-vk HOST challenger clone; its state is uploaded once and the whole
    transcript runs on device."""
    d = dispatch_shard_device(machine, pk, record, challenger)
    got = jax.device_get(d["fetch"])
    return finish_shard_device(pk, d, got)


def dispatch_shard_device(machine, pk, record, challenger):
    """Async half of the device prove: issues every device op for the shard
    and returns {"fetch": device pytree, ...meta} WITHOUT synchronizing —
    so the host can trace-generate and dispatch the NEXT shard while this
    one computes (machine.prove overlaps all shards and fetches once)."""
    config = machine.config
    fri = config.fri
    log_blowup = fri.log_blowup

    named_traces = getattr(record, "_fixed_traces", None)
    if named_traces is None:
        chips = [c for c in machine.chips if c.air.included(record)]
        if not getattr(record, "_deps_done", False):
            for c in chips:
                c.air.emit_synthetic(record)
            for c in chips:
                c.air.generate_dependencies(record, record)
            try:
                record._deps_done = True
            except AttributeError:
                pass
        named_traces = [(c, c.air.generate_trace(record, record)) for c in chips]
    else:
        named_traces = list(named_traces)
    named_traces.sort(key=lambda t: -t[1].shape[0])
    chips = [c for c, _ in named_traces]
    pv = record.public_values
    public_values = pv.to_list() if hasattr(pv, "to_list") else list(pv)
    pv_np = np.asarray(public_values, dtype=np.uint32)

    # upload all main traces as ONE wire buffer (the tunneled transport's
    # per-transfer latency dominates otherwise) and the pk's prep data
    mains_dev = upload_traces_packed([t for _, t in named_traces])
    traces = [t for _, t in named_traces]
    heights = [t.shape[0] for _, t in named_traces]
    on_device = [h >= DEVICE_MIN_HEIGHT for h in heights]
    prep_data, prep_dev = _device_pk(machine, pk)

    pcs_host = config.pcs
    trace_domains = [pcs_host.natural_domain_for_degree(h) for h in heights]
    main_commit, main_data = jpcs.commit(
        list(zip(trace_domains, mains_dev)), log_blowup
    )

    ch = JChallenger.from_host(challenger)
    ch.observe_host_slice(pv_np)
    ch.observe_mont_vec(main_commit)
    alpha_m = ch.sample_ext_mont()
    beta_m = ch.sample_ext_mont()
    pv_dev = _to_dev(pv_np)

    # host ext challenges only if some chip takes the host folder path
    perm_challenges_host = None
    if not all(on_device):
        perm_challenges_host = (
            jpcs.ext_from_mont_host(alpha_m),
            jpcs.ext_from_mont_host(beta_m),
        )

    # permutation traces: device kernel for tall chips, host folder for short
    perm_flats, cumsums_host, cumsums_dev = [], [], []
    for chip, main_dev, trace, dev in zip(chips, mains_dev, traces, on_device):
        if dev:
            prep = prep_dev.get(chip.name)
            flat, cum = jfolder.perm_trace_device(
                chip, main_dev, prep, pv_dev, alpha_m, beta_m
            )
            perm_flats.append(flat)
            cumsums_dev.append(cum)
            cumsums_host.append(None)
        else:
            prep = pk.preprocessed_by_name.get(chip.name)
            fl = TraceFolder(prep, trace, public_values)
            chip.air.eval(fl)
            perm, cumsum = generate_permutation_trace(
                fl.sends, fl.receives, trace.shape[0],
                perm_challenges_host, chip.batch_size,
            )
            perm_flats.append(_to_dev(perm.reshape(trace.shape[0], -1)))
            cumsums_dev.append(None)
            cumsums_host.append(cumsum)

    perm_commit, perm_data = jpcs.commit(
        list(zip(trace_domains, perm_flats)), log_blowup
    )
    ch.observe_mont_vec(perm_commit)

    cumsums_m = [
        _to_dev(c) if cd is None else cd
        for c, cd in zip(cumsums_host, cumsums_dev)
    ]
    global_sums = []
    for chip, trace, cum_m in zip(chips, traces, cumsums_m):
        if chip.commit_scope.name == "Global":
            gsum = trace[-1, -14:].astype(np.uint32)
        else:
            gsum = np.zeros(14, dtype=np.uint32)
        global_sums.append(gsum)
        ch.observe_mont_vec(cum_m)
        ch.observe_host_slice(gsum)

    alpha_q = ch.sample_ext_mont()
    alpha_q_host = (
        jpcs.ext_from_mont_host(alpha_q) if not all(on_device) else None
    )

    # quotient evaluation per chip (device kernel / host folder by height)
    quotient_domains = [
        d.create_disjoint_domain(1 << (d.log_n + c.log_quotient_degree))
        for d, c in zip(trace_domains, chips)
    ]
    # ONE shared alpha-power table; each quotient kernel slices its tail
    max_nc = max((c.num_constraints for c in chips), default=1)
    apows_all = jpcs.epowers_rev_dev(alpha_q, max_nc)
    q_domains = []
    q_chunks_dev = []
    for i, (chip, tdom, qdom) in enumerate(
        zip(chips, trace_domains, quotient_domains)
    ):
        assert chip.log_quotient_degree <= log_blowup
        qn = qdom.size
        next_step = qn // tdom.size
        prep_idx = pk.chip_ordering.get(chip.name)
        if prep_idx is not None:
            prep_q = jpcs.evals_on_domain(prep_data, prep_idx, qdom)
        else:
            prep_q = jnp.zeros((qn, 0), dtype=jnp.uint32)
        main_q = jpcs.evals_on_domain(main_data, i, qdom)
        perm_q = jpcs.evals_on_domain(perm_data, i, qdom)
        if on_device[i]:
            sels = jfolder.selectors_on_coset_device(
                tdom.log_n, tdom.shift, qdom.log_n, qdom.shift
            )
            quotient = jfolder.quotient_device(
                chip,
                next_step,
                prep_q,
                main_q,
                perm_q,
                sels,
                pv_dev,
                apows_all,
                (alpha_m, beta_m),
                cumsums_m[i],
                _to_dev(global_sums[i]),
            )
            flat = quotient.reshape(qn, 4)
        else:
            fetch = lambda x: np.asarray(
                jax.device_get(jf.mont_decode(x)), np.uint32
            )
            flat = _to_dev(
                _host_quotient(
                    chip, pk, tdom, qdom, next_step,
                    fetch(prep_q), fetch(main_q), fetch(perm_q),
                    public_values, alpha_q_host, perm_challenges_host,
                    cumsums_host[i], global_sums[i],
                )
            )
        for j, sub_dom in enumerate(qdom.split_domains(chip.quotient_degree)):
            q_domains.append(sub_dom)
            q_chunks_dev.append(flat[j :: chip.quotient_degree])

    quotient_commit, quotient_data = jpcs.commit(
        list(zip(q_domains, q_chunks_dev)), log_blowup
    )
    ch.observe_mont_vec(quotient_commit)

    zeta = ch.sample_ext_mont()

    # opening points (device mont, structurally tagged for kernel sharing;
    # zeta*g computed once per unique domain size, not per matrix)
    _next_pts: dict = {}

    def pts_for(dom, local_only):
        if local_only:
            return [("z", zeta)]
        if dom.log_n not in _next_pts:
            _next_pts[dom.log_n] = jpcs.next_point_dev(zeta, dom)
        return [("z", zeta), (("zn", dom.log_n), _next_pts[dom.log_n])]

    prep_points = [
        pts_for(dom, local_only)
        for _name, dom, _dims, local_only in pk.chip_information
    ]
    main_points = [
        pts_for(d, c.local_only) for c, d in zip(chips, trace_domains)
    ]
    perm_points = [pts_for(d, False) for d in trace_domains]
    quotient_points = [[("z", zeta)] for _ in q_chunks_dev]

    open_rounds = []
    if prep_data is not None:
        open_rounds.append((prep_data, prep_points))
    open_rounds += [
        (main_data, main_points),
        (perm_data, perm_points),
        (quotient_data, quotient_points),
    ]
    dev_out = dev_open(fri, log_blowup, open_rounds, ch)

    # ---- the ONE synchronization: fetch the finished proof ----------------
    # every leaf stays MONT; flatten_fetch_decode decodes + concatenates in
    # one kernel call (pow is canonical — encode it so the decode-all is
    # uniform)
    to_fetch = {
        "main": main_commit,
        "perm": perm_commit,
        "quot": quotient_commit,
        "cumsums": list(cumsums_m),
        "opened": dev_out["opened_cat"],
        "fri_commits": list(dev_out["layer_roots"]),
        "final": dev_out["final"],
        "pow": jf.mont_encode(dev_out["pow_witness"]),
        "round_rows": [list(rows) for rows in dev_out["round_rows"]],
        "round_paths": list(dev_out["round_paths"]),
        "layer_pairs": list(dev_out["layer_pairs"]),
        "layer_paths": list(dev_out["layer_paths"]),
    }
    rounds_meta = [
        [(data.widths[i], len(pts)) for i, pts in enumerate(points)]
        for data, points in open_rounds
    ]
    # ONE device array per shard -> ONE transfer at fetch time
    fetch_flat, fetch_meta = flatten_fetch_decode(to_fetch)
    return {
        "fetch": fetch_flat,
        "fetch_meta": fetch_meta,
        "chips": chips,
        "trace_domains": trace_domains,
        "rounds_meta": rounds_meta,
        "fri": fri,
        "public_values": public_values,
        "global_sums": global_sums,
        "has_prep": prep_data is not None,
    }


def finish_shard_device(pk, d, got):
    """Host assembly from a dispatched shard's fetched flat buffer."""
    tree = unflatten_fetch(got, d["fetch_meta"])
    return assemble_proof(
        pk, d["chips"], d["trace_domains"], d["rounds_meta"], d["fri"], tree,
        d["public_values"], d["global_sums"], has_prep=d["has_prep"],
    )


def assemble_proof(
    pk, chips, trace_domains, rounds_meta, fri, got,
    public_values, global_sums, has_prep,
):
    """Host assembly of a ShardProof from the fetched device pytree `got`.

    rounds_meta: per opening round, [(width, n_points)] per matrix — the
    static structure that splits the one concatenated opened-values block."""
    u32 = lambda x: np.asarray(x, np.uint32)

    final_host = u32(got["final"])
    final = final_host[0].copy()
    assert np.all(final_host == final), "final polynomial is not constant"

    query_proofs = []
    for q in range(fri.num_queries):
        input_openings = []
        for r_i in range(len(rounds_meta)):
            rows = [u32(m[q]) for m in got["round_rows"][r_i]]
            path = [
                u32(got["round_paths"][r_i][q, j])
                for j in range(got["round_paths"][r_i].shape[1])
            ]
            input_openings.append((rows, path))
        cp_openings = []
        for l_i in range(len(got["layer_pairs"])):
            pair = u32(got["layer_pairs"][l_i][q]).reshape(2, 4)
            path = [
                u32(got["layer_paths"][l_i][q, j])
                for j in range(got["layer_paths"][l_i].shape[1])
            ]
            cp_openings.append((pair, path))
        query_proofs.append(QueryProof(input_openings, cp_openings))

    fri_proof = FriProof(
        [u32(r) for r in got["fri_commits"]],
        query_proofs,
        final,
        int(got["pow"]),
    )

    # split the one fetched (sum_w, 4) block back into per-(mat, point) rows
    opened_cat = u32(got["opened"])
    opened = []
    off = 0
    for metas in rounds_meta:
        round_vals = []
        for w, n_pts in metas:
            mat_vals = []
            for _ in range(n_pts):
                mat_vals.append(opened_cat[off : off + w])
                off += w
            round_vals.append(mat_vals)
        opened.append(round_vals)
    if has_prep:
        prep_vals, main_vals, perm_vals, quot_vals = opened
    else:
        main_vals, perm_vals, quot_vals = opened
        prep_vals = []

    cumsums = [u32(c) for c in got["cumsums"]]
    opened_chips = []
    q_off = 0
    for i, chip in enumerate(chips):
        prep_idx = pk.chip_ordering.get(chip.name)
        if prep_idx is not None:
            pv_ = prep_vals[prep_idx]
            prep_open = AirOpenedValues(
                local=list(pv_[0]), next=list(pv_[1]) if len(pv_) > 1 else []
            )
        else:
            prep_open = AirOpenedValues([], [])
        mv = main_vals[i]
        main_open = AirOpenedValues(
            local=list(mv[0]), next=list(mv[1]) if len(mv) > 1 else []
        )
        perm_open = AirOpenedValues(
            local=list(perm_vals[i][0]), next=list(perm_vals[i][1])
        )
        q = chip.quotient_degree
        quotient_open = [list(quot_vals[q_off + j][0]) for j in range(q)]
        q_off += q
        opened_chips.append(
            ChipOpenedValues(
                preprocessed=prep_open,
                main=main_open,
                permutation=perm_open,
                quotient=quotient_open,
                local_cumulative_sum=cumsums[i],
                global_cumulative_sum=global_sums[i],
                log_degree=trace_domains[i].log_n,
            )
        )

    return ShardProof(
        commitment=ShardCommitment(
            u32(got["main"]), u32(got["perm"]), u32(got["quot"])
        ),
        opened_values=opened_chips,
        opening_proof=fri_proof,
        chip_names=[c.name for c in chips],
        public_values=public_values,
    )


def _host_quotient(
    chip, pk, tdom, qdom, next_step, prep_q, main_q, perm_q,
    public_values, alpha, perm_challenges, cumsum, global_sum,
):
    """Short-chip quotient through the host numpy folder (same values as the
    device kernel; mirrors stark/prover.py:97-141)."""
    qn = qdom.size
    sels = tdom.selectors_on_coset(qdom)
    prep_next_q = np.roll(prep_q, -next_step, axis=0)
    main_next_q = np.roll(main_q, -next_step, axis=0)
    alphas_rev = E.epowers(alpha, chip.num_constraints)[::-1].copy()
    folder = QuotientFolder(
        prep_local=[prep_q[:, c] for c in range(prep_q.shape[1])],
        prep_next=[prep_next_q[:, c] for c in range(prep_q.shape[1])],
        main_local=[main_q[:, c] for c in range(main_q.shape[1])],
        main_next=[main_next_q[:, c] for c in range(main_q.shape[1])],
        sels=sels,
        public_values=public_values,
        powers_of_alpha_rev=alphas_rev,
        perm_challenges=perm_challenges,
        local_cumulative_sum=cumsum,
        global_cumulative_sum=global_sum,
    )
    if chip.perm_width:
        perm_next_q = np.roll(perm_q, -next_step, axis=0)
        unflat = lambda m: [m[:, 4 * c : 4 * c + 4] for c in range(m.shape[1] // 4)]
        folder.set_perm(unflat(perm_q), unflat(perm_next_q))
    chip.eval_with_perm(folder)
    assert folder._idx == chip.num_constraints
    return E.emul_base(folder.acc, sels["inv_zeroifier"]).reshape(qn, 4)


# ---------------------------------------------------------------------------
# device open (mirror of pcs.TwoAdicFriPcs.open) — fully async
# ---------------------------------------------------------------------------


def dev_open(fri, log_blowup, rounds, ch):
    """rounds: [(DevProverData, [[(tag, point_dev) ...] per mat])].
    Returns a dict of DEVICE arrays (see prove_shard_device's fetch)."""
    alpha = ch.sample_ext_mont()

    # Dedupe evaluation points by STRUCTURAL tag (zeta / zeta*g_logn): the
    # same dedupe the host pcs does by value, minus any device sync.
    upoints: dict = {}
    upoint_vals: list = []

    def pid(tag, val):
        if tag not in upoints:
            upoints[tag] = len(upoint_vals)
            upoint_vals.append(val)
        return upoints[tag]

    sig = []
    for r, (data, points_per_mat) in enumerate(rounds):
        for i, pts in enumerate(points_per_mat):
            dom = data.domains[i]
            lde_log = dom.log_n + log_blowup
            sig.append(
                (r, i, dom.log_n, lde_log, data.widths[i],
                 tuple(pid(t, v) for t, v in pts))
            )
    upts_dev = jnp.stack(upoint_vals)  # (U, 4) mont
    alpha_m = alpha

    opened_cat, ro_vals, ro_keys = _open_stage_grouped(
        rounds, sig, upts_dev, alpha_m, log_blowup
    )
    ro = dict(zip(ro_keys, ro_vals))

    # FRI commit phase on bit-reversed reduced openings — folds, per-layer
    # Merkle commits, the transcript observations, the PoW grind AND the
    # query-index sampling run as ONE fused kernel (the per-layer loop was
    # ~50 dispatches per shard)
    inputs = sorted(ro.items(), reverse=True)
    log_max = inputs[0][0]
    seg = ch._concat_buffer()
    keys = tuple(l for l, _ in inputs)
    layer_roots, leaves_list, levels_list, cur, pow_witness, idxs_dev = (
        _fri_phase(
            ch.state, seg, *[v for _l, v in inputs],
            buf_n=ch._buf_n, out_len=ch._out_len, keys=keys,
            log_blowup=log_blowup, pow_bits=fri.proof_of_work_bits,
            num_queries=fri.num_queries,
        )
    )
    trees = [
        jpcs.DTree([lv], levels, levels[-1][0])
        for lv, levels in zip(leaves_list, levels_list)
    ]

    # device gathers for every query
    round_rows_dev, round_paths_dev = [], []
    for data, _pts in rounds:
        rows, paths = jpcs.gather_tree_openings(data.tree, idxs_dev, log_max)
        round_rows_dev.append(rows)
        round_paths_dev.append(paths)
    layer_pairs_dev, layer_paths_dev = [], []
    ii = idxs_dev
    for tree in trees:
        rows, paths = jpcs.gather_tree_openings(
            tree, ii >> 1, int(tree.levels[0].shape[0]).bit_length() - 1
        )
        layer_pairs_dev.append(rows[0])
        layer_paths_dev.append(paths)
        ii = ii >> 1

    return {
        "opened_cat": opened_cat,
        "layer_roots": layer_roots,
        "final": cur,
        "pow_witness": pow_witness,
        "round_rows": round_rows_dev,
        "round_paths": round_paths_dev,
        "layer_pairs": layer_pairs_dev,
        "layer_paths": layer_paths_dev,
    }


def _open_stage_grouped(rounds, sig, upts_dev, alpha_m, log_blowup):
    """Opened values + reduced openings, GROUP-MAJOR: one colwise contract
    and one `_ro_step` per (round, commit height group, point) over the
    height-concatenated matrices the commit already produced — tens of
    kernel calls per shard instead of one pair per (matrix, point)
    (~300+; every call costs milliseconds of dispatch on the tunneled
    accelerator).

    The transcript semantics are unchanged: alpha-power offsets are
    assigned in the original (round, matrix, point) order via a gathered
    (and zero-masked, for matrices not opening at a point) power matrix,
    and the final opened block is restored to per-(matrix, point) order by
    ONE row gather. sig: (round, mat, log_n, lde_log, width, point_ids)
    per matrix, in round order."""
    ro_keys = tuple(sorted({e[3] for e in sig}, reverse=True))
    total_w = sum(e[4] * len(e[5]) for e in sig) + 8
    apows = jpcs.zpow_table(alpha_m, log_n=max(total_w.bit_length(), 1))
    # one zero row appended: gather index -w..-1 -> masked-out column
    apows_z = jnp.concatenate(
        [apows, jnp.zeros((1, 4), jnp.uint32)], axis=0
    )
    zero_row = apows_z.shape[0] - 1

    # alpha offsets in the ORIGINAL (round, matrix, point) order
    cnt = {l: 0 for l in ro_keys}
    ap_off = {}  # (round, mat, point_id) -> alpha offset
    for r, i, _log_n, lde_log, w, pids in sig:
        for u in pids:
            ap_off[(r, i, u)] = cnt[lde_log]
            cnt[lde_log] += w

    sig_by_mat = {(e[0], e[1]): e for e in sig}
    zt: dict = {}
    inv_t: dict = {}
    ro = {l: None for l in ro_keys}
    grouped_blocks = []  # device (W, 4) blocks in group-major order
    block_offsets = {}  # (round, group) -> (block_index, member col offs)
    for r, (data, _pts) in enumerate(rounds):
        for g in range(len(data.group_coeffs)):
            members = data.group_members[g]
            log_n = data.domains[members[0][0]].log_n
            lde_log = log_n + log_blowup
            # union of the group's point ids, in first-appearance order
            pids_u = []
            for i, _w in members:
                for u in sig_by_mat[(r, i)][5]:
                    if u not in pids_u:
                        pids_u.append(u)
            gcoeff = data.group_coeffs[g]
            glde = data.group_ldes[g]
            W = gcoeff.shape[1]
            for u in pids_u:
                zk = (u, log_n)
                if zk not in zt:
                    zt[zk] = jpcs.zpow_table(upts_dev[u], log_n=log_n)
                ys = jpcs.colwise_ext_contract(gcoeff, zt[zk])
                block_offsets[(r, g, u)] = len(grouped_blocks)
                grouped_blocks.append(ys)
                ik = (lde_log, u)
                if ik not in inv_t:
                    inv_t[ik] = _inv_z_minus_x(upts_dev[u], l=lde_log)
                # gathered alpha powers; members not opening at u -> zeros
                idx = np.full(W, zero_row, np.int32)
                off = 0
                for i, w in members:
                    if u in sig_by_mat[(r, i)][5]:
                        base = ap_off[(r, i, u)]
                        idx[off : off + w] = np.arange(
                            base, base + w, dtype=np.int32
                        )
                    off += w
                ap = apows_z[jnp.asarray(idx)]
                acc = _ro_step(glde, ap, ys, inv_t[ik])
                ro[lde_log] = (
                    acc if ro[lde_log] is None else jf.madd(ro[lde_log], acc)
                )

    # restore per-(matrix, point) order with ONE row gather
    block_starts = []
    pos = 0
    for b in grouped_blocks:
        block_starts.append(pos)
        pos += int(b.shape[0])
    perm = np.empty(sum(e[4] * len(e[5]) for e in sig), np.int64)
    out = 0
    for r, i, _log_n, _lde_log, w, pids in sig:
        data = rounds[r][0]
        g, col = data.group_of[i]
        for u in pids:
            start = block_starts[block_offsets[(r, g, u)]] + col
            perm[out : out + w] = np.arange(start, start + w)
            out += w
    grouped_cat = (
        jnp.concatenate(grouped_blocks, axis=0)
        if grouped_blocks
        else jnp.zeros((0, 4), jnp.uint32)
    )
    opened_cat = grouped_cat[jnp.asarray(perm)]

    ro_vals = tuple(
        ro[l]
        if ro[l] is not None
        else jnp.zeros((1 << l, 4), jnp.uint32)
        for l in ro_keys
    )
    return opened_cat, ro_vals, ro_keys


@aot_jit
def _ro_step(lde, ap, ys, inv_t):
    """One matrix-point's reduced-opening contribution:
    (alpha-combined ys - alpha-combined lde row) * (z - x)^-1."""
    y_term = _ext_dot(ap, ys)
    m_term = jpcs.mat_ext_matmul(lde, ap)
    acc = jf.msub(jnp.broadcast_to(y_term, m_term.shape), m_term)
    return jf.emul(acc, inv_t)


def _ext_dot(a, b):
    """(w, 4) x (w, 4) mont ext dot -> (4,)."""
    t = jf.emul(a, b)
    if t.shape[0] == 0:
        return jnp.zeros((4,), jnp.uint32)
    return jpcs._madd_reduce0(t)


@aot_jit(static_argnames=("l",))
def _inv_z_minus_x(z_m, l: int):
    """(2^l, 4) mont inverse of (z - x) over GENERATOR * H_l, natural order."""
    xs = jf.mont_mul(
        jpcs.powers_mont(F.two_adic_generator(l), 1 << l),
        jpcs.mont_const(F.GENERATOR % F.P_INT),
    )
    zmx = jf.msub(
        jnp.broadcast_to(z_m, (1 << l, 4)),
        jnp.concatenate(
            [xs[:, None], jnp.zeros((1 << l, 3), jnp.uint32)], axis=1
        ),
    )
    return jf.einv(zmx)


def _make_shifts(log_max: int) -> dict:
    shifts = {}
    s = F.GENERATOR % F.P_INT
    for l in range(log_max, 0, -1):
        shifts[l] = s
        s = (s * s) % F.P_INT
    return shifts


@aot_jit(static_argnames=("buf_n", "out_len", "keys", "log_blowup",
                          "pow_bits", "num_queries"))
def _fri_phase(state, seg, *ro_vals, buf_n: int, out_len: int, keys,
               log_blowup: int, pow_bits: int, num_queries: int):
    """The whole FRI commit phase, traced as one kernel: bit-reverse the
    reduced openings (tallest first), per-layer Poseidon2 Merkle commit,
    duplex transcript observation, beta sampling, fold, inject the next
    reduced opening at its height, then the final-poly observation, the
    PoW grind and the query-index sampling. The challenger is rebuilt from
    (state, buffered segment, static counts) — its control flow is fully
    shape-determined."""
    from ziren_tpu.ops.jchallenger import JChallenger as _JC

    ch = _JC()
    ch.state = state
    if buf_n:
        ch.input_buffer = [seg]
        ch._buf_n = buf_n
    ch._out_len = out_len

    inputs = list(zip(keys, ro_vals))
    log_max = keys[0]
    shifts = _make_shifts(log_max)
    it = iter(inputs)
    l, cur = next(it)
    cur = cur[jpcs.bitrev_idx(l)]
    nxt = next(it, None)
    layer_roots, leaves_list, levels_list = [], [], []
    while cur.shape[0] > (1 << log_blowup):
        leaves = cur.reshape(-1, 8)
        levels = jpcs._merkle_levels([leaves])
        root = levels[-1][0]
        layer_roots.append(root)
        leaves_list.append(leaves)
        levels_list.append(levels)
        ch.observe_mont_vec(root)
        beta = ch.sample_ext_mont()
        cur = jpcs.fri_fold(cur, beta, log_h=l, shift=shifts[l])
        l -= 1
        if nxt is not None and nxt[0] == l:
            cur = jf.madd(cur, nxt[1][jpcs.bitrev_idx(l)])
            nxt = next(it, None)
    # final poly: constant — observe its coefficient (row 0); the fetched
    # proof assembly asserts all rows agree
    ch.observe_mont_vec(cur[0])
    pow_witness = ch.grind(pow_bits)
    idxs = jnp.stack(
        [ch.sample_bits(log_max) for _ in range(num_queries)]
    ).astype(jnp.int32)
    return layer_roots, leaves_list, levels_list, cur, pow_witness, idxs
