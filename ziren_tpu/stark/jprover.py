"""Device-resident shard prover: the TPU runs commit -> perm -> quotient ->
FRI open; the host runs only the executor, trace generation and the
Fiat-Shamir challenger (bit-exact transcript, reference
crates/stark/src/prover.rs:296-652).

Produces proofs bit-identical to stark/prover.py (the host oracle); the
default differential test proves the same record through both paths.

Data movement per shard: main traces up (canonical u32, mont-encoded on
device), then only roots / cumulative sums / opened values / query rows
cross the boundary — the LDEs, permutation and quotient matrices never
leave HBM.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ziren_tpu.core import ext as E
from ziren_tpu.core import field as F
from ziren_tpu.ops import jfield as jf
from ziren_tpu.ops import jpcs
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

# Chips shorter than this prove through the host numpy folders (bit-identical
# values): a h<=512 matrix is latency-bound either way, and tracing+compiling
# an XLA kernel per tiny chip costs far more than it saves. The tall chips —
# where all the FLOPs are — run the jitted device kernels.
DEVICE_MIN_HEIGHT = int(os.environ.get("ZIREN_DEVICE_MIN_HEIGHT", "1024"))


def _to_dev(mat: np.ndarray) -> jnp.ndarray:
    """Canonical host matrix -> device mont (upload then encode on device)."""
    return jf.mont_encode(jnp.asarray(np.ascontiguousarray(mat)))


def _fetch(x) -> np.ndarray:
    return np.asarray(jax.device_get(jf.mont_decode(x)), np.uint32)


def _device_pk(machine, pk):
    """Device commit of the preprocessed traces (cached on the pk)."""
    dev = getattr(pk, "_device_data", None)
    if dev is not None:
        return dev
    if pk.data is None:
        pk._device_data = (None, {})
        return pk._device_data
    fri = machine.config.fri
    doms_mats = []
    prep_dev = {}
    for name, dom, _dims, _lo in pk.chip_information:
        m = _to_dev(pk.preprocessed_by_name[name])
        prep_dev[name] = m
        doms_mats.append((dom, m))
    commit, data = jpcs.commit(doms_mats, fri.log_blowup)
    assert np.array_equal(commit, np.asarray(pk.commit, np.uint32)), (
        "device preprocessed commit does not match host pk"
    )
    pk._device_data = (data, prep_dev)
    return pk._device_data


def prove_shard_device(machine, pk, record, challenger):
    """Device counterpart of stark.prover.prove_shard."""
    config = machine.config
    fri = config.fri
    log_blowup = fri.log_blowup

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
    named_traces.sort(key=lambda t: -t[1].shape[0])
    chips = [c for c, _ in named_traces]
    pv = record.public_values
    public_values = pv.to_list() if hasattr(pv, "to_list") else list(pv)
    pv_np = np.asarray(public_values, dtype=np.uint32)

    # upload all main traces (async) and the pk's preprocessed data
    mains_dev = [_to_dev(t) for _, t in named_traces]
    traces = [t for _, t in named_traces]
    heights = [t.shape[0] for _, t in named_traces]
    on_device = [h >= DEVICE_MIN_HEIGHT for h in heights]
    prep_data, prep_dev = _device_pk(machine, pk)

    pcs_host = config.pcs
    trace_domains = [pcs_host.natural_domain_for_degree(h) for h in heights]
    main_commit, main_data = jpcs.commit(
        list(zip(trace_domains, mains_dev)), log_blowup
    )

    ch = challenger
    ch.observe_slice(pv_np)
    ch.observe_slice(main_commit)
    perm_challenges_host = (ch.sample_ext(), ch.sample_ext())
    alpha_m = jpcs.ext_to_mont_dev(perm_challenges_host[0])
    beta_m = jpcs.ext_to_mont_dev(perm_challenges_host[1])
    pv_dev = _to_dev(pv_np)

    # permutation traces: device kernel for tall chips, host folder for short
    perm_flats, cumsums, cumsums_dev = [], [], []
    for chip, main_dev, trace, dev in zip(chips, mains_dev, traces, on_device):
        if dev:
            prep = prep_dev.get(chip.name)
            flat, cum = jfolder.perm_trace_device(
                chip, main_dev, prep, pv_dev, alpha_m, beta_m
            )
            perm_flats.append(flat)
            cumsums_dev.append(cum)
            cumsums.append(None)
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
            cumsums.append(cumsum)

    perm_commit, perm_data = jpcs.commit(
        list(zip(trace_domains, perm_flats)), log_blowup
    )
    ch.observe_slice(perm_commit)

    cumsums = [
        _fetch(cd) if c is None else c for c, cd in zip(cumsums, cumsums_dev)
    ]
    global_sums = []
    for chip, trace, cumsum in zip(chips, traces, cumsums):
        if chip.commit_scope.name == "Global":
            gsum = trace[-1, -14:].astype(np.uint32)
        else:
            gsum = np.zeros(14, dtype=np.uint32)
        global_sums.append(gsum)
        ch.observe_slice(cumsum)
        ch.observe_slice(gsum)

    alpha = ch.sample_ext()

    # quotient evaluation per chip (device kernel / host folder by height)
    quotient_domains = [
        d.create_disjoint_domain(1 << (d.log_n + c.log_quotient_degree))
        for d, c in zip(trace_domains, chips)
    ]
    q_domains = []
    q_chunks_dev = []
    for i, (chip, tdom, qdom) in enumerate(zip(chips, trace_domains, quotient_domains)):
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
            alphas_rev = jpcs.ext_to_mont_dev(
                E.epowers(alpha, chip.num_constraints)[::-1].copy()
            )
            quotient = jfolder.quotient_device(
                chip,
                next_step,
                prep_q,
                main_q,
                perm_q,
                sels,
                pv_dev,
                alphas_rev,
                (alpha_m, beta_m),
                cumsums_dev[i],
                _to_dev(global_sums[i]),
            )
            flat = quotient.reshape(qn, 4)
        else:
            flat = _to_dev(
                _host_quotient(
                    chip, pk, tdom, qdom, next_step,
                    _fetch(prep_q), _fetch(main_q), _fetch(perm_q),
                    public_values, alpha, perm_challenges_host,
                    cumsums[i], global_sums[i],
                )
            )
        for j, sub_dom in enumerate(qdom.split_domains(chip.quotient_degree)):
            q_domains.append(sub_dom)
            q_chunks_dev.append(flat[j :: chip.quotient_degree])

    quotient_commit, quotient_data = jpcs.commit(
        list(zip(q_domains, q_chunks_dev)), log_blowup
    )
    ch.observe_slice(quotient_commit)

    zeta = ch.sample_ext()

    # opening points (host ext values)
    prep_points = []
    for name, dom, _dims, local_only in pk.chip_information:
        pts = [zeta] if local_only else [zeta, dom.next_point(zeta)]
        prep_points.append(pts)
    main_points = [
        [zeta] if c.local_only else [zeta, d.next_point(zeta)]
        for c, d in zip(chips, trace_domains)
    ]
    perm_points = [[zeta, d.next_point(zeta)] for d in trace_domains]
    quotient_points = [[zeta] for _ in q_chunks_dev]

    open_rounds = []
    if prep_data is not None:
        open_rounds.append((prep_data, prep_points))
    open_rounds += [
        (main_data, main_points),
        (perm_data, perm_points),
        (quotient_data, quotient_points),
    ]
    opened, fri_proof = dev_open(fri, open_rounds, ch)
    if prep_data is not None:
        prep_vals, main_vals, perm_vals, quot_vals = opened
    else:
        main_vals, perm_vals, quot_vals = opened
        prep_vals = []

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
        commitment=ShardCommitment(main_commit, perm_commit, quotient_commit),
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
# device open (mirror of pcs.TwoAdicFriPcs.open)
# ---------------------------------------------------------------------------


def dev_open(fri, rounds, challenger):
    log_blowup = fri.log_blowup
    alpha = challenger.sample_ext()

    # Dedupe evaluation points host-side so the jitted body can share z-power
    # tables / (z - x)^-1 tables structurally (points are traced values).
    upoints: list[bytes] = []
    upoint_vals: list[np.ndarray] = []

    def pid(z):
        key = np.asarray(z, np.uint32).tobytes()
        try:
            return upoints.index(key)
        except ValueError:
            upoints.append(key)
            upoint_vals.append(np.asarray(z, np.uint32))
            return len(upoints) - 1

    sig = []
    coeffs_all, ldes_all = [], []
    for data, points_per_mat in rounds:
        for i, pts in enumerate(points_per_mat):
            dom = data.domains[i]
            lde_log = int(data.ldes[i].shape[0]).bit_length() - 1
            sig.append(
                (dom.log_n, lde_log, data.widths[i], tuple(pid(z) for z in pts))
            )
            coeffs_all.append(data.coeffs[i])
            ldes_all.append(data.ldes[i])
    sig = tuple(sig)
    upts_dev = jpcs.ext_to_mont_dev(np.stack(upoint_vals))  # (U, 4)
    alpha_m = jpcs.ext_to_mont_dev(alpha)

    opened_cat, ro_vals, ro_keys = _open_stage(
        sig, coeffs_all, ldes_all, upts_dev, alpha_m
    )
    # split the one fetched (sum_w, 4) block back into per-(mat, point) rows
    opened_cat = np.asarray(jax.device_get(jf.mont_decode(opened_cat)), np.uint32)
    opened_dev = []
    off = 0
    k = 0
    for data, points_per_mat in rounds:
        round_vals = []
        for i, pts in enumerate(points_per_mat):
            w = data.widths[i]
            mat_vals = []
            for _ in pts:
                mat_vals.append(opened_cat[off : off + w])
                off += w
            round_vals.append(mat_vals)
            k += 1
        opened_dev.append(round_vals)
    ro = dict(zip(ro_keys, ro_vals))

    # FRI commit phase on bit-reversed reduced openings
    inputs = sorted(ro.items(), reverse=True)
    log_max = inputs[0][0]
    shifts = _make_shifts(log_max)
    it = iter(inputs)
    l, cur = next(it)
    cur = cur[jpcs.bitrev_idx(l)]
    nxt = next(it, None)
    commits, trees = [], []
    while cur.shape[0] > (1 << log_blowup):
        leaves = cur.reshape(-1, 8)
        tree = jpcs.merkle_commit_device([leaves])
        commits.append(tree.root)
        trees.append(tree)
        challenger.observe_slice(tree.root)
        beta = jpcs.ext_to_mont_dev(challenger.sample_ext())
        cur = jpcs.fri_fold(cur, beta, l, shifts[l])
        l -= 1
        if nxt is not None and nxt[0] == l:
            cur = jf.madd(cur, nxt[1][jpcs.bitrev_idx(l)])
            nxt = next(it, None)
    final_host = _fetch(cur)
    final = final_host[0].copy()
    assert np.all(final_host == final), "final polynomial is not constant"
    challenger.observe_slice(final)

    pow_witness = challenger.grind(fri.proof_of_work_bits)
    query_indices = [
        challenger.sample_bits(log_max) for _ in range(fri.num_queries)
    ]
    idxs_dev = jnp.asarray(np.asarray(query_indices, np.int32))

    # device gathers for every query, fetched in one pass
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

    round_rows = [[_fetch(r) for r in rows] for rows in round_rows_dev]
    round_paths = [_fetch(p) for p in round_paths_dev]
    layer_pairs = [_fetch(p) for p in layer_pairs_dev]
    layer_paths = [_fetch(p) for p in layer_paths_dev]

    query_proofs = []
    for q in range(fri.num_queries):
        input_openings = []
        for r_i in range(len(rounds)):
            rows = [round_rows[r_i][m][q] for m in range(len(round_rows[r_i]))]
            path = [round_paths[r_i][q, j] for j in range(round_paths[r_i].shape[1])]
            input_openings.append((rows, path))
        cp_openings = []
        for l_i in range(len(trees)):
            pair = layer_pairs[l_i][q].reshape(2, 4)
            path = [
                layer_paths[l_i][q, j] for j in range(layer_paths[l_i].shape[1])
            ]
            cp_openings.append((pair, path))
        query_proofs.append(QueryProof(input_openings, cp_openings))

    proof = FriProof(commits, query_proofs, final, pow_witness)
    return opened_dev, proof


def _open_stage(sig, coeffs_all, ldes_all, upts_dev, alpha_m):
    """Opened values + reduced openings, one SMALL jitted kernel per matrix
    shape (colwise contract for the opened values, `_ro_step` for the
    reduced-opening contribution). Per-matrix kernels cache by (rows, width)
    across chips AND shards — a single fused mega-kernel recompiled whenever
    any chip height changed and its one giant straight-line block choked
    XLA:CPU's codegen for upwards of half an hour.

    sig: tuple of (log_n, lde_log, width, point_ids) per matrix, in round
    order. Returns (opened concat (sum w*pts, 4) mont, ro tuple, ro keys)."""
    ro_keys = tuple(sorted({e[1] for e in sig}, reverse=True))
    total_w = sum(e[2] * len(e[3]) for e in sig) + 8
    apows = jpcs.zpow_table(alpha_m, max(total_w.bit_length(), 1))
    zt: dict = {}  # (point_id, log_n) -> (2^log_n, 4) z-power table
    inv_t: dict = {}  # (lde_log, point_id) -> (z - x)^-1 table
    opened = []
    ro = {l: None for l in ro_keys}
    cnt = {l: 0 for l in ro_keys}
    for (log_n, lde_log, w, pids), coeff, lde in zip(sig, coeffs_all, ldes_all):
        for u in pids:
            zk = (u, log_n)
            if zk not in zt:
                zt[zk] = jpcs.zpow_table(upts_dev[u], log_n)
            ys = jpcs.colwise_ext_contract(coeff, zt[zk])
            opened.append(ys)
            ik = (lde_log, u)
            if ik not in inv_t:
                inv_t[ik] = _inv_z_minus_x(upts_dev[u], lde_log)
            ap = apows[cnt[lde_log] : cnt[lde_log] + w]
            acc = _ro_step(lde, ap, ys, inv_t[ik])
            ro[lde_log] = (
                acc if ro[lde_log] is None else jf.madd(ro[lde_log], acc)
            )
            cnt[lde_log] += w
    ro_vals = tuple(
        ro[l]
        if ro[l] is not None
        else jnp.zeros((1 << l, 4), jnp.uint32)
        for l in ro_keys
    )
    return jnp.concatenate(opened, axis=0), ro_vals, ro_keys


@jax.jit
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


@partial(jax.jit, static_argnames=("l",))
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
