"""Device-resident TwoAdicFriPcs: the TPU is the prover.

Mirrors the host PCS (ziren_tpu.stark.pcs — reference
crates/stark/src/prover.rs:296-652 / p3 TwoAdicFriPcs) with every matrix
living on device in Montgomery form end to end:

  * commit: per matrix INTT -> coset scale/pad -> NTT -> bit-reverse, then a
    Poseidon2 Merkle MMCS over the batch, all on device. Only the root (8
    canonical u32) crosses to the host challenger.
  * open: z-power tables, opened values (mont matvec), reduced openings
    (mont matmul), FRI fold cascade and per-layer commits on device; the
    Fiat-Shamir challenger, PoW grind and query-index sampling stay host-side
    (bit-exact transcript), with per-query rows/paths gathered on device and
    fetched in one small batch.

Outputs are bit-identical to the host path (Montgomery commutes with all
field arithmetic; encode/decode only at the challenger boundary).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ziren_tpu.core import ext as E
from ziren_tpu.core import field as F
from . import jfield as jf
from . import jposeidon2 as jp2
from ziren_tpu.stark.aot import aot_jit

# ---------------------------------------------------------------------------
# small cached host->device constants
# ---------------------------------------------------------------------------

_CONST_CACHE: dict = {}


def _cached(key, builder):
    v = _CONST_CACHE.get(key)
    if v is None:
        if len(_CONST_CACHE) > 256:
            _CONST_CACHE.clear()
        v = _CONST_CACHE[key] = builder()
    return v


def _mont_np(x: np.ndarray) -> np.ndarray:
    return ((np.asarray(x, np.uint64) << np.uint64(32)) % np.uint64(F.P_INT)).astype(
        np.uint32
    )


def mont_const(v: int) -> jnp.ndarray:
    return jnp.uint32((int(v) << 32) % F.P_INT)


def bitrev_idx(log_n: int) -> np.ndarray:
    # cached as host numpy (always concrete — safe to reuse across traces)
    return _cached(("br", log_n), lambda: np.asarray(F.bit_reverse_indices(log_n)))


def powers_mont(base: int, n: int) -> np.ndarray:
    """(n,) mont constant of base^i (host numpy, cached; concrete in traces)."""
    return _cached(("pow", base, n), lambda: _mont_np(F.powers(base, n)))


def ext_to_mont_dev(x: np.ndarray) -> jnp.ndarray:
    """Canonical host ext array (..., 4) -> device mont array."""
    return jnp.asarray(_mont_np(np.asarray(x, np.uint32)))


def ext_from_mont_host(x) -> np.ndarray:
    return np.asarray(jax.device_get(jf.mont_decode(x)), np.uint32)


# ---------------------------------------------------------------------------
# NTT / LDE (device, mont form)
# ---------------------------------------------------------------------------


def _stage_tables(log_n: int, inverse: bool) -> list:
    def build():
        n = 1 << log_n
        root = F.two_adic_generator(log_n)
        if inverse:
            root = pow(root, F.P_INT - 2, F.P_INT)
        out = []
        for stage in range(log_n):
            half = 1 << stage
            w_span = pow(root, n >> (stage + 1), F.P_INT)
            out.append(_mont_np(F.powers(w_span, half)))
        return out

    return _cached(("tw", log_n, inverse), build)


@partial(jax.jit, static_argnames=("log_n", "inverse"))
def _ntt_bitrev_in(x, log_n: int, inverse: bool = False):
    """DIT butterflies: bit-reversed input -> natural-order output."""
    n = 1 << log_n
    tws = _stage_tables(log_n, inverse)
    for stage in range(log_n):
        half = 1 << stage
        span = half << 1
        blocks = x.reshape(n // span, span, -1)
        lo = blocks[:, :half, :]
        hi = blocks[:, half:, :]
        t = jf.mont_mul(hi, tws[stage][None, :, None])
        x = jnp.concatenate([jf.madd(lo, t), jf.msub(lo, t)], axis=1).reshape(n, -1)
    if inverse:
        n_inv = (pow(n, F.P_INT - 2, F.P_INT) << 32) % F.P_INT
        x = jf.mont_mul(x, jnp.uint32(n_inv))
    return x


def lde_kernel(mat, log_n: int, added_bits: int, shift: int, dom_shift: int):
    """AOT-cached wrapper (stark/aot.py): no re-tracing in warm processes."""
    from ziren_tpu.stark import aot

    def run(m, _l=log_n, _a=added_bits, _s=shift, _d=dom_shift):
        return _lde_kernel_body(m, _l, _a, _s, _d)

    return aot.call_cached(("lde", log_n, added_bits, shift, dom_shift),
                           run, mat)


def _lde_kernel_body(mat, log_n: int, added_bits: int, shift: int, dom_shift: int):
    """(n, w) mont evals over dom_shift*H -> (coeffs, lde natural, lde bitrev)
    over shift*H', |H'| = n << added_bits. All device, mont form."""
    n = 1 << log_n
    big_n = n << added_bits
    coeffs = _ntt_bitrev_in(mat[bitrev_idx(log_n)], log_n, inverse=True)
    if dom_shift != 1:
        # move off the source coset: plain monomial coefficients
        s_inv = pow(int(dom_shift), F.P_INT - 2, F.P_INT)
        coeffs = jf.mont_mul(coeffs, powers_mont(s_inv, n)[:, None])
    scaled = jf.mont_mul(coeffs, powers_mont(shift, n)[:, None])
    big = jnp.zeros((big_n, mat.shape[1]), dtype=jnp.uint32)
    big = big.at[:n].set(scaled)
    lde = _ntt_bitrev_in(big[bitrev_idx(log_n + added_bits)], log_n + added_bits)
    return coeffs, lde, lde[bitrev_idx(log_n + added_bits)]


# ---------------------------------------------------------------------------
# Poseidon2 Merkle MMCS (device)
# ---------------------------------------------------------------------------


@dataclass
class DTree:
    mats_br: list  # device bit-reversed mont mats (possibly height-grouped)
    levels: list  # device (h, 8) mont digest levels, leaf -> root
    root: jnp.ndarray  # DEVICE (8,) mont — fetch stays off the hot path
    # per mats_br entry: [(member_index, width)] — how the (grouped) matrix
    # splits back into the batch's per-matrix openings (None = 1:1)
    members: list = None

    def root_host(self) -> np.ndarray:
        return ext_from_mont_host(self.root)

    def layout(self):
        if self.members is not None:
            return tuple(tuple(g) for g in self.members)
        return tuple(
            ((i, int(m.shape[1])),) for i, m in enumerate(self.mats_br)
        )


def _merkle_levels(mats_br: list) -> list:
    heights = sorted({int(m.shape[0]) for m in mats_br}, reverse=True)
    max_h = heights[0]

    def rows_at(h):
        group = [m for m in mats_br if m.shape[0] == h]
        if not group:
            return None
        return jnp.concatenate(group, axis=1) if len(group) > 1 else group[0]

    cur = jp2.hash_rows(rows_at(max_h))
    levels = [cur]
    h = max_h
    while h > 1:
        h //= 2
        cur = jp2.compress_pairs(cur)
        inj = rows_at(h)
        if inj is not None:
            cur = _compress2(cur, jp2.hash_rows(inj))
        levels.append(cur)
    return levels


def merkle_commit_device(mats_br: list, members=None) -> DTree:
    """Batch Merkle commit over device mont matrices (heights powers of 2),
    matching core/merkle.py commit() exactly (after mont decode). The whole
    tree is ONE jitted computation per height/width signature (AOT-cached);
    the root stays on device (async) — decode with root_host() when
    needed. `members` carries the per-matrix split of height-grouped
    inputs (see commit())."""
    from ziren_tpu.stark import aot

    levels = aot.call_cached(("merkle_levels",), _merkle_levels, mats_br)
    return DTree(mats_br, levels, levels[-1][0], members)


@jax.jit
def _compress2(a, b):
    return jp2.permute(jnp.concatenate([a, b], axis=1))[:, :8]


# ---------------------------------------------------------------------------
# commit
# ---------------------------------------------------------------------------


class DevProverData:
    """Committed batch, stored HEIGHT-GROUPED: all matrices of one height
    are concatenated column-wise and interpolated/low-degree-extended by a
    SINGLE lde kernel call (the per-matrix form cost one dispatch per
    matrix — ~100 per shard on a dispatch-bound transport). Per-matrix
    views are lazy column slices, materialized (and cached) only where a
    consumer genuinely needs the lone matrix."""

    def __init__(self, domains, widths, group_of, group_members,
                 group_coeffs, group_ldes, tree):
        self.domains = domains
        self.widths = widths
        # group_of[i] = (group_key_index, col_offset)
        self.group_of = group_of
        self.group_members = group_members  # per group: [(mat index, w)]
        self.group_coeffs = group_coeffs  # per group: (n, W) mont
        self.group_ldes = group_ldes  # per group: (N, W) mont
        self.tree = tree
        self._coeff_cache: dict = {}
        self._lde_cache: dict = {}

    @property
    def commit(self) -> jnp.ndarray:
        """DEVICE (8,) mont root."""
        return self.tree.root

    def coeff(self, i: int) -> jnp.ndarray:
        v = self._coeff_cache.get(i)
        if v is None:
            g, off = self.group_of[i]
            v = self.group_coeffs[g][:, off : off + self.widths[i]]
            self._coeff_cache[i] = v
        return v

    def lde(self, i: int) -> jnp.ndarray:
        v = self._lde_cache.get(i)
        if v is None:
            g, off = self.group_of[i]
            v = self.group_ldes[g][:, off : off + self.widths[i]]
            self._lde_cache[i] = v
        return v

    # back-compat sequence views
    @property
    def coeffs(self):
        return [self.coeff(i) for i in range(len(self.widths))]

    @property
    def ldes(self):
        return [self.lde(i) for i in range(len(self.widths))]


def batch_layout(domains, widths):
    """Height/shift grouping of a commit batch, tallest first (stable):
    [(key, [member indices])] — the single source of truth shared by
    commit(), the tree gather and the open stage."""
    groups: dict = {}
    for i, dom in enumerate(domains):
        groups.setdefault((dom.log_n, dom.shift), []).append(i)
    keys = sorted(groups, key=lambda k: -k[0])
    return [(k, groups[k]) for k in keys]


def commit(domains_and_mats, log_blowup: int) -> tuple:
    """domains_and_mats: [(Domain, device mont (n,w))]. Returns (root, data).

    Matrices sharing a (height, shift) run through ONE concatenated lde
    kernel. The Merkle tree hashes ONE concatenated matrix per HEIGHT with
    columns in batch order — exactly the multi-matrix MMCS leaf layout —
    so same-height groups with different coset shifts (quotient chunks)
    are re-interleaved by a single column gather; DTree.members lets the
    query gather hand back per-matrix opening rows."""
    domains = [d for d, _m in domains_and_mats]
    widths = [int(m.shape[1]) for _d, m in domains_and_mats]
    layout = batch_layout(domains, widths)
    group_of = [None] * len(domains)
    group_members, group_coeffs, group_ldes, brs = [], [], [], []
    for g, (_key, idxs) in enumerate(layout):
        off = 0
        mem = []
        for i in idxs:
            group_of[i] = (g, off)
            mem.append((i, widths[i]))
            off += widths[i]
        mats = [domains_and_mats[i][1] for i in idxs]
        big = mats[0] if len(mats) == 1 else jnp.concatenate(mats, axis=1)
        dom = domains[idxs[0]]
        c, lde, br = lde_kernel(
            big, dom.log_n, log_blowup, F.GENERATOR % F.P_INT, dom.shift
        )
        group_coeffs.append(c)
        group_ldes.append(lde)
        brs.append(br)
        group_members.append(mem)

    # tree input: per HEIGHT, columns in ascending batch order
    tree_mats, tree_members = [], []
    seen = set()
    for g, (key, _idxs) in enumerate(layout):
        h = key[0]
        if h in seen:
            continue
        seen.add(h)
        gs = [g2 for g2, (k2, _x) in enumerate(layout) if k2[0] == h]
        if len(gs) == 1:
            tree_mats.append(brs[gs[0]])
            tree_members.append(list(group_members[gs[0]]))
            continue
        flat = []  # (mat index, width, col offset in the concat)
        off = 0
        for g2 in gs:
            for i, w in group_members[g2]:
                flat.append((i, w, off))
                off += w
        cat = jnp.concatenate([brs[g2] for g2 in gs], axis=1)
        flat.sort(key=lambda t: t[0])
        colperm = np.concatenate(
            [np.arange(o, o + w) for _i, w, o in flat]
        )
        tree_mats.append(cat[:, jnp.asarray(colperm)])
        tree_members.append([(i, w) for i, w, _o in flat])
    tree = merkle_commit_device(tree_mats, tree_members)
    data = DevProverData(domains, widths, group_of, group_members,
                         group_coeffs, group_ldes, tree)
    return data.commit, data


def evals_on_domain(data: DevProverData, i: int, domain) -> jnp.ndarray:
    """Committed LDE restricted to a subset coset (natural order, device)."""
    lde = data.lde(i)
    assert domain.shift == F.GENERATOR % F.P_INT
    stride = lde.shape[0] // domain.size
    assert stride >= 1 and lde.shape[0] % domain.size == 0
    return lde[::stride]


# ---------------------------------------------------------------------------
# modular contractions (mont, chunked VPU)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("chunk",))
def mat_ext_matmul(mat, vec, chunk: int = 16):
    """(n, w) mont base @ (w, 4) mont ext -> (n, 4) mont ext."""
    n, w = mat.shape
    acc = jnp.zeros((n, 4), dtype=jnp.uint32)
    for c0 in range(0, w, chunk):
        c1 = min(c0 + chunk, w)
        t = jf.mont_mul(mat[:, c0:c1, None], vec[None, c0:c1, :])  # (n,c,4)
        s = t[:, 0]
        for k in range(1, c1 - c0):
            s = jf.madd(s, t[:, k])
        acc = jf.madd(acc, s)
    return acc


@aot_jit
def colwise_ext_contract(mat, zp):
    """(n, w) mont base, (n, 4) mont ext -> (w, 4): out[c] = sum_r mat[r,c]*zp[r].

    Row-chunked scan keeps temporaries bounded."""
    n, w = mat.shape
    chunk = 4096 if n >= 4096 else n
    steps = n // chunk

    def body(i, acc):
        a = jax.lax.dynamic_slice_in_dim(mat, i * chunk, chunk, 0)  # (c, w)
        z = jax.lax.dynamic_slice_in_dim(zp, i * chunk, chunk, 0)  # (c, 4)
        t = jf.mont_mul(a[:, :, None], z[:, None, :])  # (c, w, 4)
        return jf.madd(acc, _madd_reduce0(t))

    acc = jax.lax.fori_loop(0, steps, body, jnp.zeros((w, 4), dtype=jnp.uint32))
    rem = n - steps * chunk
    if rem:
        t = jf.mont_mul(mat[steps * chunk :, :, None], zp[steps * chunk :, None, :])
        acc = jf.madd(acc, _madd_reduce0(t))
    return acc


def _madd_reduce0(t):
    """Modular sum over axis 0 via a halving tree (log depth)."""
    n = t.shape[0]
    while n > 1:
        if n % 2:
            t = jnp.concatenate([t, jnp.zeros_like(t[:1])], axis=0)
            n += 1
        t = jf.madd(t[0::2], t[1::2])
        n //= 2
    return t[0]


@partial(jax.jit, static_argnames=("n",))
def epowers_rev_dev(alpha, n: int):
    """(n, 4) mont: [alpha^(n-1), ..., alpha^1, alpha^0] (device counterpart
    of core.ext.epowers(alpha, n)[::-1])."""
    one = jnp.zeros((4,), jnp.uint32).at[0].set(jf.R1)
    if n == 0:
        return jnp.zeros((0, 4), jnp.uint32)

    def step(c, _):
        return jf.emul(c, alpha), c

    _, pows = jax.lax.scan(step, one, None, length=n)
    return pows[::-1]


def next_point_dev(z_m, domain):
    """Device mont zeta * g_domain (Domain.next_point counterpart)."""
    return jf.mont_mul(z_m, mont_const(domain.generator))


@aot_jit(static_argnames=("log_n",))
def zpow_table(z, log_n: int):
    """Device (2^log_n, 4) mont table of z^i from a (4,) mont point."""
    pows = jnp.zeros((1, 4), dtype=jnp.uint32).at[0, 0].set(jf.R1)
    cur = z
    for _ in range(log_n):
        pows = jnp.concatenate([pows, jf.emul(pows, cur[None, :])], axis=0)
        cur = jf.emul(cur, cur)
    return pows


# ---------------------------------------------------------------------------
# FRI (device folds, host challenger)
# ---------------------------------------------------------------------------


@aot_jit(static_argnames=("log_h", "shift"))
def fri_fold(e_br, beta, log_h: int, shift: int):
    """One fold of bit-reversed ext (2^log_h, 4) mont; beta (4,) mont."""
    lo = e_br[0::2]
    hi = e_br[1::2]
    m = 1 << (log_h - 1)
    w_inv = pow(F.two_adic_generator(log_h), F.P_INT - 2, F.P_INT)
    s_inv = pow(shift, F.P_INT - 2, F.P_INT)
    xinv_nat = (F.powers(w_inv, m).astype(np.uint64) * np.uint64(s_inv)) % np.uint64(
        F.P_INT
    )
    xinv = _cached(
        ("fri_xinv", log_h, shift),
        lambda: _mont_np(xinv_nat.astype(np.uint32))[
            np.asarray(F.bit_reverse_indices(log_h - 1))
        ],
    )
    half = mont_const((F.P_INT + 1) // 2)
    even = jf.mont_mul(jf.madd(lo, hi), half)
    odd = jf.mont_mul(jf.mont_mul(jf.msub(lo, hi), half), xinv[:, None])
    return jf.madd(even, jf.emul(odd, jnp.broadcast_to(beta, odd.shape)))


# ---------------------------------------------------------------------------
# query gathers
# ---------------------------------------------------------------------------


@aot_jit(static_argnames=("log_max_all", "layout"))
def _gather_body(mats_br, levels, idxs, log_max_all: int, layout=()):
    tree_log = int(levels[0].shape[0]).bit_length() - 1
    ti = idxs >> (log_max_all - tree_log)
    n_out = sum(len(g) for g in layout)
    rows = [None] * n_out
    for m, group in zip(mats_br, layout):
        log_h = int(m.shape[0]).bit_length() - 1
        grows = m[ti >> (tree_log - log_h)]  # (nq, W) grouped row
        off = 0
        for member, w in group:
            rows[member] = grows[:, off : off + w]
            off += w
    path = []
    ii = ti
    for lvl in levels[:-1]:
        path.append(lvl[ii ^ 1])
        ii = ii >> 1
    paths = (
        jnp.stack(path, axis=1)
        if path
        else jnp.zeros((idxs.shape[0], 0, 8), jnp.uint32)
    )
    return rows, paths


def gather_tree_openings(tree: DTree, idxs: jnp.ndarray, log_max_all: int):
    """Device gather of (rows per matrix, path digests) for query indices.

    idxs index the globally tallest height (2^log_max_all); this tree's
    openings use idx >> (log_max_all - tree_log), exactly as the host
    pcs.open does. Height-grouped trees split their rows back into the
    batch's per-matrix slices inside the kernel. Returns (rows_dev list
    per matrix, paths_dev (nq, L, 8))."""
    return _gather_body(tree.mats_br, tree.levels, idxs,
                        log_max_all=log_max_all, layout=tree.layout())
