"""Traced verifier building blocks (reference: crates/recursion/circuit —
the in-circuit Merkle/challenger/FRI components; written against the DSL
so they prove on the recursion machine)."""

from __future__ import annotations

from .dsl import Felt, Tracer


def traced_compress(t: Tracer, left8, right8):
    """TruncatedPermutation 2-to-1 over two 8-felt digests."""
    return t.poseidon2(list(left8) + list(right8))[:8]


def traced_hash_rows(t: Tracer, felts):
    """PaddingFreeSponge over a flat felt list (rate 8)."""
    state = [t.const(0) for _ in range(16)]
    for i in range(0, len(felts), 8):
        chunk = felts[i : i + 8]
        state = chunk + state[len(chunk):]
        state = t.poseidon2(state)
    return state[:8]


def traced_merkle_verify(t: Tracer, leaf_felts, index_bits, path, root8):
    """Recompute a Merkle root from an opened row, sibling path and index
    bits (all DSL handles); asserts equality with `root8`
    (mirrors core/merkle.py verify_opening for a single matrix)."""
    digest = traced_hash_rows(t, list(leaf_felts))
    for bit, sibling in zip(index_bits, path):
        left = [t.select(bit, s, d) for s, d in zip(sibling, digest)]
        right = [t.select(bit, d, s) for d, s in zip(digest, sibling)]
        digest = traced_compress(t, left, right)
    for d, r in zip(digest, root8):
        t.assert_eq(d, r)
    return digest


def _ext(t, felts4):
    return t.ext_from(felts4)


def _ext_from_base(t, felt):
    z = t.const(0)
    return t.ext_from([felt, z, z, z])


def _assert_ext_eq(t, a, b):
    from .dsl import Felt

    for i in range(4):
        t.assert_eq(Felt(t, a.r + i), Felt(t, b.r + i))


def traced_pow_by_bits(t: Tracer, base: int, bits, reverse: bool):
    """g^rev(i) (reverse=True) or g^i as a Felt, from index bit handles:
    product of select(bit_j, g^(2^k_j), 1) with constant squares of g."""
    from ziren_tpu.core import field as F

    acc = t.const(1)
    n = len(bits)
    for j, bit in enumerate(bits):
        k = (n - 1 - j) if reverse else j
        c = pow(int(base), 1 << k, F.P_INT)
        acc = acc * t.select(bit, t.const(c), t.const(1))
    return acc


def _ext(t, felts4):
    return t.ext_from(felts4)


def _ext_from_base(t, felt):
    z = t.const(0)
    return t.ext_from([felt, z, z, z])


def _assert_ext_eq(t, a, b):
    from .dsl import Felt

    for i in range(4):
        t.assert_eq(Felt(t, a.r + i), Felt(t, b.r + i))


def traced_fri_verify_single(t: Tracer, pcs, proof, commit8, zeta4, ys,
                             log_n, width):
    """Traced verification of a TwoAdicFriPcs proof for ONE committed matrix
    opened at one point (the lift's FRI core: transcript replay, reduced
    opening at each queried index, fold chain, final-poly check, Merkle
    openings — mirrors stark/pcs.py verify for this shape).

    `t` must be a CONCRETE tracer (input_values set): the proof body enters
    as inline hints whose values come from `proof`, and the emitted program
    re-verifies it under the recursion machine's constraints."""
    from ziren_tpu.core import field as F
    from .dsl import Felt, TracedChallenger

    log_blowup = pcs.fri.log_blowup
    l = log_n + log_blowup
    ch = TracedChallenger(t)
    for f in commit8:
        ch.observe(f)
    alpha = _ext(t, ch.sample_ext())
    cp_commits = []
    betas = []
    for c in proof.commit_phase_commits:
        c8 = [t.hint(int(v)) for v in c]
        for f in c8:
            ch.observe(f)
        cp_commits.append(c8)
        betas.append(_ext(t, ch.sample_ext()))
    assert len(cp_commits) == l - log_blowup
    final_poly = [t.hint(int(v)) for v in proof.final_poly]
    for f in final_poly:
        ch.observe(f)
    if pcs.fri.proof_of_work_bits:
        pw = t.hint(int(proof.pow_witness))
        ch.observe(pw)
        pow_low = ch.sample_bits(pcs.fri.proof_of_work_bits)
        t.assert_eq(pow_low, t.const(0))
    half = (F.P_INT + 1) // 2
    for qp in proof.query_proofs:
        bits = ch.sample_bits_list(l)
        rows, path = qp.input_openings[0]
        row = [t.hint(int(v)) for v in rows[0]]
        path_h = [[t.hint(int(x)) for x in lvl] for lvl in path]
        traced_merkle_verify(t, row, bits, path_h, commit8)
        # reduced opening at x = GENERATOR * g_l^rev(index)
        g = F.two_adic_generator(l)
        x = t.const(F.GENERATOR % F.P_INT) * traced_pow_by_bits(
            t, g, bits, reverse=True)
        inv_zx = (_ext(t, zeta4) - _ext_from_base(t, x)).inv()
        acc = None
        apow = None
        for c in range(width):
            diff = _ext(t, ys[4 * c : 4 * c + 4]) - _ext_from_base(t, row[c])
            term = diff if apow is None else apow * diff
            acc = term if acc is None else acc + term
            apow = alpha if apow is None else apow * alpha
        folded = acc * inv_zx
        cur_bits = bits
        shift = F.GENERATOR % F.P_INT
        cur_l = l
        for (pair_np, ppath), beta, c8 in zip(
            qp.commit_phase_openings, betas, cp_commits
        ):
            pair = [t.hint(int(v)) for v in pair_np.reshape(-1)]
            ppath_h = [[t.hint(int(x)) for x in lvl] for lvl in ppath]
            traced_merkle_verify(t, pair, cur_bits[1:], ppath_h, c8)
            b0 = cur_bits[0]
            sel = [t.select(b0, pair[4 + i], pair[i]) for i in range(4)]
            _assert_ext_eq(t, _ext(t, sel), folded)
            e0 = _ext(t, pair[:4])
            e1 = _ext(t, pair[4:])
            gl = F.two_adic_generator(cur_l)
            zero = t.const(0)
            xk = t.const(shift) * traced_pow_by_bits(
                t, gl, [zero] + cur_bits[1:], reverse=True)
            xk_inv = xk.inv()
            even = (e0 + e1) * _ext_from_base(t, t.const(half))
            odd = ((e0 - e1) * _ext_from_base(t, t.const(half))
                   * _ext_from_base(t, xk_inv))
            folded = even + odd * beta
            cur_bits = cur_bits[1:]
            shift = (shift * shift) % F.P_INT
            cur_l -= 1
        _assert_ext_eq(t, folded, _ext(t, final_poly))


class TFV:
    """Traced folder value: a DSL Ext handle with FV operator surface, so
    chip `eval` runs unchanged as a 6th (traced) pass."""

    __slots__ = ("fl", "e")

    def __init__(self, fl, e):
        self.fl = fl
        self.e = e

    def __add__(self, o):
        return self.fl._add(self, self.fl.lift(o))

    __radd__ = __add__

    def __sub__(self, o):
        return self.fl._sub(self, self.fl.lift(o))

    def __rsub__(self, o):
        return self.fl._sub(self.fl.lift(o), self)

    def __mul__(self, o):
        return self.fl._mul(self, self.fl.lift(o))

    __rmul__ = __mul__

    def __neg__(self):
        return self.fl._neg(self)


class TracedVerifierFolder:
    """VerifierFolder over DSL Ext handles: evaluates a chip's constraints
    at zeta INSIDE a recursion program (mirrors stark/folder.py
    VerifierFolder; acc folding acc = acc * alpha + e)."""

    def __init__(self, t: Tracer, prep_local, prep_next, main_local,
                 main_next, sels, public_values, alpha, perm_challenges,
                 local_cumulative_sum, perm_local=None, perm_next=None,
                 global_cumulative_sum=None):
        from ziren_tpu.stark.folder import _Builder

        _Builder.__init__(self)
        self.t = t
        self.sends = []
        self.receives = []
        self._cond = None
        mk = lambda es: [TFV(self, e) for e in es]
        self.prep_local = mk(prep_local)
        self.prep_next = mk(prep_next)
        self.main_local = mk(main_local)
        self.main_next = mk(main_next)
        self.public_values = [self._from_felt(f) for f in public_values]
        self.is_first_row = TFV(self, sels["is_first_row"])
        self.is_last_row = TFV(self, sels["is_last_row"])
        self.is_transition = TFV(self, sels["is_transition"])
        self.alpha = TFV(self, alpha)
        self.acc = self.lift(0)
        self.perm_challenges = tuple(TFV(self, c) for c in perm_challenges)
        self.local_cumulative_sum = TFV(self, local_cumulative_sum)
        self._perm_local = mk(perm_local) if perm_local is not None else None
        self._perm_next = mk(perm_next) if perm_next is not None else None
        if global_cumulative_sum is None:
            self.global_cumulative_sum = [self.lift(0)] * 14
        else:
            self.global_cumulative_sum = [
                self._from_felt(f) for f in global_cumulative_sum
            ]

    # builder surface (duplicated from _Builder to avoid MRO surprises)
    def when(self, cond):
        from ziren_tpu.stark.folder import _CondBuilder

        return _CondBuilder(self, cond)

    def when_first_row(self):
        return self.when(self.is_first_row)

    def when_last_row(self):
        return self.when(self.is_last_row)

    def when_transition(self):
        return self.when(self.is_transition)

    def assert_zero(self, e):
        self._fold(self.lift(e))

    def assert_eq(self, a, b):
        self.assert_zero(self.lift(a) - b)

    def assert_bool(self, e):
        e = self.lift(e)
        self.assert_zero(e * (e - 1))

    def assert_one(self, e):
        self.assert_zero(self.lift(e) - 1)

    def assert_zero_ext(self, e):
        self._fold(self.lift(e))

    def assert_eq_ext(self, a, b):
        self.assert_zero_ext(self.lift(a) - b)

    def send(self, kind, values, mult):
        from ziren_tpu.stark.lookup import Lookup, LookupScope

        self.sends.append(Lookup(kind, values, mult, LookupScope.Local))

    def receive(self, kind, values, mult):
        from ziren_tpu.stark.lookup import Lookup, LookupScope

        self.receives.append(Lookup(kind, values, mult, LookupScope.Local))

    def _from_felt(self, f):
        if isinstance(f, TFV):
            return f
        if isinstance(f, Felt):
            z = self.t.const(0)
            return TFV(self, self.t.ext_from([f, z, z, z]))
        return self.lift(int(f))

    def lift(self, x):
        if isinstance(x, TFV):
            return x
        return TFV(self, self.t.ext_const(
            [int(x) % 2130706433, 0, 0, 0]))

    def _add(self, a, b):
        return TFV(self, a.e + b.e)

    def _sub(self, a, b):
        return TFV(self, a.e - b.e)

    def _mul(self, a, b):
        return TFV(self, a.e * b.e)

    def _neg(self, a):
        return self.lift(0) - a

    def perm_columns(self, width):
        assert len(self._perm_local) == width
        return self._perm_local, self._perm_next

    def _fold(self, e):
        self.acc = self.acc * self.alpha + e
