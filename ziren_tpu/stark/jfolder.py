"""Device (JAX) constraint folders: one chip `eval`, traced onto the TPU.

The same duck-typed `air.eval(builder)` pass that drives the host folders
(stark/folder.py) runs here with values backed by jnp uint32 arrays in
Montgomery form. Tracing a chip's eval under jit turns the whole constraint
walk into ONE fused XLA computation per (chip, height) — the TPU equivalent
of the reference's packed ProverConstraintFolder hot loop
(reference: crates/stark/src/quotient.rs:19-60, permutation.rs:103).

Jitted entry points (cached per chip class + shape):
  * perm_trace_fn(chip): (main, prep, pv, alpha, beta) -> (perm_flat, cumsum)
  * quotient_fn(chip):   (prep_q, main_q, perm_q, sels, pv, alphas_rev,
                          challenges, cumsums) -> quotient evals (qn, 4)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ziren_tpu.core import field as F
from ziren_tpu.ops import jfield as jf
from .folder import FV, _Builder
from .lookup import LookupScope
from .permutation import _chunks, _local, eval_permutation_constraints, perm_trace_width


def _mont_int(x: int) -> jnp.ndarray:
    return jnp.uint32((int(x) % F.P_INT << 32) % F.P_INT)


class _JaxNumericBase:
    """FV arithmetic over jnp Montgomery arrays (device counterpart of
    folder._NumericFolderBase)."""

    def lift(self, x):
        if isinstance(x, FV):
            return x
        if isinstance(x, (int, np.integer)):
            return FV(self, _mont_int(int(x)), False)
        # numpy canonical scalar/array -> mont constant
        v = np.asarray(x, np.uint64)
        return FV(
            self, jnp.asarray(((v << np.uint64(32)) % np.uint64(F.P_INT)).astype(np.uint32)), False
        )

    def lift_ext(self, a4):
        return FV(self, a4, True)

    def _as_ext(self, v):
        if v.ext:
            return v.a
        a = jnp.asarray(v.a)
        z = jnp.zeros_like(a)
        return jnp.stack([a, z, z, z], axis=-1)

    def _add(self, a, b):
        if a.ext or b.ext:
            return FV(self, jf.madd(self._as_ext(a), self._as_ext(b)), True)
        return FV(self, jf.madd(a.a, b.a), False)

    def _sub(self, a, b):
        if a.ext or b.ext:
            return FV(self, jf.msub(self._as_ext(a), self._as_ext(b)), True)
        return FV(self, jf.msub(a.a, b.a), False)

    def _mul(self, a, b):
        if a.ext and b.ext:
            return FV(self, jf.emul(a.a, b.a), True)
        if a.ext:
            return FV(self, jf.mont_mul(a.a, jnp.asarray(b.a)[..., None]), True)
        if b.ext:
            return FV(self, jf.mont_mul(b.a, jnp.asarray(a.a)[..., None]), True)
        return FV(self, jf.mont_mul(a.a, b.a), False)

    def _neg(self, a):
        return FV(self, jf.mneg(a.a), a.ext)


class JaxTraceFolder(_JaxNumericBase, _Builder):
    """Collects lookups with device (n,) mont columns (perm-trace pass)."""

    def __init__(self, prep, main, public_values):
        _Builder.__init__(self)
        n = main.shape[0]
        nxt = lambda m: jnp.roll(m, -1, axis=0)
        mk = lambda m: [FV(self, m[:, i], False) for i in range(m.shape[1])]
        self.prep_local = mk(prep) if prep is not None else []
        self.prep_next = mk(nxt(prep)) if prep is not None else []
        self.main_local = mk(main)
        self.main_next = mk(nxt(main))
        self.public_values = [
            FV(self, public_values[i], False) for i in range(public_values.shape[0])
        ]
        z = jnp.zeros((n,), dtype=jnp.uint32)
        self.is_first_row = FV(self, z, False)
        self.is_last_row = FV(self, z, False)
        self.is_transition = FV(self, z, False)

    def _fold(self, e):
        pass


def _perm_body(chip, main, prep, pv, alpha, beta):
    """Batched LogUp trace: all lookups' RLC columns are stacked into one
    (L, n, 4) tensor and inverted with a SINGLE Fermat chain — per-lookup
    inverses would mint ~1.2k XLA ops each and choke compilation on wide
    chips (reference hot loop: crates/stark/src/permutation.rs:103)."""
    n = main.shape[0]
    fl = JaxTraceFolder(prep, main, pv)
    chip.air.eval(fl)
    sends, receives = _local(fl.sends), _local(fl.receives)
    width = perm_trace_width(len(sends) + len(receives), chip.batch_size)
    if width == 0:
        return jnp.zeros((n, 0), jnp.uint32), jnp.zeros((4,), jnp.uint32)
    flat = [(l, True) for l in sends] + [(l, False) for l in receives]
    L = len(flat)
    bs = chip.batch_size
    num_chunks = width - 1

    def col(v):
        a = jnp.asarray(v.a)
        return jnp.broadcast_to(a, (n,))

    # rlc[k] = alpha + kind_k + sum_j beta^(j+1) * values_k[j]
    kinds = np.asarray([int(l.kind) for l, _ in flat], np.uint64)
    kinds_m = jnp.asarray(((kinds << np.uint64(32)) % np.uint64(F.P_INT)).astype(np.uint32))
    rlc = jnp.broadcast_to(alpha, (L, n, 4))
    rlc = rlc.at[:, :, 0].set(jf.madd(rlc[:, :, 0], kinds_m[:, None]))
    max_v = max(len(l.values) for l, _ in flat)
    zero_col = jnp.zeros((n,), dtype=jnp.uint32)
    bpow = beta
    for j in range(max_v):
        vals_j = jnp.stack(
            [col(l.values[j]) if j < len(l.values) else zero_col for l, _ in flat]
        )  # (L, n)
        rlc = jf.madd(rlc, jf.mont_mul(bpow[None, None, :], vals_j[:, :, None]))
        bpow = jf.emul(bpow, beta)
    inv = jf.einv(rlc)  # ONE batched inverse for every lookup
    mults = jnp.stack(
        [col(l.multiplicity) if s else jf.mneg(col(l.multiplicity)) for l, s in flat]
    )  # (L, n)
    entries = jf.mont_mul(inv, mults[:, :, None])  # (L, n, 4)
    pad = num_chunks * bs - L
    if pad:
        entries = jnp.concatenate(
            [entries, jnp.zeros((pad, n, 4), dtype=jnp.uint32)]
        )
    chunked = entries.reshape(num_chunks, bs, n, 4)
    body = chunked[:, 0]
    for k in range(1, bs):
        body = jf.madd(body, chunked[:, k])
    body = body.transpose(1, 0, 2)  # (n, width-1, 4)
    row_sums = body[:, 0]
    for k in range(1, body.shape[1]):
        row_sums = jf.madd(row_sums, body[:, k])
    phi = jax.lax.associative_scan(jf.madd, row_sums, axis=0)
    trace = jnp.concatenate([body, phi[:, None, :]], axis=1)  # (n, width, 4)
    return trace.reshape(n, width * 4), phi[-1]


def _air_fingerprint(chip) -> tuple:
    """Deterministic cross-process identity of a chip's constraint graph:
    class-determined for machine chips; recursion chips additionally shape
    their eval on the program's i/o counts (machine.py Input/Output)."""
    fp = (chip.name, chip.width, chip.preprocessed_width, chip.perm_width,
          chip.num_constraints, chip.max_constraint_degree)
    if getattr(chip.air, "_no_meta_cache", False):
        c = chip.air.c
        fp += (c.program.num_inputs, c.num_outputs)
    return fp


def perm_trace_device(chip, main, prep, pv, alpha, beta):
    """main/prep device mont; pv (npv,) mont; alpha/beta (4,) mont.
    Returns (perm_flat (n, width*4) mont, cumsum (4,) mont). Routed through
    the disk-backed AOT kernel cache (stark/aot.py): a warm process never
    re-traces the folded lookup graph."""
    from . import aot

    key = ("perm", _air_fingerprint(chip))
    if prep is None:
        def run(m, p, a, b, _c=chip):
            return _perm_body(_c, m, None, p, a, b)

        return aot.call_cached(key, run, main, pv, alpha, beta)

    def run(m, pr, p, a, b, _c=chip):
        return _perm_body(_c, m, pr, p, a, b)

    return aot.call_cached(key, run, main, prep, pv, alpha, beta)


# ---------------------------------------------------------------------------
# Quotient folder (device)
# ---------------------------------------------------------------------------


class JaxQuotientFolder(_JaxNumericBase, _Builder):
    def __init__(
        self,
        prep_local,
        prep_next,
        main_local,
        main_next,
        sels,
        public_values,
        powers_of_alpha_rev,
        perm_challenges,
        local_cumulative_sum,
        global_cumulative_sum,
    ):
        _Builder.__init__(self)
        mk = lambda cols: [FV(self, c, False) for c in cols]
        self.prep_local = mk(prep_local)
        self.prep_next = mk(prep_next)
        self.main_local = mk(main_local)
        self.main_next = mk(main_next)
        self.public_values = [
            FV(self, public_values[i], False) for i in range(public_values.shape[0])
        ]
        self.global_cumulative_sum = [
            FV(self, global_cumulative_sum[i], False) for i in range(14)
        ]
        self.is_first_row = FV(self, sels["is_first_row"], False)
        self.is_last_row = FV(self, sels["is_last_row"], False)
        self.is_transition = FV(self, sels["is_transition"], False)
        self._alphas = powers_of_alpha_rev  # (nc, 4) mont
        self._idx = 0
        n = sels["is_first_row"].shape[0]
        self.acc = jnp.zeros((n, 4), dtype=jnp.uint32)
        self.perm_challenges = tuple(self.lift_ext(c) for c in perm_challenges)
        self.local_cumulative_sum = self.lift_ext(local_cumulative_sum)
        self._perm_local = None
        self._perm_next = None

    def set_perm(self, perm_local_cols, perm_next_cols):
        self._perm_local = [self.lift_ext(c) for c in perm_local_cols]
        self._perm_next = [self.lift_ext(c) for c in perm_next_cols]

    def perm_columns(self, width):
        assert len(self._perm_local) == width
        return self._perm_local, self._perm_next

    def _fold(self, e):
        alpha_i = self._alphas[self._idx]
        self._idx += 1
        if e.ext:
            term = jf.emul(e.a, jnp.broadcast_to(alpha_i, e.a.shape))
        else:
            a = jnp.asarray(e.a)
            term = jf.mont_mul(
                jnp.broadcast_to(alpha_i, a.shape + (4,)), a[..., None]
            )
        self.acc = jf.madd(self.acc, term)


def _unflatten_ext(mat_flat):
    n, wd = mat_flat.shape
    return [mat_flat[:, 4 * c : 4 * c + 4] for c in range(wd // 4)]


def _quotient_body(
    chip,
    next_step,
    prep_q,
    main_q,
    perm_q,
    sels,
    pv,
    alphas_rev,
    perm_challenges,
    local_cumsum,
    global_cumsum,
):
    roll = lambda m: jnp.roll(m, -next_step, axis=0)
    folder = JaxQuotientFolder(
        prep_local=[prep_q[:, c] for c in range(prep_q.shape[1])],
        prep_next=[roll(prep_q)[:, c] for c in range(prep_q.shape[1])],
        main_local=[main_q[:, c] for c in range(main_q.shape[1])],
        main_next=[roll(main_q)[:, c] for c in range(main_q.shape[1])],
        sels=sels,
        public_values=pv,
        powers_of_alpha_rev=alphas_rev,
        perm_challenges=(perm_challenges[0], perm_challenges[1]),
        local_cumulative_sum=local_cumsum,
        global_cumulative_sum=global_cumsum,
    )
    if chip.perm_width:
        folder.set_perm(_unflatten_ext(perm_q), _unflatten_ext(roll(perm_q)))
    chip.eval_with_perm(folder)
    assert folder._idx == chip.num_constraints, (
        f"chip {chip.name}: {folder._idx} constraints vs {chip.num_constraints}"
    )
    # divide by the vanishing polynomial
    return jf.mont_mul(folder.acc, sels["inv_zeroifier"][:, None])


_QUOT_CACHE: dict = {}


def quotient_device(
    chip,
    next_step,
    prep_q,
    main_q,
    perm_q,
    sels,
    pv,
    alphas_rev,
    perm_challenges,
    local_cumsum,
    global_cumsum,
):
    """All inputs device mont. sels: dict of 4 (qn,) arrays. alphas_rev
    may be LONGER than the chip's constraint count (the per-shard shared
    power table): the tail slice happens inside the kernel, so one
    epowers kernel call serves every chip. Returns the quotient
    evaluations (qn, 4) mont (already divided by Z_H). Routed through the
    AOT kernel cache (stark/aot.py): the fused constraint graphs (the
    biggest traces in the prover) never re-trace warm."""
    from . import aot

    key = ("quot", _air_fingerprint(chip), next_step)

    def run(prep_q, main_q, perm_q, s0, s1, s2, s3, pv, alphas, pc0, pc1,
            lc, gc, _c=chip, _ns=next_step):
        sels = {
            "is_first_row": s0,
            "is_last_row": s1,
            "is_transition": s2,
            "inv_zeroifier": s3,
        }
        alphas = alphas[alphas.shape[0] - _c.num_constraints :]
        return _quotient_body(
            _c, _ns, prep_q, main_q, perm_q, sels, pv, alphas, (pc0, pc1),
            lc, gc
        )

    return aot.call_cached(
        key, run,
        prep_q,
        main_q,
        perm_q,
        sels["is_first_row"],
        sels["is_last_row"],
        sels["is_transition"],
        sels["inv_zeroifier"],
        pv,
        alphas_rev,
        perm_challenges[0],
        perm_challenges[1],
        local_cumsum,
        global_cumsum,
    )


@partial(jax.jit, static_argnames=("trace_log_n", "trace_shift", "coset_log_n", "coset_shift"))
def selectors_on_coset_device(trace_log_n: int, trace_shift: int, coset_log_n: int, coset_shift: int):
    """Device mont selectors over a coset (counterpart of
    Domain.selectors_on_coset)."""
    from ziren_tpu.ops import jpcs

    n = 1 << trace_log_n
    qn = 1 << coset_log_n
    gen = F.two_adic_generator(coset_log_n)
    xs = jf.mont_mul(jpcs.powers_mont(gen, qn), jpcs.mont_const(coset_shift))
    shift_inv = pow(int(trace_shift), F.P_INT - 2, F.P_INT)
    us = jf.mont_mul(xs, jpcs.mont_const(shift_inv))
    un = jf.mont_pow(us, n)
    one = jnp.uint32(jf.R1)
    z_h = jf.msub(un, one)
    g_inv = pow(F.two_adic_generator(trace_log_n), F.P_INT - 2, F.P_INT)
    first_den = jf.msub(us, one)
    last_den = jf.msub(us, jpcs.mont_const(g_inv))
    return {
        "is_first_row": jf.mont_mul(z_h, jf.minv(first_den)),
        "is_last_row": jf.mont_mul(z_h, jf.minv(last_den)),
        "is_transition": last_den,
        "inv_zeroifier": jf.minv(z_h),
    }
