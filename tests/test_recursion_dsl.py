"""Recursion DSL tracer + interpreter (round-2 groundwork, see
docs/recursion_design.md)."""

import pytest as _pytest

pytestmark = _pytest.mark.slow


import os

import numpy as np
import pytest

from ziren_tpu.core import ext as E
from ziren_tpu.core.challenger import DuplexChallenger
from ziren_tpu.recursion.dsl import Ext, Felt, TracedChallenger, Tracer, interpret


def test_felt_arithmetic():
    t = Tracer(num_inputs=2)
    a, b = t.input(0), t.input(1)
    c = (a + b) * a - 3
    t.output(c)
    t.output(c.inv() * c)  # == 1
    out = interpret(t.program(), [10, 20])
    assert out[0] == (30 * 10 - 3) % 2130706433
    assert out[1] == 1


def test_ext_arithmetic():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2130706433, 4, dtype=np.uint32)
    y = rng.integers(0, 2130706433, 4, dtype=np.uint32)
    t = Tracer()
    ex, ey = t.ext_const(x), t.ext_const(y)
    for f_handle in [(ex * ey + ex).inv() * (ex * ey + ex)]:
        for i in range(4):
            t.output(Felt(t, f_handle.r + i))
    out = interpret(t.program())
    assert out == [1, 0, 0, 0]


def test_traced_challenger_matches_host():
    """The Fiat-Shamir core of the recursion verifier: a traced transcript
    replay produces bit-identical challenges to the host challenger."""
    values = [7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43]
    host = DuplexChallenger()
    for v in values:
        host.observe(v)
    expect = [host.sample() for _ in range(10)]

    t = Tracer(num_inputs=len(values))
    ch = TracedChallenger(t)
    for i in range(len(values)):
        ch.observe(t.input(i))
    for _ in range(10):
        t.output(ch.sample())
    got = interpret(t.program(), values)
    assert got == expect


def _demo_program():
    t = Tracer(num_inputs=3)
    a, b, c = t.input(0), t.input(1), t.input(2)
    d = (a + b) * c - 5
    t.assert_eq(d * d.inv(), t.const(1))
    e1 = t.ext_const([1, 2, 3, 4])
    e2 = t.ext_from([a, b, c, d])
    e3 = (e1 * e2).inv() * (e1 * e2)
    t.assert_eq(Felt(t, e3.r), t.const(1))
    ch = TracedChallenger(t)
    for v in (a, b, c, d):
        ch.observe(v)
    s = ch.sample()
    t.output(d)
    t.output(s)
    t.output(t.select(t.const(1), s, a))
    return t.program()


def test_recursion_machine_proves():
    from ziren_tpu.recursion.machine import prove_recursion

    prog = _demo_program()
    inputs = [3, 4, 5]
    expected = interpret(prog, inputs)
    machine, pk, vk, proof, outputs = prove_recursion(prog, inputs)
    assert outputs == expected
    assert machine.verify(vk, proof)


def test_recursion_machine_rejects_wrong_outputs():
    import pytest

    from ziren_tpu.recursion.machine import prove_recursion
    from ziren_tpu.stark.verifier import VerificationError

    prog = _demo_program()
    machine, pk, vk, proof, outputs = prove_recursion(prog, [3, 4, 5])
    # claim a different output in the public values
    proof.shard_proofs[0].public_values[3] = (outputs[0] + 1) % 2130706433
    with pytest.raises(VerificationError):
        machine.verify(vk, proof)


def test_sample_bits_with_hints():
    """Traced sample_bits (hinted canonical bit decomposition) matches the
    host challenger and proves in-circuit."""
    from ziren_tpu.recursion.machine import prove_recursion

    values = [5, 9, 14, 32, 77, 100, 1, 2]
    host = DuplexChallenger()
    for v in values:
        host.observe(v)
    s_host = host.sample()
    expect_bits = s_host & 0x3FF

    t = Tracer(num_inputs=len(values))
    ch = TracedChallenger(t)
    for i in range(len(values)):
        ch.observe(t.input(i))
    low = ch.sample_bits(10)
    t.output(low)
    prog = t.program()
    hints = [(s_host >> i) & 1 for i in range(31)]
    out = interpret(prog, values, hints=hints)
    assert out == [expect_bits]
    machine, pk, vk, proof, outputs = prove_recursion(
        prog, values, hints=hints)
    assert outputs == [expect_bits]
    assert machine.verify(vk, proof)

    # a tampered bit decomposition must fail witness generation constraints
    bad = list(hints)
    bad[0] ^= 1
    import pytest
    with pytest.raises(AssertionError):
        interpret(prog, values, hints=bad)


def test_traced_merkle_verify_proves():
    """A real Merkle opening from core/merkle.py verifies inside a traced
    recursion program (leaf + path + index bits as hints, root as input)."""
    from ziren_tpu.core import merkle
    from ziren_tpu.recursion.machine import prove_recursion
    from ziren_tpu.recursion.verifier import traced_merkle_verify

    rng = np.random.default_rng(3)
    mat = rng.integers(0, 2130706433, size=(16, 5), dtype=np.uint32)
    tree = merkle.commit([mat])
    index = 11
    rows, path = merkle.open_at(tree, index)
    assert merkle.verify_opening(tree.root, [(16, 5)], index, rows, path)

    t = Tracer(num_inputs=8)
    root = [t.input(i) for i in range(8)]
    leaf = [t.hint() for _ in range(5)]
    bits = []
    for lvl in range(4):
        b = t.hint()
        t.assert_eq(b * b, b)
        bits.append(b)
    path_h = [[t.hint() for _ in range(8)] for _ in range(4)]
    traced_merkle_verify(t, leaf, bits, path_h, root)
    prog = t.program()

    hints = [int(v) for v in rows[0]]
    hints += [(index >> lvl) & 1 for lvl in range(4)]
    for lvl in range(4):
        hints += [int(x) for x in path[lvl]]
    inputs = [int(x) for x in tree.root]
    interpret(prog, inputs, hints=hints)  # asserts pass
    machine, pk, vk, proof, _ = prove_recursion(prog, inputs, hints=hints)
    assert machine.verify(vk, proof)

    # wrong root -> the traced assertion fails at witness time
    import pytest
    bad = list(inputs)
    bad[0] = (bad[0] + 1) % 2130706433
    with pytest.raises(AssertionError):
        interpret(prog, bad, hints=hints)


def test_traced_fri_verify_real_proof():
    """A REAL TwoAdicFriPcs proof (single matrix, 2 queries, PoW) verifies
    inside a traced recursion program, which itself proves on the recursion
    machine — the FRI core of the lift."""
    from ziren_tpu.core import field as F
    from ziren_tpu.recursion.machine import prove_recursion
    from ziren_tpu.recursion.verifier import traced_fri_verify_single
    from ziren_tpu.stark.domain import natural_domain_for_degree
    from ziren_tpu.stark.pcs import FriConfig, TwoAdicFriPcs

    pcs = TwoAdicFriPcs(FriConfig(log_blowup=1, num_queries=2,
                                  proof_of_work_bits=4))
    rng = np.random.default_rng(9)
    mat = rng.integers(0, F.P_INT, size=(16, 3), dtype=np.uint32)
    dom = natural_domain_for_degree(16)
    commit, data = pcs.commit([(dom, mat)])
    zeta = np.array([5, 6, 7, 8], dtype=np.uint32)
    ch = DuplexChallenger()
    ch.observe_slice(commit)
    opened, proof = pcs.open([(data, [[zeta]])], ch)
    ys = opened[0][0][0]  # (w, 4)
    ch2 = DuplexChallenger()
    ch2.observe_slice(commit)
    assert pcs.verify([(commit, [(dom, [(zeta, ys)])])], proof, ch2)

    inputs = ([int(v) for v in commit] + [int(v) for v in zeta]
              + [int(v) for v in np.asarray(ys).reshape(-1)])
    t = Tracer(num_inputs=len(inputs), input_values=inputs)
    commit_h = [t.input(i) for i in range(8)]
    zeta_h = [t.input(8 + i) for i in range(4)]
    ys_h = [t.input(12 + i) for i in range(12)]
    traced_fri_verify_single(t, pcs, proof, commit_h, zeta_h, ys_h,
                             log_n=4, width=3)
    prog = t.program()
    interpret(prog, inputs, hints=t.hint_values)  # assertions hold
    machine, pk, vk, pf, _ = prove_recursion(prog, inputs,
                                             hints=t.hint_values)
    assert machine.verify(vk, pf)

    # corrupting the claimed opened value must break the traced transcript
    import pytest
    bad = list(inputs)
    bad[12] = (bad[12] + 1) % F.P_INT
    with pytest.raises(AssertionError):
        interpret(prog, bad, hints=t.hint_values)


def test_traced_chip_constraint_eval():
    """The 6th folder pass: a real MIPS chip's full constraint evaluation at
    zeta (including the permutation argument) traced in the DSL matches the
    host VerifierFolder accumulator exactly."""
    from ziren_tpu.executor.asm import fibonacci_program
    from ziren_tpu.machine.mips import prove_program
    from ziren_tpu.recursion.verifier import TracedVerifierFolder
    from ziren_tpu.stark.domain import natural_domain_for_degree
    from ziren_tpu.stark.folder import VerifierFolder
    from ziren_tpu.stark.verifier import _unflatten

    prog = fibonacci_program(30)
    machine, pk, vk, proof, ex = prove_program(prog)
    sp = proof.shard_proofs[0]
    name = "AddSub"
    chip = machine.chip_by_name[name]
    vals = sp.opened_values[sp.chip_names.index(name)]
    dom = natural_domain_for_degree(1 << vals.log_degree)
    rng = np.random.default_rng(0)
    zeta, alpha, pc1, pc2 = (
        rng.integers(0, 2130706433, 4, dtype=np.uint32) for _ in range(4)
    )
    sels = dom.selectors_at_point(zeta)
    host = VerifierFolder(
        prep_local=[], prep_next=[],
        main_local=vals.main.local, main_next=vals.main.next,
        sels=sels, public_values=sp.public_values, alpha=alpha,
        perm_challenges=(pc1, pc2),
        local_cumulative_sum=vals.local_cumulative_sum,
        perm_local=_unflatten(vals.permutation.local),
        perm_next=_unflatten(vals.permutation.next),
        global_cumulative_sum=vals.global_cumulative_sum,
    )
    chip.eval_with_perm(host)
    expect = [int(v) for v in host.acc]

    flat = []

    def push_ext(v):
        flat.extend(int(x) for x in np.asarray(v, np.uint32))

    for v in vals.main.local:
        push_ext(v)
    for v in vals.main.next:
        push_ext(v)
    for nm in ("is_first_row", "is_last_row", "is_transition"):
        push_ext(sels[nm])
    push_ext(alpha)
    push_ext(pc1)
    push_ext(pc2)
    push_ext(vals.local_cumulative_sum)
    perm_l = _unflatten(vals.permutation.local)
    perm_n = _unflatten(vals.permutation.next)
    for v in perm_l:
        push_ext(v)
    for v in perm_n:
        push_ext(v)
    pv_vals = [int(x) for x in sp.public_values]
    gsum = [int(x) for x in vals.global_cumulative_sum]
    inputs = flat + pv_vals + gsum
    t = Tracer(num_inputs=len(inputs), input_values=inputs)
    pos = [0]

    def take_ext():
        h = t.ext_from([t.input(pos[0] + k) for k in range(4)])
        pos[0] += 4
        return h

    ml = [take_ext() for _ in vals.main.local]
    mn = [take_ext() for _ in vals.main.next]
    s_first, s_last, s_trans = take_ext(), take_ext(), take_ext()
    alpha_h, pc1_h, pc2_h, lcs_h = (take_ext() for _ in range(4))
    pl = [take_ext() for _ in perm_l]
    pn = [take_ext() for _ in perm_n]
    pv_h = [t.input(pos[0] + j) for j in range(len(pv_vals))]
    gs_h = [t.input(pos[0] + len(pv_vals) + j) for j in range(14)]
    folder = TracedVerifierFolder(
        t, [], [], ml, mn,
        {"is_first_row": s_first, "is_last_row": s_last,
         "is_transition": s_trans},
        pv_h, alpha_h, (pc1_h, pc2_h), lcs_h,
        perm_local=pl, perm_next=pn, global_cumulative_sum=gs_h,
    )
    chip.eval_with_perm(folder)
    got = [t.vals[folder.acc.e.r + k] for k in range(4)]
    assert got == expect


def test_traced_merkle_batch():
    """Compress-and-inject MMCS opening (mixed heights) verifies in-trace."""
    from ziren_tpu.core import merkle
    from ziren_tpu.recursion.verifier import traced_merkle_verify_batch

    rng = np.random.default_rng(4)
    mats = [rng.integers(0, 2130706433, size=(16, 3), dtype=np.uint32),
            rng.integers(0, 2130706433, size=(4, 2), dtype=np.uint32)]
    tree = merkle.commit(mats)
    dims = [(16, 3), (4, 2)]
    index = 13
    rows, path = merkle.open_at(tree, index)
    assert merkle.verify_opening(tree.root, dims, index, rows, path)

    inputs = [int(v) for v in tree.root]
    t = Tracer(num_inputs=8, input_values=inputs)
    root_h = [t.input(i) for i in range(8)]
    bits = [t.hint((index >> lvl) & 1) for lvl in range(4)]
    for b in bits:
        t.assert_eq(b * b, b)
    rows_h = [[t.hint(int(v)) for v in r] for r in rows]
    path_h = [[t.hint(int(x)) for x in lvl] for lvl in path]
    traced_merkle_verify_batch(t, dims, bits, rows_h, path_h, root_h)
    prog = t.program()
    interpret(prog, inputs, hints=t.hint_values)
    from ziren_tpu.recursion.machine import prove_recursion
    machine, pk, vk, pf, _ = prove_recursion(prog, inputs,
                                             hints=t.hint_values)
    assert machine.verify(vk, pf)


def test_traced_pcs_verify_multi_round():
    """Generic traced pcs.verify: 2 rounds, 3 matrices, mixed heights, two
    opening points — mirrors the shard-proof shape."""
    from ziren_tpu.core import field as F
    from ziren_tpu.recursion.machine import prove_recursion
    from ziren_tpu.recursion.verifier import traced_pcs_verify
    from ziren_tpu.stark.domain import natural_domain_for_degree
    from ziren_tpu.stark.pcs import FriConfig, TwoAdicFriPcs
    from ziren_tpu.recursion.dsl import TracedChallenger

    pcs = TwoAdicFriPcs(FriConfig(log_blowup=1, num_queries=2,
                                  proof_of_work_bits=4))
    rng = np.random.default_rng(11)
    m1 = rng.integers(0, F.P_INT, size=(16, 2), dtype=np.uint32)
    m2 = rng.integers(0, F.P_INT, size=(4, 3), dtype=np.uint32)
    m3 = rng.integers(0, F.P_INT, size=(8, 2), dtype=np.uint32)
    d1, d2, d3 = (natural_domain_for_degree(n) for n in (16, 4, 8))
    c1, data1 = pcs.commit([(d1, m1), (d2, m2)])
    c2, data2 = pcs.commit([(d3, m3)])
    zeta = np.array([9, 8, 7, 6], dtype=np.uint32)
    zeta2 = d1.next_point(zeta)
    host_ch = DuplexChallenger()
    host_ch.observe_slice(c1)
    host_ch.observe_slice(c2)
    opened, proof = pcs.open(
        [(data1, [[zeta, zeta2], [zeta]]), (data2, [[zeta]])], host_ch)
    vch = DuplexChallenger()
    vch.observe_slice(c1)
    vch.observe_slice(c2)
    assert pcs.verify(
        [(c1, [(d1, [(zeta, opened[0][0][0]), (zeta2, opened[0][0][1])]),
               (d2, [(zeta, opened[0][1][0])])]),
         (c2, [(d3, [(zeta, opened[1][0][0])])])],
        proof, vch)

    # traced
    inputs = [int(v) for v in c1] + [int(v) for v in c2]
    t = Tracer(num_inputs=16, input_values=inputs)
    c1_h = [t.input(i) for i in range(8)]
    c2_h = [t.input(8 + i) for i in range(8)]
    ch = TracedChallenger(t)
    for f in c1_h + c2_h:
        ch.observe(f)
    zeta_h = t.ext_const([int(v) for v in zeta])
    zeta2_h = t.ext_const([int(v) for v in zeta2])

    def ys_h(arr):
        return [t.ext_const([int(x) for x in row]) for row in arr]

    rounds = [
        (c1_h, [(4, 2, [(zeta_h, ys_h(opened[0][0][0])),
                        (zeta2_h, ys_h(opened[0][0][1]))]),
                (2, 3, [(zeta_h, ys_h(opened[0][1][0]))])]),
        (c2_h, [(3, 2, [(zeta_h, ys_h(opened[1][0][0]))])]),
    ]
    traced_pcs_verify(t, pcs, ch, rounds, proof)
    prog = t.program()
    interpret(prog, inputs, hints=t.hint_values)
    machine, pk, vk, pf, _ = prove_recursion(prog, inputs,
                                             hints=t.hint_values)
    assert machine.verify(vk, pf)


def test_lift_core_engine_proof():
    """Full traced shard verification of a generic-engine proof, itself
    proved on the recursion machine (the lift core)."""
    from test_stark_engine import FibonacciAir, Record, fib_pv
    from ziren_tpu.recursion.machine import prove_recursion
    from ziren_tpu.recursion.verifier import traced_verify_shard
    from ziren_tpu.stark.config import dev_config
    from ziren_tpu.stark.machine import StarkMachine

    machine = StarkMachine(dev_config(), [FibonacciAir()],
                           num_public_values=3)
    pk, vk = machine.setup()
    proof = machine.prove(pk, [Record(n=16, pv=fib_pv(16))])
    sp = proof.shard_proofs[0]
    inputs = [int(v) for v in vk.commit] + [int(v) for v in sp.public_values]
    t = Tracer(num_inputs=len(inputs), input_values=inputs)
    vk_h = [t.input(i) for i in range(8)]
    pv_h = [t.input(8 + i) for i in range(len(sp.public_values))]
    traced_verify_shard(t, machine, vk, sp, pv_h, vk_h)
    prog = t.program()
    interpret(prog, inputs, hints=t.hint_values)
    m2, pk2, vk2, pf2, _ = prove_recursion(prog, inputs,
                                           hints=t.hint_values)
    assert m2.verify(vk2, pf2)

    # a corrupted public value must break the traced transcript
    import pytest
    bad = list(inputs)
    bad[9] = (bad[9] + 1) % 2130706433
    with pytest.raises(AssertionError):
        interpret(prog, bad, hints=t.hint_values)


def test_lift_core_mips_proof():
    """THE lift milestone: a full 22-chip MIPS shard proof verified inside
    a recursion proof (traced transcript + FRI + all chip constraints)."""
    from ziren_tpu.executor.asm import fibonacci_program
    from ziren_tpu.machine.mips import prove_program
    from ziren_tpu.recursion.machine import prove_recursion
    from ziren_tpu.recursion.verifier import traced_verify_shard

    prog_m = fibonacci_program(30)
    machine, pk, vk, proof, ex = prove_program(prog_m)
    sp = proof.shard_proofs[0]
    inputs = ([int(v) for v in vk.commit]
              + [int(v) for v in sp.public_values]
              + [int(x) for x in vk.extra_observations])
    t = Tracer(num_inputs=len(inputs), input_values=inputs)
    vk_h = [t.input(i) for i in range(8)]
    npv = len(sp.public_values)
    pv_h = [t.input(8 + i) for i in range(npv)]
    extra_h = [t.input(8 + npv + i)
               for i in range(len(vk.extra_observations))]
    traced_verify_shard(t, machine, vk, sp, pv_h, vk_h, extra_h)
    prog = t.program()
    interpret(prog, inputs, hints=t.hint_values)
    m2, pk2, vk2, pf2, _ = prove_recursion(prog, inputs,
                                           hints=t.hint_values)
    assert m2.verify(vk2, pf2)


def test_compress_pipeline():
    """lift + join + compress: two engine shard proofs reduce to ONE
    recursion proof (the reference's compress tree shape)."""
    from test_stark_engine import FibonacciAir, Record, fib_pv
    from ziren_tpu.recursion.pipeline import compress
    from ziren_tpu.stark.config import dev_config
    from ziren_tpu.stark.machine import StarkMachine

    machine = StarkMachine(dev_config(), [FibonacciAir()],
                           num_public_values=3)
    pk, vk = machine.setup()
    proof = machine.prove(pk, [Record(n=16, pv=fib_pv(16)),
                               Record(n=32, pv=fib_pv(32))])
    assert len(proof.shard_proofs) == 2
    rm, rvk, final_sp = compress(machine, vk, proof)
    # the final proof is one recursion shard proof; verify it directly
    from ziren_tpu.stark.proof import MachineProof
    assert rm.verify(rvk, MachineProof([final_sp]))
    # its public values expose both children's (vk, pv) interfaces
    assert len(final_sp.public_values) == 2 * (8 + 8 + 3)


@pytest.mark.skipif(os.environ.get("ZIREN_SLOW_TESTS") != "1",
                    reason="multi-minute: set ZIREN_SLOW_TESTS=1")
def test_compress_multishard_mips():
    """Full pipeline on a real multi-shard MIPS continuation proof."""
    from ziren_tpu.executor.asm import fibonacci_program
    from ziren_tpu.machine.mips import prove_program
    from ziren_tpu.recursion.pipeline import compress
    from ziren_tpu.stark.proof import MachineProof

    prog = fibonacci_program(600)
    machine, pk, vk, proof, ex = prove_program(prog, shard_size=2048)
    assert len(proof.shard_proofs) >= 2
    rm, rvk, final_sp = compress(machine, vk, proof)
    assert rm.verify(rvk, MachineProof([final_sp]))


def test_compact_lift_digest():
    """Compact lift: the proof's only public values are the Poseidon2
    digest of (inner vk, pv) — wrap-ready, recomputable host-side."""
    from test_stark_engine import FibonacciAir, Record, fib_pv
    from ziren_tpu.recursion.pipeline import lift, lift_digest
    from ziren_tpu.stark.config import dev_config
    from ziren_tpu.stark.machine import StarkMachine

    m = StarkMachine(dev_config(), [FibonacciAir()], num_public_values=3)
    pk, vk = m.setup()
    proof = m.prove(pk, [Record(n=16, pv=fib_pv(16))])
    sp = proof.shard_proofs[0]
    rm, rvk, rproof, inputs = lift(m, vk, sp, compact=True)
    final = rproof.shard_proofs[0]
    assert final.public_values == lift_digest(vk, sp)
    assert rm.verify(rvk, rproof)


def test_compress_reference_elf():
    """The reference repo's real guest ELF: prove + compress + verify."""
    from ziren_tpu.executor.program import load_elf
    from ziren_tpu.machine.mips import prove_program
    from ziren_tpu.recursion.pipeline import compress
    from ziren_tpu.stark.proof import MachineProof

    elf = open("/root/reference/crates/prover/elf/mipsel-zkm-zkvm-elf",
               "rb").read()
    machine, pk, vk, proof, ex = prove_program(load_elf(elf))
    rm, rvk, final_sp = compress(machine, vk, proof)
    assert rm.verify(rvk, MachineProof([final_sp]))


@pytest.mark.skipif(os.environ.get("ZIREN_SLOW_TESTS") != "1",
                    reason="multi-minute: set ZIREN_SLOW_TESTS=1")
def test_chained_compress_mips():
    """Cross-shard pv chaining (pc / shard index / digest equality) enforced
    IN-CIRCUIT at the first join layer."""
    from ziren_tpu.executor.asm import fibonacci_program
    from ziren_tpu.machine.mips import prove_program
    from ziren_tpu.recursion.pipeline import (compress, join, lift,
                                              mips_shard_chain)
    from ziren_tpu.stark.proof import MachineProof

    prog = fibonacci_program(600)
    machine, pk, vk, proof, ex = prove_program(prog, shard_size=2048)
    assert len(proof.shard_proofs) == 2
    rm, rvk, final_sp = compress(machine, vk, proof, chain=mips_shard_chain)
    assert rm.verify(rvk, MachineProof([final_sp]))

    # joining the SAME shard twice violates the +1 shard-index chain
    a = lift(machine, vk, proof.shard_proofs[0])
    side = (a[0], a[1], a[2].shard_proofs[0])
    with pytest.raises(AssertionError):
        join(side, side, chain=mips_shard_chain)


def test_shrink_compact_artifact():
    """compress -> shrink: the final artifact is one recursion proof whose
    only public values are an 8-felt digest (wrap input shape)."""
    from test_stark_engine import FibonacciAir, Record, fib_pv
    from ziren_tpu.recursion.pipeline import compress, lift_digest, shrink
    from ziren_tpu.stark.config import dev_config
    from ziren_tpu.stark.machine import StarkMachine
    from ziren_tpu.stark.proof import MachineProof

    m = StarkMachine(dev_config(), [FibonacciAir()], num_public_values=3)
    pk, vk = m.setup()
    proof = m.prove(pk, [Record(n=16, pv=fib_pv(16)),
                         Record(n=32, pv=fib_pv(32))])
    rm, rvk, final_sp = compress(m, vk, proof)
    sm, svk, sproof, _ = shrink(rm, rvk, final_sp)
    wrapped = sproof.shard_proofs[0]
    assert len(wrapped.public_values) == 8  # the compact digest
    assert sm.verify(svk, sproof)




def test_exp_rev_bits_chip():
    """EXPREV: one narrow row per index bit (machine.py ExpRevBitsChip,
    reference recursion ExpReverseBitsLen). Differential vs the host power
    and a debug-constraints pass over the dedicated chip."""
    import numpy as np

    from ziren_tpu.core import field as F
    from ziren_tpu.recursion.dsl import Tracer, interpret
    from ziren_tpu.recursion.machine import prove_recursion

    rng = np.random.default_rng(6)
    t = Tracer(num_inputs=0, input_values=[])
    g = F.two_adic_generator(13)
    cases = []
    for n in (1, 2, 5, 13):
        bits_v = [int(b) for b in rng.integers(0, 2, n)]
        idx = sum(b << i for i, b in enumerate(bits_v))
        rev = int(F.reverse_bits_len(idx, n))
        want = pow(g, rev, F.P_INT)
        bits_h = [t.const(b) for b in bits_v]
        out = t.exp_rev_bits(g, bits_h, reverse=True)
        t.output(out)
        cases.append(want)
    prog = t.program()
    assert interpret(prog) == cases
    machine, pk, vk, proof, outputs = prove_recursion(prog, [])
    assert outputs == cases
    assert machine.verify(vk, proof)
    # tampering the claimed output must break verification
    import pytest

    from ziren_tpu.stark.verifier import VerificationError

    proof.shard_proofs[0].public_values[0] = (cases[0] + 1) % F.P_INT
    with pytest.raises(VerificationError):
        machine.verify(vk, proof)
