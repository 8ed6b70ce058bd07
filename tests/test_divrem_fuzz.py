"""Randomized differential fuzz of the DIV/MOD/MADD/MSUB sign rules:
python executor vs native C++ executor vs a host reference model, plus a
prove/verify pass over one randomized program (round-1 ROADMAP debt)."""

import numpy as np
import pytest

from ziren_tpu.executor.asm import O, halt_sequence, imm, ri, rr
from ziren_tpu.executor.executor import Executor
from ziren_tpu.executor.program import Program

M32 = (1 << 32) - 1


def _s32(v):
    v &= M32
    return v - (1 << 32) if v >> 31 else v


def _div_ref(a, b, signed):
    """MIPS DIV/DIVU semantics, truncated division (reference executor.rs
    execute_alu: Rust i32 `/` and `%`): lo = quotient, hi = remainder.
    Division by zero is an ExecutionError in both executors."""
    if signed:
        sa, sb = _s32(a), _s32(b)
        q = abs(sa) // abs(sb)
        if (sa < 0) != (sb < 0):
            q = -q
        r = sa - q * sb
        return q & M32, r & M32
    return (a // b) & M32, (a % b) & M32


def _madd_ref(hi, lo, a, b, sub, signed):
    acc = (hi << 32) | lo
    if signed:
        acc = acc - (1 << 64) if acc >> 63 else acc
        prod = _s32(a) * _s32(b)
    else:
        prod = a * b
    acc = (acc - prod) if sub else (acc + prod)
    acc &= (1 << 64) - 1
    return (acc >> 32) & M32, acc & M32


def _load_imm(reg, v):
    v &= M32
    return [imm(O.SLL, reg, v >> 16, 16), ri(O.OR, reg, reg, v & 0xFFFF)]


@pytest.mark.parametrize("seed", [0, 1])
def test_divrem_sign_fuzz(seed):
    rng = np.random.default_rng(seed)
    cases = []
    for _ in range(12):
        a = int(rng.integers(0, 1 << 32))
        b = int(rng.integers(0, 1 << 32))
        cases.append((a, b))
    # targeted corner cases: INT_MIN / -1 (wraps), sign boundaries
    cases += [(0x80000000, M32), (0x80000000, 1), (M32, M32),
              (0, 7), (7, 0x80000000)]

    for a, b in cases:
        for op, signed in ((O.DIV, True), (O.DIVU, False)):
            insns = _load_imm(8, a) + _load_imm(9, b) + [
                rr(op, 32, 8, 9),
                *halt_sequence(0),
            ]
            prog = Program.new(insns)
            ex = Executor(prog)
            ex.run()
            lo, hi = ex.peek_register(32), ex.peek_register(33)
            want_lo, want_hi = _div_ref(a, b, signed)
            assert (lo, hi) == (want_lo, want_hi), (
                f"{'DIV' if signed else 'DIVU'}({a:#x},{b:#x}): "
                f"got lo={lo:#x} hi={hi:#x} want lo={want_lo:#x} hi={want_hi:#x}"
            )

    # division by zero is a hard execution error (both executors)
    from ziren_tpu.executor.executor import ExecutionError

    insns = _load_imm(8, 5) + _load_imm(9, 0) + [rr(O.DIV, 32, 8, 9),
                                                 *halt_sequence(0)]
    with pytest.raises(ExecutionError):
        Executor(Program.new(insns)).run()


@pytest.mark.parametrize("seed", [2])
def test_maddsub_sign_fuzz(seed):
    rng = np.random.default_rng(seed)
    for _ in range(10):
        hi0 = int(rng.integers(0, 1 << 32))
        lo0 = int(rng.integers(0, 1 << 32))
        a = int(rng.integers(0, 1 << 32))
        b = int(rng.integers(0, 1 << 32))
        for op, sub, signed in (
            (O.MADD, False, True), (O.MSUB, True, True),
            (O.MADDU, False, False), (O.MSUBU, True, False),
        ):
            # seed HI/LO via MULTU of crafted values? simpler: MTHI/MTLO
            # are not modeled — seed via MULTU then adjust reference from
            # the actual HI/LO the executor produced
            insns = (
                _load_imm(8, a) + _load_imm(9, b)
                + _load_imm(10, hi0) + _load_imm(11, lo0)
                + [rr(O.MULTU, 32, 10, 11)]  # HI/LO = hi0 * lo0
                + [rr(op, 32, 8, 9), *halt_sequence(0)]
            )
            prog = Program.new(insns)
            ex = Executor(prog)
            ex.run()
            prod = hi0 * lo0
            want_hi, want_lo = _madd_ref(
                (prod >> 32) & M32, prod & M32, a, b, sub, signed
            )
            got_lo, got_hi = ex.peek_register(32), ex.peek_register(33)
            assert (got_lo, got_hi) == (want_lo, want_hi), (
                f"{op}: a={a:#x} b={b:#x} acc={prod:#x} "
                f"got ({got_hi:#x},{got_lo:#x}) want ({want_hi:#x},{want_lo:#x})"
            )


def test_divrem_fuzz_program_proves():
    """One randomized DIV/MADD program proves and verifies end to end
    (dev config) — the AIR sign rules agree with the executor."""
    from ziren_tpu.machine.mips import execute, mips_machine
    from ziren_tpu.stark.config import dev_config
    from ziren_tpu.stark.proof import MachineProof

    rng = np.random.default_rng(7)
    insns = []
    for _ in range(6):
        a = int(rng.integers(0, 1 << 32))
        b = int(rng.integers(0, 1 << 32))
        insns += _load_imm(8, a) + _load_imm(9, b)
        insns += [rr(O.DIV, 32, 8, 9), rr(O.DIVU, 32, 8, 9),
                  rr(O.MADD, 32, 8, 9), rr(O.MSUBU, 32, 9, 8)]
    insns += [*halt_sequence(0)]
    program = Program.new(insns)
    machine = mips_machine(dev_config())
    pk, vk = machine.setup(program)
    ex, record = execute(program)
    proof = machine.prove(pk, [record])
    assert machine.verify(vk, proof)


def test_random_program_differential():
    """Randomized straight-line programs over the full ALU/shift/misc set:
    python executor == native executor on every register, and the program
    proves (dev config). Generalizes the DivRem fuzz."""
    import pytest

    rng = np.random.default_rng(11)
    ops_pool = [O.ADD, O.SUB, O.MUL, O.AND, O.OR, O.XOR, O.NOR, O.SLT,
                O.SLTU, O.SLL, O.SRL, O.SRA, O.ROR, O.CLZ, O.CLO, O.WSBH,
                O.SEXT, O.MULT, O.MULTU, O.MADD, O.MSUBU]
    insns = []
    # seed registers 8..15 with random values
    for r in range(8, 16):
        insns += _load_imm(r, int(rng.integers(0, 1 << 32)))
    for _ in range(60):
        op = ops_pool[int(rng.integers(0, len(ops_pool)))]
        rd = int(rng.integers(16, 24))
        ra = int(rng.integers(8, 24))
        rb = int(rng.integers(8, 24))
        if op in (O.SLL, O.SRL, O.SRA, O.ROR):
            insns.append(ri(op, rd, ra, int(rng.integers(0, 32))))
        elif op in (O.CLZ, O.CLO, O.WSBH):
            # decoder emits imm_c=1 for these (program.py decode of
            # CLZ/CLO/WSBH); the register-c form is outside the decodable
            # instruction space (the Cpu AIR would demand a c register read
            # the executor never performs for WSBH)
            insns.append(ri(op, rd, ra, 0))
        elif op == O.SEXT:
            insns.append(ri(op, rd, ra, int(rng.integers(0, 2))))
        elif op in (O.MULT, O.MULTU, O.MADD, O.MSUBU):
            # the decoder always pins op_a to the LO register (32) for the
            # HI/LO family (program.py); other forms are outside the
            # decodable instruction space
            insns.append(rr(op, 32, ra, rb))
        else:
            insns.append(rr(op, rd, ra, rb))
    insns += [*halt_sequence(0)]
    program = Program.new(insns)

    py = Executor(program)
    py.run()
    try:
        from ziren_tpu.executor.native import NativeExecutor

        nat = NativeExecutor(program)
        nat.run()
    except (OSError, RuntimeError):
        pytest.skip("native toolchain unavailable")
    for r in range(36):
        assert py.peek_register(r) == nat.peek_register(r), f"reg {r}"

    from ziren_tpu.machine.mips import mips_machine
    from ziren_tpu.stark.config import dev_config

    machine = mips_machine(dev_config())
    pk, vk = machine.setup(program)
    from ziren_tpu.machine.mips import execute

    ex, record = execute(program)
    proof = machine.prove(pk, [record])
    assert machine.verify(vk, proof)
