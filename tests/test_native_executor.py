"""Differential tests: native (C++) executor vs the Python semantic oracle."""

import numpy as np
import pytest

from ziren_tpu.executor import Executor
from ziren_tpu.executor.asm import (
    alu_torture2_program,
    alu_torture_program,
    fibonacci_program,
    memory_program,
    simple_program,
)
from ziren_tpu.executor.native import NativeExecutor

PROGRAMS = [
    ("simple", simple_program, None),
    ("fib", lambda: fibonacci_program(20), None),
    ("memory", memory_program, None),
    ("torture1", alu_torture_program, None),
    ("torture2", alu_torture2_program, None),
]


@pytest.mark.parametrize("name,make,stdin", PROGRAMS, ids=[p[0] for p in PROGRAMS])
def test_native_matches_python(name, make, stdin):
    py = Executor(make(), stdin=stdin)
    py_rec = py.run()
    nat = NativeExecutor(make(), stdin=stdin)
    nat_rec = nat.run()

    pf, nf = py_rec.freeze(), nat_rec.freeze()
    assert set(pf) == set(nf)
    for k in pf:
        assert np.array_equal(pf[k], nf[k]), f"column {k} differs"
    assert py_rec.mem_init == nat_rec.mem_init
    assert py_rec.mem_final == nat_rec.mem_final
    assert py.global_clk == nat.global_clk
    assert py.exit_code == nat.exit_code
    for r in range(36):
        assert py.peek_register(r) == nat.peek_register(r), r
    assert py_rec.public_values.to_list() == nat_rec.public_values.to_list()


def test_native_hint_io():
    from ziren_tpu.executor.asm import halt_sequence, imm, ri
    from ziren_tpu.executor.instruction import Instruction
    from ziren_tpu.executor.opcode import Opcode
    from ziren_tpu.executor.program import Program

    payload = (98765).to_bytes(4, "little")
    prog = [
        imm(Opcode.ADD, 2, 0, 0xF0),
        Instruction(Opcode.SYSCALL, 2, 4, 5, False, False),
        imm(Opcode.ADD, 4, 0, 0x3000),
        ri(Opcode.ADD, 5, 2, 0),
        imm(Opcode.ADD, 2, 0, 0xF1),
        Instruction(Opcode.SYSCALL, 2, 4, 5, False, False),
        imm(Opcode.ADD, 8, 0, 0x3000),
        ri(Opcode.LW, 20, 8, 0),
        *halt_sequence(0),
    ]
    nat = NativeExecutor(Program.new(prog), stdin=[payload])
    nat.run()
    assert nat.peek_register(20) == 98765


def test_native_prove_verify():
    """The native record feeds the prover identically."""
    from ziren_tpu.machine.mips import mips_machine

    program = fibonacci_program(8)
    machine = mips_machine()
    pk, vk = machine.setup(program)
    nat = NativeExecutor(program)
    record = nat.run()
    proof = machine.prove(pk, [record])
    assert machine.verify(vk, proof)


def test_native_speed():
    program = fibonacci_program(50000)
    import time

    nat = NativeExecutor(program, mode="simple")
    t0 = time.perf_counter()
    nat.run()
    dt = time.perf_counter() - t0
    assert nat.global_clk > 250_000
    mhz = nat.global_clk / dt / 1e6
    print(f"native simple-mode: {mhz:.1f} MHz")
    assert mhz > 1.0  # conservative floor


def test_native_poseidon2_matches_python():
    from ziren_tpu.executor.asm import poseidon2_program

    py = Executor(poseidon2_program())
    py_rec = py.run()
    nat = NativeExecutor(poseidon2_program())
    nat_rec = nat.run()
    pf, nf = py_rec.freeze(), nat_rec.freeze()
    for k in pf:
        assert np.array_equal(pf[k], nf[k]), k
    assert py_rec.precompile_events == nat_rec.precompile_events
    assert py_rec.mem_init == nat_rec.mem_init
    assert py_rec.mem_final == nat_rec.mem_final


def test_native_sha_extend_matches_python():
    from ziren_tpu.executor.asm import sha_extend_program

    py = Executor(sha_extend_program())
    py_rec = py.run()
    nat = NativeExecutor(sha_extend_program())
    nat_rec = nat.run()
    pf, nf = py_rec.freeze(), nat_rec.freeze()
    for k in pf:
        assert np.array_equal(pf[k], nf[k]), k
    assert py_rec.precompile_events == nat_rec.precompile_events
    assert py_rec.mem_final == nat_rec.mem_final


def test_native_sha256_matches_python():
    from ziren_tpu.executor.asm import sha256_program

    py = Executor(sha256_program())
    py_rec = py.run()
    nat = NativeExecutor(sha256_program())
    nat_rec = nat.run()
    pf, nf = py_rec.freeze(), nat_rec.freeze()
    for k in pf:
        assert np.array_equal(pf[k], nf[k]), k
    assert py_rec.precompile_events == nat_rec.precompile_events
    assert py_rec.mem_final == nat_rec.mem_final
