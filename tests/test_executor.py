import numpy as np
import pytest

from ziren_tpu.executor import Executor, Instruction, Opcode
from ziren_tpu.executor.asm import (
    fibonacci_program,
    halt_sequence,
    imm,
    memory_program,
    ri,
    rr,
    simple_program,
)
from ziren_tpu.executor.program import Program


def fib(n):
    a, b = 0, 1
    for _ in range(n):
        a, b = b, a + b
    return b  # program computes b after n iterations


def test_simple_program():
    ex = Executor(simple_program())
    ex.run()
    assert ex.peek_register(31) == 42
    assert ex.global_clk == 3


def test_fibonacci_program():
    for n in (1, 5, 10, 30):
        ex = Executor(fibonacci_program(n))
        ex.run()
        assert ex.peek_register(10) == fib(n), n
        assert ex.committed_values[0] == fib(n)
        assert ex.exited and ex.exit_code == 0


def test_memory_program():
    ex = Executor(memory_program())
    ex.run()
    assert ex.peek_register(20) == 0x12345678
    assert ex.peek_register(21) == 0x78
    assert ex.peek_register(22) == 0x78


def test_alu_ops():
    cases = [
        (Opcode.SUB, 7, 10, (7 - 10) & 0xFFFFFFFF),
        (Opcode.AND, 0b1100, 0b1010, 0b1000),
        (Opcode.OR, 0b1100, 0b1010, 0b1110),
        (Opcode.XOR, 0b1100, 0b1010, 0b0110),
        (Opcode.NOR, 0, 0, 0xFFFFFFFF),
        (Opcode.SLT, 0xFFFFFFFF, 1, 1),  # -1 < 1 signed
        (Opcode.SLTU, 0xFFFFFFFF, 1, 0),
        (Opcode.SLL, 1, 5, 32),
        (Opcode.SRL, 0x80000000, 31, 1),
        (Opcode.SRA, 0x80000000, 31, 0xFFFFFFFF),
        (Opcode.MUL, 7, 11, 77),
        (Opcode.CLZ, 0x00010000, 0, 15),
        (Opcode.CLO, 0xFFFF0000, 0, 16),
    ]
    for op, b, c, want in cases:
        prog = Program.new(
            [
                imm(Opcode.ADD, 8, 0, b),
                imm(Opcode.ADD, 9, 0, c),
                rr(op, 10, 8, 9),
                *halt_sequence(0),
            ]
        )
        ex = Executor(prog)
        ex.run()
        assert ex.peek_register(10) == want, (op.name, b, c)


def test_branch_delay_slot():
    # delay slot instruction executes even when branch taken
    prog = Program.new(
        [
            imm(Opcode.ADD, 8, 0, 1),  # pc 0
            ri(Opcode.BGTZ, 8, 0, 8),  # pc 4: target = 8 + next_pc(8) = 16
            imm(Opcode.ADD, 9, 0, 111),  # pc 8: delay slot, executes
            imm(Opcode.ADD, 10, 0, 222),  # pc 12: skipped
            *halt_sequence(0),  # pc 16
        ]
    )
    ex = Executor(prog)
    ex.run()
    assert ex.peek_register(9) == 111
    assert ex.peek_register(10) == 0


def test_jump_and_link():
    prog = Program.new(
        [
            Instruction(Opcode.Jumpi, 31, 16, 0, True, True),  # pc 0: jal 16
            imm(Opcode.ADD, 9, 0, 5),  # pc 4: delay slot
            imm(Opcode.ADD, 10, 0, 1),  # pc 8: skipped
            imm(Opcode.ADD, 10, 0, 2),  # pc 12: skipped
            *halt_sequence(0),  # pc 16
        ]
    )
    ex = Executor(prog)
    ex.run()
    assert ex.peek_register(31) == 8  # return address = next_pc + 4
    assert ex.peek_register(9) == 5
    assert ex.peek_register(10) == 0


def test_trace_events_columnar():
    ex = Executor(fibonacci_program(5))
    rec = ex.run()
    cols = rec.freeze()
    n = rec.num_cycles
    assert cols["clk"].shape == (n,)
    assert np.all(np.diff(cols["clk"]) >= 5)
    # memory init/final events exist and are balanced per address
    init_addrs = {a for a, _ in rec.mem_init}
    final_addrs = {a for a, _, _, _ in rec.mem_final}
    assert init_addrs == final_addrs
    # write accesses to op_a recorded
    assert cols["a_act"].sum() > 0


def test_hint_io():
    # guest reads a hint word: hint len -> alloc at 0x3000 -> hint read -> LW
    payload = (1234).to_bytes(4, "little")
    prog = Program.new(
        [
            imm(Opcode.ADD, 2, 0, 0xF0),  # SYSHINTLEN
            Instruction(Opcode.SYSCALL, 2, 4, 5, False, False),  # v0 = len
            imm(Opcode.ADD, 4, 0, 0x3000),  # a0 = ptr
            ri(Opcode.ADD, 5, 2, 0),  # a1 = len
            imm(Opcode.ADD, 2, 0, 0xF1),  # SYSHINTREAD
            Instruction(Opcode.SYSCALL, 2, 4, 5, False, False),
            imm(Opcode.ADD, 8, 0, 0x3000),
            ri(Opcode.LW, 20, 8, 0),
            *halt_sequence(0),
        ]
    )
    ex = Executor(prog, stdin=[payload])
    ex.run()
    assert ex.peek_register(20) == 1234


def test_trace_file_dump(tmp_path, monkeypatch):
    """ZIREN_TRACE_FILE / TRACE_FILE dumps one big-endian pc per
    constrained cycle (reference executor.rs:307-315, :2630)."""
    import struct

    from ziren_tpu.executor import Executor
    from ziren_tpu.executor.asm import fibonacci_program

    path = tmp_path / "trace.bin"
    monkeypatch.setenv("ZIREN_TRACE_FILE", str(path))
    ex = Executor(fibonacci_program(5))
    ex.run()
    data = path.read_bytes()
    pcs = [v[0] for v in struct.iter_unpack(">I", data)]
    assert len(pcs) == ex.global_clk
    assert pcs[0] == ex.program.pc_start
    # the fibonacci loop revisits its body pc
    assert len(set(pcs)) < len(pcs)
