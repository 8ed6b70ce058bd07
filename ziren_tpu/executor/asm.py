"""Tiny raw-instruction program builders for tests and benchmarks
(the reference builds per-chip test programs the same way:
crates/core/executor/src/programs.rs simple_program)."""

from __future__ import annotations

from .instruction import Instruction
from .opcode import Opcode
from .program import Program

O = Opcode


def imm(op, a, b, c):
    return Instruction(op, a, b & 0xFFFFFFFF, c & 0xFFFFFFFF, True, True)


def ri(op, a, b, c):
    """register b, immediate c"""
    return Instruction(op, a, b, c & 0xFFFFFFFF, False, True)


def rr(op, a, b, c):
    return Instruction(op, a, b, c, False, False)


NOP = Instruction(O.ADD, 0, 0, 0, True, True)


def halt_sequence(code=0):
    """v0 = HALT(0); a0 = exit code; syscall."""
    return [
        imm(O.ADD, 2, 0, 0),  # v0 = 0 (HALT)
        imm(O.ADD, 4, 0, code),  # a0 = code
        Instruction(O.SYSCALL, 2, 4, 5, False, False),
    ]


def simple_program() -> Program:
    """reference programs.rs:15 — r31 = 5 + 37."""
    return Program.new(
        [
            imm(O.ADD, 29, 0, 5),
            imm(O.ADD, 30, 0, 37),
            rr(O.ADD, 31, 30, 29),
        ]
    )


def fibonacci_program(n: int) -> Program:
    """Iterative fibonacci in registers; result in r10; commits r10.

    Exercises ALU, branch with delay slot, SYSCALL(COMMIT/HALT).
    """
    insns = [
        imm(O.ADD, 8, 0, n),  # t0 = n
        imm(O.ADD, 9, 0, 0),  # t1 = a = 0
        imm(O.ADD, 10, 0, 1),  # t2 = b = 1
        # loop: (pc = 12)
        rr(O.ADD, 11, 9, 10),  # t3 = a + b
        ri(O.ADD, 9, 10, 0),  # a = b
        ri(O.ADD, 10, 11, 0),  # b = t3
        ri(O.SUB, 8, 8, 1),  # n -= 1
        ri(O.BGTZ, 8, 0, (12 - (16 + 4)) & 0xFFFFFFFF),  # loop if n > 0
        NOP,  # delay slot
        # commit word 0 = b: v0=COMMIT(0x10), a0=0, a1=b
        imm(O.ADD, 2, 0, 0x10),
        imm(O.ADD, 4, 0, 0),
        ri(O.ADD, 5, 10, 0),
        Instruction(O.SYSCALL, 2, 4, 5, False, False),
        *halt_sequence(0),
    ]
    # fix branch: BGTZ at index 7 -> pc = 28, next_pc = 32, target = 12
    insns[7] = ri(O.BGTZ, 8, 0, (12 - 32) & 0xFFFFFFFF)
    return Program.new(insns)


def memory_program() -> Program:
    """Store/load word + bytes at 0x2000; result r20 = 0x12345678, r21 = 0x78."""
    return Program.new(
        [
            imm(O.ADD, 8, 0, 0x2000),  # t0 = base
            imm(O.SLL, 9, 0x1234, 16),  # t1 = 0x12340000
            imm(O.ADD, 10, 0, 0x5678),
            rr(O.OR, 9, 9, 10),  # t1 = 0x12345678
            ri(O.SW, 9, 8, 0),  # [base] = t1
            ri(O.LW, 20, 8, 0),  # r20 = [base]
            ri(O.LBU, 21, 8, 0),  # r21 = low byte
            ri(O.SB, 10, 8, 4),  # [base+4].b0 = 0x78
            ri(O.LW, 22, 8, 4),  # r22 = 0x78
            *halt_sequence(0),
        ]
    )
