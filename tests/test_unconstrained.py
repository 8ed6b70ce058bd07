"""ENTER/EXIT_UNCONSTRAINED: hint-computing blocks run untraced, revert all
state except the hint stream, and the ENTER replays returning 0."""

from ziren_tpu.executor import Executor
from ziren_tpu.executor.asm import Instruction, O, halt_sequence, imm, ri
from ziren_tpu.executor.program import Program
from ziren_tpu.machine.debug import debug_constraints, debug_lookups
from ziren_tpu.machine.mips import mips_machine, verify_mips_proof


def _program():
    insns = [imm(O.ADD, 2, 0, 3), Instruction(O.SYSCALL, 2, 4, 5, False, False)]
    beq_idx = len(insns)
    insns += [None, None]
    block = [
        imm(O.ADD, 9, 0, 42),
        imm(O.ADD, 8, 0, 0x2000),
        ri(O.SW, 9, 8, 0),
        imm(O.ADD, 2, 0, 2),  # WRITE to the hint fd
        imm(O.ADD, 4, 0, 4),
        imm(O.ADD, 5, 0, 0x2000),
        imm(O.ADD, 6, 0, 4),
        Instruction(O.SYSCALL, 2, 4, 5, False, False),
        imm(O.ADD, 2, 0, 4),  # EXIT_UNCONSTRAINED
        Instruction(O.SYSCALL, 2, 4, 5, False, False),
    ]
    after = [
        imm(O.ADD, 2, 0, 0xF0),  # HINT_LEN
        Instruction(O.SYSCALL, 2, 4, 5, False, False),
        ri(O.ADD, 21, 2, 0),
        imm(O.ADD, 2, 0, 0xF1),  # HINT_READ
        imm(O.ADD, 4, 0, 0x5000),
        imm(O.ADD, 5, 0, 4),
        Instruction(O.SYSCALL, 2, 4, 5, False, False),
        imm(O.ADD, 8, 0, 0x5000),
        ri(O.LW, 20, 8, 0),
        *halt_sequence(0),
    ]
    target_pc = (2 + 2 + len(block)) * 4
    insns[beq_idx] = Instruction(O.BEQ, 2, 0, (target_pc - 12) & 0xFFFFFFFF,
                                 False, True)
    insns[beq_idx + 1] = imm(O.ADD, 0, 0, 0)
    return Program.new(insns[: beq_idx + 2] + block + after)


def test_hint_roundtrip_and_revert():
    prog = _program()
    ex = Executor(prog)
    rec = ex.run()
    assert ex.peek_register(20) == 42  # hint computed in-block, read back
    assert ex.peek_register(21) == 4
    assert ex.peek_word(0x2000) == 0  # block scratch writes reverted
    # the block leaves no trace: only the replayed ENTER (returning 0) shows
    sids = [int(s) for s in rec.freeze()["syscall_code"] if s]
    assert 4 not in sids  # EXIT never appears
    assert sids.count(3) == 1


def test_proves_end_to_end():
    prog = _program()
    machine = mips_machine()
    pk, vk = machine.setup(prog, extra_observations=[prog.pc_start])
    rec = Executor(prog).run()
    imbalance, origin = debug_lookups(machine, pk, rec)
    assert not imbalance, origin
    assert debug_constraints(machine, pk, rec)
    proof = machine.prove(pk, [rec])
    assert verify_mips_proof(machine, vk, proof, pc_start=prog.pc_start)
