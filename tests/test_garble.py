"""BOOLEAN_CIRCUIT_GARBLE executor semantics (AIR chip: ROADMAP)."""

from ziren_tpu.executor import Executor
from ziren_tpu.executor.asm import Instruction, O, halt_sequence, imm, ri
from ziren_tpu.executor.program import Program


def _store(insns, addr, value):
    insns += [imm(O.SLL, 9, value >> 16, 16), ri(O.OR, 9, 9, value & 0xFFFF),
              imm(O.ADD, 8, 0, addr & 0xFFFF), imm(O.SLL, 10, addr >> 16, 16),
              rr_add(8, 8, 10), ri(O.SW, 9, 8, 0)]
    return insns


def rr_add(a, b, c):
    return Instruction(O.ADD, a, b, c, False, False)


def test_garble_gate_check():
    delta = [0xAAAA0001, 0xBBBB0002, 0xCCCC0003, 0xDDDD0004]
    h0 = [11, 22, 33, 44]
    h1 = [55, 66, 77, 88]
    lb = [99, 111, 122, 133]
    and_ct = [h0[i] ^ h1[i] ^ lb[i] for i in range(4)]
    or_ct = [and_ct[i] ^ delta[i] for i in range(4)]
    words = [2] + delta  # num_gates + delta
    words += [0] + h0 + h1 + lb + and_ct  # AND gate, matching ct
    words += [1] + h0 + h1 + lb + or_ct   # OR gate, matching ct
    insns = [imm(O.ADD, 8, 0, 0x2000)]
    for i, w in enumerate(words):
        insns += [imm(O.SLL, 9, w >> 16, 16), ri(O.OR, 9, 9, w & 0xFFFF),
                  ri(O.SW, 9, 8, 4 * i)]
    insns += [
        imm(O.SLL, 2, 0x0001, 16), ri(O.OR, 2, 2, 0x31),
        imm(O.ADD, 4, 0, 0x2000), imm(O.ADD, 5, 0, 0x4000),
        Instruction(O.SYSCALL, 2, 4, 5, False, False),
        imm(O.ADD, 10, 0, 0x4000), ri(O.LW, 20, 10, 0),
        *halt_sequence(0),
    ]
    prog = Program.new(insns)
    ex = Executor(prog)
    rec = ex.run()
    assert ex.peek_register(20) == 1  # both gates check out
    ev = rec.precompile_events[0x00010031][0]
    assert ev["output"] == 1 and len(ev["reads"]) == 5 + 34

    # flip one expected ciphertext word -> result 0
    words_bad = list(words)
    words_bad[5 + 13] ^= 1
    insns2 = [imm(O.ADD, 8, 0, 0x2000)]
    for i, w in enumerate(words_bad):
        insns2 += [imm(O.SLL, 9, w >> 16, 16), ri(O.OR, 9, 9, w & 0xFFFF),
                   ri(O.SW, 9, 8, 4 * i)]
    insns2 += [
        imm(O.SLL, 2, 0x0001, 16), ri(O.OR, 2, 2, 0x31),
        imm(O.ADD, 4, 0, 0x2000), imm(O.ADD, 5, 0, 0x4000),
        Instruction(O.SYSCALL, 2, 4, 5, False, False),
        imm(O.ADD, 10, 0, 0x4000), ri(O.LW, 20, 10, 0),
        *halt_sequence(0),
    ]
    ex2 = Executor(Program.new(insns2))
    ex2.run()
    assert ex2.peek_register(20) == 0


def _garble_program(gate_specs, delta):
    """gate_specs: list of (gtype, h0, h1, lb, expected_ct)."""
    words = [len(gate_specs)] + delta
    for gtype, h0, h1, lb, ct in gate_specs:
        words += [gtype] + h0 + h1 + lb + ct
    insns = [imm(O.ADD, 8, 0, 0x2000)]
    for i, w in enumerate(words):
        insns += [imm(O.SLL, 9, w >> 16, 16), ri(O.OR, 9, 9, w & 0xFFFF),
                  ri(O.SW, 9, 8, 4 * i)]
    insns += [
        imm(O.SLL, 2, 0x0001, 16), ri(O.OR, 2, 2, 0x31),
        imm(O.ADD, 4, 0, 0x2000), imm(O.ADD, 5, 0, 0x4000),
        Instruction(O.SYSCALL, 2, 4, 5, False, False),
        imm(O.ADD, 10, 0, 0x4000), ri(O.LW, 20, 10, 0),
        *halt_sequence(0),
    ]
    return Program.new(insns)


def test_chip_proves_end_to_end():
    from ziren_tpu.machine.debug import debug_constraints, debug_lookups
    from ziren_tpu.machine.mips import (mips_machine, prove_program,
                                        verify_mips_proof)

    delta = [0xAAAA0001, 0xBBBB0002, 0xCCCC0003, 0xDDDD0004]
    h0, h1, lb = [11, 22, 33, 44], [55, 66, 77, 88], [99, 111, 122, 133]
    and_ct = [h0[i] ^ h1[i] ^ lb[i] for i in range(4)]
    or_ct = [and_ct[i] ^ delta[i] for i in range(4)]
    bad_ct = list(and_ct)
    bad_ct[2] ^= 0x40
    prog = _garble_program(
        [(0, h0, h1, lb, and_ct), (1, h0, h1, lb, or_ct),
         (0, h0, h1, lb, bad_ct)], delta)
    ex = Executor(prog)
    rec = ex.run()
    assert ex.peek_register(20) == 0  # the third gate mismatches
    machine = mips_machine()
    pk, vk = machine.setup(prog, extra_observations=[prog.pc_start])
    imbalance, origin = debug_lookups(machine, pk, rec)
    assert not imbalance, origin
    assert debug_constraints(machine, pk, rec)
    proof = machine.prove(pk, [rec])
    assert "BooleanCircuitGarble" in proof.shard_proofs[0].chip_names
    assert verify_mips_proof(machine, vk, proof, pc_start=prog.pc_start)
