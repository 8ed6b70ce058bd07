"""VERIFY_ZKM_PROOF: deferred sub-proof claims recorded + provable."""

from ziren_tpu.executor import Executor
from ziren_tpu.executor.asm import Instruction, O, halt_sequence, imm, ri
from ziren_tpu.executor.program import Program
from ziren_tpu.machine.debug import debug_constraints, debug_lookups
from ziren_tpu.machine.mips import mips_machine, verify_mips_proof


def _program():
    insns = [imm(O.ADD, 8, 0, 0x2000)]
    for i in range(8):
        insns += [imm(O.ADD, 9, 0, i + 1), ri(O.SW, 9, 8, 4 * i)]
        insns += [imm(O.ADD, 9, 0, 100 + i), ri(O.SW, 9, 8, 0x100 + 4 * i)]
    insns += [
        imm(O.ADD, 2, 0, 0x1B),
        imm(O.ADD, 4, 0, 0x2000), imm(O.ADD, 5, 0, 0x2100),
        Instruction(O.SYSCALL, 2, 4, 5, False, False),
        *halt_sequence(0),
    ]
    return Program.new(insns)


def test_claim_recorded_and_proves():
    prog = _program()
    ex = Executor(prog)
    rec = ex.run()
    assert rec.deferred_proof_claims == [
        (tuple(range(1, 9)), tuple(range(100, 108)))
    ]
    machine = mips_machine()
    pk, vk = machine.setup(prog, extra_observations=[prog.pc_start])
    imbalance, origin = debug_lookups(machine, pk, rec)
    assert not imbalance, origin
    assert debug_constraints(machine, pk, rec)
    proof = machine.prove(pk, [rec])
    assert verify_mips_proof(machine, vk, proof, pc_start=prog.pc_start)


def test_subproof_verifier_called():
    prog = _program()
    ex = Executor(prog)
    calls = []
    ex.proof_stream = [("proof-blob", "vk-blob")]
    ex.subproof_verifier = lambda p, vk_, vkey, pvd: calls.append((p, vkey))
    ex.run()
    assert calls == [("proof-blob", tuple(range(1, 9)))]
