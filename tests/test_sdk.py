"""SDK surface: execute / setup / prove / verify (reference zkm-sdk shape)."""

import pytest

from ziren_tpu.executor.asm import fibonacci_program
from ziren_tpu.sdk import ProverClient, ZirenStdin


def test_execute_report():
    client = ProverClient(config="dev")
    pv, report = client.execute(fibonacci_program(25))
    assert report.exit_code == 0
    assert report.total_instruction_count > 25
    assert pv.words[0] == 121393  # fib(25) committed at word 0


def test_prove_verify_roundtrip():
    client = ProverClient(config="dev")
    prog = fibonacci_program(30)
    pk, vk = client.setup(prog)
    proof = client.prove(pk)
    assert proof.public_values.words[0] == 1346269  # fib(30)
    assert client.verify(proof, vk)


def test_reference_elf_executes():
    client = ProverClient(config="dev")
    elf = open("/root/reference/crates/prover/elf/mipsel-zkm-zkvm-elf", "rb").read()
    stdin = ZirenStdin().write_u32s([10])
    pv, report = client.execute(elf, stdin)
    assert report.exit_code == 0


def test_groth16_prove_rejects_garbage():
    """groth16_prove is implemented (snark/wrap_circuit.py); malformed
    input fails fast rather than raising NotImplementedError."""
    client = ProverClient()
    with pytest.raises((TypeError, AttributeError, ValueError)):
        client.groth16_prove((None, None, None))


@pytest.mark.slow
def test_compressed_prove():
    client = ProverClient(config="dev")
    pk, vk = client.setup(fibonacci_program(20))
    rm, rvk, final_sp = client.compressed_prove(pk)
    from ziren_tpu.stark.proof import MachineProof
    assert rm.verify(rvk, MachineProof([final_sp]))


def test_cycle_tracker_and_histograms():
    from ziren_tpu.executor.asm import (Instruction, O, halt_sequence, imm, ri)
    from ziren_tpu.executor.program import Program

    # guest writes cycle-tracker markers around a small loop via WRITE fd=1
    def write_str(s, base):
        insns = [imm(O.ADD, 8, 0, base)]
        data = s.encode()
        for i in range(0, len(data), 4):
            w = int.from_bytes(data[i:i+4].ljust(4, b"\x00"), "little")
            insns += [imm(O.SLL, 9, w >> 16, 16), ri(O.OR, 9, 9, w & 0xFFFF),
                      ri(O.SW, 9, 8, i)]
        insns += [imm(O.ADD, 2, 0, 2), imm(O.ADD, 4, 0, 1),
                  imm(O.ADD, 5, 0, base), imm(O.ADD, 6, 0, len(data)),
                  Instruction(O.SYSCALL, 2, 4, 5, False, False)]
        return insns

    insns = write_str("cycle-tracker-start: loop", 0x2000)
    insns += [imm(O.ADD, 9, 0, 7), rr := Instruction(O.ADD, 10, 10, 9, False, False)]
    insns += [Instruction(O.ADD, 10, 10, 9, False, False) for _ in range(5)]
    insns += write_str("cycle-tracker-end: loop", 0x2100)
    insns += write_str("done", 0x2200)
    insns += halt_sequence(0)
    prog = Program.new(insns)
    client = ProverClient(config="dev")
    pv, report = client.execute(prog)
    assert report.cycle_tracker.get("loop", 0) > 5
    assert report.stdout == b"done"
    assert report.syscall_counts  # WRITE + HALT counted
    assert report.opcode_counts
