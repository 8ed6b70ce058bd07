from ziren_tpu.executor.asm import fibonacci_program
from ziren_tpu.machine.mips import mips_machine, prove_program, verify_mips_proof
from ziren_tpu.stark.serialize import (
    deserialize_machine_proof,
    serialize_machine_proof,
)


def test_proof_roundtrip_and_verify():
    program = fibonacci_program(8)
    machine, pk, vk, proof, ex = prove_program(program)
    data = serialize_machine_proof(proof)
    print(f"proof size: {len(data)} bytes")
    proof2 = deserialize_machine_proof(data)
    assert verify_mips_proof(machine, vk, proof2, pc_start=program.pc_start)
    # round-trip stability
    assert serialize_machine_proof(proof2) == data
