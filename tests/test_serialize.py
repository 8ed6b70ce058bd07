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


def test_verifier_artifact_roundtrip():
    """Portable artifact: pack vk -> bytes, verify a serialized proof with
    nothing but the two byte strings (reference verifier/src/lib.rs
    embedded-vk flow)."""
    import numpy as np
    import pytest

    from ziren_tpu.executor.asm import fibonacci_program
    from ziren_tpu.machine.mips import prove_program
    from ziren_tpu.stark.config import dev_config
    from ziren_tpu.stark.serialize import serialize_machine_proof
    from ziren_tpu.stark.verifier import VerificationError
    from ziren_tpu.verifier.artifacts import (
        pack_vk,
        unpack_vk,
        verify_core_artifact,
    )

    program = fibonacci_program(40)
    machine, pk, vk, proof, ex = prove_program(program, config=dev_config())
    art = pack_vk(machine, vk, pc_start=program.pc_start,
                  registry_root=np.arange(8, dtype=np.uint32))
    m2, vk2, pc2, root = unpack_vk(art)
    assert pc2 == program.pc_start
    assert np.array_equal(vk2.commit, vk.commit)
    assert len(vk2.chip_information) == len(vk.chip_information)
    assert list(root) == list(range(8))
    blob = serialize_machine_proof(proof)
    assert verify_core_artifact(art, blob)
    # tamper: flip a proof byte -> reject
    bad = bytearray(blob)
    bad[len(bad) // 2] ^= 1
    with pytest.raises((VerificationError, AssertionError, Exception)):
        assert not verify_core_artifact(art, bytes(bad))
