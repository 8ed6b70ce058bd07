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


def test_unimplemented_actions_raise():
    client = ProverClient()
    with pytest.raises(NotImplementedError):
        client.compressed_prove(None, None)
