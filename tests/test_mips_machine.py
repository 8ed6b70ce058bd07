import numpy as np
import pytest

from ziren_tpu.executor.asm import fibonacci_program, simple_program
from ziren_tpu.machine.debug import debug_constraints, debug_lookups
from ziren_tpu.machine.mips import execute, mips_machine, prove_program


def _setup(program, stdin=None):
    machine = mips_machine()
    pk, vk = machine.setup(program)
    ex, record = execute(program, stdin)
    return machine, pk, vk, ex, record


def test_fibonacci_lookups_balanced():
    machine, pk, vk, ex, record = _setup(fibonacci_program(5))
    imbalance, origin = debug_lookups(machine, pk, record)
    if imbalance:
        bad = list(imbalance.items())[:8]
        info = [(k, v, origin[k][:4]) for k, v in bad]
        raise AssertionError(f"{len(imbalance)} unbalanced lookups, first: {info}")


def test_fibonacci_constraints():
    machine, pk, vk, ex, record = _setup(fibonacci_program(5))
    assert debug_constraints(machine, pk, record)


def test_fibonacci_prove_verify():
    machine, pk, vk, ex, record = _setup(fibonacci_program(8))
    proof = machine.prove(pk, [record])
    assert machine.verify(vk, proof)
    # fib(8) committed in the public values digest
    digest_bytes = proof.shard_proofs[0].public_values[:32]
    word0 = sum(int(digest_bytes[i]) << (8 * i) for i in range(4))
    assert word0 == ex.committed_values[0]


def test_simple_program_prove_verify():
    machine, pk, vk, ex, record = _setup(simple_program())
    # simple_program has no halt; it just falls off the end
    proof = machine.prove(pk, [record])
    assert machine.verify(vk, proof)


def test_alu_torture_prove_verify():
    from ziren_tpu.executor.asm import alu_torture_program

    machine, pk, vk, ex, record = _setup(alu_torture_program())
    proof = machine.prove(pk, [record])
    assert machine.verify(vk, proof)


def test_alu_torture2_prove_verify():
    from ziren_tpu.executor.asm import alu_torture2_program

    machine, pk, vk, ex, record = _setup(alu_torture2_program())
    proof = machine.prove(pk, [record])
    assert machine.verify(vk, proof)


def test_memory_program_prove_verify():
    from ziren_tpu.executor.asm import memory_program

    machine, pk, vk, ex, record = _setup(memory_program())
    proof = machine.prove(pk, [record])
    assert machine.verify(vk, proof)


def test_poseidon2_precompile_prove_verify():
    import numpy as np

    from ziren_tpu.core import poseidon2 as hp2
    from ziren_tpu.executor.asm import poseidon2_program

    machine, pk, vk, ex, record = _setup(poseidon2_program())
    state = np.zeros(16, dtype=np.uint32)
    state[0] = 7
    state[15] = 7
    want = hp2.permute(state)
    assert ex.peek_register(20) == int(want[0])
    proof = machine.prove(pk, [record])
    assert machine.verify(vk, proof)


def test_sha_extend_precompile_prove_verify():
    from ziren_tpu.executor.asm import sha_extend_program

    machine, pk, vk, ex, record = _setup(sha_extend_program())
    ror = lambda x, r: ((x >> r) | (x << (32 - r))) & 0xFFFFFFFF
    w = [i * 0x1111 + 1 for i in range(16)] + [0] * 48
    for i in range(16, 64):
        s0 = ror(w[i - 15], 7) ^ ror(w[i - 15], 18) ^ (w[i - 15] >> 3)
        s1 = ror(w[i - 2], 17) ^ ror(w[i - 2], 19) ^ (w[i - 2] >> 10)
        w[i] = (w[i - 16] + s0 + w[i - 7] + s1) & 0xFFFFFFFF
    assert ex.peek_register(20) == w[63]
    proof = machine.prove(pk, [record])
    assert machine.verify(vk, proof)


def test_sha256_full_prove_verify():
    """SHA-256 of the empty message via the extend + compress precompiles."""
    import hashlib

    from ziren_tpu.executor.asm import sha256_program

    machine, pk, vk, ex, record = _setup(sha256_program())
    digest = b"".join(
        ex.peek_word(0x3000 + 4 * j).to_bytes(4, "big") for j in range(8)
    )
    assert digest == hashlib.sha256(b"").digest()
    proof = machine.prove(pk, [record])
    assert machine.verify(vk, proof)
