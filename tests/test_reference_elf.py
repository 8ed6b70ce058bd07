"""End-to-end proof of the reference repo's prebuilt guest ELF (a real
Rust-compiled zkVM guest): load, execute, prove, verify."""

import os

import pytest

from ziren_tpu.executor import Executor
from ziren_tpu.executor.program import load_elf
from ziren_tpu.machine.mips import mips_machine, verify_mips_proof

ELF = "/root/reference/crates/prover/elf/mipsel-zkm-zkvm-elf"


@pytest.mark.skipif(not os.path.exists(ELF), reason="reference ELF not present")
def test_reference_elf_executes():
    prog = load_elf(open(ELF, "rb").read())
    ex = Executor(prog, mode="simple")
    ex.run()
    assert ex.exited and ex.exit_code == 0
    assert any(v != 0 for v in ex.committed_values)


@pytest.mark.skipif(not os.path.exists(ELF), reason="reference ELF not present")
def test_reference_elf_prove_verify():
    prog = load_elf(open(ELF, "rb").read())
    machine = mips_machine()
    pk, vk = machine.setup(prog, extra_observations=[prog.pc_start])
    ex = Executor(prog)
    record = ex.run()
    proof = machine.prove(pk, [record])
    assert verify_mips_proof(machine, vk, proof, pc_start=prog.pc_start)
    # the guest's committed digest is bound into the shard public values
    pv = proof.shard_proofs[0].public_values
    words = [
        sum(int(pv[4 * i + j]) << (8 * j) for j in range(4)) for i in range(8)
    ]
    assert words == ex.committed_values
