"""secp256k1 add/double precompiles: executor semantics + chip oracles + e2e."""

import pytest

from ziren_tpu.executor import Executor
from ziren_tpu.executor.asm import secp256k1_program
from ziren_tpu.machine.debug import debug_constraints, debug_lookups
from ziren_tpu.machine.mips import mips_machine, prove_program, verify_mips_proof

G3X = 0xF9308A019258C31049344F85F89D5229B531C845836F99B08601F113BCE036F9
G2X = 0xC6047F9441ED7D6D3045406E95C07CD85C778E4B8CEF3CA7ABAC09B95C709EE5


@pytest.mark.parametrize("op,expect", [("add", G3X), ("double", G2X)])
def test_executor(op, expect):
    prog = secp256k1_program(op)
    ex = Executor(prog)
    ex.run()
    assert ex.peek_register(20) == expect & 0xFFFFFFFF


@pytest.mark.parametrize("op", ["add", "double"])
def test_chip_oracles(op):
    prog = secp256k1_program(op)
    machine = mips_machine()
    pk, vk = machine.setup(prog, extra_observations=[prog.pc_start])
    record = Executor(prog).run()
    imbalance, origin = debug_lookups(machine, pk, record)
    assert not imbalance, origin
    assert debug_constraints(machine, pk, record)


def test_prove_verify():
    prog = secp256k1_program("add")
    machine, pk, vk, proof, ex = prove_program(prog)
    assert "Secp256k1Add" in proof.shard_proofs[0].chip_names
    assert verify_mips_proof(machine, vk, proof, pc_start=prog.pc_start)
