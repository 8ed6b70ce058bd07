"""U256XU2048_MUL precompile: executor + chip oracles + e2e proof."""

from ziren_tpu.executor import Executor
from ziren_tpu.executor.asm import u256x2048_program
from ziren_tpu.machine.debug import debug_constraints, debug_lookups
from ziren_tpu.machine.mips import mips_machine, prove_program, verify_mips_proof

A = 3**160
B = 7**700 % (1 << 2048)


def test_executor_and_oracles():
    prog = u256x2048_program(A, B)
    ex = Executor(prog)
    record = ex.run()
    prod = A * B
    assert ex.peek_register(20) == prod & 0xFFFFFFFF
    assert ex.peek_register(21) == (prod >> 2048) & 0xFFFFFFFF
    machine = mips_machine()
    pk, vk = machine.setup(prog, extra_observations=[prog.pc_start])
    imbalance, origin = debug_lookups(machine, pk, record)
    assert not imbalance, origin
    assert debug_constraints(machine, pk, record)


def test_prove_verify():
    prog = u256x2048_program(A, B)
    machine, pk, vk, proof, ex = prove_program(prog)
    assert "U256xU2048Mul" in proof.shard_proofs[0].chip_names
    assert verify_mips_proof(machine, vk, proof, pc_start=prog.pc_start)
