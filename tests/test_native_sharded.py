"""Native (C++) sharded execution == python run_sharded, bit for bit, and
the resulting records prove through the full machine."""

import numpy as np
import pytest

from ziren_tpu.executor.asm import alu_torture_program, fibonacci_program
from ziren_tpu.executor.executor import Executor


def _native(program, shard_size):
    from ziren_tpu.executor.native import NativeExecutor

    ex = NativeExecutor(program)
    return ex, ex.run_sharded(shard_size)


@pytest.mark.parametrize("n,shard_size", [(600, 2048), (2000, 1024)])
def test_native_sharded_matches_python(n, shard_size):
    program = fibonacci_program(n)
    py = Executor(program, shard_size=shard_size)
    py_records = py.run_sharded()
    try:
        ex, nat_records = _native(program, shard_size)
    except (OSError, RuntimeError):
        pytest.skip("native toolchain unavailable")

    assert len(nat_records) == len(py_records)
    assert ex.global_clk == py.global_clk
    for pr, nr in zip(py_records, nat_records):
        pf, nf = pr.freeze(), nr.freeze()
        assert set(pf.keys()) == set(nf.keys())
        for k in pf:
            assert np.array_equal(pf[k], nf[k]), f"column {k} differs"
        assert pr.shard_initial == nr.shard_initial
        assert pr.shard_final == nr.shard_final
        assert sorted(pr.mem_init) == sorted(nr.mem_init)
        assert sorted(pr.mem_final) == sorted(nr.mem_final)
        ppv, npv = pr.public_values, nr.public_values
        assert (ppv.start_pc, ppv.next_pc, ppv.shard, ppv.exit_code) == (
            npv.start_pc, npv.next_pc, npv.shard, npv.exit_code
        )
        assert ppv.committed_value_digest == npv.committed_value_digest


def test_native_sharded_records_prove():
    from ziren_tpu.machine.mips import mips_machine, verify_mips_proof
    from ziren_tpu.stark.config import dev_config

    program = fibonacci_program(600)
    try:
        ex, records = _native(program, 1024)
    except (OSError, RuntimeError):
        pytest.skip("native toolchain unavailable")
    machine = mips_machine(dev_config())
    pk, vk = machine.setup(program)
    proof = machine.prove(pk, records, fix_shapes=True)
    assert verify_mips_proof(machine, vk, proof, pc_start=program.pc_start)
