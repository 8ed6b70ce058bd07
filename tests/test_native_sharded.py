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


def test_estimate_targets_matches_fix_shape():
    """The cost model (Air.num_rows) reproduces fix_shape's per-chip
    targets exactly for CPU-family workloads."""
    from ziren_tpu.executor.asm import alu_torture2_program, fibonacci_program
    from ziren_tpu.machine.mips import execute_sharded, mips_machine
    from ziren_tpu.stark.shape import estimate_targets, fix_shape

    machine = mips_machine()
    for program in (fibonacci_program(3000), alu_torture2_program()):
        ex, records = execute_sharded(program, 1024)
        est = estimate_targets(machine, records)
        assert est is not None
        shape, _ = fix_shape(machine, records)
        want = {name: 1 << lh for name, lh in shape.heights}
        assert est == want, {
            k: (est.get(k), want.get(k))
            for k in set(est) | set(want)
            if est.get(k) != want.get(k)
        }


@pytest.mark.slow
def test_pipelined_device_prove_verifies(monkeypatch):
    """The cost-model-pipelined device prove path (trace gen in worker
    threads overlapped with dispatch) produces verifying proofs. Uses a
    1-chip engine machine: cold XLA:CPU compiles of the full MIPS kernel
    set cost tens of minutes (the MIPS pipeline path is exercised by
    bench.py on the real accelerator; the estimate/fix_shape equivalence
    above covers the MIPS cost model)."""
    monkeypatch.setenv("ZIREN_DEVICE", "1")
    import numpy as np

    from ziren_tpu.machine.layout import pad_to_pow2
    from ziren_tpu.stark.chip import Air
    from ziren_tpu.stark.config import dev_config
    from ziren_tpu.stark.machine import StarkMachine

    class Counter(Air):
        name = "Counter"
        width = 2

        def eval(self, b):
            v, is_real = b.main_local
            v_n, is_real_n = b.main_next
            b.assert_bool(is_real)
            b.when_first_row().assert_eq(v, is_real)
            b.when_transition().assert_zero(is_real_n * (v_n - v - 1))
            b.when_transition().assert_zero(is_real_n * (1 - is_real))

        def num_rows(self, record):
            return record.n

        def generate_trace(self, record, output):
            n = record.n
            tr = np.zeros((n, 2), dtype=np.uint32)
            tr[:, 0] = np.arange(1, n + 1)
            tr[:, 1] = 1
            return pad_to_pow2(tr)

    class Rec:
        def __init__(self, n):
            self.n = n
            self.public_values = []

    machine = StarkMachine(dev_config(), [Counter()])
    pk, vk = machine.setup()
    records = [Rec(8), Rec(20), Rec(32), Rec(17)]
    proof = machine.prove(pk, records, fix_shapes=True)
    assert len(proof.shard_proofs) == 4
    assert machine.verify(vk, proof)
    # every shard landed on the batch-wide 32-row shape via the cost model
    assert all(
        v.log_degree == 5
        for sp in proof.shard_proofs
        for v in sp.opened_values
    )
