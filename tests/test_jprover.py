"""Device (JAX) shard prover == host prover, bit for bit.

Runs on the CPU backend (conftest forces JAX_PLATFORMS=cpu): the device
prover is platform-generic jnp code, so CPU execution checks the exact same
computation graph that runs on TPU.
"""

import pytest as _pytest

pytestmark = _pytest.mark.slow


import os

import numpy as np
import pytest

from ziren_tpu.stark.proof import MachineProof


def assert_proofs_equal(a, b):
    assert a.chip_names == b.chip_names
    assert list(a.public_values) == list(b.public_values)
    assert np.array_equal(a.commitment.main, b.commitment.main)
    assert np.array_equal(a.commitment.permutation, b.commitment.permutation)
    assert np.array_equal(a.commitment.quotient, b.commitment.quotient)
    for va, vb in zip(a.opened_values, b.opened_values):
        assert va.log_degree == vb.log_degree
        assert np.array_equal(va.local_cumulative_sum, vb.local_cumulative_sum)
        assert np.array_equal(va.global_cumulative_sum, vb.global_cumulative_sum)
        for fa, fb in [
            (va.preprocessed, vb.preprocessed),
            (va.main, vb.main),
            (va.permutation, vb.permutation),
        ]:
            assert np.array_equal(np.asarray(fa.local), np.asarray(fb.local))
            assert np.array_equal(np.asarray(fa.next), np.asarray(fb.next))
        assert np.array_equal(np.asarray(va.quotient), np.asarray(vb.quotient))
    fa, fb = a.opening_proof, b.opening_proof
    assert np.array_equal(np.asarray(fa.commit_phase_commits), np.asarray(fb.commit_phase_commits))
    assert np.array_equal(fa.final_poly, fb.final_poly)
    assert fa.pow_witness == fb.pow_witness
    for qa, qb in zip(fa.query_proofs, fb.query_proofs):
        for (rows_a, path_a), (rows_b, path_b) in zip(
            qa.input_openings, qb.input_openings
        ):
            for ra, rb in zip(rows_a, rows_b):
                assert np.array_equal(np.asarray(ra), np.asarray(rb))
            assert np.array_equal(np.asarray(path_a), np.asarray(path_b))
        for (pair_a, path_a), (pair_b, path_b) in zip(
            qa.commit_phase_openings, qb.commit_phase_openings
        ):
            assert np.array_equal(pair_a, pair_b)
            assert np.array_equal(np.asarray(path_a), np.asarray(path_b))


def _prove_both(machine, pk, records):
    from ziren_tpu.stark.jprover import prove_shard_device
    from ziren_tpu.stark.prover import prove_shard

    base = machine.config.challenger()
    pk.vk.observe_into(base)
    host = [prove_shard(machine, pk, r, base.clone()) for r in records]
    dev = [prove_shard_device(machine, pk, r, base.clone()) for r in records]
    return host, dev


def test_device_prover_matches_host_engine():
    """Generic STARK engine chips (incl. a zero-lookup AIR) prove
    bit-identically through the device path."""
    from test_stark_engine import FibonacciAir, Record, fib_pv
    from ziren_tpu.stark.config import dev_config
    from ziren_tpu.stark.machine import StarkMachine

    machine = StarkMachine(dev_config(), [FibonacciAir()], num_public_values=3)
    pk, vk = machine.setup()
    rec = Record(n=32, pv=fib_pv(32))
    host, dev = _prove_both(machine, pk, [rec])
    assert_proofs_equal(host[0], dev[0])
    assert machine.verify(vk, MachineProof(dev))


def test_device_prover_matches_host_mips():
    """Full MIPS machine shard (many chips, preprocessed traces, Global
    chip septic sums) proves bit-identically through the device path."""
    from ziren_tpu.executor.asm import fibonacci_program
    from ziren_tpu.machine.mips import execute, mips_machine
    from ziren_tpu.stark.config import dev_config

    program = fibonacci_program(30)
    machine = mips_machine(dev_config())
    pk, vk = machine.setup(program)
    ex, record = execute(program)
    host, dev = _prove_both(machine, pk, [record])
    assert_proofs_equal(host[0], dev[0])
    assert machine.verify(vk, MachineProof(dev))


@pytest.mark.skipif(os.environ.get("ZIREN_SLOW_TESTS") != "1",
                    reason="distinct trace shapes recompile every kernel: "
                           "multi-minute; set ZIREN_SLOW_TESTS=1")
def test_device_prover_multishard():
    """Multi-shard continuation through the device prover: proofs verify and
    the septic global digest balances."""
    from ziren_tpu.executor.asm import fibonacci_program
    from ziren_tpu.executor.executor import Executor
    from ziren_tpu.machine.mips import mips_machine
    from ziren_tpu.stark.config import dev_config

    program = fibonacci_program(600)
    machine = mips_machine(dev_config())
    pk, vk = machine.setup(program)
    ex = Executor(program, shard_size=2048)
    records = ex.run_sharded()
    host, dev = _prove_both(machine, pk, records)
    for h, d in zip(host, dev):
        assert_proofs_equal(h, d)
    assert machine.verify(vk, MachineProof(dev))


def test_packed_upload_matches_plain():
    """_to_dev_packed is bit-identical to _to_dev across column ranges."""
    import jax

    from ziren_tpu.core import field as F
    from ziren_tpu.stark import jprover

    rng = np.random.default_rng(7)
    n, w = 512, 23
    mat = np.zeros((n, w), np.uint32)
    for c in range(w):
        hi = [1, 2, 200, 256, 60000, 65536, F.P_INT][c % 7]
        mat[:, c] = rng.integers(0, hi, n, dtype=np.uint32)
    # force the packed path regardless of size
    old = jprover._PACK_MIN_BYTES
    jprover._PACK_MIN_BYTES = 0
    try:
        packed = np.asarray(jax.device_get(jprover._to_dev_packed(mat)))
    finally:
        jprover._PACK_MIN_BYTES = old
    plain = np.asarray(jax.device_get(jprover._to_dev(mat)))
    assert np.array_equal(packed, plain)
