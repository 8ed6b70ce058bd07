"""Data-parallel shard proving over a device mesh (stark/sharded.py).

Runs on the 8-virtual-device CPU mesh (conftest): every device executes the
full shard prove — commit, LogUp, quotient, FRI open, transcript — via one
jitted shard_map. Proofs must verify AND be bit-identical to the eager
device prover on same-shaped records.
"""

import pytest as _pytest

pytestmark = _pytest.mark.slow

import numpy as np

from test_jprover import assert_proofs_equal
from ziren_tpu.stark.proof import MachineProof


def test_sharded_engine_mesh_bitexact():
    """8 engine shards prove across the 8-device mesh; each proof equals the
    eager per-shard device prove bit for bit and the batch verifies."""
    import jax
    from test_stark_engine import FibonacciAir, Record, fib_pv
    from ziren_tpu.stark.config import dev_config
    from ziren_tpu.stark.jprover import prove_shard_device
    from ziren_tpu.stark.machine import StarkMachine
    from ziren_tpu.stark.sharded import prove_shards_sharded

    machine = StarkMachine(dev_config(), [FibonacciAir()], num_public_values=3)
    pk, vk = machine.setup()
    n_dev = len(jax.devices())
    records = [Record(n=32, pv=fib_pv(32)) for _ in range(n_dev)]

    proof = prove_shards_sharded(machine, pk, records)
    assert len(proof.shard_proofs) == n_dev
    assert machine.verify(vk, proof)

    base = machine.config.challenger()
    pk.vk.observe_into(base)
    eager = prove_shard_device(machine, pk, records[0], base.clone())
    for sp in proof.shard_proofs:
        assert_proofs_equal(eager, sp)


def _counter_air():
    from ziren_tpu.machine.layout import pad_to_pow2
    from ziren_tpu.stark.chip import Air

    class _Counter(Air):
        name = "Counter"
        width = 2  # (v, is_real)

        def eval(self, b):
            v, is_real = b.main_local
            v_n, is_real_n = b.main_next
            b.assert_bool(is_real)
            b.when_first_row().assert_eq(v, is_real)
            b.when_transition().assert_zero(is_real_n * (v_n - v - 1))
            b.when_transition().assert_zero(is_real_n * (1 - is_real))

        def generate_trace(self, record, output):
            n = record.n
            tr = np.zeros((n, 2), dtype=np.uint32)
            tr[:, 0] = np.arange(1, n + 1)
            tr[:, 1] = 1
            return pad_to_pow2(tr)

    return _Counter()


def test_sharded_mixed_shapes_fixed():
    """Records with different natural trace heights are fixed to one shape
    (stark/shape.py) and prove together; the batch verifies."""
    from test_stark_engine import Record
    from ziren_tpu.stark.config import dev_config
    from ziren_tpu.stark.machine import StarkMachine
    from ziren_tpu.stark.sharded import prove_shards_sharded
    from ziren_tpu.stark.shape import fix_shape

    machine = StarkMachine(dev_config(), [_counter_air()])
    pk, vk = machine.setup()
    records = [Record(n=8), Record(n=32)]

    shape, fixed = fix_shape(machine, records)
    (_, t0), (_, t1) = fixed[0][0], fixed[1][0]
    assert t0.shape == t1.shape == (32, 2)
    assert shape.log_height("Counter") == 5

    proof = prove_shards_sharded(machine, pk, records)
    assert len(proof.shard_proofs) == 2
    assert machine.verify(vk, proof)
