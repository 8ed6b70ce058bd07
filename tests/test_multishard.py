"""Multi-shard continuation: sharded execution, per-shard proofs, the septic
global memory argument, and public-value chaining."""

import pytest as _pytest

pytestmark = _pytest.mark.slow


import numpy as np
import pytest

from ziren_tpu.core import septic as S
from ziren_tpu.executor import Executor
from ziren_tpu.executor.asm import fibonacci_program
from ziren_tpu.machine.debug import debug_constraints, debug_lookups
from ziren_tpu.machine.mips import mips_machine, prove_program, verify_mips_proof
from ziren_tpu.stark.verifier import VerificationError


def test_sharded_execution_telescopes():
    ex = Executor(fibonacci_program(50), shard_size=32)
    records = ex.run_sharded()
    assert len(records) > 2
    for a, b in zip(records, records[1:]):
        assert a.public_values.next_pc == b.public_values.start_pc
    # the global multiset telescopes across shards
    from collections import defaultdict

    net = defaultdict(int)
    for r in records:
        for addr, t in r.shard_initial.items():
            net[(addr,) + t] -= 1
        for addr, t in r.shard_final.items():
            net[(addr,) + t] += 1
        for addr, v in r.mem_init:
            net[(addr, 0, 0, v)] += 1
        for addr, sh, clk, v in r.mem_final:
            net[(addr, sh, clk, v)] -= 1
    assert not {k: v for k, v in net.items() if v != 0}


def test_multishard_debug_oracles():
    program = fibonacci_program(30)
    ex = Executor(program, shard_size=40)
    records = ex.run_sharded()
    machine = mips_machine()
    pk, vk = machine.setup(program)
    from ziren_tpu.machine.global_chip import GlobalChip

    digests = []
    for rec in records:
        imbalance, _ = debug_lookups(machine, pk, rec)
        assert not imbalance
        debug_constraints(machine, pk, rec)
        tr = GlobalChip().generate_trace(rec, rec)
        digests.append((tr[-1, -14:-7], tr[-1, -7:]))
    assert S.digests_balance(digests)


def test_multishard_prove_verify():
    program = fibonacci_program(30)
    machine, pk, vk, proof, ex = prove_program(program, shard_size=40)
    assert len(proof.shard_proofs) >= 3
    assert verify_mips_proof(machine, vk, proof, pc_start=program.pc_start)
    # tampering with a shard's digest must break verification
    sp = proof.shard_proofs[1]
    for name, vals in zip(sp.chip_names, sp.opened_values):
        if name == "Global":
            g = vals.global_cumulative_sum
            vals.global_cumulative_sum = np.array(
                list(g[7:]) + list(g[:7]), dtype=np.uint32
            )
    with pytest.raises(VerificationError):
        verify_mips_proof(machine, vk, proof)
