"""Deferred-event splitting: standalone memory shards + the cross-shard
memory init/finalize address-bit chain (reference record.rs defer/split,
opts.rs SplitOpts, memory/global.rs pv chaining, verify.rs:188-232)."""

import numpy as np
import pytest

from ziren_tpu.executor import Executor
from ziren_tpu.executor.asm import fibonacci_program
from ziren_tpu.executor.split import SplitOpts, addr_bits, finalize_memory
from ziren_tpu.machine.debug import debug_constraints, debug_lookups
from ziren_tpu.machine.mips import mips_machine, prove_program, verify_mips_proof
from ziren_tpu.stark.config import dev_config
from ziren_tpu.stark.verifier import VerificationError


def _split_records(n=30, shard_size=40, memory=3):
    """Sharded execution re-split with tiny thresholds so memory shards
    appear even for a small guest."""
    ex = Executor(fibonacci_program(n), shard_size=shard_size)
    records = ex.run_sharded()
    # records already went through finalize_memory with default (huge)
    # thresholds -> combined; re-split the same list with tiny ones
    return finalize_memory(records, SplitOpts(memory=memory,
                                              combine_memory_threshold=4))


def _packed(bits):
    return sum(int(b) << i for i, b in enumerate(bits))


def test_split_structure_and_chain():
    records = _split_records()
    mem = [r for r in records if r.num_cycles == 0]
    ex = [r for r in records if r.num_cycles > 0]
    assert len(mem) >= 2, "expected multiple standalone memory shards"
    # execution shards carry no endpoints; memory shards carry sorted chunks
    for r in ex:
        assert not r.mem_init and not r.mem_final
        assert _packed(r.public_values.previous_init_addr_bits) == 0
        assert _packed(r.public_values.last_init_addr_bits) == 0
    # first memory shard bootstraps at address 0
    assert mem[0].mem_init[0][0] == 0
    prev_i = prev_f = 0
    for r in mem:
        pv = r.public_values
        assert _packed(pv.previous_init_addr_bits) == prev_i
        assert _packed(pv.previous_finalize_addr_bits) == prev_f
        addrs_i = [a for a, _ in r.mem_init]
        addrs_f = [a for a, *_ in r.mem_final]
        assert all(x < y for x, y in zip(addrs_i, addrs_i[1:]))
        if addrs_i:
            assert addrs_i[0] > prev_i or (prev_i == 0 and addrs_i[0] == 0)
            prev_i = addrs_i[-1]
        if addrs_f:
            prev_f = addrs_f[-1]
        assert _packed(pv.last_init_addr_bits) == prev_i
        assert _packed(pv.last_finalize_addr_bits) == prev_f
        # post-halt shard: pc frozen, no execution
        assert pv.start_pc == pv.next_pc
    # shard numbering is contiguous over the whole list
    for i, r in enumerate(records):
        assert r.public_values.shard == i + 1


def test_split_debug_oracles():
    records = _split_records()
    machine = mips_machine()
    pk, _vk = machine.setup(fibonacci_program(30))
    from ziren_tpu.core import septic as S
    from ziren_tpu.machine.global_chip import GlobalChip

    digests = []
    for rec in records:
        imbalance, _ = debug_lookups(machine, pk, rec)
        assert not imbalance
        debug_constraints(machine, pk, rec)
        tr = GlobalChip().generate_trace(rec, rec)
        digests.append((tr[-1, -14:-7], tr[-1, -7:]))
    assert S.digests_balance(digests)


def test_split_prove_verify(monkeypatch):
    monkeypatch.setenv("ZIREN_COMBINE_MEMORY_THRESHOLD", "4")
    monkeypatch.setenv("ZIREN_SPLIT_MEMORY", "3")
    program = fibonacci_program(30)
    machine, pk, vk, proof, ex = prove_program(
        program, shard_size=40, config=dev_config())
    names = [set(sp.chip_names) for sp in proof.shard_proofs]
    assert any("Cpu" not in n for n in names), "no standalone memory shard"
    assert any("Cpu" in n for n in names)
    assert verify_mips_proof(machine, vk, proof, pc_start=program.pc_start)
    # tampering the chain must be rejected (pv is transcript-bound AND
    # chain-checked host-side)
    for sp in proof.shard_proofs:
        if "Cpu" not in sp.chip_names:
            k = sp.public_values.index(1, 45)  # first set bit in the chains
            sp.public_values[k] = 0
            break
    with pytest.raises(VerificationError):
        verify_mips_proof(machine, vk, proof)


def test_forged_last_bits_violate_air():
    """Claiming a wrong `last_init_addr_bits` must violate the MemoryInit
    AIR's last-row binding (the constraint the recursion chain hangs on)."""
    records = _split_records()
    mem = [r for r in records if r.num_cycles == 0]
    rec = mem[0]
    machine = mips_machine()
    pk, _vk = machine.setup(fibonacci_program(30))
    true_last = _packed(rec.public_values.last_init_addr_bits)
    rec.public_values.last_init_addr_bits = addr_bits(true_last + 4)
    with pytest.raises(AssertionError):
        debug_constraints(machine, pk, rec)


@pytest.mark.slow
def test_forged_prev_rewind_rejected():
    """A memory shard whose `previous_init_addr_bits` rewinds below the
    previous shard's coverage proves locally but breaks the host chain —
    the double-init attack surface this chain exists to close."""
    records = _split_records()
    mem_idx = [i for i, r in enumerate(records) if r.num_cycles == 0]
    second = records[mem_idx[1]]
    # rewind: claim a chain value strictly below the previous shard's
    # coverage (still below this shard's first event, so locally valid)
    true_prev = _packed(second.public_values.previous_init_addr_bits)
    assert true_prev - 1 > 0
    second.public_values.previous_init_addr_bits = addr_bits(true_prev - 1)
    machine = mips_machine(dev_config())
    pk, vk = machine.setup(fibonacci_program(30))
    # the shard itself satisfies its AIR (locally consistent forgery) ...
    debug_constraints(machine, pk, second)
    # ... so only the cross-shard chain rejects it
    from ziren_tpu.stark.proof import MachineProof
    from ziren_tpu.stark.prover import prove_shard

    base = machine.config.challenger()
    pk.vk.observe_into(base)
    proofs = [prove_shard(machine, pk, r, base.clone()) for r in records]
    with pytest.raises(VerificationError, match="chain"):
        verify_mips_proof(machine, vk, MachineProof(proofs))


def test_bootstrap_zero_anchor():
    """previous == 0 forces the first endpoint to be address 0: a forged
    first memory shard starting above 0 is rejected at trace time (honest
    prover guard) and the AIR bootstraps exactly one zero endpoint."""
    records = _split_records()
    mem = [r for r in records if r.num_cycles == 0]
    rec = mem[0]
    # drop the zero-address endpoint: trace generation must refuse
    rec.mem_init = rec.mem_init[1:]
    rec.mem_final = rec.mem_final[1:]
    machine = mips_machine()
    pk, _vk = machine.setup(fibonacci_program(30))
    with pytest.raises(AssertionError):
        debug_constraints(machine, pk, rec)
