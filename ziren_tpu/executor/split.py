"""Deferred-event splitting: distributed memory init/finalize shards
(reference: crates/core/executor/src/record.rs:115-130 defer/split,
crates/stark/src/opts.rs:237-257 SplitOpts,
crates/core/machine/src/memory/global.rs first/last-row address chaining,
crates/stark/src/air/public_values.rs:22-60).

The memory init/finalize multisets cover EVERY address the execution
touched — for large guests they dwarf a single shard. The reference moves
them out of the execution shards into standalone "memory shards" at the
end of the proof, each holding a bounded, address-sorted chunk; soundness
of the global ordering (no address initialized or finalized twice) is
carried across shards by four PublicValues fields:

    previous_init_addr_bits / last_init_addr_bits
    previous_finalize_addr_bits / last_finalize_addr_bits

each a 32-bit little-endian decomposition of an address. Within a shard
the MemoryInit/MemoryFinal chips constrain: first real row's address is
strictly greater than `previous_*` (unless previous == 0, the
zero-address bootstrap case), addresses strictly increase row to row, and
the last real row's address equals `last_*`. Across shards the host
verifier (machine/mips.py verify_mips_proof) and the recursion layer
(recursion/mips_pipeline.py lift/join) chain last -> previous.

This module is the host-side `split()`: it runs after execution (both the
python and native executors put the full init/finalize sets in the last
record) and either leaves them there (small workloads — the reference's
`combine_memory_threshold`) or moves them into standalone memory records.
Memory records contain no cycles: the cycle-driven chips exclude
themselves (`Air.cycle_chip`), so a memory shard proves only
{Program, Byte, MemoryInit, MemoryFinal, Global}.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from .record import ExecutionRecord


@dataclass
class SplitOpts:
    """Deferred-event thresholds (reference opts.rs:237-257).

    memory: max init/finalize events per standalone memory shard.
    combine_memory_threshold: if the total touched-address count is at or
    below this, init/finalize stay combined in the last execution shard
    (one fewer proof for small guests)."""

    memory: int = 1 << 16
    combine_memory_threshold: int = 1 << 14
    # precompile-event thresholds (the precompile half of deferred
    # splitting needs the global-scope syscall multiset; see ROADMAP)
    deferred: int = 1 << 15

    @staticmethod
    def from_env() -> "SplitOpts":
        """RAM-tiered defaults + env overrides via the central options
        (stark/opts.py ZirenCoreOpts.auto, reference ZKMCoreOpts)."""
        from ziren_tpu.stark.opts import ZirenCoreOpts

        s = ZirenCoreOpts.auto().split_opts
        return SplitOpts(
            memory=s.memory,
            combine_memory_threshold=s.combine_memory_threshold,
            deferred=s.deferred,
        )


def addr_bits(addr: int) -> list:
    """32-bit little-endian decomposition (the pv field encoding)."""
    return [(int(addr) >> i) & 1 for i in range(32)]


def ensure_zero_address(record) -> None:
    """Guarantee the init/finalize sets start at address 0 (register $zero,
    value 0). The MemoryInit/Final AIRs anchor the address chain at zero:
    when the `previous_*` pv is zero the first row must BE address 0
    (reference global.rs:397-421), so the bootstrap endpoint must always
    exist. Untouched address 0 contributes cancelling init/finalize global
    multiset entries (identical tuples, send vs receive)."""
    if record.mem_init and record.mem_init[0][0] == 0:
        return
    assert not record.mem_init or record.mem_init[0][0] > 0
    record.mem_init.insert(0, (0, 0))
    record.mem_final.insert(0, (0, 0, 0, 0))


def set_last_memory_bits(record) -> None:
    """Populate last_init/finalize_addr_bits for a record that carries
    memory endpoints (previous_* stay as already set)."""
    pv = record.public_values
    if record.mem_init:
        pv.last_init_addr_bits = addr_bits(record.mem_init[-1][0])
    else:
        pv.last_init_addr_bits = list(pv.previous_init_addr_bits)
    if record.mem_final:
        pv.last_finalize_addr_bits = addr_bits(record.mem_final[-1][0])
    else:
        pv.last_finalize_addr_bits = list(pv.previous_finalize_addr_bits)


def finalize_memory(records: list, opts: SplitOpts | None = None) -> list:
    """Post-execution split pass. `records` is the executor's shard list
    with the full init/finalize sets in the LAST record (address-sorted).
    Returns the final record list: execution shards (+ standalone memory
    shards when the sets exceed the combine threshold), with all four
    addr-bits pv fields populated and shard numbering extended."""
    opts = opts or SplitOpts.from_env()
    last = records[-1]
    ensure_zero_address(last)
    init = last.mem_init
    final = last.mem_final
    assert all(init[i][0] < init[i + 1][0] for i in range(len(init) - 1)), \
        "init events not address-sorted"
    assert all(final[i][0] < final[i + 1][0] for i in range(len(final) - 1)), \
        "finalize events not address-sorted"

    if len(init) <= opts.combine_memory_threshold and len(
        final
    ) <= opts.combine_memory_threshold:
        set_last_memory_bits(last)
        return records

    # move init/finalize out of the execution shard entirely; its chain
    # contribution becomes a no-op (last = previous)
    last.mem_init = []
    last.mem_final = []
    set_last_memory_bits(last)
    program = last.program
    pv_last = last.public_values
    n_exec = len(records)

    out = list(records)
    prev_init = [0] * 32
    prev_fin = [0] * 32
    k = 0
    m = opts.memory
    while k * m < max(len(init), len(final)):
        rec = ExecutionRecord(program)
        rec.mem_init = init[k * m : (k + 1) * m]
        rec.mem_final = final[k * m : (k + 1) * m]
        pv = rec.public_values
        # post-halt: non-cpu shards carry start_pc == next_pc (== 0 after
        # the halting shard) and the unchanged digests / exit code
        pv.start_pc = pv_last.next_pc
        pv.next_pc = pv_last.next_pc
        pv.exit_code = pv_last.exit_code
        pv.committed_value_digest = list(pv_last.committed_value_digest)
        pv.deferred_proofs_digest = list(pv_last.deferred_proofs_digest)
        pv.shard = n_exec + 1 + k
        # execution shard stays at the post-execution value (non-cpu
        # shards never advance it; reference verify.rs:120-130)
        pv.execution_shard = n_exec + 1
        pv.previous_init_addr_bits = list(prev_init)
        pv.previous_finalize_addr_bits = list(prev_fin)
        set_last_memory_bits(rec)
        prev_init = list(pv.last_init_addr_bits)
        prev_fin = list(pv.last_finalize_addr_bits)
        out.append(rec)
        k += 1
    return out
