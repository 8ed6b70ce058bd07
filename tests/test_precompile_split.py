"""Precompile half of deferred-event splitting: standalone precompile
shards + the global syscall multiset (reference: record.rs defer/split,
syscall/chip.rs SyscallChip Core/Precompile instances,
opts.rs SplitOpts per-family thresholds)."""

import numpy as np
import pytest

from ziren_tpu.executor import Executor
from ziren_tpu.executor.asm import (
    Instruction,
    Program,
    halt_sequence,
    imm,
    ri,
)
from ziren_tpu.executor.opcode import Opcode as O
from ziren_tpu.executor.precompile_mem import (
    compute_local_segments,
    group_events,
)
from ziren_tpu.machine.debug import debug_constraints, debug_lookups
from ziren_tpu.machine.mips import (
    mips_machine,
    prove_program,
    verify_mips_proof,
)
from ziren_tpu.stark.config import dev_config
from ziren_tpu.stark.verifier import VerificationError


def multi_poseidon2_program(k: int) -> Program:
    """k poseidon2 permutes on the same state at 0x2000 — the CPU also
    touches the state words between calls, exercising the CPU-segment
    tiling around precompile scopes."""
    insns = [
        imm(O.ADD, 8, 0, 0x2000),
        imm(O.ADD, 9, 0, 7),
        ri(O.SW, 9, 8, 0),
        ri(O.SW, 9, 8, 60),
    ]
    for _ in range(k):
        insns += [
            imm(O.SLL, 2, 1, 16),
            ri(O.OR, 2, 2, 0x30),  # v0 = POSEIDON2_PERMUTE
            imm(O.ADD, 4, 0, 0x2000),
            Instruction(O.SYSCALL, 2, 4, 5, False, False),
            ri(O.LW, 20, 8, 0),  # CPU read of the state between calls
        ]
    insns += halt_sequence(0)
    return Program.new(insns)


def test_deferred_precompile_shards_prove_verify(monkeypatch):
    monkeypatch.setenv("ZIREN_SPLIT_DEFERRED", "2")
    program = multi_poseidon2_program(6)
    machine, pk, vk, proof, ex = prove_program(
        program, shard_size=4096, config=dev_config())
    names = [set(sp.chip_names) for sp in proof.shard_proofs]
    deferred = [n for n in names
                if "SyscallPrecompile" in n and "Cpu" not in n]
    assert len(deferred) >= 3, f"expected >=3 precompile shards: {names}"
    assert all("Poseidon2Permute" in n for n in deferred)
    # the execution shard keeps the dispatch end of the multiset
    assert any("SyscallCore" in n and "Cpu" in n for n in names)
    assert verify_mips_proof(machine, vk, proof, pc_start=program.pc_start)


def test_deferred_records_balance_oracles(monkeypatch):
    monkeypatch.setenv("ZIREN_SPLIT_DEFERRED", "2")
    ex = Executor(multi_poseidon2_program(6), shard_size=4096)
    records = ex.run_sharded()
    assert sum(1 for r in records if r.num_cycles == 0) >= 3
    machine = mips_machine(dev_config())
    pk, _vk = machine.setup(multi_poseidon2_program(6))
    from ziren_tpu.core import septic as S
    from ziren_tpu.machine.global_chip import GlobalChip

    digests = []
    for rec in records:
        imbalance, _ = debug_lookups(machine, pk, rec)
        assert not imbalance, f"shard {rec.public_values.shard}: {imbalance}"
        debug_constraints(machine, pk, rec)
        tr = GlobalChip().generate_trace(rec, rec)
        digests.append((tr[-1, -14:-7], tr[-1, -7:]))
    assert S.digests_balance(digests)


def test_dropped_precompile_event_breaks_balance(monkeypatch):
    """A deferred shard that silently drops one precompile group leaves a
    dangling global syscall send — the septic digest sum cannot balance
    (the attack surface the global multiset closes)."""
    monkeypatch.setenv("ZIREN_SPLIT_DEFERRED", "2")
    ex = Executor(multi_poseidon2_program(6), shard_size=4096)
    records = ex.run_sharded()
    victim = next(r for r in records if r.num_cycles == 0)
    victim.precompile_groups = victim.precompile_groups[:-1]
    dropped = victim.precompile_events[0x00010030].pop()
    from ziren_tpu.core import septic as S
    from ziren_tpu.machine.global_chip import GlobalChip

    digests = []
    for rec in records:
        tr = GlobalChip().generate_trace(rec, rec)
        digests.append((tr[-1, -14:-7], tr[-1, -7:]))
    assert not S.digests_balance(digests)


def test_sha_extend_group_moves_atomically(monkeypatch):
    from ziren_tpu.executor.asm import sha_extend_program

    monkeypatch.setenv("ZIREN_SPLIT_DEFERRED", "47")
    program = sha_extend_program()
    machine, pk, vk, proof, ex = prove_program(
        program, config=dev_config(), shard_size=4096)
    names = [set(sp.chip_names) for sp in proof.shard_proofs]
    assert any("ShaExtend" in n and "Cpu" not in n for n in names)
    assert verify_mips_proof(machine, vk, proof, pc_start=program.pc_start)


def test_cost_model_bounds_peak_lde_area(monkeypatch):
    """The per-AirId cost model (reference cost.rs estimate_mips_lde_size):
    deferral keeps every shard's LDE area bounded even when the guest is
    precompile-dense — without it, one shard's poseidon2 chip would carry
    all events."""
    from ziren_tpu.stark.shape import estimate_lde_area

    machine = mips_machine(dev_config())
    program = multi_poseidon2_program(8)

    monkeypatch.setenv("ZIREN_SPLIT_DEFERRED", "2")
    split = Executor(program, shard_size=4096).run_sharded()
    areas = [estimate_lde_area(machine, r) for r in split]
    assert all(a > 0 for a in areas)

    monkeypatch.setenv("ZIREN_SPLIT_DEFERRED", str(1 << 30))
    whole = Executor(program, shard_size=4096).run_sharded()
    peak_whole = max(estimate_lde_area(machine, r) for r in whole)
    # deferral strictly reduces the peak shard cost: the 8-permute chip
    # spreads over >=4 precompile shards of <=2 rows each
    assert max(areas) < peak_whole


@pytest.mark.parametrize("maker", [
    "poseidon2_program", "sha_extend_program", "sha256_program",
    "uint256_program", "keccak_program", "ed25519_program",
    "ed_decompress_program", "u256x2048_program",
])
def test_scope_tiling_conventions(maker):
    """The per-family timestamp conventions in precompile_mem.MEM_SPEC are
    validated by the tiling assertions: a wrong convention breaks the
    segment chain loudly."""
    import ziren_tpu.executor.asm as asm

    fn = getattr(asm, maker)
    if maker == "uint256_program":
        program = fn(3, 5, 0)
    elif maker == "keccak_program":
        program = fn(b"x" * 200)
    elif maker == "u256x2048_program":
        program = fn(3, 1 << 100)
    else:
        program = fn()
    ex = Executor(program)
    record = ex.run()
    groups = group_events(record)
    assert groups, f"{maker}: no precompile groups recorded"
    compute_local_segments(record)  # raises on any convention mismatch


@pytest.mark.parametrize("maker", [
    "poseidon2_program", "sha_extend_program", "sha256_program",
    "uint256_program", "keccak_program",
])
def test_scope_tiling_native(maker):
    """Same tiling validation over the C++ executor's event streams (the
    five native-supported precompile families)."""
    import ziren_tpu.executor.asm as asm
    from ziren_tpu.executor.native import NativeExecutor

    fn = getattr(asm, maker)
    if maker == "uint256_program":
        program = fn(3, 5, 0)
    elif maker == "keccak_program":
        program = fn(b"x" * 200)
    else:
        program = fn()
    try:
        ex = NativeExecutor(program)
    except Exception:
        pytest.skip("native executor unavailable")
    record = ex.run()
    groups = group_events(record)
    assert groups, f"{maker}: no precompile groups recorded"
    compute_local_segments(record)


def test_linux_deferral_and_result_linkage(monkeypatch):
    """Linux syscalls defer through the global multiset with the
    SyscallResult linkage: the deferred SysLinux shard proves+verifies,
    and forging a deferred group's v0 result breaks the septic balance
    (reference chip.rs SyscallResult cross-shard result linkage)."""
    from ziren_tpu.executor.asm import Instruction, O, halt_sequence, imm, ri
    from ziren_tpu.executor.program import Program

    def _sys(num, a0, a1):
        return [imm(O.ADD, 2, 0, num), imm(O.ADD, 4, 0, a0),
                imm(O.ADD, 5, 0, a1),
                Instruction(O.SYSCALL, 2, 4, 5, False, False)]

    insns = []
    insns += _sys(4045, 0x10000, 0)   # brk
    insns += _sys(4120, 0, 0)         # clone
    insns += _sys(4055, 1, 3)         # fcntl
    insns += _sys(4222, 0, 0)         # gettid nop
    insns += halt_sequence(0)
    program = Program.new(insns)

    monkeypatch.setenv("ZIREN_SPLIT_DEFERRED", "2")
    machine, pk, vk, proof, ex = prove_program(
        program, shard_size=4096, config=dev_config())
    names = [set(sp.chip_names) for sp in proof.shard_proofs]
    assert any("SysLinux" in n and "Cpu" not in n for n in names), names
    assert verify_mips_proof(machine, vk, proof, pc_start=program.pc_start)

    # forgery: tamper a deferred group's recorded result (v0) — the
    # SyscallPrecompile bridge then receives a global SyscallResult tuple
    # the core side never sent
    records = Executor(program, shard_size=4096).run_sharded()
    victim = next(r for r in records if r.num_cycles == 0
                  and r.precompile_groups
                  and 4000 <= r.precompile_groups[0]["sid"] < 4300)
    g = victim.precompile_groups[0]
    g["result"] ^= 1
    from ziren_tpu.core import septic as S
    from ziren_tpu.machine.global_chip import GlobalChip

    digests = []
    for rec in records:
        tr = GlobalChip().generate_trace(rec, rec)
        digests.append((tr[-1, -14:-7], tr[-1, -7:]))
    assert not S.digests_balance(digests)
