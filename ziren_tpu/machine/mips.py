"""The MIPS machine: chip set assembly + end-to-end prove/verify helpers
(reference: crates/core/machine/src/mips/mod.rs MipsAir).

~50 chips: the CPU/ALU/memory core, the byte table, the multi-shard
global/septic chips, and the full precompile set (sha extend/compress,
poseidon2, keccak sponge, uint256, u256x2048, weierstrass add/double for
secp256k1/r1 + bn254 + bls12-381, ed25519 add/decompress, 12 fp/fp2 tower
ops). Precompile chips enter a shard proof only when they have events.
"""

from __future__ import annotations

import subprocess

from ziren_tpu.executor import Executor
from ziren_tpu.executor.record import PROOF_MAX_NUM_PVS
from ziren_tpu.stark.config import dev_config
from ziren_tpu.stark.machine import StarkMachine
from .alu import AddSubChip, BitwiseChip, LtChip
from .branch import BranchChip
from .byte import ByteChip
from .cpu import CpuChip
from .jump import JumpChip
from .global_chip import GlobalChip
from .memory_global import MemoryFinalChip, MemoryInitChip
from .memory_local import MemoryLocalChip
from .memory_instr import MemoryInstructionsChip
from .divrem import DivRemChip
from .maddsub import MaddSubChip
from .misc import CloClzChip, MiscChip, MovCondChip
from .mul import MulChip
from .sha_compress import ShaCompressChip
from .sha_extend import ShaExtendChip
from .shift import ShiftLeftChip, ShiftRightChip
from .poseidon2_chip import Poseidon2PermuteChip
from .program import ProgramChip
from .syscall import SyscallChip
from .keccak_sponge import KeccakSpongeChip
from .uint256 import Uint256MulChip
from .edwards import EdAddChip, EdDecompressChip
from .fptower import fptower_chips
from .garble import BooleanCircuitGarbleChip
from .sys_linux import SysLinuxChip
from .u256x2048 import U256xU2048MulChip
from .weierstrass import curve_chips


def mips_airs():
    return [
        ProgramChip(),
        CpuChip(),
        AddSubChip(),
        BitwiseChip(),
        LtChip(),
        MulChip(),
        DivRemChip(),
        MaddSubChip(),
        CloClzChip(),
        MiscChip(),
        MovCondChip(),
        ShiftLeftChip(),
        ShiftRightChip(),
        BranchChip(),
        JumpChip(),
        MemoryInstructionsChip(),
        SyscallChip(),
        Poseidon2PermuteChip(),
        ShaExtendChip(),
        ShaCompressChip(),
        Uint256MulChip(),
        KeccakSpongeChip(),
        *curve_chips(),
        EdAddChip(),
        EdDecompressChip(),
        *fptower_chips(),
        U256xU2048MulChip(),
        SysLinuxChip(),
        BooleanCircuitGarbleChip(),
        ByteChip(),
        MemoryLocalChip(),
        MemoryInitChip(),
        MemoryFinalChip(),
        GlobalChip(),
    ]


def mips_machine(config=None) -> StarkMachine:
    return StarkMachine(
        config or dev_config(), mips_airs(), num_public_values=PROOF_MAX_NUM_PVS
    )


def verify_mips_proof(machine, vk, proof, pc_start=None):
    """machine.verify + the cross-shard public-value chaining rules
    (reference: crates/prover/src/verify.rs:120-298)."""
    from ziren_tpu.stark.verifier import VerificationError
    from .messages import (
        PV_EXECUTION_SHARD,
        PV_EXIT_CODE,
        PV_NEXT_PC,
        PV_SHARD,
        PV_START_PC,
    )

    machine.verify(vk, proof)
    shards = proof.shard_proofs
    # chips a shard proof may never omit (reference verify.rs: the CPU /
    # memory / global chips are mandatory; event-driven chips are optional
    # because omitting one with live events breaks the lookup balance)
    required = {"Program", "Cpu", "Byte", "MemoryInit", "MemoryFinal",
                "MemoryLocal", "Global"}
    for i, sp in enumerate(shards):
        missing = required - set(sp.chip_names)
        if missing:
            raise VerificationError(f"shard {i}: missing chips {sorted(missing)}")
    digest0 = shards[0].public_values[:40]
    for i, sp in enumerate(shards):
        pv = sp.public_values
        if pv[PV_SHARD] != i + 1 or pv[PV_EXECUTION_SHARD] != i + 1:
            raise VerificationError(f"shard {i}: bad shard numbering")
        if pv[:40] != digest0:
            raise VerificationError(f"shard {i}: committed digest mismatch")
        if i > 0 and pv[PV_START_PC] != shards[i - 1].public_values[PV_NEXT_PC]:
            raise VerificationError(f"shard {i}: pc chain broken")
        if i > 0 and pv[PV_START_PC] == 0:
            raise VerificationError(f"shard {i}: started after halt")
    if pc_start is not None and shards[0].public_values[PV_START_PC] != pc_start:
        raise VerificationError("first shard start_pc != program entry")
    if shards[-1].public_values[PV_NEXT_PC] != 0:
        raise VerificationError("last shard did not halt")
    if shards[-1].public_values[PV_EXIT_CODE] != 0:
        raise VerificationError("nonzero exit code")
    return True


def execute(program, stdin=None, native=True):
    """Execute with the C++ executor when available (50+ MHz), falling back
    to the Python semantic oracle."""
    if native:
        try:
            from ziren_tpu.executor.native import NativeExecutor

            ex = NativeExecutor(program, stdin=stdin)
            record = ex.run()
            return ex, record
        except (OSError, RuntimeError, subprocess.CalledProcessError):
            pass
    ex = Executor(program, stdin=stdin)
    record = ex.run()
    return ex, record


def execute_sharded(program, shard_size, stdin=None, native=True):
    """Sharded execution, native C++ first (50+ MHz, bit-exact vs the
    python executor's run_sharded — tests/test_native_sharded.py)."""
    if native:
        try:
            from ziren_tpu.executor.native import NativeExecutor

            ex = NativeExecutor(program, stdin=stdin)
            records = ex.run_sharded(shard_size)
            return ex, records
        except (OSError, RuntimeError, subprocess.CalledProcessError):
            pass
    ex = Executor(program, stdin=stdin, shard_size=shard_size)
    records = ex.run_sharded()
    return ex, records


def prove_program(program, stdin=None, config=None, shard_size=None):
    """Execute + prove; returns (machine, pk, vk, proof, executor)."""
    machine = mips_machine(config)
    pk, vk = machine.setup(program, extra_observations=[program.pc_start])
    if shard_size:
        ex = Executor(program, stdin=stdin, shard_size=shard_size)
        records = ex.run_sharded()
    else:
        ex, record = execute(program, stdin)
        records = [record]
    proof = machine.prove(pk, records)
    return machine, pk, vk, proof, ex


def prove_program_checkpointed(program, stdin=None, config=None,
                               shard_size=4096, workers=None):
    """Memory-bounded pipelined prove (reference: utils/prove.rs —
    checkpoint-exec then parallel trace workers): a fast untraced pass
    collects shard-boundary checkpoints, then worker threads regenerate each
    shard's trace from its checkpoint and prove it, so only ~`workers`
    shards of trace are ever alive at once."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    from ziren_tpu.stark.prover import prove_shard

    machine = mips_machine(config)
    pk, vk = machine.setup(program, extra_observations=[program.pc_start])

    scout = Executor(program, stdin=stdin, mode="simple",
                     shard_size=shard_size)
    scout.collect_checkpoints = True
    cps = [scout.checkpoint()]
    scout.run_sharded()
    cps += scout.checkpoints[:-1]  # the last bump closes the final shard
    digest = list(scout.committed_values[:8]) + [0] * max(
        0, 8 - len(scout.committed_values)
    )
    exit_code = scout.exit_code

    base = machine.config.challenger()
    pk.vk.observe_into(base)

    def prove_one(k):
        ex = Executor.recover(program, cps[k], shard_size=shard_size)
        rec = ex.run_shard()
        rec.public_values.committed_value_digest = list(digest)
        rec.public_values.exit_code = exit_code
        return prove_shard(machine, pk, rec, base.clone())

    from ziren_tpu.stark.proof import MachineProof

    n = len(cps)
    workers = workers or min(n, os.cpu_count() or 4)
    if n == 1:
        proofs = [prove_one(0)]
    else:
        with ThreadPoolExecutor(max_workers=workers) as pool:
            proofs = list(pool.map(prove_one, range(n)))
    return machine, pk, vk, MachineProof(proofs), scout
