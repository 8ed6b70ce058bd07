"""The MIPS machine: chip set assembly + end-to-end prove/verify helpers
(reference: crates/core/machine/src/mips/mod.rs MipsAir).

v1 chip set (see SURVEY.md §7 step 4): Program, Cpu, AddSub, Bitwise, Lt,
Branch, SyscallInstrs, Byte, MemoryInit, MemoryFinal. Grows toward the
reference's 50-chip machine milestone by milestone.
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
from .memory_global import MemoryFinalChip, MemoryInitChip
from .memory_instr import MemoryInstructionsChip
from .divrem import DivRemChip
from .maddsub import MaddSubChip
from .misc import CloClzChip, MiscChip, MovCondChip
from .mul import MulChip
from .shift import ShiftLeftChip, ShiftRightChip
from .poseidon2_chip import Poseidon2PermuteChip
from .program import ProgramChip
from .syscall import SyscallChip


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
        ByteChip(),
        MemoryInitChip(),
        MemoryFinalChip(),
    ]


def mips_machine(config=None) -> StarkMachine:
    return StarkMachine(
        config or dev_config(), mips_airs(), num_public_values=PROOF_MAX_NUM_PVS
    )


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


def prove_program(program, stdin=None, config=None):
    """Execute + prove; returns (machine, pk, vk, proof, executor)."""
    machine = mips_machine(config)
    pk, vk = machine.setup(program)
    ex, record = execute(program, stdin)
    proof = machine.prove(pk, [record])
    return machine, pk, vk, proof, ex
