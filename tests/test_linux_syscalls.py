"""Linux O32 ABI syscall emulation (executor level; chip is a later milestone)."""

from ziren_tpu.executor import Executor
from ziren_tpu.executor.asm import Instruction, O, halt_sequence, imm, ri
from ziren_tpu.executor.program import Program


def _syscall(num, a0, a1):
    return [imm(O.ADD, 2, 0, num), imm(O.ADD, 4, 0, a0), imm(O.ADD, 5, 0, a1),
            Instruction(O.SYSCALL, 2, 4, 5, False, False)]


def test_brk_mmap_clone_fcntl_nop():
    insns = []
    insns += _syscall(4045, 0x10000, 0) + [ri(O.ADD, 20, 2, 0)]  # brk
    insns += _syscall(4090, 0, 0x1801) + [ri(O.ADD, 21, 2, 0)]   # mmap2 heap
    insns += _syscall(4090, 0, 0x1000) + [ri(O.ADD, 22, 2, 0)]
    insns += _syscall(4090, 0x8000, 0x10) + [ri(O.ADD, 26, 2, 0)]  # fixed map
    insns += _syscall(4120, 0, 0) + [ri(O.ADD, 23, 2, 0)]        # clone
    insns += _syscall(4055, 1, 3) + [ri(O.ADD, 24, 2, 0)]        # fcntl GETFL
    insns += _syscall(4055, 9, 3) + [ri(O.ADD, 27, 2, 0)]        # bad fd
    insns += _syscall(4222, 0, 0) + [ri(O.ADD, 25, 2, 0)]        # gettid nop
    insns += _syscall(4003, 5, 0) + [ri(O.ADD, 28, 2, 0)]        # read bad fd
    insns += halt_sequence(0)
    prog = Program.new(insns)
    ex = Executor(prog)
    rec = ex.run()
    assert ex.peek_register(20) == 0x10000
    h1, h2 = ex.peek_register(21), ex.peek_register(22)
    assert h2 == (h1 + 0x2000) & 0xFFFFFFFF  # 0x1801 rounds to 0x2000 pages
    assert ex.peek_register(26) == 0x8000  # fixed mapping echoes a0
    assert ex.peek_register(23) == 1
    assert ex.peek_register(24) == 1
    assert ex.peek_register(27) == 0xFFFFFFFF
    assert ex.peek_register(25) == 0
    assert ex.peek_register(28) == 0xFFFFFFFF
    assert len(rec.precompile_events[4000]) == 9


def test_exit_group_halts():
    prog = Program.new(_syscall(4246, 0, 0) + halt_sequence(0))
    ex = Executor(prog)
    ex.run()
    assert ex.exited and ex.exit_code == 0


def test_chip_oracles():
    from ziren_tpu.machine.debug import debug_constraints, debug_lookups
    from ziren_tpu.machine.mips import mips_machine

    insns = []
    insns += _syscall(4045, 0x10000, 0)
    insns += _syscall(4045, 0, 0)
    insns += _syscall(4090, 0, 0x1801)
    insns += _syscall(4090, 0x8000, 0x10)
    insns += _syscall(4120, 0, 0)
    insns += _syscall(4055, 1, 3)
    insns += _syscall(4055, 2, 1)
    insns += _syscall(4055, 9, 3)
    insns += _syscall(4003, 0, 0)
    insns += _syscall(4003, 5, 0)
    insns += _syscall(4222, 0, 0)
    insns += halt_sequence(0)
    prog = Program.new(insns)
    machine = mips_machine()
    pk, vk = machine.setup(prog, extra_observations=[prog.pc_start])
    record = Executor(prog).run()
    imbalance, origin = debug_lookups(machine, pk, record)
    assert not imbalance, origin
    assert debug_constraints(machine, pk, record)


def test_prove_verify():
    from ziren_tpu.machine.mips import prove_program, verify_mips_proof

    insns = []
    insns += _syscall(4045, 0x10000, 0) + [ri(O.ADD, 20, 2, 0)]
    insns += _syscall(4090, 0, 0x1801) + [ri(O.ADD, 21, 2, 0)]
    insns += _syscall(4055, 1, 3)
    insns += halt_sequence(0)
    prog = Program.new(insns)
    machine, pk, vk, proof, ex = prove_program(prog)
    assert "SysLinux" in proof.shard_proofs[0].chip_names
    assert verify_mips_proof(machine, vk, proof, pc_start=prog.pc_start)


def test_exit_group_prove_verify():
    from ziren_tpu.machine.mips import prove_program, verify_mips_proof

    prog = Program.new(_syscall(4246, 0, 0) + halt_sequence(0))
    machine, pk, vk, proof, ex = prove_program(prog)
    assert verify_mips_proof(machine, vk, proof, pc_start=prog.pc_start)
