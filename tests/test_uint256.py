"""UINT256_MUL precompile: executor semantics, native parity, proof e2e."""

import numpy as np
import pytest

from ziren_tpu.executor import Executor
from ziren_tpu.executor.asm import uint256_program
from ziren_tpu.machine.debug import debug_constraints, debug_lookups
from ziren_tpu.machine.mips import mips_machine, prove_program, verify_mips_proof

X = 0xDEADBEEF_12345678_9ABCDEF0_11111111_22222222_33333333_44444444_55555555
Y = 0xCAFEBABE_87654321_0FEDCBA9_66666666_77777777_88888888_99999999_AAAAAAAA
MODULI = [(1 << 255) - 19, 0, (1 << 256) - 189]


@pytest.mark.parametrize("m", MODULI)
def test_executor_semantics(m):
    prog = uint256_program(X, Y, m)
    ex = Executor(prog)
    rec = ex.run()
    expect = (X * Y) % (m if m else 1 << 256)
    assert ex.peek_register(20) == expect & 0xFFFFFFFF
    assert ex.peek_register(21) == (expect >> 224) & 0xFFFFFFFF
    evs = rec.precompile_events[0x0101001D]
    assert len(evs) == 1
    assert len(evs[0]["reads"]) == 16 and len(evs[0]["writes"]) == 8


def test_native_parity():
    try:
        from ziren_tpu.executor.native import NativeExecutor
    except Exception:
        pytest.skip("native executor unavailable")
    for m in MODULI + [12345 << 226]:
        prog = uint256_program(X, Y, m)
        pe = Executor(prog)
        pr = pe.run()
        ne = NativeExecutor(prog)
        nr = ne.run()
        pev = [
            {k: v for k, v in e.items() if k != "_wit"}
            for e in pr.precompile_events[0x0101001D]
        ]
        assert pev == nr.precompile_events[0x0101001D]
        pf, nf = pr.freeze(), nr.freeze()
        for k in pf:
            assert np.array_equal(pf[k], nf[k]), k


@pytest.mark.parametrize("m", MODULI)
def test_constraints_and_lookups(m):
    prog = uint256_program(X, Y, m)
    machine = mips_machine()
    pk, vk = machine.setup(prog, extra_observations=[prog.pc_start])
    record = Executor(prog).run()
    imbalance, origin = debug_lookups(machine, pk, record)
    assert not imbalance, origin
    assert debug_constraints(machine, pk, record)


def test_prove_verify():
    prog = uint256_program(X, Y, (1 << 255) - 19)
    machine, pk, vk, proof, ex = prove_program(prog)
    assert verify_mips_proof(machine, vk, proof, pc_start=prog.pc_start)
