"""Fp/Fp2 tower precompiles (bn254, bls12-381): executor + oracles + e2e."""

import pytest

from ziren_tpu.executor import Executor
from ziren_tpu.executor.asm import fp_op_program
from ziren_tpu.machine.debug import debug_constraints, debug_lookups
from ziren_tpu.machine.mips import mips_machine, prove_program, verify_mips_proof

PBN = 21888242871839275222246405745257275088696311157297823662689037894645226208583
PBLS = int("1a0111ea397fe69a4b1ba7b6434bacd764774b84f38512bf6730d2a0f6b0f624"
           "1eabfffeb153ffffb9feffffffffaaab", 16)

XA, YA = 3**150 % PBN, 7**140 % PBN
A0, A1, B0, B1 = 3**99 % PBN, 5**99 % PBN, 7**99 % PBN, 11**99 % PBN
XB, YB = 3**200 % PBLS, 7**200 % PBLS
C0, C1, D0, D1 = 3**77 % PBLS, 5**77 % PBLS, 7**77 % PBLS, 11**77 % PBLS

CASES = [
    (0x26, XA, YA, 8, (XA + YA) % PBN),
    (0x27, XA, YA, 8, (XA - YA) % PBN),
    (0x28, XA, YA, 8, (XA * YA) % PBN),
    (0x29, A0 | (A1 << 256), B0 | (B1 << 256), 16, (A0 + B0) % PBN),
    (0x2A, A0 | (A1 << 256), B0 | (B1 << 256), 16, (A0 - B0) % PBN),
    (0x2B, A0 | (A1 << 256), B0 | (B1 << 256), 16, (A0 * B0 - A1 * B1) % PBN),
    (0x20, XB, YB, 12, (XB + YB) % PBLS),
    (0x21, XB, YB, 12, (XB - YB) % PBLS),
    (0x22, XB, YB, 12, (XB * YB) % PBLS),
    (0x25, C0 | (C1 << 384), D0 | (D1 << 384), 24, (C0 * D0 - C1 * D1) % PBLS),
]


@pytest.mark.parametrize("code_lo,x,y,nw,expect", CASES)
def test_fp_op(code_lo, x, y, nw, expect):
    prog = fp_op_program(0x0101, code_lo, x, y, nw)
    ex = Executor(prog)
    record = ex.run()
    assert ex.peek_register(20) == expect & 0xFFFFFFFF
    machine = mips_machine()
    pk, vk = machine.setup(prog, extra_observations=[prog.pc_start])
    imbalance, origin = debug_lookups(machine, pk, record)
    assert not imbalance, origin
    assert debug_constraints(machine, pk, record)


def test_prove_verify_fp2_mul():
    prog = fp_op_program(0x0101, 0x2B, A0 | (A1 << 256), B0 | (B1 << 256), 16)
    machine, pk, vk, proof, ex = prove_program(prog)
    assert "Bn254Fp2Mul" in proof.shard_proofs[0].chip_names
    assert verify_mips_proof(machine, vk, proof, pc_start=prog.pc_start)
