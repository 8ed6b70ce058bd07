"""Weierstrass precompiles (secp256k1/r1, bn254): executor, oracles, e2e."""

import pytest

from ziren_tpu.executor import Executor
from ziren_tpu.executor.asm import ec_program, ec_reference
from ziren_tpu.machine.debug import debug_constraints, debug_lookups
from ziren_tpu.machine.mips import mips_machine, prove_program, verify_mips_proof

CURVES = ["secp256k1", "secp256r1", "bn254", "bls12381"]


@pytest.mark.parametrize("curve", CURVES)
@pytest.mark.parametrize("op", ["add", "double"])
def test_executor(curve, op):
    prog = ec_program(curve, op)
    ex = Executor(prog)
    ex.run()
    x, y = ec_reference(curve, op)
    assert ex.peek_register(20) == x & 0xFFFFFFFF
    assert ex.peek_register(21) == y & 0xFFFFFFFF


@pytest.mark.parametrize("curve", CURVES)
@pytest.mark.parametrize("op", ["add", "double"])
def test_chip_oracles(curve, op):
    prog = ec_program(curve, op)
    machine = mips_machine()
    pk, vk = machine.setup(prog, extra_observations=[prog.pc_start])
    record = Executor(prog).run()
    imbalance, origin = debug_lookups(machine, pk, record)
    assert not imbalance, origin
    assert debug_constraints(machine, pk, record)


def test_prove_verify():
    prog = ec_program("secp256k1", "add")
    machine, pk, vk, proof, ex = prove_program(prog)
    assert "Secp256k1Add" in proof.shard_proofs[0].chip_names
    assert verify_mips_proof(machine, vk, proof, pc_start=prog.pc_start)


def test_prove_verify_bn254_double():
    prog = ec_program("bn254", "double")
    machine, pk, vk, proof, ex = prove_program(prog)
    assert "Bn254Double" in proof.shard_proofs[0].chip_names
    assert verify_mips_proof(machine, vk, proof, pc_start=prog.pc_start)


def test_ed25519_add_and_double():
    from ziren_tpu.executor.asm import (ED25519_GX, ED25519_GY,
                                        ed25519_program, ed25519_reference)

    for double in (True, False):
        prog = ed25519_program(double)
        ex = Executor(prog)
        record = ex.run()
        g2 = ed25519_reference(ED25519_GX, ED25519_GY, ED25519_GX, ED25519_GY)
        x3, y3 = g2 if double else ed25519_reference(ED25519_GX, ED25519_GY, *g2)
        assert ex.peek_register(20) == x3 & 0xFFFFFFFF
        machine = mips_machine()
        pk, vk = machine.setup(prog, extra_observations=[prog.pc_start])
        imbalance, origin = debug_lookups(machine, pk, record)
        assert not imbalance, origin
        assert debug_constraints(machine, pk, record)


def test_ed25519_prove_verify():
    from ziren_tpu.executor.asm import ed25519_program

    prog = ed25519_program(double=True)
    machine, pk, vk, proof, ex = prove_program(prog)
    assert "EdAdd" in proof.shard_proofs[0].chip_names
    assert verify_mips_proof(machine, vk, proof, pc_start=prog.pc_start)


@pytest.mark.parametrize("sign", [0, 1])
def test_ed_decompress(sign):
    from ziren_tpu.executor.asm import (ED25519_GX, ED25519_P,
                                        ed_decompress_program)

    prog = ed_decompress_program(sign)
    ex = Executor(prog)
    record = ex.run()
    want = ED25519_GX if (ED25519_GX & 1) == sign else (ED25519_P - ED25519_GX)
    assert ex.peek_register(20) == want & 0xFFFFFFFF
    machine = mips_machine()
    pk, vk = machine.setup(prog, extra_observations=[prog.pc_start])
    imbalance, origin = debug_lookups(machine, pk, record)
    assert not imbalance, origin
    assert debug_constraints(machine, pk, record)


def test_ed_decompress_prove_verify():
    from ziren_tpu.executor.asm import ed_decompress_program

    prog = ed_decompress_program(1)
    machine, pk, vk, proof, ex = prove_program(prog)
    assert "EdDecompress" in proof.shard_proofs[0].chip_names
    assert verify_mips_proof(machine, vk, proof, pc_start=prog.pc_start)


DECOMPRESS_CURVES = ["secp256k1", "secp256r1", "bls12381"]


@pytest.mark.parametrize("curve", DECOMPRESS_CURVES)
@pytest.mark.parametrize("sign", [0, 1])
def test_wdecompress_oracles(curve, sign):
    """Executor semantics + chip constraint/lookup oracles for the three
    weierstrass decompress precompiles (both sign conventions)."""
    from ziren_tpu.executor.asm import (wdecompress_program,
                                        wdecompress_reference)

    prog = wdecompress_program(curve, sign)
    ex = Executor(prog)
    record = ex.run()
    want = wdecompress_reference(curve, sign)
    assert ex.peek_register(20) == want & 0xFFFFFFFF
    machine = mips_machine()
    pk, vk = machine.setup(prog, extra_observations=[prog.pc_start])
    imbalance, origin = debug_lookups(machine, pk, record)
    assert not imbalance, origin
    assert debug_constraints(machine, pk, record)


@pytest.mark.parametrize("curve", DECOMPRESS_CURVES)
def test_wdecompress_prove_verify(curve):
    from ziren_tpu.executor.asm import wdecompress_program

    prog = wdecompress_program(curve, 1)
    machine, pk, vk, proof, ex = prove_program(prog)
    chip = {"secp256k1": "Secp256k1Decompress",
            "secp256r1": "Secp256r1Decompress",
            "bls12381": "Bls12381Decompress"}[curve]
    assert chip in proof.shard_proofs[0].chip_names
    assert verify_mips_proof(machine, vk, proof, pc_start=prog.pc_start)
