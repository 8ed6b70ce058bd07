"""Dual-field circuit DSL (snark/circuit.py): emulated KoalaBear over a
BN254 R1CS — arithmetic vs core.field/core.ext, lazy reduction soundness,
bit gadgets, and a Groth16 round-trip of a small Felt circuit."""

import numpy as np
import pytest

from ziren_tpu.core import ext as E
from ziren_tpu.core import field as F
from ziren_tpu.snark import circuit as C


def test_var_arithmetic_and_mul():
    b = C.CircuitBuilder()
    x = b.wit(7)
    y = b.wit(11)
    z = b.mul(x + y.scale(3), y - x)  # (7+33)*(11-7) = 160
    assert z.val == 160
    b.assert_zero_var(z - b.const(160))
    assert b.check()


def test_felt_fuzz_vs_host_field():
    rng = np.random.default_rng(0)
    b = C.CircuitBuilder()
    for _ in range(50):
        x, y = int(rng.integers(0, F.P_INT)), int(rng.integers(0, F.P_INT))
        fx, fy = C.felt_wit(b, x), C.felt_wit(b, y)
        C.assert_felt_eq(C.fadd(fx, fy), C.felt_const(b, (x + y) % F.P_INT))
        C.assert_felt_eq(C.fsub(fx, fy), C.felt_const(b, (x - y) % F.P_INT))
        C.assert_felt_eq(C.fmul(fx, fy), C.felt_const(b, (x * y) % F.P_INT))
    assert b.check()


def test_lazy_reduction_chain():
    """Long unreduced accumulation stays exact and reduces once."""
    b = C.CircuitBuilder()
    rng = np.random.default_rng(1)
    acc = C.felt_const(b, 0)
    want = 0
    for _ in range(200):
        x = int(rng.integers(0, F.P_INT))
        y = int(rng.integers(0, F.P_INT))
        acc = C.fadd(acc, C.fmul(C.felt_wit(b, x), C.felt_wit(b, y)))
        want = (want + x * y) % F.P_INT
    got = C.canon(acc)
    assert got.val == want and got.bound == F.P_INT - 1
    C.assert_felt_eq(got, C.felt_const(b, want))
    assert b.check()


def test_ext_fuzz_vs_host_ext():
    rng = np.random.default_rng(2)
    b = C.CircuitBuilder()
    for _ in range(10):
        x = rng.integers(0, F.P_INT, 4).astype(np.uint32)
        y = rng.integers(0, F.P_INT, 4).astype(np.uint32)
        ex, ey = C.ext_wit(b, x), C.ext_wit(b, y)
        C.assert_ext_eq(C.emul(ex, ey), C.ext_const(b, E.emul(x, y)))
        C.assert_ext_eq(C.eadd(ex, ey), C.ext_const(b, E.eadd(x, y)))
        C.assert_ext_eq(C.esub(ex, ey), C.ext_const(b, E.esub(x, y)))
        inv = C.einv_hinted(ex)
        C.assert_ext_eq(inv, C.ext_const(b, E.einv(x)))
    assert b.check()


def test_bits_and_select():
    b = C.CircuitBuilder()
    v = b.wit(0b1011001)
    bits = b.bits_of(v, 7)
    assert [int(x.val) for x in bits] == [1, 0, 0, 1, 1, 0, 1]
    t, f = b.wit(123), b.wit(456)
    assert b.select(bits[0], t, f).val == 123
    assert b.select(bits[1], t, f).val == 456
    assert b.check()


def test_strict_bits_of_full_fr():
    from ziren_tpu.core.bn254 import FR

    b = C.CircuitBuilder()
    for v in [0, 1, FR - 1, FR >> 1, 12345678901234567890]:
        x = b.wit(v)
        bits = b.strict_bits_of(x)
        assert sum(int(bb.val) << i for i, bb in enumerate(bits)) == v
    assert b.check()


def test_tampered_witness_fails_check():
    b = C.CircuitBuilder()
    x = b.wit(3)
    y = b.wit(5)
    z = b.mul(x, y)
    b.assert_zero_var(z - b.const(15))
    assert b.check()
    # flip the product wire
    b.witness[z.lc.popitem()[0] if False else max(z.lc)] += 1
    assert not b.check()


def test_canonical_reduce_bounds():
    b = C.CircuitBuilder()
    big = C.felt_wit(b, F.P_INT - 1)
    sq = C.fmul(big, big)
    assert sq.bound >= (F.P_INT - 1) ** 2
    red = C.canon(sq)
    assert red.val == pow(F.P_INT - 1, 2, F.P_INT)
    assert red.bound == F.P_INT - 1
    assert b.check()


def test_groth16_roundtrip_small_felt_circuit():
    """A tiny dual-field circuit proves and verifies through the in-house
    Groth16 pipeline (snark/groth16.py + verifier/groth16.py)."""
    from ziren_tpu.snark import bn254_curve_native as bcn
    from ziren_tpu.snark.groth16 import prove, setup
    from ziren_tpu.verifier import Groth16Verifier

    if not bcn.available():
        pytest.skip("native BN254 curve unavailable (python EC: ~3 min)")

    b = C.CircuitBuilder()
    # public: the canonical KB result of x*y + z
    x_v, y_v, z_v = 1234567, 89012345, 2130706432
    want = (x_v * y_v + z_v) % F.P_INT
    out_pub = C.felt_public(b, want)
    fx, fy, fz = C.felt_wit(b, x_v), C.felt_wit(b, y_v), C.felt_wit(b, z_v)
    got = C.canon(C.fadd(C.fmul(fx, fy), fz))
    C.assert_felt_eq(got, out_pub)
    assert b.check()

    r1cs = b.to_r1cs()
    pk = setup(r1cs, seed=b"circuit-dsl-test")
    proof_bytes = prove(pk, b.witness)
    assert Groth16Verifier.verify_gnark_proof(proof_bytes, [want], pk.vk_bytes)
    # a wrong public input must fail
    with pytest.raises(Exception):
        Groth16Verifier.verify_gnark_proof(
            proof_bytes, [(want + 1) % F.P_INT], pk.vk_bytes
        )
