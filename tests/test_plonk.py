"""In-house Plonk+KZG over BN254 (snark/plonk.py) against the ported
reference verifier (verifier/plonk.py — crates/verifier/src/plonk)."""

import pytest

from ziren_tpu.snark.circuit import CircuitBuilder
from ziren_tpu.snark.plonk import from_r1cs, prove, setup
from ziren_tpu.verifier.plonk import (
    PlonkError,
    load_proof,
    load_vk,
    verify_plonk,
)


def _cubic_circuit(x_val=3):
    """x^3 + x + 5 == out, out public."""
    bld = CircuitBuilder()
    out = bld.public(x_val**3 + x_val + 5)
    x = bld.wit(x_val)
    x2 = bld.mul(x, x)
    x3 = bld.mul(x2, x)
    bld.assert_zero_var(x3 + x + bld.const(5) - out)
    assert bld.check()
    return bld


def _prove_cubic():
    bld = _cubic_circuit()
    cs, publics = from_r1cs(bld.to_r1cs(), bld.witness)
    pk = setup(cs)
    return prove(pk, publics), pk.vk_bytes, publics


def test_plonk_e2e_roundtrip():
    proof, vk_bytes, publics = _prove_cubic()
    assert verify_plonk(proof, vk_bytes, publics)


def test_plonk_byte_layouts_parse():
    proof, vk_bytes, publics = _prove_cubic()
    vk = load_vk(vk_bytes)
    assert vk.nb_public == 1
    assert vk.size >= 6 and vk.size & (vk.size - 1) == 0
    p = load_proof(proof)
    assert len(p.claimed_values) == 5
    assert len(proof) == 768


def test_plonk_rejects_wrong_public_input():
    proof, vk_bytes, publics = _prove_cubic()
    with pytest.raises(PlonkError):
        verify_plonk(proof, vk_bytes, [publics[0] + 1])


def test_plonk_rejects_tampered_proof():
    proof, vk_bytes, publics = _prove_cubic()
    from ziren_tpu.verifier.groth16 import Groth16Error

    for off in (0, 200, 384 + 16, 520):  # lro commit, h, claimed value, z
        bad = bytearray(proof)
        bad[off + 20] ^= 1
        # an off-curve point is rejected at parse time (Groth16Error from
        # the shared point codec); an on-curve tamper fails the pairing
        with pytest.raises((PlonkError, Groth16Error)):
            verify_plonk(bytes(bad), vk_bytes, publics)


def test_plonk_wider_circuit_with_bits():
    """Exercise addition-gate chains (bit decompositions are wide LCs)."""
    bld = CircuitBuilder()
    val = 0xDEADBEEF
    out = bld.public(val)
    x = bld.wit(val)
    bits = bld.bits_of(x, 32)
    acc = bld.const(0)
    for i, b in enumerate(bits):
        acc = acc + b.scale(1 << i)
    bld.assert_zero_var(acc - out)
    assert bld.check()
    cs, publics = from_r1cs(bld.to_r1cs(), bld.witness)
    pk = setup(cs)
    proof = prove(pk, publics)
    assert verify_plonk(proof, pk.vk_bytes, publics)


@pytest.mark.slow
def test_plonk_wrap_circuit_converts():
    """The wrap-verifier R1CS (the input to sdk.plonk_prove) converts to a
    satisfied Plonk constraint system. Proving at this scale (~6.8M gates
    from the ~1.6M-constraint dev wrap circuit) is a tool-scale job —
    tools/plonk_wrap.py — not a CI test: the LC-chain conversion costs
    ~4.3 gates/constraint and the prover's pointwise Fr passes are
    python-bound pending native vector kernels (ROADMAP)."""
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_stark_engine import FibonacciAir, Record, fib_pv
    from ziren_tpu.recursion.pipeline import compress, shrink, wrap_bn254
    from ziren_tpu.snark.wrap_circuit import build_wrap_circuit
    from ziren_tpu.stark.config import dev_config, outer_dev_config
    from ziren_tpu.stark.machine import StarkMachine

    m = StarkMachine(dev_config(), [FibonacciAir()], num_public_values=3)
    pk, vk = m.setup()
    proof = m.prove(pk, [Record(n=16, pv=fib_pv(16))])
    rm, rvk, final_sp = compress(m, vk, proof)
    sm, svk, sproof, _ = shrink(rm, rvk, final_sp)
    wm, wvk, wproof, _ = wrap_bn254(
        sm, svk, sproof.shard_proofs[0], config=outer_dev_config()
    )
    bld, _publics = build_wrap_circuit(wm, wvk, wproof.shard_proofs[0])
    cs, cs_publics = from_r1cs(bld.to_r1cs(), bld.witness)
    assert cs.check(cs_publics)
    assert cs.num_gates > bld.num_constraints  # LC chains materialized


@pytest.mark.slow
def test_plonk_midscale_prove_verify():
    """Mid-scale Plonk prove+verify (~100k gates): the FrVec-native prover
    path at a size where the pointwise passes dominate — the budgeted stand-
    in for the full 6.8M-gate wrap prove (measured end to end by
    tools/plonk_wrap.py: prove ~40 min, verify ~2 s; see ROADMAP)."""
    from ziren_tpu.core.bn254 import FR

    out_val = 3
    for i in range(25_000):
        out_val = (out_val * out_val + i) % FR

    bld = CircuitBuilder()
    pub = bld.public(out_val)
    acc = bld.wit(3)
    for i in range(25_000):
        acc = bld.mul(acc, acc) + bld.const(i)
    bld.assert_zero_var(acc - pub)
    assert bld.check()
    cs, publics = from_r1cs(bld.to_r1cs(), bld.witness)
    assert cs.num_gates > 50_000
    pk = setup(cs)
    proof = prove(pk, publics)
    assert verify_plonk(proof, pk.vk_bytes, publics)
