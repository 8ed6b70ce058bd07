"""Portable BN254 pairing + Groth16 verifier (ziren_tpu/verifier) and the
in-house Groth16 prover (ziren_tpu/snark): bilinearity, gnark byte-format
round-trips against the reference's committed vk artifacts, and a full
setup -> prove -> verify -> tamper cycle."""

import pytest as _pytest

pytestmark = _pytest.mark.slow


import json
import os

import pytest

from ziren_tpu.verifier import Groth16Verifier, bn254_pairing as bp
from ziren_tpu.verifier.groth16 import Groth16Error, load_proof, load_vk

_G1 = (1, 2)
_G2 = (
    bp.FQ2((
        10857046999023057135944570762232829481370756359578518086990519993285655852781,
        11559732032986387107991004021392285783925812861821192530917403151452391805634,
    )),
    bp.FQ2((
        8495653923123431417604973247489272438418190587263600148770280649306958101930,
        4082367875863433681332203403145435568316851327593401208105741076214120093531,
    )),
)

_REF_VK = "/root/reference/crates/verifier/bn254-vk/groth16_vk.bin"
_REF_PROOF = "/root/reference/crates/prover/scripts/artifacts/example_proof.json"


def test_pairing_bilinearity():
    assert bp.is_on_g1(_G1) and bp.is_on_g2(_G2)
    e1 = bp.pairing(_G2, bp.g1_mul(_G1, 6))
    assert e1 == bp.pairing(bp.g2_mul(_G2, 6), _G1)
    assert e1 == bp.pairing(bp.g2_mul(_G2, 2), bp.g1_mul(_G1, 3))
    assert bp.pairing_batch(
        [(bp.g1_neg(bp.g1_mul(_G1, 6)), _G2), (bp.g1_mul(_G1, 2), bp.g2_mul(_G2, 3))]
    )


@pytest.mark.skipif(not os.path.exists(_REF_VK), reason="reference absent")
def test_reference_artifacts_parse():
    """The reference's embedded gnark vk and example proof parse through our
    byte-format loaders with all points on-curve (format compatibility)."""
    alpha, nbeta, gamma, delta, k = load_vk(open(_REF_VK, "rb").read())
    assert bp.is_on_g1(alpha) and len(k) == 3
    assert bp.is_on_g2(gamma) and bp.is_on_g2(delta) and bp.is_on_g2(nbeta)
    art = json.load(open(_REF_PROOF))
    ar, bs, krs = load_proof(bytes.fromhex(art["encoded_proof"]))
    assert bp.is_on_g1(ar) and bp.is_on_g2(bs) and bp.is_on_g1(krs)


def test_groth16_prove_verify_roundtrip():
    from ziren_tpu.snark import R1CS, prove, setup

    # x*y = z and (x+y)*1 = s, publics (z, s); wires [1, z, s, x, y]
    r1cs = R1CS(
        num_wires=5, num_public=2,
        a=[{3: 1}, {3: 1, 4: 1}],
        b=[{4: 1}, {0: 1}],
        c=[{1: 1}, {2: 1}],
    )
    pk = setup(r1cs)
    x, y = 7, 11
    proof = prove(pk, [1, x * y, x + y, x, y])
    assert len(proof) == 324  # gnark WriteTo layout, nbCommitments=0
    assert Groth16Verifier.verify_gnark_proof(proof[:256], [77, 18], pk.vk_bytes)
    with pytest.raises(Groth16Error):
        Groth16Verifier.verify_gnark_proof(proof[:256], [78, 18], pk.vk_bytes)
    # corrupt ar
    bad = bytearray(proof)
    bad[5] ^= 1
    with pytest.raises(Groth16Error):
        Groth16Verifier.verify_gnark_proof(bytes(bad[:256]), [77, 18], pk.vk_bytes)


def test_ziren_verify_entry():
    """The Ziren-flavoured verify(): 4-byte vk-hash prefix + [vkey_hash,
    sha256(public values)] public inputs (reference groth16/mod.rs:89)."""
    import hashlib

    from ziren_tpu.snark import R1CS, prove, setup
    from ziren_tpu.verifier.groth16 import hash_public_inputs

    pv_stream = b"hello ziren"
    vkey_hash_bytes = bytes(32)  # dummy program vkey (first byte masked off)
    digest = int.from_bytes(hash_public_inputs(pv_stream), "big")
    vkey = int.from_bytes(vkey_hash_bytes[1:], "big")

    # both public wires must be constrained, else their vk bases are the
    # infinity point and the inputs would be unbound: vkey*1=t1, digest*1=t2
    r1cs = R1CS(num_wires=5, num_public=2,
                a=[{1: 1}, {2: 1}], b=[{0: 1}, {0: 1}],
                c=[{3: 1}, {4: 1}])
    pk = setup(r1cs)
    proof = prove(pk, [1, vkey, digest, vkey, digest])
    prefixed = hashlib.sha256(pk.vk_bytes).digest()[:4] + proof
    assert Groth16Verifier.verify(
        prefixed, pv_stream, "0x" + vkey_hash_bytes.hex(), pk.vk_bytes
    )
    with pytest.raises(Groth16Error):
        Groth16Verifier.verify(
            prefixed, b"other values", "0x" + vkey_hash_bytes.hex(), pk.vk_bytes
        )
