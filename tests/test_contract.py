"""Solidity verifier-contract generation (ziren_tpu/snark/contract.py —
reference: gnark ExportSolidity via crates/recursion/gnark-ffi).

No EVM is available in this environment, so the test executes the
CONTRACT'S OWN semantics in python: it parses the emitted vk constants
back out of the Solidity source, applies the contract's input-mapping
rules (selector check, top-byte drop, 253-bit digest mask), accumulates
vk_x exactly as the ecAdd/ecMul calls would, and runs the contract's
pairing equation through the same BN254 precompile semantics
(verifier/bn254_pairing). A proof the contract logic accepts must be
exactly one our portable verifier accepts."""

import pytest as _pytest

pytestmark = _pytest.mark.slow

import hashlib
import re

from ziren_tpu.snark import R1CS, prove, setup
from ziren_tpu.snark.contract import export_solidity
from ziren_tpu.verifier import Groth16Verifier, bn254_pairing as bp
from ziren_tpu.verifier.groth16 import hash_public_inputs


def _constants(src: str) -> dict:
    out = {}
    for m in re.finditer(
        r"constant\s+(\w+)\s*=\s*(?:0x([0-9a-f]+)|(\d+));", src
    ):
        name, hx, dec = m.groups()
        out[name] = int(hx, 16) if hx else int(dec)
    return out


def _contract_verify(src: str, program_vkey: bytes, public_values: bytes,
                     proof_bytes: bytes) -> bool:
    """Execute verifyProof's logic from the generated source."""
    c = _constants(src)
    # selector check
    if proof_bytes[:4] != c["VERIFIER_HASH"].to_bytes(32, "big")[:4]:
        return False
    input0 = int.from_bytes(program_vkey, "big") & ((1 << 248) - 1)
    input1 = int.from_bytes(
        hashlib.sha256(public_values).digest(), "big") & ((1 << 253) - 1)
    body = proof_bytes[4:]

    def word(off):
        return int.from_bytes(body[off : off + 32], "big")

    ax, ay = word(0), word(32)
    if ax >= bp.Q or ay >= bp.Q:  # contract reverts InvalidProof
        return False
    neg_a = (ax, 0 if ay == 0 else bp.Q - ay)
    b_pt = (bp.FQ2((word(96), word(64))), bp.FQ2((word(160), word(128))))
    c_pt = (word(192), word(224))
    k = [(c[f"K{i}_X"], c[f"K{i}_Y"]) for i in range(3)]
    vk_x = bp._add(bp._add(k[0], bp.g1_mul(k[1], input0)),
                   bp.g1_mul(k[2], input1))
    alpha = (c["ALPHA_X"], c["ALPHA_Y"])
    beta = (bp.FQ2((c["BETA_X0"], c["BETA_X1"])),
            bp.FQ2((c["BETA_Y0"], c["BETA_Y1"])))
    gamma = (bp.FQ2((c["GAMMA_X0"], c["GAMMA_X1"])),
             bp.FQ2((c["GAMMA_Y0"], c["GAMMA_Y1"])))
    delta = (bp.FQ2((c["DELTA_X0"], c["DELTA_X1"])),
             bp.FQ2((c["DELTA_Y0"], c["DELTA_Y1"])))
    return bp.pairing_batch(
        [(neg_a, b_pt), (alpha, beta), (vk_x, gamma), (c_pt, delta)]
    )


def test_contract_matches_portable_verifier():
    pv_stream = b"ziren on chain"
    vkey_hash_bytes = bytes.fromhex("00" + "ab" * 31)
    digest = int.from_bytes(hash_public_inputs(pv_stream), "big")
    vkey = int.from_bytes(vkey_hash_bytes[1:], "big")

    # both public wires constrained: vkey*1=t1, digest*1=t2
    r1cs = R1CS(num_wires=5, num_public=2,
                a=[{1: 1}, {2: 1}], b=[{0: 1}, {0: 1}],
                c=[{3: 1}, {4: 1}])
    pk = setup(r1cs)
    proof = prove(pk, [1, vkey, digest, vkey, digest])
    prefixed = hashlib.sha256(pk.vk_bytes).digest()[:4] + proof[:256]

    src = export_solidity(pk.vk_bytes)
    assert "contract ZirenGroth16Verifier" in src
    assert "address(0x08).staticcall" in src  # pairing precompile

    # portable verifier accepts
    assert Groth16Verifier.verify(
        prefixed, pv_stream, "0x" + vkey_hash_bytes.hex(), pk.vk_bytes
    )
    # contract logic accepts the same artifact
    assert _contract_verify(src, vkey_hash_bytes, pv_stream, prefixed)
    # wrong public values rejected
    assert not _contract_verify(src, vkey_hash_bytes, b"other", prefixed)
    # wrong program vkey rejected
    assert not _contract_verify(
        src, bytes.fromhex("00" + "ac" * 31), pv_stream, prefixed)
    # tampered proof rejected
    bad = bytearray(prefixed)
    bad[10] ^= 1
    try:
        ok = _contract_verify(src, vkey_hash_bytes, pv_stream, bytes(bad))
    except AssertionError:
        ok = False  # off-curve point: the precompile would revert
    assert not ok
    # wrong selector rejected
    assert not _contract_verify(
        src, vkey_hash_bytes, pv_stream, b"\x00\x00\x00\x00" + prefixed[4:])
    # malleated proof (A.y re-encoded as A.y + Q) rejected
    ay = int.from_bytes(prefixed[36:68], "big")
    mall = prefixed[:36] + (ay + bp.Q).to_bytes(32, "big") + prefixed[68:]
    assert not _contract_verify(src, vkey_hash_bytes, pv_stream, mall)
    # `fixed` is a reserved Solidity keyword; it must not appear as an
    # identifier anywhere in the generated source
    assert not re.search(r"\bfixed\b", src)


def test_contract_generic_inputs():
    """A vk with N != 2 public inputs (the wrap circuit's native shape)
    gets the generic verifyRawProof entry and no bytes32 wrapper."""
    n = 4  # publics p_i, constraints p_i * 1 = w_i
    r1cs = R1CS(
        num_wires=1 + 2 * n, num_public=n,
        a=[{1 + i: 1} for i in range(n)],
        b=[{0: 1} for _ in range(n)],
        c=[{1 + n + i: 1} for i in range(n)],
    )
    pk = setup(r1cs)
    vals = [5, 6, 7, 8]
    proof = prove(pk, [1] + vals + vals)
    assert Groth16Verifier.verify_gnark_proof(proof[:256], vals, pk.vk_bytes)
    src = export_solidity(pk.vk_bytes, name="GenericVerifier")
    assert "contract GenericVerifier" in src
    assert "verifyRawProof" in src
    assert "NUM_INPUTS = 4" in src
    assert "programVKey" not in src  # no 2-input convenience entry
    assert "K4_X" in src and "K5_X" not in src
