"""BN254 wrap stage: compress -> shrink -> wrap_bn254 under the outer
config, verified end to end with digest binding (sdk.verify_wrapped)."""

import os

import pytest


def test_wrap_chain_end_to_end():
    """~2 min: the full compress -> shrink -> wrap ladder (ungated — the
    recursion-chip optimizations brought it down from ~8 min)."""
    from test_stark_engine import FibonacciAir, Record, fib_pv
    from ziren_tpu.recursion.pipeline import compress, shrink, wrap_bn254
    from ziren_tpu.sdk import ProverClient
    from ziren_tpu.stark.config import dev_config, outer_dev_config
    from ziren_tpu.stark.machine import StarkMachine
    from ziren_tpu.stark.proof import MachineProof
    from ziren_tpu.stark.verifier import VerificationError

    m = StarkMachine(dev_config(), [FibonacciAir()], num_public_values=3)
    pk, vk = m.setup()
    proof = m.prove(pk, [Record(n=16, pv=fib_pv(16)),
                         Record(n=32, pv=fib_pv(32))])
    rm, rvk, final_sp = compress(m, vk, proof)
    sm, svk, sproof, _ = shrink(rm, rvk, final_sp)
    ssp = sproof.shard_proofs[0]

    wm, wvk, wproof, _ = wrap_bn254(sm, svk, ssp, config=outer_dev_config())
    wsp = wproof.shard_proofs[0]
    assert isinstance(wsp.commitment.main, int)  # BN254 Fr commitment
    assert len(wsp.public_values) == 8  # compact digest
    assert wm.verify(wvk, wproof)

    client = ProverClient(config="dev")
    assert client.verify_wrapped((wm, wvk, wsp), (sm, svk, ssp))
    # binding: a wrap of THIS shrink proof must not verify against another
    other = (sm, svk, sproof.shard_proofs[0])
    bad = list(wsp.public_values)
    bad[0] = (int(bad[0]) + 1) % 2130706433
    wsp2 = type(wsp)(
        commitment=wsp.commitment, opened_values=wsp.opened_values,
        opening_proof=wsp.opening_proof, chip_names=wsp.chip_names,
        public_values=bad,
    )
    with pytest.raises((VerificationError, AssertionError)):
        client.verify_wrapped((wm, wvk, wsp2), other)
