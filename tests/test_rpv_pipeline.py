"""Canonical RecursionPublicValues compress tree (recursion/mips_pipeline):
every layer chains shard boundaries and accumulates the septic global sum
IN-CIRCUIT; the root proof carries is_complete and the committed digest.

Reference: crates/recursion/circuit/src/machine/core.rs (lift),
machine/compress.rs (join), crates/prover/src/verify.rs (root checks).
"""

import pytest as _pytest

# The compress-complete e2e is the default-profile representative of the
# recursion bucket (VERDICT r4 item 8); the remaining cases stay slow.


import copy

import numpy as np
import pytest

from ziren_tpu.core import septic as S
from ziren_tpu.executor.asm import fibonacci_program
from ziren_tpu.machine.mips import prove_program
from ziren_tpu.recursion import mips_pipeline as mp
from ziren_tpu.stark.proof import MachineProof
from ziren_tpu.stark.verifier import VerificationError


@pytest.fixture(scope="module")
def two_shard():
    prog = fibonacci_program(600)
    machine, pk, vk, proof, ex = prove_program(prog, shard_size=2048)
    assert len(proof.shard_proofs) == 2
    return prog, machine, vk, proof


def test_rpv_compress_complete(two_shard):
    """2-shard MIPS proof -> ONE recursion proof whose RPV attests the full
    execution: is_complete=1, zero septic digest, chained boundaries."""
    prog, machine, vk, proof = two_shard
    rm, rvk, final_sp = mp.compress(machine, vk, proof)
    digest = mp.verify_compressed(machine, vk, rm, rvk, final_sp,
                                  pc_start=prog.pc_start)
    assert isinstance(digest, bytes) and len(digest) == 32
    rpv = [int(v) for v in final_sp.public_values]
    assert len(rpv) == mp.RPV_WIDTH
    assert rpv[mp.RPV_IS_COMPLETE] == 1
    assert rpv[mp.RPV_START_SHARD] == 1
    assert rpv[mp.RPV_NEXT_SHARD] == 3
    assert rpv[mp.RPV_NEXT_PC] == 0  # halted
    assert rpv[mp.RPV_EXIT_CODE] == 0
    assert rpv[mp.RPV_VK : mp.RPV_VK + 8] == [int(v) for v in vk.commit]
    # the accumulated septic digest at the root is the zero digest
    gx = np.asarray(rpv[mp.RPV_GLOBAL_SUM : mp.RPV_GLOBAL_SUM + 7], np.uint32)
    gy = np.asarray(
        rpv[mp.RPV_GLOBAL_SUM + 7 : mp.RPV_GLOBAL_SUM + 14], np.uint32
    )
    assert S.digest_is_zero((gx, gy))

    # allowed-vk registry root threading: the root RPV carries the FULL
    # (lift + join closure) registry root the tree ran under — every join
    # verified BOTH children's vk membership against it in-circuit, and
    # the final rec_vk itself is a member, so the root alone is the trust
    # anchor (no consumer-pinned rec_vk)
    from ziren_tpu.recursion.shape_universe import build_full_registry

    shapes = [
        tuple(zip(sp.chip_names, (v.log_degree for v in sp.opened_values)))
        for sp in proof.shard_proofs
    ]
    reg, _depth = build_full_registry(machine, vk, shapes)
    assert rpv[mp.RPV_VK_ROOT : mp.RPV_VK_ROOT + 8] == [
        int(v) for v in reg.root
    ]
    reg.membership(rvk.commit)  # the root join vk is enumerated
    mp.verify_compressed(machine, vk, rm, rvk, final_sp,
                         pc_start=prog.pc_start, registry=reg)
    bad_root = [int(reg.root[0]) ^ 1] + [int(v) for v in reg.root[1:]]
    with pytest.raises(VerificationError, match="allowed-vk root"):
        mp.verify_compressed(machine, vk, rm, rvk, final_sp,
                             pc_start=prog.pc_start, vk_root=bad_root)
    # a rec_vk outside the registry is rejected even with the right root
    lift_only = mp.build_lift_registry(machine, vk, proof.shard_proofs)
    with pytest.raises(VerificationError, match="not in the allowed-vk"):
        mp.verify_compressed(machine, vk, rm, rvk, final_sp,
                             pc_start=prog.pc_start, registry=lift_only,
                             vk_root=reg.root)
    # a registry that lacks the lift vk cannot build the tree: the join's
    # membership opening does not exist
    from ziren_tpu.recursion.vk_registry import VkRegistry

    foreign = VkRegistry([np.arange(8, dtype=np.uint32) + 1])
    with pytest.raises(KeyError):
        mp.compress(machine, vk, proof, registry=foreign)


@_pytest.mark.slow
def test_rpv_rejects_tampered_global_sum(two_shard):
    """Tampering one shard's septic global cumulative sum is rejected while
    BUILDING the compressed proof: the traced shard verifier replays the
    transcript with the tampered sum and its assertions fail (round-1 gap:
    only host machine.verify caught this)."""
    prog, machine, vk, proof = two_shard
    bad = copy.deepcopy(proof)
    sp = bad.shard_proofs[0]
    for name, vals in zip(sp.chip_names, sp.opened_values):
        if name == "Global":
            g = vals.global_cumulative_sum
            vals.global_cumulative_sum = np.array(
                list(g[7:]) + list(g[:7]), dtype=np.uint32
            )
    with pytest.raises((AssertionError, VerificationError)):
        mp.compress(machine, vk, bad)


@_pytest.mark.slow
def test_rpv_partial_range_incomplete(two_shard):
    """Compressing only the first shard yields a valid recursion proof with
    is_complete=0 (pc chain not terminated), which verify_compressed
    rejects as an attestation of the full execution."""
    prog, machine, vk, proof = two_shard
    part = MachineProof([proof.shard_proofs[0]])
    rm, rvk, final_sp = mp.compress(machine, vk, part)
    rpv = [int(v) for v in final_sp.public_values]
    assert rpv[mp.RPV_IS_COMPLETE] == 0
    assert rpv[mp.RPV_NEXT_PC] != 0
    with pytest.raises(VerificationError, match="incomplete"):
        mp.verify_compressed(machine, vk, rm, rvk, final_sp,
                             pc_start=prog.pc_start)


@_pytest.mark.slow
def test_rpv_join_rejects_broken_chain(two_shard):
    """Joining the same lift with itself violates the shard chain."""
    prog, machine, vk, proof = two_shard
    side = mp.lift_shard(machine, vk, proof.shard_proofs[0])
    with pytest.raises(AssertionError):
        mp.join(side, side)


@_pytest.mark.slow
def test_host_sum_digest_matches_core():
    """host_sum_digest (the in-circuit accumulation's host mirror) agrees
    with core/septic.py digests_balance on real shard digests."""
    prog = fibonacci_program(40)
    machine, pk, vk, proof, ex = prove_program(prog, shard_size=64)
    digs = [mp.shard_global_digest(machine, sp) for sp in proof.shard_proofs]
    total = mp.host_sum_digest(digs)
    assert S.digest_is_zero(total) == S.digests_balance(digs)
    assert S.digest_is_zero(total)
