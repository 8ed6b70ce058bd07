"""Deferred proofs through the recursion tree (recursion/deferred.py).

A sub-program's compressed proof is re-verified inside a deferred leaf,
its claim folds into the reconstruct-digest chain, and the main program's
compressed proof is only COMPLETE when the chain lands exactly on the
deferred_proofs_digest the guest committed.
"""

import pytest as _pytest

pytestmark = _pytest.mark.slow


import numpy as np
import pytest

from ziren_tpu.executor.asm import deferred_claim_program, fibonacci_program
from ziren_tpu.machine.mips import execute, mips_machine
from ziren_tpu.recursion import deferred as D
from ziren_tpu.recursion import mips_pipeline as MP
from ziren_tpu.stark.config import dev_config
from ziren_tpu.stark.verifier import VerificationError


def test_fold_claim_matches_reference_shape():
    d0 = D.fold_claims([])
    assert d0 == [0] * 8
    d1 = D.fold_claims([([1] * 8, [2] * 32)])
    assert len(d1) == 8 and d1 != [0] * 8
    # folding is order-sensitive and chains
    d2 = D.fold_claims([([1] * 8, [2] * 32), ([3] * 8, [4] * 32)])
    assert d2 == D.fold_claim(d1, [3] * 8, [4] * 32)
    assert d2 != D.fold_claims([([3] * 8, [4] * 32), ([1] * 8, [2] * 32)])


def test_deferred_end_to_end():
    machine = mips_machine(dev_config())

    # 1. sub-program: prove + compress to a complete root
    sub_prog = fibonacci_program(8)
    sub_pk, sub_vk = machine.setup(sub_prog)
    _, sub_rec = execute(sub_prog)
    sub_proof = machine.prove(sub_pk, [sub_rec])
    sub_side = MP.compress(machine, sub_vk, sub_proof)
    sub_rpv = [int(v) for v in sub_side[2].public_values]
    assert sub_rpv[MP.RPV_IS_COMPLETE] == 1

    # 2. the guest's claim + folded digest (host mirrors the guest fold)
    vkey = D.claim_vk_digest(sub_vk)
    pv32 = sub_rpv[MP.RPV_DIGEST : MP.RPV_DIGEST + 32]
    folded = D.fold_claims([(vkey, pv32)])

    # 3. main program defers the claim and commits the folded digest
    main_prog = deferred_claim_program(
        vkey, D.pv_digest_bytes_to_words(pv32), folded
    )
    main_pk, main_vk = machine.setup(main_prog)
    ex, main_rec = execute(main_prog)
    assert main_rec.deferred_proof_claims == [
        (tuple(vkey), tuple(D.pv_digest_bytes_to_words(pv32)))
    ]
    assert list(main_rec.public_values.deferred_proofs_digest) == folded
    main_proof = machine.prove(main_pk, [main_rec])

    # 4. core tree seeded with the reconstruct digest: NOT complete alone
    core = MP.compress(machine, main_vk, main_proof,
                       reconstruct_digest=folded)
    core_rpv = [int(v) for v in core[2].public_values]
    assert core_rpv[MP.RPV_IS_COMPLETE] == 0
    with pytest.raises(VerificationError):
        MP.verify_compressed(machine, main_vk, core[0], core[1], core[2])

    # 5. deferred chain + root merge: complete
    chain = D.deferred_chain([sub_side])
    assert [int(v) for v in chain[2].public_values[: 8]] == [0] * 8
    assert [int(v) for v in chain[2].public_values[8:]] == folded
    root = D.attach_deferred(core, chain)
    root_rpv = [int(v) for v in root[2].public_values]
    assert root_rpv[MP.RPV_IS_COMPLETE] == 1
    digest = MP.verify_compressed(machine, main_vk, root[0], root[1], root[2])
    assert isinstance(digest, bytes) and len(digest) == 32


def test_sdk_rejects_unbacked_claims():
    """compressed_prove must refuse when the guest deferred claims but no
    sub-proofs were supplied (cheap: fails before any recursion work)."""
    from ziren_tpu.sdk import ProverClient

    client = ProverClient(config="dev")
    prog = deferred_claim_program([1] * 8, [2] * 8, D.fold_claims([
        ([1] * 8, [b for w in [2] * 8 for b in (w & 0xFF, (w >> 8) & 0xFF,
                                                (w >> 16) & 0xFF, w >> 24)])
    ]))
    pk, vk = client.setup(prog)
    with pytest.raises(VerificationError):
        client.compressed_prove(pk)
