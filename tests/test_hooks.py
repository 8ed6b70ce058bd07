"""Host hook registry (executor/hooks.py): ecrecover, fp sqrt/inv, bls12-381
witness hooks — and the executor's WRITE-to-hook-fd dispatch."""

import numpy as np

from ziren_tpu.executor import hooks as H


def test_fp_inv_hook():
    p = H._P256K1
    buf = (32).to_bytes(4, "big") + (123456789).to_bytes(32, "big") + p.to_bytes(32, "big")
    (out,) = H.hook_fp_inv(None, buf)
    inv = int.from_bytes(out, "big")
    assert (123456789 * inv) % p == 1


def test_fp_sqrt_hook_residue_and_nonresidue():
    p = H._P256K1
    x = 987654321
    sq = (x * x) % p
    buf = (
        (32).to_bytes(4, "big")
        + sq.to_bytes(32, "big")
        + p.to_bytes(32, "big")
        + (3).to_bytes(32, "big")
    )
    status, root = H.hook_fp_sqrt(None, buf)
    assert status == b"\x01"
    r = int.from_bytes(root, "big")
    assert (r * r) % p == sq
    # a non-residue: status 0 and the root of 3*element
    nr = (sq * 3) % p  # 3 is an NQR -> 3*x^2 is a non-residue
    buf = (
        (32).to_bytes(4, "big")
        + nr.to_bytes(32, "big")
        + p.to_bytes(32, "big")
        + (3).to_bytes(32, "big")
    )
    status, root = H.hook_fp_sqrt(None, buf)
    assert status == b"\x00"
    r = int.from_bytes(root, "big")
    assert (r * r) % p == (nr * 3) % p


def test_tonelli_shanks_path():
    # bls12-381 base field is 1 mod 4 -> exercises Tonelli-Shanks
    p = H._PBLS
    x = 0xDEADBEEF
    sq = (x * x) % p
    status, root = H.hook_bls_sqrt(None, sq.to_bytes(48, "big"))
    assert status == b"\x01"
    r = int.from_bytes(root, "big")
    assert (r * r) % p == sq
    (out,) = H.hook_bls_inverse(None, x.to_bytes(48, "big"))
    assert (x * int.from_bytes(out, "big")) % p == 1


def test_ecrecover_hook_k256():
    p = H._P256K1
    # pick x = 1: alpha = 1 + 7 = 8 (a residue? just check both paths work)
    r = 5
    alpha = (r * r * r + 7) % p
    buf = bytes([1]) + r.to_bytes(32, "big") + alpha.to_bytes(32, "big")
    out = H.hook_ecrecover(None, buf)
    if out[0] == b"\x01":
        y = int.from_bytes(out[1], "big")
        assert (y * y) % p == alpha
        assert y % 2 == 0  # requested even y (bit 7 clear)
        r_inv = int.from_bytes(out[2], "big")
        assert (r * r_inv) % H._N256K1 == 1
    else:
        root = int.from_bytes(out[1], "big")
        assert (root * root) % p == (alpha * 3) % p


def test_executor_write_dispatches_hooks():
    """A guest WRITE to fd 8 (FP_INV) lands the inverse in the hint stream."""
    from ziren_tpu.executor.asm import O, imm, ri, halt_sequence, Instruction
    from ziren_tpu.executor.program import Program
    from ziren_tpu.executor.executor import Executor

    p = H._P256K1
    buf = (32).to_bytes(4, "big") + (7).to_bytes(32, "big") + p.to_bytes(32, "big")
    words = [int.from_bytes(buf[4 * i : 4 * i + 4], "little")
             for i in range(len(buf) // 4)]
    insns = [imm(O.ADD, 8, 0, 0x2000)]
    for i, w in enumerate(words):
        insns += [imm(O.SLL, 9, w >> 16, 16), ri(O.OR, 9, 9, w & 0xFFFF),
                  ri(O.SW, 9, 8, 4 * i)]
    insns += [
        imm(O.ADD, 2, 0, 0x02),  # WRITE
        imm(O.ADD, 4, 0, 8),  # fd 8 = FD_FP_INV
        imm(O.ADD, 5, 0, 0x2000),
        imm(O.ADD, 6, 0, len(buf)),  # A2 = nbytes
        Instruction(O.SYSCALL, 2, 4, 5, False, False),
        *halt_sequence(0),
    ]
    ex = Executor(Program.new(insns))
    ex.run()
    assert len(ex.input_stream) >= 1
    inv = int.from_bytes(ex.input_stream[-1], "big")
    assert (7 * inv) % p == 1
