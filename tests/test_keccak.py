"""KECCAK_SPONGE precompile: permutation vectors, executor semantics,
native parity. (The keccak AIR chip is round-2 work — see ROADMAP.md — so
coverage here is executor-level.)"""

import numpy as np
import pytest

from ziren_tpu.executor import Executor
from ziren_tpu.executor.asm import keccak_program
from ziren_tpu.executor.keccak import keccakf


def test_keccakf_vector():
    s = keccakf([0] * 25)
    assert s[0] == 0xF1258F7940E1DDE7
    assert s[1] == 0x84D5CCF933C0478A


def _keccak256(data: bytes) -> bytes:
    rate = 136
    padded = bytearray(data)
    padded += b"\x00" * (rate - (len(padded) % rate))
    padded[len(data)] = 0x01
    padded[-1] |= 0x80
    st = [0] * 25
    for off in range(0, len(padded), rate):
        for i in range(17):
            st[i] ^= int.from_bytes(padded[off + 8 * i : off + 8 * i + 8], "little")
        st = keccakf(st)
    return b"".join(st[i].to_bytes(8, "little") for i in range(4))


def test_keccak256_empty_vector():
    assert _keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )


@pytest.mark.parametrize("data", [b"", b"hello world", bytes(range(200))])
def test_executor_sponge(data):
    prog = keccak_program(data)
    ex = Executor(prog)
    rec = ex.run()
    digest = _keccak256(data)
    assert ex.peek_register(20) == int.from_bytes(digest[0:4], "little")
    assert ex.peek_register(21) == int.from_bytes(digest[28:32], "little")
    evs = rec.precompile_events[0x01010009]
    assert len(evs) == 1
    assert len(evs[0]["writes"]) == 16
    assert len(evs[0]["reads"]) == evs[0]["len_read"][1]


def test_native_parity():
    try:
        from ziren_tpu.executor.native import NativeExecutor
    except Exception:
        pytest.skip("native executor unavailable")
    for data in [b"", b"abc", bytes(range(256)) + b"x" * 44]:
        prog = keccak_program(data)
        pr = Executor(prog).run()
        nr = NativeExecutor(prog).run()
        assert pr.precompile_events[0x01010009] == nr.precompile_events[0x01010009]
        pf, nf = pr.freeze(), nr.freeze()
        for k in pf:
            assert np.array_equal(pf[k], nf[k]), k


@pytest.mark.parametrize("data", [b"hello world", bytes(range(200))])
def test_sponge_chip_constraints(data):
    from ziren_tpu.machine.debug import debug_constraints, debug_lookups
    from ziren_tpu.machine.mips import mips_machine

    prog = keccak_program(data)
    machine = mips_machine()
    pk, vk = machine.setup(prog, extra_observations=[prog.pc_start])
    record = Executor(prog).run()
    imbalance, origin = debug_lookups(machine, pk, record)
    assert not imbalance, origin
    assert debug_constraints(machine, pk, record)


def test_prove_verify():
    from ziren_tpu.machine.mips import prove_program, verify_mips_proof

    prog = keccak_program(b"hello world")
    machine, pk, vk, proof, ex = prove_program(prog)
    assert "KeccakSponge" in proof.shard_proofs[0].chip_names
    assert verify_mips_proof(machine, vk, proof, pc_start=prog.pc_start)
