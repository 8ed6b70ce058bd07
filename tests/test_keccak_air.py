"""Keccak-f[1600] permutation AIR: oracle match, prove/verify, tampering."""

import numpy as np
import pytest

from ziren_tpu.executor.keccak import keccakf
from ziren_tpu.machine.keccak_air import COLS, KeccakPermAir
from ziren_tpu.stark.config import dev_config
from ziren_tpu.stark.machine import StarkMachine
from ziren_tpu.stark.verifier import VerificationError


class Rec:
    def __init__(self, states):
        self.states = states
        self.public_values = []


def _states(n, seed=0):
    rng = np.random.default_rng(seed)
    return [
        [int(x) for x in rng.integers(0, 1 << 64, 25, dtype=np.uint64)]
        for _ in range(n)
    ]


def test_trace_matches_keccakf():
    states = _states(2)
    tr = KeccakPermAir().generate_trace(Rec(states), None)
    for p, st in enumerate(states):
        out_bits = tr[24 * p + 23, COLS.slc("aout")]
        expect = keccakf(st)
        for l in range(25):
            v = sum(int(out_bits[64 * l + z]) << z for z in range(64))
            assert v == expect[l]


def test_prove_verify():
    machine = StarkMachine(dev_config(), [KeccakPermAir()], num_public_values=0)
    pk, vk = machine.setup()
    proof = machine.prove(pk, [Rec(_states(2, seed=1))])
    assert machine.verify(vk, proof)


def test_tampered_trace_rejected():
    class Bad(KeccakPermAir):
        def generate_trace(self, record, output):
            tr = super().generate_trace(record, output)
            tr[7, COLS.slc("aout").start + 123] ^= 1
            return tr

    machine = StarkMachine(dev_config(), [Bad()], num_public_values=0)
    pk, vk = machine.setup()
    with pytest.raises((VerificationError, AssertionError)):
        proof = machine.prove(pk, [Rec(_states(1, seed=2))])
        machine.verify(vk, proof)
