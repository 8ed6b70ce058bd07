"""End-to-end engine tests with tiny hand-rolled AIRs
(reference pattern: crates/stark/src/stark_testing.rs)."""

import numpy as np
import pytest

from ziren_tpu.core import field as F
from ziren_tpu.stark.chip import Air
from ziren_tpu.stark.config import dev_config
from ziren_tpu.stark.lookup import LookupKind
from ziren_tpu.stark.machine import StarkMachine
from ziren_tpu.stark.verifier import VerificationError


class FibonacciAir(Air):
    name = "Fibonacci"
    width = 2

    def eval(self, b):
        a_l, b_l = b.main_local
        a_n, b_n = b.main_next
        b.when_first_row().assert_eq(a_l, b.public_values[0])
        b.when_first_row().assert_eq(b_l, b.public_values[1])
        b.when_transition().assert_eq(a_n, b_l)
        b.when_transition().assert_eq(b_n, a_l + b_l)
        b.when_last_row().assert_eq(b_l, b.public_values[2])

    def generate_trace(self, record, output):
        n = record.n
        tr = np.zeros((n, 2), dtype=np.uint32)
        a, b = 0, 1
        for i in range(n):
            tr[i] = (a, b)
            a, b = b, (a + b) % F.P_INT
        return tr


class SenderAir(Air):
    """Sends each value to the lookup table with multiplicity 1."""

    name = "Sender"
    width = 1

    def eval(self, b):
        (v,) = b.main_local
        b.send(LookupKind.Byte, [v], 1)

    def generate_trace(self, record, output):
        return np.asarray(record.sent, dtype=np.uint32).reshape(-1, 1)


class TableAir(Air):
    """Receives values with a multiplicity column."""

    name = "Table"
    width = 2

    def eval(self, b):
        v, mult = b.main_local
        b.receive(LookupKind.Byte, [v], mult)

    def generate_trace(self, record, output):
        vals = np.arange(len(record.mults), dtype=np.uint32)
        return np.stack([vals, np.asarray(record.mults, np.uint32)], axis=1)


class Record:
    def __init__(self, n=8, sent=None, mults=None, pv=None):
        self.n = n
        self.sent = sent
        self.mults = mults
        self.public_values = pv or []


def fib_pv(n):
    a, b = 0, 1
    for _ in range(n - 1):
        a, b = b, (a + b) % F.P_INT
    return [0, 1, b]


def test_fibonacci_prove_verify():
    machine = StarkMachine(dev_config(), [FibonacciAir()], num_public_values=3)
    pk, vk = machine.setup()
    rec = Record(n=16, pv=fib_pv(16))
    proof = machine.prove(pk, [rec])
    assert machine.verify(vk, proof)


def test_fibonacci_rejects_wrong_public_values():
    machine = StarkMachine(dev_config(), [FibonacciAir()], num_public_values=3)
    pk, vk = machine.setup()
    rec = Record(n=16, pv=fib_pv(16))
    proof = machine.prove(pk, [rec])
    proof.shard_proofs[0].public_values[2] = 1234
    with pytest.raises(VerificationError):
        machine.verify(vk, proof)


def test_fibonacci_rejects_tampered_opened_value():
    machine = StarkMachine(dev_config(), [FibonacciAir()], num_public_values=3)
    pk, vk = machine.setup()
    rec = Record(n=16, pv=fib_pv(16))
    proof = machine.prove(pk, [rec])
    ov = proof.shard_proofs[0].opened_values[0]
    ov.main.local[0] = (ov.main.local[0] + 1) % F.P_INT
    with pytest.raises(VerificationError):
        machine.verify(vk, proof)


def test_rejects_duplicate_chip_instances():
    """A proof minting a second instance of a chip (e.g. a rogue extra
    MemoryInit) must be rejected before any crypto work (ADVICE r1)."""
    import copy

    machine = StarkMachine(dev_config(), [FibonacciAir()], num_public_values=3)
    pk, vk = machine.setup()
    rec = Record(n=16, pv=fib_pv(16))
    proof = machine.prove(pk, [rec])
    sp = proof.shard_proofs[0]
    sp.chip_names.append(sp.chip_names[0])
    sp.opened_values.append(copy.deepcopy(sp.opened_values[0]))
    with pytest.raises(VerificationError, match="duplicate"):
        machine.verify(vk, proof)


def test_rejects_unknown_chip_and_bad_log_degree():
    machine = StarkMachine(dev_config(), [FibonacciAir()], num_public_values=3)
    pk, vk = machine.setup()
    rec = Record(n=16, pv=fib_pv(16))
    proof = machine.prove(pk, [rec])
    sp = proof.shard_proofs[0]
    orig = sp.chip_names[0]
    sp.chip_names[0] = "NoSuchChip"
    with pytest.raises(VerificationError, match="unknown"):
        machine.verify(vk, proof)
    sp.chip_names[0] = orig
    sp.opened_values[0].log_degree = 40
    with pytest.raises(VerificationError, match="log_degree"):
        machine.verify(vk, proof)


def test_logup_cross_chip():
    machine = StarkMachine(dev_config(), [SenderAir(), TableAir()])
    pk, vk = machine.setup()
    sent = [3, 1, 3, 7, 0, 1, 1, 3, 3, 7, 5, 5, 2, 2, 2, 2]
    mults = [0] * 8
    for v in sent:
        mults[v] += 1
    rec = Record(sent=sent, mults=mults)
    proof = machine.prove(pk, [rec])
    assert machine.verify(vk, proof)


def test_logup_unbalanced_rejected():
    machine = StarkMachine(dev_config(), [SenderAir(), TableAir()])
    pk, vk = machine.setup()
    sent = [3, 1, 3, 7, 0, 1, 1, 3, 3, 7, 5, 5, 2, 2, 2, 2]
    mults = [0] * 8
    for v in sent:
        mults[v] += 1
    mults[3] -= 1  # unbalance the multiset
    rec = Record(sent=sent, mults=mults)
    with pytest.raises((VerificationError, AssertionError)):
        proof = machine.prove(pk, [rec])
        machine.verify(vk, proof)
