"""Device (JAX) commit backend == host backend, bit for bit."""

import numpy as np
import pytest

from ziren_tpu.core import field as F
from ziren_tpu.core import merkle, ntt
from ziren_tpu.stark import backend


@pytest.fixture
def device_backend(monkeypatch):
    monkeypatch.setenv("ZIREN_DEVICE", "1")
    assert backend.backend_name() == "device"
    yield


def test_coset_lde_matches_host(device_backend):
    rng = np.random.default_rng(7)
    coeffs = rng.integers(0, F.P_INT, size=(512, 9), dtype=np.uint32)
    host = ntt.coset_eval(coeffs, 1, F.GENERATOR)
    dev = backend.coset_lde(coeffs, 1, F.GENERATOR)
    assert np.array_equal(host, dev)


def test_merkle_commit_matches_host(device_backend):
    rng = np.random.default_rng(8)
    mats = [
        rng.integers(0, F.P_INT, size=(1024, 5), dtype=np.uint32),
        rng.integers(0, F.P_INT, size=(1024, 3), dtype=np.uint32),
        rng.integers(0, F.P_INT, size=(512, 7), dtype=np.uint32),
        rng.integers(0, F.P_INT, size=(256, 11), dtype=np.uint32),
    ]
    host = merkle.commit(mats)
    dev = backend.merkle_commit(mats)
    assert np.array_equal(host.root, dev.root)
    assert len(host.levels) == len(dev.levels)
    for hl, dl in zip(host.levels, dev.levels):
        assert np.array_equal(hl, dl)


def test_prove_verify_device_backend(device_backend):
    """End-to-end MIPS proof with the device commit path."""
    from ziren_tpu.executor.asm import fibonacci_program
    from ziren_tpu.machine.mips import prove_program, verify_mips_proof

    program = fibonacci_program(20)
    machine, pk, vk, proof, ex = prove_program(program)
    assert verify_mips_proof(machine, vk, proof, pc_start=program.pc_start)
