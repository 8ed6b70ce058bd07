"""Device NTT vs host oracle (runs on the CPU backend via conftest)."""

import numpy as np

from ziren_tpu.core import field as F
from ziren_tpu.core import ntt as hntt
from ziren_tpu.ops import jntt

rng = np.random.default_rng(3)


def test_device_ntt_matches_host():
    m = rng.integers(0, F.P_INT, size=(64, 3), dtype=np.uint32)
    assert np.array_equal(jntt.ntt_device(m), hntt.ntt(m))


def test_device_intt_roundtrip():
    m = rng.integers(0, F.P_INT, size=(32, 2), dtype=np.uint32)
    assert np.array_equal(jntt.intt_device(hntt.ntt(m)), m)


def test_device_coset_lde_matches_host():
    m = rng.integers(0, F.P_INT, size=(16, 2), dtype=np.uint32)
    got = jntt.coset_lde_device(m, 1, F.GENERATOR)
    want = hntt.coset_lde(m, 1, F.GENERATOR)
    assert np.array_equal(got, want)
