"""Device (JAX) field/poseidon2 kernels vs host numpy reference."""

import numpy as np

from ziren_tpu.core import ext as E
from ziren_tpu.core import field as F
from ziren_tpu.core import poseidon2 as hp2
from ziren_tpu.ops import jfield as jf
from ziren_tpu.ops import jposeidon2 as jp2

rng = np.random.default_rng(7)


def rand_f(shape):
    return rng.integers(0, F.P_INT, size=shape, dtype=np.uint32)


def test_mont_roundtrip():
    x = rand_f(1000)
    assert np.all(jf.to_host(jf.from_host(x)) == x)


def test_mont_mul_matches_host():
    a, b = rand_f(500), rand_f(500)
    got = jf.to_host(jf.mont_mul(jf.from_host(a), jf.from_host(b)))
    assert np.all(got == F.fmul(a, b))


def test_mont_mul_edge_cases():
    a = np.array([0, 1, F.P_INT - 1, F.P_INT - 1, 0], dtype=np.uint32)
    b = np.array([0, F.P_INT - 1, F.P_INT - 1, 1, 12345], dtype=np.uint32)
    got = jf.to_host(jf.mont_mul(jf.from_host(a), jf.from_host(b)))
    assert np.all(got == F.fmul(a, b))


def test_add_sub_neg():
    a, b = rand_f(300), rand_f(300)
    am, bm = jf.from_host(a), jf.from_host(b)
    assert np.all(jf.to_host(jf.madd(am, bm)) == F.fadd(a, b))
    assert np.all(jf.to_host(jf.msub(am, bm)) == F.fsub(a, b))
    assert np.all(jf.to_host(jf.mneg(am)) == F.fneg(a))


def test_minv():
    a = rand_f(50)
    a[a == 0] = 1
    got = jf.to_host(jf.minv(jf.from_host(a)))
    assert np.all(got == F.finv(a))


def test_ext_ops_match_host():
    a, b = rand_f((40, 4)), rand_f((40, 4))
    am, bm = jf.from_host(a), jf.from_host(b)
    assert np.all(jf.to_host(jf.emul(am, bm)) == E.emul(a, b))
    assert np.all(jf.to_host(jf.einv(am)) == E.einv(a))


def test_jposeidon2_matches_host():
    states = rand_f((9, 16))
    got = jf.to_host(jp2.permute(jf.from_host(states)))
    assert np.all(got == hp2.permute(states))


def test_jhash_rows_matches_host():
    rows = rand_f((6, 19))
    got = jf.to_host(jp2.hash_rows(jf.from_host(rows)))
    assert np.all(got == hp2.hash_rows(rows))


def test_jcompress_matches_host():
    d = rand_f((8, 8))
    got = jf.to_host(jp2.compress_pairs(jf.from_host(d)))
    expect = np.stack(
        [hp2.compress(d[2 * i], d[2 * i + 1]) for i in range(4)], axis=0
    )
    assert np.all(got == expect)
