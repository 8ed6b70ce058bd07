"""Tests for KoalaBear base/extension field arithmetic (host numpy path)."""

import numpy as np

from ziren_tpu.core import ext as E
from ziren_tpu.core import field as F

rng = np.random.default_rng(0)


def rand_f(n):
    return rng.integers(0, F.P_INT, size=n, dtype=np.uint32)


def rand_e(n):
    return rng.integers(0, F.P_INT, size=(n, 4), dtype=np.uint32)


def test_add_sub_roundtrip():
    a, b = rand_f(1000), rand_f(1000)
    assert np.all(F.fsub(F.fadd(a, b), b) == a)
    assert np.all(F.fadd(F.fsub(a, b), b) == a)


def test_mul_matches_python():
    a, b = rand_f(200), rand_f(200)
    expect = (a.astype(object) * b.astype(object)) % F.P_INT
    assert np.all(F.fmul(a, b).astype(object) == expect)


def test_inv():
    a = rand_f(100)
    a[a == 0] = 1
    assert np.all(F.fmul(a, F.finv(a)) == 1)


def test_neg():
    a = rand_f(100)
    assert np.all(F.fadd(a, F.fneg(a)) == 0)


def test_two_adic_generators():
    g24 = F.two_adic_generator(24)
    assert g24 == 0x6AC49F88  # Plonky3 KoalaBear table value
    assert F.two_adic_generator(1) == F.P_INT - 1
    assert F.two_adic_generator(0) == 1
    for k in (1, 5, 24):
        g = F.two_adic_generator(k)
        assert pow(g, 1 << k, F.P_INT) == 1
        assert pow(g, 1 << (k - 1), F.P_INT) != 1


def test_ext_mul_commutative_assoc():
    a, b, c = rand_e(50), rand_e(50), rand_e(50)
    assert np.all(E.emul(a, b) == E.emul(b, a))
    assert np.all(E.emul(E.emul(a, b), c) == E.emul(a, E.emul(b, c)))


def test_ext_mul_against_naive():
    # naive polynomial multiplication mod (x^4 - 3)
    a, b = rand_e(20), rand_e(20)
    prod = np.zeros((20, 7), dtype=object)
    for i in range(4):
        for j in range(4):
            prod[:, i + j] += a[:, i].astype(object) * b[:, j].astype(object)
    red = np.zeros((20, 4), dtype=object)
    for k in range(4):
        red[:, k] = prod[:, k]
    for k in range(4, 7):
        red[:, k - 4] += 3 * prod[:, k]
    red %= F.P_INT
    assert np.all(E.emul(a, b).astype(object) == red)


def test_ext_inv():
    a = rand_e(50)
    one = np.zeros((50, 4), dtype=np.uint32)
    one[:, 0] = 1
    assert np.all(E.emul(a, E.einv(a)) == one)


def test_ext_frobenius_is_pth_power():
    a = rand_e(5)
    for i in range(5):
        assert np.all(E.frobenius(a[i], 1) == E.epow(a[i], F.P_INT))


def test_bit_reverse():
    idx = F.bit_reverse_indices(3)
    assert list(idx) == [0, 4, 2, 6, 1, 5, 3, 7]
    assert F.reverse_bits_len(0b011, 3) == 0b110
