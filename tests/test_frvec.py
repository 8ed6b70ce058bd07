"""FrVec native Fr vector kernels vs pure-python (snark/frvec.py vs the
int-list formulas in snark/groth16.py / snark/plonk.py)."""

import random

import pytest

from ziren_tpu.snark.frvec import FrVec, R, available
from ziren_tpu.snark.groth16 import _batch_inv, _ntt

rng = random.Random(0xF12F)


def _rand(n, allow_zero=False):
    lo = 0 if allow_zero else 1
    return [rng.randrange(lo, R) for _ in range(n)]


def test_roundtrip():
    xs = _rand(100) + [0, 1, R - 1]
    assert FrVec.from_ints(xs).to_ints() == [x % R for x in xs]


def test_elementwise():
    n = 5000
    xs, ys = _rand(n), _rand(n)
    a, b = FrVec.from_ints(xs), FrVec.from_ints(ys)
    assert (a + b).to_ints() == [(x + y) % R for x, y in zip(xs, ys)]
    assert (a - b).to_ints() == [(x - y) % R for x, y in zip(xs, ys)]
    assert (a * b).to_ints() == [x * y % R for x, y in zip(xs, ys)]
    s = rng.randrange(R)
    assert a.scale(s).to_ints() == [x * s % R for x in xs]


def test_axpy():
    n = 300
    xs, cs = _rand(n), _rand(n - 10)
    s = rng.randrange(R)
    v = FrVec.from_ints(xs)
    v.axpy_(s, FrVec.from_ints(cs))
    want = list(xs)
    for k, c in enumerate(cs):
        want[k] = (want[k] + s * c) % R
    assert v.to_ints() == want


def test_powers():
    base, start = rng.randrange(R), rng.randrange(R)
    got = FrVec.powers(base, 6000, start).to_ints()
    cur = start
    for g in got:
        assert g == cur
        cur = cur * base % R


def test_horner_and_div_linear():
    cs = _rand(257)
    x = rng.randrange(R)
    v = FrVec.from_ints(cs)
    acc = 0
    for c in reversed(cs):
        acc = (acc * x + c) % R
    assert v.horner(x) == acc
    q = v.div_linear(x)
    # (X - x) * q + p(x) == p
    qi = q.to_ints()
    rebuilt = [0] * len(cs)
    rebuilt[0] = (acc - x * qi[0]) % R
    for k in range(1, len(cs) - 1):
        rebuilt[k] = (qi[k - 1] - x * qi[k]) % R
    rebuilt[-1] = qi[-1]
    assert rebuilt == cs


def test_batch_inv_with_zeros():
    xs = _rand(5000, allow_zero=True)
    xs[7] = 0
    xs[4999] = 0
    got = FrVec.batch_inv(FrVec.from_ints(xs)).to_ints()
    assert got == _batch_inv(xs) if 0 not in xs else True
    for x, g in zip(xs, got):
        assert g == (pow(x, R - 2, R) if x else 0)


@pytest.mark.parametrize("n", [8, 2048])
def test_ntt_matches_host(n):
    xs = _rand(n)
    v = FrVec.from_ints(xs)
    assert v.ntt().to_ints() == _ntt(xs)
    assert v.ntt(invert=True).to_ints() == _ntt(xs, invert=True)
    assert v.ntt().ntt(invert=True).to_ints() == xs


def test_available():
    # native must be present in this environment (g++ is baked in)
    assert available()
