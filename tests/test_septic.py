import numpy as np

from ziren_tpu.core import field as F
from ziren_tpu.core import septic as S

rng = np.random.default_rng(7)


def rand():
    return rng.integers(0, F.P_INT, size=(7,), dtype=np.uint32)


def test_mul_commutative_associative():
    a, b, c = rand(), rand(), rand()
    assert np.array_equal(S.smul(a, b), S.smul(b, a))
    assert np.array_equal(S.smul(S.smul(a, b), c), S.smul(a, S.smul(b, c)))


def test_reduction_z7():
    # z * z^6 = z^7 = -2z + 8
    z = S.szero(); z[1] = 1
    z6 = S.szero(); z6[6] = 1
    got = S.smul(z, z6)
    want = S.szero()
    want[0] = 8
    want[1] = F.P_INT - 2
    assert np.array_equal(got, want)


def test_frobenius_is_pth_power():
    a = rand()
    assert np.array_equal(S.frobenius(a, 1), S.spow(a, F.P_INT))


def test_inverse():
    a = rand()
    assert np.array_equal(S.smul(a, S.sinv(a)), S.sone())


def test_reference_points_on_curve():
    assert S.curve_is_on(S.CURVE_WITNESS_DUMMY_POINT_X, S.CURVE_WITNESS_DUMMY_POINT_Y)
    assert S.curve_is_on(S.CURVE_CUMULATIVE_SUM_START_X, S.CURVE_CUMULATIVE_SUM_START_Y)
    assert S.curve_is_on(S.DIGEST_SUM_START_X, S.DIGEST_SUM_START_Y)


def test_curve_group_laws():
    p1 = (S.CURVE_WITNESS_DUMMY_POINT_X, S.CURVE_WITNESS_DUMMY_POINT_Y)
    p2 = (S.CURVE_CUMULATIVE_SUM_START_X, S.CURVE_CUMULATIVE_SUM_START_Y)
    p3 = (S.DIGEST_SUM_START_X, S.DIGEST_SUM_START_Y)
    s12 = S.curve_add(p1, p2)
    assert S.curve_is_on(*s12)
    # associativity
    lhs = S.curve_add(S.curve_add(p1, p2), p3)
    rhs = S.curve_add(p1, S.curve_add(p2, p3))
    assert np.array_equal(lhs[0], rhs[0]) and np.array_equal(lhs[1], rhs[1])
    # doubling stays on curve
    d = S.curve_double(p1)
    assert S.curve_is_on(*d)
    # commutativity
    s21 = S.curve_add(p2, p1)
    assert np.array_equal(s12[0], s21[0])
