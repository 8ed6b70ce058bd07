import numpy as np

from ziren_tpu.core import ext as E
from ziren_tpu.core import field as F
from ziren_tpu.core import merkle, ntt

rng = np.random.default_rng(0)


def rand_mat(n, w):
    return rng.integers(0, F.P_INT, size=(n, w), dtype=np.uint32)


def naive_dft(c):
    n = len(c)
    w = F.two_adic_generator(n.bit_length() - 1)
    return np.array(
        [sum(int(c[j]) * pow(w, i * j, F.P_INT) for j in range(n)) % F.P_INT for i in range(n)],
        dtype=np.uint32,
    )


def test_ntt_matches_naive():
    c = rand_mat(16, 1)[:, 0]
    assert np.array_equal(ntt.ntt(c), naive_dft(c))


def test_ntt_intt_roundtrip():
    m = rand_mat(64, 5)
    assert np.array_equal(ntt.intt(ntt.ntt(m)), m)


def test_coset_lde_consistent():
    n, shift = 8, 3
    c = rand_mat(n, 2)
    evals = ntt.ntt(c)
    lde = ntt.coset_lde(evals, 1, shift)
    w = F.two_adic_generator(4)
    for i in range(2 * n):
        x = (shift * pow(w, i, F.P_INT)) % F.P_INT
        for col in range(2):
            want = sum(int(c[j, col]) * pow(x, j, F.P_INT) for j in range(n)) % F.P_INT
            assert lde[i, col] == want


def test_eval_at_ext_point():
    n = 32
    c = rand_mat(n, 3)
    z = np.array([5, 7, 11, 13], dtype=np.uint32)
    got = ntt.eval_at_ext_point(c, z)
    # Horner in the extension
    acc = E.ezero((3,))
    for j in reversed(range(n)):
        acc = E.eadd(E.emul(acc, np.broadcast_to(z, (3, 4))), E.from_base(c[j]))
    assert np.array_equal(got, acc)


def test_vanishing_poly():
    log_n, shift = 3, 3
    w = F.two_adic_generator(log_n)
    # vanishes on the coset
    x = E.from_base(np.uint32((shift * pow(w, 5, F.P_INT)) % F.P_INT))
    assert np.array_equal(ntt.vanishing_poly_at(log_n, shift, x), E.ezero())
    # nonzero off the coset
    z = np.array([5, 7, 11, 13], dtype=np.uint32)
    assert not np.array_equal(ntt.vanishing_poly_at(log_n, shift, z), E.ezero())


def test_merkle_commit_open_verify():
    mats = [rand_mat(8, 3), rand_mat(2, 2), rand_mat(8, 1), rand_mat(4, 5)]
    dims = [(m.shape[0], m.shape[1]) for m in mats]
    tree = merkle.commit(mats)
    for idx in range(8):
        rows, path = merkle.open_at(tree, idx)
        assert merkle.verify_opening(tree.root, dims, idx, rows, path)
    # tamper with a row
    rows, path = merkle.open_at(tree, 3)
    rows[0][0] ^= 1
    assert not merkle.verify_opening(tree.root, dims, 3, rows, path)
    # wrong index
    rows, path = merkle.open_at(tree, 3)
    assert not merkle.verify_opening(tree.root, dims, 2, rows, path)


def test_merkle_single_matrix():
    m = rand_mat(16, 4)
    tree = merkle.commit([m])
    rows, path = merkle.open_at(tree, 9)
    assert merkle.verify_opening(tree.root, [(16, 4)], 9, rows, path)
