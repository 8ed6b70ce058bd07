import numpy as np

from ziren_tpu.core import field as F
from ziren_tpu.core.challenger import DuplexChallenger
from ziren_tpu.stark.domain import natural_domain_for_degree
from ziren_tpu.stark.pcs import FriConfig, TwoAdicFriPcs

rng = np.random.default_rng(1)


def rand_mat(n, w):
    return rng.integers(0, F.P_INT, size=(n, w), dtype=np.uint32)


def rand_ext():
    return rng.integers(0, F.P_INT, size=(4,), dtype=np.uint32)


def make_setup():
    pcs = TwoAdicFriPcs(FriConfig(log_blowup=1, num_queries=8, proof_of_work_bits=4))
    mats = [rand_mat(16, 3), rand_mat(8, 2), rand_mat(16, 1)]
    domains = [natural_domain_for_degree(m.shape[0]) for m in mats]
    commit, data = pcs.commit(list(zip(domains, mats)))
    zeta = rand_ext()
    points = [[zeta, d.next_point(zeta)] for d in domains]
    ch = DuplexChallenger()
    opened, proof = pcs.open([(data, points)], ch)
    return pcs, commit, domains, points, opened, proof


def test_pcs_roundtrip():
    pcs, commit, domains, points, opened, proof = make_setup()
    ch = DuplexChallenger()
    rounds = [
        (
            commit,
            [
                (d, list(zip(pts, vals)))
                for d, pts, vals in zip(domains, points, opened[0])
            ],
        )
    ]
    assert pcs.verify(rounds, proof, ch)


def test_pcs_rejects_tampered_opening():
    pcs, commit, domains, points, opened, proof = make_setup()
    opened[0][0][0] = opened[0][0][0].copy()
    opened[0][0][0][0, 0] ^= 1
    ch = DuplexChallenger()
    rounds = [
        (
            commit,
            [
                (d, list(zip(pts, vals)))
                for d, pts, vals in zip(domains, points, opened[0])
            ],
        )
    ]
    assert not pcs.verify(rounds, proof, ch)


def test_pcs_rejects_wrong_transcript():
    pcs, commit, domains, points, opened, proof = make_setup()
    ch = DuplexChallenger()
    ch.observe(123)  # desync the challenger
    rounds = [
        (
            commit,
            [
                (d, list(zip(pts, vals)))
                for d, pts, vals in zip(domains, points, opened[0])
            ],
        )
    ]
    assert not pcs.verify(rounds, proof, ch)
