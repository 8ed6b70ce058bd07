"""Tests for the Poseidon2-KoalaBear-16 permutation, sponge, and challenger."""

import numpy as np

from ziren_tpu.core import field as F
from ziren_tpu.core import poseidon2 as p2
from ziren_tpu.core.challenger import DuplexChallenger

P = F.P_INT


def _external_matrix():
    """Build the explicit 16x16 external linear-layer matrix."""
    m = np.zeros((16, 16), dtype=object)
    for col in range(16):
        e = np.zeros(16, dtype=np.uint32)
        e[col] = 1
        m[:, col] = p2._external_linear_layer(e.astype(np.uint64)).astype(object)
    return m


def test_external_layer_is_linear_and_matches_m4_circulant():
    # The layer must be linear; check fast path == explicit matrix product.
    m = _external_matrix()
    rng = np.random.default_rng(1)
    x = rng.integers(0, P, size=16, dtype=np.uint32)
    expect = (m @ x.astype(object)) % P
    got = p2._external_linear_layer(x.astype(np.uint64)).astype(object)
    assert np.all(expect == got)
    # Structure check: 4x4 blocks; diagonal blocks are 2*M4, off-diagonal M4
    # with M4 = [[2,3,1,1],[1,2,3,1],[1,1,2,3],[3,1,1,2]].
    m4 = np.array([[2, 3, 1, 1], [1, 2, 3, 1], [1, 1, 2, 3], [3, 1, 1, 2]], dtype=object)
    for bi in range(4):
        for bj in range(4):
            block = m[bi * 4 : bi * 4 + 4, bj * 4 : bj * 4 + 4]
            expect_block = (2 * m4 if bi == bj else m4) % P
            assert np.all(block == expect_block), (bi, bj)


def test_permute_vectorized_matches_scalar():
    rng = np.random.default_rng(2)
    states = rng.integers(0, P, size=(7, 16), dtype=np.uint32)
    batch = p2.permute(states)
    for i in range(7):
        assert np.all(p2.permute(states[i]) == batch[i])


def test_permute_changes_state_and_is_injective_on_samples():
    rng = np.random.default_rng(3)
    states = rng.integers(0, P, size=(64, 16), dtype=np.uint32)
    out = p2.permute(states)
    assert not np.any(np.all(out == states, axis=1))
    assert len({tuple(row) for row in out}) == 64


def test_hash_iter_matches_hash_rows():
    rng = np.random.default_rng(4)
    rows = rng.integers(0, P, size=(5, 21), dtype=np.uint32)
    batch = p2.hash_rows(rows)
    for i in range(5):
        assert np.all(p2.hash_iter(rows[i]) == batch[i])


def test_sponge_partial_block_overwrite_semantics():
    # PaddingFreeSponge overwrites only provided elements in the last chunk:
    # hash([a]*9) permutes once with 8 elems, then overwrites state[0] only.
    x = np.arange(1, 10, dtype=np.uint32)
    state = np.zeros(16, dtype=np.uint32)
    state[:8] = x[:8]
    state = p2.permute(state)
    state[0] = x[8]
    expect = p2.permute(state)[:8]
    assert np.all(p2.hash_iter(x) == expect)


def test_compress():
    l = np.arange(8, dtype=np.uint32)
    r = np.arange(8, 16, dtype=np.uint32)
    state = np.arange(16, dtype=np.uint32)
    assert np.all(p2.compress(l, r) == p2.permute(state)[:8])


def test_challenger_determinism_and_duplex_rules():
    c1 = DuplexChallenger()
    c1.observe_slice(np.arange(10, dtype=np.uint32))
    s1 = [c1.sample() for _ in range(3)]
    c2 = DuplexChallenger()
    c2.observe_slice(np.arange(10, dtype=np.uint32))
    s2 = [c2.sample() for _ in range(3)]
    assert s1 == s2
    # sample order: first sample after duplex = state[7]
    c3 = DuplexChallenger()
    c3.observe(5)
    st = np.zeros(16, dtype=np.uint32)
    st[0] = 5
    out = p2.permute(st)
    assert c3.sample() == int(out[7])
    assert c3.sample() == int(out[6])


def test_challenger_observe_clears_output():
    c = DuplexChallenger()
    c.observe(1)
    a = c.sample()
    c.observe(2)  # clears output buffer; next sample re-duplexes
    b = c.sample()
    assert a != b  # overwhelmingly likely


def test_grind_matches_check_witness():
    c = DuplexChallenger()
    c.observe_slice(np.arange(5, dtype=np.uint32))
    probe = c.clone()
    w = c.grind(10)
    # smallest witness: verify no smaller one passes
    for cand in range(w):
        assert not probe.clone().check_witness(10, cand)
    assert probe.clone().check_witness(10, w)


def test_pallas_sponge_interpret_bit_exact():
    """The Pallas sponge kernel (blocked transposed-state layout) equals
    the host PaddingFreeSponge bit for bit — interpret mode on CPU."""
    import numpy as np

    from ziren_tpu.core import poseidon2 as p2
    from ziren_tpu.ops import jfield as jf
    from ziren_tpu.ops import jposeidon2 as jp2

    rng = np.random.default_rng(0)
    for (n, w) in [(1024, 32), (1024, 23), (2048, 83), (1024, 2), (1024, 8)]:
        rows = rng.integers(0, 2130706433, (n, w), dtype=np.uint32)
        got = jf.to_host(jp2.hash_rows_pallas(jf.from_host(rows), "interpret"))
        assert np.array_equal(got, p2.hash_rows(rows)), (n, w)
