"""Device (JAX) PCS primitives == host PCS, bit for bit.

The device shard prover's end-to-end differential lives in
test_jprover.py; these cover the jpcs building blocks in isolation:
commit (LDE + batched Poseidon2 Merkle MMCS), domain-restricted
evaluations, and backend selection.
"""

import numpy as np
import pytest

from ziren_tpu.core import field as F
from ziren_tpu.core import merkle, ntt
from ziren_tpu.ops import jfield as jf
from ziren_tpu.ops import jpcs
from ziren_tpu.stark import backend
from ziren_tpu.stark.domain import natural_domain_for_degree


def _to_dev(mat):
    import jax.numpy as jnp

    return jf.mont_encode(jnp.asarray(np.ascontiguousarray(mat)))


def test_backend_selection(monkeypatch):
    monkeypatch.setenv("ZIREN_DEVICE", "1")
    assert backend.backend_name() == "device"
    monkeypatch.setenv("ZIREN_DEVICE", "0")
    assert backend.backend_name() == "host"


def test_jpcs_commit_matches_host():
    """Device commit (coeffs, LDEs, Merkle root/levels) equals the host
    TwoAdicFriPcs commit on a mixed-height batch."""
    rng = np.random.default_rng(8)
    heights = [(1024, 5), (1024, 3), (512, 7), (256, 11)]
    mats = [
        rng.integers(0, F.P_INT, size=hw, dtype=np.uint32) for hw in heights
    ]
    doms = [natural_domain_for_degree(m.shape[0]) for m in mats]

    # host oracle: interpolate -> coset LDE -> bit-reverse -> batch commit
    host_brs = []
    for dom, m in zip(doms, mats):
        c = ntt.intt(m)
        s_inv = pow(int(dom.shift), F.P_INT - 2, F.P_INT)
        c = F.fmul(c, F.powers(s_inv, c.shape[0])[:, None])
        lde = ntt.coset_eval(c, 1, F.GENERATOR)
        host_brs.append(lde[F.bit_reverse_indices(dom.log_n + 1)])
    host_tree = merkle.commit(host_brs)

    commit, data = jpcs.commit(
        [(d, _to_dev(m)) for d, m in zip(doms, mats)], 1
    )
    assert np.array_equal(jpcs.ext_from_mont_host(commit), host_tree.root)
    for hl, dl in zip(host_tree.levels, data.tree.levels):
        assert np.array_equal(hl, jpcs.ext_from_mont_host(dl))


def test_jpcs_evals_on_domain():
    """The committed LDE restricted to the quotient coset equals the host
    coset evaluation."""
    rng = np.random.default_rng(9)
    m = rng.integers(0, F.P_INT, size=(256, 4), dtype=np.uint32)
    dom = natural_domain_for_degree(256)
    commit, data = jpcs.commit([(dom, _to_dev(m))], 1)
    qdom = dom.create_disjoint_domain(512)
    dev = jpcs.ext_from_mont_host(jpcs.evals_on_domain(data, 0, qdom))
    c = ntt.intt(m)
    host = ntt.coset_eval(c, 1, F.GENERATOR)
    assert np.array_equal(dev, host)
