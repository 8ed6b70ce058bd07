"""Intra-proof ICI sharding (stark/ici.py): one commit row-sharded over
the 8-device virtual mesh, bit-equal to the single-device tree."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from ziren_tpu.core import field as F
from ziren_tpu.core import merkle
from ziren_tpu.ops import jfield as jf
from ziren_tpu.stark.ici import commit_row_sharded, leaf_hash_row_sharded


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs a multi-device mesh")
    return Mesh(np.array(devs), ("row",))


def test_row_sharded_commit_matches_host(mesh):
    rng = np.random.default_rng(3)
    mat = rng.integers(0, F.P_INT, size=(256, 24), dtype=np.uint32)
    root, leaves = commit_row_sharded(jf.from_host(mat), mesh)
    host_tree = merkle.commit([mat])
    assert np.array_equal(jf.to_host(root), host_tree.root)
    assert np.array_equal(jf.to_host(leaves), host_tree.levels[0])


def test_row_sharded_commit_one_row_per_device(mesh):
    n_dev = mesh.devices.size
    rng = np.random.default_rng(4)
    mat = rng.integers(0, F.P_INT, size=(n_dev, 9), dtype=np.uint32)
    root, _ = commit_row_sharded(jf.from_host(mat), mesh)
    assert np.array_equal(jf.to_host(root), merkle.commit([mat]).root)


def test_row_sharded_leaf_hashes(mesh):
    from ziren_tpu.core import poseidon2 as p2

    rng = np.random.default_rng(5)
    mat = rng.integers(0, F.P_INT, size=(64, 40), dtype=np.uint32)
    leaves = leaf_hash_row_sharded(jf.from_host(mat), mesh)
    assert np.array_equal(jf.to_host(leaves), p2.hash_rows(mat))


def test_ntt_mesh_matches_host(mesh):
    """Four-step NTT with the transpose exchanged all-to-all over the mesh
    == the single-core host NTT, bit for bit."""
    from ziren_tpu.core import ntt
    from ziren_tpu.stark.ici import ntt_mesh

    rng = np.random.default_rng(6)
    for (n, w) in [(256, 5), (1024, 3)]:
        coeffs = rng.integers(0, F.P_INT, size=(n, w), dtype=np.uint32)
        got = jf.to_host(ntt_mesh(jf.from_host(coeffs), mesh))
        assert np.array_equal(got, ntt.ntt(coeffs)), (n, w)
