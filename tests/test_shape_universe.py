"""Fixed shape universe: cluster-shape padding, phantom lift-vk
enumeration, and registry-root stability across shard counts
(reference shape/mod.rs CoreShapeConfig + prover/src/shapes.rs
build_vk_map)."""

import pytest as _pytest

pytestmark = _pytest.mark.slow

import numpy as np

from ziren_tpu.executor.asm import fibonacci_program
from ziren_tpu.machine.mips import prove_program, verify_mips_proof
from ziren_tpu.recursion.mips_pipeline import compress, lift_shard, verify_compressed
from ziren_tpu.recursion.shape_universe import (
    build_canonical_registry,
    cluster_shapes,
    fix_records_to_clusters,
    phantom_lift_vk,
)


def test_phantom_lift_vk_matches_real():
    """A phantom (no real proof) lift setup must yield the exact recursion
    vk a real same-shape lift does — what makes offline enumeration sound."""
    program = fibonacci_program(120)
    machine, pk, vk, proof, _ = prove_program(program, shard_size=128)
    sp = proof.shard_proofs[0]
    shape = tuple(
        (n, v.log_degree) for n, v in zip(sp.chip_names, sp.opened_values)
    )
    _rm, rvk_real, _ = lift_shard(machine, vk, sp, setup_only=True)
    import ziren_tpu.recursion.pipeline as pl

    pl._SHAPE_CACHE.clear()
    _rm, rvk_ph = phantom_lift_vk(machine, vk, shape)
    assert np.array_equal(rvk_real.commit, rvk_ph.commit)


def test_cluster_root_stable_across_shard_counts():
    """Same guest + shard size, different input sizes (hence shard counts
    AND last-shard remainders) -> the same canonical registry root."""
    from ziren_tpu.executor import Executor
    from ziren_tpu.machine.mips import mips_machine

    machine = mips_machine()
    program = fibonacci_program(200)
    pk, vk = machine.setup(program, extra_observations=[program.pc_start])

    roots = []
    shapes_seen = []
    for n in (200, 500):
        prog = fibonacci_program(n)
        ex = Executor(prog, shard_size=128)
        records = ex.run_sharded()
        shapes = cluster_shapes(machine, records)
        shapes_seen.append(shapes)
        reg = build_canonical_registry(machine, vk, shapes)
        roots.append([int(v) for v in reg.root])
    assert shapes_seen[0] == shapes_seen[1], (
        "cluster shapes drifted between runs of the same guest"
    )
    assert roots[0] == roots[1], "registry root not shard-count invariant"


def test_canonical_compress_pins_root():
    """Core shards padded to clusters, registry enumerated from phantom
    lifts BEFORE proving, compress under it, root pinned at verification."""
    from ziren_tpu.executor import Executor
    from ziren_tpu.machine.mips import mips_machine
    from ziren_tpu.stark.verifier import VerificationError

    import pytest

    machine = mips_machine()
    program = fibonacci_program(150)
    pk, vk = machine.setup(program, extra_observations=[program.pc_start])
    ex = Executor(program, shard_size=128)
    records = ex.run_sharded()
    shapes = fix_records_to_clusters(machine, records)
    registry = build_canonical_registry(machine, vk, shapes)
    proof = machine.prove(pk, records)
    assert verify_mips_proof(machine, vk, proof, pc_start=program.pc_start)
    rm, rvk, final = compress(machine, vk, proof, registry=registry)
    root = [int(v) for v in registry.root]
    verify_compressed(machine, vk, rm, rvk, final, vk_root=root)
    with pytest.raises(VerificationError):
        verify_compressed(machine, vk, rm, rvk, final,
                          vk_root=[r ^ 1 for r in root])
