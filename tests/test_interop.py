"""Reference-layout (bincode) proof serialization: byte round-trip, Monty
encoding, transcript-replayed sibling export (stark/interop.py)."""

import numpy as np

from ziren_tpu.stark.interop import (
    _monty,
    _unmonty,
    deserialize_shard_proof_reference,
    serialize_shard_proof_reference,
)


def test_monty_roundtrip():
    for v in [0, 1, 2130706432, 12345678]:
        assert _unmonty(_monty(v)) == v
    # monty form of 1 is R = 2^32 mod p (p3 MontyField31 serialization)
    assert _monty(1) == (1 << 32) % 2130706433


def test_shard_proof_reference_roundtrip():
    from test_stark_engine import FibonacciAir, Record, fib_pv
    from ziren_tpu.stark.config import dev_config
    from ziren_tpu.stark.machine import StarkMachine

    machine = StarkMachine(dev_config(), [FibonacciAir()], num_public_values=3)
    pk, vk = machine.setup()
    proof = machine.prove(pk, [Record(n=32, pv=fib_pv(32))])
    sp = proof.shard_proofs[0]

    blob = serialize_shard_proof_reference(machine, vk, sp)
    assert len(blob) > 1000
    back = deserialize_shard_proof_reference(machine, blob)
    assert back.chip_names == sp.chip_names
    assert [int(v) for v in back.public_values] == [
        int(v) for v in sp.public_values
    ]
    assert np.array_equal(
        np.asarray(back.commitment.main), np.asarray(sp.commitment.main)
    )
    for a, b in zip(back.opened_values, sp.opened_values):
        assert a.log_degree == b.log_degree
        assert np.array_equal(
            np.asarray(a.local_cumulative_sum),
            np.asarray(b.local_cumulative_sum),
        )
        assert np.array_equal(np.asarray(a.main.local), np.asarray(b.main.local))
    # decoded proofs re-serialize to the exact same bytes
    blob2 = serialize_shard_proof_reference(machine, vk, back)
    assert blob2 == blob


def test_mips_shard_proof_reference_roundtrip():
    from ziren_tpu.executor.asm import fibonacci_program
    from ziren_tpu.machine.mips import execute, mips_machine
    from ziren_tpu.stark.config import dev_config

    program = fibonacci_program(30)
    machine = mips_machine(dev_config())
    pk, vk = machine.setup(program)
    ex, record = execute(program)
    proof = machine.prove(pk, [record])
    sp = proof.shard_proofs[0]
    blob = serialize_shard_proof_reference(machine, vk, sp)
    back = deserialize_shard_proof_reference(machine, blob)
    assert back.chip_names == sp.chip_names
    assert serialize_shard_proof_reference(machine, vk, back) == blob


def test_picus_export_all_chips():
    """Every MIPS chip's AIR exports to a Picus constraint module with the
    symbolic constraint count (stark/picus.py; reference crates/picus)."""
    import tempfile

    from ziren_tpu.machine.mips import mips_machine
    from ziren_tpu.stark.picus import export_chip, export_machine

    machine = mips_machine()
    with tempfile.TemporaryDirectory() as d:
        paths = export_machine(machine, d)
        assert len(paths) == len(machine.chips)
    for chip in machine.chips:
        text = export_chip(chip, machine.num_public_values)
        n_asserts = text.count("(assert (= 0 ")
        # eval() constraints only: the engine-generated permutation
        # constraints are on top of these (chip.num_constraints includes
        # them, so the export count is a strict positive lower bound)
        assert 0 <= n_asserts <= chip.num_constraints  # lookup-only chips have 0
        assert text.count("(") == text.count(")")
        assert f"(begin-module {chip.name})" in text
        # every chip must carry determinism i/o annotations (reference
        # derive PicusAnnotations), and the exporter refuses bare chips
        assert chip.air.picus_inputs or chip.air.picus_outputs, chip.name
        assert "(picus-input " in text, chip.name


def test_picus_export_refuses_unannotated():
    import pytest

    from ziren_tpu.stark.chip import Air, Chip
    from ziren_tpu.stark.picus import export_chip

    class Bare(Air):
        name = "Bare"
        width = 1

        def eval(self, b):
            b.assert_bool(b.main_local[0])

    with pytest.raises(ValueError, match="picus_inputs"):
        export_chip(Chip(Bare()))
