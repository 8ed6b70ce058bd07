"""Guest ABI contract tests (ziren_tpu/guest vs the executor).

The ABI (fd map, hint framing, commit layout — reference
crates/zkvm/entrypoint/src/lib.rs:58-120, crates/primitives/src/consts.rs,
crates/zkvm/lib/src/io.rs) is validated two ways: a hand-assembled MIPS
guest drives the hint syscalls against host buffers framed by guest.abi,
and the vendored reference ELF's committed digest is recomputed from the
commit-layout rule."""

import os

import pytest

from ziren_tpu.executor import Executor
from ziren_tpu.executor.asm import NOP, halt_sequence, imm, ri, rr
from ziren_tpu.executor.instruction import Instruction
from ziren_tpu.executor.opcode import Opcode as O
from ziren_tpu.executor.program import Program, load_elf
from ziren_tpu.guest import abi
from ziren_tpu.guest.build import (
    GuestBuildError,
    build_program,
    find_toolchain,
    include_elf,
)

REF_ELF = "/root/reference/crates/prover/elf/mipsel-zkm-zkvm-elf"


def _syscall(code, a0=0, a1=0):
    """v0 = code; a0/a1 preset by caller registers 4/5."""
    return [
        imm(O.ADD, 2, 0, code),
        Instruction(O.SYSCALL, 2, 4, 5, False, False),
    ]


def _hint_reader_program(base=0x1000):
    """Guest: len = SYSHINTLEN(); SYSHINTREAD(base, len); commit the first
    word and the length."""
    insns = [
        # v0 = SYSHINTLEN; result in v0 (register 2)
        imm(O.ADD, 4, 0, 0),
        imm(O.ADD, 5, 0, 0),
        *_syscall(0xF0),
        ri(O.ADD, 8, 2, 0),  # t0 = len
        # SYSHINTREAD(a0=base, a1=len)
        imm(O.ADD, 4, 0, base),
        ri(O.ADD, 5, 8, 0),
        *_syscall(0xF1),
        # load the first hint word
        imm(O.LW, 9, 0, base),
        # commit word 0 = loaded word
        imm(O.ADD, 4, 0, 0),
        ri(O.ADD, 5, 9, 0),
        *_syscall(0x10),
        # commit word 1 = hint length
        imm(O.ADD, 4, 0, 1),
        ri(O.ADD, 5, 8, 0),
        *_syscall(0x10),
        *halt_sequence(0),
    ]
    return Program.new(insns)


def test_hint_stream_framing():
    """One host buffer == one guest read, FIFO, word-aligned writes."""
    payload = (0xDEADBEEF).to_bytes(4, "little") + b"xyz"  # len 7 -> cap 8
    assert abi.hint_capacity(len(payload)) == 8
    ex = Executor(_hint_reader_program(), stdin=[payload])
    ex.run()
    assert ex.exited and ex.exit_code == 0
    assert ex.committed_values[0] == 0xDEADBEEF
    assert ex.committed_values[1] == len(payload)


def test_hint_stream_exhaustion_is_an_error():
    """SYSHINTLEN past the end of the stream must fail the execution
    (the entrypoint's u32::MAX sentinel never reaches a constrained run —
    zkm-lib panics; our executor refuses the cycle)."""
    from ziren_tpu.executor.executor import ExecutionError

    ex = Executor(_hint_reader_program(), stdin=[])
    with pytest.raises(ExecutionError, match="hint"):
        ex.run()


def test_write_fd_routing():
    """fd 3 appends to the public-values stream; the halt-time digest rule
    (sha256 -> 8 LE words) matches guest.abi.commit_digest_words."""
    base = 0x2000
    data = b"ziren"
    word = int.from_bytes(data[:4], "little")
    insns = [
        # store 'zire' at base, 'n\0\0\0' at base+4
        imm(O.ADD, 9, 0, word >> 16),
        ri(O.SLL, 9, 9, 16),
        imm(O.ADD, 8, 0, word & 0xFFFF),
        rr(O.OR, 8, 8, 9),
        imm(O.SW, 8, 0, base),
        imm(O.ADD, 8, 0, data[4]),
        imm(O.SW, 8, 0, base + 4),
        # WRITE(fd=3, buf=base, len=5): v0=WRITE, a0=3, a1=base, a2=5
        imm(O.ADD, 2, 0, 0x02),
        imm(O.ADD, 4, 0, abi.FD_PUBLIC_VALUES),
        imm(O.ADD, 5, 0, base),
        imm(O.ADD, 6, 0, len(data)),
        Instruction(O.SYSCALL, 2, 4, 5, False, False),
        *halt_sequence(0),
    ]
    ex = Executor(Program.new(insns))
    ex.run()
    assert bytes(ex.public_values_stream) == data
    assert abi.commit_digest_words(data) == abi.commit_digest_words(
        ex.public_values_stream
    )


def test_bincode_codec_roundtrip():
    w = abi.BincodeWriter()
    w.u32(58218).u64(1 << 40).boolean(True).string("fib").byte_vec(b"\x01\x02")
    w.u32_vec([7, 8, 9]).option(5, w.u32).option(None, w.u32).i64(-3)
    r = abi.BincodeReader(w.getvalue())
    assert r.u32() == 58218
    assert r.u64() == 1 << 40
    assert r.boolean() is True
    assert r.string() == "fib"
    assert r.byte_vec() == b"\x01\x02"
    assert r.u32_vec() == [7, 8, 9]
    assert r.option(r.u32) == 5
    assert r.option(r.u32) is None
    assert r.i64() == -3
    assert r.done()


@pytest.mark.skipif(not os.path.exists(REF_ELF), reason="reference ELF absent")
def test_reference_elf_commit_layout():
    """The vendored Rust-built guest's committed digest equals
    sha256(public-values stream) split per the ABI rule — the commit layout
    is validated against a real reference-toolchain guest."""
    prog = load_elf(open(REF_ELF, "rb").read())
    ex = Executor(prog, mode="simple")
    ex.run()
    assert ex.exited and ex.exit_code == 0
    assert ex.committed_values[:8] == abi.commit_digest_words(
        ex.public_values_stream
    )


def test_build_driver_degrades_without_toolchain():
    if find_toolchain() is not None:
        pytest.skip("a guest toolchain is installed; build path exercised")
    with pytest.raises(GuestBuildError, match="toolchain"):
        build_program("/tmp/nonexistent-guest-crate")


def test_include_elf_resolves_reference_artifacts(tmp_path):
    if os.path.exists(REF_ELF):
        data = include_elf("mipsel-zkm-zkvm-elf")
        assert data[:4] == b"\x7fELF"
    # explicit root resolution
    d = tmp_path / "elf"
    d.mkdir()
    (d / "guest").write_bytes(b"\x7fELFxxxx")
    assert include_elf("guest", root=str(tmp_path))[:4] == b"\x7fELF"
    with pytest.raises(FileNotFoundError):
        include_elf("missing-guest", root=str(tmp_path))
