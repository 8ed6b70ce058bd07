"""`python -m ziren_tpu` CLI: execute / prove / verify / vkey."""

import os

from ziren_tpu.__main__ import main

ELF = "/root/reference/crates/prover/elf/mipsel-zkm-zkvm-elf"


def test_execute(capsys):
    assert main(["execute", ELF, "--stdin-hex", "0a000000"]) == 0
    out = capsys.readouterr().out
    # "hello world" is the guest's public-values stream (fd 3), surfaced on
    # the committed line as hex (bincode length prefix + bytes)
    assert "cycles: 3746" in out
    assert b"hello world".hex() in out


def test_prove_verify_roundtrip(tmp_path, capsys):
    proof = str(tmp_path / "p.bin")
    assert main(["prove", ELF, "--config", "dev",
                 "--stdin-hex", "0a000000", "-o", proof]) == 0
    assert os.path.getsize(proof) > 1000
    assert main(["verify", ELF, proof, "--config", "dev"]) == 0
    assert "verification: ok" in capsys.readouterr().out


def test_vkey(capsys):
    assert main(["vkey", ELF]) == 0
    assert capsys.readouterr().out.startswith("vk: ")


def test_cli_new_and_build(tmp_path, monkeypatch):
    """cargo-ziren {new, build} parity: scaffold a guest pair; build
    degrades explicitly without the MIPS toolchain."""
    import os

    from ziren_tpu.__main__ import main

    monkeypatch.chdir(tmp_path)
    assert main(["new", "demo"]) == 0
    assert os.path.isfile("demo/program/Cargo.toml")
    assert os.path.isfile("demo/program/src/main.rs")
    assert os.path.isfile("demo/host.py")
    assert main(["new", "demo"]) == 1  # refuses to clobber
    from ziren_tpu.guest.build import find_toolchain

    if find_toolchain() is None:
        assert main(["build", "demo/program"]) == 1
