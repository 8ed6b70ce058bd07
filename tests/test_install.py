"""Artifact install flow (ziren_tpu/install.py vs sdk/src/install.rs)."""

import os
import tarfile

import pytest

from ziren_tpu import install


@pytest.fixture
def mirror(tmp_path, monkeypatch):
    """A local artifact mirror + an isolated circuits dir."""
    src = tmp_path / "built"
    src.mkdir()
    (src / "wrap_pk.bin").write_bytes(b"\x01" * 64)
    (src / "wrap_vk.bin").write_bytes(b"\x02" * 32)
    out = tmp_path / "mirror"
    archive = install.pack_circuit_artifacts(str(src), str(out), "groth16")
    monkeypatch.setenv("ZIREN_CIRCUITS_DIR", str(tmp_path / "circuits"))
    monkeypatch.setenv("ZIREN_ARTIFACTS_URL", str(out))
    return tmp_path, archive


def test_install_roundtrip(mirror):
    tmp_path, _ = mirror
    d = install.try_install_circuit_artifacts("groth16")
    assert sorted(os.listdir(d)) == ["wrap_pk.bin", "wrap_vk.bin"]
    with open(os.path.join(d, "wrap_pk.bin"), "rb") as f:
        assert f.read() == b"\x01" * 64
    # second call: cache hit, no re-fetch even with the mirror gone
    os.environ["ZIREN_ARTIFACTS_URL"] = str(tmp_path / "nonexistent")
    assert install.try_install_circuit_artifacts("groth16") == d


def test_install_checksum_verified(mirror, monkeypatch):
    tmp_path, archive = mirror
    # corrupt the archive after the checksum was published
    with open(archive, "r+b") as f:
        f.seek(20)
        f.write(b"\xff\xff")
    with pytest.raises(install.InstallError, match="checksum"):
        install.try_install_circuit_artifacts("groth16")


def test_install_no_mirror_configured(tmp_path, monkeypatch):
    monkeypatch.setenv("ZIREN_CIRCUITS_DIR", str(tmp_path / "c"))
    monkeypatch.delenv("ZIREN_ARTIFACTS_URL", raising=False)
    with pytest.raises(install.InstallError, match="ZIREN_ARTIFACTS_URL"):
        install.try_install_circuit_artifacts("plonk")


def test_install_rejects_traversal(tmp_path, monkeypatch):
    out = tmp_path / "mirror"
    out.mkdir()
    evil = out / "groth16-v1.tar.gz"
    with tarfile.open(evil, "w:gz") as tar:
        p = tmp_path / "x"
        p.write_bytes(b"evil")
        tar.add(p, arcname="../escape.bin")
    monkeypatch.setenv("ZIREN_CIRCUITS_DIR", str(tmp_path / "c"))
    monkeypatch.setenv("ZIREN_ARTIFACTS_URL", str(out))
    with pytest.raises(install.InstallError, match="unsafe"):
        install.try_install_circuit_artifacts("groth16")
