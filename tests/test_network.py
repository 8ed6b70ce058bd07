"""Remote prover backend (ziren_tpu/network) + mock prover + backend
factory (reference: crates/cuda twirp ProverService, sdk network prover,
sdk/src/provers/mock.rs, ProverClient backend selection)."""

import pytest

from ziren_tpu.executor.asm import fibonacci_program
from ziren_tpu.network import NetworkProver, ProverServer
from ziren_tpu.network.client import NetworkProverError
from ziren_tpu.sdk import MockProver, ProverClient, ZirenStdin, create_prover
from ziren_tpu.stark.verifier import VerificationError


@pytest.fixture(scope="module")
def server():
    with ProverServer(config="dev") as srv:
        yield srv


def test_network_prove_roundtrip(server):
    """Setup + execute + prove over the RPC surface; the proof is verified
    LOCALLY by the client (the remote prover is untrusted for soundness)."""
    prover = NetworkProver(server.endpoint, config="dev")
    assert prover.ready()
    prog = fibonacci_program(100)
    pk, vk = prover.setup(prog)
    values, report = prover.execute(pk)
    assert report.exit_code == 0
    proof = prover.prove(pk)  # verify=True re-verifies locally
    assert proof.proof is not None
    # a second setup of the same program reuses the server-side key
    pk2, _ = prover.setup(prog)
    assert pk2.program_id == pk.program_id


def test_network_error_envelope(server):
    prover = NetworkProver(server.endpoint)
    with pytest.raises(NetworkProverError, match="unknown program id"):
        prover.prove(type("P", (), {
            "program_id": "feed" * 16,
            "vk_handle": None,
        })())


def test_mock_prover():
    """Mock backend: executes the guest, fabricates an empty proof with
    REAL public values, verifies digests only."""
    mock = create_prover("mock", config="dev")
    assert isinstance(mock, MockProver)
    prog = fibonacci_program(50)
    pk, vk = mock.setup(prog)
    proof = mock.prove(pk)
    assert proof.proof is None
    assert mock.verify(proof, vk)
    proof.public_values = None
    with pytest.raises(VerificationError):
        mock.verify(proof, vk)


def test_factory_modes():
    assert isinstance(create_prover("cpu", config="dev"), ProverClient)
    assert isinstance(create_prover("mock"), MockProver)
    with pytest.raises(ValueError, match="endpoint"):
        create_prover("network")
    np = create_prover("network", endpoint="http://127.0.0.1:1/")
    assert isinstance(np, NetworkProver)
    with pytest.raises(ValueError, match="unknown prover mode"):
        create_prover("quantum")


def test_network_auth_signed_roundtrip():
    """Signed client <-> keyed server (reference prover.rs:32-49 signed
    jobs): valid signature accepted, everything else rejected before
    deserialization."""
    import urllib.error
    import urllib.request

    import pytest

    from ziren_tpu.network import ProverServer
    from ziren_tpu.network import auth, wire

    key = "a3" * 32
    with ProverServer(config="dev", key=key) as srv:
        signed = NetworkProver(srv.endpoint, config="dev", key=key)
        assert signed.ready()

        # unsigned client -> 401 before any unpickling
        unsigned = NetworkProver(srv.endpoint, config="dev", key=None)
        with pytest.raises(urllib.error.HTTPError) as e:
            unsigned.ready()
        assert e.value.code == 401

        # wrong key -> 401
        bad = NetworkProver(srv.endpoint, config="dev", key="b4" * 32)
        with pytest.raises(urllib.error.HTTPError):
            bad.ready()

        # replayed nonce -> 401 (capture one valid request and resend it)
        body = wire.dumps({})
        headers = auth.sign_headers(auth.load_key(key), "Ready", body)
        url = srv.endpoint + "/twirp/ProverService/Ready"

        def post(h):
            req = urllib.request.Request(
                url, data=body,
                headers={"Content-Type": "application/octet-stream", **h})
            with urllib.request.urlopen(req, timeout=30) as resp:
                return wire.loads(resp.read())

        assert post(headers)["ok"]
        with pytest.raises(urllib.error.HTTPError):
            post(headers)  # same nonce again

        # stale timestamp -> 401
        stale = dict(headers)
        stale[auth.HDR_TS] = "1000.0"
        k = auth.load_key(key)
        stale[auth.HDR_NONCE] = "ff" * 16
        stale[auth.HDR_SIG] = auth._digest(k, "Ready", stale[auth.HDR_TS],
                                           stale[auth.HDR_NONCE], body)
        with pytest.raises(urllib.error.HTTPError):
            post(stale)


def test_network_auth_open_without_key():
    """No key configured -> loopback-open service (backwards compatible)."""
    from ziren_tpu.network import ProverServer

    with ProverServer(config="dev") as srv:
        assert NetworkProver(srv.endpoint, config="dev").ready()
