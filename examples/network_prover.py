"""Remote proving over the signed twirp-shaped RPC (reference: the
crates/cuda GPU-prover container + sdk network prover, with HMAC-signed
jobs per sdk/src/network/prover.rs).

    python examples/network_prover.py

Starts an in-process ProverServer with a shared key, points a NetworkProver
at it, proves a fibonacci guest remotely and re-verifies LOCALLY (the
remote prover is untrusted for soundness)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if "--cpu" in sys.argv or os.environ.get("ZIREN_DEVICE") == "0":
    # the container pre-imports jax with the tunneled-TPU platform; env
    # vars alone cannot move it to CPU (see .claude/skills/verify)
    import jax

    jax.config.update("jax_platforms", "cpu")

from ziren_tpu.executor.asm import fibonacci_program
from ziren_tpu.network import NetworkProver, ProverServer


def main():
    key = "5e" * 32
    with ProverServer(config="dev", key=key) as srv:
        print(f"prover service: {srv.endpoint} (HMAC-signed requests)")
        prover = NetworkProver(srv.endpoint, config="dev", key=key)
        assert prover.ready()

        program = fibonacci_program(200)
        pk, vk = prover.setup(program)
        print(f"registered program id {pk.program_id[:16]}...")

        proof = prover.prove(pk)  # verified locally against the local vk
        print(f"proved remotely: {len(proof.proof.shard_proofs)} shard(s), "
              "verified locally - ok")


if __name__ == "__main__":
    main()
