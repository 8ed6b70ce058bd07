"""Full-scale Plonk wrap: ladder -> wrap R1CS -> Plonk prove + verify
(the reference's wrap_plonk_bn254 stage, tool-scale: the dev wrap circuit
converts to ~6.8M gates; setup + prove are SRS/MSM/NTT-bound and run for
tens of minutes — see ROADMAP for the native Fr vector-kernel plan).

Usage: python -u tools/plonk_wrap.py [fib_n]
"""

import os
import sys
import time

os.environ.setdefault("ZIREN_DEVICE", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

T0 = time.time()
log = lambda m: print(f"[{time.time() - T0:8.1f}s] {m}", flush=True)


def main(n=30):
    from ziren_tpu.executor.asm import fibonacci_program
    from ziren_tpu.sdk import ProverClient, ZirenStdin
    from ziren_tpu.stark.config import outer_dev_config

    client = ProverClient(config="dev")
    pk, vk = client.setup(fibonacci_program(n))
    compressed = client.compressed_prove(pk, ZirenStdin())
    log("compressed")
    shrunk = client.shrink_prove(compressed)
    log("shrunk")
    wrapped = client.wrap_prove(shrunk, outer=outer_dev_config())
    log("wrapped")
    artifact = client.plonk_prove(wrapped)
    log(f"plonk proved: {len(artifact['proof'])} proof bytes")
    assert client.plonk_verify(artifact)
    log("plonk verified")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
