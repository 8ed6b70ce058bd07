"""End-to-end Groth16-of-wrap driver: engine proof -> compress -> shrink ->
wrap (BN254 outer config) -> wrap-verifier R1CS -> Groth16 prove -> verify
(reference: the full prover/src/lib.rs prove_groth16 ladder, with
snark/wrap_circuit.py replacing the gnark stage).

    python tools/groth16_wrap.py [--out artifact.pkl]

EXPENSIVE: ~3M constraints at dev FRI params — the dev-grade seed-derived
setup takes ~15 min and the prove ~10 min on 4 cores (native MSM/NTT).
"""

import argparse
import pickle
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="groth16_wrap_artifact.pkl")
    ap.add_argument("--mips", action="store_true",
                    help="run the REAL zkVM pipeline (MIPS guest -> core "
                         "shards -> compress) instead of the engine machine")
    ap.add_argument("--fib-n", type=int, default=20)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, "tests")

    from ziren_tpu.recursion.pipeline import shrink, wrap_bn254
    from ziren_tpu.sdk import ProverClient
    from ziren_tpu.stark.config import dev_config, outer_dev_config

    t0 = time.time()

    def log(msg):
        print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)

    client = ProverClient(config="dev")
    if args.mips:
        from ziren_tpu.executor.asm import fibonacci_program

        pk, vk = client.setup(fibonacci_program(args.fib_n))
        rm, rvk, final_sp = client.compressed_prove(pk)
        log(f"MIPS core prove + compress (fib {args.fib_n})")
    else:
        from test_stark_engine import FibonacciAir, Record, fib_pv

        from ziren_tpu.recursion.pipeline import compress
        from ziren_tpu.stark.machine import StarkMachine

        m = StarkMachine(dev_config(), [FibonacciAir()],
                         num_public_values=3)
        pk, vk = m.setup()
        proof = m.prove(pk, [Record(n=16, pv=fib_pv(16)),
                             Record(n=32, pv=fib_pv(32))])
        log("engine proof")
        rm, rvk, final_sp = compress(m, vk, proof)
        log("compress")
    sm, svk, sproof, _ = shrink(rm, rvk, final_sp)
    log("shrink")
    wm, wvk, wproof, _ = wrap_bn254(
        sm, svk, sproof.shard_proofs[0], config=outer_dev_config()
    )
    wsp = wproof.shard_proofs[0]
    log("wrap (BN254 outer)")

    artifact = client.groth16_prove((wm, wvk, wsp))
    log(f"groth16 prove ({len(artifact['proof'])} bytes)")
    assert ProverClient.groth16_verify(artifact)
    log("groth16 verify OK")

    with open(args.out, "wb") as f:
        pickle.dump(artifact, f)
    log(f"artifact -> {args.out}")


if __name__ == "__main__":
    main()
