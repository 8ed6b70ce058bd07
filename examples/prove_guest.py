"""End-to-end walkthrough: execute, prove, verify, and compress a guest ELF.

    python examples/prove_guest.py [path/to/guest.elf] [--compress]

Uses the reference repo's prebuilt guest when no path is given.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ziren_tpu.sdk import ProverClient, ZirenStdin

DEFAULT_ELF = "/root/reference/crates/prover/elf/mipsel-zkm-zkvm-elf"


def main():
    elf_path = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else DEFAULT_ELF
    elf = open(elf_path, "rb").read()
    client = ProverClient(config="dev")
    stdin = ZirenStdin().write_u32s([10])

    pv, report = client.execute(elf, stdin)
    print(f"executed: {report.total_instruction_count} cycles, "
          f"exit {report.exit_code}")
    if report.stdout:
        print("stdout:", report.stdout.decode("utf-8", "replace"))

    pk, vk = client.setup(elf)
    t0 = time.perf_counter()
    proof = client.prove(pk, stdin)
    print(f"proved in {time.perf_counter() - t0:.1f}s "
          f"({len(proof.proof.shard_proofs)} shard(s))")
    assert client.verify(proof, vk)
    print("verified")

    if "--compress" in sys.argv:
        t0 = time.perf_counter()
        rm, rvk, final_sp = client.compressed_prove(pk, stdin)
        from ziren_tpu.stark.proof import MachineProof

        assert rm.verify(rvk, MachineProof([final_sp]))
        print(f"compressed to ONE recursion proof in "
              f"{time.perf_counter() - t0:.0f}s and verified")


if __name__ == "__main__":
    main()
