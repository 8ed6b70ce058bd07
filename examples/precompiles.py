"""Precompile showcase: execute AND prove guests that use the accelerated
syscalls (reference examples/{sha2,keccak,...}; the asm builders stand in
for Rust guests since no MIPS toolchain ships in this environment).

    python examples/precompiles.py [keccak|sha256|poseidon2|secp256k1]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if "--cpu" in sys.argv or os.environ.get("ZIREN_DEVICE") == "0":
    # the container pre-imports jax with the tunneled-TPU platform; env
    # vars alone cannot move it to CPU (see .claude/skills/verify)
    import jax

    jax.config.update("jax_platforms", "cpu")

from ziren_tpu.executor import asm
from ziren_tpu.machine.mips import prove_program
from ziren_tpu.stark.config import core_config, dev_config


BUILDERS = {
    "keccak": lambda: asm.keccak_program(b"ziren-tpu precompile demo"),
    "sha256": asm.sha256_program,
    "poseidon2": asm.poseidon2_program,
    "secp256k1": lambda: asm.secp256k1_program("add"),
}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "keccak"
    program = BUILDERS[which]()
    cfg = core_config() if "--core" in sys.argv else dev_config()
    t0 = time.time()
    machine, pk, vk, proof, ex = prove_program(program, config=cfg)
    dt = time.time() - t0
    names = {n for sp in proof.shard_proofs for n in sp.chip_names}
    print(f"{which}: {ex.global_clk} cycles proved+verified in {dt:.1f} s")
    print(f"precompile chips in the proof: "
          f"{sorted(n for n in names if n not in ('Cpu', 'Program', 'Byte'))}")
    from ziren_tpu.machine.mips import verify_mips_proof

    assert verify_mips_proof(machine, vk, proof, pc_start=program.pc_start)
    print("verification: ok")


if __name__ == "__main__":
    main()
