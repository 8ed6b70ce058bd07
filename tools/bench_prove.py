"""End-to-end proving benchmark: cycles/sec and proof sizes.

Usage: python tools/bench_prove.py [n_iters] [config] [shard_size]
"""

import json
import sys
import time

sys.path.insert(0, ".")

from ziren_tpu.executor.asm import fibonacci_program
from ziren_tpu.machine.mips import mips_machine, prove_program, verify_mips_proof
from ziren_tpu.stark.config import core_config, dev_config
from ziren_tpu.stark.serialize import serialize_machine_proof

REFERENCE_ELF = "/root/reference/crates/prover/elf/mipsel-zkm-zkvm-elf"


def main(n=2000, config="core", shard_size=None):
    if n == 0:  # n=0 selects the reference guest ELF
        from ziren_tpu.executor.program import load_elf

        program = load_elf(open(REFERENCE_ELF, "rb").read())
    else:
        program = fibonacci_program(n)
    cfg = core_config() if config == "core" else dev_config()
    t0 = time.perf_counter()
    machine, pk, vk, proof, ex = prove_program(
        program, config=cfg, shard_size=shard_size
    )
    t_prove = time.perf_counter() - t0
    cycles = int(ex.global_clk)
    t0 = time.perf_counter()
    verify_mips_proof(machine, vk, proof, pc_start=program.pc_start)
    t_verify = time.perf_counter() - t0
    data = serialize_machine_proof(proof)
    print(
        json.dumps(
            {
                "metric": "core_prove_khz",
                "value": round(cycles / t_prove / 1000, 3),
                "unit": "kHz",
                "cycles": cycles,
                "shards": len(proof.shard_proofs),
                "prove_s": round(t_prove, 2),
                "verify_s": round(t_verify, 2),
                "proof_bytes": len(data),
                "config": config,
            }
        )
    )


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    config = sys.argv[2] if len(sys.argv) > 2 else "core"
    ss = int(sys.argv[3]) if len(sys.argv) > 3 else None
    main(n, config, ss)
