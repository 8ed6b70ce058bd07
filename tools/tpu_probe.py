"""Stage-by-stage TPU device-prover probe with unbuffered timestamps.

Isolates where cold time goes on the tunneled chip: trace upload, main
commit (NTT+LDE+Merkle mega-graph), permutation, quotient kernels, FRI
open. Each stage blocks on the device so the wall time is attributable.

Usage: python -u tools/tpu_probe.py [fib_n] [shard_size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ziren_tpu.stark.backend import ensure_compile_cache  # noqa: E402

ensure_compile_cache()

T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:8.1f}s] {msg}", flush=True)


def main(n=58218, shard_size=(1 << 16) - 64):
    import jax

    import numpy as np

    from ziren_tpu.machine.mips import execute_sharded, mips_machine
    from ziren_tpu.executor.asm import fibonacci_program
    from ziren_tpu.stark.config import core_config
    from ziren_tpu.stark.shape import estimate_targets, generate_fixed
    from ziren_tpu.ops import jpcs
    from ziren_tpu.stark import jprover

    log(f"devices={jax.devices()}")
    program = fibonacci_program(n)
    machine = mips_machine(core_config())
    pk, vk = machine.setup(program, extra_observations=[program.pc_start])
    log("setup done")

    ex, records = execute_sharded(program, shard_size)
    log(f"exec done: {len(records)} shards, {ex.global_clk} cycles")
    targets = estimate_targets(machine, records)
    log(f"targets: {sorted(targets.items(), key=lambda kv: -kv[1])[:6]}...")
    traces = generate_fixed(machine, records[0], targets)
    log(f"trace gen shard0 done: {sum(t.nbytes for _, t in traces) >> 20} MB")

    # upload
    t0 = time.time()
    mains = [jprover._to_dev_packed(t) for _, t in
             sorted(traces, key=lambda t: -t[1].shape[0])]
    jax.block_until_ready(mains)
    log(f"upload+mont done in {time.time() - t0:.1f}s")

    chips = [c for c, _ in sorted(traces, key=lambda t: -t[1].shape[0])]
    fri = machine.config.fri
    pcs_host = machine.config.pcs
    doms = [pcs_host.natural_domain_for_degree(t.shape[0])
            for _, t in sorted(traces, key=lambda t: -t[1].shape[0])]

    t0 = time.time()
    _pd, _prep = jprover._device_pk(machine, pk)
    log(f"preprocessed commit done in {time.time() - t0:.1f}s")

    t0 = time.time()
    commit, data = jpcs.commit(list(zip(doms, mains)), fri.log_blowup)
    jax.block_until_ready(commit)
    log(f"main commit done in {time.time() - t0:.1f}s")

    # full dispatch+fetch for shard 0
    base = machine.config.challenger()
    pk.vk.observe_into(base)
    t0 = time.time()
    d = jprover.dispatch_shard_device(machine, pk, records[0], base.clone())
    log(f"dispatch done in {time.time() - t0:.1f}s")
    t0 = time.time()
    got = jax.device_get(d["fetch"])
    log(f"fetch done in {time.time() - t0:.1f}s")
    sp = jprover.finish_shard_device(pk, d, got)
    log("assembled")

    # warm repeat, all shards, pipelined path
    t0 = time.time()
    ex, records = execute_sharded(program, shard_size)
    t_exec = time.time() - t0
    t0 = time.time()
    proof = machine.prove(pk, records, fix_shapes=True)
    t_prove = time.time() - t0
    cycles = int(ex.global_clk)
    total = t_exec + t_prove
    log(f"WARM: exec {t_exec:.1f}s prove {t_prove:.1f}s "
        f"-> {cycles / total / 1e3:.1f} kHz ({len(records)} shards)")

    from ziren_tpu.machine.mips import verify_mips_proof

    assert verify_mips_proof(machine, vk, proof, pc_start=program.pc_start)
    log("verified")

    # warm single-shard attribution
    ex, records = execute_sharded(program, shard_size)
    t0 = time.time()
    generate_fixed(machine, records[0], targets)
    t_gen = time.time() - t0
    t0 = time.time()
    d = jprover.dispatch_shard_device(machine, pk, records[0], base.clone())
    t_disp = time.time() - t0
    t0 = time.time()
    got = jax.device_get(d["fetch"])
    t_fetch = time.time() - t0
    t0 = time.time()
    jprover.finish_shard_device(pk, d, got)
    log(f"warm shard legs: gen {t_gen:.2f}s dispatch {t_disp:.2f}s "
        f"fetch {t_fetch:.2f}s assemble {time.time() - t0:.2f}s")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 58218
    ss = int(sys.argv[2]) if len(sys.argv) > 2 else (1 << 16) - 64
    main(n, ss)
