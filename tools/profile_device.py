"""Instrumented device-prover profile: per-leg wall times on the real chip.

Usage: python tools/profile_device.py [fib_n] [shard_size]

Legs reported:
  exec      — native sharded execution
  est       — cost-model shape targets
  gen       — trace generation (all shards, serial here for attribution)
  dispatch  — host loop: packing + upload + graph build (async device work)
  fetch     — the ONE blocking device_get (device compute + transfer drain)
  assemble  — host proof assembly
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/ziren_jax")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from ziren_tpu.executor.asm import fibonacci_program
from ziren_tpu.machine.mips import execute_sharded, mips_machine, verify_mips_proof
from ziren_tpu.stark.backend import backend_name
from ziren_tpu.stark.shape import estimate_targets, generate_fixed
from ziren_tpu.stark.jprover import dispatch_shard_device, finish_shard_device
from ziren_tpu.stark.proof import MachineProof


def main(n=58218, shard_size=(1 << 16) - 64):
    program = fibonacci_program(n)
    machine = mips_machine()
    pk, vk = machine.setup(program, extra_observations=[program.pc_start])
    print(f"backend={backend_name()} devices={jax.devices()}")

    t0 = time.perf_counter()
    ex, records = execute_sharded(program, shard_size)
    t_exec = time.perf_counter() - t0
    cycles = int(ex.global_clk)

    t0 = time.perf_counter()
    targets = estimate_targets(machine, records)
    t_est = time.perf_counter() - t0

    # warmup: compile every kernel on the first shard (outside timing)
    generate_fixed(machine, records[0], targets)
    base = machine.config.challenger()
    pk.vk.observe_into(base)
    t0 = time.perf_counter()
    d = dispatch_shard_device(machine, pk, records[0], base.clone())
    got = jax.device_get(d["fetch"])
    finish_shard_device(pk, d, got)
    t_warm = time.perf_counter() - t0
    print(f"exec={t_exec:.2f}s est={t_est:.2f}s warmup={t_warm:.2f}s "
          f"shards={len(records)} cycles={cycles}")

    # timed region, serial legs for attribution
    ex, records = execute_sharded(program, shard_size)
    t0 = time.perf_counter()
    for r in records:
        generate_fixed(machine, r, targets)
    t_gen = time.perf_counter() - t0

    t0 = time.perf_counter()
    dispatches = [
        dispatch_shard_device(machine, pk, r, base.clone()) for r in records
    ]
    t_dispatch = time.perf_counter() - t0

    t0 = time.perf_counter()
    gots = jax.device_get([dd["fetch"] for dd in dispatches])
    t_fetch = time.perf_counter() - t0

    t0 = time.perf_counter()
    proof = MachineProof(
        [finish_shard_device(pk, dd, g) for dd, g in zip(dispatches, gots)]
    )
    t_assemble = time.perf_counter() - t0

    total = t_gen + t_dispatch + t_fetch + t_assemble + t_exec
    print(f"gen={t_gen:.2f}s dispatch={t_dispatch:.2f}s fetch={t_fetch:.2f}s "
          f"assemble={t_assemble:.2f}s")
    print(f"serial total={total:.2f}s -> {cycles / total / 1e3:.2f} kHz "
          f"(pipelined path overlaps gen+dispatch with device)")
    assert verify_mips_proof(machine, vk, proof, pc_start=program.pc_start)
    print("verified")

    # the bench path (machine.prove, pipelined trace gen + async dispatch)
    ex, records = execute_sharded(program, shard_size)
    t0 = time.perf_counter()
    proof2 = machine.prove(pk, records, fix_shapes=True)
    t_prove = time.perf_counter() - t0
    print(f"machine.prove={t_prove:.2f}s -> "
          f"{cycles / (t_prove + t_exec) / 1e3:.2f} kHz")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 58218
    ss = int(sys.argv[2]) if len(sys.argv) > 2 else (1 << 16) - 64
    main(n, ss)
