"""Recursion-chain wall-clock: core prove -> lift all shards -> join tree
-> shrink -> wrap at a chosen FRI config on the active backend
(VERDICT r4 item 4; reference pipeline: crates/prover/src/lib.rs:617-830
compress + :961 shrink + :1009 wrap_bn254).

    python tools/compress_bench.py --n 58218 --config core --stop-at wrap

Emits one JSON line with per-stage seconds (lift times per shard, join
times per layer) so ROADMAP.md can carry reproducible numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=58218)
    ap.add_argument("--shard-size", type=int, default=(1 << 16) - 64)
    ap.add_argument("--config", default="core", choices=["core", "dev"])
    ap.add_argument("--stop-at", default="wrap",
                    choices=["compress", "shrink", "wrap"])
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/ziren_jax")

    from ziren_tpu.executor.asm import fibonacci_program
    from ziren_tpu.machine.mips import (
        execute_sharded, mips_machine, verify_mips_proof,
    )
    from ziren_tpu.recursion import mips_pipeline as mp
    from ziren_tpu.stark.backend import backend_name
    from ziren_tpu.stark.config import core_config, dev_config

    cfg = core_config() if args.config == "core" else dev_config()
    out = {"workload": f"fibonacci({args.n})", "config": args.config,
           "backend": backend_name(), "stages": {}}

    t0 = time.perf_counter()
    program = fibonacci_program(args.n)
    machine = mips_machine(cfg)
    pk, vk = machine.setup(program)
    ex, records = execute_sharded(program, args.shard_size)
    out["cycles"] = int(ex.global_clk)
    out["stages"]["execute_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    proof = machine.prove(pk, records, fix_shapes=True)
    out["stages"]["core_prove_s"] = round(time.perf_counter() - t0, 3)
    out["shards"] = len(proof.shard_proofs)
    assert verify_mips_proof(machine, vk, proof, pc_start=program.pc_start)

    # instrument lift/join without changing the pipeline
    lifts, joins = [], []
    orig_lift, orig_join = mp.lift_shard, mp.join

    setup_lifts, setup_joins = [], []

    def lift_timed(*a, **k):
        t = time.perf_counter()
        r = orig_lift(*a, **k)
        dt = round(time.perf_counter() - t, 3)
        # setup_only / phantom lifts are registry enumeration, not proving
        (setup_lifts if (k.get("setup_only") or k.get("phantom"))
         else lifts).append(dt)
        return r

    def join_timed(*a, **k):
        t = time.perf_counter()
        r = orig_join(*a, **k)
        dt = round(time.perf_counter() - t, 3)
        (setup_joins if k.get("phantom") else joins).append(dt)
        return r

    mp.lift_shard, mp.join = lift_timed, join_timed
    try:
        t0 = time.perf_counter()
        rm, rvk, final_sp = mp.compress(machine, vk, proof, config=cfg)
        out["stages"]["compress_s"] = round(time.perf_counter() - t0, 3)
    finally:
        mp.lift_shard, mp.join = orig_lift, orig_join
    out["stages"]["lift_s"] = lifts
    out["stages"]["join_s"] = joins
    out["stages"]["registry_enum_lift_s"] = round(sum(setup_lifts), 3)
    out["stages"]["registry_enum_join_s"] = round(sum(setup_joins), 3)

    if args.stop_at != "compress":
        from ziren_tpu.recursion.pipeline import shrink

        t0 = time.perf_counter()
        sm, svk, sproof, _ = shrink(rm, rvk, final_sp)
        out["stages"]["shrink_s"] = round(time.perf_counter() - t0, 3)

    if args.stop_at == "wrap":
        from ziren_tpu.recursion.pipeline import wrap_bn254
        from ziren_tpu.stark.config import outer_config, outer_dev_config

        ocfg = outer_config() if args.config == "core" else outer_dev_config()
        t0 = time.perf_counter()
        wm, wvk, wproof, _ = wrap_bn254(
            sm, svk, sproof.shard_proofs[0], config=ocfg)
        out["stages"]["wrap_s"] = round(time.perf_counter() - t0, 3)

    out["total_s"] = round(sum(
        v for v in out["stages"].values() if isinstance(v, (int, float))
    ), 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
