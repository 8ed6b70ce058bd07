"""Profile the prover pipeline on a fibonacci workload."""

import cProfile
import io
import pstats
import sys
import time

from ziren_tpu.executor.asm import fibonacci_program
from ziren_tpu.machine.mips import execute, mips_machine
from ziren_tpu.stark.config import core_config, dev_config


def main(n=500, config="dev"):
    program = fibonacci_program(n)
    machine = mips_machine(dev_config() if config == "dev" else core_config())
    t0 = time.perf_counter()
    pk, vk = machine.setup(program)
    t_setup = time.perf_counter() - t0
    ex, record = execute(program)
    cycles = ex.global_clk
    t0 = time.perf_counter()
    pr = cProfile.Profile()
    pr.enable()
    proof = machine.prove(pk, [record])
    pr.disable()
    t_prove = time.perf_counter() - t0
    t0 = time.perf_counter()
    machine.verify(vk, proof)
    t_verify = time.perf_counter() - t0
    print(f"cycles={cycles} setup={t_setup:.2f}s prove={t_prove:.2f}s "
          f"verify={t_verify:.2f}s khz={cycles / t_prove / 1000:.2f}")
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(25)
    print(s.getvalue())


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    config = sys.argv[2] if len(sys.argv) > 2 else "dev"
    main(n, config)
