#!/usr/bin/env python3
"""Benchmark: the PRODUCTION compiled path on the standard_2d case.

Runs the full adaptive simulation (test_cyl: axisymmetric air streamer,
real AMR with refinement every 2 steps, adaptive dt with rejection/retry,
multigrid field solves with convergence control) through the compiled
engine (compiled%enabled: jitted units over bucketed epoch packs,
parallel/compiled.py + core/treepack.py) and reports microseconds per
leaf-cell per step over the whole run — the BASELINE.md north star.

vs_baseline anchors to the reference's own class of performance: the
published afivo numbers (Teunissen & Ebert CPC 2018; BASELINE.md) put a
32-thread OpenMP full streamer step at roughly 0.03-0.3 us/cell/step on
this problem class; vs_baseline reports (0.1 / us_per_cell) against the
geometric middle of that range, since the Fortran toolchain is not
available in this environment to measure directly (BASELINE.md).
"""

import json
import os
import time

import numpy as np


def main():
    t_setup = time.time()
    import jax
    jax.config.update("jax_enable_x64", True)
    try:  # persistent compile cache across bench runs
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/afivo_jax_cache")
    except Exception:
        pass
    from afivo_streamer_tpu.driver import Simulation
    from afivo_streamer_tpu.core import reductions as red

    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = "float32" if on_tpu else "float64"
    ref = "/root/reference/programs/standard_2d/tests"
    end_time = float(os.environ.get("BENCH_END_TIME",
                                    "10e-9" if on_tpu else "0.5e-9"))
    sim = Simulation(argv=[
        f"{ref}/test_cyl.cfg", "-ndim=2",
        f"-input_data%file={ref}/td_air_siglo_swarm.txt",
        "-output%name=/tmp/bench/run",
        "-compiled%enabled=T", f"-compiled%dtype={dtype}",
    ])
    setup_s = time.time() - t_setup

    # run the complete adaptive AMR simulation; track cell-steps
    cell_steps = [0]
    n_cells_now = [red.n_leaf_cells(sim.tree)]
    orig_substep = sim._substep

    def counting_substep(*a, **kw):
        return orig_substep(*a, **kw)
    sim._substep = counting_substep

    t0 = time.time()
    last_it = [0]

    class _Hook:
        pass

    # integrate cells over steps via the generic per-step user hook
    def per_step(s, time_now):
        cell_steps[0] += red.n_leaf_cells(s.tree)
    sim.user.generic = per_step

    sim.run(end_time=end_time)
    wall = time.time() - t0

    n_steps = sim.it
    us_per_cell = wall / max(cell_steps[0], 1) * 1e6

    # compile statistics: executables per jitted unit
    units = {}
    for k, v in (list(sim.field.mg._jit_units.items())
                 + list(sim.fluid._jit_units.items())):
        if hasattr(v, "_cache_size"):
            units[str(k)] = v._cache_size()
    n_compiles = sum(units.values())

    baseline_us = 0.1  # see module docstring (CPC-2018 class, 32T OpenMP)
    result = {
        "metric": f"standard_2d(test_cyl) PRODUCTION adaptive-AMR run to "
                  f"{end_time*1e9:.1f} ns, compiled engine, {dtype} "
                  f"[{jax.default_backend()}]",
        "value": round(us_per_cell, 4),
        "unit": "us/cell/step",
        "vs_baseline": round(baseline_us / us_per_cell, 3),
        "extra": {
            "wall_s": round(wall, 1),
            "n_steps": n_steps,
            "cell_steps": int(cell_steps[0]),
            "final_cells": int(red.n_leaf_cells(sim.tree)),
            "final_levels": int(sim.tree.highest_lvl),
            "n_compiled_executables": n_compiles,
            "setup_s": round(setup_s, 1),
            "wc_breakdown": {k: round(v, 1) for k, v in sim.wc.items()},
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
