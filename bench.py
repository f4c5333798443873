#!/usr/bin/env python3
"""Benchmark: full streamer time step on the standard_2d axisymmetric case.

Measures the wall-clock of one complete jitted time step (Heun: two
drift-diffusion-reaction substeps with Koren upwind fluxes + chemistry, and
FAS multigrid Poisson solves with 2 V-cycles) on a multi-level AMR mesh of
the test_cyl configuration, reported as microseconds per leaf cell per step
— the north-star metric of BASELINE.md (standard_2d time/step). The
reference publishes no in-repo absolute numbers (BASELINE.json published:
{}), so vs_baseline is reported as 1.0.

Runs on whatever accelerator JAX selects (TPU under axon; CPU fallback).
"""

import json
import os
import sys
import time

import numpy as np


def build():
    import jax
    jax.config.update("jax_enable_x64", True)
    from afivo_streamer_tpu.driver import Simulation
    ref = "/root/reference/programs/standard_2d/tests"
    sim = Simulation(argv=[
        f"{ref}/test_cyl.cfg", "-ndim=2",
        f"-input_data%file={ref}/td_air_siglo_swarm.txt",
        "-output%name=/tmp/bench/run",
        # uniform 6-level mesh (64k cells): exercises the same kernels as
        # AMR operation, with enough work per level pass to utilize the chip
        "-refine_max_dx=6.4e-5", "-refine_adx=1e99", "-refine_init_time=-1",
    ])
    return sim


def main():
    t_setup = time.time()
    import jax
    sim = build()
    import jax.numpy as jnp
    from afivo_streamer_tpu.parallel.compiled import make_step_fn
    from afivo_streamer_tpu.core import reductions as red

    n_cells = red.n_leaf_cells(sim.tree)
    # f32 on TPU: f64 is emulated on this hardware at a ~50x penalty and
    # is kept for the parity/golden path on the host; the compiled TPU
    # step runs in f32 (dt limits agree with f64 to ~4 digits)
    dtype = jnp.float32 if jax.default_backend() != "cpu" else jnp.float64
    cc = jnp.asarray(sim.cc, dtype=dtype)
    fc = jnp.asarray(sim.fc, dtype=dtype)
    fn = make_step_fn(sim, n_vcycles=2)
    step = jax.jit(fn, donate_argnums=(0, 1))

    t0 = time.time()
    cc, fc, dt_lim = step(cc, fc, jnp.asarray(1e-13, dtype),
                          jnp.asarray(sim.field.current_voltage, dtype))
    dt_lim.block_until_ready()
    compile_s = time.time() - t0

    # warmup + timed steps
    for _ in range(3):
        cc, fc, dt_lim = step(cc, fc, jnp.asarray(1e-13, dtype),
                              jnp.asarray(sim.field.current_voltage, dtype))
    float(dt_lim)
    n_steps = 50
    t0 = time.time()
    for _ in range(n_steps):
        cc, fc, dt_lim = step(cc, fc, jnp.asarray(1e-13, dtype),
                              jnp.asarray(sim.field.current_voltage, dtype))
    float(dt_lim)  # forces the whole dependency chain
    per_step = (time.time() - t0) / n_steps
    us_per_cell = per_step / n_cells * 1e6

    result = {
        "metric": "standard_2d(test_cyl) full step, "
                  f"{sim.tree.highest_lvl}-level AMR, {n_cells} cells, "
                  f"{jnp.dtype(dtype).name} "
                  f"[{jax.default_backend()}]",
        "value": round(us_per_cell, 4),
        "unit": "us/cell/step",
        "vs_baseline": 1.0,
        "extra": {
            "step_ms": round(per_step * 1e3, 3),
            "compile_s": round(compile_s, 1),
            "setup_s": round(t0 - t_setup, 1),
            "dt_lim": float(dt_lim),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
