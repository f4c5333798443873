#!/usr/bin/env python3
"""Device-time decomposition of the compiled production step.

Runs the bench configuration (test_cyl through the compiled engine) for a
few warm-up steps, then times each jitted unit separately with blocked
pulls — the fused full step, the convergence-controlled field solve, one
V-cycle, the flux+chemistry substep, and the refinement-epoch restrict/gc
— and (where the backend exposes it) counts the kernel launches in the
optimized HLO of each executable (`= fusion(` instances are the dispatch
proxy on TPU). This answers "where do the milliseconds of one step go"
without switching to the per-unit mode, whose extra blocked syncs change
the very dispatch behavior being measured (the reference's own per-phase
breakdown: src/m_streamer.f90:181-187, printed at streamer.f90:419-425).
"""

import json
import os
import sys
import time

import numpy as np


def timeit(fn, reps=5):
    """Median wall seconds of fn() with a blocked pull."""
    import jax
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    return float(np.median(ts)), out


def hlo_stats(jitfn, args):
    """Kernel-launch proxy counts from the optimized HLO (best effort)."""
    try:
        txt = jitfn.lower(*args).compile().as_text()
    except Exception as e:  # backend may not expose the executable
        return {"error": str(e)[:120]}
    return {
        "fusions": txt.count("= fusion("),
        "while": txt.count("= while("),
        "conditional": txt.count("= conditional("),
        "custom_calls": txt.count("custom-call"),
        "copies": txt.count("= copy("),
        "copy_starts": txt.count("copy-start"),
        "dynamic_update": txt.count("dynamic-update-slice("),
        "gather": txt.count("= gather("),
        "scatter": txt.count("= scatter("),
        "lines": txt.count("\n"),
    }


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/afivo_jax_cache")
    except Exception:
        pass
    from afivo_streamer_tpu.driver import Simulation

    ref = "/root/reference/programs/standard_2d/tests"
    on_tpu = jax.default_backend() != "cpu"
    dtype = "float32" if on_tpu else "float64"
    t0 = time.time()
    sim = Simulation(argv=[
        f"{ref}/test_cyl.cfg", "-ndim=2",
        f"-input_data%file={ref}/td_air_siglo_swarm.txt",
        "-output%name=/tmp/prof/run",
        "-compiled%enabled=T", f"-compiled%dtype={dtype}",
        "-compiled%prepad=4",
    ])
    setup_s = time.time() - t0

    steps = []
    refissteps = []

    def per_step(s, tnow):
        steps.append(time.time())
        refissteps.append(s.it % s.refine_cfg.per_steps == 0)

    sim.user.generic = per_step
    n_warm = int(os.environ.get("PROF_STEPS", "30"))
    t0 = time.time()
    sim.run(max_steps=n_warm)
    run_s = time.time() - t0
    d = np.diff(np.asarray(steps))
    refine_mask = np.asarray(refissteps[1:], bool)[: len(d)]

    from afivo_streamer_tpu.core import reductions as red
    n_cells = red.n_leaf_cells(sim.tree)
    def put(**kv):
        for k, v in kv.items():
            report[k] = v
        print("PROF " + json.dumps(kv), flush=True)

    report = {
        "backend": jax.default_backend(),
        "dtype": dtype,
        "setup_s": round(setup_s, 1),
        "warmup_steps": n_warm,
        "warmup_wall_s": round(run_s, 1),
        "n_cells": int(n_cells),
        "levels": int(sim.tree.highest_lvl),
        "step_ms_median": round(float(np.median(d)) * 1e3, 1),
        "step_ms_p10": round(float(np.percentile(d, 10)) * 1e3, 1),
        "step_ms_refine_median": round(
            float(np.median(d[refine_mask])) * 1e3, 1)
        if refine_mask.any() else None,
        "step_ms_norefine_median": round(
            float(np.median(d[~refine_mask])) * 1e3, 1)
        if (~refine_mask).any() else None,
        "wc": {k: round(v, 1) for k, v in sim.wc.items() if v > 0},
    }

    # ---- individual unit timings on the warm state
    params = {"voltage": sim.field.current_voltage}
    if sim.field.lsf_data is not None:
        params["lsf_phi_b"] = sim.field.current_voltage
    mg = sim.field.mg

    print("PROF " + json.dumps(report), flush=True)
    t_v, _ = timeit(lambda: mg.jit_vcycle_res(sim.cc, params)[1])
    put(vcycle_ms=round(t_v * 1e3, 1))

    def fsolve():
        cc, fc, res = sim.field.jit_field_solve(sim.cc, sim.fc, 0, params)
        return res
    t_f, _ = timeit(fsolve)
    put(field_solve_ms=round(t_f * 1e3, 1))

    fl = sim.fluid
    import jax.numpy as jnp

    def flux():
        cc, fc, dt_lim, diag = fl._jit_flux_update(
            sim.cc, sim.fc, jnp.asarray(sim.global_dt, sim.cc.dtype), 0,
            [0], [1.0], 1, True, params)
        return dt_lim
    t_x, _ = timeit(flux)
    put(flux_substep_ms=round(t_x * 1e3, 1))

    def rgc():
        return sim.jit_restrict_gc_densities()
    t_r, _ = timeit(rgc)
    put(restrict_gc_ms=round(t_r * 1e3, 1))

    def fused():
        cc, fc, stats, _codes, _ids = sim._jit_full_step(
            sim.global_dt, sim.global_time)
        sim.cc, sim.fc = cc, fc
        return stats
    # dispatch-only (no block) vs blocked
    stats = fused()
    jax.block_until_ready(stats)
    t0 = time.time()
    stats = fused()
    t_disp = time.time() - t0
    jax.block_until_ready(stats)
    t_full = time.time() - t0
    ts = []
    for _ in range(5):
        t0 = time.time()
        jax.block_until_ready(fused())
        ts.append(time.time() - t0)
    put(fused_step_ms=round(float(np.median(ts)) * 1e3, 1),
        fused_dispatch_ms=round(t_disp * 1e3, 1))

    # refinement-epoch host cost (flags + plan rebuild on the warm tree)
    t0 = time.time()
    sim.cc = sim.jit_restrict_gc_densities()
    info = sim.adjust_refinement()
    t_adj = time.time() - t0
    put(refine_epoch_ms=round(t_adj * 1e3, 1),
        refine_changed=bool(info.n_add or info.n_rm))

    # ---- HLO kernel counts (proxy for per-dispatch op count)
    if os.environ.get("PROF_HLO", "1") == "1":
        from afivo_streamer_tpu.core import treepack as tp
        pad, trash = fl._jit_cfg
        pack, aux = mg._pack_and_ops(dtype=sim.cc.dtype)
        scal = {k: v for k, v in params.items() if np.ndim(v) == 0}
        put(hlo_vcycle=hlo_stats(
            mg._jit_units["vcycle_res"], (sim.cc, scal, pack, aux)))
        fl_pack = tp.get_epoch_pack(sim.tree, pad=pad, trash=trash,
                                    with_gc2=True, dtype=sim.cc.dtype)
        key = next(k for k in sim._jit_fullstep)
        put(hlo_fused_step=hlo_stats(
            sim._jit_fullstep[key],
            (sim.cc, sim.fc, sim.global_dt, sim.global_time, fl_pack,
             pack, aux)))

    print(json.dumps(report, indent=1), flush=True)


if __name__ == "__main__":
    main()
