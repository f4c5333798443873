#!/usr/bin/env python3
"""Multigrid cycle benchmark (the V-cycle us/cell BASELINE metric).

The TPU-native analog of the reference's dedicated multigrid benchmark
(``afivo/examples/poisson_benchmark.f90:96-143``): a uniformly refined
2D mesh (box size 16, coarse grid 16^2, refined ``max_lvl`` levels),
rhs = 1, Dirichlet-zero boundaries; times FAS V-cycles and FMG cycles
through the compiled engine (epoch-pack jit units, Pallas smoother and
local-block cycle on TPU) and reports microseconds per leaf cell per
cycle. Usable standalone (prints one JSON line) or from bench.py, which
embeds the numbers in the benchmark artifact.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


I_PHI, I_RHS, I_TMP = 0, 1, 2


def run(nc=16, cgs=16, max_lvl=4, n_cycles=10, reps=5, fmg=True):
    """Time V-cycles (and optionally FMG cycles) on a uniform mesh.

    ``fmg=False`` skips the FMG executable entirely: its trace/compile
    roughly doubles the tool's cold-cache cost on TPU (the compile cache
    does not persist through the axon tunnel), and the BASELINE metric
    is the V-cycle us/cell.  bench.py passes fmg=False so the pre-run
    metric stays cheap relative to the production-run watchdog budget.
    """
    import jax
    import jax.numpy as jnp
    from afivo_streamer_tpu.core.tree import Tree
    from afivo_streamer_tpu.core.batch import BoxBatch
    from afivo_streamer_tpu.core import ghostcell as gc
    from afivo_streamer_tpu.solvers.multigrid import Multigrid

    on_tpu = jax.default_backend() != "cpu"
    dtype = jnp.float32 if on_tpu else jnp.float64

    t = Tree(2, nc, [1.0, 1.0], [cgs, cgs])
    t.refine_up_to_lvl(max_lvl)
    batch = BoxBatch(t, 3, 0)
    cc = np.array(batch.cc)
    grow = np.zeros((cc.shape[0], cc.shape[1] + 8, cc.shape[2]))
    grow[:, :cc.shape[1]] = cc
    cc = grow
    from afivo_streamer_tpu.core import spatial as sp
    interior = sp.interior_flat(2, nc)
    for lvl in range(1, t.highest_lvl + 1):
        ids = np.asarray(t.lvl_ids[lvl - 1])
        cc[I_RHS, ids[:, None], interior[None, :]] = 1.0

    def bc(iv, d, coords, params):
        return gc.BC_DIRICHLET, 0.0

    mg = Multigrid(t, I_PHI, I_RHS, I_TMP, bc)
    mg.enable_jit(pad=True, trash=cc.shape[1] - 1)
    d = jnp.asarray(cc, dtype)
    d = mg.fill_ghosts_phi(d, {})
    n_leaf = sum(len(t.lvl_leaves[l]) for l in range(t.highest_lvl)) \
        * nc * nc

    # warm-up (compile)
    d, res = mg.jit_vcycle_res(d, {})
    jax.block_until_ready(res)
    if fmg:
        d2, res2 = mg.jit_fmg_res(d, {})
        jax.block_until_ready(res2)

    def time_unit(fn):
        ts = []
        nonlocal d
        for _ in range(reps):
            t0 = time.time()
            for _ in range(n_cycles):
                d, res = fn(d)
            jax.block_until_ready(res)
            ts.append((time.time() - t0) / n_cycles)
        return float(np.median(ts))

    t_v = time_unit(lambda x: mg.jit_vcycle_res(x, {}))
    t_f = time_unit(lambda x: mg.jit_fmg_res(x, {})) if fmg else None
    out = {
        "backend": jax.default_backend(),
        "dtype": str(np.dtype(dtype)),
        "n_leaf_cells": int(n_leaf),
        "levels": int(t.highest_lvl),
        "vcycle_ms": round(t_v * 1e3, 3),
        "vcycle_us_per_cell": round(t_v / n_leaf * 1e6, 4),
        "final_residual": float(res),
    }
    if t_f is not None:
        out["fmg_ms"] = round(t_f * 1e3, 3)
        out["fmg_us_per_cell"] = round(t_f / n_leaf * 1e6, 4)
    return out


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/afivo_jax_cache")
    except Exception:
        pass
    out = run()
    out["metric"] = "poisson_benchmark 2D V-cycle (afivo " \
        "examples/poisson_benchmark.f90 analog)"
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
