#!/usr/bin/env python3
"""Physics convergence sweep on a cylindrical positive streamer.

The port of the reference's ``tests/convergence/run_tests_cyl.sh``: runs
the base case plus numerical-parameter perturbations (more V-cycles,
kept refinement, half dt, linear density prolongation, photoi cadence,
refine_adx ladder) and reports the deviation of the headline observables
(max(E), streamer head position, velocity, sum(n_e)) of every variant
against the base run at the common output times — converged numerics
means the physics is insensitive to these knobs.

Usage:
    python tests/convergence/run_sweep.py [--end-time 4e-9]
        [--cfg CFG] [--only name ...] [--out DIR]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

REF = "/root/reference/programs/standard_2d/tests"

VARIANTS = [
    ("base", []),
    ("4vcycle", ["-multigrid_num_vcycles=4"]),
    ("keep_ref", ["-derefine_dx=1e-7"]),
    ("half_dt", ["-dt_safety_factor=0.45"]),
    ("prolong_linear", ["-prolong_density=linear"]),
    ("photoi_1step", ["-photoi%per_steps=1"]),
    ("adx_0.5x", ["-refine_adx_fac=0.5"]),
    ("adx_2x", ["-refine_adx_fac=2.0"]),
]


def load_log(fname):
    import numpy as np
    with open(fname) as f:
        names = f.readline().split()
    seen = {}
    cols = []
    for n in names:
        k = seen.get(n, 0)
        seen[n] = k + 1
        cols.append(n if k == 0 else f"{n}.{k}")
    return cols, np.loadtxt(fname, skiprows=1, ndmin=2)


def main():
    import numpy as np
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default=f"{REF}/test_2d_photoi.cfg")
    ap.add_argument("--data", default=f"{REF}/td_air_siglo_swarm.txt")
    ap.add_argument("--end-time", type=float, default=2.0e-9)
    ap.add_argument("--out", default="/tmp/convergence_sweep")
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from afivo_streamer_tpu.driver import Simulation

    variants = [(n, e) for n, e in VARIANTS
                if args.only is None or n in args.only or n == "base"]
    logs = {}
    for name, extra in variants:
        # refine_adx scaling is relative to the cfg's value
        if extra and extra[0].startswith("-refine_adx_fac"):
            fac = float(extra[0].split("=")[1])
            base_adx = 1.0
            with open(args.cfg) as f:
                for line in f:
                    if line.strip().startswith("refine_adx"):
                        base_adx = float(line.split("=")[1])
            extra = [f"-refine_adx={base_adx * fac}"]
        out = os.path.join(args.out, name, "run")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        t0 = time.time()
        sim = Simulation(argv=[
            args.cfg, "-ndim=2", f"-input_data%file={args.data}",
            f"-output%name={out}", *extra])
        sim.run(end_time=args.end_time)
        logs[name] = load_log(out + "_log.txt")
        print(f"{name:16s} done ({time.time() - t0:.0f} s, "
              f"{sim.it} steps)", flush=True)

    cols, base = logs["base"]
    iE, iz = cols.index("max(E)"), cols.index("y")
    iv, ine = cols.index("v"), cols.index("sum(n_e)")
    print(f"\n{'variant':16s} {'dmax(E)':>9s} {'dz_head':>9s} "
          f"{'dv':>9s} {'dsum(ne)':>9s}  (max rel dev vs base)")
    for name, _ in variants[1:]:
        _, d = logs[name]
        n = min(len(base), len(d))

        def dev(i, b=base, d=d, n=n):
            db = np.abs(d[:n, i] - b[:n, i])
            return float(np.max(db / np.maximum(np.abs(b[:n, i]), 1e-30)))

        print(f"{name:16s} {dev(iE):9.2e} {dev(iz):9.2e} "
              f"{dev(iv):9.2e} {dev(ine):9.2e}")


if __name__ == "__main__":
    main()
