#!/usr/bin/env python3
"""Sub-cell sensitivity analysis of the electrode golden tests.

The committed electrode goldens (test_2d_neg_electrode,
test_2d_pos_electrode, test_cyl_2pulse) are the only reference cases this
framework does not reproduce at rtol 1e-5 (README parity table). This
tool quantifies WHY: it perturbs discretization-arbitrary sub-cell
choices of the level-set electrode pipeline — knobs the reference
hardcodes to equally arbitrary values (``m_af_types.f90:607-616``:
``lsf_gradient_safety_factor=1.5``, ``lsf_tol=1e-8``,
``lsf_min_rel_distance=1e-4``) — and compares the spread of the
regression-log observables across perturbations against this
implementation's deviation from the committed golden.

If the perturbation spread is comparable to (or larger than) the
golden deviation, the golden cannot discriminate between compliant
implementations at that tolerance: the observables amplify sub-cell
details of the electrode-tip discretization exponentially (ionization
growth at the tip field), so matching them at 1e-5 would require
bit-level agreement of the LSF pipeline, not algorithmic equivalence.

Usage: python tools/electrode_sensitivity.py [end_time_ns] [case]
Writes a table to stdout; takes ~30-60 min for the default 0.6 ns.
"""
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np

from afivo_streamer_tpu.driver import Simulation
from afivo_streamer_tpu.solvers import lsf as lsf_mod

REF = "/root/reference/programs/standard_2d/tests"

VARIANTS = {
    "baseline": {},
    # half/double the minimum relative boundary distance (the clamp on
    # how close to a cell center the electrode surface may be)
    "min_rel_dist=3e-4": {"min_rel_distance": 3e-4},
    # widen the root-detection safety factor: marginal cells at the tip
    # gain/lose their boundary-stencil treatment
    "grad_safety=1.75": {"gradient_safety_factor": 1.75},
    # looser root tolerance for the golden-section/bisection search
    "lsf_tol=1e-6": {"tol": 1e-6},
    # linear instead of golden-section root search (the reference offers
    # both; mg_lsf_dist_linear vs mg_lsf_dist_gss)
    "dist=linear": {"dist_mode": "linear"},
}


def run_variant(name, overrides, case, end_time, outdir):
    orig_init = lsf_mod.LsfData.__init__

    @functools.wraps(orig_init)
    def patched(self, tree, lsf_fn, **kw):
        kw.update(overrides)
        return orig_init(self, tree, lsf_fn, **kw)

    lsf_mod.LsfData.__init__ = patched
    try:
        sim = Simulation(argv=[
            f"{REF}/{case}.cfg", "-ndim=2",
            f"-input_data%file={REF}/td_air_siglo_swarm.txt",
            f"-output%name={outdir}/{name.replace('=', '_')}/run"])
        sim.run(end_time=end_time)
    finally:
        lsf_mod.LsfData.__init__ = orig_init
    return np.loadtxt(
        f"{outdir}/{name.replace('=', '_')}/run_rtest.log",
        skiprows=1, ndmin=2)


def main():
    end_time = float(sys.argv[1]) * 1e-9 if len(sys.argv) > 1 else 0.6e-9
    case = sys.argv[2] if len(sys.argv) > 2 else "test_2d_neg_electrode"
    outdir = f"/tmp/elsens_{case}"
    golden = np.loadtxt(f"{REF}/{case}_rtest.log", skiprows=1, ndmin=2)

    logs = {}
    for name, ovr in VARIANTS.items():
        print(f"--- running {name}", flush=True)
        logs[name] = run_variant(name, ovr, case, end_time, outdir)

    base = logs["baseline"]
    n = min(len(base), len(golden))

    def rel(a, b):
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.abs(a - b) / np.maximum(np.abs(b), 1e-300)

    print(f"\n{case}: max relative deviation of the log observables "
          f"(cols 4+) per output row")
    print(f"{'row':>4} {'time':>9} {'vs-golden':>10}", end="")
    for name in VARIANTS:
        if name != "baseline":
            print(f" {name:>18}", end="")
    print()
    for i in range(n):
        print(f"{i:>4} {golden[i, 1]:>9.2e} "
              f"{rel(base[i, 3:], golden[i, 3:]).max():>10.2e}", end="")
        for name, log in logs.items():
            if name == "baseline":
                continue
            m = min(len(log), len(base))
            v = (rel(log[i, 3:], base[i, 3:]).max() if i < m
                 else float("nan"))
            print(f" {v:>18.2e}", end="")
        print()
    print("\ncolumns 4+ are the per-species volume sums/maxima; "
          "'vs-golden' is this implementation against the committed "
          "golden, the rest are sub-cell perturbations against the "
          "baseline run.")


if __name__ == "__main__":
    main()
