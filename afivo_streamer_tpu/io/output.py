"""Simulation output: regression log, text log, status, npz grids.

Re-implements the reference's ``src/m_output.f90``: the regression-test log
with per-species volume-averaged sum(n), sum(n^2), max(n) at every output
time (output_regression_log ``:783-837``), the per-output streamer
observable log (output_log ``:496-670``, core subset here), stdout status
(output_status ``:852-867``), and a uniform-grid .npz writer replacing the
Silo output (af_write_numpy, ``afivo/src/m_af_output.f90:756-898``).
"""

from __future__ import annotations

import os
import time as _time
from typing import List, Optional

import numpy as np

from ..core import reductions as red
from ..core import spatial as sp


class Output:
    def __init__(self, cfg, settings, registry):
        self.name = cfg.add_get("output%name", "output/sim",
                                "Name for the output files (e.g. output/sim)")
        self.dt = cfg.add_get("output%dt", 1.0e-10,
                              "The timestep for writing output (s)")
        self.dt_factor_pulse_off = cfg.add_get(
            "output%dt_factor_pulse_off", 1,
            "Output dt multiplier when the voltage is off")
        self.write_log = cfg.add_get("output%log", True,
                                     "Write a log file with observables")
        self.regression_test = cfg.add_get(
            "output%regression_test", False,
            "Write a regression-test log")
        self.write_npz = cfg.add_get(
            "output%npz", False, "Write .npz grid output")
        self.write_vtk_files = cfg.add_get(
            "output%vtk", False, "Write VTK unstructured output")
        self.datfile_write = cfg.add_get(
            "output%datfile_write", False,
            "Write full-state checkpoints (datfiles) at every output")
        self.datfile_per_outputs = cfg.add_get(
            "output%datfile_per_outputs", 1,
            "Write checkpoints every N outputs")
        self.status_delay = cfg.add_get(
            "output%status_delay", 60.0,
            "Interval between writing status line (s)")
        self.registry = registry
        os.makedirs(os.path.dirname(self.name) or ".", exist_ok=True)
        self._wall_start = _time.time()

    # --------------------------------------------------- regression log
    def regression_log(self, sim, out_cnt: int) -> None:
        """output_regression_log (``m_output.f90:783-837``)."""
        fname = self.name + "_rtest.log"
        species = sim.chem.species_list
        vol = sim.tree.total_volume()
        sums, sums2, maxs = [], [], []
        ngas = sim.chem.n_gas_species
        for n, name in enumerate(species):
            if n < ngas:  # gas species are not stored in the tree
                sums.append(0.0)
                sums2.append(0.0)
                maxs.append(0.0)
                continue
            iv = sim.species_cc[n - ngas]
            sums.append(red.tree_sum_cc(sim.cc, sim.tree, iv) / vol)
            sums2.append(red.tree_sum_cc(sim.cc, sim.tree, iv, power=2) / vol)
            maxs.append(red.tree_max_cc(sim.cc, sim.tree, iv)[0])
        if out_cnt == 0:
            with open(fname, "w") as f:
                f.write("it time dt")
                for n in species:
                    f.write(f" sum({n})")
                for n in species:
                    f.write(f" sum({n}^2)")
                for n in species:
                    f.write(f" max({n})")
                f.write("\n")
        with open(fname, "a") as f:
            f.write(f"{out_cnt}")
            for v in ([sim.global_time, sim.global_dt] + sums + sums2 + maxs):
                f.write(f" {v:20.8E}")
            f.write("\n")

    # ----------------------------------------------------------- log
    def log(self, sim, out_cnt: int, wc_time: float) -> None:
        """Core subset of output_log (``m_output.f90:496-670``)."""
        fname = self.name + "_log.txt"
        max_fld, loc_fld = red.tree_max_cc(sim.cc, sim.tree,
                                           sim.i_electric_fld)
        max_ne, _ = red.tree_max_cc(sim.cc, sim.tree, sim.i_electron)
        sum_ne = red.tree_sum_cc(sim.cc, sim.tree, sim.i_electron)
        sum_ni = red.tree_sum_cc(sim.cc, sim.tree, sim.i_1pos_ion)
        n_cells = red.n_leaf_cells(sim.tree)
        min_dx = float(sim.tree.lvl_dr(sim.tree.highest_lvl).min())
        if out_cnt == 1 or not os.path.exists(fname):
            with open(fname, "w") as f:
                f.write("it time dt v sum(n_e) sum(n_i) max(E) "
                        + " ".join(f"x{k}" for k in range(sim.tree.ndim))
                        + " max(n_e) voltage current_JdotE wc_time n_cells "
                        "min(dx) dt_cfl dt_drt dt_chem highest(lvl)\n")
        with open(fname, "a") as f:
            vals = ([out_cnt, sim.global_time, sim.global_dt, sim.velocity,
                     sum_ne, sum_ni, max_fld] + list(loc_fld)
                    + [max_ne, sim.field.current_voltage,
                       sim.global_JdotE_current, wc_time, n_cells, min_dx]
                    + list(sim.dt_limits[:3]) + [sim.tree.highest_lvl])
            f.write(" ".join(f"{v:.10E}" if isinstance(v, float)
                             else str(v) for v in vals) + "\n")

    def status(self, sim, wc_time: float) -> None:
        """output_status (``m_output.f90:852-867``)."""
        pct = 100.0 * sim.global_time / max(sim.st.end_time, 1e-300)
        print(f"{self.name}: {pct:.1f}% it={sim.it} t={sim.global_time:.3E} "
              f"dt={sim.global_dt:.3E} wc={wc_time:.1f}s "
              f"ncell={red.n_leaf_cells(sim.tree)} "
              f"lvl={sim.tree.highest_lvl}", flush=True)

    # ----------------------------------------------------------- npz
    def write_npz(self, sim, out_cnt: int) -> None:
        """Uniform-grid output at the finest level covering the domain
        (af_write_numpy analog)."""
        t = sim.tree
        nc, ndim = t.nc, t.ndim
        lvl = t.highest_lvl
        shape = tuple(int(x) for x in t.coarse_grid_size * 2 ** (lvl - 1))
        out = {}
        names = []
        for iv, name in enumerate(self.registry.cc_names):
            if not self.registry.cc_write_output[iv]:
                continue
            grid = np.zeros(shape)
            # fill from leaves, prolonging by pixel replication
            interior = sp.interior_flat(ndim, nc)
            for ll in range(1, t.highest_lvl + 1):
                leaves = np.asarray(t.lvl_leaves[ll - 1])
                if len(leaves) == 0:
                    continue
                scale = 2 ** (lvl - ll)
                vals = np.asarray(sim.cc[iv, leaves[:, None],
                                         interior[None, :]])
                vals = vals.reshape((len(leaves),) + (nc,) * ndim)
                for k in range(ndim):
                    vals = np.repeat(vals, scale, axis=1 + k)
                for n_i, b in enumerate(leaves):
                    ix0 = t.ix[b] * nc * scale
                    slc = tuple(slice(int(ix0[k]), int(ix0[k] + nc * scale))
                                for k in range(ndim))
                    grid[slc] = vals[n_i]
            out[name] = grid
            names.append(name)
        np.savez_compressed(f"{self.name}_{out_cnt:06d}.npz",
                            r_min=t.r_base,
                            r_max=t.r_base + t.domain_len, **out)
