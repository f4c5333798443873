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
        self.density_threshold = cfg.add_get(
            "output%density_threshold", 1e18,
            "Electron density threshold for detecting plasma regions "
            "(1/m3, will be scaled by gas density)")
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
        """Full observable log (output_log, ``m_output.f90:496-670``):
        streamer velocity, species sums, net charge, J.E, field/density
        maxima with locations, radial-field extrema (2D), Sato currents,
        plasma z-extent, tip field, cell counts and dt restrictions."""
        from ..physics import analysis
        fname = self.name + "_log.txt"
        t = sim.tree
        ndim = t.ndim
        max_fld, loc_fld = red.tree_max_cc(sim.cc, t, sim.i_electric_fld)
        max_ne, loc_ne = red.tree_max_cc(sim.cc, t, sim.i_electron)
        sum_ne = red.tree_sum_cc(sim.cc, t, sim.i_electron)
        sum_ni = red.tree_sum_cc(sim.cc, t, sim.i_1pos_ion)
        n_cells = red.n_leaf_cells(t)
        min_dx = float(t.lvl_dr(t.highest_lvl).min())

        # net charge: charge-weighted species sums + surface charge
        sum_elem_charge = 0.0
        ngas = sim.chem.n_gas_species
        for n in range(ngas, len(sim.chem.species_list)):
            q = sim.chem.species_charge[n]
            if q != 0:
                sum_elem_charge += q * red.tree_sum_cc(
                    sim.cc, t, sim.species_cc[n - ngas])
        if sim.surfaces is not None:
            sum_elem_charge += sim.surfaces.get_integral(
                sim.field.i_surf_dens)

        # plasma z-extent above a scaled density threshold
        thr = self.density_threshold * (
            sim.gas.number_density / 2.414e25) ** 2
        zlim = [float(sim.st.domain_origin[ndim - 1]
                      + sim.st.domain_len[ndim - 1]),
                float(sim.st.domain_origin[ndim - 1])]
        ne_zminmax = analysis.zmin_zmax_threshold(
            sim.cc, t, sim.i_electron, thr, zlim)

        # tip field: max E near the z-extent farthest from the boundary
        r0 = np.array(sim.st.domain_origin, np.float64)
        r1 = r0 + np.asarray(sim.st.domain_len)
        Lz = float(sim.st.domain_len[ndim - 1])
        oz = float(sim.st.domain_origin[ndim - 1])
        if ne_zminmax[0] - oz < oz + Lz - ne_zminmax[1]:
            r0[ndim - 1] = ne_zminmax[1] - 0.02 * Lz
            r1[ndim - 1] = ne_zminmax[1] + 0.02 * Lz
        else:
            r0[ndim - 1] = ne_zminmax[0] - 0.02 * Lz
            r1[ndim - 1] = ne_zminmax[0] + 0.02 * Lz
        max_field_tip, r_tip = analysis.max_var_region(
            sim.cc, t, sim.i_electric_fld, r0, r1)
        if r_tip is None:
            r_tip = np.zeros(ndim)

        user_names: list = []
        user_vals: list = []
        if sim.user is not None and sim.user.log_variables is not None:
            user_names, user_vals = sim.user.log_variables(sim)

        if out_cnt == 1 or not os.path.exists(fname):
            cols = ["it", "time", "dt", "v", "sum(n_e)", "sum(n_i)",
                    "sum(charge)", "sum(J.E)", "max(E)"]
            ax = ["x", "y", "z"][:ndim]
            cols += ax + ["max(n_e)"] + ax
            if ndim == 2:
                cols += ["max(E_r)", "x", "y", "min(E_r)"]
            cols += ["voltage", "current_J.E", "current_displ",
                     "ne_zmin", "ne_zmax", "max(Etip)"] + ax
            cols += ["wc_time", "n_cells", "min(dx)", "dt_cfl", "dt_diff",
                     "dt_drt", "dt_chem", "highest(lvl)"]
            cols += list(user_names)
            with open(fname, "w") as f:
                f.write(" ".join(cols) + "\n")

        vals = [sim.global_time, sim.global_dt, sim.velocity,
                sum_ne, sum_ni, sum_elem_charge, sim.global_JdotE,
                max_fld, *loc_fld, max_ne, *loc_ne]
        if ndim == 2:
            max_Er, loc_Er = red.tree_max_fc(sim.fc, t, 0, sim.field.fc_E)
            min_Er = red.tree_min_fc(sim.fc, t, 0, sim.field.fc_E)
            vals += [max_Er, *loc_Er, min_Er]
        vals += [sim.field.current_voltage, sim.global_JdotE_current,
                 sim.global_displ_current, *ne_zminmax,
                 max_field_tip, *r_tip, wc_time]
        with open(fname, "a") as f:
            f.write(f"{out_cnt:6d}"
                    + "".join(f" {float(v):19.8E}" for v in vals)
                    + f" {n_cells:11d}"
                    + "".join(f" {float(v):19.8E}" for v in
                              [min_dx, *sim.dt_limits])
                    + f" {t.highest_lvl:2d}"
                    + "".join(f" {float(v):19.8E}" for v in user_vals)
                    + "\n")

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
