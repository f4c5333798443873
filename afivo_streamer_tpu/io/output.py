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
        self.npz_write = cfg.add_get(
            "output%npz", False, "Write .npz grid output")
        self.write_vtk_files = cfg.add_get(
            "output%vtk", False, "Write VTK unstructured output")
        self.datfile_write = cfg.add_get(
            "datfile%write", False,
            "Write binary output files (dat files)")
        self.datfile_per_outputs = cfg.add_get(
            "datfile%per_outputs", 1,
            "Write binary output files every N outputs")
        # the Silo grid output of the reference maps to a compressed
        # per-box .npz dump of the leaves (m_output.f90 silo_write)
        self.silo_write = cfg.add_get(
            "silo_write", True,
            "Write grid output (per-box .npz, replaces the Silo files)")
        self.silo_per_outputs = cfg.add_get(
            "silo%per_outputs", 1, "Write grid output every N outputs")
        self.max_lvl = cfg.add_get(
            "output%max_lvl", 100,
            "Maximum refinement level in grid output")
        self.only = [s for s in cfg.add_get(
            "output%only", [""],
            "If non-empty, only output these variables") if s]
        self.surface_write = cfg.add_get(
            "dielectric%write", False,
            "Output surface related information (into the grid .npz)")
        self.status_delay = cfg.add_get(
            "output%status_delay", 60.0,
            "Interval between writing status line (s)")
        self.density_threshold = cfg.add_get(
            "output%density_threshold", 1e18,
            "Electron density threshold for detecting plasma regions "
            "(1/m3, will be scaled by gas density)")

        # secondary writers (output_initialize, m_output.f90:150-250)
        ndim = settings.domain_len.shape[0]
        self.lineout_write = cfg.add_get(
            "lineout%write", False,
            "Write output along a line")
        self.lineout_varname = cfg.add_get(
            "lineout%varname", ["e"],
            "Names of variable to write in lineout")
        self.lineout_npoints = cfg.add_get(
            "lineout%npoints", 500, "Use this many points for lineout data")
        self.lineout_rmin = np.asarray(cfg.add_get(
            "lineout%rmin", [0.0] * ndim,
            "Relative position of line minimum coordinate"), np.float64)
        self.lineout_rmax = np.asarray(cfg.add_get(
            "lineout%rmax", [1.0] * ndim,
            "Relative position of line maximum coordinate"), np.float64)
        self.plane_write = cfg.add_get(
            "plane%write", False, "Write uniform output in a plane")
        self.plane_varname = cfg.add_get(
            "plane%varname", ["e"], "Names of variable to write in plane")
        self.plane_npixels = cfg.add_get(
            "plane%npixels", [64, 64], "Use this many pixels for plane data")
        self.plane_rmin = np.asarray(cfg.add_get(
            "plane%rmin", [0.0] * ndim,
            "Relative position of plane minimum coordinate"), np.float64)
        self.plane_rmax = np.asarray(cfg.add_get(
            "plane%rmax", [1.0] * ndim,
            "Relative position of plane maximum coordinate"), np.float64)
        self.cross_write = cfg.add_get(
            "cross%write", False,
            "Write integral over cross-section data output")
        self.cross_rmax = cfg.add_get(
            "cross%rmax", 2.0e-3, "Integrate up to this radius")
        self.cross_npoints = cfg.add_get(
            "cross%npoints", 500,
            "Use this many points for cross-section data")
        self.field_maxima_write = cfg.add_get(
            "field_maxima%write", False,
            "Output electric field maxima and their locations")
        self.field_maxima_threshold = cfg.add_get(
            "field_maxima%threshold", 0.0,
            "Threshold value (V/m) for electric field maxima")
        self.field_maxima_distance = cfg.add_get(
            "field_maxima%distance", 0.0,
            "Minimal distance (m) between electric field maxima")

        # extra grid-output variables (m_output.f90:251-290)
        self.extra_vars: List[str] = []
        self._ev_tbl = None
        if cfg.add_get("output%electron_energy", False,
                       "Show the electron energy in eV from the local field "
                       "approximation"):
            # own E/N -> eV lookup read directly from the input file
            # (output_initialize, m_output.f90:251-264)
            from ..utils.table_data import table_from_file
            td_file = cfg.add_get("input_data%file", "UNDEFINED", "")
            x, y = table_from_file(td_file, "Mean energy (eV)")
            self._ev_tbl = (np.asarray(x), np.asarray(y))
            self.extra_vars.append("eV")
        if cfg.add_get("output%conductivity", False,
                       "Output the conductivity of the plasma"):
            self.extra_vars.append("sigma")
        if cfg.add_get("output%electron_current", False,
                       "Output the electron current"):
            for i in range(ndim):
                self.extra_vars.append(f"Je_{i + 1}")
        for nm in cfg.add_get("output%write_source", [""],
                              "Write chemistry source terms of these "
                              "species to output"):
            if nm:
                self.extra_vars.append(f"src_{nm}")
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

    # ------------------------------------------- secondary data writers
    def write_line(self, sim, out_cnt: int) -> None:
        """Sample variables along a line (af_write_line,
        ``afivo/src/m_af_output.f90:407-459``)."""
        from ..physics import analysis
        t = sim.tree
        ndim = t.ndim
        ivs = [sim.registry.cc_names.index(v) for v in self.lineout_varname]
        r_min = (self.lineout_rmin[:ndim] * sim.st.domain_len
                 + sim.st.domain_origin)
        r_max = (self.lineout_rmax[:ndim] * sim.st.domain_len
                 + sim.st.domain_origin)
        npts = self.lineout_npoints
        dr_vec = (r_max - r_min) / max(1, npts - 1)
        with open(f"{self.name}_line_{out_cnt:06d}.txt", "w") as f:
            f.write("# " + " ".join("xyz"[:ndim]) + " "
                    + " ".join(self.lineout_varname) + "\n")
            hi = t.r_base + np.asarray(t.domain_len) * (1 - 1e-12)
            for i in range(npts):
                r = np.minimum(np.maximum(r_min + i * dr_vec, t.r_base), hi)
                vals, ok = analysis.interp1(sim.cc, t, r, ivs)
                if not ok:
                    raise RuntimeError("write_line: interpolation error")
                f.write(" ".join(f"{x:.8E}" for x in list(r) + list(vals))
                        + "\n")

    def write_plane(self, sim, out_cnt: int) -> None:
        """Uniform plane resampling as a structured-points VTK file
        (af_write_plane, ``afivo/src/m_af_output.f90:465-551``)."""
        from ..physics import analysis
        t = sim.tree
        ndim = t.ndim
        ivs = [sim.registry.cc_names.index(v) for v in self.plane_varname]
        r_min = (self.plane_rmin[:ndim] * sim.st.domain_len
                 + sim.st.domain_origin)
        r_max = (self.plane_rmax[:ndim] * sim.st.domain_len
                 + sim.st.domain_origin)
        npx = self.plane_npixels
        dvec = r_max - r_min
        if ndim == 2:
            v1 = np.array([dvec[0], 0.0]) / (npx[0] - 1)
            v2 = np.array([0.0, dvec[1]]) / (npx[1] - 1)
            n_points = [npx[0], npx[1], 1]
            origin = [r_min[0], r_min[1], 0.0]
        else:
            dim_unused = int(np.argmin(np.abs(dvec)))
            axes = [k for k in range(3) if k != dim_unused]
            v1 = np.zeros(3)
            v1[axes[0]] = dvec[axes[0]] / (npx[0] - 1)
            v2 = np.zeros(3)
            v2[axes[1]] = dvec[axes[1]] / (npx[1] - 1)
            n_points = [1, 1, 1]
            n_points[axes[0]] = npx[0]
            n_points[axes[1]] = npx[1]
            origin = list(r_min)
        data = np.zeros((len(ivs), npx[0], npx[1]))
        hi_clip = t.r_base + np.asarray(t.domain_len) * (1 - 1e-12)
        for j in range(npx[1]):
            for i in range(npx[0]):
                r = r_min + i * v1[:ndim] + j * v2[:ndim]
                r = np.minimum(np.maximum(r, t.r_base), hi_clip)
                vals, ok = analysis.interp1(sim.cc, t, r, ivs)
                if not ok:
                    raise RuntimeError("write_plane: interpolation error")
                data[:, i, j] = vals
        spacing = (v1 + v2) if ndim == 3 else \
            [v1[0] + v2[0], v1[1] + v2[1], 0.0]
        with open(f"{self.name}_plane_{out_cnt:06d}.vtk", "w") as f:
            f.write("# vtk DataFile Version 2.0\n")
            f.write(f"{self.name}_plane_{out_cnt:06d}\n")
            f.write("ASCII\nDATASET STRUCTURED_POINTS\n")
            f.write("DIMENSIONS " + " ".join(map(str, n_points)) + "\n")
            f.write("ORIGIN " + " ".join(f"{x:.8E}" for x in origin) + "\n")
            f.write("SPACING " + " ".join(f"{x:.8E}" for x in spacing)
                    + "\n")
            f.write(f"POINT_DATA {int(np.prod(n_points))}\n")
            for k, v in enumerate(self.plane_varname):
                f.write(f"SCALARS {v} double 1\nLOOKUP_TABLE default\n")
                np.savetxt(f, data[k].T.reshape(-1, npx[0]), fmt="%.8E")

    def write_cross(self, sim, out_cnt: int) -> None:
        """Axisymmetric cross-section integrals vs z (output_cross)."""
        from ..physics import analysis
        with open(f"{self.name}_cross_{out_cnt:06d}.txt", "w") as f:
            f.write("z elec_dens charge_dens current_dens\n")
            for i in range(1, self.cross_npoints + 1):
                z = i * float(sim.st.domain_len[1]) / (self.cross_npoints + 1)
                e, q, j = analysis.get_cross(sim, self.cross_rmax, z)
                f.write(f"{z:.8E} {e:.8E} {q:.8E} {j:.8E}\n")

    def write_fld_maxima(self, sim, out_cnt: int) -> None:
        """Electric-field maxima with min-distance merging
        (output_fld_maxima, ``m_output.f90:..``)."""
        from ..physics import analysis
        n_max = 1000
        coord_val, n_found = analysis.get_maxima(
            sim.cc, sim.tree, sim.i_electric_fld,
            self.field_maxima_threshold, n_max)
        n_found = min(n_found, n_max)
        cv = coord_val[:n_found].copy()
        ndim = sim.tree.ndim
        # merge maxima closer than field_maxima_distance, keeping the larger
        n = n_found
        i_n = n
        while i_n >= 1:
            merged = False
            for i in range(i_n - 1):
                d = float(np.linalg.norm(cv[i, :ndim] - cv[i_n - 1, :ndim]))
                if d < self.field_maxima_distance:
                    if cv[i, ndim] < cv[i_n - 1, ndim]:
                        cv[i] = cv[i_n - 1]
                    cv[i_n - 1] = cv[n - 1]
                    n -= 1
                    merged = True
                    break
            i_n -= 1
        with open(f"{self.name}_Emax_{out_cnt:06d}.txt", "w") as f:
            for k in range(n):
                if cv[k, ndim] > self.field_maxima_threshold:
                    f.write(" ".join(f"{x:.8E}" for x in cv[k]) + "\n")

    def chemical_rates(self, sim, first_time: bool = False) -> None:
        """Append time + accumulated reaction rates (output_chemical_rates)."""
        fname = self.name + "_rates.txt"
        if first_time:
            if os.path.exists(fname):
                os.remove(fname)
            return
        with open(fname, "a") as f:
            f.write(f" {sim.global_time:.8E} " + " ".join(
                f"{x:.8E}" for x in np.atleast_1d(sim.global_rates)) + "\n")

    def chemical_amounts(self, sim, first_time: bool = False) -> None:
        """Append time + space-integrated species densities
        (output_chemical_amounts)."""
        fname = self.name + "_amounts.txt"
        if first_time:
            if os.path.exists(fname):
                os.remove(fname)
            return
        ngas = sim.chem.n_gas_species
        sums = []
        for n_i in range(len(sim.chem.species_list)):
            if n_i < ngas:
                sums.append(0.0)
            else:
                sums.append(red.tree_sum_cc(
                    sim.cc, sim.tree, sim.species_cc[n_i - ngas]))
        with open(fname, "a") as f:
            f.write(f" {sim.global_time:.8E} "
                    + " ".join(f"{x:.8E}" for x in sums) + "\n")

    def initial_summary(self, sim) -> None:
        """Model summary + chemistry listing files written once at startup
        (output_initial_summary, ``m_output.f90:294-306``)."""
        sim.chem.write_summary(self.name + "_summary.txt")
        with open(self.name + "_stoich_matrix.txt", "w") as f:
            S = sim.chem.stoich_matrix()
            for row in S.T:  # per species, columns = reactions
                f.write(" ".join(str(int(x)) for x in row) + "\n")
        with open(self.name + "_species.txt", "w") as f:
            for s in sim.chem.species_list:
                f.write(s + "\n")
            f.write("\n")
        with open(self.name + "_reactions.txt", "w") as f:
            for r in sim.chem.reactions:
                f.write(r.description + "\n")
            f.write("\n")
        self.chemical_rates(sim, first_time=True)
        self.chemical_amounts(sim, first_time=True)

    def extra_var_values(self, sim, name: str, b: int) -> np.ndarray:
        """Per-box values of a derived output variable (add_variables,
        ``m_output.f90:413-..``): eV, sigma, Je_i, src_<species>."""
        from .. import constants as uc
        from ..physics.transport_data import TD_MOBILITY, TD_ENERGY_EV
        cc = sim.cc
        if sim.gas.constant_density:
            N_inv = sim.gas.inverse_number_density
        else:
            N_inv = 1.0 / np.asarray(cc[sim.gasdyn.i_gas_dens, b])
        Td = (np.asarray(cc[sim.i_electric_fld, b])
              * uc.SI_to_Townsend * N_inv)
        if name == "eV":
            x, y = self._ev_tbl
            return np.interp(Td, x, y)
        if name == "sigma":
            return (np.asarray(sim.td.tbl.get_col(TD_MOBILITY, Td)) * N_inv
                    * np.asarray(cc[sim.i_electron, b]) * uc.elem_charge)
        if name.startswith("Je_"):
            idim = int(name[3:]) - 1
            t = sim.tree
            nc, ndim = t.nc, t.ndim
            sigma = (np.asarray(sim.td.tbl.get_col(TD_MOBILITY, Td)) * N_inv
                     * np.asarray(cc[sim.i_electron, b]) * uc.elem_charge)
            # cell-centered E component from face averages
            faxes = [np.arange(0, nc + 1) if k == idim else np.arange(0, nc)
                     for k in range(ndim)]
            fidx = sp.fc_flat(ndim, nc, *faxes)
            F = np.asarray(sim.fc[sim.fc_E, idim, b, fidx]).reshape(
                tuple(nc + 1 if k == idim else nc for k in range(ndim)))
            lo = tuple(slice(0, nc) if k == idim else slice(None)
                       for k in range(ndim))
            hi = tuple(slice(1, nc + 1) if k == idim else slice(None)
                       for k in range(ndim))
            Ecc = 0.5 * (F[lo] + F[hi])
            out = np.zeros((nc + 2,) * ndim)
            out[(slice(1, nc + 1),) * ndim] = (
                sigma.reshape((nc + 2,) * ndim)[(slice(1, nc + 1),) * ndim]
                * Ecc)
            return out.ravel()
        if name.startswith("src_"):
            species = name[4:]
            six = sim.chem.species_list.index(species)
            rates = sim.chem.get_rates(Td)
            ngas = sim.chem.n_gas_species
            ncols = ngas + len(sim.species_cc)
            dens = np.zeros((len(Td), ncols))
            for k in range(ngas):
                dens[:, k] = sim.gas.densities[k]
            for k, iv in enumerate(sim.species_cc):
                dens[:, ngas + k] = np.asarray(cc[iv, b])
            _, derivs = sim.chem.get_derivatives(dens, rates)
            return np.asarray(derivs[:, six])
        raise ValueError(f"unknown extra output variable {name}")

    def write_grid(self, sim, out_cnt: int) -> None:
        """Per-box grid dump of the leaves as a compressed .npz — the
        functional replacement of the reference's Silo output
        (af_write_silo): raw leaf blocks + box geometry, cost proportional
        to the number of cells. Reassemble with any AMR-aware plotting,
        or use write_npz for a uniform grid."""
        t = sim.tree
        nc, ndim = t.nc, t.ndim
        max_lvl = min(self.max_lvl, t.highest_lvl)
        names = [nm for iv, nm in enumerate(self.registry.cc_names)
                 if self.registry.cc_write_output[iv]
                 and (not self.only or nm in self.only)]
        ivs = [self.registry.cc_names.index(nm) for nm in names]
        leaves, lvls = [], []
        for lvl in range(1, max_lvl + 1):
            ls = np.asarray(t.lvl_leaves[lvl - 1])
            if lvl == max_lvl:
                # include boxes that are still refined beyond max_lvl
                ls = np.asarray(t.lvl_ids[lvl - 1])
            if len(ls):
                leaves.append(ls)
                lvls.append(np.full(len(ls), lvl))
        ids = np.concatenate(leaves)
        lvls = np.concatenate(lvls)
        data = {nm: np.asarray(sim.cc[iv, ids])
                for iv, nm in zip(ivs, names)}
        out = dict(
            box_id=ids, box_lvl=lvls, box_r_min=t.box_r_min(ids),
            dr_base=t.dr_base, nc=nc, ndim=ndim,
            coord=t.coord, time=sim.global_time, cycle=out_cnt,
            var_names=np.asarray(names), **data)
        if self.surface_write and sim.surfaces is not None:
            sds, sinfo = [], []
            for s in sim.surfaces.active():
                sds.append(s.sd)
                sinfo.append([s.id_out, s.id_in, s.direction])
            if sds:
                out["surface_sd"] = np.stack(sds)
                out["surface_info"] = np.asarray(sinfo)
        np.savez_compressed(f"{self.name}_grid_{out_cnt:06d}.npz", **out)

    def status(self, sim, wc_time: float) -> None:
        """output_status (``m_output.f90:852-867``): progress line plus the
        four time-step restrictions."""
        pct = 100.0 * sim.global_time / max(sim.st.end_time, 1e-300)
        print(f"{self.name}: {pct:.1f}% it={sim.it} t={sim.global_time:.3E} "
              f"dt={sim.global_dt:.3E} wc={wc_time:.1f}s "
              f"ncell={red.n_leaf_cells(sim.tree)} "
              f"lvl={sim.tree.highest_lvl}", flush=True)
        print("         dt: "
              + " ".join(f"{float(v):10.3E}" for v in sim.dt_limits)
              + " (cfl drt chem other)", flush=True)

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
        interior = sp.interior_flat(ndim, nc)

        def fill_grid(values_of_box):
            grid = np.zeros(shape)
            for ll in range(1, t.highest_lvl + 1):
                leaves = np.asarray(t.lvl_leaves[ll - 1])
                if len(leaves) == 0:
                    continue
                scale = 2 ** (lvl - ll)
                for b in leaves:
                    vals = values_of_box(int(b)).reshape((nc,) * ndim)
                    for k in range(ndim):
                        vals = np.repeat(vals, scale, axis=k)
                    ix0 = t.ix[b] * nc * scale
                    slc = tuple(slice(int(ix0[k]), int(ix0[k] + nc * scale))
                                for k in range(ndim))
                    grid[slc] = vals
            return grid

        for iv, name in enumerate(self.registry.cc_names):
            if not self.registry.cc_write_output[iv]:
                continue
            out[name] = fill_grid(
                lambda b: np.asarray(sim.cc[iv, b])[interior])
            names.append(name)
        for name in self.extra_vars:
            out[name] = fill_grid(
                lambda b: self.extra_var_values(sim, name, b)[interior])
            names.append(name)
        np.savez_compressed(f"{self.name}_{out_cnt:06d}.npz",
                            r_min=t.r_base,
                            r_max=t.r_base + t.domain_len, **out)
