"""Simulation driver: module wiring + adaptive-dt main loop.

Port of the reference's ``src/streamer.f90``: module initialization order
(initialize_modules ``:429-458``), initial-condition setup with
refine-to-converged field loop (set_initial_conditions ``:460-519``), and
the main loop (``:177-415``) with output cadence, step rejection and retry
(up to 10 attempts), global rate accounting, per-N-step refinement with
field recomputation, and the computational cost breakdown.
"""

from __future__ import annotations

import os
import time as _time
from typing import Dict, List, Optional

import numpy as np

from . import constants as uc
from .core import ghostcell as gc
from .core import prolong_restrict as pr
from .core import spatial as sp
from .core import reductions as red
from .core.batch import BoxBatch
from .core.tree import Tree
from .io.output import Output
from .ops.limiters import NAME_TO_LIMITER
from .physics import advance as adv
from .physics.chemistry import Chemistry
from .physics.dt_control import DtConfig
from .physics.field import FieldSolver
from .physics.fluid import FluidModel, FluidIndices
from .physics.gas import Gas
from .physics.init_cond import InitCond
from .physics.model import Model
from .physics.photoi import Photoionization
from .physics.gas_dynamics import GasDynamics
from .physics.coupling import Coupling
from .physics.user_methods import UserMethods, load_user_module
from .physics.dielectric import Dielectric
from .solvers.surface import Surfaces
from .physics.refine import RefineSettings, RefineCriterion
from .physics.streamer import (Registry, StreamerSettings,
                               bc_species_neumann_zero,
                               bc_species_dirichlet_zero)
from .physics.transport_data import TransportData
from .utils.config import CFG
from .utils.table_data import TableDataSettings

MAX_ATTEMPTS_PER_TIME_STEP = 10  # streamer.f90:27


class Simulation:
    def __init__(self, argv: Optional[List[str]] = None,
                 cfg: Optional[CFG] = None, ndim: Optional[int] = None):
        if cfg is None:
            cfg = CFG()
            if argv:
                cfg.update_from_arguments(argv)
        self.cfg = cfg
        if ndim is None:
            ndim = cfg.add_get("ndim", 2, "Number of spatial dimensions")
        self.ndim = ndim

        # ---- module initialization (initialize_modules order,
        # streamer.f90:439-455: model, user, dt, tables, gas, ...)
        self.model = Model(cfg)
        self.user = UserMethods()
        load_user_module(cfg, self)
        self.dt_cfg = DtConfig(cfg)
        table_settings = TableDataSettings(cfg)
        self.gas = Gas(cfg)
        if self.user.gas_density is not None and not self.gas.dynamics:
            # gas density given by a user function (m_gas.f90:146-148)
            self.gas.constant_density = False
        self.td = TransportData(cfg, self.gas, table_settings,
                                self.model.has_energy_equation)
        self.chem = Chemistry(self.gas, self.td, self.td.file,
                              table_settings,
                              self.model.has_energy_equation, cfg)
        self.st = StreamerSettings(cfg, ndim)
        self.refine_cfg = RefineSettings(cfg, ndim)

        # ---- variable registration (ST_initialize / chemistry_initialize)
        reg = Registry()
        self.registry = reg
        n_copies = self.dt_cfg.num_steps + 1
        self.species_cc: List[int] = []
        ngas = self.chem.n_gas_species
        for name in self.chem.species_list[ngas:]:
            self.species_cc.append(reg.add_cc(name, n_copies=n_copies))
        self.all_densities = list(self.species_cc)
        self.i_electron = self.species_cc[
            self.chem.species_list.index("e") - ngas]
        # first positive ion: charge exactly +1 (m_streamer.f90:226-235)
        pos = [i for i, q in enumerate(self.chem.species_charge)
               if q == 1 and i >= ngas]
        if not pos:
            raise ValueError("No positive ion species present")
        self.i_1pos_ion = self.species_cc[pos[0] - ngas]
        self.i_phi = reg.add_cc("phi", n_copies=2)
        self.i_electric_fld = reg.add_cc("electric_fld")
        self.i_rhs = reg.add_cc("rhs")
        self.i_tmp = reg.add_cc("tmp", write_out=False)
        # optional power-density output variable (m_streamer.f90:336-341)
        self.compute_power_density = cfg.add_get(
            "compute_power_density", False,
            "Whether to compute the deposited power density")
        self.i_power_density = (reg.add_cc("power_density")
                                if self.compute_power_density else -1)
        # optional source-factor output variable (m_streamer.f90:438-440)
        self.i_srcfac = -1
        if self.st.source_factor != "none" and cfg.add_get(
                "fixes%write_source_factor", False,
                "Whether to write the source factor to the output"):
            self.i_srcfac = reg.add_cc("srcfac")
        self.i_lsf = reg.add_cc("lsf") if self.st.use_electrode else -1
        self.i_eps = -1
        self.i_surf_photon = self.i_surf_sigma = -1
        if self.st.use_dielectric:
            self.i_eps = reg.add_cc("eps")
            reg.set_cc_methods(self.i_eps,
                               lambda iv, d, c, p: (gc.BC_NEUMANN, 0.0),
                               rb=gc.RB_PROLONG_COPY, prolong="zeroth")
            # surface state as cc rows for the compiled engine: photon
            # flux + sigma time states stored at the gas-side box row
            # (solvers/surface.py SurfacePack); no gc/prolong methods —
            # refinement moves surface data via update_after_refinement
            self.i_surf_photon = reg.add_cc("surf_photon", write_out=False)
            self.i_surf_sigma = reg.add_cc(
                "surf_sigma", n_copies=self.dt_cfg.num_steps + 1,
                write_out=False)

        # electron energy density (appended to the species list by the
        # chemistry module; flux variable 2, m_streamer.f90:244-269)
        self.i_electron_energy = -1
        if self.model.has_energy_equation:
            self.i_electron_energy = self.species_cc[
                self.chem.species_list.index("e_energy") - ngas]

        # face-centered variables
        self.fc_flux: List[int] = [reg.add_fc("flux_elec")]
        self.flux_species = [self.i_electron]
        self.flux_charge_sign = [-1]
        if self.model.has_energy_equation:
            self.fc_flux.append(reg.add_fc("flux_energy"))
            self.flux_species.append(self.i_electron_energy)
            self.flux_charge_sign.append(-1)  # upwind direction only
        for nm in self.td.mobile_ion_names:
            simple = nm
            six = self.chem.species_list.index(simple)
            self.flux_species.append(self.species_cc[six - ngas])
            self.flux_charge_sign.append(
                1 if self.chem.species_charge[six] > 0 else -1)
            self.fc_flux.append(reg.add_fc(f"flux_{simple}"))
        self.fc_E = reg.add_fc("electric_fld")

        # ---- tree (the batch is created after all variables are known)
        self.tree = Tree(ndim, self.st.box_size, self.st.domain_len,
                         self.st.coarse_grid_size, periodic=self.st.periodic,
                         coord=self.st.coord, r_min=self.st.domain_origin)

        # ---- species BCs and methods
        if self.st.species_boundary_condition == "neumann_zero":
            self.bc_species = bc_species_neumann_zero
        elif self.st.species_boundary_condition == "dirichlet_zero":
            self.bc_species = lambda iv, d, c, p: bc_species_dirichlet_zero(
                iv, d, c, p, ndim=ndim)
        else:
            raise ValueError("Unknown species_boundary_condition")
        for iv in self.all_densities:
            reg.set_cc_methods(iv, self.bc_species, rb=gc.RB_INTERP_LIM,
                               prolong=self.st.prolong_density)

        # ---- field solver
        ch_ix, ch_q = self.chem.charged_species
        charged_cc = [self.species_cc[i - ngas] for i in ch_ix]
        self.field = FieldSolver(cfg, self.tree, self.st, reg, self.i_phi,
                                 self.i_rhs, self.i_tmp, self.i_electric_fld,
                                 self.fc_E, charged_cc, ch_q)
        if self.st.use_dielectric:
            self.field.mg.eps_data = self._eps_level_data
            self.field.i_eps = self.i_eps
        # user hooks into the field solver (m_field.f90:216-219, 323-333,
        # 515-519)
        if self.user.potential_bc is not None:
            self.field.user_potential_bc = self.user.potential_bc
        if self.user.field_amplitude is not None:
            self.field.user_field_amplitude = \
                lambda t: self.user.field_amplitude(self, t)
        if self.st.use_electrode and self.field.electrode_type == "user":
            self.field.set_user_lsf(self.user.lsf, self.user.lsf_bc)
        reg.set_cc_methods(self.i_phi, self.field.phi_bc, rb=gc.RB_MG,
                           prolong="linear")
        reg.set_cc_methods(self.i_electric_fld, bc_species_neumann_zero,
                           rb=gc.RB_INTERP, prolong="linear")

        # ---- gas dynamics (registers Euler variables + M)
        self.gasdyn = None
        self.coupling = None
        self.i_gas_dens_user = -1
        if self.gas.dynamics:
            self.gasdyn = GasDynamics(self.tree, self.gas, reg, self.dt_cfg,
                                      self.st)
        elif self.user.gas_density is not None:
            # gas density from a user function stored in "M"
            # (streamer.f90:92-95 funcval)
            self.i_gas_dens_user = reg.add_cc("M")

        # ---- photoionization (registers i_photo and helmholtz modes)
        self.photoi = Photoionization(cfg, self.tree, reg, self.gas, self.td,
                                      self.chem, self.st, self.i_rhs,
                                      self.i_tmp, self.i_electron,
                                      self.i_electric_fld)
        if self.photoi.enabled:
            self.photoi.species_cc = self.species_cc[
                self.photoi.species_index - ngas]
            if self.photoi.source_type == "from_species":
                exc_ix = self.chem.species_index(self.photoi.excited_species)
                self.photoi.i_excited_cc = self.species_cc[exc_ix - ngas]

        # ---- storage (all cc/fc variables registered by now)
        self.batch = BoxBatch(self.tree, reg.n_cc, reg.n_fc)
        self.cc = np.array(self.batch.cc)  # host (NumPy) state by default
        self.fc = np.array(self.batch.fc)

        # ---- initial conditions, refinement, output
        self.init_cond = InitCond(cfg, self.st, reg, self.i_electron,
                                  self.i_1pos_ion)
        # resolve custom species names to cc indices (m_init_cond:120-139)
        for names, attr in ((self.init_cond.seed1_species_names,
                             "seed1_species"),
                            (self.init_cond.background_species_names,
                             "background_species")):
            setattr(self.init_cond, attr,
                    [reg.cc_names.index(nm) for nm in names])
        self.refiner = RefineCriterion(self.refine_cfg, self.tree, self.td,
                                       self.gas, self.init_cond,
                                       self.i_electric_fld, self.i_electron,
                                       lsf_data=self.field.lsf_data)
        self.output = Output(cfg, self.st, reg)

        # ---- fluid model
        idx = FluidIndices(
            i_electron=self.i_electron, i_1pos_ion=self.i_1pos_ion,
            i_electric_fld=self.i_electric_fld, fc_E=self.fc_E,
            flux_species=self.flux_species, flux_fc=self.fc_flux,
            flux_charge_sign=np.asarray(self.flux_charge_sign, np.float64),
            all_densities=self.all_densities, species_cc=self.species_cc,
            i_photo=self.photoi.i_photo if self.photoi.enabled else -1,
            photoi_species_cc=(self.photoi.species_cc
                               if self.photoi.enabled else -1),
            i_gas_dens=(self.gasdyn.i_gas_dens if self.gasdyn is not None
                        else self.i_gas_dens_user),
            i_electron_energy=self.i_electron_energy,
            i_srcfac=self.i_srcfac)
        self.fluid = FluidModel(
            self.tree, idx, self.chem, self.td, self.gas, self.bc_species,
            self.dt_cfg, self.st,
            prolong_limiter=pr.default_prolong_limiter(ndim))
        self.fluid.field_compute = self._field_compute_cb
        if (self.st.use_electrode or self.st.use_dielectric
                or self.st.plasma_region_enabled):
            self.fluid.mask_provider = self._level_mask
        self._mask_cache = {}
        if self.gasdyn is not None:
            self.coupling = Coupling(self.tree, self.gas, self.gasdyn, idx,
                                     reg, charged_cc, ch_q)

        # runtime state
        self.it = 0
        self.out_cnt = 0  # resumed on restart (streamer.f90:527,546)
        self.global_time = 0.0
        self.global_dt = self.dt_cfg.dt_min
        self.dt_limits = np.full(4, 1e100)
        self.velocity = 0.0
        self.prev_emax_pos = None
        self.prev_emax_time = 0.0
        self.global_rates = np.zeros(self.chem.n_reactions)
        self.global_JdotE = 0.0
        self.global_JdotE_current = 0.0
        self.global_displ_current = 0.0
        # compiled runs attribute the fused flux+chemistry+update substep
        # dispatch to "advance" (the host path splits flux/source like the
        # reference, m_streamer.f90:181-187); timing boundaries block on
        # the device result so every bucket is real device time
        self.wc = {k: 0.0 for k in ("flux", "source", "advance", "copy",
                                    "field", "output", "refine", "photoi")}
        # finer-grained sub-phase timers (disjoint slices INSIDE the wc
        # buckets above; diagnostic only — bench.py emits them as
        # wc_detail so a partial artifact still says where the host
        # seconds went: dispatch vs blocked pull vs epoch sub-phases)
        self.wc2 = {}
        self.fluid.wc = self.wc
        self._photoi_prev_time = 0.0
        self.refine_prepulse_time = cfg.add_get(
            "refine_prepulse_time", 1.0e-9,
            "Start refining electrode some time before the next pulse")
        self.electrode_derefine_factor = cfg.add_get(
            "electrode_derefine_factor", 1.0,
            "Multiplication factor to derefine electrode during interpulse")
        self.refiner.current_electrode_dx = self.refine_cfg.electrode_dx

        # compiled mode: run the inner time step through jitted device
        # units with the epoch pack as a runtime argument (parallel/
        # compiled.py, core/treepack.py); refinement epochs with equal
        # bucket shapes reuse the compiled executables
        self.compiled_mode = cfg.add_get(
            "compiled%enabled", False,
            "Run the inner time step through jitted device units")
        self.compiled_dtype = cfg.add_get(
            "compiled%dtype", "float64",
            "Device dtype of the compiled step (float64 or float32; f64 "
            "is emulated ~50x slower on TPU)")
        self.compiled_fused = cfg.add_get(
            "compiled%fused", True,
            "Fuse each full time step (state copy, rejection loop, "
            "substeps, field solves, diagnostics) into ONE device "
            "dispatch; F falls back to per-unit dispatches with blocked "
            "per-phase timers (the profiling mode)")
        self.compiled_shards = cfg.add_get(
            "compiled%shards", 0,
            "Shard the compiled run over this many devices (power of "
            "two; 0 = single device): the SoA box axis is laid out over "
            "a jax.sharding.Mesh, plans are replicated, and halo "
            "gathers / multigrid transfers / reductions become XLA "
            "collectives — the TPU-native analog of the reference's "
            "OpenMP box-loop parallelism")
        self.compiled_prepad = cfg.add_get(
            "compiled%prepad", 1.0,
            "Bucket-headroom factor for the compiled engine: pad every "
            "topology table to this multiple of its initial size so AMR "
            "growth does not change compiled shapes (a retrace of the "
            "fused step costs minutes of XLA compile; padded device work "
            "is nearly free in the latency-bound regime)")
        self.compiled_warm = cfg.add_get(
            "compiled%warm_next_level", "auto",
            "Pre-compile the fused step's executable for the NEXT "
            "refinement level in a background thread (phantom epoch "
            "pack, core/treepack.py): when AMR adds a level mid-run, "
            "the jit cache already holds the executable instead of "
            "stalling the loop for minutes of XLA compile. "
            "auto = on for the TPU backend only; T/F force")
        self._compiled_on = False
        self._warmed = set()

        self.surfaces = None
        self.dielectric = None
        restart_from = cfg.add_get(
            "restart_from_file", "UNDEFINED",
            "If set, restart simulation from a previous checkpoint")
        if restart_from != "UNDEFINED":
            if self.st.use_dielectric:
                # surface state is not in the checkpoint (streamer.f90:138)
                raise ValueError("Restarting not support with dielectric")
            from .io.checkpoint import read_checkpoint
            self._sync_capacity()
            read_checkpoint(restart_from, self)
        else:
            self.setup_initial_conditions()

    # ------------------------------------------------------------ helpers
    def _field_compute_cb(self, cc, fc, s_in, time, have_guess, params):
        return self.field.compute(cc, fc, s_in, time, have_guess, params)

    def _eps_level_data(self, lvl):
        if self.i_eps < 0:
            return None
        ids = np.asarray(self.tree.lvl_ids[lvl - 1])
        return np.asarray(self.cc[self.i_eps, ids])

    def _fill_user_gas_density(self, ids):
        """Fill "M" from the user gas-density function, incl. ghost cells
        (set_gas_density_from_user_function, streamer.f90:672-681)."""
        if self.i_gas_dens_user < 0:
            return
        for b in ids:
            coords = self.tree.cell_coords(int(b))
            self.cc[self.i_gas_dens_user, int(b)] = np.asarray(
                self.user.gas_density(self, coords)).ravel()

    def _fill_lsf(self, ids):
        """Evaluate the level-set function on boxes (funcval variable,
        set_lsf_box in m_field.f90): all cells incl. one ghost layer."""
        if self.i_lsf < 0 or self.field.lsf_data is None:
            return
        for b in ids:
            coords = self.tree.cell_coords(int(b))
            self.cc[self.i_lsf, int(b)] = self.field.lsf_data.lsf(
                coords.reshape(-1, self.ndim))

    def _level_mask(self, cc, lvl, leaves):
        """Cell mask for the fluid update (set_box_mask,
        m_fluid.f90:469-515). Host path: precomputed per epoch. Traced
        (compiled) path: derived in-trace from the lsf/eps cc variables,
        so the same jit executable stays correct across epochs."""
        if not isinstance(cc, np.ndarray):
            import jax.numpy as jnp
            nc, ndim = self.tree.nc, self.tree.ndim
            interior = jnp.asarray(sp.interior_flat(ndim, nc))
            lv = jnp.asarray(sp.aix(leaves))
            mask = jnp.ones((len(leaves), nc ** ndim), bool)
            if self.st.use_electrode and self.i_lsf >= 0:
                lsf_in = cc[self.i_lsf, lv[:, None], interior[None, :]]
                mask = mask & (lsf_in > 0.0)
            if self.st.use_dielectric and self.i_eps >= 0:
                eps_in = cc[self.i_eps, lv[:, None], interior[None, :]]
                mask = mask & (jnp.abs(eps_in - 1.0) <= 1e-10)
            if self.st.plasma_region_enabled:
                # cell coordinates from the pack's leaf_r0 table (runtime
                # argument, so the executable survives AMR epochs)
                tb = self.fluid._tb(lvl)
                dr = self.tree.lvl_dr(lvl)
                r0 = jnp.asarray(tb.leaf_r0)
                n = len(leaves)
                inside = jnp.ones((n,) + (nc,) * ndim, bool)
                i_cc = np.arange(1, nc + 1) - 0.5
                for k in range(ndim):
                    ck = (r0[:, k].reshape((n,) + (1,) * ndim)
                          + jnp.asarray(i_cc * float(dr[k])).reshape(
                              (1,) + tuple(nc if j == k else 1
                                           for j in range(ndim))))
                    inside = inside & (
                        (ck >= self.st.plasma_region_rmin[k])
                        & (ck <= self.st.plasma_region_rmax[k]))
                mask = mask & inside.reshape(n, -1)
            return mask
        return self._level_mask_host(lvl)

    def _level_mask_host(self, lvl):
        """Cell mask for the fluid update (set_box_mask)."""
        key = (self.tree.epoch, lvl)
        if key in self._mask_cache:
            return self._mask_cache[key]
        self._mask_cache = {k: v for k, v in self._mask_cache.items()
                            if k[0] == self.tree.epoch}
        t = self.tree
        nc, ndim = t.nc, t.ndim
        leaves = np.asarray(t.lvl_leaves[lvl - 1])
        C = nc ** ndim
        mask = np.ones((len(leaves), C), dtype=bool)
        if self.st.use_electrode and self.field.lsf_data is not None:
            data = self.field.lsf_data.level_data(lvl)
            lookup = {int(b): i for i, b in enumerate(data["ids"])}
            pos = np.array([lookup[int(b)] for b in leaves], np.int64)
            mask &= data["lsf_cc"][pos] > 0.0
        if self.st.use_dielectric and self.i_eps >= 0:
            # no species update inside a dielectric (m_fluid.f90:486-491)
            interior = sp.interior_flat(ndim, nc)
            eps_in = np.asarray(self.cc[self.i_eps, leaves[:, None],
                                        interior[None, :]])
            mask &= np.abs(eps_in - 1.0) <= 1e-10
        if self.st.plasma_region_enabled:
            for n_i, b in enumerate(leaves):
                coords = t.cell_coords(int(b))[
                    (slice(1, nc + 1),) * ndim].reshape(-1, ndim)
                inside = np.all((coords >= self.st.plasma_region_rmin)
                                & (coords <= self.st.plasma_region_rmax),
                                axis=-1)
                mask[n_i] &= inside
        self._mask_cache[key] = mask
        return mask

    def _set_electrode_densities(self):
        """Species boundary conditions at the electrode
        (electrode_species_bc, streamer.f90:520-569): zero densities inside,
        and for Neumann species BCs set the electron density in boundary
        cells to the average of the neighbors outside the electrode."""
        t = self.tree
        nc, ndim = t.nc, t.ndim
        from .core import spatial as spx
        interior = spx.interior_flat(ndim, nc)
        neumann = self.st.species_boundary_condition == "neumann_zero"
        for lvl in range(1, t.highest_lvl + 1):
            data = self.field.lsf_data.level_data(lvl)
            sel = np.nonzero(data["has_bnd"])[0]
            if len(sel) == 0:
                continue
            boxes = data["ids"][sel]
            n = len(boxes)
            shape = (n,) + (nc + 2,) * ndim
            lsf_b = self.cc[self.i_lsf, boxes].reshape(shape)
            itr = (slice(None),) + (slice(1, nc + 1),) * ndim
            inside = lsf_b[itr] < 0
            for iv in self.all_densities:
                vals = self.cc[iv, boxes[:, None], interior[None, :]]
                vals = np.where(inside.reshape(n, -1), 0.0, vals)
                self.cc[iv, boxes[:, None], interior[None, :]] = vals
            if neumann:
                ne = self.cc[self.i_electron, boxes].reshape(shape)
                num = 0.0
                den = 0.0
                for d in range(ndim):
                    for delta in (-1, 1):
                        sl = [slice(1, nc + 1)] * ndim
                        sl[d] = slice(1 + delta, nc + 1 + delta)
                        sl = (slice(None),) + tuple(sl)
                        out_nb = lsf_b[sl] > 0
                        num = num + np.where(out_nb, ne[sl], 0.0)
                        den = den + out_nb
                at_bnd = inside & (den > 0)
                avg = num / np.maximum(den, 1)
                import os as _os
                if _os.environ.get("AFIVO_EMIT_SCALE"):
                    # diagnostic knob: scale the numerical emission value
                    # (cathode-sheath sensitivity probe, see README)
                    avg = avg * float(_os.environ["AFIVO_EMIT_SCALE"])
                ne_new = np.where(at_bnd, avg, ne[itr]).reshape(n, -1)
                self.cc[self.i_electron, boxes[:, None],
                        interior[None, :]] = ne_new
                ni = self.cc[self.i_1pos_ion, boxes[:, None],
                             interior[None, :]]
                self.cc[self.i_1pos_ion, boxes[:, None],
                        interior[None, :]] = np.where(
                            at_bnd.reshape(n, -1), ne_new, ni)

    def _electrode_bnd_boxes(self, lvl, trash):
        """Padded id table of the boxes containing the electrode boundary
        at one level (for the compiled electrode_species_bc unit)."""
        from .core import treepack as tp
        data = self.field.lsf_data.level_data(lvl)
        boxes = data["ids"][np.nonzero(data["has_bnd"])[0]].astype(np.int32)
        nb = tp.bucket_hwm(self.tree, ("ebnd", lvl), len(boxes))
        return tp.pad_ids(boxes, nb, trash)

    def _jit_electrode_densities(self):
        """Compiled electrode_species_bc (streamer.f90:520-569): zero
        densities inside the electrode; for Neumann species BCs set the
        boundary-cell electron density to the average of the neighbors
        outside. The per-level boundary-box tables are runtime jit
        arguments (fingerprint-cached, device-resident); the lsf values
        are read in-trace from the i_lsf cc variable."""
        import os as _os
        import jax
        import jax.numpy as jnp
        from .core import treepack as tp
        t = self.tree
        pad, trash = self.fluid._jit_cfg
        gen = t.__dict__.get("_bucket_gen", 0)
        tables = tuple(
            tp.cached_plan(
                t, ("ebnd", l, tp.level_fingerprint(t, l), trash, gen),
                lambda l=l: self._electrode_bnd_boxes(l, trash),
                device=True)
            for l in range(1, t.highest_lvl + 1))
        cache = self.__dict__.setdefault("_jit_edens", {})
        key = (trash, str(self.cc.dtype))
        if key not in cache:
            nc, ndim = t.nc, t.ndim
            interior = sp.interior_flat(ndim, nc)
            ivs = tuple(int(v) for v in self.all_densities)
            neumann = self.st.species_boundary_condition == "neumann_zero"
            emit_scale = float(_os.environ.get("AFIVO_EMIT_SCALE", "1.0"))
            i_lsf, i_e, i_ip = self.i_lsf, self.i_electron, self.i_1pos_ion

            def traced(cc, tables):
                cc = cc.at[:, trash].set(0.0)
                itr = (slice(None),) + (slice(1, nc + 1),) * ndim
                for boxes in tables:
                    n = len(boxes)
                    if n == 0:
                        continue
                    shape = (n,) + (nc + 2,) * ndim
                    lsf_b = cc[i_lsf, boxes].reshape(shape)
                    inside = (lsf_b[itr] < 0).reshape(n, -1)
                    for iv in ivs:
                        vals = cc[iv, boxes[:, None], interior[None, :]]
                        cc = cc.at[iv, boxes[:, None],
                                   interior[None, :]].set(
                                       jnp.where(inside, 0.0, vals))
                    if neumann:
                        ne = cc[i_e, boxes].reshape(shape)
                        num = jnp.zeros(ne[itr].shape, cc.dtype)
                        den = jnp.zeros(ne[itr].shape, jnp.int32)
                        for d in range(ndim):
                            for delta in (-1, 1):
                                sl = [slice(1, nc + 1)] * ndim
                                sl[d] = slice(1 + delta, nc + 1 + delta)
                                sl = (slice(None),) + tuple(sl)
                                out_nb = lsf_b[sl] > 0
                                num = num + jnp.where(out_nb, ne[sl], 0.0)
                                den = den + out_nb
                        at_bnd = inside & (den > 0).reshape(n, -1)
                        avg = (num / jnp.maximum(den, 1)).reshape(n, -1)
                        if emit_scale != 1.0:
                            avg = avg * emit_scale
                        ne_new = jnp.where(
                            at_bnd, avg,
                            cc[i_e, boxes[:, None], interior[None, :]])
                        cc = cc.at[i_e, boxes[:, None],
                                   interior[None, :]].set(ne_new)
                        ni = cc[i_ip, boxes[:, None], interior[None, :]]
                        cc = cc.at[i_ip, boxes[:, None],
                                   interior[None, :]].set(
                                       jnp.where(at_bnd, ne_new, ni))
                return cc

            cache[key] = jax.jit(traced)
        self.cc = cache[key](self.cc, tables)

    # ------------------------------------------------- compiled engine
    def _enable_compiled(self):
        """(Re)configure the compiled engine for the current topology:
        bucket the state capacity to a power of two, reserve the last row
        as the trash box, and (re)wire the jitted units."""
        from .core import treepack as tp
        # capacity with hysteresis: shrinking would change the state shape
        # and the trash row, clearing every compiled executable.
        # highest_id + 2: the trash row must never alias a real box (with
        # +1, an exactly-power-of-two box count would put the trash row on
        # the last real box). On growth, jump straight to 2x the need:
        # every capacity change recompiles ALL units (the trash row index
        # is baked in), so growth events must be rare.
        self.tree._prepad = float(self.compiled_prepad)
        self._mesh_shardings()  # register the replicate-sharding early
        need = self.tree.highest_id + 2
        have = self.cc.shape[1] if self._compiled_on else 0
        if have == 0 and self.compiled_prepad > 1.0:
            need = int(np.ceil(need * self.compiled_prepad))
        # the capacity must be divisible by the CLAMPED mesh size (the
        # requested compiled%shards may exceed the device count)
        mesh_n = getattr(self, "_mesh_n", 0)
        cap = max(tp.bucket(need) if have == 0 or tp.bucket(need) <= have
                  else tp.bucket(2 * need), have, tp.bucket(mesh_n))
        if self.cc.shape[1] != cap:
            if isinstance(self.cc, np.ndarray):
                cc = np.zeros((self.cc.shape[0], cap, self.cc.shape[2]))
                cc[:, :min(cap, self.cc.shape[1])] = \
                    self.cc[:, :min(cap, self.cc.shape[1])]
                self.cc = cc
                fshape = list(self.fc.shape)
                fshape[2] = cap
                fcn = np.zeros(fshape)
                fcn[:, :, :min(cap, self.fc.shape[2])] = \
                    self.fc[:, :, :min(cap, self.fc.shape[2])]
                self.fc = fcn
            else:
                # device state stays on device: capacity growth is one
                # padded copy (cap = max(..., have) never shrinks here)
                import jax
                import jax.numpy as jnp
                grow = cap - self.cc.shape[1]
                self.cc = jnp.pad(self.cc, ((0, 0), (0, grow), (0, 0)))
                self.fc = jnp.pad(self.fc,
                                  ((0, 0), (0, 0), (0, grow), (0, 0)))
                cc_sh, fc_sh = self._mesh_shardings()
                if cc_sh is not None:
                    # re-lay the grown box axis over the mesh
                    self.cc = jax.device_put(self.cc, cc_sh)
                    self.fc = jax.device_put(self.fc, fc_sh)
        trash = cap - 1
        self.field.mg.enable_jit(pad=True, trash=trash)
        self.fluid.enable_jit(pad=True, trash=trash)
        # Helmholtz photoionization solves run inside the compiled step
        # (per-mode lambda^2 multigrid); Monte-Carlo stays on the host
        self._photoi_compiled = self.photoi.enable_jit(pad=True,
                                                       trash=trash)
        if self.surfaces is not None:
            # in compiled mode the surface state is authoritative in the
            # cc rows (solvers/surface.py SurfacePack); (re)push the host
            # representation, which is current at every call site of
            # _enable_compiled (startup / post-update_after_refinement)
            self.cc = self.surfaces.sd_to_cc(
                self.cc, self.i_surf_photon, self.i_surf_sigma)
        self._compiled_on = True

    def _fused_step_available(self) -> bool:
        """Whether the one-dispatch production step applies: explicit
        integrator and traceable voltage form (IMEX schemes and user
        amplitude functions fall back to the per-unit compiled path,
        which the host drives step by step). Gas-dynamics runs are fused
        too: the Euler advance + coupling trace inside the step."""
        return (self.compiled_fused
                and not adv.REQUIRES_IMPLICIT[self.dt_cfg.integrator]
                and self.field.user_field_amplitude is None)

    def _crit_args(self):
        """Padded criterion-eval inputs for the fused step's in-trace
        refinement prologue: the eval box ids (af criterion set,
        m_af_core.f90:955-985) and their max grid spacings, padded to a
        bucketed (high-water-marked) shape and device-resident, rebuilt
        only when the topology epoch changes. Called BEFORE the epoch
        pack is assembled so a bucket-generation doubling triggered by
        the criterion table is seen by the pack build (one consistent
        shape generation per dispatch)."""
        import jax
        from .core import treepack as tp
        t = self.tree
        key = (t.epoch, self.cc.shape[1], str(self.cc.dtype))
        ca = self.__dict__.get("_crit_cache")
        if ca is None or ca[0] != key:
            eval_ids = t.criterion_eval_ids()
            n = len(eval_ids)
            nb = tp.bucket_hwm(t, ("crit", 0, "e"), n)
            ids_p = np.full(nb, int(eval_ids[0]), np.int32)
            ids_p[:n] = eval_ids
            lvls = t.lvl[eval_ids]
            mdx_p = np.zeros(nb, np.dtype(self.cc.dtype))
            mdx_p[:n] = [t.lvl_dr(int(l)).max() for l in lvls]
            sh = t.__dict__.get("_replicate_sharding")
            ids_d, mdx_d = (jax.device_put((ids_p, mdx_p), sh)
                            if sh is not None
                            else jax.device_put((ids_p, mdx_p)))
            ca = (key, eval_ids, ids_d, mdx_d)
            self._crit_cache = ca
        return ca[1], ca[2], ca[3]

    def _jit_full_step(self, dt: float, time: float,
                       epoch: bool = False):
        """ONE device dispatch for a full production time step
        (streamer.f90:251-343): temporal-state copy, the <=10-attempt
        rejection loop (``lax.while_loop``; on reject restore state and
        recompute E), all integrator substeps with their in-substep field
        solves, the final field solve at the accepted time, and the step
        diagnostics (dt limits, reaction rates, J.E, field energy) packed
        into one small f64 stats vector.

        With ``epoch=True`` the step also runs the refinement epoch's
        PROLOGUE in-trace behind a runtime flag (lax.cond): restrict +
        ghost fill of all densities and the alpha*dx criterion codes
        (streamer.f90:380-411 up to the af_adjust_refinement call), so a
        refinement epoch costs ZERO device round trips beyond the step's
        own stats pull — the codes ride back with the stats.

        Why: over a remote TPU link every blocked host sync costs a full
        round trip (~29 ms measured; seconds on degraded phases); the
        per-unit path has 6-8 blocked syncs per step and spent 342
        ms/step at 18k cells where the device computes for ~90 ms. The
        fused step leaves exactly one blocked pull per step. Voltage is
        evaluated in-trace (field.voltage_traced) so rejected attempts
        see the exact voltage of their shortened time step, as the
        reference does via field_compute -> field_set_voltage."""
        import jax
        import jax.numpy as jnp
        from .core import treepack as tp
        t0p = _time.time()
        eval_ids, crit_ids, crit_mdx = self._crit_args()
        fl_pack = tp.get_epoch_pack(self.tree, pad=self.fluid._jit_cfg[0],
                                    trash=self.fluid._jit_cfg[1],
                                    with_gc2=True, dtype=self.cc.dtype)
        mg_pack, mg_aux = self.field.mg._pack_and_ops(dtype=self.cc.dtype)
        # serialize traces against the background warmer: when this call's
        # input structure changed (an unwarmed growth or a bucket-
        # generation doubling), the call will RETRACE on this thread; a
        # concurrently tracing warm thread must finish first. The
        # structure is a function of (topology epoch, bucket generation,
        # dtype, capacity) alone, so the expensive full-pack flatten +
        # shape signature runs only when that key changes (it was ~270
        # ms/step of pure Python at 11 levels when computed every step)
        pkey = (self.tree.epoch,
                self.tree.__dict__.get("_bucket_gen", 0),
                str(self.cc.dtype), self.cc.shape, crit_ids.shape)
        if pkey != self.__dict__.get("_fused_pkey"):
            leaves, treedef = jax.tree_util.tree_flatten(
                (fl_pack, mg_pack, mg_aux))
            sig = (treedef,
                   tuple(getattr(l, "shape", ()) for l in leaves),
                   self.cc.shape, crit_ids.shape)
            if sig != self.__dict__.get("_fused_sig"):
                th = self.__dict__.get("_warm_thread")
                if th is not None and th.is_alive():
                    t0j = _time.time()
                    th.join()
                    self.wc2["warm_join"] = (
                        self.wc2.get("warm_join", 0.0)
                        + _time.time() - t0j)
                self._fused_sig = sig
            self._fused_pkey = pkey
        self.wc2["adv_pack"] = (
            self.wc2.get("adv_pack", 0.0) + _time.time() - t0p)
        cc, fc, stats, codes = self._fused_fn()(
            self.cc, self.fc, dt, time, fl_pack, mg_pack, mg_aux,
            jnp.asarray(bool(epoch)), crit_ids, crit_mdx)
        try:
            self.wc2["fused_traces"] = float(
                self._fused_fn()._cache_size())
        except Exception:
            pass
        return cc, fc, stats, codes, eval_ids

    def _fused_fn(self):
        """Build-or-reuse the jitted fused-step callable (one jit object
        per (trash, dtype, integrator, voltage-config); its internal cache
        keys on the epoch-pack structure, so warmed phantom structures are
        served without a retrace)."""
        import jax
        import jax.numpy as jnp
        from .solvers.multigrid import blocks as mg_blocks
        fl, field, mg = self.fluid, self.field, self.field.mg
        pad, trash = fl._jit_cfg
        integrator = self.dt_cfg.integrator
        cache = self.__dict__.setdefault("_jit_fullstep", {})
        # the voltage configuration is baked into the trace via
        # voltage_traced (mk_scal below): a mid-run mutation (e.g. a
        # new-pulse user hook changing the applied voltage) must not be
        # silently ignored by a cached executable
        if field.field_table is not None:
            import hashlib
            vsrc = hashlib.blake2b(
                np.ascontiguousarray(field.field_table[0]).tobytes()
                + np.ascontiguousarray(field.field_table[1]).tobytes(),
                digest_size=8).hexdigest()
        else:
            vsrc = float(field.field_voltage)
        vcfg = (field.given_by, vsrc, float(field.field_rise_time),
                float(field.field_pulse_width),
                int(field.field_num_pulses),
                float(field.field_pulse_period),
                float(self.dt_cfg.safety_factor))
        key = (trash, str(self.cc.dtype), integrator, vcfg)
        if key not in cache:
            steps = adv.SCHEMES[integrator]
            n_steps = adv.N_STEPS[integrator]
            n_states = self.dt_cfg.num_steps
            sf = float(self.dt_cfg.safety_factor)
            n_rx = self.chem.n_reactions
            nc, ndim = self.tree.nc, self.tree.ndim
            i_efld = self.i_electric_fld
            # the surface-charge state rides in cc rows (copy_current_
            # state also copies the surface charge, streamer.f90:580-583)
            surf_iv = ([self.i_surf_sigma] if self.dielectric is not None
                       else [])
            src = np.asarray(self.all_densities + surf_iv + [self.i_phi],
                             np.int32)
            tgt = np.asarray([iv + n_states for iv in
                              self.all_densities + surf_iv]
                             + [self.i_phi + 1], np.int32)
            f64 = jnp.float64

            def mk_scal(t_s, dt_stiff, dtype):
                # scalars are cast to the state dtype: the per-unit path
                # passes host floats (weak-typed -> f32 in products); a
                # strong f64 scalar would silently promote every product
                # to emulated f64 on TPU
                v = field.voltage_traced(t_s)
                scal = {"voltage": v.astype(dtype),
                        "dt_stiff": jnp.asarray(dt_stiff, dtype)}
                if field.lsf_data is not None:
                    scal["lsf_phi_b"] = (
                        jnp.asarray(field.lsf_phi_b_traced(v), f64)
                        .astype(dtype))
                return scal

            def run_attempt(cc, fc, tv, dtv):
                """All explicit substeps of one attempt; returns the
                LAST substep's dt limit & diagnostics (the reference
                assigns dt_lim per substep, m_fluid.f90:96-98)."""
                for entry in steps:
                    (_, f, f_stiff, toff, s_deriv, s_prev, w_prev,
                     s_out, i_step) = entry
                    scal = mk_scal(tv + toff * dtv, f_stiff * dtv,
                                   cc.dtype)
                    if i_step > 1:
                        with jax.named_scope("field"):
                            cc, fc, _ = field._solve_body(cc, fc, scal,
                                                          s_deriv)
                    cc, fc, dt_lim, diag = fl._flux_update_body(
                        cc, fc, (f * dtv).astype(cc.dtype), scal,
                        s_deriv, list(s_prev),
                        list(w_prev), s_out, i_step == n_steps)
                rates = (diag["rates"].astype(f64).reshape(n_rx)
                         if n_rx else jnp.zeros(0, f64))
                dvec = jnp.concatenate([
                    diag["dt_limits"].astype(f64).reshape(4),
                    jnp.asarray(diag["JdotE"], f64).reshape(1), rates])
                return cc, fc, dt_lim.astype(f64), dvec

            def field_energy(cc):
                """0.5 eps0 sum E^2 dV over leaf interiors
                (field_compute_energy, m_field.f90:764-769)."""
                tot = jnp.asarray(0.0, f64)
                for l in range(1, mg._n_levels() + 1):
                    tb = mg._tb(l)
                    if len(tb.leaves) == 0:
                        continue
                    lv = jnp.asarray(sp.aix(tb.leaves))
                    B = mg_blocks(cc, i_efld, lv, nc, ndim)
                    B = B[(slice(None),) + (slice(1, nc + 1),) * ndim]
                    B = B.reshape(B.shape[0], -1).astype(f64)
                    w = (jnp.asarray(tb.vol, f64)
                         * jnp.asarray(tb.leaf_valid, f64)[:, None])
                    tot = tot + jnp.sum(B * B * w)
                return 0.5 * uc.eps0 * tot

            ivs_all = np.asarray(self.all_densities, np.int32)
            bc_sp = self.bc_species
            interior_c = sp.interior_flat(ndim, nc)
            refiner = self.refiner
            gasdyn = self.gasdyn
            coupling = self.coupling if gasdyn is not None else None
            registry = self.registry

            def gas_advance(cc, fc, fl_pack, dt_used, tv):
                """Gas-dynamics sequence of one accepted step in-trace
                (streamer.f90:325-336): J.E/EHD coupling source, Euler
                advance with the same integrator, gas-density refresh."""
                # dt enters products with the f32 state: cast (a strong
                # f64 scalar would promote to emulated f64 on TPU)
                cc = coupling.add_fluid_source(
                    cc, fc, dt_used.astype(cc.dtype), pack=fl_pack)
                dt_gas = jnp.asarray(1e30, f64)
                for entry in steps:
                    (_, f, _fs, toff, s_deriv, s_prev, w_prev, s_out,
                     i_step) = entry
                    cc, fc, gl = gasdyn.forward_euler(
                        cc, fc, (f * dt_used).astype(cc.dtype), None,
                        tv + toff * dt_used, s_deriv, list(s_prev),
                        list(w_prev), s_out, i_step, n_steps, {},
                        fluid=fl)
                    dt_gas = gl.astype(f64)  # last substep's limit

                def gc_fill_gas(cc, ivs):
                    for lvl in range(1, fl_pack.n_levels + 1):
                        for iv in ivs:
                            m = registry.methods[iv]
                            cc = gc.fill_ghosts_lvl(
                                cc, fl_pack.gc[lvl - 1], [iv], m["rb"],
                                m["bc"], {})
                    return cc

                cc = coupling.update_gas_density(cc, gc_fill_gas,
                                                 pack=fl_pack)
                return cc, fc, dt_gas

            def epoch_prologue(cc, fl_pack, crit_ids, crit_mdx):
                """Refinement-epoch prologue in-trace: restrict + ghost
                fill of all densities (streamer.f90:383-386; plus the
                Euler variables on gas-dynamics runs, :388-393) and the
                alpha*dx criterion codes for the eval ids — one int8
                code row per eval box rides back with the step stats."""
                cc = cc.at[:, trash].set(0.0)
                cc = pr.restrict_tree(cc, self.tree, ivs_all,
                                      pack=fl_pack)
                for lvl in range(1, fl_pack.n_levels + 1):
                    cc = gc.fill_ghosts_lvl(cc, fl_pack.gc[lvl - 1],
                                            ivs_all, gc.RB_INTERP_LIM,
                                            bc_sp, {})
                if gasdyn is not None:
                    gvs = np.asarray(gasdyn.gas_vars, np.int32)
                    cc = pr.restrict_tree(cc, self.tree, gvs,
                                          pack=fl_pack)
                    for lvl in range(1, fl_pack.n_levels + 1):
                        for iv in gasdyn.gas_vars:
                            m = registry.methods[iv]
                            cc = gc.fill_ghosts_lvl(
                                cc, fl_pack.gc[lvl - 1], [iv], m["rb"],
                                m["bc"], {})
                codes = refiner.base_flags_traced(cc, crit_ids,
                                                  interior_c, crit_mdx)
                return cc, codes

            def traced(cc, fc, dtv, tv, fl_pack, mg_pack, mg_aux,
                       epochv, crit_ids, crit_mdx):
                old_f = (fl._pack, fl._pack_surf)
                ops, sm, extras, blocks, surf = mg_aux
                old_m = (mg._pack, mg._pack_ops, mg._pack_sm,
                         mg._pack_extras, mg._pack_blocks, mg._pack_surf)
                fl._pack, fl._pack_surf = fl_pack, surf
                (mg._pack, mg._pack_ops, mg._pack_sm,
                 mg._pack_extras, mg._pack_blocks, mg._pack_surf) = (
                     mg_pack, ops, sm, extras, blocks, surf)
                try:
                    dtv = jnp.asarray(dtv, f64)
                    tv = jnp.asarray(tv, f64)
                    cc = cc.at[:, trash].set(0.0)
                    fc = fc.at[:, :, trash].set(0.0)
                    # copy_current_state (streamer.f90:571-583)
                    cc = cc.at[tgt].set(cc[src])
                    # attempt loop (streamer.f90:251-281). The first
                    # attempt runs inside the while_loop too (n_att == 0
                    # in the cond) so the big substep graph is traced
                    # exactly ONCE - tracing it twice doubles the
                    # minutes-long remote XLA compile of this unit
                    n_rx_tot = 5 + n_rx
                    carry = (cc, fc, dtv, jnp.asarray(False),
                             jnp.asarray(0, jnp.int32),
                             jnp.asarray(1e30, f64),  # huge_real overflows
                             # TPU double-f32 f64 emulation (-> inf)
                             jnp.zeros(n_rx_tot, f64))

                    def cond(c):
                        first = c[4] == 0
                        retry = jnp.logical_and(
                            c[3], c[4] < MAX_ATTEMPTS_PER_TIME_STEP)
                        return jnp.logical_or(first, retry)

                    def wbody(c):
                        cc, fc, dtv_a, rej, n_att, dt_lim_min, _dv = c

                        def restore(cc, fc):
                            # restore_previous_state + E from the
                            # restored potential (streamer.f90:586-599)
                            cc2 = cc.at[src].set(cc[tgt])
                            return field.from_potential(
                                cc2, fc, mk_scal(tv, 0.0, cc.dtype))

                        cc, fc = jax.lax.cond(
                            rej, restore, lambda cc, fc: (cc, fc),
                            cc, fc)
                        cc, fc, dt_lim, dvec = run_attempt(cc, fc, tv,
                                                           dtv_a)
                        ok = dtv_a <= dt_lim
                        return (cc, fc,
                                jnp.where(ok, dtv_a, sf * dt_lim),
                                jnp.logical_not(ok), n_att + 1,
                                jnp.minimum(dt_lim_min, dt_lim), dvec)

                    (cc, fc, dt_used, rejected, n_att, dt_lim_min,
                     dvec) = jax.lax.while_loop(cond, wbody, carry)

                    # field energy BEFORE the final solve: the reference
                    # calls field_compute_energy on the last substep's
                    # field, then field_compute (streamer.f90:296-321)
                    f_energy = field_energy(cc)
                    # field for the accepted state at the new time
                    # (streamer.f90:321)
                    scal_f = mk_scal(tv + dt_used, 0.0, cc.dtype)
                    with jax.named_scope("field"):
                        cc, fc, _res = field._solve_body(cc, fc, scal_f,
                                                         0)
                    if gasdyn is not None:
                        with jax.named_scope("gas"):
                            cc, fc, dt_gas = gas_advance(cc, fc, fl_pack,
                                                         dt_used, tv)
                    else:
                        dt_gas = jnp.asarray(1e30, f64)
                    with jax.named_scope("refine_prologue"):
                        cc, codes = jax.lax.cond(
                            epochv,
                            lambda cc: epoch_prologue(cc, fl_pack,
                                                      crit_ids, crit_mdx),
                            lambda cc: (cc, jnp.zeros(
                                (crit_ids.shape[0], nc ** ndim),
                                jnp.int8)),
                            cc)
                    stats = jnp.concatenate([
                        jnp.stack([
                            dt_used, dt_lim_min, dvec[0], dvec[1],
                            dvec[2], dvec[3], dvec[4],
                            (n_att - jnp.logical_not(rejected)
                             .astype(jnp.int32)).astype(f64),
                            jnp.logical_not(rejected).astype(f64),
                            f_energy, dt_gas]),
                        dvec[5:]])
                    return cc, fc, stats, codes
                finally:
                    fl._pack, fl._pack_surf = old_f
                    (mg._pack, mg._pack_ops, mg._pack_sm,
                     mg._pack_extras, mg._pack_blocks,
                     mg._pack_surf) = old_m

            cache[key] = jax.jit(traced, donate_argnums=(0, 1))
        return cache[key]

    def _warm_key(self):
        """Structure key of the NEXT level's executable: level count,
        bucket generation (a synchronized doubling changes every padded
        shape), state capacity and dtype, integrator."""
        t = self.tree
        return (t.highest_lvl + 1, t.__dict__.get("_bucket_gen", 0),
                self.cc.shape[1], str(self.cc.dtype),
                self.dt_cfg.integrator)

    def _warm_next_level(self, dt: float, time: float):
        """Pre-compile the fused step for the NEXT refinement level in a
        background thread (VERDICT round-3 item 6, the new-level compile
        cliff): a phantom epoch pack has exactly the pytree structure and
        table shapes the pack will have once level ``highest_lvl+1``
        exists (core/treepack.phantom_levels), so executing one step on
        donated STATE COPIES with the phantom packs populates the jit
        cache with the post-growth executable. When AMR then adds the
        level, the dispatch is a cache hit instead of minutes of XLA.
        The packs are built on the calling thread (host work, tree-cache
        mutations stay single-threaded); only the jit call runs in the
        background (the ambient-pack slots it sets while tracing are
        thread-local)."""
        import jax
        warm_cfg = str(self.compiled_warm).lower()
        warm_on = (warm_cfg in ("t", "true", "1")
                   or (warm_cfg == "auto"
                       and jax.default_backend() == "tpu"))
        if not (warm_on and self._compiled_on
                and self._fused_step_available()):
            return
        if isinstance(self.cc, np.ndarray):
            return
        import threading
        import jax
        import jax.numpy as jnp
        from .core import treepack as tp
        t = self.tree
        wkey = self._warm_key()
        if wkey in self._warmed:
            return
        prev = self.__dict__.get("_warm_thread")
        if prev is not None and prev.is_alive():
            return  # one background compile at a time; retry next step
        self._warmed.add(wkey)
        fn = self._fused_fn()
        pad, trash = self.fluid._jit_cfg
        # per-level plans inside are device-resident via cached_plan
        fl_ph = tp.build_epoch_pack(t, pad=pad, trash=trash,
                                    with_gc2=True, dtype=self.cc.dtype,
                                    phantom=1)
        mg_pack_ph, mg_aux_ph = self.field.mg._phantom_pack_and_ops(
            dtype=self.cc.dtype)
        # criterion tables: level-independent bucket, so the production
        # arrays already have the post-growth shapes (both lax.cond
        # branches of the epoch prologue compile regardless of the flag)
        _, crit_ids, crit_mdx = self._crit_args()
        cc, fc = jnp.copy(self.cc), jnp.copy(self.fc)  # donated by fn
        # also pre-compile the refinement-epoch EPILOGUE for the next
        # level: its shapes are a function of the (no-gc2) epoch pack,
        # so a phantom pack covers the post-growth executable the same
        # way (driver._jit_epoch_epilogue is otherwise the one per-level
        # compile left on the growth path)
        epi_args = None
        epi_key = (trash, str(self.cc.dtype),
                   self.photoi.enabled and getattr(
                       self, "_photoi_compiled", False))
        epi_fn = self.__dict__.get("_jit_epi", {}).get(epi_key)
        if epi_fn is not None and not epi_key[2]:
            fl_ph_epi = tp.build_epoch_pack(
                t, pad=pad, trash=trash, with_gc2=False,
                dtype=self.cc.dtype, phantom=1)
            scal_ph = {"voltage": float(self.field.current_voltage)}
            if self.field.lsf_data is not None:
                scal_ph["lsf_phi_b"] = float(
                    getattr(self.field, "lsf_phi_b", 0.0) or 0.0)
            newmask_ph = jax.device_put(
                np.zeros(self.cc.shape[1], bool))
            epi_args = (jnp.copy(self.cc), jnp.copy(self.fc), fl_ph_epi,
                        newmask_ph, scal_ph, jnp.asarray(0.0),
                        mg_pack_ph, mg_aux_ph, [])

        def go():
            try:
                out = fn(cc, fc, dt, time, fl_ph, mg_pack_ph, mg_aux_ph,
                         jnp.asarray(True), crit_ids, crit_mdx)
                jax.block_until_ready(out)
                if epi_args is not None:
                    out2 = epi_fn(*epi_args)
                    jax.block_until_ready(out2)
            except Exception as e:  # never take down the run
                self._warmed.discard(wkey)  # allow a retry
                print(f"warm_next_level failed (lvl {wkey[0]}): {e!r}",
                      flush=True)

        th = threading.Thread(target=go, daemon=True,
                              name="fused-step-warm")
        self._warm_thread = th
        th.start()

    def _mesh_shardings(self):
        """(cc, fc) NamedShardings over the box axis, or (None, None)
        when compiled%shards is off. Builds the device mesh once and
        registers the replicate-sharding that the plan cache uses for
        every device-resident plan (core/treepack.cached_plan) — the
        TPU-native scaling axis per SURVEY §5.8/§7: boxes over devices,
        halo/transfer/reduction traffic as XLA collectives."""
        if self.compiled_shards <= 1:
            return None, None
        if getattr(self, "_mesh", None) is None:
            import jax
            from jax.sharding import (Mesh, NamedSharding,
                                      PartitionSpec as P)
            devs = jax.devices()
            n = min(self.compiled_shards, len(devs))
            if n & (n - 1):
                # the mesh size must divide the power-of-two box-capacity
                # axis or NamedSharding fails with an opaque divisibility
                # error; round down and warn (compiled%shards docstring)
                n2 = 1
                while 2 * n2 <= n:
                    n2 *= 2
                print(f"compiled%shards: {n} devices usable is not a "
                      f"power of two; using {n2}")
                n = n2
            self._mesh_n = n
            self._mesh = Mesh(np.array(devs[:n]), ("boxes",))
            self._cc_sh = NamedSharding(self._mesh, P(None, "boxes"))
            self._fc_sh = NamedSharding(self._mesh,
                                        P(None, None, "boxes"))
            self.tree._replicate_sharding = NamedSharding(self._mesh,
                                                          P())
        return self._cc_sh, self._fc_sh

    def _to_device(self):
        if isinstance(self.cc, np.ndarray):
            import jax
            import jax.numpy as jnp
            dt = (jnp.float32 if self.compiled_dtype == "float32"
                  else jnp.float64)
            cc_sh, fc_sh = self._mesh_shardings()
            if cc_sh is not None:
                self.cc = jax.device_put(jnp.asarray(self.cc, dt), cc_sh)
                self.fc = jax.device_put(jnp.asarray(self.fc, dt), fc_sh)
            else:
                self.cc = jnp.asarray(self.cc, dt)
                self.fc = jnp.asarray(self.fc, dt)

    def _to_host(self):
        if not isinstance(self.cc, np.ndarray):
            # np.array (copy): np.asarray of a device array is read-only;
            # the host machinery always works in f64
            self.cc = np.array(self.cc, np.float64)
            self.fc = np.array(self.fc, np.float64)

    def gc_tree(self, ivs, rb, bc_fn, params=None):
        for lvl in range(1, self.tree.highest_lvl + 1):
            plan = gc.get_gc_plan(self.tree, lvl)
            self.cc = gc.fill_ghosts_lvl(self.cc, plan, ivs, rb, bc_fn,
                                         params or {})

    def restrict_and_gc_densities(self):
        """Restrict + ghost-fill all densities (streamer.f90:383-386)."""
        self.cc = pr.restrict_tree(self.cc, self.tree,
                                   np.asarray(self.all_densities))
        self.gc_tree(np.asarray(self.all_densities), gc.RB_INTERP_LIM,
                     self.bc_species)

    def jit_restrict_gc_densities(self):
        """Device restrict + ghost fill of all densities: ONE compiled
        dispatch over the epoch pack, so a no-change refinement epoch
        never round-trips the full state through the host."""
        import jax
        from .core import treepack as tp
        pad, trash = self.fluid._jit_cfg
        pack = tp.get_epoch_pack(self.tree, pad=pad, trash=trash,
                                 dtype=self.cc.dtype)
        cache = self.__dict__.setdefault("_jit_rgc", {})
        key = (trash, str(self.cc.dtype))
        if key not in cache:
            ivs = np.asarray(self.all_densities, np.int32)
            bc = self.bc_species

            def traced(cc, pack):
                cc = cc.at[:, trash].set(0.0)
                cc = pr.restrict_tree(cc, self.tree, ivs, pack=pack)
                for lvl in range(1, pack.n_levels + 1):
                    cc = gc.fill_ghosts_lvl(cc, pack.gc[lvl - 1], ivs,
                                            gc.RB_INTERP_LIM, bc, {})
                return cc

            cache[key] = jax.jit(traced)
        return cache[key](self.cc, pack)

    def jit_restrict_gc_flags(self):
        """Refinement-epoch prologue as ONE dispatch + ONE small pull:
        restrict + ghost fill of all densities AND the alpha*dx
        refinement-criterion codes for the criterion's eval ids, fused
        into a single compiled unit. The int8 code pull below is the
        epoch's only blocked round trip when the topology does not
        change (vs. two dispatches + a pull before; each blocked tunnel
        round trip costs seconds on degraded link phases — measured
        ~2.7 s/epoch against ~100 ms of device work, round-4 README)."""
        import jax
        import jax.numpy as jnp
        from .core import treepack as tp
        t = self.tree
        pad, trash = self.fluid._jit_cfg
        pack = tp.get_epoch_pack(t, pad=pad, trash=trash,
                                 dtype=self.cc.dtype)
        eval_ids = t.criterion_eval_ids()
        interior = sp.interior_flat(t.ndim, t.nc)
        n = len(eval_ids)
        nb = 4
        while nb < n:
            nb *= 2
        ids_p = np.full(nb, int(eval_ids[0]), np.int64)
        ids_p[:n] = eval_ids
        lvls = t.lvl[eval_ids]
        max_dx = np.array([t.lvl_dr(int(l)).max() for l in lvls])
        mdx_p = np.zeros(nb)
        mdx_p[:n] = max_dx
        cache = self.__dict__.setdefault("_jit_rgcf", {})
        key = (trash, str(self.cc.dtype))
        if key not in cache:
            ivs = np.asarray(self.all_densities, np.int32)
            bc = self.bc_species
            refiner = self.refiner

            def traced(cc, pack, ids, itr, mdx):
                cc = cc.at[:, trash].set(0.0)
                cc = pr.restrict_tree(cc, self.tree, ivs, pack=pack)
                for lvl in range(1, pack.n_levels + 1):
                    cc = gc.fill_ghosts_lvl(cc, pack.gc[lvl - 1], ivs,
                                            gc.RB_INTERP_LIM, bc, {})
                codes = refiner.base_flags_traced(cc, ids, itr, mdx)
                return cc, codes

            cache[key] = jax.jit(traced)
        cc, codes = cache[key](self.cc, pack, ids_p, interior,
                               jnp.asarray(mdx_p, self.cc.dtype))
        codes = np.asarray(codes)[:n]  # the one blocked pull (int8)
        self.refiner.staged_flags = (eval_ids,
                                     self.refiner.codes_to_flags(codes))
        return cc

    def _prolong_new_boxes_device(self, info):
        """Device-side auto_prolong: fill newly added boxes by prolongation
        and refresh the ghost layers of their levels, through ONE jitted
        unit per level (the host-path equivalent lives in
        adjust_refinement below; af_adjust_refinement auto_prolong,
        m_af_core.f90:843-881)."""
        import jax
        from .core import treepack as tp
        pad, trash = self.fluid._jit_cfg
        dtype = self.cc.dtype
        pack = tp.get_epoch_pack(self.tree, pad=True, trash=trash,
                                 dtype=dtype)
        cache = self.__dict__.setdefault("_jit_pn", {})
        key = (trash, str(dtype))
        if key not in cache:
            # group variables by method so the traced body is static
            by_m = {}
            for iv in self.registry.auto_vars:
                m = self.registry.methods[iv]
                k = (m["prolong"], m["rb"], id(m["bc"]))
                by_m.setdefault(k, (m, []))[1].append(iv)
            groups = tuple((m, tuple(ivs)) for m, ivs in by_m.values())

            def traced(cc, plan, gplan, scal):
                cc = cc.at[:, trash].set(0.0)
                for m, ivs in groups:
                    cc = pr.prolong(cc, plan, list(ivs), m["prolong"])
                for m, ivs in groups:
                    cc = gc.fill_ghosts_lvl(cc, gplan, list(ivs), m["rb"],
                                            m["bc"], scal)
                return cc

            cache[key] = jax.jit(traced)
        scal = {"voltage": float(self.field.current_voltage)}
        for lvl in sorted(info.added_per_lvl):
            ids = info.added_per_lvl[lvl]
            plan = pr.ProlongRestrictPlan(self.tree, ids, pad=True,
                                          trash=trash)
            if np.dtype(dtype) != np.float64:
                plan = tp.cast_pack_floats(plan, dtype)
            self.cc = cache[key](self.cc, plan, pack.gc[lvl - 1], scal)

    def _jit_epoch_epilogue(self, info, time):
        """The refinement epoch's post-change work as ONE device
        dispatch: prolongation into the new boxes, per-level ghost
        fill, the convergence-controlled field solve at the new
        topology, and — when compiled Helmholtz photoi is active — the
        photoionization source update. Reference sequence:
        streamer.f90:380-411.

        SHAPE-STABLE by design (round 5): building fresh per-epoch
        prolongation plans for the added boxes made the input shapes a
        function of which levels / how many boxes changed — every novel
        combination RETRACED this unit (containing a full field solve),
        at 50-80 s of remote XLA per variant; the TPU epoch probe
        measured exactly these retraces as the dominant refine cost.
        The unit now prolongs ALL children of every level through the
        epoch pack's padded pr plans and BLENDS by a runtime new-row
        mask, so its shapes are a function of the pack alone: compiled
        once per bucket generation, a cache hit at every changed epoch
        afterwards (the wasted full-level prolongation is a few ms of
        vectorized device work)."""
        import jax
        import jax.numpy as jnp
        from contextlib import ExitStack
        from .core import treepack as tp
        from .solvers.multigrid import ambient_packs
        fld = self.field
        pad, trash = self.fluid._jit_cfg
        dtype = self.cc.dtype
        t0 = _time.time()
        pack = tp.get_epoch_pack(self.tree, pad=True, trash=trash,
                                 dtype=dtype)
        t_pk = _time.time()
        self.wc2["epi_pack"] = (self.wc2.get("epi_pack", 0.0)
                                + t_pk - t0)
        mg_pack, mg_aux = fld.mg._pack_and_ops(dtype=dtype)
        self.wc2["epi_mgpack"] = (self.wc2.get("epi_mgpack", 0.0)
                                  + _time.time() - t_pk)
        ph_on = (self.photoi.enabled
                 and getattr(self, "_photoi_compiled", False))
        ph_packs = ([mg._pack_and_ops(dtype=dtype)
                     for mg in self.photoi.mgs] if ph_on else [])
        # global new-row mask over the box capacity
        newmask = np.zeros(self.cc.shape[1], bool)
        if info.n_add:
            newmask[np.asarray(info.added, np.int64)] = True
        sh = self.tree.__dict__.get("_replicate_sharding")
        newmask = (jax.device_put(newmask, sh) if sh is not None
                   else jax.device_put(newmask))
        fld.set_voltage(time)
        scal = {"voltage": fld.current_voltage}
        if fld.lsf_data is not None:
            scal["lsf_phi_b"] = (
                1.0 if getattr(fld, "user_lsf_bc", None) is not None
                else fld.current_voltage)
        dt_ph = float(time - self._photoi_prev_time) if ph_on else 0.0
        cache = self.__dict__.setdefault("_jit_epi", {})
        key = (trash, str(dtype), ph_on)
        if key not in cache:
            by_m = {}
            for iv in self.registry.auto_vars:
                m = self.registry.methods[iv]
                k = (m["prolong"], m["rb"], id(m["bc"]))
                by_m.setdefault(k, (m, []))[1].append(iv)
            groups = tuple((m, tuple(ivs)) for m, ivs in by_m.values())
            auto_ivs = np.asarray(
                sorted(iv for _, ivs in groups for iv in ivs), np.int32)
            photoi = self.photoi
            mgf = fld.mg

            def traced(cc, fc, fl_pack, newmask, scal, dt_ph, mg_pack,
                       mg_aux, ph_packs):
                with ExitStack() as stx:
                    stx.enter_context(ambient_packs(mgf, mg_pack,
                                                    mg_aux))
                    if ph_on:
                        for pmg, (pp, pa) in zip(photoi.mgs, ph_packs):
                            stx.enter_context(ambient_packs(pmg, pp, pa))
                    fc = fc.at[:, :, trash].set(0.0)
                    nm = newmask.at[trash].set(False)
                    blend = nm[None, :, None]
                    for lvl in range(2, fl_pack.n_levels + 1):
                        # re-zero trash before every level's prolong:
                        # padded gather entries of the next level's plan
                        # read the trash row and expect zeros
                        cc = cc.at[:, trash].set(0.0)
                        plan = fl_pack.pr[lvl - 1]
                        # prolong EVERY child of the level, keep the
                        # result only on the newly added rows: existing
                        # children keep their evolved state
                        cc2 = cc
                        for m, ivs in groups:
                            cc2 = pr.prolong(cc2, plan, list(ivs),
                                             m["prolong"])
                        cc = cc.at[auto_ivs].set(
                            jnp.where(blend, cc2[auto_ivs],
                                      cc[auto_ivs]))
                        for m, ivs in groups:
                            cc = gc.fill_ghosts_lvl(
                                cc, fl_pack.gc[lvl - 1], list(ivs),
                                m["rb"], m["bc"], scal)
                    cc = cc.at[:, trash].set(0.0)
                    cc, fc, _res = fld._solve_body(cc, fc, scal, 0)
                    if ph_on:
                        cc = photoi._set_src_body(cc, scal, dt_ph)
                return cc, fc

            cache[key] = jax.jit(traced, donate_argnums=(0, 1))
        t_dp = _time.time()
        try:
            n_exe0 = cache[key]._cache_size()
        except Exception:
            n_exe0 = -1
        self.cc, self.fc = cache[key](self.cc, self.fc, pack, newmask,
                                      scal, jnp.asarray(dt_ph), mg_pack,
                                      mg_aux, ph_packs)
        d_dp = _time.time() - t_dp
        grew = False
        try:
            grew = cache[key]._cache_size() > n_exe0
        except Exception:
            pass
        # attribute compile-calls (executable-cache growth) separately
        # from steady-state dispatches, and track the worst dispatch
        k_dp = "epi_compile" if grew else "epi_dispatch"
        self.wc2[k_dp] = self.wc2.get(k_dp, 0.0) + d_dp
        self.wc2["epi_calls"] = self.wc2.get("epi_calls", 0.0) + 1.0
        if not grew:
            self.wc2["epi_disp_max"] = max(
                self.wc2.get("epi_disp_max", 0.0), d_dp)
        try:  # trace-count gauge: >1 per structure epoch means the
            # "shape-stable" contract is broken somewhere in the pack
            self.wc2["epi_traces"] = float(cache[key]._cache_size())
        except Exception:
            pass
        self.batch.cc, self.batch.fc = self.cc, self.fc
        if ph_on:
            self._photoi_prev_time = time

    # ---------------------------------------------------- refinement step
    def adjust_refinement(self, defer_device_prolong: bool = False):
        """af_adjust_refinement + data movement for new/removed boxes.

        With ``defer_device_prolong`` (the compiled run loop), the
        device-side prolongation into new boxes is NOT dispatched here:
        the caller fuses it with the post-change field solve and photoi
        update into one dispatch (_jit_epoch_epilogue), cutting the
        refinement epoch's device round trips."""
        self.refiner.time = self.global_time
        links = (self.surfaces.refinement_links()
                 if self.surfaces is not None else None)
        flags_fn = (self.user.refine
                    if self.user.refine is not None
                    else lambda ids: self.refiner.cell_flags(self.cc, ids))
        if (self.surfaces is not None and self._compiled_on
                and not isinstance(self.cc, np.ndarray)):
            # compiled mode: the cc rows hold the authoritative surface
            # state; refresh the host sd arrays before the (host-side)
            # surface prolong/restrict of this epoch
            self.surfaces.cc_to_sd(self.cc, self.i_surf_photon,
                                   self.i_surf_sigma)
        t0a = _time.time()
        info = self.tree.adjust_refinement(
            flags_fn, ref_buffer=self.refine_cfg.buffer_width,
            ref_links=links)
        self.wc2["ref_topology"] = (
            self.wc2.get("ref_topology", 0.0) + _time.time() - t0a)
        if self.surfaces is not None and (info.n_add or info.n_rm):
            self.surfaces.update_after_refinement(info)
        if info.n_add == 0 and info.n_rm == 0:
            return info
        if (self._compiled_on and not isinstance(self.cc, np.ndarray)
                and self.i_lsf < 0 and self.i_gas_dens_user < 0):
            # compiled mode: the data movement (capacity growth,
            # prolongation into new boxes, ghost fill) stays on device —
            # no full-state host round-trip per refinement epoch
            t0e = _time.time()
            self._enable_compiled()
            self.wc2["ref_rewire"] = (
                self.wc2.get("ref_rewire", 0.0) + _time.time() - t0e)
            if defer_device_prolong:
                self._deferred_epoch_prolong = True
            else:
                self._prolong_new_boxes_device(info)
            self.batch.cc, self.batch.fc = self.cc, self.fc
            self.batch.tree = self.tree
            return info
        # topology changed: the data movement below (storage growth,
        # prolongation into new boxes) runs on the host
        self._to_host()
        # grow storage if needed
        self.batch.cc, self.batch.fc = self.cc, self.fc
        self.batch.tree = self.tree
        if isinstance(self.cc, np.ndarray):
            # rows 0..highest_id must exist
            need = self.tree.highest_id + 1
            if need > self.cc.shape[1]:
                grow = max(need, int(1.3 * self.cc.shape[1]))
                cc = np.zeros((self.cc.shape[0], grow, self.cc.shape[2]))
                cc[:, :self.cc.shape[1]] = self.cc
                self.cc = cc
                fshape = list(self.fc.shape)
                fshape[2] = grow
                fcn = np.zeros(fshape)
                fcn[:, :, :self.fc.shape[2]] = self.fc
                self.fc = fcn
        # prolong data into new boxes, per level (auto_prolong); funcval
        # variables (the level-set function) are evaluated directly
        for lvl in sorted(info.added_per_lvl):
            ids = info.added_per_lvl[lvl]
            self._fill_lsf(ids)
            self._fill_user_gas_density(ids)
            plan = pr.ProlongRestrictPlan(self.tree, ids)
            for iv in self.registry.auto_vars:
                m = self.registry.methods[iv]
                self.cc = pr.prolong(self.cc, plan, [iv], m["prolong"])
            # ghost cells on this level (new boxes incl. neighbors)
            gplan = gc.get_gc_plan(self.tree, lvl)
            params = {"voltage": self.field.current_voltage}
            for iv in self.registry.auto_vars:
                m = self.registry.methods[iv]
                self.cc = gc.fill_ghosts_lvl(self.cc, gplan, [iv], m["rb"],
                                             m["bc"], params)
        return info

    # ------------------------------------------------- initial conditions
    def setup_initial_conditions(self):
        """set_initial_conditions (streamer.f90:460-519)."""
        t = self.tree
        # refine up to refine_max_dx
        lvl = 1
        while np.any(t.lvl_dr(lvl) > self.refine_cfg.max_dx) and lvl < 29:
            lvl += 1
        t.refine_up_to_lvl(lvl)
        self._sync_capacity()
        allids = np.concatenate([np.asarray(i) for i in t.lvl_ids])
        self._fill_lsf(allids)
        self._fill_user_gas_density(allids)
        self.cc = self.init_cond.apply(self.cc, t, allids)
        self._init_gas_state(allids)
        if self.user.initial_conditions is not None:
            self.user.initial_conditions(self, allids)
        elif self.st.use_dielectric:
            raise ValueError(
                "use_dielectric requires user initial conditions")
        self._zero_inside_electrode(allids)

        if self.st.use_dielectric:
            # surface container (surface_initialize); number of surface
            # variables: photon flux + charge states (streamer.f90:487-490)
            n_surf_vars = self.dt_cfg.num_steps + 2
            self.surfaces = Surfaces(
                t, lambda b: np.asarray(self.cc[self.i_eps, b]), n_surf_vars)
            idx = self.fluid.idx
            self.dielectric = Dielectric(self.cfg, t, self.surfaces, idx,
                                         self.chem, self.dt_cfg,
                                         i_eps=self.i_eps)
            self.field.surfaces = self.surfaces
            self.field.mg.surfaces = self.surfaces
            self.field.i_surf_sigma_cc = self.i_surf_sigma
            self.dielectric.i_surf_photon_cc = self.i_surf_photon
            self.dielectric.i_surf_sigma_cc = self.i_surf_sigma
            self.fluid.dielectric = self.dielectric
            if self.photoi.enabled and self.photoi.mc is not None:
                self.photoi.mc.dielectric = self.dielectric
            # full charges of the flux species + positive-ion flux list
            ngas = self.chem.n_gas_species
            charges = []
            pos_ion_fc = []
            for m, iv in enumerate(self.flux_species):
                six = ngas + self.species_cc.index(iv)
                q = self.chem.species_charge[six]
                charges.append(q)
                if q > 0:
                    pos_ion_fc.append(self.fc_flux[m])
            self.dielectric.flux_species_charge = np.asarray(charges,
                                                            np.float64)
            self.dielectric.flux_pos_ion = pos_ion_fc

        for n in range(100):
            self.cc, self.fc = self.field.compute(
                self.cc, self.fc, 0, 0.0, False)
            info = self.adjust_refinement()
            if info.n_add:
                self._sync_capacity()
                new = np.asarray(info.added, np.int64)
                self._fill_lsf(new)
                self._fill_user_gas_density(new)
                self.cc = self.init_cond.apply(self.cc, self.tree, new)
                self._init_gas_state(new)
                if self.user.initial_conditions is not None:
                    self.user.initial_conditions(self, new)
                self._zero_inside_electrode(new)
            if info.n_add == 0:
                break
        self.output.initial_summary(self)
        self.output_write(0)

    def _init_gas_state(self, ids):
        """Initial Euler state: constant density/pressure, zero momentum
        (init_cond_set_box, m_init_cond.f90:245-258)."""
        if self.gasdyn is None:
            return
        gd = self.gasdyn
        ids = np.asarray(ids)
        N = self.gas.number_density
        self.cc[gd.i_gas_dens, ids] = N
        self.cc[gd.gas_vars[gd.i_rho], ids] = N * self.gas.molecular_weight
        for m in gd.i_mom:
            self.cc[gd.gas_vars[m], ids] = 0.0
        self.cc[gd.gas_vars[gd.i_e], ids] = (
            self.gas.pressure * 1e5 / (self.gas.euler_gamma - 1.0))

    def _zero_inside_electrode(self, ids):
        """Zero all densities where lsf <= 0 (init_cond_set_box,
        m_init_cond.f90:283-287)."""
        if self.i_lsf < 0:
            return
        ids = np.asarray(ids)
        lsf = self.cc[self.i_lsf, ids]
        inside = lsf <= 0.0
        for iv in self.all_densities:
            self.cc[iv, ids] = np.where(inside, 0.0, self.cc[iv, ids])

    def _sync_capacity(self):
        need = self.tree.highest_id
        if need > self.cc.shape[1]:
            grow = max(need + 64, int(1.3 * self.cc.shape[1]))
            cc = np.zeros((self.cc.shape[0], grow, self.cc.shape[2]))
            cc[:, :self.cc.shape[1]] = self.cc
            self.cc = cc
            fshape = list(self.fc.shape)
            fshape[2] = grow
            fcn = np.zeros(fshape)
            fcn[:, :, :self.fc.shape[2]] = self.fc
            self.fc = fcn

    # ----------------------------------------------------------- output
    def _set_power_density(self):
        """J.E deposited power per cell (set_power_density_box,
        ``m_output.f90:940-965``)."""
        t = self.tree
        nc, ndim = t.nc, t.ndim
        interior = sp.interior_flat(ndim, nc)
        for lvl in range(1, t.highest_lvl + 1):
            leaves = np.asarray(t.lvl_leaves[lvl - 1])
            if len(leaves) == 0:
                continue
            n = len(leaves)
            acc = 0.0
            for d in range(ndim):
                faxes = [np.arange(0, nc + 1) if k == d
                         else np.arange(0, nc) for k in range(ndim)]
                fidx = sp.fc_flat(ndim, nc, *faxes)
                shp = (n,) + tuple(nc + 1 if k == d else nc
                                   for k in range(ndim))
                Fe = np.asarray(self.fc[self.fc_flux[0], d, leaves[:, None],
                                        fidx[None, :]]).reshape(shp)
                Ef = np.asarray(self.fc[self.fc_E, d, leaves[:, None],
                                        fidx[None, :]]).reshape(shp)
                prod = Fe * Ef
                lo = tuple(slice(0, nc) if k == d else slice(None)
                           for k in range(ndim))
                hi = tuple(slice(1, nc + 1) if k == d else slice(None)
                           for k in range(ndim))
                acc = acc + 0.5 * (prod[(slice(None),) + lo]
                                   + prod[(slice(None),) + hi]
                                   ).reshape(n, -1)
            self.cc[self.i_power_density, leaves[:, None],
                    interior[None, :]] = acc * uc.elec_charge

    def output_write(self, out_cnt: int, wc_time: float = 0.0):
        if self.surfaces is not None and self._compiled_on:
            # compiled mode: host consumers (surface integral in the log)
            # read the sd arrays; refresh them from the cc rows
            self.surfaces.cc_to_sd(self.cc, self.i_surf_photon,
                                   self.i_surf_sigma)
        if self.compute_power_density:
            self._set_power_density()
        if self.output.regression_test:
            self.output.regression_log(self, out_cnt)
        if self.output.write_vtk_files:
            from .io.vtk import write_vtk
            write_vtk(f"{self.output.name}_{out_cnt:06d}.vtk", self,
                      out_cnt, self.global_time)
        if (self.output.datfile_write
                and out_cnt % self.output.datfile_per_outputs == 0):
            from .io.checkpoint import write_checkpoint
            # ".dat.npz": np.savez appends ".npz" to other suffixes, which
            # would make the on-disk name differ from the constructed one
            write_checkpoint(f"{self.output.name}_{out_cnt:06d}.dat.npz",
                             self)
        if self.output.write_log and out_cnt > 0:
            # streamer velocity from max-E displacement
            # streamer velocity from the max-E displacement per output
            # interval (output_log, m_output.f90:628-630)
            emax, pos = red.tree_max_cc(self.cc, self.tree,
                                        self.i_electric_fld)
            if self.prev_emax_pos is not None:
                self.velocity = float(
                    np.linalg.norm(pos - self.prev_emax_pos)
                    / self.output.dt)
            self.prev_emax_pos = pos
            if self.user.log_subroutine is not None:
                # user-supplied log writer replaces the default
                # (output_write, m_output.f90:360-364)
                self.user.log_subroutine(self, out_cnt)
            else:
                self.output.log(self, out_cnt, wc_time)
        if self.output.npz_write:
            self.output.write_npz(self, out_cnt)
        if (self.output.silo_write
                and out_cnt % self.output.silo_per_outputs == 0):
            self.output.write_grid(self, out_cnt)
        # secondary writers (output_write, m_output.f90:366-410)
        self.output.chemical_rates(self)
        self.output.chemical_amounts(self)
        if self.output.field_maxima_write:
            self.output.write_fld_maxima(self, out_cnt)
        if self.output.plane_write and self.ndim > 1:
            self.output.write_plane(self, out_cnt)
        if self.output.lineout_write:
            self.output.write_line(self, out_cnt)
        if (self.output.cross_write and self.ndim == 2
                and self.tree.coord == "cyl"):
            self.output.write_cross(self, out_cnt)

    def _photoi_set_src(self, time):
        """Photoionization source update; Helmholtz runs through the
        compiled units with the state staying on device, Monte-Carlo (or
        host mode) round-trips (streamer.f90:236-242)."""
        dt = time - self._photoi_prev_time
        params = {"voltage": self.field.current_voltage}
        if (self._compiled_on and getattr(self, "_photoi_compiled", False)
                and not isinstance(self.cc, np.ndarray)):
            cc = self.photoi.jit_set_src(self.cc, dt, params)
        else:
            was_device = not isinstance(self.cc, np.ndarray)
            diel_sync = self.surfaces is not None and self._compiled_on
            if diel_sync:
                # MC photon deposition writes the host sd photon flux;
                # bracket it with a cc<->sd round trip so the compiled
                # engine's cc-resident surface state stays authoritative
                self.surfaces.cc_to_sd(self.cc, self.i_surf_photon,
                                       self.i_surf_sigma)
            self._to_host()
            cc = self.photoi.set_src(self.cc, dt, params)
            if diel_sync:
                cc = self.surfaces.sd_to_cc(cc, self.i_surf_photon,
                                            self.i_surf_sigma)
            self.cc = cc
            if self._compiled_on and was_device:
                self._to_device()
                cc = self.cc
        self._photoi_prev_time = time
        return cc

    # -------------------------------------------------------- main loop
    def _substep(self, cc, fc, dt, dt_lim, time, s_deriv, s_prev, w_prev,
                 s_out, i_step, n_steps, params):
        self.cc, self.fc = cc, fc
        cc, fc, dt_lim_new, diag = self.fluid.forward_euler(
            cc, fc, dt, dt_lim, time, s_deriv, s_prev, w_prev, s_out,
            i_step, n_steps, params)
        self._last_diag = diag
        return cc, fc, dt_lim_new, diag

    def run(self, end_time: Optional[float] = None,
            max_steps: Optional[int] = None):
        """The main time loop (streamer.f90:177-415)."""
        st = self.st
        end_time = end_time if end_time is not None else st.end_time
        n_states = self.dt_cfg.num_steps
        dt = self.global_dt
        time = self.global_time
        out_cnt = self.out_cnt
        time_last_output = time
        t_start = _time.time()
        time_last_print = -1e10
        field_energy_prev = self.field.compute_energy(self.cc, self.fc)
        field_energy_prev_time = time
        fraction_steps_rejected = 0.0
        n_steps_rejected = 0

        if self.compiled_mode and not self._compiled_on:
            self._enable_compiled()

        while True:
            self.it += 1
            if time >= end_time:
                break
            if max_steps is not None and self.it > max_steps:
                break
            if self._compiled_on:
                self._to_device()
            wc_time = _time.time() - t_start
            if wc_time - time_last_print > self.output.status_delay:
                # the status line reads only host-resident scalars and
                # tree topology — no state round trip needed
                self.output.status(self, wc_time)
                time_last_print = wc_time

            # per-iteration user hook (streamer.f90:181-183)
            if self.user.generic is not None:
                t1h = _time.time()
                self.user.generic(self, time)
                self.wc2["hook"] = (self.wc2.get("hook", 0.0)
                                    + _time.time() - t1h)

            # pulse-train bookkeeping (streamer.f90:216-234)
            time_until_next_pulse = (self.field.field_pulse_period
                                     - np.mod(time,
                                              self.field.field_pulse_period))
            self.field.set_voltage(time)
            if (abs(self.field.current_voltage) > 0.0
                    or time_until_next_pulse < self.refine_prepulse_time):
                current_output_dt = self.output.dt
                self.refiner.current_electrode_dx = \
                    self.refine_cfg.electrode_dx
            else:
                current_output_dt = (self.output.dt
                                     * self.output.dt_factor_pulse_off)
                self.refiner.current_electrode_dx = (
                    self.electrode_derefine_factor
                    * self.refine_cfg.electrode_dx)

            write_out = (time + dt >= time_last_output + current_output_dt)
            if write_out:
                dt = max(0.0, time_last_output + current_output_dt - time)

            # make sure to capture the start of the next pulse
            start_of_new_pulse = dt >= time_until_next_pulse
            if start_of_new_pulse:
                dt = max(time_until_next_pulse, self.dt_cfg.dt_min)

            # photoionization update (streamer.f90:236-242)
            if self.photoi.enabled and \
                    self.it % self.photoi.per_steps == 0:
                t1 = _time.time()
                self.cc = self._photoi_set_src(time)
                self.wc["photoi"] += _time.time() - t1

            if self.st.use_electrode:
                if self._compiled_on and not isinstance(self.cc,
                                                        np.ndarray):
                    self._jit_electrode_densities()
                else:
                    self._set_electrode_densities()

            # --- attempt loop with state copy/rejection (streamer.f90:251-288)
            params = {"voltage": self.field.current_voltage}
            use_fused = (self._compiled_on
                         and not isinstance(self.cc, np.ndarray)
                         and self._fused_step_available())
            # when this iteration ends in a refinement epoch, fuse the
            # epoch's prologue (restrict+gc+criterion codes) into the
            # step dispatch: the epoch then adds zero tunnel round trips
            # (streamer.f90:380-411; the codes ride back with the stats)
            fused_epoch = (use_fused
                           and self.it % self.refine_cfg.per_steps == 0
                           and self.user.refine is None)
            if use_fused:
                # the whole step (copy, attempts, substeps, field solves,
                # diagnostics) is ONE dispatch; the stats pull below is
                # the only blocked sync of the step
                t1 = _time.time()
                import jax
                (self.cc, self.fc, stats_dev, codes_dev,
                 eval_ids) = self._jit_full_step(dt, time, fused_epoch)
                t_disp = _time.time()
                self.wc2["adv_dispatch"] = (
                    self.wc2.get("adv_dispatch", 0.0) + t_disp - t1)
                if fused_epoch:
                    # one overlapped pull for both (device_get issues the
                    # D2H copies together — no second round trip)
                    stats, codes = jax.device_get((stats_dev, codes_dev))
                    self.refiner.staged_flags = (
                        eval_ids,
                        self.refiner.codes_to_flags(
                            codes[:len(eval_ids)]))
                else:
                    stats = np.asarray(stats_dev)
                self.wc2["adv_wait"] = (
                    self.wc2.get("adv_wait", 0.0) + _time.time() - t_disp)
                self.wc["advance"] += _time.time() - t1
                # pre-compile the next refinement level's executable in
                # the background (no-op once warmed for this structure)
                t1w = _time.time()
                self._warm_next_level(dt, time)
                self.wc2["warm_sched"] = (
                    self.wc2.get("warm_sched", 0.0) + _time.time() - t1w)
                dt, dt_lim = float(stats[0]), float(stats[1])
                n_rej = int(stats[7])
                if not stats[8] > 0:
                    raise RuntimeError("All time steps were rejected")
                if n_rej:
                    n_steps_rejected += n_rej
                    print(f"{self.it} Step rejected {n_rej}x "
                          f"(#{n_steps_rejected} total), dt now "
                          f"{dt:.4E}")
                    write_out = False
                time = time + dt
                # refresh the host-side voltage at the ACCEPTED time: the
                # trace evaluated it internally (voltage_traced), but the
                # logged 'voltage' column and the Sato-current divisions
                # below read current_voltage, which still holds the
                # step-START value (the reference sets it via
                # field_compute at the new time, streamer.f90:321)
                self.field.set_voltage(time)
                fraction_steps_rejected = 0.99 * fraction_steps_rejected
                if n_rej > 0:
                    fraction_steps_rejected += 0.01
                if self.chem.n_reactions:
                    self.global_rates = (self.global_rates
                                         + stats[11:] * dt)
                self.global_JdotE += float(stats[6]) * dt
                self.dt_limits = stats[2:6].astype(np.float64)
                # Sato current from the in-step field energy
                # (streamer.f90:296-317)
                if self.it % st.current_update_per_steps == 0:
                    fe = float(stats[9])
                    d_fe = ((fe - field_energy_prev)
                            / max(time - field_energy_prev_time, 1e-300))
                    field_energy_prev, field_energy_prev_time = fe, time
                    if abs(self.field.current_voltage) > 0:
                        self.global_JdotE_current = (
                            float(stats[6])
                            / self.field.current_voltage)
                        self.global_displ_current = (
                            d_fe / self.field.current_voltage)
                dt_gas_lim = (float(stats[10]) if self.gasdyn is not None
                              else self.dt_cfg.dt_max)
                diag = {}
            else:
                dt_lim = uc.huge_real
                step_accepted = False
                for attempt in range(MAX_ATTEMPTS_PER_TIME_STEP):
                    t1 = _time.time()
                    self._copy_state(n_states)
                    self.wc["copy"] += _time.time() - t1
                    cc, fc, dt_lim_step, time_new, diag = adv.advance(
                        self.cc, self.fc, dt, time,
                        self.dt_cfg.integrator, self._substep, params)
                    self.cc, self.fc = cc, fc
                    dt_lim_step = float(dt_lim_step)
                    dt_lim = min(dt_lim, dt_lim_step)
                    if dt <= dt_lim_step:
                        step_accepted = True
                        time = time_new
                        break
                    n_steps_rejected += 1
                    print(f"{self.it} Step rejected (#{n_steps_rejected}) "
                          f"(dt, dt_lim) = {dt:.4E} {dt_lim:.4E}")
                    dt = self.dt_cfg.safety_factor * dt_lim_step
                    time = self.global_time
                    write_out = False
                    self._restore_state(n_states, params)
                fraction_steps_rejected = 0.99 * fraction_steps_rejected
                if attempt > 0:
                    fraction_steps_rejected += 0.01
                if not step_accepted:
                    raise RuntimeError("All time steps were rejected")

                # global rate accounting
                diag = self._last_diag
                if self.chem.n_reactions and np.ndim(diag.get("rates", 0)):
                    self.global_rates = (self.global_rates
                                         + np.asarray(diag["rates"]) * dt)
                self.global_JdotE += float(diag.get("JdotE", 0.0)) * dt

                # electric current (Sato) every N steps
                # (streamer.f90:296-317)
                if self.it % st.current_update_per_steps == 0:
                    fe = self.field.compute_energy(self.cc, self.fc)
                    d_fe = ((fe - field_energy_prev)
                            / max(time - field_energy_prev_time, 1e-300))
                    field_energy_prev, field_energy_prev_time = fe, time
                    if abs(self.field.current_voltage) > 0:
                        self.global_JdotE_current = (
                            float(diag.get("JdotE", 0.0))
                            / self.field.current_voltage)
                        self.global_displ_current = (
                            d_fe / self.field.current_voltage)

                # field for the latest state
                t1 = _time.time()
                self.cc, self.fc = self.field.compute(self.cc, self.fc, 0,
                                                      time, True)
                if not isinstance(self.cc, np.ndarray):
                    import jax
                    jax.block_until_ready(self.cc)
                self.wc["field"] += _time.time() - t1

                # gas dynamics advance (streamer.f90:325-336)
                if self.gasdyn is not None:
                    self.cc = self.coupling.add_fluid_source(
                        self.cc, self.fc, dt)
                    dt_gas_lim = self._advance_gas(dt, self.global_time,
                                                   params)
                    self.cc = self.coupling.update_gas_density(
                        self.cc, lambda c, ivs: self._gc_simple(c, ivs))
                else:
                    dt_gas_lim = self.dt_cfg.dt_max

            # new time step (streamer.f90:338-343)
            tmp = self.dt_cfg.max_growth_factor
            if fraction_steps_rejected > 0.1:
                tmp = 1.0
            dt = min(tmp * self.global_dt,
                     self.dt_cfg.safety_factor * min(dt_lim, dt_gas_lim))
            if start_of_new_pulse:
                # start a new pulse with a small time step (streamer.f90:345-351)
                dt = self.dt_cfg.dt_min
                if self.user.new_pulse_conditions is not None:
                    self.user.new_pulse_conditions(self)
            self.global_dt = dt
            self.global_time = time
            if not use_fused:
                # fused steps set dt_limits from the stats vector above
                if np.ndim(diag.get("dt_limits", None)) == 1:
                    self.dt_limits = np.asarray(diag["dt_limits"])
                else:
                    self.dt_limits = np.array([dt_lim, 1e100, 1e100,
                                               1e100])

            if self.global_dt < self.dt_cfg.dt_min:
                self.output.status(self, _time.time() - t_start)
                raise RuntimeError(f"dt too small: {self.global_dt}")

            t1 = _time.time()
            if write_out:
                out_cnt += 1
                self.out_cnt = out_cnt
                time_last_output = self.global_time
                self._to_host()
                self.output_write(out_cnt, _time.time() - t_start)
            self.wc["output"] += _time.time() - t1

            # refinement every refine_per_steps (streamer.f90:380-411)
            t1 = _time.time()
            if self.it % self.refine_cfg.per_steps == 0:
                if fused_epoch:
                    # prologue (restrict+gc+criterion codes) already ran
                    # inside the fused step; the staged flags are set —
                    # nothing to dispatch or pull here
                    pass
                elif self._compiled_on and not isinstance(self.cc,
                                                          np.ndarray):
                    # device restrict/gc fused with the criterion-flag
                    # evaluation: one dispatch, one small int8 pull; the
                    # full state moves to the host only when the
                    # topology actually changes (adjust_refinement)
                    if self.user.refine is None:
                        self.cc = self.jit_restrict_gc_flags()
                    else:
                        self.cc = self.jit_restrict_gc_densities()
                else:
                    self._to_host()
                    self.restrict_and_gc_densities()
                if self.gasdyn is not None and not fused_epoch:
                    gv = np.asarray(self.gasdyn.gas_vars)
                    self.cc = pr.restrict_tree(self.cc, self.tree, gv)
                    for lvl in range(1, self.tree.highest_lvl + 1):
                        plan = gc.get_gc_plan(self.tree, lvl)
                        for iv in self.gasdyn.gas_vars:
                            m = self.registry.methods[iv]
                            self.cc = gc.fill_ghosts_lvl(
                                self.cc, plan, [iv], m["rb"], m["bc"], {})
                self._deferred_epoch_prolong = False
                t1a = _time.time()
                info = self.adjust_refinement(defer_device_prolong=True)
                t1b = _time.time()
                self.wc2["ref_adjust"] = (
                    self.wc2.get("ref_adjust", 0.0) + t1b - t1a)
                if info.n_add > 0 or info.n_rm > 0:
                    if self._deferred_epoch_prolong:
                        # compiled path: prolong into new boxes + field
                        # solve + (compiled) photoi in ONE dispatch
                        self._jit_epoch_epilogue(info, time)
                        self.wc2["ref_epilogue"] = (
                            self.wc2.get("ref_epilogue", 0.0)
                            + _time.time() - t1b)
                        if (self.photoi.enabled and not getattr(
                                self, "_photoi_compiled", False)):
                            self.cc = self._photoi_set_src(time)
                    else:
                        if self._compiled_on:
                            # re-bucket the capacity / trash row and
                            # rewire the jitted units for the new topology
                            self._enable_compiled()
                            self._to_device()
                        self.cc, self.fc = self.field.compute(
                            self.cc, self.fc, 0, time, True)
                        if self.photoi.enabled:
                            self.cc = self._photoi_set_src(time)
                self._deferred_epoch_prolong = False
                if not isinstance(self.cc, np.ndarray) and \
                        os.environ.get("AFIVO_WC_SYNC", "0") == "1":
                    # opt-in drain: attributes the epoch's device time to
                    # wc["refine"] exactly, at the cost of one extra
                    # blocked tunnel round trip per epoch; without it the
                    # next step's stats pull absorbs the wait
                    import jax
                    jax.block_until_ready(self.cc)
            self.wc["refine"] += _time.time() - t1

        self.output.status(self, _time.time() - t_start)
        return out_cnt

    def _gc_simple(self, cc, ivs):
        for lvl in range(1, self.tree.highest_lvl + 1):
            plan = gc.get_gc_plan(self.tree, lvl)
            for iv in ivs:
                m = self.registry.methods.get(
                    iv, dict(rb=gc.RB_INTERP,
                             bc=lambda i, d, c, p: (gc.BC_NEUMANN, 0.0)))
                cc = gc.fill_ghosts_lvl(cc, plan, [iv], m["rb"], m["bc"], {})
        return cc

    def _advance_gas(self, dt, time, params):
        """af_advance on the Euler variables (streamer.f90:330-333)."""
        def substep(cc, fc, dt_s, dt_lim, time_s, s_deriv, s_prev, w_prev,
                    s_out, i_step, n_steps, params_s):
            cc, fc, dt_lim = self.gasdyn.forward_euler(
                cc, fc, dt_s, dt_lim, time_s, s_deriv, s_prev, w_prev,
                s_out, i_step, n_steps, params_s, fluid=self.fluid)
            return cc, fc, dt_lim, {}

        self.cc, self.fc, dt_lim, _, _ = adv.advance(
            self.cc, self.fc, dt, time, self.dt_cfg.integrator, substep,
            params)
        return float(dt_lim)

    def _copy_state(self, n_states: int):
        """copy_current_state (streamer.f90:571-583)."""
        if not isinstance(self.cc, np.ndarray):
            import jax
            surf_iv = ([self.i_surf_sigma] if self.dielectric is not None
                       else [])
            src = np.asarray(self.all_densities + surf_iv + [self.i_phi],
                             np.int32)
            tgt = np.asarray([iv + n_states for iv in
                              self.all_densities + surf_iv]
                             + [self.i_phi + 1], np.int32)
            if not hasattr(self, "_jit_copy_rows"):
                # donated: the row copy aliases in place instead of
                # materializing a second full state array per step
                self._jit_copy_rows = jax.jit(
                    lambda cc, s, t: cc.at[t].set(cc[s]),
                    donate_argnums=0, static_argnums=())
            self.cc = self._jit_copy_rows(self.cc, src, tgt)
            return
        for iv in self.all_densities:
            self.cc[iv + n_states] = self.cc[iv]
        self.cc[self.i_phi + 1] = self.cc[self.i_phi]
        if self.dielectric is not None:
            i_sd = self.dielectric.I_SURF_DENS
            self.surfaces.copy_variable(i_sd, i_sd + n_states)

    def _restore_state(self, n_states: int, params):
        """restore_previous_state (streamer.f90:586-599)."""
        if not isinstance(self.cc, np.ndarray):
            surf_iv = ([self.i_surf_sigma] if self.dielectric is not None
                       else [])
            tgt = np.asarray(self.all_densities + surf_iv + [self.i_phi],
                             np.int32)
            src = np.asarray([iv + n_states for iv in
                              self.all_densities + surf_iv]
                             + [self.i_phi + 1], np.int32)
            if not hasattr(self, "_jit_copy_rows"):
                import jax
                self._jit_copy_rows = jax.jit(
                    lambda cc, s, t: cc.at[t].set(cc[s]),
                    donate_argnums=0, static_argnums=())
            self.cc = self._jit_copy_rows(self.cc, src, tgt)
            self.cc, self.fc = self.field.jit_from_potential(
                self.cc, self.fc, params)
            return
        for iv in self.all_densities:
            self.cc[iv] = self.cc[iv + n_states]
        self.cc[self.i_phi] = self.cc[self.i_phi + 1]
        if self.dielectric is not None:
            i_sd = self.dielectric.I_SURF_DENS
            self.surfaces.copy_variable(i_sd + n_states, i_sd)
        self.cc, self.fc = self.field.from_potential(self.cc, self.fc,
                                                     params)
