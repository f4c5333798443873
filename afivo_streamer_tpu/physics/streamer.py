"""Global variable registry and streamer-wide settings.

The analog of the reference's ``src/m_streamer.f90`` (ST_initialize
``:297-511``): registers all cell-centered / face-centered variables (with
time-state copies), builds the flux-species tables with charge signs, and
holds domain/solver settings. Variable indices are plain ints into the SoA
``cc``/``fc`` arrays of the box batch.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import numpy as np

from ..core import ghostcell as gc
from ..core.tree import Tree
from ..ops.limiters import NAME_TO_LIMITER


class Registry:
    """Cell- and face-centered variable registry (af_add_cc_variable /
    af_add_fc_variable, ``m_af_core.f90:26-99``)."""

    def __init__(self):
        self.cc_names: List[str] = []
        self.cc_num_copies: List[int] = []
        self.cc_write_output: List[bool] = []
        self.fc_names: List[str] = []
        # per-variable methods (set_cc_methods): dicts by base index
        self.methods: Dict[int, Dict] = {}

    def add_cc(self, name: str, n_copies: int = 1,
               write_out: bool = True) -> int:
        ix = len(self.cc_names)
        self.cc_names.append(name)
        self.cc_num_copies.append(n_copies)
        self.cc_write_output.append(write_out)
        for c in range(1, n_copies):
            self.cc_names.append(f"{name}_{c}")
            self.cc_num_copies.append(0)  # marks a copy
            self.cc_write_output.append(False)
        return ix

    def add_fc(self, name: str) -> int:
        self.fc_names.append(name)
        return len(self.fc_names) - 1

    def find_cc(self, name: str) -> int:
        return self.cc_names.index(name)

    @property
    def n_cc(self) -> int:
        return len(self.cc_names)

    @property
    def n_fc(self) -> int:
        return len(self.fc_names)

    def set_cc_methods(self, iv: int, bc: Callable, rb: str = gc.RB_INTERP,
                       prolong: str = "linear", funcval=None) -> None:
        """Set ghost/prolongation methods for a variable and its copies."""
        n = max(self.cc_num_copies[iv], 1)
        for i in range(iv, iv + n):
            self.methods[i] = dict(bc=bc, rb=rb, prolong=prolong,
                                   funcval=funcval)

    def has_methods(self, iv: int) -> bool:
        return iv in self.methods

    @property
    def auto_vars(self) -> List[int]:
        """Base variables with methods (cc_auto_vars): prolonged/restricted
        automatically at refinement; copies excluded."""
        return [iv for iv in self.methods
                if self.cc_num_copies[iv] >= 1
                and self.methods[iv]["funcval"] is None]

    @property
    def func_vars(self) -> List[int]:
        return [iv for iv in self.methods
                if self.cc_num_copies[iv] >= 1
                and self.methods[iv]["funcval"] is not None]


class StreamerSettings:
    """Domain and numerical settings (ST_initialize)."""

    def __init__(self, cfg, ndim: int):
        self.ndim = ndim
        self.cylindrical = cfg.add_get(
            "cylindrical", False,
            "Whether cylindrical coordinates are used (only in 2D)")
        self.use_dielectric = cfg.add_get(
            "use_dielectric", False, "Whether a dielectric is used")
        self.use_electrode = cfg.add_get(
            "use_electrode", False, "Whether to include an electrode")
        self.end_time = cfg.add_get("end_time", 10e-9,
                                    "The desired endtime (s) of the simulation")
        self.box_size = cfg.add_get(
            "box_size", 8, "The number of grid cells per coordinate in a box")
        cgs = cfg.add_get("coarse_grid_size", [-1] * ndim,
                          "The size of the coarse grid", dynamic=True)
        domain_len = cfg.add_get("domain_len", [16e-3] * ndim,
                                 "The length of the domain (m)", dynamic=True)
        origin = cfg.add_get("domain_origin", [0.0] * ndim,
                             "The origin of the domain (m)", dynamic=True)
        periodic = cfg.add_get("periodic", [False] * ndim,
                               "Whether the domain is periodic (per dimension)",
                               dynamic=True)
        if len(domain_len) == 1 and ndim > 1:
            domain_len = domain_len * ndim
        self.domain_len = np.asarray(domain_len, np.float64)
        self.domain_origin = np.asarray(
            origin * ndim if len(origin) == 1 and ndim > 1 else origin,
            np.float64)
        self.periodic = np.asarray(
            periodic * ndim if len(periodic) == 1 and ndim > 1 else periodic,
            bool)
        cgs = np.asarray(cgs * ndim if len(cgs) == 1 and ndim > 1 else cgs,
                         np.int64)
        if np.all(cgs == -1):
            # automatic size (ST_initialize, m_streamer.f90:375-379)
            cgs = self.box_size * np.rint(
                self.domain_len / self.domain_len.min()).astype(np.int64)
        self.coarse_grid_size = cgs

        self.plasma_region_enabled = cfg.add_get(
            "plasma_region_enabled", False,
            "Whether to limit plasma reactions to a certain region")
        self.plasma_region_rmin = np.asarray(cfg.add_get(
            "plasma_region_rmin", [-1e100] * ndim,
            "Limit plasma reactions to coordinates between rmin and rmax",
            dynamic=True), np.float64)
        self.plasma_region_rmax = np.asarray(cfg.add_get(
            "plasma_region_rmax", [1e100] * ndim,
            "Limit plasma reactions to coordinates between rmin and rmax",
            dynamic=True), np.float64)

        self.multigrid_num_vcycles = cfg.add_get(
            "multigrid_num_vcycles", 2,
            "Number of V-cycles to perform per time step")
        self.multigrid_max_rel_residual = cfg.add_get(
            "multigrid_max_rel_residual", 1e-4,
            "Stop multigrid when residual is smaller than this factor "
            "times max(|rhs|)")
        self.current_update_per_steps = cfg.add_get(
            "current_update_per_steps", 1000 * 1000,
            "Per how many iterations the electric current is computed")
        self.prolong_density = cfg.add_get(
            "prolong_density", "limit",
            "Density prolongation method (limit, linear, linear_cons, sparse)")
        self.species_boundary_condition = cfg.add_get(
            "species_boundary_condition", "neumann_zero",
            "Boundary condition for the plasma species")
        self.source_factor = cfg.add_get(
            "fixes%source_factor", "none",
            "Use source factor to prevent unphysical effects due to diffusion")
        if self.source_factor not in ("none", "flux"):
            raise ValueError("Options fixes%source_factor: none, flux")
        drt_max_field = cfg.add_get(
            "fixes%drt_max_field", 1e100,
            "Limit the derived fluxes so the dielectric relaxation time "
            "is respected up to this field")
        if drt_max_field < 1e100:
            # exact reference parity: the reference also rejects this key
            # with `error stop "fixes%drt_max_field not yet implemented"`
            # (m_streamer.f90:415-417) — the ST_drt_limit_flux machinery
            # behind it is dead code there too
            raise ValueError(
                "fixes%drt_max_field not yet implemented (the reference "
                "rejects it identically, m_streamer.f90:415-417)")
        self.source_min_electrons_per_cell = cfg.add_get(
            "fixes%source_min_electrons_per_cell", -1e100,
            "Minimum number of electrons per cell to include source terms")
        self.use_end_streamer_length = cfg.add_get(
            "use_end_streamer_length", False,
            "Whether the length of the streamer is used to end the simulation")
        self.end_streamer_length = cfg.add_get(
            "end_streamer_length", 15e-3,
            "Streamer length at which the simulation will end.")
        self.initial_streamer_pos_steps_wait = cfg.add_get(
            "initial_streamer_pos_steps_wait", 5,
            "Number of simulation steps to wait before initializing the "
            "starting position of the streamer")
        self.compute_power_density = cfg.add_get(
            "compute_power_density", False,
            "Whether to compute the deposited power density")
        self.rng_seed = cfg.add_get("rng_seed", [8123, 91234, 12399, 293434],
                                    "Seed for random numbers", dynamic=True)
        self.memory_limit_gb = cfg.add_get(
            "memory_limit_GB", 4.0 ** (ndim - 1), "Memory limit (GB)")

    @property
    def coord(self) -> str:
        return "cyl" if self.cylindrical else "xyz"


def bc_species_neumann_zero(iv, d, coords, params):
    """Default plasma-species BC (af_bc_neumann_zero)."""
    return gc.BC_NEUMANN, 0.0


def bc_species_dirichlet_zero(iv, d, coords, params, ndim=None):
    """Dirichlet-copy zero in the last dimension, Neumann elsewhere
    (bc_species_dirichlet_zero, ``m_streamer.f90:489-509``)."""
    if d // 2 == ndim - 1:
        return gc.BC_DIRICHLET_COPY, 0.0
    return gc.BC_NEUMANN, 0.0
