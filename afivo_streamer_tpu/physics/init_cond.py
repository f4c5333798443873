"""Initial conditions: background density and seeds.

Re-implements the reference's ``src/m_init_cond.f90`` (init_cond_initialize
``:39-144``, init_cond_set_box ``:217-291``): background electron/ion
density, line seeds with configurable endpoints, widths and fall-off
profiles, optional per-species seeds; evaluated vectorized over whole box
batches (including one ghost layer, as the reference does with
``KJI_DO(0,nc+1)``)."""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..utils import geometry


class InitCond:
    def __init__(self, cfg, settings, registry, i_electron: int,
                 i_1pos_ion: int):
        ndim = settings.ndim
        self.i_electron = i_electron
        self.i_1pos_ion = i_1pos_ion
        self.background_density = cfg.add_get(
            "background_density", 0.0,
            "The background ion and electron density (1/m3)")
        self.stochastic_density = cfg.add_get(
            "stochastic_density", 0.0, "Stochastic background density (1/m3)")
        dens = cfg.add_get("seed_density", [],
                           "Initial density of the seed (1/m3)", dynamic=True)
        self.n_cond = len(dens)
        self.seed_density = np.asarray([float(x) for x in dens])
        r0 = cfg.add_get("seed_rel_r0", [],
                         "The relative start position of the initial seed",
                         dynamic=True)
        r1 = cfg.add_get("seed_rel_r1", [],
                         "The relative end position of the initial seed",
                         dynamic=True)
        ct = cfg.add_get("seed_charge_type", [],
                         "Type of seed: neutral (0), ions (1) or electrons "
                         "(-1)", dynamic=True)
        w = cfg.add_get("seed_width", [], "Seed width (m)", dynamic=True)
        fo = cfg.add_get("seed_falloff", [],
                         "Fall-off type for seed (sigmoid, gaussian, "
                         "smoothstep, step, laser)", dynamic=True)
        if len(r0) != ndim * self.n_cond or len(r1) != ndim * self.n_cond:
            raise ValueError("seed_rel_r0/r1 has incompatible size")
        rel0 = np.asarray([float(x) for x in r0]).reshape(ndim, self.n_cond,
                                                          order="F")
        rel1 = np.asarray([float(x) for x in r1]).reshape(ndim, self.n_cond,
                                                          order="F")
        self.seed_r0 = (rel0.T * settings.domain_len + settings.domain_origin)
        self.seed_r1 = (rel1.T * settings.domain_len + settings.domain_origin)
        self.seed_charge_type = [int(x) for x in ct]
        self.seed_width = np.asarray([float(x) for x in w])
        self.seed_falloff = list(fo)
        d2 = cfg.add_get("seed_density2", list(self.seed_density),
                         "Initial density of the seed at other endpoint "
                         "(1/m3)", dynamic=True)
        self.seed_density2 = np.asarray([float(x) for x in d2])
        # custom species lists (m_init_cond.f90:67-71, 120-139): names are
        # resolved to cc indices by the driver after registration
        self.seed1_species_names = [
            s for s in cfg.add_get(
                "seed1_species", [""],
                "Names of custom species for the first seed", dynamic=True)
            if s]
        self.background_species_names = [
            s for s in cfg.add_get(
                "background_species", [""],
                "Names of custom species for the background density",
                dynamic=True) if s]
        self.seed1_species: list = []      # cc indices, wired by the driver
        self.background_species: list = []

    def set_box_values(self, tree, ids) -> dict:
        """Evaluate initial conditions for the given boxes.

        Returns {cc_index: array [n_ids, (nc+2)^ndim]} of values to SET
        (background) and seeds to ADD are already combined."""
        nc, ndim = tree.nc, tree.ndim
        C = (nc + 2) ** ndim
        # background density: custom species list or electrons + first
        # positive ions (init_cond_set_box, m_init_cond.f90:229-235)
        if self.background_species:
            bg_ivs = list(self.background_species)
        else:
            bg_ivs = [self.i_electron, self.i_1pos_ion]
        vals = {iv: np.zeros((len(ids), C)) for iv in
                set(bg_ivs + [self.i_electron, self.i_1pos_ion]
                    + list(self.seed1_species))}
        for n_i, b in enumerate(ids):
            coords = tree.cell_coords(int(b)).reshape(-1, ndim)
            acc = {iv: np.zeros(coords.shape[0]) for iv in vals}
            for iv in bg_ivs:
                acc[iv] += self.background_density
            for s in range(self.n_cond):
                dens = geometry.density_line(
                    coords, self.seed_r0[s], self.seed_r1[s],
                    self.seed_density[s], self.seed_density2[s],
                    self.seed_width[s], self.seed_falloff[s])
                if s == 0 and self.seed1_species:
                    # the first seed can set custom species
                    # (m_init_cond.f90:265-268)
                    for iv in self.seed1_species:
                        acc[iv] += dens
                    continue
                t = self.seed_charge_type[s]
                if t == -1:
                    acc[self.i_electron] += dens
                elif t == 0:
                    acc[self.i_electron] += dens
                    acc[self.i_1pos_ion] += dens
                elif t == 1:
                    acc[self.i_1pos_ion] += dens
                else:
                    raise ValueError("Invalid seed_charge_type")
            for iv in vals:
                vals[iv][n_i] = acc[iv]
        return vals

    def apply(self, cc, tree, ids):
        vals = self.set_box_values(tree, ids)
        ids = np.asarray(ids)
        if isinstance(cc, np.ndarray):
            for iv, v in vals.items():
                cc[iv, ids] = v
        else:
            import jax.numpy as jnp
            for iv, v in vals.items():
                cc = cc.at[iv, jnp.asarray(ids)].set(v)
        return cc


def stochastic_density(sim, rng_seed: int = 0):
    """Add a stochastic background density to electrons and ions
    (init_cond_stochastic_density, ``m_init_cond.f90:146-198``): uniform
    white noise in [0, stochastic_density) created on the coarsest fully
    refined level and linearly prolonged (additively) to finer levels.
    Like the reference this is a utility for user code and is not invoked
    automatically."""
    import numpy as np
    from ..core import spatial as sp
    from ..core import prolong_restrict as pr
    from ..core import ghostcell as gc

    ic = sim.init_cond
    if ic.stochastic_density <= 0.0:
        return
    t = sim.tree
    nc, ndim = t.nc, t.ndim
    i_rhs = sim.i_rhs
    rng = np.random.default_rng(rng_seed)
    interior = sp.interior_flat(ndim, nc)

    # highest level that is fully refined = first level with leaves
    my_lvl = next(lvl for lvl in range(1, t.highest_lvl + 1)
                  if len(t.lvl_leaves[lvl - 1]) > 0)
    sim.cc[i_rhs] = 0.0
    ids0 = np.asarray(t.lvl_ids[my_lvl - 1])
    sim.cc[i_rhs, ids0[:, None], interior[None, :]] = (
        rng.random((len(ids0), nc ** ndim)) * ic.stochastic_density)

    neumann = lambda iv, d, c, p: (gc.BC_NEUMANN, 0.0)  # noqa: E731
    for lvl in range(my_lvl, t.highest_lvl):
        plan = gc.get_gc_plan(t, lvl)
        sim.cc = gc.fill_ghosts_lvl(sim.cc, plan, [i_rhs], gc.RB_INTERP,
                                    neumann, {})
        parents = np.asarray([b for b in t.lvl_ids[lvl - 1]
                              if t.children[int(b), 0] >= 0])
        if len(parents) == 0:
            continue
        children = t.children[parents].reshape(-1)
        pplan = pr.ProlongRestrictPlan(t, children)
        sim.cc = pr.prolong(sim.cc, pplan, [i_rhs], method="linear",
                            add=True)

    for lvl in range(my_lvl, t.highest_lvl + 1):
        ids = np.asarray(t.lvl_ids[lvl - 1])
        noise = sim.cc[i_rhs, ids[:, None], interior[None, :]]
        for iv in (sim.i_electron, sim.i_1pos_ion):
            sim.cc[iv, ids[:, None], interior[None, :]] += noise
    # restrict and refill ghosts of the modified species
    sim.cc = pr.restrict_tree(sim.cc, t, [sim.i_electron, sim.i_1pos_ion])
    sim.cc = sim._gc_simple(sim.cc, [sim.i_electron, sim.i_1pos_ion])
