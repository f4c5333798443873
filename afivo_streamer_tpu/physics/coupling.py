"""Plasma <-> gas coupling: Joule heating, EHD force, gas density update.

Re-implements the reference's ``src/m_coupling.f90``: J.E heating split into
a fast and a slow (vibrational, V-T relaxing) channel (add_heating_box
``:28-83``), the electrohydrodynamic body force q E on the gas momentum, and
the gas number density update M = rho / molecular_weight (``:86-103``).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import constants as uc
from ..core import spatial as sp
from ..core import rowops as ro


def _xp(a):
    return np if isinstance(a, np.ndarray) else jnp


class Coupling:
    def __init__(self, tree, gas, gasdyn, idx, registry,
                 charged_species_cc, charged_sign):
        self.tree = tree
        self.gas = gas
        self.gd = gasdyn
        self.idx = idx  # FluidIndices
        self.charged_cc = list(charged_species_cc)
        self.charged_sign = np.asarray(charged_sign, np.float64)
        self.i_vib = -1
        if gas.fraction_slow_heating > 0:
            self.i_vib = registry.add_cc("vibrational_energy")

    def add_fluid_source(self, cc, fc, dt: float, pack=None):
        """coupling_add_fluid_source / add_heating_box. With an epoch
        ``pack`` the per-level leaf lists come from the padded tables and
        the method is traceable (padded leaves read/write the trash
        row)."""
        t = self.tree
        nc, ndim = t.nc, t.ndim
        idx = self.idx
        gd = self.gd
        from ..core import treepack as tp
        n_levels = pack.n_levels if pack is not None else t.highest_lvl
        for lvl in range(1, n_levels + 1):
            tb = (pack.tables[lvl - 1] if pack is not None
                  else tp.get_level_tables(t, lvl))
            leaves = tb.leaves
            if len(leaves) == 0:
                continue
            n = len(leaves)
            # J.E per cell from face products (fc_inner_product)
            JdotE = 0.0
            E_vec = []  # cell-centered E components (face averages)
            for d in range(ndim):
                Fe = ro.fc_get_faces(fc, idx.flux_fc[0], d, leaves, nc,
                                     ndim)
                Ef = ro.fc_get_faces(fc, idx.fc_E, d, leaves, nc, ndim)
                lo = tuple(slice(0, nc) if k == d else slice(None)
                           for k in range(ndim))
                hi = tuple(slice(1, nc + 1) if k == d else slice(None)
                           for k in range(ndim))
                prod = (Fe * Ef)
                JdotE = JdotE + 0.5 * (prod[(slice(None),) + lo]
                                       + prod[(slice(None),) + hi])
                E_vec.append(0.5 * (Ef[(slice(None),) + lo]
                                    + Ef[(slice(None),) + hi]))
            tmp = (JdotE * uc.elec_charge * dt).reshape(n, -1)

            i_e_var = gd.gas_vars[gd.i_e]
            if self.gas.fraction_slow_heating > 0:
                eff_fast = self.gas.heating_efficiency * (
                    1 - self.gas.fraction_slow_heating)
                eff_slow = (self.gas.heating_efficiency
                            * self.gas.fraction_slow_heating)
                vib = ro.cc_get_interior(cc, self.i_vib, leaves, nc, ndim)
                release = vib / self.gas.vt_time * dt
                vib_new = vib + eff_slow * tmp - release
                e_new = (ro.cc_get_interior(cc, i_e_var, leaves, nc, ndim)
                         + eff_fast * tmp + release)
                cc = ro.cc_set_interior(cc, self.i_vib, leaves, vib_new,
                                        nc, ndim)
                cc = ro.cc_set_interior(cc, i_e_var, leaves, e_new, nc,
                                        ndim)
            else:
                e_new = (ro.cc_get_interior(cc, i_e_var, leaves, nc, ndim)
                         + self.gas.heating_efficiency * tmp)
                cc = ro.cc_set_interior(cc, i_e_var, leaves, e_new, nc,
                                        ndim)

            # EHD body force q E on the momentum
            charge = 0.0
            for s_cc, q in zip(self.charged_cc, self.charged_sign):
                charge = charge + q * ro.cc_get_interior(cc, s_cc, leaves,
                                                         nc, ndim)
            charge = uc.elem_charge * charge
            for d in range(ndim):
                mom_var = gd.gas_vars[gd.i_mom[d]]
                upd = (self.gas.EHD_factor * charge
                       * E_vec[d].reshape(n, -1) * dt)
                cc = ro.cc_add_interior(cc, mom_var, leaves, upd, nc,
                                        ndim)
        return cc

    def update_gas_density(self, cc, gc_fill, pack=None):
        """M = rho / molecular_weight on leaves + ghost fill."""
        t = self.tree
        nc, ndim = t.nc, t.ndim
        inv_w = 1.0 / self.gas.molecular_weight
        if pack is not None:
            for lvl in range(1, pack.n_levels + 1):
                leaves = pack.tables[lvl - 1].leaves
                if len(leaves) == 0:
                    continue
                rho = ro.cc_get_interior(
                    cc, self.gd.gas_vars[self.gd.i_rho], leaves, nc, ndim)
                cc = ro.cc_set_interior(cc, self.gd.i_gas_dens, leaves,
                                        rho * inv_w, nc, ndim)
            return gc_fill(cc, [self.gd.i_gas_dens])
        interior = sp.interior_flat(ndim, nc)
        leaves = np.concatenate([np.asarray(l) for l in t.lvl_leaves])
        rho = cc[self.gd.gas_vars[self.gd.i_rho], leaves[:, None],
                 interior[None, :]]
        if isinstance(cc, np.ndarray):
            cc[self.gd.i_gas_dens, leaves[:, None], interior[None, :]] = \
                rho * inv_w
        else:
            cc = cc.at[self.gd.i_gas_dens, jnp.asarray(leaves)[:, None],
                       jnp.asarray(interior)[None, :]].set(rho * inv_w)
        return gc_fill(cc, [self.gd.i_gas_dens])
