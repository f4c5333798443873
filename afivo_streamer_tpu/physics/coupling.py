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

    def add_fluid_source(self, cc, fc, dt: float):
        """coupling_add_fluid_source / add_heating_box."""
        t = self.tree
        nc, ndim = t.nc, t.ndim
        xp = _xp(cc)
        interior = sp.interior_flat(ndim, nc)
        idx = self.idx
        gd = self.gd
        for lvl in range(1, t.highest_lvl + 1):
            leaves = np.asarray(t.lvl_leaves[lvl - 1])
            if len(leaves) == 0:
                continue
            n = len(leaves)
            # J.E per cell from face products (fc_inner_product)
            JdotE = 0.0
            E_vec = []  # cell-centered E components (face averages)
            for d in range(ndim):
                faxes = [np.arange(0, nc + 1) if k == d else np.arange(0, nc)
                         for k in range(ndim)]
                fidx = sp.fc_flat(ndim, nc, *faxes)
                shape = (n,) + tuple(nc + 1 if k == d else nc
                                     for k in range(ndim))
                Fe = fc[idx.flux_fc[0], d, leaves[:, None],
                        fidx[None, :]].reshape(shape)
                Ef = fc[idx.fc_E, d, leaves[:, None],
                        fidx[None, :]].reshape(shape)
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
                vib = cc[self.i_vib, leaves[:, None], interior[None, :]]
                release = vib / self.gas.vt_time * dt
                vib_new = vib + eff_slow * tmp - release
                e_new = cc[i_e_var, leaves[:, None], interior[None, :]] \
                    + eff_fast * tmp + release
                if isinstance(cc, np.ndarray):
                    cc[self.i_vib, leaves[:, None], interior[None, :]] = \
                        vib_new
                    cc[i_e_var, leaves[:, None], interior[None, :]] = e_new
                else:
                    cc = cc.at[self.i_vib, jnp.asarray(leaves)[:, None],
                               jnp.asarray(interior)[None, :]].set(vib_new)
                    cc = cc.at[i_e_var, jnp.asarray(leaves)[:, None],
                               jnp.asarray(interior)[None, :]].set(e_new)
            else:
                e_new = cc[i_e_var, leaves[:, None], interior[None, :]] \
                    + self.gas.heating_efficiency * tmp
                if isinstance(cc, np.ndarray):
                    cc[i_e_var, leaves[:, None], interior[None, :]] = e_new
                else:
                    cc = cc.at[i_e_var, jnp.asarray(leaves)[:, None],
                               jnp.asarray(interior)[None, :]].set(e_new)

            # EHD body force q E on the momentum
            charge = 0.0
            for s_cc, q in zip(self.charged_cc, self.charged_sign):
                charge = charge + q * cc[s_cc, leaves[:, None],
                                         interior[None, :]]
            charge = uc.elem_charge * charge
            for d in range(ndim):
                mom_var = gd.gas_vars[gd.i_mom[d]]
                upd = (self.gas.EHD_factor * charge
                       * E_vec[d].reshape(n, -1) * dt)
                if isinstance(cc, np.ndarray):
                    cc[mom_var, leaves[:, None], interior[None, :]] += upd
                else:
                    cc = cc.at[mom_var, jnp.asarray(leaves)[:, None],
                               jnp.asarray(interior)[None, :]].add(upd)
        return cc

    def update_gas_density(self, cc, gc_fill):
        """M = rho / molecular_weight on leaves + ghost fill."""
        t = self.tree
        interior = sp.interior_flat(t.ndim, t.nc)
        inv_w = 1.0 / self.gas.molecular_weight
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
