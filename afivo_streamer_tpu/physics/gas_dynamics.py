"""Compressible gas dynamics (Euler equations) coupled to the plasma.

Re-implements the reference's dynamic-gas path: ``src/m_gas.f90``
(gas_forward_euler ``:202-233``, primitive/conservative conversions
``:292-323``, wavespeed ``:325-335``, Euler fluxes ``:337-372``,
axisymmetric geometric source ``:237-266``, radial-momentum axis BC
``:375-392``) on top of the generic MUSCL/Kurganov-Tadmor finite-volume
scheme of ``afivo/src/m_af_flux_schemes.f90`` (flux_generic_tree/box
``:439-663``, reconstruct_lr_1d ``:252-279``, flux_kurganovTadmor_1d
``:306-318``) with the van Leer limiter.

The level passes reuse the 2-ghost extended-array machinery of the plasma
fluid model; all stages are batched elementwise ops.
"""

from __future__ import annotations

from typing import List

import numpy as np
import jax.numpy as jnp

from ..core import spatial as sp
from ..core import ghostcell as gc
from ..core import prolong_restrict as pr
from ..core import rowops as ro
from ..core.tree import Tree
from ..ops.limiters import limiter_apply, LIMITER_VANLEER
from .fluid import get_gc2_plan, gc2_extend


def _xp(a):
    return np if isinstance(a, np.ndarray) else jnp


class GasDynamics:
    def __init__(self, tree: Tree, gas, registry, dt_cfg, settings):
        self.tree = tree
        self.gas = gas
        self.st = settings
        ndim = tree.ndim
        self.n_vars = 2 + ndim  # rho, mom(ndim), E
        self.i_rho = 0
        self.i_mom = list(range(1, 1 + ndim))
        self.i_e = 1 + ndim
        n_copies = dt_cfg.num_steps
        names = (["gas_rho"] + [f"gas_mom_{'xyz'[d]}" for d in range(ndim)]
                 + ["gas_e"])
        self.i_gas_dens = registry.add_cc("M")
        self.gas_vars = [registry.add_cc(nm, n_copies=n_copies)
                         for nm in names]
        self.gas_fluxes = [registry.add_fc(f"flux_{nm}") for nm in names]
        self.gamma = gas.euler_gamma
        # boundary conditions: Neumann zero, except radial momentum on the
        # axis in cylindrical coordinates (bc_radial_momentum)
        self.cyl = tree.coord == "cyl"
        registry.set_cc_methods(self.i_gas_dens,
                                lambda iv, d, c, p: (gc.BC_NEUMANN, 0.0),
                                rb=gc.RB_INTERP, prolong="linear")
        for n, iv in enumerate(self.gas_vars):
            if self.cyl and n == 1:
                registry.set_cc_methods(iv, self._bc_radial_momentum,
                                        rb=gc.RB_INTERP, prolong="limit")
            else:
                registry.set_cc_methods(
                    iv, lambda ivv, d, c, p: (gc.BC_NEUMANN, 0.0),
                    rb=gc.RB_INTERP, prolong="limit")

    def _bc_radial_momentum(self, iv, d, coords, params):
        if d == 0:  # low radial side: antisymmetric momentum
            return gc.BC_DIRICHLET, 0.0
        return gc.BC_NEUMANN, 0.0

    def _bc_fn(self, iv, d, coords, params):
        # iv is iv_base + s_deriv; map back to variable position
        if self.cyl and iv - params.get("_s_deriv", 0) == self.gas_vars[1]:
            return self._bc_radial_momentum(iv, d, coords, params)
        return gc.BC_NEUMANN, 0.0

    # ------------------------------------------------------- conversions
    def to_primitive(self, U):
        """[.., n_vars, cells]: rho, mom -> velocity, E -> pressure.
        rho = 0 rows (trash/padded boxes, uninitialized ghost corners)
        divide against 1 instead of emitting NaN — their cells are never
        read as real state (validity masks exclude them)."""
        xp = _xp(U)
        rho = U[:, self.i_rho]
        rho_safe = xp.where(rho > 0.0, rho, 1.0)
        vel = [U[:, m] / rho_safe for m in self.i_mom]
        ke = 0.5 * rho * sum(v * v for v in vel)
        p = (self.gamma - 1.0) * (U[:, self.i_e] - ke)
        return xp.stack([rho] + vel + [p], axis=1)

    def to_conservative(self, P):
        xp = _xp(P)
        rho = P[:, self.i_rho]
        vel = [P[:, m] for m in self.i_mom]
        ke = 0.5 * rho * sum(v * v for v in vel)
        E = P[:, self.i_e] / (self.gamma - 1.0) + ke
        return xp.stack([rho] + [rho * v for v in vel] + [E], axis=1)

    def max_wavespeed(self, P, d):
        xp = _xp(P)
        rho = P[:, self.i_rho]
        # clamp the trash/padded rows (rho = 0, possibly p < 0 garbage)
        # away from NaN; real cells have rho, p > 0 and are unchanged
        arg = (self.gamma * P[:, self.i_e]
               / xp.where(rho > 0.0, rho, 1.0))
        cs = xp.sqrt(xp.maximum(arg, 0.0))
        return cs + xp.abs(P[:, self.i_mom[d]])

    def fluxes(self, P, d):
        """Euler fluxes from primitive face states (get_fluxes)."""
        xp = _xp(P)
        rho = P[:, self.i_rho]
        vd = P[:, self.i_mom[d]]
        p = P[:, self.i_e]
        out = [rho * vd]
        for k in range(len(self.i_mom)):
            f = rho * P[:, self.i_mom[k]] * vd
            if k == d:
                f = f + p
            out.append(f)
        E = p / (self.gamma - 1.0) + 0.5 * rho * sum(
            P[:, m] ** 2 for m in self.i_mom)
        out.append(vd * (E + p))
        return xp.stack(out, axis=1)

    # ---------------------------------------------- compiled plumbing
    def _pack_of(self, fluid):
        """Ambient epoch pack: reuse the fluid model's thread-local pack
        slot (set by the driver's fused step / per-unit jit wrappers) —
        the gas step traces inside the same units."""
        return fluid._pack if fluid is not None else None

    def _tb(self, lvl: int, pack):
        from ..core import treepack as tp
        if pack is not None:
            return pack.tables[lvl - 1]
        return tp.get_level_tables(self.tree, lvl)

    # ------------------------------------------------------------- step
    def forward_euler(self, cc, fc, dt, dt_lim_state, time, s_deriv,
                      s_prev, w_prev, s_out, i_step, n_steps, params,
                      fluid=None):
        """gas_forward_euler: KT/MUSCL fluxes + conservative update.
        Pack-aware (the gas analog of FluidModel.compute_fluxes): with an
        ambient epoch pack the whole step is traceable — padded leaves
        target the trash row and the CFL reduction is validity-masked."""
        t = self.tree
        nc, ndim = t.nc, t.ndim
        xp = _xp(cc)
        pack = self._pack_of(fluid)
        ivs = [iv + s_deriv for iv in self.gas_vars]
        nv = self.n_vars
        cc = pr.restrict_tree(cc, t, np.asarray(ivs), use_geometry=True,
                              pack=pack)
        params = dict(params or {})
        params["_s_deriv"] = s_deriv
        inv_max_cfl = 1e-100
        n_levels = pack.n_levels if pack is not None else t.highest_lvl

        for lvl in range(1, n_levels + 1):
            plan = (pack.gc2[lvl - 1] if pack is not None
                    else get_gc2_plan(t, lvl))
            if len(plan.leaves) == 0:
                continue
            E, cc = gc2_extend(cc, plan, ivs, self._bc_fn, params,
                               pr.default_prolong_limiter(ndim))
            n = len(plan.leaves)
            dr = plan.dr
            valid = None
            if pack is not None and pack.pad:
                valid = (self._tb(lvl, pack).leaf_valid > 0).reshape(
                    (n,) + (1,) * ndim)
            Eb = E.reshape((n, nv) + (nc + 4,) * ndim)
            Pb = self.to_primitive(Eb.reshape(n, nv, -1)).reshape(
                (n, nv) + (nc + 4,) * ndim)
            cfl_sum = xp.zeros((n,) + (nc,) * ndim, dtype=cc.dtype)

            for d in range(ndim):
                def sl(arr, start, width, ghost=2):
                    slc = []
                    for k in range(ndim):
                        if k == d:
                            slc.append(slice(start, start + width))
                        else:
                            slc.append(slice(ghost, ghost + nc))
                    return arr[(Ellipsis,) + tuple(slc)]

                cL2 = sl(Pb, 0, nc + 1)
                cL = sl(Pb, 1, nc + 1)
                cR = sl(Pb, 2, nc + 1)
                cR2 = sl(Pb, 3, nc + 1)
                slope_f = limiter_apply(cR - cL, cL - cL2, LIMITER_VANLEER)
                slope_g = limiter_apply(cR2 - cR, cR - cL, LIMITER_VANLEER)
                u_l = cL + 0.5 * slope_f
                u_r = cR - 0.5 * slope_g
                w_l = self.max_wavespeed(u_l, d)
                w_r = self.max_wavespeed(u_r, d)
                fl = self.fluxes(u_l, d)
                fr = self.fluxes(u_r, d)
                Ul = self.to_conservative(u_l)
                Ur = self.to_conservative(u_r)
                w = xp.maximum(w_l, w_r)
                flux = 0.5 * (fl + fr - w[:, None] * (Ur - Ul))

                # NOTE: reference uses inv_dr(NDIM) here for all directions
                # (flux_generic_box, m_af_flux_schemes.f90:613)
                lo = tuple(slice(0, nc) if k == d else slice(None)
                           for k in range(ndim))
                hi = tuple(slice(1, nc + 1) if k == d else slice(None)
                           for k in range(ndim))
                cfl_sum = cfl_sum + xp.maximum(
                    w[(slice(None),) + lo], w[(slice(None),) + hi]) \
                    / dr[ndim - 1]

                fshape = (n,) + tuple(nc + 1 if k == d else nc
                                      for k in range(ndim))
                for m, f_iv in enumerate(self.gas_fluxes):
                    fc = ro.fc_set_faces(fc, f_iv, d, plan.leaves,
                                         flux[:, m].reshape(fshape), nc,
                                         ndim)
            if valid is not None:
                cfl_sum = xp.where(valid, cfl_sum, 0.0)
            inv_max_cfl = xp.maximum(inv_max_cfl, xp.max(cfl_sum))

        if fluid is not None:
            fc = fluid.consistent_fluxes(fc, self.gas_fluxes)

        # conservative update + cylindrical geometric source
        for lvl in range(1, n_levels + 1):
            tb = self._tb(lvl, pack)
            leaves = tb.leaves
            if len(leaves) == 0:
                continue
            n = len(leaves)
            dr = t.lvl_dr(lvl)
            # weighted sum of previous states
            outs = {}
            for m, iv in enumerate(self.gas_vars):
                acc = 0.0
                for s, w in zip(s_prev, w_prev):
                    acc = acc + w * ro.cc_get_interior(cc, iv + s, leaves,
                                                       nc, ndim)
                outs[m] = acc
            # geometric source p/r on radial momentum (add_geometric_source)
            if self.cyl:
                U = xp.stack([ro.cc_get_interior(cc, iv + s_deriv, leaves,
                                                 nc, ndim)
                              for iv in self.gas_vars], axis=1)
                rho = U[:, 0]
                ke = 0.5 * sum(U[:, m] ** 2 for m in self.i_mom) \
                    / xp.where(rho > 0.0, rho, 1.0)
                p = (self.gamma - 1.0) * (U[:, self.i_e] - ke)
                r0 = xp.asarray(tb.leaf_r0[:, 0])
                off = np.asarray((np.arange(1, nc + 1) - 0.5) * dr[0],
                                 dtype=cc.dtype)
                r_cc = r0[:, None] + off[None, :]
                inv_r = xp.broadcast_to(
                    (1.0 / r_cc)[:, :, None],
                    (n, nc, nc ** (ndim - 1)))
                outs[1] = outs[1] + dt * p * inv_r.reshape(n, -1)
            # flux divergence
            rfac = None
            if self.cyl:
                rfac = (((r_cc - 0.5 * dr[0]) / r_cc),
                        ((r_cc + 0.5 * dr[0]) / r_cc))
            for m, iv in enumerate(self.gas_vars):
                f_iv = self.gas_fluxes[m]
                div = 0.0
                for d in range(ndim):
                    F = ro.fc_get_faces(fc, f_iv, d, leaves, nc, ndim)
                    lo = tuple(slice(0, nc) if k == d else slice(None)
                               for k in range(ndim))
                    hi = tuple(slice(1, nc + 1) if k == d else slice(None)
                               for k in range(ndim))
                    F_lo = F[(slice(None),) + lo]
                    F_hi = F[(slice(None),) + hi]
                    if rfac is not None and d == 0:
                        shape = (n, nc) + (1,) * (ndim - 1)
                        F_lo = F_lo * rfac[0].reshape(shape)
                        F_hi = F_hi * rfac[1].reshape(shape)
                    div = div + (F_lo - F_hi) / dr[d]
                val = outs[m] + dt * div.reshape(n, -1)
                cc = ro.cc_set_interior(cc, iv + s_out, leaves, val, nc,
                                        ndim)

        dt_lim = 1.0 / inv_max_cfl
        return cc, fc, dt_lim
