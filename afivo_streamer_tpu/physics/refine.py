"""Adaptive-refinement criterion.

Re-implements the reference's ``src/m_refine.f90`` (default_refinement
``:198-298``): refine where alpha(f E)/f * dx exceeds refine_adx (with
optional effective alpha), derefine below an eighth of that, keep the seed
region refined until refine_init_time, user regions/limits, and dx clamps.
Evaluated vectorized over the box batch on the host at refinement epochs.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .. import constants as uc
from ..core import spatial as sp
from ..core.tree import DO_REF, KEEP_REF, RM_REF
from ..utils import geometry
from .transport_data import TD_ALPHA, TD_ETA


class RefineSettings:
    def __init__(self, cfg, ndim: int = 2):
        self.buffer_width = cfg.add_get(
            "refine_buffer_width", 4,
            "The refinement buffer width in cells (around flagged cells)")
        self.per_steps = cfg.add_get(
            "refine_per_steps", 2,
            "The number of steps after which the mesh is updated")
        self.min_dx = cfg.add_get(
            "refine_min_dx", 1.0e-7,
            "The grid spacing will always be larger than this value (m)")
        self.max_dx = cfg.add_get(
            "refine_max_dx", 1.0e-3,
            "The grid spacing will always be smaller than this value (m)")
        self.adx = cfg.add_get("refine_adx", 1.0,
                               "Refine if alpha*dx is larger than this value")
        self.derefine_dx = cfg.add_get(
            "derefine_dx", 1e-4,
            "Only derefine if grid spacing if smaller than this value")
        self.init_time = cfg.add_get(
            "refine_init_time", 10e-9,
            "Refine around initial conditions up to this time")
        self.init_fac = cfg.add_get(
            "refine_init_fac", 0.25,
            "Refine until dx is smaller than this factor times the seed width")
        self.electrode_dx = cfg.add_get(
            "refine_electrode_dx", 1e99,
            "Ensure grid spacing around electrode is less than this value (m)")
        self.adx_fac = cfg.add_get(
            "refine_adx_fac", 1.0,
            "For refinement, use alpha(f * E)/f, where f is this factor")
        self.cphi = cfg.add_get(
            "refine_cphi", 1e99,
            "Refine if the curvature in phi is larger than this value")
        self.derefine_cphi = cfg.add_get(
            "derefine_cphi", 1e99,
            "Allow derefinement if the curvature in phi is smaller than this")
        self.min_dens = cfg.add_get(
            "refine_min_dens", -1.0e99,
            "Minimum electron density for adding grid refinement")
        self.use_alpha_effective = cfg.add_get(
            "refine_use_alpha_effective", False,
            "Use effective alpha (minus attachment) for refinement")
        regions_dr = cfg.add_get("refine_regions_dr", [1.0e99],
                                 "Refine regions up to this grid spacing (m)",
                                 dynamic=True)
        self.regions_dr = np.asarray([float(x) for x in regions_dr])
        self.regions_tstop = np.asarray([float(x) for x in cfg.add_get(
            "refine_regions_tstop", [1.0e99],
            "Refine regions up to this simulation time", dynamic=True)])
        self.regions_rmin = np.asarray([float(x) for x in cfg.add_get(
            "refine_regions_rmin", [0.0] * ndim, "Minimum coordinate of the "
            "refinement regions", dynamic=True)])
        self.regions_rmax = np.asarray([float(x) for x in cfg.add_get(
            "refine_regions_rmax", [0.0] * ndim, "Maximum coordinate of the "
            "refinement regions", dynamic=True)])
        limits_dr = cfg.add_get("refine_limits_dr", [1.0e99],
                                "Refine regions at most up to this grid "
                                "spacing", dynamic=True)
        self.limits_dr = np.asarray([float(x) for x in limits_dr])
        self.limits_rmin = np.asarray([float(x) for x in cfg.add_get(
            "refine_limits_rmin", [0.0] * ndim, "Minimum coordinate of the "
            "refinement limits", dynamic=True)])
        self.limits_rmax = np.asarray([float(x) for x in cfg.add_get(
            "refine_limits_rmax", [0.0] * ndim, "Maximum coordinate of the "
            "refinement limits", dynamic=True)])


class RefineCriterion:
    def __init__(self, settings: RefineSettings, tree, transport, gas,
                 init_cond, i_electric_fld: int, i_electron: int,
                 lsf_data=None):
        self.rs = settings
        self.tree = tree
        self.td = transport
        self.gas = gas
        self.ic = init_cond
        self.i_electric_fld = i_electric_fld
        self.i_electron = i_electron
        self.lsf_data = lsf_data
        self.current_electrode_dx = settings.electrode_dx
        self.time = 0.0

    def _fetch_criterion(self, cc, ids, interior):
        """Gather the two criterion variables (field norm, electrons) on
        the leaf interiors. With a device-resident state this is ONE
        jitted gather + one small transfer — eager per-op dispatch on the
        TPU backend costs ~40 ms per op, so the naive two eager gathers
        dominate the refinement epoch otherwise."""
        if isinstance(cc, np.ndarray):
            fld = cc[self.i_electric_fld, ids[:, None], interior[None, :]]
            elec = cc[self.i_electron, ids[:, None], interior[None, :]]
            return np.asarray(fld), np.asarray(elec)
        import jax
        if not hasattr(self, "_jit_fetch"):
            iv2 = np.asarray([self.i_electric_fld, self.i_electron],
                             np.int32)
            self._jit_fetch = jax.jit(
                lambda cc, ids, itr: cc[iv2[:, None, None],
                                        ids[None, :, None],
                                        itr[None, None, :]])
        # pad the id list to a power-of-two bucket: the exact leaf count
        # changes every growth epoch, and an exact-shape jitted gather
        # would recompile each time
        n = len(ids)
        nb = 4
        while nb < n:
            nb *= 2
        ids_p = np.full(nb, int(ids[0]), ids.dtype)
        ids_p[:n] = ids
        both = np.asarray(self._jit_fetch(cc, ids_p, interior))[:, :n]
        return both[0], both[1]

    def base_flags_traced(self, cc, ids, itr, mdx):
        """Traced alpha*dx criterion: LUT alpha, adx thresholds and the
        derefine rule reduced to ONE int8 flag code per cell. Called
        in-trace by the driver's fused restrict+gc+flags epoch dispatch
        (driver.jit_restrict_gc_flags) and jitted standalone by
        _device_base_flags below."""
        import jax.numpy as jnp
        rs = self.rs
        gas_dens = float(self.gas.number_density)
        iv2 = np.asarray([self.i_electric_fld, self.i_electron],
                         np.int32)
        both = cc[iv2[:, None, None], ids[None, :, None],
                  itr[None, None, :]]
        fld, elec = both[0], both[1]
        fld_td = fld * (uc.SI_to_Townsend / gas_dens)
        if rs.use_alpha_effective:
            alpha = (self.td.tbl.get_col(TD_ALPHA,
                                         rs.adx_fac * fld_td)
                     - self.td.tbl.get_col(TD_ETA,
                                           rs.adx_fac * fld_td))
            alpha = jnp.maximum(alpha, 0.0)
        else:
            alpha = self.td.tbl.get_col(TD_ALPHA,
                                        rs.adx_fac * fld_td)
        adx = alpha * (gas_dens / rs.adx_fac) * mdx[:, None]
        ref = (adx > rs.adx) & (elec > rs.min_dens)
        # clamp the derefine_dx default (1e100) so the weak
        # cast to f32 does not overflow-warn at trace time
        drx = min(rs.derefine_dx, 3.0e38)
        rm = ((adx < 0.125 * rs.adx)
              & (mdx[:, None] < drx) & ~ref)
        return (ref.astype(jnp.int8)
                + 2 * rm.astype(jnp.int8))

    def codes_to_flags(self, code):
        """int8 criterion codes -> DO/KEEP/RM flag array (host)."""
        flags = np.full(code.shape, KEEP_REF, dtype=np.int64)
        flags[code == 1] = DO_REF
        flags[code == 2] = RM_REF
        return flags

    def _device_base_flags(self, cc, ids, interior, max_dx):
        """The alpha*dx criterion entirely on device: LUT alpha, adx
        thresholds, and the derefine rule reduce to ONE int8 flag code
        per cell, so a refinement check transfers ~n_cells bytes instead
        of two f64 fields (~16x less over the TPU tunnel, plus the LUT
        work stays on device)."""
        import jax
        import jax.numpy as jnp
        if not hasattr(self, "_jit_base_flags"):
            self._jit_base_flags = jax.jit(self.base_flags_traced)
        n = len(ids)
        nb = 4
        while nb < n:
            nb *= 2
        ids_p = np.full(nb, int(ids[0]), ids.dtype)
        ids_p[:n] = ids
        mdx_p = np.zeros(nb)
        mdx_p[:n] = max_dx
        mdx_p = jnp.asarray(mdx_p, cc.dtype)
        code = np.asarray(self._jit_base_flags(
            cc, ids_p, interior, mdx_p))[:n]
        flags = np.full(code.shape, KEEP_REF, dtype=np.int64)
        flags[code == 1] = DO_REF
        flags[code == 2] = RM_REF
        return flags

    def cell_flags(self, cc, ids) -> np.ndarray:
        """default_refinement for the given boxes; returns flags
        [n, [nc]^ndim]."""
        t = self.tree
        rs = self.rs
        nc, ndim = t.nc, t.ndim
        ids = np.asarray(ids)
        n = len(ids)
        interior = sp.interior_flat(ndim, nc)
        shape = (n,) + (nc,) * ndim
        lvls = t.lvl[ids]
        max_dx = np.array([t.lvl_dr(int(l)).max() for l in lvls])
        min_dx = np.array([t.lvl_dr(int(l)).min() for l in lvls])
        bshape = (n,) + (1,) * ndim
        staged = self.__dict__.pop("staged_flags", None)
        if staged is not None and np.array_equal(staged[0], ids):
            # base flags precomputed inside the fused restrict+gc epoch
            # dispatch (driver.jit_restrict_gc_flags): reuse — the epoch
            # then costs ONE device round trip instead of two
            flags = staged[1].reshape(shape)
        elif not isinstance(cc, np.ndarray):
            flags = self._device_base_flags(cc, ids, interior,
                                            max_dx).reshape(shape)
        else:
            fld, elec = self._fetch_criterion(cc, ids, interior)
            fld = fld.reshape(shape)
            elec = elec.reshape(shape)
            gas_dens = self.gas.number_density
            fld_td = fld * uc.SI_to_Townsend / gas_dens
            if rs.use_alpha_effective:
                alpha = (self.td.tbl.get_col(TD_ALPHA, rs.adx_fac * fld_td)
                         - self.td.tbl.get_col(TD_ETA,
                                               rs.adx_fac * fld_td))
                alpha = np.maximum(alpha, 0.0)
            else:
                alpha = self.td.tbl.get_col(TD_ALPHA, rs.adx_fac * fld_td)
            alpha = alpha * gas_dens / rs.adx_fac
            adx = alpha * max_dx.reshape(bshape)

            flags = np.full(shape, KEEP_REF, dtype=np.int64)
            flags = np.where((adx > rs.adx) & (elec > rs.min_dens),
                             DO_REF, flags)
            flags = np.where((adx < 0.125 * rs.adx)
                             & (max_dx.reshape(bshape) < rs.derefine_dx)
                             & (flags == KEEP_REF), RM_REF, flags)

        # refine around the initial seeds (m_refine.f90:248-259),
        # vectorized over the flagged boxes (a python per-box loop here
        # costs tens of ms per refinement epoch)
        if self.time < rs.init_time and self.ic is not None \
                and self.ic.n_cond:
            # interior cell coordinates for all boxes: [n, nc^ndim, ndim]
            rmin = t.box_r_min(ids)
            drs = np.stack([t.lvl_dr(int(l)) for l in lvls])  # [n, ndim]
            axes = np.stack(np.meshgrid(
                *[np.arange(nc)] * ndim, indexing="ij"),
                axis=-1).reshape(-1, ndim)  # [nc^ndim, ndim]
            coords_all = (rmin[:, None, :]
                          + (axes[None] + 0.5) * drs[:, None, :])
            for s in range(self.ic.n_cond):
                w = self.ic.seed_width[s]
                sel = max_dx > rs.init_fac * w
                if not sel.any():
                    continue
                dist = geometry.dist_line(
                    coords_all[sel].reshape(-1, ndim),
                    self.ic.seed_r0[s], self.ic.seed_r1[s]).reshape(
                        (int(sel.sum()),) + (nc,) * ndim)
                flags[sel] = np.where(
                    dist - w < 2 * max_dx[sel].reshape((-1,) + (1,) * ndim),
                    DO_REF, flags[sel])

        # refine around the electrode (m_refine.f90:262-265)
        if self.lsf_data is not None:
            has_bnd = self.lsf_data.box_has_boundary(ids)
            for n_i in range(n):
                if has_bnd[n_i] and max_dx[n_i] > self.current_electrode_dx:
                    flags[n_i] = DO_REF

        # fixed refinement regions / limits (m_refine.f90:268-289)
        if len(rs.regions_dr) or len(rs.limits_dr):
            for n_i, b in enumerate(ids):
                rmin = t.box_r_min(np.asarray([int(b)]))[0]
                rmax = rmin + t.lvl_dr(int(lvls[n_i])) * nc
                for k in range(len(rs.regions_dr)):
                    reg_min = rs.regions_rmin.reshape(-1, ndim)
                    reg_max = rs.regions_rmax.reshape(-1, ndim)
                    if (self.time <= rs.regions_tstop[k]
                            and max_dx[n_i] > rs.regions_dr[k]
                            and k < reg_min.shape[0]
                            and np.all(rmax >= reg_min[k])
                            and np.all(rmin <= reg_max[k])):
                        flags[n_i][(nc // 2,) * ndim] = DO_REF
                lim_min = rs.limits_rmin.reshape(-1, ndim)
                for k in range(len(rs.limits_dr)):
                    lim_max = rs.limits_rmax.reshape(-1, ndim)
                    if (max_dx[n_i] < 2 * rs.limits_dr[k]
                            and k < lim_min.shape[0]
                            and np.all(rmin >= lim_min[k])
                            and np.all(rmax <= lim_max[k])):
                        flags[n_i] = np.where(flags[n_i] == DO_REF,
                                              KEEP_REF, flags[n_i])

        # dx clamps (m_refine.f90:292-296), vectorized
        too_coarse = max_dx > rs.max_dx
        too_fine = (min_dx < 2 * rs.min_dx) & ~too_coarse
        bsel = too_coarse.reshape(bshape)
        flags = np.where(bsel, DO_REF, flags)
        fsel = too_fine.reshape(bshape)
        flags = np.where(fsel & (flags == DO_REF), KEEP_REF, flags)
        return flags
