"""Dielectric surface physics: charge from fluxes, secondary and photon
electron emission.

Re-implements the reference's ``src/m_dielectric.f90``: the surface-charge
update from the charged-species fluxes onto the surface with ion secondary
electron emission (dielectric_update_surface_charge ``:94-182``),
photon-flux-driven electron emission where the field points into the
surface (dielectric_photon_emission ``:184-237``), and the interception of
Monte-Carlo photons by surfaces (``:243-``).
"""

from __future__ import annotations

from typing import List

import numpy as np

from .. import constants as uc
from ..core import spatial as sp
from ..core.tree import neighb_dim, neighb_low


class Dielectric:
    #: surface variable indices: photon flux + surface charge states
    I_PHOTON_FLUX = 0
    I_SURF_DENS = 1  # + time-state copies after this index

    def __init__(self, cfg, tree, surfaces, idx, chem, dt_cfg,
                 i_eps: int = -1):
        self.tree = tree
        self.surf = surfaces
        self.idx = idx
        self.chem = chem
        self.idx_eps = i_eps
        self.flux_species_charge = None
        self.flux_pos_ion = []
        # cc rows of the surface state (compiled engine; see
        # solvers/surface.py SurfacePack), set by the driver
        self.i_surf_photon_cc = -1
        self.i_surf_sigma_cc = -1
        self.photon_step_length = cfg.add_get(
            "dielectric%photon_step_length", 1.0e-3,
            "Maximum travel distance for testing boundary intersection")
        self.gamma_se_ph_he = cfg.add_get(
            "dielectric%gamma_se_ph_highenergy", 0.1,
            "Secondary electron emission coefficient for high energy "
            "photons")
        self.gamma_se_ph_le = cfg.add_get(
            "dielectric%gamma_se_ph_lowenergy", 0.1,
            "Secondary electron emission coefficient for low energy "
            "photons")
        self.gamma_se_ion = cfg.add_get(
            "dielectric%gamma_se_ion", 0.1,
            "Secondary electron emission coefficient for positive ion "
            "impact")
        self.photons_no_absorption = cfg.add_get(
            "dielectric%photons_no_absorption", False,
            "Assume photons are not absorbed for photoemission computation")
        self.preset_charge = cfg.add_get(
            "dielectric%preset_charge", [0.0],
            "preset nonuniform surface charge")
        self.preset_charge_distribution = cfg.add_get(
            "dielectric%preset_charge_distribution", [0.0],
            "preset nonuniform surface charge distribution (relative "
            "z-coordinates, scaled by the domain length; like the "
            "reference this is read but not applied anywhere)")

    def update_surface_charge(self, cc, fc, dt: float, s_prev: List[int],
                              w_prev: List[float], s_out: int,
                              flux_species_charge, flux_pos_ion):
        """dielectric_update_surface_charge: d(sigma)/dt = +- sum(flux q);
        ion-impact secondary emission adds electrons in the first gas cell.

        flux_species_charge: charges of the flux species (full charge).
        flux_pos_ion: fc indices of positive-ion fluxes."""
        t = self.tree
        nc, ndim = t.nc, t.ndim
        idx = self.idx
        i_sd = self.I_SURF_DENS
        for s in self.surf.active():
            d = s.direction
            dim, low = neighb_dim(d), neighb_low(d)
            dr = t.lvl_dr(int(t.lvl[s.id_out]))[dim]
            fo, _ = self.surf._face_fidx(s)
            gas, _ = self.surf._face_slabs(s)
            sign = -1.0 if low else 1.0
            # weighted previous states
            sd_new = sum(w * s.sd[i_sd + sp_] for sp_, w in
                         zip(s_prev, w_prev))
            flux_sum = 0.0
            for m, f_iv in enumerate(idx.flux_fc):
                q = flux_species_charge[m]
                flux_sum = flux_sum + q * fc[f_iv, dim, s.id_out, fo]
            sd_new = sd_new + sign * dt * flux_sum
            if len(flux_pos_ion) and self.gamma_se_ion > 0:
                ion_flux = sum(fc[f_iv, dim, s.id_out, fo]
                               for f_iv in flux_pos_ion)
                se_flux = sign * self.gamma_se_ion * ion_flux
                cc[idx.i_electron + s_out, s.id_out, gas] += \
                    dt * se_flux / dr
                sd_new = sd_new + dt * se_flux
            s.sd[i_sd + s_out] = sd_new
        return cc

    def photon_emission(self, cc, fc, dt: float, s_out: int):
        """dielectric_photon_emission: where the field points into the
        surface, emit electrons proportional to the stored photon flux."""
        t = self.tree
        nc, ndim = t.nc, t.ndim
        idx = self.idx
        i_sd = self.I_SURF_DENS
        for s in self.surf.active():
            d = s.direction
            dim, low = neighb_dim(d), neighb_low(d)
            dr = t.lvl_dr(int(t.lvl[s.id_out]))[dim]
            fo, _ = self.surf._face_fidx(s)
            gas, _ = self.surf._face_slabs(s)
            E_face = fc[idx.fc_E, dim, s.id_out, fo]
            into = E_face < 0.0 if low else E_face > 0.0
            pf = s.sd[self.I_PHOTON_FLUX]
            cc[idx.i_electron + s_out, s.id_out, gas] += np.where(
                into, pf * dt / dr, 0.0)
            s.sd[i_sd + s_out] = s.sd[i_sd + s_out] + np.where(
                into, pf * dt * uc.elem_charge, 0.0)
        return cc

    def reset_photons(self):
        for s in self.surf.active():
            s.sd[self.I_PHOTON_FLUX] = 0.0

    def _deposit_photons(self, xyz_src, xyz_abs, weight, frac_gamma,
                         skip=None):
        """Deposit frac_gamma * weight / area onto the surface cells hit by
        the photon segments; returns the hit mask."""
        t = self.tree
        nc, ndim = t.nc, t.ndim
        hit_any = np.zeros(len(xyz_src), dtype=bool)
        for s in self.surf.active():
            d = s.direction
            dim, low = neighb_dim(d), neighb_low(d)
            lvl = int(t.lvl[s.id_out])
            dr = t.lvl_dr(lvl)
            r0 = t.box_r_min(np.asarray([s.id_out]))[0]
            plane = r0[dim] if low else r0[dim] + nc * dr[dim]
            tdims = [k for k in range(ndim) if k != dim]
            a = xyz_src[:, dim]
            b = xyz_abs[:, dim]
            crosses = ((a - plane) * (b - plane) < 0) & ~hit_any
            if skip is not None:
                crosses &= ~skip
            if not crosses.any():
                continue
            # intersection point within the surface extent?
            frac = (plane - a[crosses]) / (b[crosses] - a[crosses])
            hit = xyz_src[crosses] + frac[:, None] * (
                xyz_abs[crosses] - xyz_src[crosses])
            ok = np.ones(len(hit), dtype=bool)
            cell = np.zeros((len(hit),), np.int64)
            for ti, k in enumerate(tdims):
                rel = (hit[:, k] - r0[k]) / dr[k]
                ok &= (rel >= 0) & (rel < nc)
                cell = cell * nc + np.clip(rel.astype(np.int64), 0, nc - 1)
            sel = np.nonzero(crosses)[0][ok]
            area = np.prod([dr[k] for k in tdims]) if tdims else 1.0
            np.add.at(s.sd[self.I_PHOTON_FLUX], cell[ok],
                      frac_gamma * weight / area)
            hit_any[sel] = True
        return hit_any

    def photon_absorption(self, xyz_src, xyz_abs, weight: float):
        """Intercept MC photons crossing a surface
        (dielectric_photon_absorption, ``m_dielectric.f90:243-336``):
        photons absorbed within their travel path deposit both the
        high-energy and low-energy photoemission fractions and are
        removed; with dielectric%photons_no_absorption the flight paths
        are extended across the domain and deposit only the low-energy
        fraction (segment-plane intersection against the axis-aligned
        surface faces replaces the reference's stepping + bisection).
        Returns the mask of absorbed photons."""
        t = self.tree
        if self.gamma_se_ph_he <= 0 and self.gamma_se_ph_le <= 0:
            return np.zeros(len(xyz_src), dtype=bool)
        absorbed = self._deposit_photons(
            xyz_src, xyz_abs, weight,
            self.gamma_se_ph_he + self.gamma_se_ph_le)
        if self.photons_no_absorption and len(xyz_src):
            # extend the unabsorbed photons' paths across the domain
            dvec = xyz_abs - xyz_src
            norm = np.maximum(np.linalg.norm(dvec, axis=1, keepdims=True),
                              1e-300)
            L = float(np.linalg.norm(t.domain_len))
            far = xyz_abs + dvec / norm * L
            self._deposit_photons(xyz_abs, far, weight,
                                  self.gamma_se_ph_le, skip=absorbed)
        return absorbed
