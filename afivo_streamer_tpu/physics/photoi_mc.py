"""Monte-Carlo photoionization.

Re-implements the reference's ``src/m_photoi_mc.f90``: the Zheleznyak
absorption function for air (phmc_absorption_func_air ``:232-252``), the
tabulated inverse CDF of the absorption distance built with RK4 integration
(phmc_get_table_air ``:122-195``), photon budgeting between 'physical'
photons of weight phmc_min_weight and ~phmc_num_photons super-photons
(``:427-447``), Poisson-like stochastic photon generation per cell with
cylindrical volume weighting (phmc_generate_photons ``:686-801``), isotropic
flight with table-sampled distance (phmc_do_absorption ``:287-330``), and
deposition on a constant or distance-adaptive level followed by
prolongation down the tree (phmc_set_src ``:379-581``).

Photon generation/flight runs vectorized on the host with NumPy random
streams (the reference's xoroshiro stream layout is not reproduced;
regression parity for MC configs is statistical, SURVEY.md 7.3)."""

from __future__ import annotations

from typing import Optional

import numpy as np

from .. import constants as uc
from ..core import spatial as sp
from ..core import ghostcell as gcx
from ..core import prolong_restrict as pr
from ..core import reductions as red
from ..utils.lookup_table import LookupTable


def absorption_func_air(dist, p_O2):
    """Zheleznyak absorption function (phmc_absorption_func_air)."""
    c0 = 3.5 / uc.torr_to_bar
    c1 = 200.0 / uc.torr_to_bar
    eps = np.finfo(np.float64).eps
    r = p_O2 * dist
    small = r * (c0 + c1) < eps
    huge = r * c0 > -np.log(eps)
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        main = (np.exp(-c0 * r) - np.exp(-c1 * r)) / (dist * np.log(c1 / c0))
    limit0 = (c1 - c0 + 0.5 * (c0**2 - c1**2) * r) * p_O2 / np.log(c1 / c0)
    out = np.where(small, limit0, np.where(huge, eps, main))
    return out


def get_table_air(p_O2: float, max_dist: float, absorp_fac: float,
                  frac_is_one: bool = False):
    """Inverse-CDF table r(F) via RK4 (phmc_get_table_air)."""
    tbl_size = 500

    def rk4_drdF(r, dF):
        d1 = 1.0 / absorption_func_air(np.asarray(r), p_O2)
        d2 = 1.0 / absorption_func_air(np.asarray(r + 0.5 * dF * d1), p_O2)
        d3 = 1.0 / absorption_func_air(np.asarray(r + 0.5 * dF * d2), p_O2)
        d4 = 1.0 / absorption_func_air(np.asarray(r + dF * d3), p_O2)
        return (d1 + 2 * d2 + 2 * d3 + d4) / 6.0

    Fmax = 1.0
    for _ in range(5):
        dF = Fmax / (tbl_size - 1)
        r = 0.0
        F = 0.0
        while True:
            r += dF * float(rk4_drdF(r, dF))
            F += dF
            if r > max_dist:
                Fmax = F
                break
    dF = Fmax / (tbl_size - 1)
    fsum = [0.0]
    dist = [0.0]
    for n in range(1, 2 * tbl_size):
        drdF = float(rk4_drdF(dist[-1], dF))
        fsum.append(fsum[-1] + dF)
        dist.append(dist[-1] + dF * drdF)
        if dist[-1] > max_dist:
            break
    fsum = np.asarray(fsum)
    dist = np.asarray(dist)
    if frac_is_one:
        frac_in_tbl = 1.0
    else:
        frac_in_tbl = fsum[-2]
        fsum = fsum / frac_in_tbl
    tbl = LookupTable(0.0, 1.0, tbl_size, 1)
    tbl.set_col(0, fsum[:-1], dist[:-1])
    return tbl, float(frac_in_tbl)


class PhotoiMC:
    def __init__(self, cfg, tree, gas, settings, rng_seed=0):
        self.tree = tree
        self.gas = gas
        self.st = settings
        self.dielectric = None  # wired by the driver when use_dielectric
        self.physical_photons = cfg.add_get(
            "photoi_mc%physical_photons", True,
            "Whether physical photons are used")
        self.min_weight = cfg.add_get(
            "photoi_mc%min_weight", 1.0, "Minimal photon weight")
        self.const_dx = cfg.add_get(
            "photoi_mc%const_dx", True,
            "Whether a constant grid spacing is used for photoionization")
        self.min_dx = cfg.add_get("photoi_mc%min_dx", 1e-9,
                                  "Minimum grid spacing for photoionization")
        self.absorp_fac = cfg.add_get(
            "photoi_mc%absorp_fac", 0.25,
            "At which grid spacing photons are absorbed compared to their "
            "mean distance")
        self.num_photons = cfg.add_get(
            "photoi_mc%num_photons", 5000 * 1000,
            "Maximum number of discrete photons to use")
        ix = gas.index("O2")
        if ix < 0:
            raise ValueError("Photoionization: no oxygen present")
        self.tbl, self.frac_in_tbl = get_table_air(
            gas.fractions[ix] * gas.pressure,
            2 * float(np.max(settings.domain_len)), self.absorp_fac,
            frac_is_one=settings.use_dielectric)
        self.rng = np.random.default_rng(int(abs(int(rng_seed))))

    # --------------------------------------------------------------- core
    def _locate(self, pos: np.ndarray, lvl_target):
        """af_get_loc: (box id, flat cell index) at the deepest existing
        level <= lvl_target per photon; id -1 if outside the domain."""
        t = self.tree
        ndim, nc = t.ndim, t.nc
        n = len(pos)
        ids = np.full(n, -1, np.int64)
        cells = np.zeros(n, np.int64)
        lvls = (np.full(n, lvl_target, np.int64)
                if np.isscalar(lvl_target) else lvl_target.copy())
        lvls = np.minimum(lvls, t.highest_lvl)
        inside = np.all((pos >= t.r_base)
                        & (pos < t.r_base + t.domain_len), axis=1)
        pending = inside.copy()
        cur = lvls.copy()
        while pending.any():
            for k in np.nonzero(pending)[0]:
                lvl = int(cur[k])
                if lvl < 1:
                    pending[k] = False
                    continue
                dr = t.lvl_dr(lvl)
                bix = tuple(int(x) for x in
                            ((pos[k] - t.r_base) // (nc * dr)))
                bid = t._ix_maps[lvl - 1].get(bix) if \
                    lvl - 1 < len(t._ix_maps) else None
                if bid is not None:
                    r0 = t.box_r_min(np.asarray([bid]))[0]
                    cell = np.clip(((pos[k] - r0) // dr).astype(np.int64),
                                   0, nc - 1)
                    ids[k] = bid
                    cells[k] = sp.cc_flat_nd(ndim, nc, cell + 1)
                    pending[k] = False
                else:
                    cur[k] = lvl - 1
        return ids, cells

    def set_src(self, photoi, cc, dt: Optional[float], params):
        """phmc_set_src (``m_photoi_mc.f90:379-581``)."""
        t = self.tree
        nc, ndim = t.nc, t.ndim
        cyl = t.coord == "cyl"
        i_src = photoi.i_rhs
        i_photo = photoi.i_photo
        interior = sp.interior_flat(ndim, nc)

        if self.dielectric is not None:
            # clear accumulated surface photon fluxes
            # (phmc_set_src, m_photoi_mc.f90:415)
            self.dielectric.reset_photons()

        sum_rate = red.tree_sum_cc(cc, t, i_src)
        small = 1e-100
        if dt is not None and self.physical_photons:
            n_produced = dt * sum_rate / self.min_weight
            if n_produced < self.num_photons:
                dt_fac = dt / self.min_weight
            else:
                dt_fac = self.num_photons / (sum_rate + small)
        else:
            dt_fac = self.num_photons / (sum_rate + small)

        # ---- generate photons per leaf cell (phmc_generate_photons)
        src_list = []
        for lvl in range(1, t.highest_lvl + 1):
            leaves = np.asarray(t.lvl_leaves[lvl - 1])
            if len(leaves) == 0:
                continue
            dr = t.lvl_dr(lvl)
            n = len(leaves)
            rate = np.asarray(cc[i_src, leaves[:, None], interior[None, :]])
            if cyl:
                r0 = t.box_r_min(leaves)[:, 0]
                i = np.arange(1, nc + 1)
                r_cc = r0[:, None] + (i[None, :] - 0.5) * dr[0]
                w = 2 * np.pi * np.repeat(r_cc[:, :, None], nc, 2
                                          ).reshape(n, -1)
                tmp = dt_fac * w * rate * np.prod(dr)
            else:
                tmp = dt_fac * rate * np.prod(dr)
            n_create = np.floor(tmp).astype(np.int64)
            n_create += (self.rng.random(tmp.shape) < tmp - n_create)
            total = int(n_create.sum())
            if total == 0:
                continue
            # positions: cell corner + uniform offsets
            box_idx, cell_idx = np.nonzero(n_create)
            reps = n_create[box_idx, cell_idx]
            cell_nd = np.stack(np.unravel_index(
                cell_idx, (nc,) * ndim), -1)  # 0-based cell
            r0s = t.box_r_min(leaves[box_idx])
            corner = r0s + cell_nd * dr
            corner = np.repeat(corner, reps, axis=0)
            u = self.rng.random((total, ndim))
            src_list.append(corner + u * dr)
        if not src_list:
            return self._clear_photo(cc, i_photo)
        xyz = np.concatenate(src_list, axis=0)
        n_used = len(xyz)

        # ---- isotropic flight with sampled distance (phmc_do_absorption)
        rr = self.rng.random(n_used)
        dist = self.tbl.get_col(0, rr)
        # random direction on the unit sphere
        v = self.rng.normal(size=(n_used, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        if cyl:
            # (r, z) -> (x=r, z, y=0); fly in 3D; back to (sqrt(x^2+y^2), z)
            p3 = np.zeros((n_used, 3))
            p3[:, 0] = xyz[:, 0]
            p3[:, 1] = xyz[:, 1]
            p3 = p3 + dist[:, None] * v
            abs_pos = np.stack(
                [np.sqrt(p3[:, 0] ** 2 + p3[:, 2] ** 2), p3[:, 1]], axis=1)
        else:
            abs_pos = xyz + dist[:, None] * v[:, :ndim]

        # ---- photons hitting dielectric surfaces are handled separately
        # (phmc_set_src, m_photoi_mc.f90:466-482)
        if self.dielectric is not None:
            absorbed = self.dielectric.photon_absorption(
                xyz, abs_pos, 1.0 / dt_fac)
            if absorbed.any():
                keep = ~absorbed
                xyz, abs_pos = xyz[keep], abs_pos[keep]
                n_used = len(xyz)
                if n_used == 0:
                    return self._clear_photo(cc, i_photo)

        # ---- deposit on the absorption level
        if self.const_dx:
            lengthscale = float(self.tbl.get_col(0, self.absorp_fac))
            ratio = float(np.max(t.dr_base)) / lengthscale
            pho_lvl = 1 if ratio <= 1 else 1 + int(np.ceil(np.log2(ratio)))
            lvl_target = pho_lvl
        else:
            d = self.absorp_fac * np.linalg.norm(abs_pos - xyz, axis=1)
            d = np.maximum(d, self.min_dx)
            ratio = np.max(t.dr_base) / d
            tmp_l = np.where(ratio <= 1, 1.0, np.log2(np.maximum(ratio, 1)))
            base = np.floor(tmp_l)
            frac = tmp_l - base
            lvl_target = (base + (self.rng.random(n_used) < frac)
                          ).astype(np.int64)
            lvl_target = np.maximum(np.where(ratio <= 1, 1, 1 + base), 1
                                    ).astype(np.int64)
            pho_lvl = 1
        ids, cells = self._locate(abs_pos, lvl_target)

        cc = self._clear_photo(cc, i_photo)
        ok = ids >= 0
        if ok.any():
            idsk = ids[ok]
            cellsk = cells[ok]
            lv = t.lvl[idsk]
            dr_all = t.dr_base[None, :] / (2.0 ** (lv - 1))[:, None]
            vol = np.prod(dr_all, axis=1)
            w = self.frac_in_tbl / (dt_fac * vol)
            if cyl:
                # weight by 1/(2 pi r) at the deposition cell
                cell_nd = np.stack(np.unravel_index(
                    cellsk, (nc + 2,) * ndim), -1) - 1
                r0s = t.box_r_min(idsk)
                r_dep = r0s[:, 0] + (cell_nd[:, 0] + 0.5) * dr_all[:, 0]
                w = w / (2 * np.pi * r_dep)
            np.add.at(cc[i_photo], (idsk, cellsk), w)

        # ---- prolong to finer levels with ghost fill between
        min_lvl = pho_lvl if self.const_dx else 1
        for lvl in range(min_lvl, t.highest_lvl):
            plan = gcx.get_gc_plan(t, lvl)
            cc = gcx.fill_ghosts_lvl(
                cc, plan, [i_photo], gcx.RB_INTERP,
                lambda iv, d, c, p: (gcx.BC_NEUMANN, 0.0), params or {})
            prplan = pr.get_full_plan(t, lvl + 1)
            cc = pr.prolong(cc, prplan, [i_photo], "linear", add=True)
        return cc

    def _clear_photo(self, cc, i_photo):
        allids = np.concatenate([np.asarray(i) for i in self.tree.lvl_ids])
        cc[i_photo, allids] = 0.0
        return cc


def phmc_set_src(photoi, cc, dt, params):
    """Entry point used by physics.photoi."""
    return photoi.mc.set_src(photoi, cc, dt, params)
