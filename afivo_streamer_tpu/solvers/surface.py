"""Surface grids on dielectric boundaries.

Re-implements the reference's ``afivo/src/m_af_surface.f90``: surfaces live
on box faces where the permittivity jumps (surface_initialize ``:89-172``),
store per-face densities (charge, photon flux, time-state copies), deposit
surface charge into the Poisson rhs split between the gas and dielectric
side (surface_charge_to_rhs ``:514-566``), correct the face-centered field
from sigma (surface_correct_field_fc ``:629-727``), follow refinement by
prolongation/restriction of the surface data (``:327-467``), and provide
refinement links so the mesh never jumps across a surface
(surface_get_refinement_links ``:472-491``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from ..core import spatial as sp
from ..core.tree import Tree, neighb_dim, neighb_low


@dataclass
class Surface:
    in_use: bool
    id_in: int      #: box inside the dielectric
    id_out: int     #: box outside (gas side)
    direction: int  #: neighbor direction of the *outside* box toward inside
    eps: float
    ix_parent: int = -1
    offset_parent: Optional[np.ndarray] = None
    sd: Optional[np.ndarray] = None  #: [n_vars, nc^(ndim-1)]


class Surfaces:
    def __init__(self, tree: Tree, eps_of_box, n_variables: int):
        """eps_of_box: callable(id) -> eps array [(nc+2)^ndim] (host)."""
        self.tree = tree
        self.n_variables = n_variables
        self.surfaces: List[Surface] = []
        self.box_out_to_ix: Dict[int, int] = {}
        self.box_in_to_ix: Dict[int, int] = {}
        nc, ndim = tree.nc, tree.ndim
        self.face_cells = nc ** (ndim - 1)

        # find box pairs with an eps jump (surface_initialize)
        for lvl in range(1, tree.highest_lvl + 1):
            for b in tree.lvl_ids[lvl - 1]:
                b = int(b)
                eps_b = float(np.median(eps_of_box(b)))
                for d in range(2 * ndim):
                    nb = int(tree.neighbors[b, d])
                    if nb < 0:
                        continue
                    eps_nb = float(np.median(eps_of_box(nb)))
                    if eps_b <= 1.0 + 1e-8 < eps_nb:
                        # b is the gas side, nb the dielectric
                        self._add_surface(b, nb, d, eps_nb)

    def _add_surface(self, id_out: int, id_in: int, direction: int,
                     eps: float, parent_ix: int = -1,
                     offset=None) -> int:
        if id_out in self.box_out_to_ix:
            return self.box_out_to_ix[id_out]
        s = Surface(True, id_in, id_out, direction, eps,
                    ix_parent=parent_ix,
                    offset_parent=offset,
                    sd=np.zeros((self.n_variables, self.face_cells)))
        self.surfaces.append(s)
        ix = len(self.surfaces) - 1
        self.box_out_to_ix[id_out] = ix
        self.box_in_to_ix[id_in] = ix
        return ix

    def active(self):
        return [s for s in self.surfaces if s.in_use]

    # ------------------------------------------------------------ helpers
    def _face_slabs(self, s: Surface):
        """(gas-side cells, dielectric-side cells) flat cc indices adjacent
        to the surface."""
        t = self.tree
        nc, ndim = t.nc, t.ndim
        d = s.direction
        dim, low = neighb_dim(d), neighb_low(d)
        g_idx = 1 if low else nc
        # inside box: adjacent layer is on the opposite side
        i_idx = nc if low else 1
        gas = sp.cc_flat(ndim, nc, *[
            np.array([g_idx]) if k == dim else np.arange(1, nc + 1)
            for k in range(ndim)])
        die = sp.cc_flat(ndim, nc, *[
            np.array([i_idx]) if k == dim else np.arange(1, nc + 1)
            for k in range(ndim)])
        return gas, die

    def _face_fidx(self, s: Surface):
        """Flat face indices of the shared face (on both boxes)."""
        t = self.tree
        nc, ndim = t.nc, t.ndim
        d = s.direction
        dim, low = neighb_dim(d), neighb_low(d)
        f_out = 0 if low else nc
        f_in = nc if low else 0
        fo = sp.fc_flat(ndim, nc, *[
            np.array([f_out]) if k == dim else np.arange(0, nc)
            for k in range(ndim)])
        fi = sp.fc_flat(ndim, nc, *[
            np.array([f_in]) if k == dim else np.arange(0, nc)
            for k in range(ndim)])
        return fo, fi

    # ---------------------------------------------------------- operations
    def charge_to_rhs(self, cc, i_sigma: int, i_rhs: int, fac: float):
        """Deposit sigma into the rhs, split between gas and dielectric
        (surface_charge_to_rhs)."""
        t = self.tree
        for s in self.active():
            dim = neighb_dim(s.direction)
            dr = t.lvl_dr(int(t.lvl[s.id_out]))[dim]
            frac_gas = 1.0 / (1.0 + s.eps)
            gas, die = self._face_slabs(s)
            cc[i_rhs, s.id_out, gas] += (frac_gas * fac / dr
                                         * s.sd[i_sigma])
            cc[i_rhs, s.id_in, die] += ((1 - frac_gas) * fac / dr
                                        * s.sd[i_sigma])
        return cc

    def correct_field_fc(self, cc, fc, i_sigma: int, i_fld: int, i_phi: int,
                         fac: float):
        """One-sided field at the surface incl. sigma jump
        (surface_correct_field_fc)."""
        t = self.tree
        nc, ndim = t.nc, t.ndim
        for s in self.active():
            d = s.direction
            dim, low = neighb_dim(d), neighb_low(d)
            dr = t.lvl_dr(int(t.lvl[s.id_out]))[dim]
            eps = s.eps
            fac_fld = np.array([2 * eps, 2.0]) / (1 + eps)
            fac_charge = fac / (1 + eps)
            sign = 1.0 if low else -1.0  # sign of sigma term on gas side
            gas, die = self._face_slabs(s)
            fo, fi = self._face_fidx(s)
            # ghost-layer cells of each box toward the surface
            g_ghost = sp.cc_flat(ndim, nc, *[
                np.array([0 if low else nc + 1]) if k == dim
                else np.arange(1, nc + 1) for k in range(ndim)])
            i_ghost = sp.cc_flat(ndim, nc, *[
                np.array([nc + 1 if low else 0]) if k == dim
                else np.arange(1, nc + 1) for k in range(ndim)])
            phi_g = cc[i_phi, s.id_out, gas]
            phi_gg = cc[i_phi, s.id_out, g_ghost]
            phi_i = cc[i_phi, s.id_in, die]
            phi_ig = cc[i_phi, s.id_in, i_ghost]
            if low:
                fc[i_fld, dim, s.id_out, fo] = (
                    fac_fld[0] / dr * (phi_gg - phi_g)
                    + fac_charge * s.sd[i_sigma])
                fc[i_fld, dim, s.id_in, fi] = (
                    fac_fld[1] / dr * (phi_i - phi_ig)
                    - fac_charge * s.sd[i_sigma])
            else:
                fc[i_fld, dim, s.id_out, fo] = (
                    fac_fld[0] / dr * (phi_g - phi_gg)
                    - fac_charge * s.sd[i_sigma])
                fc[i_fld, dim, s.id_in, fi] = (
                    fac_fld[1] / dr * (phi_ig - phi_i)
                    + fac_charge * s.sd[i_sigma])
        return fc

    def copy_variable(self, i_in: int, i_out: int):
        for s in self.active():
            s.sd[i_out] = s.sd[i_in]

    def weighted_sum(self, i_out: int, i_in: List[int], w: List[float]):
        for s in self.active():
            s.sd[i_out] = sum(wi * s.sd[ii] for ii, wi in zip(i_in, w))

    def get_integral(self, i_surf: int) -> float:
        """Integral of a surface density (surface_get_integral,
        ``m_af_surface.f90:293-324``): in cylindrical coordinates each
        surface element is weighted with 2 pi r of its face center."""
        t = self.tree
        nc = t.nc
        total = 0.0
        for s in self.active():
            d = s.direction
            dim, low = neighb_dim(d), neighb_low(d)
            lvl = int(t.lvl[s.id_out])
            dr = t.lvl_dr(lvl)
            tdims = [k for k in range(t.ndim) if k != dim]
            area = float(np.prod([dr[k] for k in tdims])) if tdims else 1.0
            if t.coord == "cyl":
                r0 = t.box_r_min(np.asarray([s.id_out]))[0]
                if dim == 1:  # z-normal surface: elements at varying r
                    i = np.arange(1, nc + 1)
                    r_face = r0[0] + (i - 0.5) * dr[0]
                else:         # r-normal surface: constant radius R
                    r_face = np.full(nc, r0[0] + (0.0 if low else nc * dr[0]))
                total += float(np.sum(
                    2 * np.pi * r_face * area * s.sd[i_surf]))
            else:
                total += area * float(np.sum(s.sd[i_surf]))
        return total

    def refinement_links(self) -> np.ndarray:
        """Box pairs that must have equal refinement
        (surface_get_refinement_links)."""
        out = [(s.id_in, s.id_out) for s in self.active()]
        return np.asarray(out, np.int64).reshape(-1, 2)

    # --------------------------------------------------- refinement update
    def update_after_refinement(self, ref_info):
        """surface_update_after_refinement (``m_af_surface.f90:327-363``)."""
        t = self.tree
        nc, ndim = t.nc, t.ndim
        hnc = nc // 2
        # removed boxes: restrict child surfaces back to the parent surface
        for rid in ref_info.removed:
            ix = self.box_out_to_ix.get(int(rid))
            if ix is None or not self.surfaces[ix].in_use:
                continue
            s = self.surfaces[ix]
            p_ix = s.ix_parent
            if p_ix < 0:
                raise RuntimeError("Too much derefinement on surface")
            sp_ = self.surfaces[p_ix]
            dix = s.offset_parent
            if ndim == 2:
                sp_.sd[:, dix[0]:dix[0] + hnc] = 0.5 * (
                    s.sd[:, 0::2] + s.sd[:, 1::2])
            elif ndim == 3:
                sd3 = s.sd.reshape(-1, nc, nc)
                avg = 0.25 * (sd3[:, 0::2, 0::2] + sd3[:, 1::2, 0::2]
                              + sd3[:, 0::2, 1::2] + sd3[:, 1::2, 1::2])
                spd = sp_.sd.reshape(-1, nc, nc)
                spd[:, dix[0]:dix[0] + hnc, dix[1]:dix[1] + hnc] = avg
            sp_.in_use = True
            self.box_out_to_ix.pop(s.id_out, None)
            self.box_in_to_ix.pop(s.id_in, None)
            s.in_use = False

        # new boxes: prolong parent surfaces onto children
        handled = set()
        for cid in ref_info.added:
            p_id = int(t.parent[int(cid)])
            p_ix = self.box_out_to_ix.get(p_id)
            if p_ix is None or not self.surfaces[p_ix].in_use or \
                    p_ix in handled:
                continue
            handled.add(p_ix)
            sp_ = self.surfaces[p_ix]
            d = sp_.direction
            dim = neighb_dim(d)
            low = neighb_low(d)
            tdims = [k for k in range(ndim) if k != dim]
            # children of p_id adjacent to the dielectric side
            for c in t.children[p_id]:
                c = int(c)
                cdix = t.ix[c] % 2
                if cdix[dim] != (0 if low else 1):
                    continue
                id_in = int(t.neighbors[c, d])
                if id_in < 0:
                    raise RuntimeError("surface prolongation: missing child")
                dix = np.array([hnc * cdix[k] for k in tdims], np.int64)
                ix = self._add_surface(c, id_in, d, sp_.eps, p_ix, dix)
                s = self.surfaces[ix]
                if ndim == 2:
                    vals = sp_.sd[:, dix[0]:dix[0] + hnc]
                    s.sd[:, 0::2] = vals
                    s.sd[:, 1::2] = vals
                elif ndim == 3:
                    spd = sp_.sd.reshape(-1, nc, nc)
                    vals = spd[:, dix[0]:dix[0] + hnc, dix[1]:dix[1] + hnc]
                    sd3 = s.sd.reshape(-1, nc, nc)
                    sd3[:, 0::2, 0::2] = vals
                    sd3[:, 1::2, 0::2] = vals
                    sd3[:, :, 1::2] = sd3[:, :, 0::2]
            # deactivate the parent surface
            self.box_out_to_ix.pop(sp_.id_out, None)
            self.box_in_to_ix.pop(sp_.id_in, None)
            sp_.in_use = False
            # re-register children mappings (done in _add_surface)
        return
