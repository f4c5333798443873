"""Streamer analysis routines.

Re-implements the reference's ``src/m_analysis.f90``: local-maxima search
(analysis_get_maxima ``:23-78``), the z-extent of the region where a
variable exceeds a threshold (analysis_zmin_zmax_threshold ``:81-149``),
the maximum of a variable restricted to boxes overlapping a region
(analysis_max_var_region ``:153-198``), the maximum of a product of
variables (analysis_max_var_product ``:200-212``), and the axisymmetric
cross-section integrals (analysis_get_cross ``:218-281``), plus the point
interpolation they need (``afivo/src/m_af_interp.f90`` af_interp1 /
af_interp1_fc).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from .. import constants as uc
from ..core import spatial as sp
from ..core.tree import Tree


def get_id_at(tree: Tree, r: np.ndarray) -> int:
    """Leaf box id containing position r, or -1 outside the domain
    (af_get_id_at: the deepest existing box containing r is a leaf)."""
    nc = tree.nc
    r = np.asarray(r, np.float64)
    if np.any(r < tree.r_base) or \
            np.any(r >= tree.r_base + tree.domain_len):
        return -1
    for lvl in range(tree.highest_lvl, 0, -1):
        dr = tree.lvl_dr(lvl)
        bix = tuple(int(x) for x in ((r - tree.r_base) // (nc * dr)))
        bid = tree._ix_maps[lvl - 1].get(bix) if \
            lvl - 1 < len(tree._ix_maps) else None
        if bid is not None:
            return int(bid)
    return -1


def interp1(cc, tree: Tree, r, ivs: Sequence[int]
            ) -> Tuple[np.ndarray, bool]:
    """Multilinear interpolation of cc variables at point r (af_interp1).
    Uses one ghost layer when r is within half a cell of the box edge."""
    ndim, nc = tree.ndim, tree.nc
    b = get_id_at(tree, r)
    if b < 0:
        return np.zeros(len(ivs)), False
    dr = tree.lvl_dr(int(tree.lvl[b]))
    r0 = tree.box_r_min(np.asarray([b]))[0]
    # cell pair per dim: r lies between centers ix and ix+1 (0-based ghost
    # at index 0)
    ix = np.rint((np.asarray(r) - r0) / dr).astype(np.int64)  # 0..nc
    r_lo = r0 + (ix - 0.5) * dr
    dvec = (np.asarray(r) - r_lo) / dr
    ovec = 1.0 - dvec
    vals = np.zeros(len(ivs))
    for corner in range(2 ** ndim):
        off = [(corner >> k) & 1 for k in range(ndim)]
        w = float(np.prod([dvec[k] if off[k] else ovec[k]
                           for k in range(ndim)]))
        flat = sp.cc_flat_nd(ndim, nc, ix + off)
        for i, iv in enumerate(ivs):
            vals[i] += w * float(cc[iv, b, int(flat)])
    return vals, True


def interp1_fc(fc, tree: Tree, r, ifc: int) -> Tuple[np.ndarray, bool]:
    """Per-dimension linear interpolation of a face-centered field at r
    (af_interp1_fc)."""
    ndim, nc = tree.ndim, tree.nc
    b = get_id_at(tree, r)
    if b < 0:
        return np.zeros(ndim), False
    dr = tree.lvl_dr(int(tree.lvl[b]))
    r0 = tree.box_r_min(np.asarray([b]))[0]
    ix_frac = (np.asarray(r) - r0) / dr  # 0..nc in face index space
    ix = np.clip(np.floor(ix_frac).astype(np.int64), 0, nc - 1)
    frac = ix_frac - ix
    vals = np.zeros(ndim)
    for d in range(ndim):
        lo = ix.copy()
        hi = ix.copy()
        hi[d] += 1
        flo = sp.fc_flat(ndim, nc, *[np.array([int(lo[k])])
                                     for k in range(ndim)])[0]
        fhi = sp.fc_flat(ndim, nc, *[np.array([int(hi[k])])
                                     for k in range(ndim)])[0]
        vals[d] = ((1 - frac[d]) * float(fc[ifc, d, b, int(flo)])
                   + frac[d] * float(fc[ifc, d, b, int(fhi)]))
    return vals, True


def get_maxima(cc, tree: Tree, iv: int, threshold: float, n_max: int
               ) -> Tuple[np.ndarray, int]:
    """Local maxima of cc(iv) above a threshold: strictly larger than at
    least one face neighbor and not smaller than any
    (analysis_get_maxima). Returns (coord_val [n, ndim+1], n_found)."""
    nc, ndim = tree.nc, tree.ndim
    out = []
    n_found = 0
    for lvl in range(1, tree.highest_lvl + 1):
        leaves = np.asarray(tree.lvl_leaves[lvl - 1])
        if len(leaves) == 0:
            continue
        dr = tree.lvl_dr(lvl)
        B = np.asarray(cc[iv, leaves]).reshape(
            (len(leaves),) + (nc + 2,) * ndim)
        itr = (slice(None),) + (slice(1, nc + 1),) * ndim
        val = B[itr]
        ge_all = np.ones_like(val, dtype=bool)
        gt_any = np.zeros_like(val, dtype=bool)
        for d in range(ndim):
            for delta in (-1, 1):
                slc = [slice(1, nc + 1)] * ndim
                slc[d] = slice(1 + delta, nc + 1 + delta)
                nbv = B[(slice(None),) + tuple(slc)]
                ge_all &= val >= nbv
                gt_any |= val > nbv
        hit = (val > threshold) & ge_all & gt_any
        for n_i, cell in zip(*[x for x in
                               [np.nonzero(hit)[0],
                                np.stack(np.nonzero(hit)[1:], -1)]]):
            n_found += 1
            if len(out) < n_max:
                r0 = tree.box_r_min(np.asarray([int(leaves[n_i])]))[0]
                rr = r0 + (cell + 0.5) * dr
                out.append(list(rr) + [float(val[(n_i,) + tuple(cell)])])
    coord_val = np.asarray(out).reshape(-1, ndim + 1)
    return coord_val, n_found


def zmin_zmax_threshold(cc, tree: Tree, iv: int, threshold: float,
                        limits: Sequence[float]) -> np.ndarray:
    """Min/max z coordinate where cc(iv) exceeds a threshold
    (analysis_zmin_zmax_threshold). NOTE: faithfully reproduces the
    reference's box_minmax_z, where *both* entries use the first
    above-threshold plane of each box (``m_analysis.f90:130-136``)."""
    nc, ndim = tree.nc, tree.ndim
    vec = np.array([limits[0], limits[1]], np.float64)
    acc = np.array([1e100, -1e100])
    for lvl in range(1, tree.highest_lvl + 1):
        leaves = np.asarray(tree.lvl_leaves[lvl - 1])
        if len(leaves) == 0:
            continue
        dr = tree.lvl_dr(lvl)
        B = np.asarray(cc[iv, leaves]).reshape(
            (len(leaves),) + (nc + 2,) * ndim)
        itr = (slice(None),) + (slice(1, nc + 1),) * ndim
        val = B[itr]
        # max over the non-z dims -> [n, nc] planes along the last dim
        planes = val.max(axis=tuple(range(1, ndim))) if ndim > 1 else val
        above = planes > threshold
        has = above.any(axis=1)
        if not has.any():
            continue
        first = np.argmax(above, axis=1)  # first above plane (z index)
        z0 = tree.box_r_min(leaves)[:, ndim - 1]
        z_first = z0 + (first + 0.5) * dr[ndim - 1]
        acc[0] = min(acc[0], float(z_first[has].min()))
        acc[1] = max(acc[1], float(z_first[has].max()))
    return np.array([min(vec[0], acc[0]) if acc[0] < 1e99 else vec[0],
                     max(vec[1], acc[1]) if acc[1] > -1e99 else vec[1]])


def max_var_region(cc, tree: Tree, iv: int, r0, r1
                   ) -> Tuple[float, Optional[np.ndarray]]:
    """Max of cc(iv) over leaf boxes that (at least partially) overlap
    [r0, r1]; like the reference, the max is over the *whole* box
    (analysis_max_var_region). Returns (max, coords or None)."""
    nc, ndim = tree.nc, tree.ndim
    interior = sp.interior_flat(ndim, nc)
    best = -1e100
    best_r = None
    for lvl in range(1, tree.highest_lvl + 1):
        leaves = np.asarray(tree.lvl_leaves[lvl - 1])
        if len(leaves) == 0:
            continue
        dr = tree.lvl_dr(lvl)
        bmin = tree.box_r_min(leaves)
        bmax = bmin + nc * dr
        sel = ~(np.any(bmin > np.asarray(r1), axis=1)
                | np.any(bmax < np.asarray(r0), axis=1))
        if not sel.any():
            continue
        sub = leaves[sel]
        vals = np.asarray(cc[iv, sub[:, None], interior[None, :]])
        am = np.unravel_index(np.argmax(vals), vals.shape)
        if vals[am] > best:
            best = float(vals[am])
            cell = np.asarray(np.unravel_index(am[1], (nc,) * ndim))
            rb = tree.box_r_min(np.asarray([int(sub[am[0]])]))[0]
            best_r = rb + (cell + 0.5) * dr
    return best, best_r


def max_var_product(cc, tree: Tree, ivs: Sequence[int]
                    ) -> Tuple[float, Optional[np.ndarray]]:
    """Max of the product of variables over the leaves
    (analysis_max_var_product)."""
    nc, ndim = tree.nc, tree.ndim
    interior = sp.interior_flat(ndim, nc)
    best = -1e100
    best_r = None
    for lvl in range(1, tree.highest_lvl + 1):
        leaves = np.asarray(tree.lvl_leaves[lvl - 1])
        if len(leaves) == 0:
            continue
        dr = tree.lvl_dr(lvl)
        vals = np.ones((len(leaves), nc ** ndim))
        for iv in ivs:
            vals = vals * np.asarray(cc[iv, leaves[:, None],
                                        interior[None, :]])
        am = np.unravel_index(np.argmax(vals), vals.shape)
        if vals[am] > best:
            best = float(vals[am])
            cell = np.asarray(np.unravel_index(am[1], (nc,) * ndim))
            rb = tree.box_r_min(np.asarray([int(leaves[am[0]])]))[0]
            best_r = rb + (cell + 0.5) * dr
    return best, best_r


def get_cross(sim, rmax: float, z: float) -> Tuple[float, float, float]:
    """Axisymmetric cross-section integrals at height z up to radius rmax
    (analysis_get_cross): integrated electron density, charge density and
    conduction current density."""
    t = sim.tree
    if t.coord != "cyl":
        raise ValueError("analysis_get_cross: need cylindrical coordinates")
    if not sim.gas.constant_density:
        raise ValueError("analysis_get_cross: need constant gas density")
    N_inv = 1.0 / sim.gas.number_density
    dr = float(t.lvl_dr(t.highest_lvl).min())
    m = int(rmax / dr) + 1
    elec_dens = charge_dens = current_dens = 0.0
    td = sim.td
    for i in range(1, m + 1):
        r = i * rmax / (m + 1)
        vals, ok = interp1(sim.cc, t, np.array([r, z]),
                           [sim.i_electron, sim.i_electric_fld,
                            sim.field.i_rhs])
        if not ok:
            raise RuntimeError("unsuccessful interp1")
        fvec, ok = interp1_fc(sim.fc, t, np.array([r, z]), sim.field.fc_E)
        if not ok:
            raise RuntimeError("unsuccessful interp1_fc")
        ne, fld, rhs = vals
        Ez = fvec[1]
        Td = fld * uc.SI_to_Townsend * N_inv
        mu = float(td.tbl.get_col(0, Td)) * N_inv  # TD_MOBILITY
        elec_dens += ne * 2 * np.pi * r * dr
        charge_dens += rhs * uc.eps0 * 2 * np.pi * r * dr / uc.elec_charge
        current_dens += Ez * mu * ne * 2 * np.pi * r * dr * uc.elem_charge
    return elec_dens, charge_dens, current_dens
