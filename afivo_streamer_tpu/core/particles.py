"""Particle <-> grid transfer over the AMR box batch.

Re-designs ``afivo/src/m_af_particles.f90`` (af_particles_to_grid
``:39-182``, particles_to_grid_0 ``:184-235``, particles_to_grid_1
``:239-320``, tree_add_from_ghostcells ``:322-...``) and the
grid-to-particle side of ``m_af_interp.f90`` (af_interp1): instead of an
OpenMP loop with per-thread particle ownership, every stage is a
vectorized NumPy pass — a batched tree descent to locate the containing
leaf, np.add.at scatter-deposits (zeroth or bi/tri-linear order), a
ghost-spill fold-back onto same-level neighbors, and gather-interpolate
for grid-to-particle reads.

The host path is NumPy (particle populations are irregular and
re-locate every step; the MC photoionization module, the sole in-repo
producer, generates photons host-side as the reference does).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from . import spatial as sp
from .tree import Tree, NO_BOX


def locate(tree: Tree, r: np.ndarray,
           max_lvl: Optional[int] = None) -> np.ndarray:
    """Containing LEAF box id per particle (af_get_id), vectorized as a
    level-by-level descent through ``tree.children``; -1 outside the
    domain. ``max_lvl`` stops the descent early (deposit on a coarser
    level, as the photoionization module does)."""
    r = np.asarray(r, np.float64).reshape(-1, tree.ndim)
    n = len(r)
    ids = np.full(n, -1, np.int64)
    inside = np.all((r >= tree.r_base)
                    & (r < tree.r_base + tree.domain_len), axis=1)
    if not inside.any():
        return ids
    nc = tree.nc
    dr1 = tree.lvl_dr(1)
    # level-1 containing box via the coarse-grid index map
    cgs = np.asarray(tree.coarse_grid_size) // nc
    bix = ((r - tree.r_base) // (nc * dr1)).astype(np.int64)
    bix = np.clip(bix, 0, cgs - 1)
    lvl1 = {tuple(int(x) for x in tree.ix[int(b)]): int(b)
            for b in tree.lvl_ids[0]}
    for k in np.nonzero(inside)[0]:
        ids[k] = lvl1.get(tuple(int(x) for x in bix[k]), -1)
    # descend: pick the child octant from the position bits
    lvl_cap = tree.highest_lvl if max_lvl is None else int(max_lvl)
    active = ids >= 0
    lvl = 1
    while active.any() and lvl < lvl_cap:
        sel = np.nonzero(active)[0]
        cur = ids[sel]
        has_ch = tree.children[cur, 0] != NO_BOX
        sel = sel[has_ch]
        if len(sel) == 0:
            break
        cur = ids[sel]
        dr = tree.lvl_dr(lvl)
        r0 = tree.box_r_min(cur)
        mid = r0 + 0.5 * nc * dr
        oct_ix = ((r[sel] >= mid) << np.arange(tree.ndim)).sum(axis=1)
        ids[sel] = tree.children[cur, oct_ix]
        mask = np.zeros(len(ids), bool)
        mask[sel] = True
        active = active & mask
        lvl += 1
    return ids


def particles_to_grid(cc, tree: Tree, iv: int, r: np.ndarray,
                      w: np.ndarray, order: int = 0,
                      density: bool = True,
                      max_lvl: Optional[int] = None):
    """Deposit weighted particles into cc[iv] (af_particles_to_grid).

    order 0: add to the containing cell; order 1: bi/tri-linear over the
    2^ndim surrounding cell centers, with contributions that land in a
    ghost layer folded back onto the same-level neighbor
    (tree_add_from_ghostcells). With ``density`` the weights are divided
    by the cell volume (cylindrical volumes in cyl coordinates, matching
    particles_to_grid_0 ``:212-223``)."""
    ndim, nc = tree.ndim, tree.nc
    r = np.asarray(r, np.float64).reshape(-1, ndim)
    w = np.broadcast_to(np.asarray(w, np.float64), (len(r),))
    ids = locate(tree, r, max_lvl=max_lvl)
    ok = ids >= 0
    if not ok.any():
        return cc
    ids, r, w = ids[ok], r[ok], w[ok]
    lvls = tree.lvl[ids]
    r0 = tree.box_r_min(ids)
    drs = np.stack([tree.lvl_dr(int(l)) for l in lvls])  # [n, ndim]

    if order == 0:
        cell = ((r - r0) / drs).astype(np.int64)
        cell = np.clip(cell, 0, nc - 1)
        if density:
            w = w / _cell_volume(tree, ids, cell, drs)
        flat = sp.cc_flat_nd(ndim, nc, cell + 1)
        np.add.at(cc, (iv, ids, flat), w)
        return cc

    if order != 1:
        raise ValueError("order must be 0 or 1")
    if tree.coord == "cyl" and density:
        raise ValueError("cyl + density needs order 0 (reference "
                         "particles_to_grid_1 has the same restriction)")
    # linear: indices of the lower of the two cells per dim, weights
    tmp = (r - r0) / drs + 0.5
    ix = np.floor(tmp).astype(np.int64)          # 1-based lower cell
    wu = tmp - ix
    wl = 1.0 - wu
    if density:
        w = w / np.prod(drs, axis=1)
    # accumulate over the 2^ndim corners; ghost-layer targets (index 0
    # or nc+1) are folded onto the same-level neighbor when it exists
    # (tree_add_from_ghostcells); otherwise clamped to the edge cell so
    # no weight is lost at physical boundaries
    for corner in range(2 ** ndim):
        off = np.array([(corner >> d) & 1 for d in range(ndim)])
        cw = w.copy()
        for d in range(ndim):
            cw = cw * (wu[:, d] if off[d] else wl[:, d])
        tgt = ix + off  # 1-based incl. ghost range [0, nc+1]
        bid = ids.copy()
        cellpos = tgt.copy()
        for d in range(ndim):
            lo = cellpos[:, d] < 1
            hi = cellpos[:, d] > nc
            if lo.any():
                nb = tree.neighbors[bid[lo], 2 * d]
                take = nb >= 0
                sub = np.nonzero(lo)[0]
                bid[sub[take]] = nb[take]
                cellpos[sub[take], d] += nc
                cellpos[sub[~take], d] = 1
            if hi.any():
                nb = tree.neighbors[bid[hi], 2 * d + 1]
                take = nb >= 0
                sub = np.nonzero(hi)[0]
                bid[sub[take]] = nb[take]
                cellpos[sub[take], d] -= nc
                cellpos[sub[~take], d] = nc
        flat = sp.cc_flat_nd(ndim, nc, cellpos)
        np.add.at(cc, (iv, bid, flat), cw)
    return cc


def grid_to_particles(cc, tree: Tree, iv: int,
                      r: np.ndarray) -> np.ndarray:
    """Bi/tri-linear interpolation of cc[iv] at the particle positions
    (af_interp1, ``m_af_interp.f90``), using the ghost layer so no
    neighbor lookups are needed."""
    ndim, nc = tree.ndim, tree.nc
    r = np.asarray(r, np.float64).reshape(-1, ndim)
    ids = locate(tree, r)
    out = np.zeros(len(r))
    ok = ids >= 0
    if not ok.any():
        return out
    sel = np.nonzero(ok)[0]
    bid = ids[sel]
    lvls = tree.lvl[bid]
    r0 = tree.box_r_min(bid)
    drs = np.stack([tree.lvl_dr(int(l)) for l in lvls])
    tmp = (r[sel] - r0) / drs + 0.5
    ix = np.floor(tmp).astype(np.int64)
    wu = tmp - ix
    wl = 1.0 - wu
    acc = np.zeros(len(sel))
    for corner in range(2 ** ndim):
        off = np.array([(corner >> d) & 1 for d in range(ndim)])
        cw = np.ones(len(sel))
        for d in range(ndim):
            cw = cw * (wu[:, d] if off[d] else wl[:, d])
        cell = np.clip(ix + off, 0, nc + 1)  # ghosts usable
        flat = sp.cc_flat_nd(ndim, nc, cell)
        acc = acc + cw * cc[iv, bid, flat]
    out[sel] = acc
    return out


def _cell_volume(tree: Tree, ids, cell, drs) -> np.ndarray:
    """Cell volumes for density deposits (af_cyl_volume_cc in cyl)."""
    if tree.coord == "cyl":
        r0 = tree.box_r_min(ids)[:, 0]
        r_cc = r0 + (cell[:, 0] + 0.5) * drs[:, 0]
        return 2.0 * np.pi * r_cc * np.prod(drs, axis=1)
    return np.prod(drs, axis=1)
