"""Tree-wide reductions over leaf boxes (volume-weighted sums, maxima).

Re-implements the reference's ``afivo/src/m_af_utils.f90`` reductions
(af_tree_sum_cc ``:966-1026`` incl. the cylindrical 2*pi*r weighting,
af_tree_max_cc with location). Each reduction is one masked batched op per
level.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from . import spatial as sp
from .tree import Tree


def tree_sum_cc(cc, tree: Tree, iv: int, power: int = 1) -> float:
    """Volume-integrated sum of cc(iv)**power over the leaves."""
    nc, ndim = tree.nc, tree.ndim
    interior = sp.interior_flat(ndim, nc)
    total = 0.0
    for lvl in range(1, tree.highest_lvl + 1):
        leaves = np.asarray(tree.lvl_leaves[lvl - 1])
        if len(leaves) == 0:
            continue
        dr = tree.lvl_dr(lvl)
        vals = np.asarray(cc[iv, leaves[:, None], interior[None, :]])
        if power != 1:
            vals = vals ** power
        if tree.coord == "cyl":
            r0 = tree.box_r_min(leaves)[:, 0]
            i = np.arange(1, nc + 1)
            r_cc = r0[:, None] + (i[None, :] - 0.5) * dr[0]
            w = 2.0 * np.pi * np.repeat(r_cc[:, :, None], nc, 2
                                        ).reshape(len(leaves), -1)
            total += float(np.prod(dr)) * float(np.sum(vals * w))
        else:
            total += float(np.prod(dr)) * float(np.sum(vals))
    return total


def tree_max_cc(cc, tree: Tree, iv: int) -> Tuple[float, np.ndarray]:
    """Maximum of cc(iv) over leaf interiors and its cell coordinates
    (af_tree_max_cc with af_reduction_loc)."""
    nc, ndim = tree.nc, tree.ndim
    interior = sp.interior_flat(ndim, nc)
    best = -np.inf
    best_r = np.zeros(ndim)
    for lvl in range(1, tree.highest_lvl + 1):
        leaves = np.asarray(tree.lvl_leaves[lvl - 1])
        if len(leaves) == 0:
            continue
        vals = np.asarray(cc[iv, leaves[:, None], interior[None, :]])
        am = np.unravel_index(np.argmax(vals), vals.shape)
        m = vals[am]
        if m > best:
            best = float(m)
            b = int(leaves[am[0]])
            cell = np.unravel_index(am[1], (nc,) * ndim)
            dr = tree.lvl_dr(lvl)
            r0 = tree.box_r_min(np.asarray([b]))[0]
            best_r = r0 + (np.asarray(cell) + 0.5) * dr
    return best, best_r


def tree_min_cc(cc, tree: Tree, iv: int) -> float:
    nc, ndim = tree.nc, tree.ndim
    interior = sp.interior_flat(ndim, nc)
    best = np.inf
    for lvl in range(1, tree.highest_lvl + 1):
        leaves = np.asarray(tree.lvl_leaves[lvl - 1])
        if len(leaves) == 0:
            continue
        vals = np.asarray(cc[iv, leaves[:, None], interior[None, :]])
        best = min(best, float(np.min(vals)))
    return best


def tree_maxabs_cc(cc, tree: Tree, iv: int) -> float:
    """max |cc(iv)| over leaf interiors (af_tree_maxabs_cc loops leaves)."""
    nc, ndim = tree.nc, tree.ndim
    interior = sp.interior_flat(ndim, nc)
    best = 0.0
    for lvl in range(1, tree.highest_lvl + 1):
        leaves = np.asarray(tree.lvl_leaves[lvl - 1])
        if len(leaves) == 0:
            continue
        vals = np.asarray(cc[iv, leaves[:, None], interior[None, :]])
        best = max(best, float(np.max(np.abs(vals))))
    return best


def tree_max_fc(fc, tree: Tree, dim: int, iv: int
                ) -> Tuple[float, np.ndarray]:
    """Maximum of a face-centered variable along one dimension over the
    leaves, with the face coordinates (af_tree_max_fc)."""
    nc, ndim = tree.nc, tree.ndim
    faxes = [np.arange(0, nc + 1) if k == dim else np.arange(0, nc)
             for k in range(ndim)]
    fidx = sp.fc_flat(ndim, nc, *faxes)
    fshape = tuple(nc + 1 if k == dim else nc for k in range(ndim))
    best = -np.inf
    best_r = np.zeros(ndim)
    for lvl in range(1, tree.highest_lvl + 1):
        leaves = np.asarray(tree.lvl_leaves[lvl - 1])
        if len(leaves) == 0:
            continue
        vals = np.asarray(fc[iv, dim, leaves[:, None], fidx[None, :]])
        am = np.unravel_index(np.argmax(vals), vals.shape)
        m = vals[am]
        if m > best:
            best = float(m)
            b = int(leaves[am[0]])
            face = np.asarray(np.unravel_index(am[1], fshape), np.float64)
            dr = tree.lvl_dr(lvl)
            r0 = tree.box_r_min(np.asarray([b]))[0]
            off = np.full(ndim, 0.5)
            off[dim] = 0.0
            best_r = r0 + (face + off) * dr
    return best, best_r


def tree_min_fc(fc, tree: Tree, dim: int, iv: int) -> float:
    """Minimum of a face-centered variable along one dimension
    (af_tree_min_fc)."""
    nc, ndim = tree.nc, tree.ndim
    faxes = [np.arange(0, nc + 1) if k == dim else np.arange(0, nc)
             for k in range(ndim)]
    fidx = sp.fc_flat(ndim, nc, *faxes)
    best = np.inf
    for lvl in range(1, tree.highest_lvl + 1):
        leaves = np.asarray(tree.lvl_leaves[lvl - 1])
        if len(leaves) == 0:
            continue
        vals = np.asarray(fc[iv, dim, leaves[:, None], fidx[None, :]])
        best = min(best, float(np.min(vals)))
    return best


def n_leaf_cells(tree: Tree) -> int:
    return sum(len(l) for l in tree.lvl_leaves) * tree.nc ** tree.ndim
