"""Prolongation and restriction between parent/child boxes, vectorized.

Re-designs the reference's ``afivo/src/m_af_prolong.f90`` and
``m_af_restrict.f90``: instead of per-box recursion, (parent, child) pairs
are grouped by the child's parity (its position inside the parent), so each
group is one batched gather + arithmetic + scatter with static spatial index
tables.

Methods (selected per variable, as in af_set_cc_methods):

* ``zeroth``      — af_prolong_zeroth (copy of the containing coarse cell)
* ``sparse``      — af_prolong_sparse (2/3/4-point, ``m_af_prolong.f90``)
* ``linear``      — af_prolong_linear (bi/tri-linear 4/8-point, ``:531-679``)
* ``limit``       — af_prolong_limit (limited slopes, ``:311-420``)
* ``linear_cons`` — af_prolong_linear_cons (conservative unlimited slopes,
  ``:424-529``; includes the cylindrical volume correction)

Restriction is 2^ndim-cell averaging, optionally cylindrical-volume-weighted
(af_restrict_box, ``m_af_restrict.f90:62-136``).
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from . import spatial as sp
from .tree import Tree
from ..ops.limiters import limiter_apply, LIMITER_MC, LIMITER_GMINMOD43


def default_prolong_limiter(ndim: int) -> int:
    """Default limiter for prolongation (af_set_cc_methods,
    ``m_af_core.f90:399-408``): MC for ndim < 3, gminmod43 in 3D."""
    return LIMITER_MC if ndim < 3 else LIMITER_GMINMOD43


class _ParityTables:
    """Static index tables for one child parity."""

    def __init__(self, ndim: int, nc: int, parity: Tuple[int, ...]):
        self.parity = tuple(parity)
        hnc = nc // 2
        i = np.arange(1, nc + 1)  # fine interior (1-based)
        c1_1d = [parity[d] * hnc + (i + 1) // 2 for d in range(ndim)]
        sign_1d = np.where(i % 2 == 1, -1, 1)
        mesh = np.meshgrid(*([i] * ndim), indexing="ij")
        fine_nd = np.stack([m.ravel() for m in mesh], axis=-1)  # [C, ndim]
        C = fine_nd.shape[0]
        c1_nd = np.stack(
            [parity[d] * hnc + (fine_nd[:, d] + 1) // 2 for d in range(ndim)],
            axis=-1)
        sign_nd = np.stack([np.where(fine_nd[:, d] % 2 == 1, -1, 1)
                            for d in range(ndim)], axis=-1)
        self.fine_sidx = sp.cc_flat_nd(ndim, nc, fine_nd)
        self.near = sp.cc_flat_nd(ndim, nc, c1_nd)
        self.sign = sign_nd.astype(np.float64)  # [C, ndim]
        self.lo = []
        self.hi = []
        self.far = []
        for d in range(ndim):
            v = c1_nd.copy(); v[:, d] -= 1
            self.lo.append(sp.cc_flat_nd(ndim, nc, v))
            v = c1_nd.copy(); v[:, d] += 1
            self.hi.append(sp.cc_flat_nd(ndim, nc, v))
            v = c1_nd.copy(); v[:, d] += sign_nd[:, d]
            self.far.append(sp.cc_flat_nd(ndim, nc, v))
        # all corner combinations for linear (248) prolongation
        self.corners = []  # list of (weight, sidx) over subsets of dims
        for subset in itertools.product([0, 1], repeat=ndim):
            v = c1_nd.copy()
            w = 1.0
            for d in range(ndim):
                if subset[d]:
                    v[:, d] += sign_nd[:, d]
                    w *= 0.25
                else:
                    w *= 0.75
            self.corners.append((w, sp.cc_flat_nd(ndim, nc, v)))
        # restriction: parent target cells and child sources
        ic = np.arange(1, hnc + 1)
        meshc = np.meshgrid(*([ic] * ndim), indexing="ij")
        coarse_nd = np.stack([m.ravel() for m in meshc], axis=-1)  # [Cc, ndim]
        tgt = coarse_nd + np.asarray(parity) * hnc
        self.restrict_tgt = sp.cc_flat_nd(ndim, nc, tgt)
        self.restrict_src = []
        for bits in itertools.product([0, 1], repeat=ndim):
            src = 2 * coarse_nd - 1 + np.asarray(bits)
            self.restrict_src.append(sp.cc_flat_nd(ndim, nc, src))
        self.coarse_nd = coarse_nd  # local 1..hnc (before parity shift)
        self.c1_nd = c1_nd


_tables_cache: Dict = {}


def parity_tables(ndim: int, nc: int, parity) -> _ParityTables:
    key = (ndim, nc, tuple(parity))
    if key not in _tables_cache:
        _tables_cache[key] = _ParityTables(ndim, nc, tuple(parity))
    return _tables_cache[key]


class ProlongRestrictPlan:
    """Pairs (parent, child) grouped by parity, for an arbitrary set of
    children (a full level, or the newly added boxes of an epoch)."""

    def __init__(self, tree: Tree, child_ids, pad: bool = False,
                 trash: int = 0, lvl: int = 0):
        """``lvl`` (optional, padded mode): the children's level — lets an
        EMPTY child set still emit all 2^ndim parity groups with padded
        all-trash tables, so a phantom-level plan is structurally
        identical to the real plan that level will eventually get
        (core/treepack.py phantom_levels)."""
        ndim, nc = tree.ndim, tree.nc
        self.ndim, self.nc = ndim, nc
        self.coord = tree.coord
        self.groups = []  # (tables, parent_ids, child_ids, cyl_w, cyl_corr)
        child_ids = np.asarray(child_ids, dtype=np.int64)
        parities = tree.ix[child_ids] % 2
        for parity in itertools.product([0, 1], repeat=ndim):
            mask = np.all(parities == np.asarray(parity), axis=1)
            ch = child_ids[mask]
            if len(ch) == 0 and not (pad and lvl):
                continue
            par = tree.parent[ch]
            tb = parity_tables(ndim, nc, parity)
            cyl_w = None
            self_cyl_corr = None
            if tree.coord == "cyl":
                # cylindrical child weights for restriction
                # (af_cyl_child_weights, m_af_types.f90:1186-1197): per parent
                # target cell, w_inner/w_outer = 1 -/+ dr/(4 r_c)
                hnc = nc // 2
                r0 = tree.box_r_min(par)[:, 0]  # parent r_min
                drp = (tree.dr_base[0] /
                       2.0 ** (tree.lvl[par].astype(np.float64) - 1))
                i_c = (tb.coarse_nd[:, 0] + parity[0] * hnc)  # 1-based
                r_c = r0[:, None] + (i_c[None, :] - 0.5) * drp[:, None]
                tmp = 0.25 * drp[:, None] / r_c
                cyl_w = np.stack([1.0 - tmp, 1.0 + tmp], axis=-1)  # [n,Cc,2]
                # conservative-prolongation correction: -0.25 dr_p / r at
                # each fine cell's containing coarse cell
                # (af_prolong_linear_cons, m_af_prolong.f90:472-476)
                r_near = (r0[:, None]
                          + (tb.c1_nd[None, :, 0] - 0.5) * drp[:, None])
                self_cyl_corr = -0.25 * drp[:, None] / r_near  # [n, C]
            par = par.astype(np.int32)
            ch = ch.astype(np.int32)
            if pad:
                from . import treepack as tp
                lvl_ch = int(tree.lvl[ch[0]]) if len(ch) else lvl
                nb = tp.bucket_hwm(tree, ("pr", lvl_ch, parity), len(ch))
                par = tp.pad_ids(par, nb, trash)
                ch = tp.pad_ids(ch, nb, trash)
                if cyl_w is not None:
                    # empty (phantom) groups pad to all-zero weights
                    cyl_w = tp.pad_rows(cyl_w, nb)
                    self_cyl_corr = tp.pad_rows(self_cyl_corr, nb)
            self.groups.append((tb, par, ch, cyl_w, self_cyl_corr))


def get_full_plan(tree: Tree, lvl: int) -> ProlongRestrictPlan:
    """Plan for all children at level lvl (parents at lvl-1)."""
    cache = getattr(tree, "_pr_plan_cache", None)
    if cache is None or cache.get("epoch") != tree.epoch:
        cache = {"epoch": tree.epoch}
        tree._pr_plan_cache = cache
    if lvl not in cache:
        cache[lvl] = ProlongRestrictPlan(tree, tree.lvl_ids[lvl - 1])
    return cache[lvl]


def _xp(a):
    return np if isinstance(a, np.ndarray) else jnp


def _gat(cc, ivs, ids, sidx):
    ivs = np.asarray(ivs); ids = sp.aix(ids); sidx = sp.aix(sidx)
    return cc[ivs[:, None, None], ids[None, :, None], sidx[None, None, :]]


def _scat_pr(cc, ivs, ids, sidx, vals, add=False):
    idx = (np.asarray(ivs)[:, None, None], sp.aix(ids)[None, :, None],
           sp.aix(sidx)[None, None, :])
    if isinstance(cc, np.ndarray):
        if add:
            cc[idx] += vals
        else:
            cc[idx] = vals
        return cc
    import jax.numpy as jnp
    vals = jnp.asarray(vals)
    if vals.dtype != cc.dtype:
        # strong-f64 constants must not widen an f32 scatter
        vals = vals.astype(cc.dtype)
    return cc.at[idx].add(vals) if add else cc.at[idx].set(vals)


def _cst(a, like):
    """Cast a NumPy constant array to the dtype of the operand so f64
    constants do not promote a traced f32 computation to emulated f64."""
    if isinstance(a, (np.ndarray, np.generic)) \
            and not isinstance(like, np.ndarray):
        return np.asarray(a).astype(like.dtype)
    return a


def prolong(cc, plan: ProlongRestrictPlan, ivs, method: str,
            limiter: Optional[int] = None, add: bool = False,
            ivs_to=None):
    """Prolong parent data (variables ivs) into child interiors (variables
    ivs_to, default ivs). With add=True the prolonged values are added
    (used by the multigrid correction, af_stencil_prolong_box)."""
    ndim = plan.ndim
    ivs = np.asarray(ivs, np.int32)
    ivs_to = ivs if ivs_to is None else np.asarray(ivs_to, np.int32)
    if limiter is None:
        limiter = default_prolong_limiter(ndim)
    for tb, par, ch, cyl_w, cyl_corr in plan.groups:
        if method == "zeroth":
            fine = _gat(cc, ivs, par, tb.near)
        elif method == "sparse":
            near = _gat(cc, ivs, par, tb.near)
            if ndim == 1:
                w0, wd = 0.75, [0.25]
            elif ndim == 2:
                w0, wd = 0.5, [0.25, 0.25]
            else:
                w0, wd = 0.25, [0.25, 0.25, 0.25]
            fine = w0 * near
            for d in range(ndim):
                fine = fine + wd[d] * _gat(cc, ivs, par, tb.far[d])
        elif method == "linear":
            fine = 0.0
            for w, sidx in tb.corners:
                fine = fine + float(w) * _gat(cc, ivs, par, sidx)
        elif method in ("limit", "linear_cons"):
            f0 = _gat(cc, ivs, par, tb.near)
            fine = f0
            sgn = tb.sign  # [C, ndim]
            for d in range(ndim):
                lo = _gat(cc, ivs, par, tb.lo[d])
                hi = _gat(cc, ivs, par, tb.hi[d])
                if method == "limit":
                    fd = 0.25 * limiter_apply(f0 - lo, hi - f0, limiter)
                else:
                    fd = 0.125 * (hi - lo)
                if method == "linear_cons" and plan.coord == "cyl" and d == 0:
                    # conservative cylindrical correction: the constant
                    # term shifts by -0.25 dr_p f_r / r_c so the prolonged
                    # field conserves the radial volume integral
                    # (af_prolong_linear_cons, m_af_prolong.f90:472-476)
                    fine = fine + _cst(cyl_corr, fd)[None] * fd
                fine = fine + _cst(sgn, fd)[None, None, :, d] * fd
        else:
            raise ValueError(f"unknown prolongation method {method}")
        cc = _scat_pr(cc, ivs_to, ch, tb.fine_sidx, fine, add=add)
    return cc


def restrict(cc, plan: ProlongRestrictPlan, ivs, use_geometry: bool = True):
    """Restrict child interiors into parents (af_restrict_box)."""
    ndim = plan.ndim
    ivs = np.asarray(ivs, np.int32)
    for tb, par, ch, cyl_w, _ in plan.groups:
        srcs = [_gat(cc, ivs, ch, s) for s in tb.restrict_src]
        if plan.coord == "cyl" and use_geometry and cyl_w is not None:
            # children source order: bits over dims; dim 0 (r) bit selects
            # inner (0) vs outer (1) fine column
            w = _cst(cyl_w, srcs[0])  # [n, Cc, 2]
            acc = 0.0
            for bits, s in zip(itertools.product([0, 1], repeat=ndim),
                               srcs):
                acc = acc + w[None, :, :, bits[0]] * s
            vals = acc / (2 ** ndim)
        else:
            vals = sum(srcs) / (2 ** ndim)
        cc = _scat_pr(cc, ivs, par, tb.restrict_tgt, vals)
    return cc


def restrict_tree(cc, tree: Tree, ivs, use_geometry: bool = True,
                  pack=None):
    """Restrict all levels downward (af_restrict_tree). With ``pack``
    the per-level plans come from the epoch pack (compiled path)."""
    n_levels = pack.n_levels if pack is not None else tree.highest_lvl
    for lvl in range(n_levels, 1, -1):
        plan = pack.pr[lvl - 1] if pack is not None else \
            get_full_plan(tree, lvl)
        cc = restrict(cc, plan, ivs, use_geometry)
    return cc
