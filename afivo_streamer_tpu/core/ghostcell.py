"""Ghost-cell filling as vectorized gather/compute/scatter over the box batch.

Re-designs the reference's ``afivo/src/m_af_ghostcell.f90``: instead of
per-box subroutine calls, each (level, direction, case) group of box faces is
handled by one batched gather + arithmetic + scatter, with the index tables
("plans") precomputed on the host at refinement epochs.

Cases per face (af_gc_box, ``m_af_ghostcell.f90:66-123``):

* same-level neighbor: copy the neighbor's interior layer;
* refinement boundary: interpolate between the coarse neighbor of the parent
  and the fine interior (af_gc_interp ``:394-498``, af_gc_interp_lim
  ``:503-612``, mg_sides_rb ``m_af_multigrid.f90:294-461``, or
  af_gc_prolong_copy ``:379-390``);
* physical boundary: bc_to_gc with Dirichlet / Neumann / continuous /
  Dirichlet-copy coefficients (``:173-279``).

Corner (and 3D edge) ghost cells are filled in a second phase
(af_gc_box_corner ``:125-170``), copying from diagonal neighbors or
extrapolating linearly.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from . import spatial as sp
from .tree import Tree, NO_BOX, PHYS_BOUNDARY, neighb_dim, neighb_low

# Boundary condition types (m_af_types.f90)
BC_DIRICHLET = 1
BC_NEUMANN = 2
BC_CONTINUOUS = 3
BC_DIRICHLET_COPY = 4

# Refinement-boundary methods
RB_INTERP = "interp"          # af_gc_interp
RB_INTERP_LIM = "interp_lim"  # af_gc_interp_lim
RB_MG = "mg_sides_rb"         # mg_sides_rb (preserves diffusive fluxes)
RB_PROLONG_COPY = "prolong_copy"  # af_gc_prolong_copy


class _DirPlan:
    """Index tables for one (level, direction) pair."""

    def __init__(self):
        self.copy_ids = np.zeros(0, np.int32)
        self.copy_nb = np.zeros(0, np.int32)
        self.bc_ids = np.zeros(0, np.int32)
        self.bc_coords = None  # [n_bc, F, ndim]
        self.rb_ids = np.zeros(0, np.int32)
        self.rb_coarse = np.zeros(0, np.int32)
        self.rb_parent = np.zeros(0, np.int32)
        # gather tables for rb methods
        self.rb_c1 = None  # [n_rb, F] coarse-neighbor cell per ghost cell
        self.rb_c2 = None  # [n_rb, F]
        self.rb_c3 = None  # [n_rb, F] (3D only)
        self.rb_tmp = None  # [n_rb, T] coarse strip for mg_sides_rb
        self.rb_pcopy = None  # [n_rb, F] parent cells for prolong_copy


class GcLevelPlan:
    """All index tables to fill one ghost layer on one level.

    With ``pad=True`` every case table is padded to a power-of-two bucket
    (core/treepack.py): padded entries gather from and scatter to the
    reserved trash box, so plans of different epochs with equal bucket
    shapes can reuse one compiled fill."""

    def __init__(self, tree: Tree, lvl: int, pad: bool = False,
                 trash: int = 0):
        ndim, nc = tree.ndim, tree.nc
        self.ndim, self.nc, self.lvl = ndim, nc, lvl
        self.dr = tree.lvl_dr(lvl)
        ids = tree.lvl_ids[lvl - 1]
        self.dirs: List[_DirPlan] = []
        hnc = nc // 2
        if pad:
            from . import treepack as tp

        for d in range(2 * ndim):
            dim, low = neighb_dim(d), neighb_low(d)
            p = _DirPlan()
            g_idx = 0 if low else nc + 1          # ghost layer index
            f1_idx = 1 if low else nc             # first interior
            f2_idx = 2 if low else nc - 1         # second interior
            nbi_idx = nc if low else 1            # neighbor interior layer
            cge_idx = nc if low else 1            # coarse nb layer (ix_c)

            # Static per-direction spatial index tables
            gs = sp.cc_flat(ndim, nc, *sp.face_transverse_axes(ndim, nc, dim, g_idx))
            f1 = sp.cc_flat(ndim, nc, *sp.face_transverse_axes(ndim, nc, dim, f1_idx))
            f2 = sp.cc_flat(ndim, nc, *sp.face_transverse_axes(ndim, nc, dim, f2_idx))
            nbs = sp.cc_flat(ndim, nc, *sp.face_transverse_axes(ndim, nc, dim, nbi_idx))
            p.ghost_sidx, p.f1_sidx, p.f2_sidx, p.nbint_sidx = gs, f1, f2, nbs

            copy_ids, copy_nb, bc_ids, rb_ids = [], [], [], []
            for bid in ids:
                nb = int(tree.neighbors[bid, d])
                if nb >= 0:
                    copy_ids.append(bid)
                    copy_nb.append(nb)
                elif nb == NO_BOX:
                    rb_ids.append(int(bid))
                else:
                    bc_ids.append(int(bid))
            p.copy_ids = np.asarray(copy_ids, np.int32)
            p.copy_nb = np.asarray(copy_nb, np.int32)
            p.bc_ids = np.asarray(bc_ids, np.int32)
            p.rb_ids = np.asarray(rb_ids, np.int32)

            # face coordinates for BC evaluation (af_get_face_coords)
            if len(bc_ids):
                coords = []
                for bid in bc_ids:
                    r0 = tree.box_r_min(np.asarray([bid]))[0]
                    dr = tree.lvl_dr(lvl)
                    axes = []
                    for k in range(ndim):
                        if k == dim:
                            face_x = r0[k] if low else r0[k] + nc * dr[k]
                            axes.append(np.array([face_x]))
                        else:
                            axes.append(r0[k] + (np.arange(nc) + 0.5) * dr[k])
                    mesh = np.meshgrid(*axes, indexing="ij")
                    coords.append(np.stack([m.ravel() for m in mesh], axis=-1))
                p.bc_coords = np.asarray(coords)  # [n_bc, F, ndim]

            # refinement-boundary gather tables
            if len(rb_ids):
                n_rb = len(rb_ids)
                F = nc ** (ndim - 1)
                p.rb_parent = tree.parent[p.rb_ids].astype(np.int32)
                p.rb_coarse = tree.neighbors[p.rb_parent, d].astype(np.int32)
                c1 = np.zeros((n_rb, F), np.int32)
                c2 = np.zeros((n_rb, F), np.int32)
                c3 = np.zeros((n_rb, F), np.int32) if ndim == 3 else None
                pcopy = np.zeros((n_rb, F), np.int32)
                tdims = [k for k in range(ndim) if k != dim]
                if ndim == 1:
                    T = 1
                elif ndim == 2:
                    T = hnc + 2
                else:
                    T = (hnc + 2) ** 2
                tmp = np.zeros((n_rb, T), np.int32)

                for n_i, bid in enumerate(p.rb_ids):
                    off = tree.child_offset(int(bid))  # [ndim], 0 or nc/2
                    # per-ghost-cell coarse indices (1-based like reference)
                    # transverse fine index arrays j=1..nc
                    if ndim == 1:
                        c1[n_i, 0] = sp.cc_flat(1, nc, cge_idx)[0]
                        c2[n_i, 0] = c1[n_i, 0]
                        tmp[n_i, 0] = c1[n_i, 0]
                        # prolong_copy: parent cell containing my ghost cell
                        my_g = g_idx  # 0 or nc+1
                        pc = off[dim] + (my_g + 1) // 2
                        pcopy[n_i, 0] = sp.cc_flat(1, nc, pc)[0]
                    elif ndim == 2:
                        td = tdims[0]
                        j = np.arange(1, nc + 1)
                        j_c1 = off[td] + (j + 1) // 2
                        j_c2 = j_c1 + 1 - 2 * (j & 1)
                        if dim == 0:
                            c1[n_i] = sp.cc_flat_nd(2, nc, np.stack(
                                [np.full(nc, cge_idx), j_c1], -1))
                            c2[n_i] = sp.cc_flat_nd(2, nc, np.stack(
                                [np.full(nc, cge_idx), j_c2], -1))
                        else:
                            c1[n_i] = sp.cc_flat_nd(2, nc, np.stack(
                                [j_c1, np.full(nc, cge_idx)], -1))
                            c2[n_i] = sp.cc_flat_nd(2, nc, np.stack(
                                [j_c2, np.full(nc, cge_idx)], -1))
                        # mg tmp strip: coarse cells off+0 .. off+hnc+1
                        # (incl. the coarse box's own side ghosts)
                        jt = off[td] + np.arange(0, hnc + 2)
                        if dim == 0:
                            tmp[n_i] = sp.cc_flat_nd(2, nc, np.stack(
                                [np.full(hnc + 2, cge_idx), jt], -1))
                        else:
                            tmp[n_i] = sp.cc_flat_nd(2, nc, np.stack(
                                [jt, np.full(hnc + 2, cge_idx)], -1))
                        # prolong_copy from parent box
                        my_g = np.full(nc, g_idx)
                        pc_d = off[dim] + (my_g + 1) // 2
                        pc_t = off[td] + (j + 1) // 2
                        if dim == 0:
                            pcopy[n_i] = sp.cc_flat_nd(2, nc, np.stack(
                                [pc_d, pc_t], -1))
                        else:
                            pcopy[n_i] = sp.cc_flat_nd(2, nc, np.stack(
                                [pc_t, pc_d], -1))
                    else:  # ndim == 3
                        td1, td2 = tdims
                        j = np.arange(1, nc + 1)
                        jj, kk = np.meshgrid(j, j, indexing="ij")
                        jj, kk = jj.ravel(), kk.ravel()
                        j_c1 = off[td1] + (jj + 1) // 2
                        j_c2 = j_c1 + 1 - 2 * (jj & 1)
                        k_c1 = off[td2] + (kk + 1) // 2
                        k_c2 = k_c1 + 1 - 2 * (kk & 1)
                        base = np.full(nc * nc, cge_idx)

                        def put3(a, b, cdim):
                            v = np.zeros((nc * nc, 3), np.int64)
                            v[:, dim] = cdim
                            v[:, td1] = a
                            v[:, td2] = b
                            return sp.cc_flat_nd(3, nc, v)

                        c1[n_i] = put3(j_c1, k_c1, base)
                        c2[n_i] = put3(j_c2, k_c1, base)
                        c3[n_i] = put3(j_c1, k_c2, base)
                        jt = off[td1] + np.arange(0, hnc + 2)
                        kt = off[td2] + np.arange(0, hnc + 2)
                        jm, km = np.meshgrid(jt, kt, indexing="ij")
                        v = np.zeros(((hnc + 2) ** 2, 3), np.int64)
                        v[:, dim] = cge_idx
                        v[:, td1] = jm.ravel()
                        v[:, td2] = km.ravel()
                        tmp[n_i] = sp.cc_flat_nd(3, nc, v)
                        pc_d = off[dim] + (g_idx + 1) // 2
                        v = np.zeros((nc * nc, 3), np.int64)
                        v[:, dim] = pc_d
                        v[:, td1] = off[td1] + (jj + 1) // 2
                        v[:, td2] = off[td2] + (kk + 1) // 2
                        pcopy[n_i] = sp.cc_flat_nd(3, nc, v)
                p.rb_c1, p.rb_c2, p.rb_c3 = c1, c2, c3
                p.rb_tmp, p.rb_pcopy = tmp, pcopy
            if pad:
                nb = tp.bucket_hwm(tree, ("gc", lvl, d, "c"),
                                   len(p.copy_ids))
                p.copy_ids = tp.pad_ids(p.copy_ids, nb, trash)
                p.copy_nb = tp.pad_ids(p.copy_nb, nb, trash)
                nb = tp.bucket_hwm(tree, ("gc", lvl, d, "b"),
                                   len(p.bc_ids))
                p.bc_ids = tp.pad_ids(p.bc_ids, nb, trash)
                if p.bc_coords is not None:
                    p.bc_coords = tp.pad_rows(p.bc_coords, nb)
                elif nb > 0:
                    # the case is empty this epoch but its bucket high-water
                    # mark is not: all-dummy tables keep the shapes stable
                    p.bc_coords = np.full((nb, nc ** (ndim - 1), ndim),
                                          tree.r_base[0] if False else 0.0)
                nb = tp.bucket_hwm(tree, ("gc", lvl, d, "r"),
                                   len(p.rb_ids))
                p.rb_ids = tp.pad_ids(p.rb_ids, nb, trash)
                if nb > 0 and p.rb_c1 is None:
                    F = nc ** (ndim - 1)
                    T = 1 if ndim == 1 else ((hnc + 2) if ndim == 2
                                             else (hnc + 2) ** 2)
                    p.rb_coarse = np.full(nb, trash, np.int32)
                    p.rb_parent = np.full(nb, trash, np.int32)
                    p.rb_c1 = np.zeros((nb, F), np.int32)
                    p.rb_c2 = np.zeros((nb, F), np.int32)
                    p.rb_c3 = (np.zeros((nb, F), np.int32) if ndim == 3
                               else None)
                    p.rb_tmp = np.zeros((nb, T), np.int32)
                    p.rb_pcopy = np.zeros((nb, F), np.int32)
                elif nb > 0:
                    p.rb_coarse = tp.pad_ids(p.rb_coarse, nb, trash)
                    p.rb_parent = tp.pad_ids(p.rb_parent, nb, trash)
                    p.rb_c1 = tp.pad_rows(p.rb_c1, nb)
                    p.rb_c2 = tp.pad_rows(p.rb_c2, nb)
                    if p.rb_c3 is not None:
                        p.rb_c3 = tp.pad_rows(p.rb_c3, nb)
                    p.rb_tmp = tp.pad_rows(p.rb_tmp, nb)
                    p.rb_pcopy = tp.pad_rows(p.rb_pcopy, nb)
            self.dirs.append(p)

        # ------------------------------------------------ corner/edge plans
        # 2D corners and 3D corners; 3D edges are handled before corners.
        self.corner_plans = []
        self.edge_plans = []
        if ndim >= 2:
            for pos, di in sp.corner_list(ndim, nc):
                copy_ids, copy_nb = [], []
                ext_ids = []
                for bid in ids:
                    nb = tree.neighbor_mat(int(bid), np.sign(di) * -1)
                    # di is inward; the diagonal neighbor offset is -di
                    if nb >= 0:
                        copy_ids.append(int(bid))
                        copy_nb.append(int(nb))
                    else:
                        ext_ids.append(int(bid))
                # neighbor cell: ghost position maps to neighbor interior:
                # e.g. pos 0 -> neighbor nc, pos nc+1 -> neighbor 1
                nb_pos = np.where(pos == 0, nc, np.where(pos == nc + 1, 1, pos))
                plan = {
                    "pos_sidx": sp.cc_flat_nd(ndim, nc, pos),
                    "nb_sidx": sp.cc_flat_nd(ndim, nc, nb_pos),
                    "copy_ids": np.asarray(copy_ids, np.int32),
                    "copy_nb": np.asarray(copy_nb, np.int32),
                    "ext_ids": np.asarray(ext_ids, np.int32),
                }
                if pad:
                    ck = ("gcc", lvl, len(self.corner_plans))
                    nb2 = tp.bucket_hwm(tree, ck + ("c",),
                                        len(plan["copy_ids"]))
                    plan["copy_ids"] = tp.pad_ids(plan["copy_ids"], nb2, trash)
                    plan["copy_nb"] = tp.pad_ids(plan["copy_nb"], nb2, trash)
                    plan["ext_ids"] = tp.pad_ids(
                        plan["ext_ids"],
                        tp.bucket_hwm(tree, ck + ("e",),
                                      len(plan["ext_ids"])), trash)
                # extrapolation neighbors (af_corner_gc_extrap)
                if ndim == 2:
                    a = pos.copy(); a[0] += di[0]
                    b = pos.copy(); b[1] += di[1]
                    c = pos + di
                    plan["ext_a"] = sp.cc_flat_nd(2, nc, a)
                    plan["ext_b"] = sp.cc_flat_nd(2, nc, b)
                    plan["ext_c"] = sp.cc_flat_nd(2, nc, c)
                else:
                    # 3D: corner = a + b + c - 2*d with a,b,c the three
                    # edge-adjacent cells and d the diagonal one
                    pa = pos.copy(); pa[1] += di[1]; pa[2] += di[2]
                    pb = pos.copy(); pb[0] += di[0]; pb[2] += di[2]
                    pc_ = pos.copy(); pc_[0] += di[0]; pc_[1] += di[1]
                    pd = pos + di
                    plan["ext_a"] = sp.cc_flat_nd(3, nc, pa)
                    plan["ext_b"] = sp.cc_flat_nd(3, nc, pb)
                    plan["ext_c"] = sp.cc_flat_nd(3, nc, pc_)
                    plan["ext_d"] = sp.cc_flat_nd(3, nc, pd)
                self.corner_plans.append(plan)
        if ndim == 3:
            # 12 edges: pairs of dims with fixed 0/nc+1 position, the third
            # dim running 1..nc (af_gc_box_corner 3D / af_edge_gc_extrap)
            import itertools as it
            for dim_edge in range(3):
                odims = [k for k in range(3) if k != dim_edge]
                for bits in it.product([0, 1], repeat=2):
                    pos2 = [nc + 1 if b else 0 for b in bits]
                    di2 = [-1 if b else 1 for b in bits]
                    off = np.zeros(3, np.int64)
                    off[odims[0]] = 1 if bits[0] else -1
                    off[odims[1]] = 1 if bits[1] else -1
                    copy_ids, copy_nb, ext_ids = [], [], []
                    for bid in ids:
                        nb = tree.neighbor_mat(int(bid), off)
                        if nb >= 0:
                            copy_ids.append(int(bid))
                            copy_nb.append(int(nb))
                        else:
                            ext_ids.append(int(bid))
                    run = np.arange(1, nc + 1)

                    def line_idx(vals0, vals1, runvals):
                        v = np.zeros((nc, 3), np.int64)
                        v[:, odims[0]] = vals0
                        v[:, odims[1]] = vals1
                        v[:, dim_edge] = runvals
                        return sp.cc_flat_nd(3, nc, v)

                    g0, g1 = pos2
                    n0 = nc if g0 == 0 else 1
                    n1 = nc if g1 == 0 else 1
                    plan = {
                        "pos_sidx": line_idx(g0, g1, run),
                        "nb_sidx": line_idx(n0, n1, run),
                        "copy_ids": np.asarray(copy_ids, np.int32),
                        "copy_nb": np.asarray(copy_nb, np.int32),
                        "ext_ids": np.asarray(ext_ids, np.int32),
                        "ext_a": line_idx(g0 + di2[0], g1, run),
                        "ext_b": line_idx(g0, g1 + di2[1], run),
                        "ext_c": line_idx(g0 + di2[0], g1 + di2[1], run),
                    }
                    if pad:
                        ek = ("gce", lvl, len(self.edge_plans))
                        nb2 = tp.bucket_hwm(tree, ek + ("c",),
                                            len(plan["copy_ids"]))
                        plan["copy_ids"] = tp.pad_ids(plan["copy_ids"], nb2,
                                                      trash)
                        plan["copy_nb"] = tp.pad_ids(plan["copy_nb"], nb2,
                                                     trash)
                        plan["ext_ids"] = tp.pad_ids(
                            plan["ext_ids"],
                            tp.bucket_hwm(tree, ek + ("e",),
                                          len(plan["ext_ids"])), trash)
                    self.edge_plans.append(plan)


def get_gc_plan(tree: Tree, lvl: int) -> GcLevelPlan:
    cache = getattr(tree, "_gc_plan_cache", None)
    if cache is None or cache.get("epoch") != tree.epoch:
        cache = {"epoch": tree.epoch}
        tree._gc_plan_cache = cache
    if lvl not in cache:
        cache[lvl] = GcLevelPlan(tree, lvl)
    return cache[lvl]


def _xp(arr):
    """Backend dispatch: NumPy in host/eager mode, jnp under jit/tracing."""
    return np if isinstance(arr, np.ndarray) else jnp


def _gat(cc, ivs, ids, sidx):
    """Gather cc values: returns [n_iv, n, F]. Works for numpy and jnp
    (and for traced plan leaves via sp.aix)."""
    ivs = np.asarray(ivs)
    ids = sp.aix(ids)
    sidx = sp.aix(sidx)
    if sidx.ndim == 0:
        sidx = sidx.reshape(1)
    if sidx.ndim == 1:
        return cc[ivs[:, None, None], ids[None, :, None], sidx[None, None, :]]
    return cc[ivs[:, None, None], ids[None, :, None], sidx[None, :, :]]


def _scat(cc, ivs, ids, sidx, vals):
    ivs = np.asarray(ivs)
    ids = sp.aix(ids)
    sidx = sp.aix(sidx)
    if sidx.ndim == 0:
        sidx = sidx.reshape(1)
    if sidx.ndim == 1:
        idx = (ivs[:, None, None], ids[None, :, None], sidx[None, None, :])
    else:
        idx = (ivs[:, None, None], ids[None, :, None], sidx[None, :, :])
    if isinstance(cc, np.ndarray):
        cc[idx] = vals
        return cc
    # cast: strong-f64 constants (e.g. np domain lengths entering a BC
    # expression) must not widen an f32 scatter (JAX FutureWarning ->
    # future error)
    vals = _xp(cc).asarray(vals)
    if vals.dtype != cc.dtype:
        vals = vals.astype(cc.dtype)
    return cc.at[idx].set(vals)


def cast_bc(val, like):
    """Cast NumPy BC values/coords-derived constants to the traced operand
    dtype (a np.float64 value would promote a traced f32 fill to f64)."""
    if isinstance(val, (np.ndarray, np.generic)) \
            and not isinstance(like, np.ndarray):
        return np.asarray(val).astype(like.dtype)
    return val


def bc_to_ghost(bc_type: int, bc_val, inner1, inner2, dr_dim: float,
                high: bool):
    """bc_to_gc coefficients (``m_af_ghostcell.f90:176-213``)."""
    if bc_type == BC_DIRICHLET:
        return 2.0 * bc_val - inner1
    if bc_type == BC_NEUMANN:
        sign = 1.0 if high else -1.0
        return inner1 + sign * dr_dim * bc_val
    if bc_type == BC_CONTINUOUS:
        return 2.0 * inner1 - inner2
    if bc_type == BC_DIRICHLET_COPY:
        return bc_val + 0.0 * inner1
    raise ValueError("unknown bc type")


def fill_ghosts_lvl(cc, plan: GcLevelPlan, ivs, rb_method: str, bc_fn,
                    params=None, corners: bool = True,
                    rb_extrap_mask=None):
    """Fill one ghost layer for variables ivs on one level.

    bc_fn(iv, d, coords, params) -> (bc_type, values); values broadcastable
    to [n_bc, F].
    """
    ndim, nc = plan.ndim, plan.nc
    ivs = np.asarray(ivs, dtype=np.int32)
    params = params or {}

    import os
    if not isinstance(cc, np.ndarray) and \
            os.environ.get("AFIVO_FUSED_GC", "0") == "1":
        # traced path: fused single-gather/single-scatter fill, cached on
        # the plan (one per epoch) keyed by the probed bc types.
        # NOTE measured on TPU (axon, f64-emulated): the fused fill is
        # ~8% slower per step and slower to compile than the group-wise
        # fill, whose static dense slab index patterns lower to efficient
        # slice-gathers; kept as an opt-in knob for other backends.
        types = []
        for d, p in enumerate(plan.dirs):
            if len(p.bc_ids):
                types.append((d, tuple(
                    bc_fn(int(iv), d, p.bc_coords, params)[0]
                    for iv in ivs)))
        emkey = None
        if rb_extrap_mask is not None:
            emkey = tuple(sorted((d, m.tobytes())
                                 for d, m in rb_extrap_mask.items()))
        key = (tuple(int(v) for v in ivs), rb_method, tuple(types),
               corners, emkey)
        cache = plan.__dict__.setdefault("_fused", {})
        if key not in cache:
            cache[key] = FusedGcFill(plan, ivs, rb_method, bc_fn, params,
                                     rb_extrap_mask, corners)
        return cache[key](cc, bc_fn, params)

    for d, p in enumerate(plan.dirs):
        dim, low = neighb_dim(d), neighb_low(d)
        # --- same-level copy
        if len(p.copy_ids):
            vals = _gat(cc, ivs, p.copy_nb, p.nbint_sidx)
            cc = _scat(cc, ivs, p.copy_ids, p.ghost_sidx, vals)
        # --- physical boundaries
        if len(p.bc_ids):
            in1 = _gat(cc, ivs, p.bc_ids, p.f1_sidx)
            in2 = _gat(cc, ivs, p.bc_ids, p.f2_sidx)
            out = []
            for i, iv in enumerate(ivs):
                bc_type, bc_val = bc_fn(int(iv), d, p.bc_coords, params)
                out.append(bc_to_ghost(bc_type, cast_bc(bc_val, cc),
                                       in1[i], in2[i],
                                       float(plan.dr[dim]), not low))
            cc = _scat(cc, ivs, p.bc_ids, p.ghost_sidx, _xp(cc).stack(out))
        # --- refinement boundaries
        if len(p.rb_ids):
            fine1 = _gat(cc, ivs, p.rb_ids, p.f1_sidx)
            extrap_mask = None if rb_extrap_mask is None \
                else rb_extrap_mask.get(d)
            if rb_method in (RB_INTERP, RB_INTERP_LIM):
                c1 = _gat(cc, ivs, p.rb_coarse, p.rb_c1)
                if ndim == 1:
                    ghost = (2.0 * c1 + fine1) / 3.0
                elif ndim == 2:
                    c2 = _gat(cc, ivs, p.rb_coarse, p.rb_c2)
                    ghost = 0.5 * c1 + c2 / 6.0 + fine1 / 3.0
                else:
                    c2 = _gat(cc, ivs, p.rb_coarse, p.rb_c2)
                    c3 = _gat(cc, ivs, p.rb_coarse, p.rb_c3)
                    ghost = (c1 + fine1) / 3.0 + (c2 + c3) / 6.0
                if rb_method == RB_INTERP_LIM:
                    ghost = _xp(cc).minimum(ghost, 2.0 * c1)
            elif rb_method == RB_MG:
                fine2 = _gat(cc, ivs, p.rb_ids, p.f2_sidx)
                tmp = _gat(cc, ivs, p.rb_coarse, p.rb_tmp)
                gc = _mg_rb_interp(tmp, ndim, nc)
                ghost = 0.5 * gc + 0.75 * fine1 - 0.25 * fine2
            elif rb_method == RB_PROLONG_COPY:
                ghost = _gat(cc, ivs, p.rb_parent, p.rb_pcopy)
            else:
                raise ValueError(f"unknown rb method {rb_method}")
            if extrap_mask is not None and (
                    not isinstance(extrap_mask, np.ndarray)
                    or extrap_mask.any()):
                # traced masks (pack mode) cannot be inspected with .any();
                # compute both schemes and where-select
                ghost_e = _rb_extrap_ghost(cc, ivs, p, plan)
                xp = _xp(cc)
                ghost = xp.where(extrap_mask[None, :, None], ghost_e, ghost)
            cc = _scat(cc, ivs, p.rb_ids, p.ghost_sidx, ghost)

    if corners and ndim >= 2:
        for plan_e in plan.edge_plans:
            cc = _fill_corner_group(cc, ivs, plan_e, is_edge=True)
        for plan_c in plan.corner_plans:
            cc = _fill_corner_group(cc, ivs, plan_c, is_edge=False)
    return cc


def _rb_extrap_ghost(cc, ivs, p, plan):
    """Extrapolating refinement-boundary ghosts for variable-coefficient
    boxes (mg_sides_rb_extrap, ``m_af_multigrid.f90:468-621``): zeroth
    prolongation from the parent plus a bilinear extrapolation from the fine
    side. Implemented for ndim <= 2 (3D falls back to the same 1D form)."""
    ndim, nc = plan.ndim, plan.nc
    pcopy = _gat(cc, ivs, p.rb_parent, p.rb_pcopy)
    f1 = _gat(cc, ivs, p.rb_ids, p.f1_sidx)
    f2 = _gat(cc, ivs, p.rb_ids, p.f2_sidx)
    if ndim == 1:
        return 0.5 * pcopy + 0.75 * f1 - 0.25 * f2
    if ndim == 2:
        # transverse parity swap: j odd -> j+1, j even -> j-1
        def pswap(a):
            b = a.reshape(a.shape[:-1] + (nc // 2, 2))
            return b[..., ::-1].reshape(a.shape)
        return (0.5 * pcopy + 1.125 * f1
                - 0.375 * (f2 + pswap(f1)) + 0.125 * pswap(f2))
    # 3D: fall back to the 1D extrapolation form
    return 0.5 * pcopy + 0.75 * f1 - 0.25 * f2


def _mg_rb_interp(tmp, ndim: int, nc: int):
    xp = _xp(tmp)
    """Interpolate the coarse strip next to a fine box to positions straight
    next to the fine cells (mg_sides_rb, ``m_af_multigrid.f90:361-388``).

    tmp: [n_iv, n, T]; returns gc [n_iv, n, nc^(ndim-1)].
    """
    if ndim == 1:
        return tmp[:, :, 0:1]
    hnc = nc // 2
    if ndim == 2:
        # tmp has hnc+2 entries (0..hnc+1); fine j = 2i-1, 2i for i=1..hnc
        center = tmp[:, :, 1:hnc + 1]
        grad = 0.125 * (tmp[:, :, 2:hnc + 2] - tmp[:, :, 0:hnc])
        gc = xp.stack([center - grad, center + grad], axis=-1)
        return gc.reshape(tmp.shape[0], tmp.shape[1], nc)
    # 3D: tmp [.., (hnc+2)**2] over (t1, t2)
    t = tmp.reshape(tmp.shape[0], tmp.shape[1], hnc + 2, hnc + 2)
    c = t[:, :, 1:hnc + 1, 1:hnc + 1]
    g1 = 0.125 * (t[:, :, 2:hnc + 2, 1:hnc + 1] - t[:, :, 0:hnc, 1:hnc + 1])
    g2 = 0.125 * (t[:, :, 1:hnc + 1, 2:hnc + 2] - t[:, :, 1:hnc + 1, 0:hnc])
    # fine (2i-1, 2j-1), (2i, 2j-1), (2i-1, 2j), (2i, 2j)
    gc = xp.stack([
        xp.stack([c - g1 - g2, c - g1 + g2], axis=-1),
        xp.stack([c + g1 - g2, c + g1 + g2], axis=-1),
    ], axis=-2)  # [.., hnc, hnc, 2(i), 2(j)]
    gc = gc.transpose(0, 1, 2, 4, 3, 5).reshape(
        tmp.shape[0], tmp.shape[1], nc, nc)
    return gc.reshape(tmp.shape[0], tmp.shape[1], nc * nc)


def _fill_corner_group(cc, ivs, plan, is_edge: bool):
    if len(plan["copy_ids"]):
        vals = _gat(cc, ivs, plan["copy_nb"], plan["nb_sidx"])
        cc = _scat(cc, ivs, plan["copy_ids"], plan["pos_sidx"], vals)
    if len(plan["ext_ids"]):
        a = _gat(cc, ivs, plan["ext_ids"], plan["ext_a"])
        b = _gat(cc, ivs, plan["ext_ids"], plan["ext_b"])
        c = _gat(cc, ivs, plan["ext_ids"], plan["ext_c"])
        if "ext_d" in plan:  # 3D corner
            dd = _gat(cc, ivs, plan["ext_ids"], plan["ext_d"])
            vals = a + b + c - 2.0 * dd
        else:
            vals = a + b - c
        cc = _scat(cc, ivs, plan["ext_ids"], plan["pos_sidx"], vals)
    return cc


# --------------------------------------------------------------------------
# Fused ghost fill (traced path): one gather + one scatter per level
# --------------------------------------------------------------------------
class FusedGcFill:
    """Precomputed linear form of a one-level ghost fill.

    Every side ghost value is a fixed linear combination of at most J
    source cells plus a boundary-condition term:

        ghost[k] = sum_j w[iv, k, j] * cc[iv, src_id[k, j], src_sidx[k, j]]
                   + add[iv, k]            (evaluated per call from bc_fn)

    optionally limited by min(ghost, 2 * source_0) (af_gc_interp_lim).
    Corner/edge ghosts are a second linear stage that reads the side
    ghosts. This collapses the ~40 gather/scatter ops of the group-wise
    fill into 2 gathers + 2 scatters, which dominates the TPU runtime of
    the multigrid smoother."""

    def __init__(self, plan: GcLevelPlan, ivs, rb_method: str, bc_fn,
                 params, rb_extrap_mask=None, corners: bool = True):
        ndim, nc = plan.ndim, plan.nc
        ivs = [int(v) for v in ivs]
        n_iv = len(ivs)
        hnc = nc // 2
        if ndim == 3 and rb_method == RB_MG:
            J = 7
        elif ndim == 2 and (rb_method == RB_MG
                            or rb_extrap_mask is not None):
            J = 5
        else:
            J = 4
        tgt_id, tgt_sidx = [], []
        src_id, src_sidx = [], []
        w = []           # [K][n_iv, J]
        lim = []         # [K]
        self.bc_groups = []  # (iv_idx, d, k0, k1, gamma per type)
        F = nc ** (ndim - 1)

        def emit(ids_arr, tgt_tbl, srcs, weights, limited=False):
            """ids_arr [n]; tgt_tbl [F] or [n,F]; srcs: list of
            (id_arr [n], sidx [F] or [n,F]); weights: [n_iv, len(srcs)]
            or per-entry [n, n_iv, len(srcs)]."""
            n = len(ids_arr)
            if n == 0:
                return 0
            tt = np.broadcast_to(tgt_tbl, (n, F)) if tgt_tbl.ndim == 1 \
                else tgt_tbl
            tgt_id.append(np.repeat(np.asarray(ids_arr), F))
            tgt_sidx.append(tt.reshape(-1))
            K_new = n * F
            sid = np.zeros((K_new, J), np.int32)
            ssx = np.zeros((K_new, J), np.int32)
            ww = np.zeros((K_new, n_iv, J))
            for j, (ia, sx) in enumerate(srcs):
                sid[:, j] = np.repeat(np.asarray(ia), F)
                sxb = np.broadcast_to(sx, (n, F)) if sx.ndim == 1 else sx
                ssx[:, j] = sxb.reshape(-1)
            wa = np.asarray(weights)
            if wa.ndim == 2:  # [n_iv, nsrc]
                ww[:, :, :wa.shape[1]] = wa[None]
            else:             # [n, n_iv, nsrc] per-entry
                ww[:, :, :wa.shape[2]] = wa.reshape(K_new // F, 1, -1).repeat(
                    F, 0) if False else np.repeat(wa, F, axis=0)
            src_id.append(sid)
            src_sidx.append(ssx)
            w.append(ww)
            lim.append(np.full(K_new, limited))
            return K_new

        k_count = 0
        one = np.ones((n_iv, 1))
        for d, p in enumerate(plan.dirs):
            dim, low = neighb_dim(d), neighb_low(d)
            # same-level copy
            k_count += emit(p.copy_ids, p.ghost_sidx,
                            [(p.copy_nb, p.nbint_sidx)], one)
            # physical boundary: affine in inner1/inner2 + bc value
            if len(p.bc_ids):
                wbc = np.zeros((n_iv, 2))
                gammas = []
                for i, iv in enumerate(ivs):
                    bc_type, _ = bc_fn(iv, d, p.bc_coords, params or {})
                    if bc_type == BC_DIRICHLET:
                        wbc[i] = [-1.0, 0.0]
                        gammas.append(2.0)
                    elif bc_type == BC_NEUMANN:
                        wbc[i] = [1.0, 0.0]
                        gammas.append((1.0 if not low else -1.0)
                                      * plan.dr[dim])
                    elif bc_type == BC_CONTINUOUS:
                        wbc[i] = [2.0, -1.0]
                        gammas.append(0.0)
                    elif bc_type == BC_DIRICHLET_COPY:
                        wbc[i] = [0.0, 0.0]
                        gammas.append(1.0)
                    else:
                        raise ValueError("unknown bc type")
                k0 = k_count
                k_count += emit(p.bc_ids, p.ghost_sidx,
                                [(p.bc_ids, p.f1_sidx),
                                 (p.bc_ids, p.f2_sidx)], wbc)
                self.bc_groups.append((d, k0, k_count, p.bc_coords,
                                       np.asarray(gammas)))
            # refinement boundary
            if len(p.rb_ids):
                n_rb = len(p.rb_ids)
                emask = (None if rb_extrap_mask is None
                         else rb_extrap_mask.get(d))
                if rb_method in (RB_INTERP, RB_INTERP_LIM):
                    limited = rb_method == RB_INTERP_LIM
                    if ndim == 1:
                        srcs = [(p.rb_coarse, p.rb_c1),
                                (p.rb_ids, p.f1_sidx)]
                        wr = np.tile([2 / 3, 1 / 3], (n_iv, 1))
                    elif ndim == 2:
                        srcs = [(p.rb_coarse, p.rb_c1),
                                (p.rb_coarse, p.rb_c2),
                                (p.rb_ids, p.f1_sidx)]
                        wr = np.tile([0.5, 1 / 6, 1 / 3], (n_iv, 1))
                    else:
                        srcs = [(p.rb_coarse, p.rb_c1),
                                (p.rb_coarse, p.rb_c2),
                                (p.rb_coarse, p.rb_c3),
                                (p.rb_ids, p.f1_sidx)]
                        wr = np.tile([1 / 3, 1 / 6, 1 / 6, 1 / 3],
                                     (n_iv, 1))
                    k_count += emit(p.rb_ids, p.ghost_sidx, srcs, wr,
                                    limited=limited)
                elif rb_method == RB_PROLONG_COPY:
                    k_count += emit(p.rb_ids, p.ghost_sidx,
                                    [(p.rb_parent, p.rb_pcopy)], one)
                elif rb_method == RB_MG:
                    # linear in the coarse strip + two fine layers
                    # (mg_sides_rb); the extrapolating veps variant uses
                    # the parent copy and parity-swapped fine layers
                    tgt2, sid2, ssx2, ww2, lim2 = self._rb_mg_entries(
                        plan, p, d, n_iv, J, hnc, emask)
                    tgt_id.append(np.repeat(p.rb_ids, F))
                    tgt_sidx.append(tgt2)
                    src_id.append(sid2)
                    src_sidx.append(ssx2)
                    w.append(ww2)
                    lim.append(lim2)
                    k_count += n_rb * F
                else:
                    raise ValueError(f"unknown rb method {rb_method}")

        self.tgt_id = np.concatenate(tgt_id) if tgt_id else \
            np.zeros(0, np.int32)
        self.tgt_sidx = np.concatenate(tgt_sidx) if tgt_sidx else \
            np.zeros(0, np.int32)
        self.src_id = np.concatenate(src_id) if src_id else \
            np.zeros((0, J), np.int32)
        self.src_sidx = np.concatenate(src_sidx) if src_sidx else \
            np.zeros((0, J), np.int32)
        self.w = np.concatenate(w) if w else np.zeros((0, n_iv, J))
        self.lim = np.concatenate(lim) if lim else np.zeros(0, bool)
        self.any_lim = bool(self.lim.any())
        self.ivs = np.asarray(ivs, np.int32)

        # ---------------- stage 2: corners and edges (read side ghosts)
        c_tgt_id, c_tgt_sidx, c_src_id, c_src_sidx, c_w = \
            [], [], [], [], []
        JC = 4
        if corners and ndim >= 2:
            for plans in (plan.edge_plans, plan.corner_plans):
                for pl in plans:
                    pl = {k: (np.atleast_1d(v) if k.endswith(("sidx",))
                              or k.startswith("ext_")
                              and k != "ext_ids" else v)
                          for k, v in pl.items()}
                    Fc = len(pl["pos_sidx"])
                    for ids_arr, srcs, ws in (
                        (pl["copy_ids"], [(pl["copy_ids"], None,
                                           pl["nb_sidx"], "nb")], [1.0]),
                        (pl["ext_ids"],
                         ([(pl["ext_ids"], None, pl["ext_a"], "s"),
                           (pl["ext_ids"], None, pl["ext_b"], "s"),
                           (pl["ext_ids"], None, pl["ext_c"], "s"),
                           (pl["ext_ids"], None, pl["ext_d"], "s")]
                          if "ext_d" in pl else
                          [(pl["ext_ids"], None, pl["ext_a"], "s"),
                           (pl["ext_ids"], None, pl["ext_b"], "s"),
                           (pl["ext_ids"], None, pl["ext_c"], "s")]),
                         ([1.0, 1.0, 1.0, -2.0] if "ext_d" in pl
                          else [1.0, 1.0, -1.0]))):
                        n = len(ids_arr)
                        if n == 0:
                            continue
                        c_tgt_id.append(np.repeat(ids_arr, Fc))
                        c_tgt_sidx.append(np.tile(pl["pos_sidx"], n))
                        sid = np.zeros((n * Fc, JC), np.int32)
                        ssx = np.zeros((n * Fc, JC), np.int32)
                        ww = np.zeros((n * Fc, JC))
                        for j, (ia, _, sx, kind) in enumerate(srcs):
                            src_ids = pl["copy_nb"] if kind == "nb" \
                                else ia
                            sid[:, j] = np.repeat(src_ids, Fc)
                            ssx[:, j] = np.tile(sx, n)
                            ww[:, j] = ws[j]
                        c_src_id.append(sid)
                        c_src_sidx.append(ssx)
                        c_w.append(ww)
        self.c_tgt_id = np.concatenate(c_tgt_id) if c_tgt_id else \
            np.zeros(0, np.int32)
        self.c_tgt_sidx = np.concatenate(c_tgt_sidx) if c_tgt_id else \
            np.zeros(0, np.int32)
        self.c_src_id = np.concatenate(c_src_id) if c_src_id else \
            np.zeros((0, JC), np.int32)
        self.c_src_sidx = np.concatenate(c_src_sidx) if c_src_id else \
            np.zeros((0, JC), np.int32)
        self.c_w = np.concatenate(c_w) if c_w else np.zeros((0, JC))

    @staticmethod
    def _rb_mg_entries(plan, p, d, n_iv, J, hnc, emask):
        """Per-entry (src, weight) tables for the mg_sides_rb ghost scheme
        and its extrapolating veps variant."""
        ndim, nc = plan.ndim, plan.nc
        F = nc ** (ndim - 1)
        n_rb = len(p.rb_ids)
        tgt = np.broadcast_to(p.ghost_sidx, (n_rb, F)).reshape(-1)
        sid = np.zeros((n_rb * F, J), np.int32)
        ssx = np.zeros((n_rb * F, J), np.int32)
        ww = np.zeros((n_rb * F, n_iv, J))
        f1 = np.broadcast_to(p.f1_sidx, (n_rb, F))
        f2 = np.broadcast_to(p.f2_sidx, (n_rb, F))
        rb_ids_rep = np.repeat(p.rb_ids, F)

        if ndim == 1:
            strip_pos = np.zeros((n_rb, 1, 3), np.int64)
            signs = np.zeros((1,))
            # 1D: gc = tmp[0]; ghost = 0.5 gc + .75 f1 - .25 f2
            sid[:, 0] = np.repeat(p.rb_coarse, F)
            ssx[:, 0] = p.rb_tmp[:, 0].repeat(F)
            ww[:, :, 0] = 0.5
        elif ndim == 2:
            j = np.arange(1, nc + 1)
            i_pair = (j + 1) // 2            # 1..hnc, strip center pos
            sgn = np.where(j % 2 == 1, -1.0, 1.0)
            for col, (off, wfac) in enumerate(
                    [(0, 0.5), (1, 0.125 * 0.5), (-1, -0.125 * 0.5)]):
                pos = np.clip(i_pair + off, 0, hnc + 1)
                ssx[:, col] = p.rb_tmp[:, pos].reshape(-1)
                sid[:, col] = np.repeat(p.rb_coarse, F)
                wcol = wfac * (np.ones(F) if col == 0 else sgn)
                ww[:, :, col] = np.tile(wcol, n_rb)[:, None]
        else:
            j = np.arange(1, nc + 1)
            jj, kk = np.meshgrid(j, j, indexing="ij")
            jj, kk = jj.ravel(), kk.ravel()
            i1 = (jj + 1) // 2
            i2 = (kk + 1) // 2
            s1 = np.where(jj % 2 == 1, -1.0, 1.0)
            s2 = np.where(kk % 2 == 1, -1.0, 1.0)
            W = hnc + 2

            def strip_at(a, b):
                return p.rb_tmp[:, (a * W + b)].reshape(-1)
            cols = [
                (strip_at(i1, i2), 0.5 * np.ones(F)),
                (strip_at(np.clip(i1 + 1, 0, W - 1), i2), 0.0625 * s1),
                (strip_at(np.clip(i1 - 1, 0, W - 1), i2), -0.0625 * s1),
                (strip_at(i1, np.clip(i2 + 1, 0, W - 1)), 0.0625 * s2),
                (strip_at(i1, np.clip(i2 - 1, 0, W - 1)), -0.0625 * s2),
            ]
            for col, (sx, wcol) in enumerate(cols):
                ssx[:, col] = sx
                sid[:, col] = np.repeat(p.rb_coarse, F)
                ww[:, :, col] = np.tile(wcol, n_rb)[:, None]
        # fine-side terms
        nf = 3 if ndim == 2 else (5 if ndim == 3 else 1)
        sid[:, nf] = rb_ids_rep
        ssx[:, nf] = f1.reshape(-1)
        ww[:, :, nf] = 0.75
        sid[:, nf + 1] = rb_ids_rep
        ssx[:, nf + 1] = f2.reshape(-1)
        ww[:, :, nf + 1] = -0.25

        if emask is not None and emask.any():
            # overwrite masked entries with the extrapolating variant
            sel = np.repeat(emask, F)
            prep = np.repeat(p.rb_parent, F)
            sid[sel] = 0
            ssx[sel] = 0
            ww[sel] = 0.0
            sid[sel, 0] = prep[sel]
            ssx[sel, 0] = np.broadcast_to(
                p.rb_pcopy, (n_rb, F)).reshape(-1)[sel]
            ww[sel, :, 0] = 0.5
            sid[sel, 1] = rb_ids_rep[sel]
            ssx[sel, 1] = f1.reshape(-1)[sel]
            sid[sel, 2] = rb_ids_rep[sel]
            ssx[sel, 2] = f2.reshape(-1)[sel]
            if ndim == 2:
                swap = (np.arange(F).reshape(-1, 2)[:, ::-1]).reshape(-1)
                f1s = f1[:, swap].reshape(-1)
                f2s = f2[:, swap].reshape(-1)
                ww[sel, :, 1] = 1.125
                ww[sel, :, 2] = -0.375
                sid[sel, 3] = rb_ids_rep[sel]
                ssx[sel, 3] = f1s[sel]
                ww[sel, :, 3] = -0.375
                sid[sel, 4] = rb_ids_rep[sel]
                ssx[sel, 4] = f2s[sel]
                ww[sel, :, 4] = 0.125
            else:
                ww[sel, :, 1] = 0.75
                ww[sel, :, 2] = -0.25
        return tgt, sid, ssx, ww, np.zeros(n_rb * F, bool)

    def __call__(self, cc, bc_fn, params):
        import jax.numpy as jnp
        if len(self.tgt_id) == 0 and len(self.c_tgt_id) == 0:
            return cc
        ivs = jnp.asarray(self.ivs)
        if len(self.tgt_id):
            vals = cc[ivs[:, None, None], jnp.asarray(self.src_id)[None],
                      jnp.asarray(self.src_sidx)[None]]
            ghost = jnp.einsum("ikj,kij->ik", vals, jnp.asarray(self.w))
            # boundary-condition contributions
            if self.bc_groups:
                add = jnp.zeros(ghost.shape, ghost.dtype)
                for (d, k0, k1, coords, gammas) in self.bc_groups:
                    for i, iv in enumerate(self.ivs):
                        if gammas[i] == 0.0:
                            continue
                        _, val = bc_fn(int(iv), d, coords, params or {})
                        val = gammas[i] * (
                            val + jnp.zeros((k1 - k0,)).reshape(
                                coords.shape[0], -1)).reshape(-1)
                        add = add.at[i, k0:k1].add(val)
                ghost = ghost + add
            if self.any_lim:
                c1v = vals[:, :, 0]
                ghost = jnp.where(jnp.asarray(self.lim)[None],
                                  jnp.minimum(ghost, 2.0 * c1v), ghost)
            cc = cc.at[ivs[:, None], jnp.asarray(self.tgt_id)[None],
                       jnp.asarray(self.tgt_sidx)[None]].set(ghost)
        if len(self.c_tgt_id):
            vals = cc[ivs[:, None, None], jnp.asarray(self.c_src_id)[None],
                      jnp.asarray(self.c_src_sidx)[None]]
            ghost = jnp.einsum("ikj,kj->ik", vals, jnp.asarray(self.c_w))
            cc = cc.at[ivs[:, None], jnp.asarray(self.c_tgt_id)[None],
                       jnp.asarray(self.c_tgt_sidx)[None]].set(ghost)
        return cc


def get_fused_fill(tree: Tree, lvl: int, ivs, rb_method: str, bc_fn,
                   params, rb_extrap_mask=None, corners: bool = True):
    cache = getattr(tree, "_fused_gc_cache", None)
    if cache is None or cache.get("epoch") != tree.epoch:
        cache = {"epoch": tree.epoch}
        tree._fused_gc_cache = cache
    emkey = None
    if rb_extrap_mask is not None:
        emkey = tuple(sorted((d, m.tobytes())
                             for d, m in rb_extrap_mask.items()))
    key = (lvl, tuple(int(v) for v in ivs), rb_method, id(bc_fn), corners,
           emkey)
    if key not in cache:
        plan = get_gc_plan(tree, lvl)
        cache[key] = FusedGcFill(plan, ivs, rb_method, bc_fn, params,
                                 rb_extrap_mask, corners)
    return cache[key]


def fill_corners_lvl(cc, plan: GcLevelPlan, ivs):
    """Corner/edge ghost fill only (used after a fused side fill)."""
    ivs = np.asarray(ivs, dtype=np.int32)
    for plan_e in plan.edge_plans:
        cc = _fill_corner_group(cc, ivs, plan_e, is_edge=True)
    for plan_c in plan.corner_plans:
        cc = _fill_corner_group(cc, ivs, plan_c, is_edge=False)
    return cc
