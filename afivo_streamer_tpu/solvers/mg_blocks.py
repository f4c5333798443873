"""Local-block FAS V-cycle: the multigrid cycle on per-level block arrays.

The pack-mode V-cycle of round 3 still routed every stage (smoothing,
residual, restriction, coarse-rhs assembly, prolongation, ghost fill)
through the full SoA state array ``cc[n_var, capacity, cells]``: each
stage re-gathered its level's boxes from ``cc`` and scattered results
back, so one V-cycle executed hundreds of XLA ops *on the multi-MB state
array* — and every masked update that XLA fails to alias in place copies
the whole array through HBM. This module re-designs the cycle the TPU way
(SURVEY.md section 7.1): the solve state lives in small per-level block
arrays

* ``P[l]``: phi blocks ``[n_l, nc+2, nc+2]`` (with ghost layer),
* ``R[l]``: rhs interiors ``[n_l, nc, nc]``,

gathered from ``cc`` ONCE per solve and scattered back once. Every cycle
stage is a handful of fused ops on these small arrays; all ghost
exchanges go through the fused Pallas fill kernel of the pack smoother
(ops/pallas_smoother.py), and the smoothing sweeps are the existing
Pallas red-black kernels. The cycle structure and numerics are the
reference's FAS V-cycle unchanged (``afivo/src/m_af_multigrid.f90``:
mg_fas_vcycle :185-264, update_coarse :691-738, correct_children
:624-646), including the corner ghost fills of ``af_gc_box_corner``
(``m_af_ghostcell.f90:125-170``) as direct block-index updates.

Engaged exactly where the Pallas pack smoother is engaged (2D, device
f32 on TPU, or interpret mode for tests); the host and generic traced
paths in solvers/multigrid.py are untouched.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core import ghostcell as gc
from ..core import prolong_restrict as pr
from ..core import spatial as sp
from ..core import treepack as tp
from ..core.tree import Tree


def _posmap(ids: np.ndarray, trash: int, sac: int) -> np.ndarray:
    """Box id -> level-local row; trash (padded) entries -> the
    sacrificial row ``sac`` (one past the real rows)."""
    pos = np.full(int(max(ids.max(initial=0), trash)) + 2, sac, np.int64)
    realm = ids != trash
    pos[ids[realm]] = np.nonzero(realm)[0]
    return pos


class LevelBlockPlan:
    """Block-row-space index tables of one level for the local V-cycle.

    Everything a level visit needs beyond the PackSmoother tables:
    the rb-ghost coarse-strip rows in the *coarse level's block array*
    (for the fused fill's A constants), the corner-fill row tables, the
    parity-grouped (parent-row, child-row) transfer tables with the
    cylindrical restriction weights, and the parent mask for the FAS rhs
    update. Registered as a pytree so it rides as a runtime jit argument
    (core/treepack.py); padded entries target a sacrificial row."""

    def __init__(self, tree: Tree, lvl: int, pad: bool, trash: int):
        ndim, nc = tree.ndim, tree.nc
        self.lvl = lvl
        self.nc = nc
        self.ndim = ndim
        tb_l = tp.LevelTables(tree, lvl, pad=pad, trash=trash)
        ids_l = np.asarray(tb_l.ids)
        n_l = len(ids_l)
        self.n = n_l
        pos_l = _posmap(ids_l, trash, n_l)
        plan = gc.GcLevelPlan(tree, lvl, pad=pad, trash=trash)

        # ---- rb coarse-strip rows (A-build) per direction
        self.rb_cpos = [None] * (2 * ndim)
        self.n_c = 0
        pos_c = None
        if lvl > 1:
            tb_c = tp.LevelTables(tree, lvl - 1, pad=pad, trash=trash)
            ids_c = np.asarray(tb_c.ids)
            n_c = len(ids_c)
            self.n_c = n_c
            pos_c = _posmap(ids_c, trash, n_c)
            for d, p in enumerate(plan.dirs):
                if len(p.rb_ids):
                    self.rb_cpos[d] = pos_c[np.asarray(p.rb_coarse)] \
                        .astype(np.int32)

        # ---- corner-fill tables (2D: 4 corners; 3D adds edges)
        self.c_rows, self.c_nb, self.c_ext = [], [], []
        for pl in plan.corner_plans:
            self.c_rows.append(pos_l[np.asarray(pl["copy_ids"])]
                               .astype(np.int32))
            self.c_nb.append(pos_l[np.asarray(pl["copy_nb"])]
                             .astype(np.int32))
            self.c_ext.append(pos_l[np.asarray(pl["ext_ids"])]
                              .astype(np.int32))
        self.e_rows, self.e_nb, self.e_ext = [], [], []
        for pl in plan.edge_plans:
            self.e_rows.append(pos_l[np.asarray(pl["copy_ids"])]
                               .astype(np.int32))
            self.e_nb.append(pos_l[np.asarray(pl["copy_nb"])]
                             .astype(np.int32))
            self.e_ext.append(pos_l[np.asarray(pl["ext_ids"])]
                              .astype(np.int32))

        # ---- parity-grouped transfer tables (children at lvl, parents
        # at lvl-1); reuse the padded pr-plan grouping so bucket shapes
        # match the epoch pack
        self.g_par, self.g_ch, self.g_cylw = [], [], []
        self.parities = ()
        self.parent_mask = None
        if lvl > 1:
            prp = pr.ProlongRestrictPlan(tree, tree.lvl_ids[lvl - 1],
                                         pad=pad, trash=trash, lvl=lvl)
            pars = []
            for tb, par, ch, cyl_w, _corr in prp.groups:
                self.g_par.append(pos_c[np.asarray(par)].astype(np.int32))
                self.g_ch.append(pos_l[np.asarray(ch)].astype(np.int32))
                self.g_cylw.append(cyl_w)  # [n_g, (nc/2)^d, 2] or None
                pars.append(tb.parity)
            self.parities = tuple(pars)
            # parent mask over the coarse level's rows: 1 where the box
            # has children at lvl (targets of the FAS rhs update)
            parents = np.asarray(tb_c.parents)
            m = np.zeros(n_c + 1)
            real = parents != trash
            m[pos_c[parents[real]]] = 1.0
            self.parent_mask = m[:n_c]


def _register():
    tp.register_plan(
        LevelBlockPlan,
        dyn_fields=("rb_cpos", "c_rows", "c_nb", "c_ext", "e_rows",
                    "e_nb", "e_ext", "g_par", "g_ch", "g_cylw",
                    "parent_mask"),
        aux_fields=("lvl", "nc", "ndim", "n", "n_c", "parities"))


try:
    _register()
except ValueError:
    pass


# ---------------------------------------------------------------------------
# block-array primitives
# ---------------------------------------------------------------------------
def apply_cs(P, cs, nc: int):
    """Difference-form stencil apply on [n, C, C] blocks (see
    multigrid.LevelOp.apply and ops/pallas_smoother._sweep_2d):
    L(phi) = c_sum phi0 + sum_d c_d (phi_d - phi_0)."""
    B0 = P[:, 1:nc + 1, 1:nc + 1]
    return (cs[:, 5] * B0
            + cs[:, 1] * (P[:, 0:nc, 1:nc + 1] - B0)
            + cs[:, 2] * (P[:, 2:nc + 2, 1:nc + 1] - B0)
            + cs[:, 3] * (P[:, 1:nc + 1, 0:nc] - B0)
            + cs[:, 4] * (P[:, 1:nc + 1, 2:nc + 2] - B0))


def _ext(P):
    """Append a sacrificial row (the target of padded scatter entries)."""
    return jnp.concatenate([P, P[-1:]], axis=0)


def _row_window_set(Ae, rows, window_sl, vals):
    """``Ae.at[rows, *window_sl].set(vals)`` without the serialized
    scatter loop XLA emits for window scatters on TPU (measured ~0.3 ms
    per call at a few hundred rows): gather whole rows, update the
    static window, scatter whole rows (row-level scatters vectorize)."""
    rj = jnp.asarray(sp.aix(rows))
    blk = Ae[rj]
    blk = blk.at[(slice(None),) + window_sl].set(vals)
    return Ae.at[rj].set(blk)


def _row_window_add(Ae, rows, window_sl, vals):
    """Row-gathered variant of ``Ae.at[rows, *window_sl].add(vals)``;
    ``rows`` must be duplicate-free (true for all per-level box tables —
    padded entries target the sacrificial row exactly once per table)."""
    rj = jnp.asarray(sp.aix(rows))
    blk = Ae[rj]
    blk = blk.at[(slice(None),) + window_sl].add(vals)
    return Ae.at[rj].set(blk)


def corner_fill_blocks(P, bp: LevelBlockPlan, nc: int):
    """Corner ghost cells on [n, C, C] blocks (af_gc_box_corner,
    ``m_af_ghostcell.f90:125-170``): copy from the diagonal neighbor when
    present, else the linear extrapolation a + b - c."""
    corners = sp.corner_list(2, nc)
    Pe = _ext(P)
    n = bp.n
    for gi, (pos, di) in enumerate(corners):
        i0, j0 = int(pos[0]), int(pos[1])
        d0, d1 = int(di[0]), int(di[1])
        rows = bp.c_rows[gi]
        nbr = bp.c_nb[gi]
        if len(rows):
            ni = nc if i0 == 0 else 1
            nj = nc if j0 == 0 else 1
            Pe = _row_window_set(Pe, rows, (i0, j0), Pe[nbr, ni, nj])
        erows = bp.c_ext[gi]
        if len(erows):
            a = Pe[erows, i0 + d0, j0]
            b = Pe[erows, i0, j0 + d1]
            c = Pe[erows, i0 + d0, j0 + d1]
            Pe = _row_window_set(Pe, erows, (i0, j0), a + b - c)
    return Pe[:n]


def restrict_to_parent(P_f, res_f, Pc, bp: LevelBlockPlan, nc: int,
                       dtype):
    """FAS down-transfer (update_coarse, ``m_af_multigrid.f90:691-738``):
    restrict the (smoothed) fine phi into the parent interiors of ``Pc``
    (plain 2^d average, matching the host's use_geometry=False) and the
    fine residual (cylindrical-volume-weighted, af_cyl_child_weights,
    ``m_af_types.f90:1186-1197``). Returns (Pc_updated, res_c) with
    res_c the restricted residual [n_c, nc, nc] (zero outside parents)."""
    hnc = nc // 2
    n_c = bp.n_c
    Pce = _ext(Pc)
    res_ce = jnp.zeros((n_c + 1, nc, nc), dtype)
    phi_f = P_f[:, 1:nc + 1, 1:nc + 1]
    for (par, ch, cylw, parity) in zip(bp.g_par, bp.g_ch, bp.g_cylw,
                                       bp.parities):
        q0, q1 = parity
        # fine interiors reshaped to (box, i_r, a, i_z, b): coarse cell
        # (i_r, i_z), child bits (a, b) along (r, z)
        I = phi_f[ch].reshape(-1, hnc, 2, hnc, 2)
        vals = I.mean(axis=(2, 4))
        rsl = slice(1 + q0 * hnc, 1 + (q0 + 1) * hnc)
        zsl = slice(1 + q1 * hnc, 1 + (q1 + 1) * hnc)
        Pce = _row_window_set(Pce, par, (rsl, zsl), vals)
        Ir = res_f[ch].reshape(-1, hnc, 2, hnc, 2)
        if cylw is not None:
            # w[n, i_r, i_z, inner/outer]: radial child weights
            w = jnp.asarray(cylw).astype(dtype).reshape(-1, hnc, hnc, 2)
            s_b = Ir.sum(axis=4)  # [n, i_r, a, i_z]
            rvals = (w[..., 0] * s_b[:, :, 0, :]
                     + w[..., 1] * s_b[:, :, 1, :]) / 4.0
        else:
            rvals = Ir.mean(axis=(2, 4))
        res_ce = _row_window_set(
            res_ce, par, (slice(q0 * hnc, (q0 + 1) * hnc),
                          slice(q1 * hnc, (q1 + 1) * hnc)), rvals)
    return Pce[:n_c], res_ce[:n_c]


def prolong_add_correction(P_f, corr_c, bp: LevelBlockPlan, nc: int):
    """phi += prolong(phi_c - phi_old_c) (correct_children,
    ``m_af_multigrid.f90:624-646``) with the linear 4-point prolongation
    (af_prolong_linear); corr_c is the full coarse block array incl.
    ghosts."""
    C = nc + 2
    n = bp.n
    corr_flat = _ext(corr_c).reshape(-1, C * C)
    Pe = _ext(P_f)
    for (par, ch, _w, parity) in zip(bp.g_par, bp.g_ch, bp.g_cylw,
                                     bp.parities):
        tb = pr.parity_tables(2, nc, parity)
        src = corr_flat[par]
        fine = 0.0
        for w, sidx in tb.corners:
            fine = fine + float(w) * src[:, sidx]
        fine = fine.reshape(-1, nc, nc)
        Pe = _row_window_add(Pe, ch, (slice(1, nc + 1),) * 2, fine)
    return Pe[:n]


# ---------------------------------------------------------------------------
# Multigrid integration (attached to solvers.multigrid.Multigrid)
# ---------------------------------------------------------------------------
def blocks_path_active(mg, cc) -> bool:
    """Local-block V-cycle applies exactly where the pack smoother does:
    2D epoch-pack tracing with the Pallas kernels engaged."""
    import os
    if os.environ.get("AFIVO_FASTMG", "1") == "0":
        return False
    if mg._pack is None or mg._pack_sm is None or mg._pack_blocks is None:
        return False
    if mg.tree.ndim != 2:
        return False
    interp = os.environ.get("AFIVO_PALLAS", "") == "interpret"
    return interp or (cc.dtype == jnp.float32
                      and jax.default_backend() == "tpu"
                      and os.environ.get("AFIVO_PALLAS", "1") != "0")


def gather_levels(mg, cc):
    """(P, R) per level from cc — the only full-state reads of a solve."""
    t = mg.tree
    nc, ndim = t.nc, t.ndim
    C = nc + 2
    interior = jnp.asarray(sp.interior_flat(ndim, nc))
    P, R = [], []
    for l in range(1, mg._n_levels() + 1):
        ids = jnp.asarray(sp.aix(mg._tb(l).ids))
        P.append(cc[mg.i_phi, ids].reshape(len(ids), C, C))
        R.append(cc[mg.i_rhs, ids[:, None],
                    interior[None, :]].reshape(len(ids), nc, nc))
    return tuple(P), tuple(R)


def scatter_phi(mg, cc, P):
    """Write the per-level phi blocks back — the only full-state writes."""
    for l in range(1, mg._n_levels() + 1):
        ids = jnp.asarray(sp.aix(mg._tb(l).ids))
        cc = cc.at[mg.i_phi, ids].set(P[l - 1].reshape(len(ids), -1))
    return cc


def build_A_blocks(mg, lvl: int, Pc, scal, dtype):
    """Ghost-fill A constants of one level from the coarse block array
    (the block-space analog of PackSmoother2D.build_consts): physical
    boundary values folded with the runtime voltage; mg_sides_rb coarse
    strips interpolated from ``Pc`` (``m_af_multigrid.f90:361-388``)."""
    sm = mg._pack_sm[lvl - 1]
    bp = mg._pack_blocks[lvl - 1]
    plan = mg._pack.gc[lvl - 1]
    nc, n = sm.nc, sm.n
    C = nc + 2
    # per-direction [n+1, nc] columns built with ROW-level scatter-adds
    # (an A.at[pos, d].add window scatter serializes on TPU: measured
    # 8 ms per V-cycle before this restructure)
    bc_by_d = {d: gamma for d, _t, gamma in sm.bc_recipe}
    cols = []
    for d in range(4):
        Ad = jnp.zeros((n + 1, nc), dtype)
        gamma = bc_by_d.get(d, 0.0)
        if gamma != 0.0:
            p = plan.dirs[d]
            _, val = mg.sides_bc(mg.i_phi, d, p.bc_coords, scal or {})
            nbc = len(sm.bc_pos[d])
            val = gamma * (jnp.asarray(val).astype(dtype)
                           + jnp.zeros((nbc, nc), dtype))
            Ad = Ad.at[jnp.asarray(sm.bc_pos[d])].add(val)
        # rb_dirs may list a direction whose rb case is an all-trash
        # floor bucket (treepack.bucket_hwm's global floor); when the
        # coarse block is absent (Pc None / no rb_cpos) the case is
        # necessarily dummy-only — skip it
        if d in sm.rb_dirs and Pc is not None \
                and bp.rb_cpos[d] is not None:
            p = plan.dirs[d]
            strips = Pc.reshape(-1, C * C)[
                jnp.asarray(bp.rb_cpos[d])[:, None],
                jnp.asarray(sp.aix(p.rb_tmp))]
            gci = gc._mg_rb_interp(strips[None], 2, nc)[0]
            Ad = Ad.at[jnp.asarray(sm.rb_pos[d])].add(
                (0.5 * gci).astype(dtype))
        cols.append(Ad[:n])
    return jnp.stack(cols, axis=1)


def smooth_blocks(mg, lvl: int, P_l, R_l, A_l, cs_l, n_cycle: int,
                  up_cycle: bool, interp: bool):
    """gsrb_boxes on a local block array (``m_af_multigrid.f90:648-687``):
    scan of (red-black Pallas sweep, fused Pallas ghost fill) half
    sweeps; corner ghosts stored after the final upward half sweep."""
    from .multigrid import _parity_mask
    sm = mg._pack_sm[lvl - 1]
    nc = sm.nc
    n_half = 2 * n_cycle
    masks = jnp.asarray(np.stack(
        [_parity_mask(2, nc, k).astype(np.float32)
         for k in range(1, n_half + 1)]))

    # same op sequence as (sweep, fill) x n_half, with the interior
    # (fill, sweep) pairs fused into ONE Pallas kernel each — halving
    # the smoother's program count (the cycle is kernel-launch bound):
    # sweep(1); [fill+sweep](2..n_half); fill
    P_l = sm.sweep(P_l, R_l, masks[0], cs_l, interpret=interp)
    if n_half > 1:
        def body(p, mask):
            p = sm.fill_sweep(p, R_l, mask, A_l, cs_l, interpret=interp)
            return p, None

        P_l, _ = jax.lax.scan(body, P_l, masks[1:])
    P_l = sm.fill(P_l, A_l, interpret=interp)
    if up_cycle:
        P_l = corner_fill_blocks(P_l, mg._pack_blocks[lvl - 1], nc)
    return P_l


def coarse_solve_blocks(mg, P1, R1, scal, dtype):
    """Level-1 dense solve on block arrays (the MXU replacement of the
    reference's HYPRE coarse solve, ``m_coarse_solver.f90``); same
    matrix/bc assembly as CoarseSolver.solve, reading the local R1 and
    writing the local P1."""
    cs = mg.coarse_solver()
    if not hasattr(cs, "A_inv"):
        raise NotImplementedError(
            "block coarse path requires the dense level-1 solver")
    N = cs.A_inv.shape[0]
    n1 = len(cs.ids1)
    rhs = jnp.zeros(N, dtype)
    rhs = rhs.at[jnp.asarray(cs.rows_map.ravel())].set(
        R1[:n1].reshape(-1))
    for d in range(2 * mg.tree.ndim):
        if len(cs.bc_rows[d]) == 0:
            continue
        _, bval = cs.sides_bc(mg.i_phi, d, cs.bc_coords[d][None], scal)
        contrib = (jnp.asarray(cs.bc_coeff[d]).astype(dtype)
                   * (gc.cast_bc(bval, P1)
                      + jnp.zeros(len(cs.bc_rows[d]), dtype)))
        rhs = rhs.at[jnp.asarray(cs.bc_rows[d])].add(
            -contrib.ravel().astype(dtype))
    x = jnp.asarray(cs.A_inv, dtype) @ rhs
    nc = mg.tree.nc
    vals = x[jnp.asarray(cs.rows_map)].reshape(n1, nc, nc)
    return P1.at[:n1, 1:nc + 1, 1:nc + 1].set(vals)


def fas_vcycle_blocks(mg, P, R, scal, interp: bool):
    """One FAS V-cycle on the local block arrays (mg_fas_vcycle,
    ``m_af_multigrid.f90:185-264``). P, R: tuples of per-level arrays;
    returns the updated tuples."""
    L = mg._n_levels()
    dtype = P[0].dtype
    P = list(P)
    R = list(R)
    tmp = [None] * L
    cs_of = [mg._pack_sm[l - 1].make_cs(mg._pack_ops[l - 1], dtype)
             for l in range(1, L + 1)]
    for l in range(L, 1, -1):
        li = l - 1
        bp = mg._pack_blocks[li]
        A_l = build_A_blocks(mg, l, P[li - 1], scal, dtype)
        P[li] = smooth_blocks(mg, l, P[li], R[li], A_l, cs_of[li],
                              mg.n_cycle_down, False, interp)
        res = R[li] - apply_cs(P[li], cs_of[li], mg.tree.nc)
        Pc, res_c = restrict_to_parent(P[li], res, P[li - 1], bp,
                                       mg.tree.nc, dtype)
        if l - 1 > 1:
            A_c = build_A_blocks(mg, l - 1, P[li - 2], scal, dtype)
        else:
            A_c = build_A_blocks(mg, 1, None, scal, dtype)
        Pc = mg._pack_sm[li - 1].fill(Pc, A_c, interpret=interp)
        Pc = corner_fill_blocks(Pc, mg._pack_blocks[li - 1], mg.tree.nc)
        Lp = apply_cs(Pc, cs_of[li - 1], mg.tree.nc)
        pm = jnp.asarray(bp.parent_mask).astype(dtype)[:, None, None]
        R[li - 1] = pm * (Lp + res_c) + (1.0 - pm) * R[li - 1]
        tmp[li - 1] = Pc
        P[li - 1] = Pc
    # ---- coarse level
    P[0] = coarse_solve_blocks(mg, P[0], R[0], scal, dtype)
    A1 = build_A_blocks(mg, 1, None, scal, dtype)
    P[0] = mg._pack_sm[0].fill(P[0], A1, interpret=interp)
    P[0] = corner_fill_blocks(P[0], mg._pack_blocks[0], mg.tree.nc)
    # ---- upward
    for l in range(2, L + 1):
        li = l - 1
        bp = mg._pack_blocks[li]
        corr = P[li - 1] - tmp[li - 1]
        P[li] = prolong_add_correction(P[li], corr, bp, mg.tree.nc)
        A_l = build_A_blocks(mg, l, P[li - 1], scal, dtype)
        P[li] = mg._pack_sm[li].fill(P[li], A_l, interpret=interp)
        P[li] = corner_fill_blocks(P[li], bp, mg.tree.nc)
        P[li] = smooth_blocks(mg, l, P[li], R[li], A_l, cs_of[li],
                              mg.n_cycle_up, True, interp)
    return tuple(P), tuple(R)


def max_leaf_residual_blocks(mg, P, R):
    """Masked max |rhs - L(phi)| over the leaves (af_tree_maxabs_cc of
    the residual; see multigrid.residual_all_levels)."""
    dtype = P[0].dtype
    m = jnp.asarray(0.0, dtype)
    for l in range(1, mg._n_levels() + 1):
        tb = mg._tb(l)
        if len(tb.leaves) == 0:
            continue
        cs_l = mg._pack_sm[l - 1].make_cs(mg._pack_ops[l - 1], dtype)
        res = R[l - 1] - apply_cs(P[l - 1], cs_l, mg.tree.nc)
        lp = jnp.asarray(sp.aix(tb.leaves_pos))
        lv = jnp.asarray(tb.leaf_valid).astype(dtype)
        leafres = jnp.abs(res.reshape(res.shape[0], -1)[lp])
        m = jnp.maximum(m, jnp.max(leafres * (lv[:, None] > 0)))
    return m
