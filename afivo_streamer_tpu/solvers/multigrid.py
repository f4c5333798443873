"""Geometric multigrid (FAS-FMG / FAS V-cycle) over the AMR box batch.

Re-designs the reference's ``afivo/src/m_af_multigrid.f90``: the same cycle
structure — downward red-black GSRB smoothing with ghost-cell exchange after
every half sweep (gsrb_boxes ``:648-687``), FAS coarse-grid construction
(update_coarse ``:691-738``: rhs_c = L(phi_c) + restrict(residual)), a
coarse-grid solve at level 1, and upward corrections
(correct_children ``:624-646``: phi += prolong(phi_c - phi_old_c)) — but
each level pass is one batched XLA/NumPy op over all boxes of the level
(blocks of shape [n, (nc+2)^ndim]), not an OpenMP loop.

The red-black update colors cells by (i+j+k) parity matching
stencil_gsrb_357 (``m_af_stencil.f90:820-980``), including the cylindrical
gradient correction via radial flux factors (af_cyl_flux_factors,
``m_af_types.f90:1199-1212``). The level-1 solve replaces the reference's
HYPRE bridge (``m_coarse_solver.f90``) with an assembled direct solve (the
reference coarse grids are tiny; see solvers/coarse.py).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

from contextlib import contextmanager
import os
import threading as _threading

import numpy as np
import jax
import jax.numpy as jnp

from ..core import spatial as sp
from ..core import ghostcell as gc
from ..core import prolong_restrict as pr
from ..core import rowops as ro
from ..core import treepack as tp
from ..core.tree import Tree
from .coarse import CoarseSolver, make_coarse_solver


def _xp(a):
    return np if isinstance(a, np.ndarray) else jnp


def blocks(cc, iv: int, ids, nc: int, ndim: int):
    """Gather level blocks: [n] + [nc+2]^ndim."""
    out = cc[iv, sp.aix(ids)]
    return out.reshape((len(ids),) + (nc + 2,) * ndim)


def scatter_interior(cc, iv: int, ids, vals_int, nc: int, ndim: int):
    """Scatter interior blocks [n]+[nc]^ndim back into cc.

    Traced path: element-wise scatters are extremely slow on TPU, so the
    rows are gathered, the interior inserted with a static-slice update
    (dynamic_update_slice), and written back with a fast row-level set."""
    sidx = sp.interior_flat(ndim, nc)
    flat = vals_int.reshape(len(ids), -1)
    if isinstance(cc, np.ndarray):
        cc[iv, np.asarray(ids)[:, None], sidx[None, :]] = flat
        return cc
    idsj = jnp.asarray(sp.aix(ids))
    B = cc[iv, idsj].reshape((len(ids),) + (nc + 2,) * ndim)
    B = B.at[(slice(None),) + (slice(1, nc + 1),) * ndim].set(
        flat.reshape((len(ids),) + (nc,) * ndim))
    return cc.at[iv, idsj].set(B.reshape(len(ids), -1))


def _parity_mask(ndim: int, nc: int, redblack: int) -> np.ndarray:
    """Cells updated in a half sweep: (i+j+k) % 2 == redblack % 2 with
    1-based indices (stencil_gsrb_357)."""
    idx = [np.arange(1, nc + 1)] * ndim
    mesh = np.meshgrid(*idx, indexing="ij")
    s = sum(mesh)
    return (s % 2) == (redblack % 2)


def _shift(B, k: int, delta: int, nc: int, ndim: int):
    """Neighbor values of the interior in dimension k (delta = -1 or +1):
    returns [n] + [nc]^ndim view of B."""
    sl = [slice(1, nc + 1)] * ndim
    sl[k] = slice(1 + delta, nc + 1 + delta)
    return B[(slice(None),) + tuple(sl)]


class LevelOp:
    """Operator coefficients for one level: center + 2*ndim neighbor
    coefficients, each broadcastable against [n] + [nc]^ndim blocks.

    Normal box: constant 3/5/7-point Laplacian - helmholtz_lambda
    (mg_box_lpl_stencil, ``m_af_multigrid.f90:1227-1245``); cylindrical
    coordinates scale the radial couplings by the flux factors."""

    def __init__(self, tree: Tree, lvl: int, lam: float, lsf_data=None,
                 eps_data=None, pad: bool = False, trash: int = 0):
        ndim, nc = tree.ndim, tree.nc
        dr = tree.lvl_dr(lvl)
        inv_dr2 = 1.0 / dr**2
        ids = tree.lvl_ids[lvl - 1]
        c_nb = []
        for d in range(2 * ndim):
            # Python float, not np.float64: a NumPy scalar would promote
            # a traced f32 computation to emulated f64
            c_nb.append(float(inv_dr2[d // 2]))
        c0 = -2.0 * float(np.sum(inv_dr2)) - lam
        if tree.coord == "cyl":
            # radial flux factors per box (dim 0 is r)
            r0 = tree.box_r_min(ids)[:, 0]
            if len(ids) == 0:
                # phantom (empty) level: one synthetic finite row — the
                # padding repeats it, keeping the smoother's divisions by
                # the center coefficient finite on all-trash rows
                # (core/treepack.py phantom_levels)
                r0 = np.array([float(nc) * dr[0]])
            i = np.arange(1, nc + 1)
            r_cc = r0[:, None] + (i[None, :] - 0.5) * dr[0]  # [n, nc]
            rfac1 = (r_cc - 0.5 * dr[0]) / r_cc
            rfac2 = (r_cc + 0.5 * dr[0]) / r_cc
            shape = (len(r0), nc) + (1,) * (ndim - 1)
            c_lo = (rfac1 * c_nb[0]).reshape(shape)
            c_hi = (rfac2 * c_nb[1]).reshape(shape)
            c0 = c0 - (c_lo - c_nb[0]) - (c_hi - c_nb[1])
            c_nb[0] = c_lo
            c_nb[1] = c_hi
        self.f = None           # rhs boundary-correction factor [n]+[nc]^d
        self.bc_coeff = None    # per-cell boundary-potential multiplier
        self.veps = None        # per-box variable-eps flag
        if eps_data is not None:
            # variable-permittivity operator (mg_box_lpld_stencil,
            # m_af_multigrid.f90:1476-1560): harmonic-mean couplings
            # 2 eps0 eps_nb / (eps0 + eps_nb), cylindrical factors baked in
            eps = eps_data(lvl)  # [n, (nc+2)^ndim]
            if eps is not None:
                n = len(ids)
                bshape = (n,) + (nc + 2,) * ndim
                E = np.asarray(eps).reshape(bshape)
                itr = (slice(None),) + (slice(1, nc + 1),) * ndim
                e0 = E[itr]
                new_nb = []
                for d in range(2 * ndim):
                    delta = -1 if d % 2 == 0 else 1
                    sl = [slice(1, nc + 1)] * ndim
                    sl[d // 2] = slice(1 + delta, nc + 1 + delta)
                    enb = E[(slice(None),) + tuple(sl)]
                    base = inv_dr2[d // 2]
                    cvar = base * 2.0 * e0 * enb / (e0 + enb)
                    new_nb.append(cvar)
                if tree.coord == "cyl":
                    r0 = tree.box_r_min(ids)[:, 0]
                    i = np.arange(1, nc + 1)
                    r_cc = r0[:, None] + (i[None, :] - 0.5) * dr[0]
                    shape2 = (n, nc) + (1,) * (ndim - 1)
                    rf1 = ((r_cc - 0.5 * dr[0]) / r_cc).reshape(shape2)
                    rf2 = ((r_cc + 0.5 * dr[0]) / r_cc).reshape(shape2)
                    new_nb[0] = new_nb[0] * rf1
                    new_nb[1] = new_nb[1] * rf2
                c_nb = new_nb
                c0 = -sum(c_nb) - lam
                self.veps = np.array(
                    [np.max(np.asarray(eps[k])) - np.min(np.asarray(eps[k]))
                     > 1e-8 for k in range(n)])
        if lsf_data is not None:
            data = lsf_data.level_data(lvl)
            n_lsf = len(data["has_bnd"])
            if n_lsf == 0 and pad:
                # phantom (empty) level of an electrode run: ONE
                # synthetic no-boundary row (dd = 1 -> plain Laplacian
                # values) so the operator takes the per-cell ARRAY form
                # a real newborn boundary level will have — the padding
                # below repeats the finite row over the trash slots
                # (core/treepack.phantom_levels)
                C = nc ** ndim
                data = dict(data,
                            dd=np.ones((1, C, 2 * ndim)),
                            has_bnd=np.zeros(1, bool),
                            lsf_cc=np.ones((1, C)),
                            bc_coeff=np.ones((1, C)),
                            ids=np.zeros(1, np.int64))
                n_lsf = 1
            if len(data["has_bnd"]) and (data["has_bnd"].any()
                                         or len(ids) == 0):
                from .lsf import lsf_stencil_coefficients
                c0l, c_nbl, fl = lsf_stencil_coefficients(tree, lvl, data,
                                                          0.0)
                bshape = (n_lsf,) + (nc,) * ndim
                sel = data["has_bnd"].reshape((n_lsf,) + (1,) * ndim)
                c0 = np.where(sel, c0l.reshape(bshape), c0 + np.zeros(bshape))
                new_nb = []
                for d in range(2 * ndim):
                    new_nb.append(np.where(
                        sel, c_nbl[d].reshape(bshape),
                        c_nb[d] + np.zeros(bshape)))
                c_nb = new_nb
                self.f = np.where(sel, fl.reshape(bshape), 0.0)
                self.bc_coeff = data["bc_coeff"].reshape(bshape)
        # difference-form sum coefficient s = c0 + sum(c_nb), computed in
        # f64 BEFORE any f32 cast: the operator is applied as
        #   L(phi) = sum_d c_d (phi_d - phi_0) + s phi_0
        # which avoids the |phi|/dx^2-scale cancellation of the naive
        # sum (in f32 the naive residual stalls ~4 orders of magnitude
        # above the informative floor; measured on test_1d). For the
        # constant/cyl/eps operators s = -helmholtz_lambda exactly.
        self.c_sum = c0 + sum(c_nb)
        self.ids = np.asarray(ids, np.int32)
        if pad:
            # pad per-box coefficient rows so they align with the padded
            # level-id tables (core/treepack.py); padded rows repeat the
            # last real row (finite, only ever applied to the trash box)
            # same bucket key as LevelTables.ids: the padded operator
            # rows must align with the padded level-id tables
            nb = tp.bucket_hwm(tree, ("tb", lvl, "i"), len(self.ids))
            self.ids = tp.pad_ids(self.ids, nb, trash)
            c_nb = [tp.pad_rows(c, nb) if isinstance(c, np.ndarray)
                    and c.ndim > 0 else c for c in c_nb]
            if isinstance(c0, np.ndarray) and c0.ndim > 0:
                c0 = tp.pad_rows(c0, nb)
            if self.f is not None:
                self.f = tp.pad_rows(self.f, nb)
                self.bc_coeff = tp.pad_rows(self.bc_coeff, nb)
            if self.veps is not None:
                self.veps = np.concatenate(
                    [self.veps, np.zeros(nb - len(self.veps), bool)])
            if isinstance(self.c_sum, np.ndarray) and self.c_sum.ndim > 0:
                self.c_sum = tp.pad_rows(self.c_sum, nb)
        self.c_nb = c_nb
        self.c0 = c0
        self.per_box = ((tree.coord == "cyl") or (self.f is not None)
                        or (self.veps is not None))

    def _select(self, pos):
        """Restrict per-box coefficient arrays to a subset of the level's
        boxes, given their *positions* within the level's id list (needed
        when applying the operator to parents/leaves only; positions are
        precomputed per epoch in core.treepack.LevelTables so the traced
        path never needs a host-side search)."""
        if not self.per_box:
            return self.c0, self.c_nb, None, self.c_sum
        pos = sp.aix(pos)
        def sub(x):
            return x[pos] if (isinstance(x, np.ndarray) or not
                              np.isscalar(x)) and np.ndim(x) > 0 else x
        f = None
        if self.f is not None:
            f = self.f[pos] * self.bc_coeff[pos]
        return sub(self.c0), [sub(c) for c in self.c_nb], f, \
            sub(self.c_sum)

    def bc_corr(self, phi_b, pos=None):
        """Boundary-correction term f * bc_coeff * phi_b, or 0.0."""
        if self.f is None:
            return 0.0
        if pos is None:
            return self.f * self.bc_coeff * phi_b
        pos = sp.aix(pos)
        return self.f[pos] * self.bc_coeff[pos] * phi_b

    @staticmethod
    def _cst(a, like):
        """Cast NumPy f64 coefficient arrays to the operand dtype so a
        traced f32 computation is not promoted to emulated f64."""
        if isinstance(a, (np.ndarray, np.generic)) and not isinstance(like, np.ndarray):
            return np.asarray(a).astype(like.dtype)
        return a

    def apply(self, B, nc: int, ndim: int, pos=None, phi_b=0.0):
        """L(phi) - bc_correction on the interior: [n] + [nc]^ndim
        (stencil_apply_357 subtracts the boundary correction).

        Difference form (see ``c_sum``): the naive sum cancels terms of
        magnitude |phi|/dr^2 down to the much smaller rhs, which in f32
        leaves a residual floor ~4 orders of magnitude too high."""
        if pos is None:
            c_nb, c_sum = self.c_nb, self.c_sum
            corr = self.bc_corr(phi_b)
        else:
            _, c_nb, f, c_sum = self._select(pos)
            corr = self._cst(f, B) * phi_b if f is not None else 0.0
        B0 = B[(slice(None),) + tuple([slice(1, nc + 1)] * ndim)]
        out = self._cst(c_sum, B) * B0
        for d in range(2 * ndim):
            delta = -1 if d % 2 == 0 else 1
            out = out + self._cst(c_nb[d], B) * (
                _shift(B, d // 2, delta, nc, ndim) - B0)
        return out - self._cst(corr, B) if not np.isscalar(corr) else \
            out - corr

    def gsrb(self, B, R_int, redblack: int, nc: int, ndim: int,
             phi_b=0.0, mask=None):
        """One half red-black sweep; returns updated interior. The rhs is
        augmented with the boundary correction (stencil_gsrb_357). An
        explicit parity mask can be passed (used by the lax.scan smoother
        where the parity is a traced value).

        Delta update (algebraically identical to the classic
        ``(R - offdiag)/c0``): phi0 + (R - L(phi))/c0 with L in
        difference form, which is f32-safe (see ``apply``)."""
        xp = _xp(B) if not isinstance(B, np.ndarray) else np
        lphi = self.apply(B, nc, ndim, phi_b=phi_b)
        old = B[(slice(None),) + tuple([slice(1, nc + 1)] * ndim)]
        new = old + (R_int - lphi) / self._cst(self.c0, B)
        if mask is None:
            mask = _parity_mask(ndim, nc, redblack)
        return xp.where(mask[None], new, old)


class Multigrid:
    """FAS multigrid solver bound to a (tree, variable set, BC spec)."""

    def __init__(self, tree: Tree, i_phi: int, i_rhs: int, i_tmp: int,
                 sides_bc: Callable, helmholtz_lambda: float = 0.0,
                 n_cycle_down: int = 2, n_cycle_up: int = 2,
                 subtract_mean: bool = False, lsf_data=None,
                 eps_data=None):
        self.tree = tree
        self.i_phi, self.i_rhs, self.i_tmp = i_phi, i_rhs, i_tmp
        self.sides_bc = sides_bc
        self.lam = helmholtz_lambda
        self.n_cycle_down = n_cycle_down
        self.n_cycle_up = n_cycle_up
        self.subtract_mean = subtract_mean
        self.lsf_data = lsf_data
        self.eps_data = eps_data
        self.surfaces = None  # wired by the driver when use_dielectric
        self._ops: Dict = {}
        self._coarse: Optional[CoarseSolver] = None
        self._coarse_epoch = -1
        # ambient epoch pack: set while tracing a compiled unit so every
        # topology read below comes from the traced jit arguments.
        # THREAD-LOCAL (see the property block below the class): the
        # driver warms next-level executables by tracing in a background
        # thread concurrently with main-thread traces (driver._warm_*)
        self._pack_tls = _threading.local()
        self._pack = None
        self._pack_ops = None
        self._pack_sm = None
        self._pack_extras = None
        self._pack_blocks = None
        self._pack_surf = None
        self._jit_units: Dict = {}

    # ----------------------------------------------------------- plumbing
    def _op(self, lvl: int) -> LevelOp:
        if self._pack_ops is not None:
            return self._pack_ops[lvl - 1]
        key = (self.tree.epoch, lvl)
        if key not in self._ops:
            self._ops = {k: v for k, v in self._ops.items()
                         if k[0] == self.tree.epoch}
            self._ops[key] = LevelOp(self.tree, lvl, self.lam,
                                     self.lsf_data, self.eps_data)
        return self._ops[key]

    def _gc_plan(self, lvl: int):
        if self._pack is not None:
            return self._pack.gc[lvl - 1]
        return gc.get_gc_plan(self.tree, lvl)

    def _pr_plan(self, lvl: int):
        if self._pack is not None:
            return self._pack.pr[lvl - 1]
        return pr.get_full_plan(self.tree, lvl)

    def _tb(self, lvl: int) -> tp.LevelTables:
        if self._pack is not None:
            return self._pack.tables[lvl - 1]
        return tp.get_level_tables(self.tree, lvl)

    def _n_levels(self) -> int:
        if self._pack is not None:
            return self._pack.n_levels
        return self.tree.highest_lvl

    def coarse_solver(self) -> CoarseSolver:
        # level 1 never changes, so build once
        if self._coarse is None:
            # per-cell level-1 operator needed for electrodes AND for
            # variable permittivity — the dense solve must use the same
            # stencil as the fine-grid smoother or FAS stalls
            op1 = (self._op(1) if (self.lsf_data is not None
                                   or self.eps_data is not None) else None)
            self._coarse = make_coarse_solver(self.tree, self.sides_bc,
                                              self.lam, level1_op=op1)
        return self._coarse

    def _veps_mask(self, lvl: int, plan):
        veps = None
        if self._pack is not None:
            if self._pack_extras is not None:
                return self._pack_extras[lvl - 1]["veps"]
            return None
        if self.eps_data is not None:
            op = self._op(lvl)
            if op.veps is not None:
                # boxes with variable eps use extrapolating rb ghosts
                # (mg_auto_rb -> mg_sides_rb_extrap)
                pos = {int(b): k for k, b in enumerate(op.ids)}
                veps = {}
                for d, pd in enumerate(plan.dirs):
                    if len(pd.rb_ids):
                        veps[d] = np.array(
                            [op.veps[pos[int(b)]] for b in pd.rb_ids])
        return veps

    def _gc_lvl(self, cc, lvl: int, params, corners: bool = True):
        plan = self._gc_plan(lvl)
        veps = self._veps_mask(lvl, plan)
        return gc.fill_ghosts_lvl(cc, plan, [self.i_phi], gc.RB_MG,
                                  self.sides_bc, params, corners=corners,
                                  rb_extrap_mask=veps)

    def fill_ghosts_phi(self, cc, params):
        for lvl in range(1, self._n_levels() + 1):
            cc = self._gc_lvl(cc, lvl, params)
        return cc

    # ------------------------------------------------------------- pieces
    def _gsrb_boxes(self, cc, lvl: int, n_cycle: int, params,
                    up_cycle: bool):
        t = self.tree
        nc, ndim = t.nc, t.ndim
        ids = self._tb(lvl).ids
        op = self._op(lvl)
        R = blocks(cc, self.i_rhs, ids, nc, ndim)
        R_int = R[(slice(None),) + tuple([slice(1, nc + 1)] * ndim)]
        phi_b = params.get("lsf_phi_b", 0.0)
        n_half = 2 * n_cycle

        def half_sweep(cc, n, mask, corners):
            B = blocks(cc, self.i_phi, ids, nc, ndim)
            new_int = op.gsrb(B, R_int, n, nc, ndim, phi_b, mask=mask)
            cc = scatter_interior(cc, self.i_phi, ids, new_int, nc, ndim)
            # ghost exchange after each half sweep (gsrb_boxes :666-685);
            # corners only stored on the final upward half sweep
            return self._gc_lvl(cc, lvl, params, corners=corners)

        if isinstance(cc, np.ndarray):
            for n in range(1, n_half + 1):
                cc = half_sweep(cc, n, None,
                                up_cycle and (n == n_half))
            return cc

        # Pallas fast path (2D, f32, TPU): the whole half sweep is two
        # fused kernels (red-black update + ghost exchange) instead of
        # ~50 small XLA ops (ops/pallas_smoother.py)
        interp = os.environ.get("AFIVO_PALLAS", "") == "interpret"
        if self._pack is None and ndim in (2, 3) and (interp or (
                cc.dtype == jnp.float32
                and jax.default_backend() == "tpu"
                and os.environ.get("AFIVO_PALLAS", "1") != "0")):
            from ..ops.pallas_smoother import (PallasSmoother2D,
                                               PallasSmoother3D)
            plan = gc.get_gc_plan(t, lvl)
            veps = self._veps_mask(lvl, plan)
            bc_key = tuple(
                (d, self.sides_bc(self.i_phi, d, p.bc_coords, params)[0])
                for d, p in enumerate(plan.dirs) if len(p.bc_ids))
            emkey = None if veps is None else tuple(
                sorted((d, m.tobytes()) for d, m in veps.items()))
            cache = self.__dict__.setdefault("_pallas_sm", {})
            key = (t.epoch, lvl, bc_key, emkey)
            cache_clean = {k: v for k, v in cache.items()
                           if k[0] == t.epoch}
            if key not in cache_clean:
                cls = PallasSmoother2D if ndim == 2 else PallasSmoother3D
                cache_clean[key] = cls(
                    t, lvl, op, self.sides_bc, params, veps,
                    i_phi=self.i_phi)
            self._pallas_sm = cache_clean
            sm = cache_clean[key]
            A, R_blk = sm.build_consts(cc, self.i_phi, self.i_rhs, params,
                                       phi_b)
            C = nc + 2
            idsj = jnp.asarray(sp.aix(ids))
            # the smoothing runs on level-local blocks (same-level
            # neighbors are on this level): one gather at visit start,
            # one scatter at the end
            phi_l = cc[self.i_phi, idsj].reshape((len(ids),) + (C,) * ndim)
            masks = jnp.asarray(np.stack(
                [_parity_mask(ndim, nc, n).astype(np.float32)
                 for n in range(1, n_half + 1)]))

            def body(p_l, mask):
                p_l = sm.sweep(p_l, R_blk, mask, interpret=interp)
                p_l = sm.fill(p_l, A, interpret=interp)
                return p_l, None

            phi_l, _ = jax.lax.scan(body, phi_l, masks)
            cc = cc.at[self.i_phi, idsj].set(
                phi_l.reshape(len(ids), -1))
            if up_cycle:
                # corner ghosts stored on the final upward half sweep
                cc = gc.fill_corners_lvl(cc, plan, [self.i_phi])
            return cc

        # pack-mode Pallas fast path (2D): same fused kernels, with the
        # neighbor-row/ghost-weight tables as *runtime* pack arguments so
        # refinement epochs with equal bucket shapes reuse the kernels
        sm = (self._pack_sm[lvl - 1]
              if self._pack is not None and self._pack_sm is not None
              else None)
        if sm is not None and (interp or (
                cc.dtype == jnp.float32
                and jax.default_backend() == "tpu"
                and os.environ.get("AFIVO_PALLAS", "1") != "0")):
            plan = self._gc_plan(lvl)
            tb = self._tb(lvl)
            A, R_blk = sm.build_consts(cc, self.i_phi, self.i_rhs, plan,
                                       tb, op, self.sides_bc, params)
            cs = sm.make_cs(op, cc.dtype)
            C = nc + 2
            idsj = jnp.asarray(sp.aix(tb.ids))
            phi_l = cc[self.i_phi, idsj].reshape((sm.n,) + (C,) * ndim)
            masks = jnp.asarray(np.stack(
                [_parity_mask(ndim, nc, nn).astype(np.float32)
                 for nn in range(1, n_half + 1)]))

            def pbody(p_l, mask):
                p_l = sm.sweep(p_l, R_blk, mask, cs, interpret=interp)
                p_l = sm.fill(p_l, A, interpret=interp)
                return p_l, None

            phi_l, _ = jax.lax.scan(pbody, phi_l, masks)
            cc = cc.at[self.i_phi, idsj].set(phi_l.reshape(sm.n, -1))
            if up_cycle:
                # corner ghosts stored on the final upward half sweep
                cc = gc.fill_corners_lvl(cc, plan, [self.i_phi])
            return cc

        # traced: scan over the first half sweeps (one traced body), with
        # the final sweep outside the scan (it may store corner ghosts)
        if n_half > 1:
            masks = jnp.asarray(np.stack(
                [_parity_mask(ndim, nc, n) for n in range(1, n_half)]))

            def body(c, mask):
                return half_sweep(c, 0, mask, False), None

            cc, _ = jax.lax.scan(body, cc, masks)
        cc = half_sweep(cc, n_half, None, up_cycle)
        return cc

    def _residual_blocks(self, cc, lvl: int, ids, phi_b=0.0, pos=None):
        t = self.tree
        nc, ndim = t.nc, t.ndim
        op = self._op(lvl)
        B = blocks(cc, self.i_phi, ids, nc, ndim)
        R = blocks(cc, self.i_rhs, ids, nc, ndim)
        R_int = R[(slice(None),) + tuple([slice(1, nc + 1)] * ndim)]
        return R_int - op.apply(B, nc, ndim, pos=pos, phi_b=phi_b)

    def set_residual_tmp(self, cc, max_lvl: Optional[int] = None,
                         phi_b=0.0):
        """Store rhs - L(phi) in i_tmp on all levels (residual_box)."""
        t = self.tree
        max_lvl = max_lvl or self._n_levels()
        for lvl in range(1, max_lvl + 1):
            ids = self._tb(lvl).ids
            res = self._residual_blocks(cc, lvl, ids, phi_b)
            cc = scatter_interior(cc, self.i_tmp, ids, res, t.nc, t.ndim)
        return cc

    def max_abs_residual(self, cc, max_lvl: Optional[int] = None,
                         phi_b=0.0):
        """max |rhs - L(phi)| over the *leaves* (the reference's
        af_tree_maxabs_cc reduction loops leaves only,
        ``m_af_utils.f90:773-784``); padded leaf slots are masked out."""
        t = self.tree
        max_lvl = max_lvl or self._n_levels()
        xp = np if isinstance(cc, np.ndarray) else jnp
        m = 0.0
        for lvl in range(1, max_lvl + 1):
            tb = self._tb(lvl)
            # shape-based emptiness: the true counts are NOT in the
            # traced pytree (they change every growth epoch -> retrace)
            if len(tb.leaves) == 0:
                continue
            res = self._residual_blocks(cc, lvl, tb.leaves, phi_b,
                                        pos=tb.leaves_pos)
            res = xp.abs(res)
            if self._pack is not None and self._pack.pad:
                valid = tb.leaf_valid.reshape(
                    (len(tb.leaves),) + (1,) * t.ndim)
                res = xp.where(valid > 0, res, 0.0)
            m = xp.maximum(m, xp.max(res))
        return m

    def residual_all_levels(self, cc, phi_b=0.0):
        """Traced pack path: store rhs - L(phi) in i_tmp on ALL levels and
        return the masked max |residual| over the leaves, as ONE batched
        gather/stencil/scatter/reduce instead of ~10 small ops per level
        (pack mode has no LSF/eps operators, so the only per-level data
        are the stencil coefficients, broadcast and concatenated here)."""
        t = self.tree
        nc, ndim = t.nc, t.ndim
        n_lvls = self._n_levels()
        dtype = cc.dtype
        ids_parts = []
        c0p, csp = [], []
        cnbp = [[] for _ in range(2 * ndim)]
        leaf_rows, leaf_valid = [], []
        off = 0
        for lvl in range(1, n_lvls + 1):
            tb = self._tb(lvl)
            op = self._op(lvl)
            ids_l = jnp.asarray(sp.aix(tb.ids))
            n_l = len(tb.ids)
            shape = (n_l,) + (nc,) * ndim
            ids_parts.append(ids_l)
            c0p.append(jnp.broadcast_to(
                jnp.asarray(op.c0).astype(dtype), shape))
            csp.append(jnp.broadcast_to(
                jnp.asarray(op.c_sum).astype(dtype), shape))
            for d in range(2 * ndim):
                cnbp[d].append(jnp.broadcast_to(
                    jnp.asarray(op.c_nb[d]).astype(dtype), shape))
            if len(tb.leaves):
                leaf_rows.append(off + jnp.asarray(sp.aix(tb.leaves_pos)))
                leaf_valid.append(jnp.asarray(tb.leaf_valid))
            off += n_l
        ids = jnp.concatenate(ids_parts)
        cs = jnp.concatenate(csp)
        cnb = [jnp.concatenate(c) for c in cnbp]
        B = blocks(cc, self.i_phi, ids, nc, ndim)
        R = blocks(cc, self.i_rhs, ids, nc, ndim)
        itr = (slice(None),) + (slice(1, nc + 1),) * ndim
        B0 = B[itr]
        lphi = cs * B0
        for d in range(2 * ndim):
            delta = -1 if d % 2 == 0 else 1
            lphi = lphi + cnb[d] * (_shift(B, d // 2, delta, nc, ndim)
                                    - B0)
        res = R[itr] - lphi
        cc = scatter_interior(cc, self.i_tmp, ids, res, nc, ndim)
        lr = jnp.concatenate(leaf_rows)
        lv = jnp.concatenate(leaf_valid)
        leafres = jnp.abs(res.reshape(res.shape[0], -1)[lr])
        leafres = jnp.where(lv.reshape(-1, 1) > 0, leafres, 0.0)
        return cc, jnp.max(leafres)

    def _update_coarse(self, cc, lvl: int, params):
        """FAS coarse-grid setup (update_coarse, ``:691-738``)."""
        t = self.tree
        nc, ndim = t.nc, t.ndim
        ids = self._tb(lvl).ids
        phi_b = params.get("lsf_phi_b", 0.0)
        # residual of all boxes at lvl -> restrict into parents' i_tmp
        res = self._residual_blocks(cc, lvl, ids, phi_b)
        # write residual into a scratch: use i_tmp of the *fine* boxes
        # transiently (restored implicitly since we recompute later)
        plan = self._pr_plan(lvl)
        # stage: put residual into tmp on fine level, restrict tmp & phi
        saved_tmp = cc[self.i_tmp, sp.aix(ids)].copy() \
            if isinstance(cc, np.ndarray) else cc[self.i_tmp, sp.aix(ids)]
        cc = scatter_interior(cc, self.i_tmp, ids, res, nc, ndim)
        cc = pr.restrict(cc, plan, [self.i_tmp], use_geometry=True)
        cc = pr.restrict(cc, plan, [self.i_phi], use_geometry=False)
        # restore fine tmp (it holds phi_old for the correction step)
        if isinstance(cc, np.ndarray):
            cc[self.i_tmp, sp.aix(ids)] = saved_tmp
        else:
            cc = cc.at[self.i_tmp, jnp.asarray(sp.aix(ids))].set(saved_tmp)
        # ghost cells for the restricted phi
        cc = self._gc_lvl(cc, lvl - 1, params)
        # parents at lvl-1: rhs = L(phi) + restricted residual; tmp = phi
        tb_c = self._tb(lvl - 1)
        parents = tb_c.parents
        if len(parents):
            op = self._op(lvl - 1)
            B = blocks(cc, self.i_phi, parents, nc, ndim)
            T = blocks(cc, self.i_tmp, parents, nc, ndim)
            T_int = T[(slice(None),) + tuple([slice(1, nc + 1)] * ndim)]
            rhs_new = op.apply(B, nc, ndim, pos=tb_c.parents_pos,
                               phi_b=phi_b) + T_int
            cc = scatter_interior(cc, self.i_rhs, parents, rhs_new, nc, ndim)
            # store phi (incl. ghosts) in tmp
            if isinstance(cc, np.ndarray):
                cc[self.i_tmp, sp.aix(parents)] = cc[self.i_phi,
                                                     sp.aix(parents)]
            else:
                pidx = jnp.asarray(sp.aix(parents))
                cc = cc.at[self.i_tmp, pidx].set(cc[self.i_phi, pidx])
        return cc

    def _set_coarse_phi_rhs(self, cc, lvl: int, params):
        """FMG with guess: like update_coarse but without saving phi_old
        (set_coarse_phi_rhs, ``:741-777``)."""
        t = self.tree
        nc, ndim = t.nc, t.ndim
        ids = self._tb(lvl).ids
        if lvl == self._n_levels():
            cc = self._gc_lvl(cc, lvl, params)
        phi_b = params.get("lsf_phi_b", 0.0)
        res = self._residual_blocks(cc, lvl, ids, phi_b)
        plan = self._pr_plan(lvl)
        cc = scatter_interior(cc, self.i_tmp, ids, res, nc, ndim)
        cc = pr.restrict(cc, plan, [self.i_tmp], use_geometry=True)
        cc = pr.restrict(cc, plan, [self.i_phi], use_geometry=False)
        cc = self._gc_lvl(cc, lvl - 1, params)
        tb_c = self._tb(lvl - 1)
        parents = tb_c.parents
        if len(parents):
            op = self._op(lvl - 1)
            B = blocks(cc, self.i_phi, parents, nc, ndim)
            T = blocks(cc, self.i_tmp, parents, nc, ndim)
            T_int = T[(slice(None),) + tuple([slice(1, nc + 1)] * ndim)]
            rhs_new = op.apply(B, nc, ndim, pos=tb_c.parents_pos,
                               phi_b=phi_b) + T_int
            cc = scatter_interior(cc, self.i_rhs, parents, rhs_new, nc, ndim)
        return cc

    def _correct_children(self, cc, lvl: int):
        """phi += prolong(phi_c - phi_old_c) (correct_children, ``:624-646``);
        linear 2/4/8-point prolongation stencil
        (mg_box_prolong_linear_stencil, ``:1248-1266``)."""
        parents = self._tb(lvl - 1).parents
        if len(parents) == 0:
            return cc
        # corr = phi - tmp on the whole parent boxes (incl. ghosts)
        pidx = sp.aix(parents)
        corr = cc[self.i_phi, pidx] - cc[self.i_tmp, pidx]
        if isinstance(cc, np.ndarray):
            cc[self.i_tmp, pidx] = corr
        else:
            cc = cc.at[self.i_tmp, jnp.asarray(pidx)].set(corr)
        # prolong the correction (parents' tmp) additively into the
        # children's phi; children's tmp (their own phi_old) is untouched
        plan = self._pr_plan(lvl)
        cc = pr.prolong(cc, plan, [self.i_tmp], "linear", add=True,
                        ivs_to=[self.i_phi])
        return cc

    def _solve_coarse(self, cc, params):
        cs = self.coarse_solver()
        cc = cs.solve(cc, self.i_phi, self.i_rhs, params)
        return self._gc_lvl(cc, 1, params)

    # -------------------------------------------------------------- cycles
    def fas_vcycle(self, cc, params=None, set_residual: bool = False,
                   highest_lvl: Optional[int] = None):
        """One FAS V-cycle (mg_fas_vcycle, ``:185-264``)."""
        t = self.tree
        params = params or {}
        max_lvl = highest_lvl or self._n_levels()
        for lvl in range(max_lvl, 1, -1):
            cc = self._gsrb_boxes(cc, lvl, self.n_cycle_down, params,
                                  up_cycle=False)
            cc = self._update_coarse(cc, lvl, params)
        cc = self._solve_coarse(cc, params)
        for lvl in range(2, max_lvl + 1):
            cc = self._correct_children(cc, lvl)
            cc = self._gc_lvl(cc, lvl, params)
            cc = self._gsrb_boxes(cc, lvl, self.n_cycle_up, params,
                                  up_cycle=True)
        if set_residual:
            cc = self.set_residual_tmp(cc, max_lvl,
                                       params.get("lsf_phi_b", 0.0))
        return cc

    def fas_fmg(self, cc, params=None, set_residual: bool = False,
                have_guess: bool = True):
        """FAS full multigrid cycle (mg_fas_fmg, ``:137-180``)."""
        t = self.tree
        params = params or {}
        n_levels = self._n_levels()
        if have_guess:
            for lvl in range(n_levels, 1, -1):
                cc = self._set_coarse_phi_rhs(cc, lvl, params)
        else:
            # init_phi_rhs: phi = 0 everywhere, restrict rhs down
            allids = np.concatenate(
                [np.asarray(self._tb(l).ids) for l in range(1, n_levels + 1)]
            ) if self._pack is None else jnp.concatenate(
                [jnp.asarray(sp.aix(self._tb(l).ids))
                 for l in range(1, n_levels + 1)])
            if isinstance(cc, np.ndarray):
                cc[self.i_phi, allids] = 0.0
            else:
                cc = cc.at[self.i_phi, jnp.asarray(allids)].set(0.0)
            for lvl in range(n_levels, 1, -1):
                plan = self._pr_plan(lvl)
                cc = pr.restrict(cc, plan, [self.i_rhs], use_geometry=True)
        # level 1
        ids1 = sp.aix(self._tb(1).ids)
        if isinstance(cc, np.ndarray):
            cc[self.i_tmp, ids1] = cc[self.i_phi, ids1]
        else:
            cc = cc.at[self.i_tmp, jnp.asarray(ids1)].set(
                cc[self.i_phi, jnp.asarray(ids1)])
        cc = self.fas_vcycle(cc, params,
                             set_residual and n_levels == 1,
                             highest_lvl=1)
        for lvl in range(2, n_levels + 1):
            ids = sp.aix(self._tb(lvl).ids)
            if isinstance(cc, np.ndarray):
                cc[self.i_tmp, ids] = cc[self.i_phi, ids]
            else:
                cc = cc.at[self.i_tmp, jnp.asarray(ids)].set(
                    cc[self.i_phi, jnp.asarray(ids)])
            cc = self._correct_children(cc, lvl)
            cc = self._gc_lvl(cc, lvl, params)
            cc = self.fas_vcycle(cc, params,
                                 set_residual and lvl == n_levels,
                                 highest_lvl=lvl)
        return cc

    # ---------------------------------------------------- field utilities
    def _all_level_ids(self):
        """Concatenated per-level id tables + per-box 1/dr factors.

        One table for the whole tree turns per-level gradient/norm loops
        into a single gather/compute/scatter per dimension — at 9 AMR
        levels this removes ~90% of the kernel launches of the
        latency-bound from_potential path on TPU. Per-level segment
        lengths are static per epoch shape (bucketed), and dr depends
        only on the level number, so the 1/dr vector is a compile-time
        constant even when the id tables are runtime pack arguments."""
        t = self.tree
        n_lvls = self._n_levels()
        per_lvl = [sp.aix(self._tb(l).ids) for l in range(1, n_lvls + 1)]
        if isinstance(per_lvl[0], np.ndarray):
            ids = np.concatenate(per_lvl)
        else:
            ids = jnp.concatenate(per_lvl)
        inv_dr = np.concatenate([
            np.repeat(1.0 / np.asarray(t.lvl_dr(l), np.float64)[None, :],
                      len(per_lvl[l - 1]), axis=0)
            for l in range(1, n_lvls + 1)])  # [N, ndim]
        return ids, inv_dr

    def compute_phi_gradient(self, cc, fc, i_fc: int, fac: float):
        """fc = fac * grad(phi) on all boxes (mg_compute_phi_gradient /
        mg_box_lpl_gradient, ``m_af_multigrid.f90:1837-1974``)."""
        t = self.tree
        nc, ndim = t.nc, t.ndim
        ids, inv_dr = self._all_level_ids()
        if not isinstance(cc, np.ndarray):
            inv_dr = inv_dr.astype(cc.dtype)
        B = blocks(cc, self.i_phi, ids, nc, ndim)
        bshape = (slice(None),) + (None,) * ndim
        for d in range(ndim):
            lo = [slice(0, nc + 1) if k == d else slice(1, nc + 1)
                  for k in range(ndim)]
            hi = [slice(1, nc + 2) if k == d else slice(1, nc + 1)
                  for k in range(ndim)]
            g = (float(fac) * inv_dr[:, d][bshape]
                 * (B[(slice(None),) + tuple(hi)]
                    - B[(slice(None),) + tuple(lo)]))
            fc = ro.fc_set_faces(fc, i_fc, d, ids, g, nc, ndim)
        return fc

    def compute_field_norm(self, cc, fc, i_fc: int, i_norm: int):
        """Cell-centered norm of a face field (mg_box_field_norm,
        ``m_af_multigrid.f90:1995-2025``): average of the two faces."""
        t = self.tree
        nc, ndim = t.nc, t.ndim
        ids, _ = self._all_level_ids()
        acc = 0.0
        for d in range(ndim):
            F = ro.fc_get_faces(fc, i_fc, d, ids, nc, ndim)
            sl_lo = [slice(0, nc) if k == d else slice(None)
                     for k in range(ndim)]
            sl_hi = [slice(1, nc + 1) if k == d else slice(None)
                     for k in range(ndim)]
            acc = acc + (F[(slice(None),) + tuple(sl_lo)]
                         + F[(slice(None),) + tuple(sl_hi)]) ** 2
        xp = np if isinstance(cc, np.ndarray) else jnp
        norm = 0.5 * xp.sqrt(acc)
        cc = scatter_interior(cc, i_norm, ids, norm, nc, ndim)
        return cc


# ---------------------------------------------------------------------------
# Compiled execution: jitted units over the epoch pack
# ---------------------------------------------------------------------------
def _tls_prop(name):
    """Thread-local instance attribute backed by ``self._pack_tls``: the
    ambient-pack slots are written inside traced closures, and the driver
    traces next-level warm executables in a background thread while the
    main thread keeps stepping (driver._warm_next_level)."""
    def fget(self):
        return getattr(self._pack_tls, name, None)

    def fset(self, v):
        setattr(self._pack_tls, name, v)
    return property(fget, fset)


for _n in ("_pack", "_pack_ops", "_pack_sm", "_pack_extras",
           "_pack_blocks", "_pack_surf"):
    setattr(Multigrid, _n, _tls_prop(_n))


def _mg_jit_mixin():
    """Attached below to keep the class body above readable."""


def _pack_and_ops(self, dtype=None):
    """(EpochPack, (padded LevelOps, PackSmoother tables)) for the
    current epoch. The smoother tables feed the fused Pallas half-sweep
    kernels in pack mode (2D; None where unsupported)."""
    pad, trash = self._jit_cfg
    t = self.tree
    gen_in = t.__dict__.get("_bucket_gen", 0)
    pack = tp.get_epoch_pack(t, pad=pad, trash=trash, dtype=dtype)
    cache = self._jit_units.setdefault("_ops_cache", {})
    dkey = None if dtype is None else np.dtype(dtype).str
    if cache.get("key") != (t.epoch, dkey):
        if pad and t.__dict__.get("_plan_put_batch") is None:
            # coalesce this epoch's missing op/smoother/block plans into
            # ONE device transfer (treepack.plan_transfer_batch), then
            # re-assemble from the device-resident cache
            with tp.plan_transfer_batch(t):
                _pack_and_ops(self, dtype=dtype)
            cache.clear()  # first pass may have cached host objects
        cache.clear()
        cache["key"] = (t.epoch, dkey)
        # per-level incremental caching (core/treepack.cached_plan): only
        # levels whose topology changed rebuild + device_put. The lsf/eps
        # operator contents are also topology-determined (electrode
        # geometry is fixed; eps prolongs deterministically into new
        # boxes), so the same fingerprint keys apply.
        has_lsf = self.lsf_data is not None
        has_eps = self.eps_data is not None
        fp = tp.level_fingerprint
        L = t.highest_lvl
        # a synchronized bucket doubling triggered mid-build (e.g. by the
        # lsf extras) changes every padded shape; restart so one aux is
        # one generation (mirrors treepack.build_epoch_pack) — mixing
        # generations would misalign the ops' padded rows against the
        # epoch pack's tables
        for _attempt in range(2):
            gen = t.__dict__.get("_bucket_gen", 0) if pad else -1
            base = (pad, trash, dkey, gen, float(self.lam), has_lsf,
                    has_eps)
            ops = tuple(
                tp.cached_plan(
                    t, ("mgop", l, fp(t, l)) + base,
                    lambda l=l: LevelOp(t, l, self.lam, self.lsf_data,
                                        self.eps_data, pad=pad,
                                        trash=trash),
                    dtype=dtype, device=True)
                for l in range(1, L + 1))
            sm = None
            if pad and t.ndim in (2, 3) and not (has_lsf or has_eps):
                from ..ops.pallas_smoother import (PackSmoother2D,
                                                   PackSmoother3D)
                cls = PackSmoother2D if t.ndim == 2 else PackSmoother3D
                # the smoother tables derive from the gc plan + level
                # tables; the builder re-creates host versions (the
                # pack's are already on device), which only runs for
                # changed levels
                smbase = base + (self.i_phi, id(self.sides_bc))
                sm = tuple(
                    tp.cached_plan(
                        t, ("mgsm", l, fp(t, l - 1), fp(t, l)) + smbase,
                        lambda l=l: cls(
                            t, l,
                            gc.GcLevelPlan(t, l, pad=pad, trash=trash),
                            tp.LevelTables(t, l, pad=pad, trash=trash),
                            self.sides_bc, self.i_phi, trash),
                        dtype=dtype, device=True)
                    for l in range(1, L + 1))
            blocks = None
            if sm is not None and t.ndim == 2:
                from .mg_blocks import LevelBlockPlan
                blocks = tuple(
                    tp.cached_plan(
                        t, ("mgblk", l, fp(t, l - 1), fp(t, l)) + base,
                        lambda l=l: LevelBlockPlan(t, l, pad=pad,
                                                   trash=trash),
                        dtype=dtype, device=True)
                    for l in range(1, L + 1))
            extras = None
            if has_lsf or has_eps:
                extras = tuple(
                    tp.cached_plan(
                        t, ("mgex", l, fp(t, l)) + base,
                        lambda l=l: _build_level_extras(self, l, pad,
                                                        trash),
                        dtype=dtype, device=True)
                    for l in range(1, L + 1))
            if not pad or t.__dict__.get("_bucket_gen", 0) == gen:
                break
        cache["blocks"] = blocks
        cache["ops"] = ops
        cache["sm"] = sm
        cache["extras"] = extras
        surf = None
        if self.surfaces is not None:
            from .surface import get_surface_pack
            surf = get_surface_pack(self.surfaces, pad, trash,
                                    dtype=dtype)
        cache["surf"] = surf
    if pad and t.__dict__.get("_bucket_gen", 0) != gen_in:
        # the aux build triggered a synchronized doubling AFTER the epoch
        # pack was fetched: drop the stale pack and re-fetch so pack and
        # aux share one shape generation
        t.__dict__.pop("_epoch_pack_cache", None)
        pack = tp.get_epoch_pack(t, pad=pad, trash=trash, dtype=dtype)
    return pack, (cache["ops"], cache["sm"], cache["extras"],
                  cache["blocks"], cache["surf"])


def _phantom_pack_and_ops(self, dtype=None):
    """(EpochPack, aux) with one PHANTOM level beyond ``highest_lvl`` —
    the structures the next refinement level will produce (see
    core/treepack.phantom_levels). Used by the driver to pre-compile the
    next level's fused-step executable in the background; never for
    production dispatch. Supports the constant/cylindrical operators AND
    the lsf/eps extras (the phantom level's side tables are min-bucketed
    empties, shaped like a real newborn level's) plus dielectric surface
    packs (their tables are per-direction, not per-level — a new level
    changes their shapes only through the shared bucket marks)."""
    pad, trash = self._jit_cfg
    t = self.tree
    has_lsf = self.lsf_data is not None
    has_eps = self.eps_data is not None
    dkey = None if dtype is None else np.dtype(dtype).str
    pack = tp.build_epoch_pack(t, pad=pad, trash=trash, with_gc2=False,
                               dtype=dtype, phantom=1)
    gen = t.__dict__.get("_bucket_gen", 0) if pad else -1
    base = (pad, trash, dkey, gen, float(self.lam), has_lsf, has_eps)
    fp = tp.level_fingerprint
    L = t.highest_lvl
    if has_lsf or has_eps:
        # make sure the REAL levels' extras bucket marks exist BEFORE the
        # phantom context mirrors level L's marks to level L+1 (otherwise
        # the phantom extras get the minimum floor while the real newborn
        # level inherits level L's bucket)
        for l in range(1, L + 1):
            tp.cached_plan(t, ("mgex", l, fp(t, l)) + base,
                           lambda l=l: _build_level_extras(self, l, pad,
                                                           trash),
                           dtype=dtype, device=True)
    with tp.phantom_levels(t, 1):
        ops = tuple(
            tp.cached_plan(
                t, ("mgop", l, fp(t, l)) + base,
                lambda l=l: LevelOp(t, l, self.lam, self.lsf_data,
                                    self.eps_data, pad=pad, trash=trash),
                dtype=dtype, device=True)
            for l in range(1, L + 2))
        sm = None
        if pad and t.ndim in (2, 3) and not (has_lsf or has_eps):
            from ..ops.pallas_smoother import (PackSmoother2D,
                                               PackSmoother3D)
            cls = PackSmoother2D if t.ndim == 2 else PackSmoother3D
            smbase = base + (self.i_phi, id(self.sides_bc))
            sm = tuple(
                tp.cached_plan(
                    t, ("mgsm", l, fp(t, l - 1), fp(t, l)) + smbase,
                    lambda l=l: cls(
                        t, l, gc.GcLevelPlan(t, l, pad=pad, trash=trash),
                        tp.LevelTables(t, l, pad=pad, trash=trash),
                        self.sides_bc, self.i_phi, trash),
                    dtype=dtype, device=True)
                for l in range(1, L + 2))
        blocks = None
        if sm is not None and t.ndim == 2:
            from .mg_blocks import LevelBlockPlan
            blocks = tuple(
                tp.cached_plan(
                    t, ("mgblk", l, fp(t, l - 1), fp(t, l)) + base,
                    lambda l=l: LevelBlockPlan(t, l, pad=pad,
                                               trash=trash),
                    dtype=dtype, device=True)
                for l in range(1, L + 2))
        extras = None
        if has_lsf or has_eps:
            extras = tuple(
                tp.cached_plan(
                    t, ("mgex", l, fp(t, l)) + base,
                    lambda l=l: _build_level_extras(self, l, pad, trash),
                    dtype=dtype, device=True)
                for l in range(1, L + 2))
    surf = None
    if self.surfaces is not None:
        # per-direction tables (no per-level pytree entries): the
        # production pack of this epoch already has the bucketed shapes
        # a one-level growth will keep
        from .surface import get_surface_pack
        surf = get_surface_pack(self.surfaces, pad, trash, dtype=dtype)
    return pack, (ops, sm, extras, blocks, surf)


def _build_level_extras(self, lvl: int, pad: bool, trash: int):
    """Per-epoch lsf/eps side tables carried as *runtime* jit arguments
    (baking them into the trace as constants would go stale when the
    topology changes under a cached executable):

    * ``veps``: per-direction refinement-boundary masks selecting the
      extrapolating ghost scheme for variable-eps boxes (mg_auto_rb ->
      mg_sides_rb_extrap, ``m_af_multigrid.f90:468-621``)
    * ``lsf``: boundary-distance tables of the leaf boxes containing the
      electrode boundary, for the one-sided E-gradient correction
      (mg_box_lpllsf_gradient, ``:2030-2122``)
    """
    t = self.tree
    out = {"veps": None, "lsf": None}
    if self.eps_data is not None:
        op = LevelOp(t, lvl, self.lam, None, self.eps_data)
        if op.veps is not None:
            plan = gc.GcLevelPlan(t, lvl)  # unpadded host plan
            pos = {int(b): k for k, b in enumerate(op.ids)}
            veps = {}
            for d, pd in enumerate(plan.dirs):
                m = (np.array([op.veps[pos[int(b)]] for b in pd.rb_ids])
                     if len(pd.rb_ids) else np.zeros(0, bool))
                if pad:
                    nb = tp.bucket_hwm(t, ("gc", lvl, d, "r"), len(m))
                    mm = np.zeros(nb, bool)
                    mm[:len(m)] = m
                    m = mm
                veps[d] = m
            out["veps"] = veps
    if self.lsf_data is not None:
        data = self.lsf_data.level_data(lvl)
        ids = data["ids"]
        leaf_set = set(int(b) for b in t.lvl_leaves[lvl - 1])
        sel = np.array([i for i, b in enumerate(ids)
                        if data["has_bnd"][i] and int(b) in leaf_set],
                       np.int64)
        boxes = ids[sel].astype(np.int32)
        dd = data["dd"][sel]
        lsf_cc = data["lsf_cc"][sel]
        bc_coeff = data["bc_coeff"][sel]
        valid = np.ones(len(sel))
        if pad:
            nb = tp.bucket_hwm(t, ("lsfg", lvl), len(sel))
            boxes = tp.pad_ids(boxes, nb, trash)
            # padded rows: distance 1 (= no boundary) masks them out
            dd = np.concatenate(
                [dd, np.ones((nb - len(sel),) + dd.shape[1:])]) \
                if nb > len(sel) else dd
            lsf_cc = np.concatenate(
                [lsf_cc, -np.ones((nb - len(sel),) + lsf_cc.shape[1:])]) \
                if nb > len(sel) else lsf_cc
            bc_coeff = np.concatenate(
                [bc_coeff, np.zeros((nb - len(sel),) + bc_coeff.shape[1:])]) \
                if nb > len(sel) else bc_coeff
            v = np.zeros(nb)
            v[:len(sel)] = 1.0
            valid = v
        out["lsf"] = dict(boxes=boxes, dd=dd, lsf_cc=lsf_cc,
                          bc_coeff=bc_coeff, valid=valid)
    return out


def enable_jit(self, pad: bool = True, trash: int = 0):
    """Route device-array cycle calls through jitted units that take the
    epoch pack as a runtime argument: refinement epochs whose bucketed
    table shapes match reuse the compiled executables (no retrace).
    Supports the constant/cylindrical/variable-eps/LSF operators; the
    per-epoch lsf/eps data rides along as runtime arguments (see
    _build_level_extras)."""
    if getattr(self, "_jit_cfg", None) != (pad, trash):
        # the trash row index is baked into the traced closures
        self._jit_units.clear()
    self._jit_cfg = (pad, trash)
    self.coarse_solver()  # build level-1 solver outside any trace


@contextmanager
def ambient_packs(mg, pack, aux):
    """Install an epoch pack + per-level ops on ``mg`` for the duration
    of a trace; every traced multigrid body (fas_vcycle, residuals, the
    smoother) reads these ambient attributes instead of rebuilding host
    tables. Shared by _run_unit, the fused production step
    (driver._fused_fn) and the fused refinement-epoch epilogue."""
    ops, sm, extras, blocks, surf = aux
    old = (mg._pack, mg._pack_ops, mg._pack_sm, mg._pack_extras,
           mg._pack_blocks, mg._pack_surf)
    (mg._pack, mg._pack_ops, mg._pack_sm, mg._pack_extras,
     mg._pack_blocks, mg._pack_surf) = (pack, ops, sm, extras, blocks,
                                        surf)
    try:
        yield
    finally:
        (mg._pack, mg._pack_ops, mg._pack_sm, mg._pack_extras,
         mg._pack_blocks, mg._pack_surf) = old


def _run_unit(self, name, body, cc, params, *extra):
    """Dispatch a jitted unit: body(cc, scal, *extra) with the ambient
    pack set during tracing."""
    pack, aux = _pack_and_ops(self, dtype=cc.dtype)
    # only the scalars the field path reads: a varying key set (e.g. the
    # integrator's dt_stiff) would change the pytree structure -> retrace
    scal = {k: v for k, v in (params or {}).items()
            if k in ("voltage", "lsf_phi_b") and np.ndim(v) == 0}
    if name not in self._jit_units:
        mgself = self
        pad, trash = self._jit_cfg

        def traced(cc, scal, pack, aux, *extra):
            with ambient_packs(mgself, pack, aux):
                if pad:
                    cc = cc.at[:, trash].set(0.0)
                return body(cc, scal, *extra)

        self._jit_units[name] = jax.jit(traced)
    return self._jit_units[name](cc, scal, pack, aux, *extra)


def jit_vcycle_res(self, cc, params):
    """One FAS V-cycle + masked max |residual| over the leaves."""
    def body(cc, scal):
        phi_b = scal.get("lsf_phi_b", 0.0)
        from . import mg_blocks as mgb
        if mgb.blocks_path_active(self, cc):
            import os
            interp = os.environ.get("AFIVO_PALLAS", "") == "interpret"
            P, R = mgb.gather_levels(self, cc)
            P, R = mgb.fas_vcycle_blocks(self, P, R, scal, interp)
            res = mgb.max_leaf_residual_blocks(self, P, R)
            cc = mgb.scatter_phi(self, cc, P)
            return cc, res
        if self.lsf_data is None and self.eps_data is None:
            cc = self.fas_vcycle(cc, scal, set_residual=False)
            return self.residual_all_levels(cc, phi_b)
        cc = self.fas_vcycle(cc, scal, set_residual=True)
        res = self.max_abs_residual(cc, phi_b=phi_b)
        return cc, res
    return self._run_unit("vcycle_res", body, cc, params)


def jit_fmg_res(self, cc, params):
    """One FMG cycle (with guess) + masked max |residual|."""
    def body(cc, scal):
        cc = self.fas_fmg(cc, scal, set_residual=True, have_guess=True)
        res = self.max_abs_residual(cc, phi_b=scal.get("lsf_phi_b", 0.0))
        return cc, res
    return self._run_unit("fmg_res", body, cc, params)


def jit_max_abs_leaves(self, cc, iv: int):
    """Masked max |cc[iv]| over leaf interiors (af_tree_maxabs_cc),
    batched over ALL levels in one gather + one reduction."""
    def body(cc, scal):
        nc, ndim = self.tree.nc, self.tree.ndim
        tbs = [self._tb(l) for l in range(1, self._n_levels() + 1)]
        tbs = [t for t in tbs if len(t.leaves)]
        if not tbs:
            return jnp.asarray(0.0, cc.dtype)
        leaves = jnp.concatenate([jnp.asarray(sp.aix(t.leaves))
                                  for t in tbs])
        valid = jnp.concatenate([jnp.asarray(t.leaf_valid) for t in tbs])
        B = blocks(cc, iv, leaves, nc, ndim)
        B = B[(slice(None),) + (slice(1, nc + 1),) * ndim]
        B = jnp.where(valid.reshape((-1,) + (1,) * ndim) > 0,
                      jnp.abs(B), 0.0)
        return jnp.max(B)
    return self._run_unit(f"maxabs_{iv}", body, cc, None)


Multigrid._pack_and_ops = _pack_and_ops
Multigrid._phantom_pack_and_ops = _phantom_pack_and_ops
Multigrid.enable_jit = enable_jit
Multigrid._run_unit = _run_unit
Multigrid.jit_vcycle_res = jit_vcycle_res
Multigrid.jit_fmg_res = jit_fmg_res
Multigrid.jit_max_abs_leaves = jit_max_abs_leaves

tp.register_level_op()
