"""Direct coarse-grid solver for multigrid level 1.

Replaces the reference's HYPRE bridge (``afivo/src/m_coarse_solver.f90``:
the level-1 composite grid is assembled into a HYPRE StructMatrix and solved
with SMG/PFMG). Here the level-1 grid — which is tiny in practice (8x8 to a
few thousand cells; it never changes during a run) — is assembled once into
a dense matrix with the boundary conditions eliminated, and solved by a
precomputed inverse: on TPU the solve is then a single matrix-vector product
on the MXU, fully fused into the V-cycle.

Supports constant Laplacian/Helmholtz operators (with cylindrical radial
factors) and per-cell variable stencils (level-set electrodes), whose
eliminated internal-boundary couplings contribute a voltage-proportional
right-hand-side correction (mirroring hypre_set_matrix / bc_to_rhs,
``m_coarse_solver.f90:104-194``).
"""

from __future__ import annotations

import itertools
from typing import Callable, List, Optional

import numpy as np
import jax.numpy as jnp

from ..core import spatial as sp
from ..core.tree import Tree, neighb_dim, neighb_low
from ..core.ghostcell import (BC_DIRICHLET, BC_NEUMANN, BC_CONTINUOUS,
                              BC_DIRICHLET_COPY, bc_to_ghost)

_MAX_DENSE = 32768  # beyond this a dense inverse is unreasonable


def make_coarse_solver(tree: Tree, sides_bc: Callable, lam: float = 0.0,
                       i_probe_var: int = 0, level1_op=None):
    """Coarse-solver factory (coarse_solver_initialize / method auto-choice,
    ``m_coarse_solver.f90:91-99``): small composite grids are assembled once
    into a dense inverse (a single MXU matvec per solve); large constant/
    cylindrical-operator grids get a geometric multigrid on the uniform
    level-1 grid (the analog of HYPRE PFMG on big coarse grids)."""
    N = int(np.prod(tree.coarse_grid_size))
    if N > _MAX_DENSE and level1_op is None:
        return UniformCoarseMG(tree, sides_bc, lam, i_probe_var)
    return CoarseSolver(tree, sides_bc, lam, i_probe_var, level1_op)


class CoarseSolver:
    def __init__(self, tree: Tree, sides_bc: Callable, lam: float = 0.0,
                 i_probe_var: int = 0, level1_op=None):
        self.tree = tree
        self.sides_bc = sides_bc
        ndim, nc = tree.ndim, tree.nc
        cgs = tree.coarse_grid_size  # cells per dim at level 1
        N = int(np.prod(cgs))
        if N > _MAX_DENSE:
            raise NotImplementedError(
                f"coarse grid with {N} unknowns too large for a dense "
                "solve with a per-cell (electrode/eps) level-1 operator; "
                "reduce coarse_grid_size")
        self.shape = tuple(int(x) for x in cgs)
        dr = tree.dr_base
        inv_dr2 = 1.0 / dr**2

        # gather map: rows of each level-1 box's interior cells
        ids1 = np.asarray(tree.lvl_ids[0])
        self.ids1 = ids1
        rows_map = np.zeros((len(ids1), nc**ndim), np.int64)
        interior = sp.interior_flat(ndim, nc)
        self.interior_sidx = interior
        cell_local = np.stack(np.meshgrid(*[np.arange(nc)] * ndim,
                                          indexing="ij"), -1).reshape(-1, ndim)
        for n, b in enumerate(ids1):
            base = tree.ix[b] * nc
            g = cell_local + base
            rows_map[n] = np.ravel_multi_index(
                [g[:, k] for k in range(ndim)], self.shape)
        self.rows_map = rows_map

        # global per-cell coefficients
        C0 = np.zeros(N)
        CNb = [np.zeros(N) for _ in range(2 * ndim)]
        F = np.zeros(N)
        BCC = np.ones(N)
        if level1_op is not None:
            rows = rows_map.ravel()
            C0[rows] = np.broadcast_to(
                np.asarray(level1_op.c0).reshape(len(ids1), -1)
                if np.ndim(level1_op.c0) else
                np.full((len(ids1), nc**ndim), level1_op.c0),
                (len(ids1), nc**ndim)).ravel()
            for d in range(2 * ndim):
                c = level1_op.c_nb[d]
                CNb[d][rows] = np.broadcast_to(
                    np.asarray(c).reshape(len(ids1), -1) if np.ndim(c)
                    else np.full((len(ids1), nc**ndim), c),
                    (len(ids1), nc**ndim)).ravel()
            if level1_op.f is not None:
                F[rows] = level1_op.f.reshape(len(ids1), -1).ravel()
                BCC[rows] = level1_op.bc_coeff.reshape(len(ids1), -1).ravel()
        else:
            for idx in itertools.product(*[range(s) for s in self.shape]):
                r = int(np.ravel_multi_index(idx, self.shape))
                cs = [inv_dr2[d // 2] for d in range(2 * ndim)]
                if tree.coord == "cyl":
                    rr = tree.r_base[0] + (idx[0] + 0.5) * dr[0]
                    cs[0] *= (rr - 0.5 * dr[0]) / rr
                    cs[1] *= (rr + 0.5 * dr[0]) / rr
                C0[r] = -float(np.sum(cs)) - lam
                for d in range(2 * ndim):
                    CNb[d][r] = cs[d]
        self.F = F
        self.BCC = BCC

        def row(idx):
            return int(np.ravel_multi_index(idx, self.shape))

        A = np.zeros((N, N))
        self.bc_rows: List[np.ndarray] = []
        self.bc_coeff: List[np.ndarray] = []
        self.bc_types: List[int] = []
        self.bc_coords: List[np.ndarray] = []

        probe_params = {"voltage": 0.0}
        bdry_cells: List[List] = [[] for _ in range(2 * ndim)]
        for idx in itertools.product(*[range(s) for s in self.shape]):
            r = row(idx)
            A[r, r] += C0[r]
            for d in range(2 * ndim):
                dim = d // 2
                step = -1 if d % 2 == 0 else 1
                nb = list(idx)
                nb[dim] += step
                if 0 <= nb[dim] < self.shape[dim]:
                    A[r, row(nb)] += CNb[d][r]
                elif tree.periodic[dim]:
                    nb[dim] %= self.shape[dim]
                    A[r, row(nb)] += CNb[d][r]
                else:
                    bdry_cells[d].append((idx, r, CNb[d][r]))

        for d in range(2 * ndim):
            if not bdry_cells[d]:
                self.bc_rows.append(np.zeros(0, np.int64))
                self.bc_coeff.append(np.zeros(0))
                self.bc_types.append(BC_NEUMANN)
                self.bc_coords.append(np.zeros((0, ndim)))
                continue
            dim, low = neighb_dim(d), neighb_low(d)
            coords = []
            for idx, r, cg in bdry_cells[d]:
                x = [tree.r_base[k] + (idx[k] + 0.5) * dr[k]
                     for k in range(ndim)]
                x[dim] = tree.r_base[dim] + (0.0 if low else
                                             self.shape[dim] * dr[dim])
                coords.append(x)
            coords = np.asarray(coords)
            bc_type, _ = sides_bc(i_probe_var, d, coords[None], probe_params)
            rows = np.array([r for _, r, _ in bdry_cells[d]], dtype=np.int64)
            cgs_ = np.array([cg for _, _, cg in bdry_cells[d]])
            if bc_type == BC_DIRICHLET:
                A[rows, rows] += -cgs_
                coeff = 2.0 * cgs_
            elif bc_type == BC_NEUMANN:
                A[rows, rows] += cgs_
                sign = 1.0 if not low else -1.0
                coeff = sign * dr[dim] * cgs_
            elif bc_type == BC_DIRICHLET_COPY:
                coeff = cgs_
            elif bc_type == BC_CONTINUOUS:
                A[rows, rows] += 2.0 * cgs_
                x2rows = []
                for idx, r, cg in bdry_cells[d]:
                    nb2 = list(idx)
                    nb2[dim] += (1 if low else -1)
                    x2rows.append(row(nb2))
                A[rows, np.asarray(x2rows)] += -cgs_
                coeff = np.zeros_like(cgs_)
            else:
                raise ValueError("unsupported bc type for coarse solver")
            self.bc_rows.append(rows)
            self.bc_coeff.append(coeff)
            self.bc_types.append(int(bc_type))
            self.bc_coords.append(coords)

        self.A_inv = np.linalg.inv(A)
        self._A_inv_dev = None

    def solve(self, cc, i_phi: int, i_rhs: int, params):
        """Solve the level-1 grid and write phi back into the boxes."""
        xp = np if isinstance(cc, np.ndarray) else jnp
        N = self.A_inv.shape[0]
        rhs_boxes = cc[i_rhs, self.ids1[:, None], self.interior_sidx[None, :]]
        rhs = xp.zeros(N, dtype=rhs_boxes.dtype)
        if isinstance(cc, np.ndarray):
            rhs[self.rows_map.ravel()] = rhs_boxes.ravel()
        else:
            rhs = rhs.at[jnp.asarray(self.rows_map.ravel())].set(
                rhs_boxes.ravel())
        # internal (level-set) boundary contribution: rhs + f * phi_b
        phi_b = params.get("lsf_phi_b", 0.0)
        # order matters: a traced phi_b (the fused step's in-trace voltage)
        # must short-circuit before any bool conversion of its value
        if not isinstance(phi_b, (int, float)) or np.ndim(phi_b) \
                or phi_b != 0.0:
            rhs = rhs + (xp.asarray(self.F, rhs.dtype)
                         * xp.asarray(self.BCC, rhs.dtype) * phi_b)
        # domain-boundary contributions
        for d in range(2 * len(self.tree.dr_base)):
            if len(self.bc_rows[d]) == 0:
                continue
            _, bval = self.sides_bc(i_phi, d, self.bc_coords[d][None], params)
            if isinstance(cc, np.ndarray):
                contrib = self.bc_coeff[d] * (
                    bval + np.zeros(len(self.bc_rows[d])))
                np.subtract.at(rhs, self.bc_rows[d],
                               np.asarray(contrib).ravel())
            else:
                from ..core.ghostcell import cast_bc
                contrib = (self.bc_coeff[d].astype(rhs.dtype)
                           * (cast_bc(bval, cc)
                              + jnp.zeros(len(self.bc_rows[d]), rhs.dtype)))
                rhs = rhs.at[jnp.asarray(self.bc_rows[d])].add(
                    -contrib.ravel().astype(rhs.dtype))
        if isinstance(cc, np.ndarray):
            x = self.A_inv @ rhs
            cc[i_phi, self.ids1[:, None], self.interior_sidx[None, :]] = \
                x[self.rows_map]
            return cc
        # no caching: inside a trace jnp.asarray yields a tracer (a jaxpr
        # constant) which must not escape; XLA dedups the constant anyway
        x = jnp.asarray(self.A_inv, rhs.dtype) @ rhs
        return cc.at[i_phi, jnp.asarray(self.ids1)[:, None],
                     jnp.asarray(self.interior_sidx)[None, :]].set(
                         x[jnp.asarray(self.rows_map)])


# ---------------------------------------------------------------------------
# Geometric multigrid on the uniform level-1 grid (large coarse grids)
# ---------------------------------------------------------------------------
class UniformCoarseMG:
    """Correction-scheme multigrid on the uniform level-1 composite grid.

    The TPU-native analog of the reference's HYPRE PFMG coarse solve
    (``m_coarse_solver.f90:15-21``): the level-1 grid is coarsened
    geometrically (factor 2 per dim while even) down to a small grid that
    is dense-solved; smoothing is vectorized red-black Gauss-Seidel.
    Supports the constant Laplacian/Helmholtz operator, cylindrical radial
    factors, and Dirichlet/Neumann/continuous/periodic boundaries. The
    finest level carries the inhomogeneous boundary values (from sides_bc,
    e.g. the applied voltage); coarser levels solve homogeneous error
    equations. Iterates V-cycles to a 1e-10 relative residual (the
    reference's HYPRE default is 1e-6, ``m_af_types.f90:565``).
    """

    #: relative residual tolerance and V-cycle cap
    TOL = 1e-10
    MAX_VCYCLES = 50
    #: stop coarsening below this many unknowns and solve densely
    MIN_DENSE = 2048

    def __init__(self, tree: Tree, sides_bc: Callable, lam: float = 0.0,
                 i_probe_var: int = 0):
        self.tree = tree
        self.sides_bc = sides_bc
        self.lam = lam
        ndim, nc = tree.ndim, tree.nc
        self.ndim = ndim
        self.shape = tuple(int(x) for x in tree.coarse_grid_size)
        self.periodic = [bool(p) for p in tree.periodic]

        # box <-> global-grid mapping (same as the dense path)
        ids1 = np.asarray(tree.lvl_ids[0])
        self.ids1 = ids1
        self.interior_sidx = sp.interior_flat(ndim, nc)
        cell_local = np.stack(np.meshgrid(*[np.arange(nc)] * ndim,
                                          indexing="ij"), -1).reshape(-1, ndim)
        rows_map = np.zeros((len(ids1), nc ** ndim), np.int64)
        for n, b in enumerate(ids1):
            g = cell_local + tree.ix[b] * nc
            rows_map[n] = np.ravel_multi_index(
                [g[:, k] for k in range(ndim)], self.shape)
        self.rows_map = rows_map

        # grid hierarchy: halve while even and large
        self.levels = []  # (shape, dr)
        shape = np.asarray(self.shape)
        dr = np.asarray(tree.dr_base, np.float64)
        while True:
            self.levels.append((tuple(int(s) for s in shape), dr.copy()))
            if (np.prod(shape) <= self.MIN_DENSE
                    or np.any(shape % 2) or np.any(shape < 4)):
                break
            shape = shape // 2
            dr = dr * 2.0

        # per-level operator coefficients: c_nb[d] broadcastable over the
        # grid, c0 likewise (cylindrical radial factors on dim 0)
        self.ops = []
        for shp, drl in self.levels:
            inv_dr2 = 1.0 / drl ** 2
            c_nb = [np.asarray(inv_dr2[d // 2]) for d in range(2 * ndim)]
            c0 = -2.0 * float(np.sum(inv_dr2)) - lam
            if tree.coord == "cyl":
                r = (tree.r_base[0]
                     + (np.arange(shp[0]) + 0.5) * drl[0])  # [s0]
                shape_r = (shp[0],) + (1,) * (ndim - 1)
                lo = ((r - 0.5 * drl[0]) / r).reshape(shape_r) * inv_dr2[0]
                hi = ((r + 0.5 * drl[0]) / r).reshape(shape_r) * inv_dr2[0]
                c0 = c0 - (lo - inv_dr2[0]) - (hi - inv_dr2[0])
                c_nb[0], c_nb[1] = lo, hi
            # difference-form sum (f64, before any cast): see
            # multigrid.LevelOp.c_sum — equals -lam up to f64 rounding
            c_sum = c0 + sum(np.broadcast_to(c, ())
                             if np.ndim(c) == 0 else c for c in c_nb)
            self.ops.append((c0, c_nb, c_sum))

        # boundary types (static) and fine-level face coordinates
        self.bc_types = []
        self.bc_coords = []
        probe_params = {"voltage": 0.0}
        for d in range(2 * ndim):
            dim, low = neighb_dim(d), neighb_low(d)
            if self.periodic[dim]:
                self.bc_types.append(None)
                self.bc_coords.append(None)
                continue
            axes = []
            for k in range(ndim):
                if k == dim:
                    x = tree.r_base[k] + (0.0 if low
                                          else self.shape[k]
                                          * tree.dr_base[k])
                    axes.append(np.array([x]))
                else:
                    axes.append(tree.r_base[k]
                                + (np.arange(self.shape[k]) + 0.5)
                                * tree.dr_base[k])
            mesh = np.meshgrid(*axes, indexing="ij")
            coords = np.stack([m.ravel() for m in mesh], -1)
            bc_type, _ = sides_bc(i_probe_var, d, coords[None], probe_params)
            self.bc_types.append(int(bc_type))
            self.bc_coords.append(coords)

        # dense bottom solve (homogeneous error equation except level 0,
        # which is handled by ghost elimination at apply time)
        self._bottom_inv = self._assemble_bottom_inverse()

        self._masks = {}

    # ------------------------------------------------------------ helpers
    def _parity_mask(self, shp, parity: int):
        key = (shp, parity)
        if key not in self._masks:
            mesh = np.meshgrid(*[np.arange(s) for s in shp], indexing="ij")
            self._masks[key] = (sum(mesh) % 2) == parity
        return self._masks[key]

    def _assemble_bottom_inverse(self):
        shp, _ = self.levels[-1]
        c0, c_nb, _ = self.ops[-1]
        ndim = self.ndim
        N = int(np.prod(shp))
        A = np.zeros((N, N))
        idxs = np.stack(np.meshgrid(*[np.arange(s) for s in shp],
                                    indexing="ij"), -1).reshape(-1, ndim)
        rows = np.arange(N)
        A[rows, rows] += np.broadcast_to(c0, shp).reshape(-1)
        for d in range(2 * ndim):
            dim, low = neighb_dim(d), neighb_low(d)
            step = -1 if low else 1
            cg = np.broadcast_to(c_nb[d], shp).reshape(-1)
            nb = idxs.copy()
            nb[:, dim] += step
            inside = (nb[:, dim] >= 0) & (nb[:, dim] < shp[dim])
            if self.periodic[dim]:
                nb[:, dim] %= shp[dim]
                cols = np.ravel_multi_index(
                    [nb[:, k] for k in range(ndim)], shp)
                np.add.at(A, (rows, cols), cg)
                continue
            cols = np.ravel_multi_index(
                [np.where(inside, nb[:, k], 0) for k in range(ndim)], shp)
            np.add.at(A, (rows[inside], cols[inside]), cg[inside])
            bnd = ~inside
            bt = self.bc_types[d]
            if bt == BC_DIRICHLET:
                # homogeneous error equation: ghost = -inner
                A[rows[bnd], rows[bnd]] += -cg[bnd]
            elif bt in (BC_NEUMANN, BC_DIRICHLET_COPY):
                A[rows[bnd], rows[bnd]] += cg[bnd] \
                    if bt == BC_NEUMANN else 0.0
            elif bt == BC_CONTINUOUS:
                A[rows[bnd], rows[bnd]] += 2.0 * cg[bnd]
                nb2 = idxs[bnd].copy()
                nb2[:, dim] -= step
                cols2 = np.ravel_multi_index(
                    [nb2[:, k] for k in range(ndim)], shp)
                np.add.at(A, (rows[bnd], cols2), -cg[bnd])
        return np.linalg.inv(A)

    def _fill_ghosts(self, u, lvl_i: int, bvals):
        """Pad with one ghost layer. bvals: per-direction boundary values
        (None on coarse/homogeneous levels)."""
        xp = np if isinstance(u, np.ndarray) else jnp
        shp, drl = self.levels[lvl_i]
        ndim = self.ndim
        up = xp.pad(u, 1)
        for d in range(2 * ndim):
            dim, low = neighb_dim(d), neighb_low(d)
            gsl = [slice(1, -1)] * ndim
            in1 = [slice(1, -1)] * ndim
            in2 = [slice(1, -1)] * ndim
            gsl[dim] = 0 if low else -1
            in1[dim] = 1 if low else -2
            in2[dim] = 2 if low else -3
            if self.periodic[dim]:
                wrap = [slice(1, -1)] * ndim
                wrap[dim] = -2 if low else 1
                val = up[tuple(wrap)]
            else:
                bt = self.bc_types[d]
                bval = 0.0 if bvals is None else bvals[d]
                val = bc_to_ghost(bt, bval, up[tuple(in1)], up[tuple(in2)],
                                  float(drl[dim]), not low)
            if isinstance(up, np.ndarray):
                up[tuple(gsl)] = val
            else:
                up = up.at[tuple(gsl)].set(val)
        return up

    def _apply(self, u, lvl_i: int, bvals):
        """L(u) with ghosts from bvals, in f32-safe difference form
        (see multigrid.LevelOp.apply)."""
        c0, c_nb, c_sum = self.ops[lvl_i]
        ndim = self.ndim
        up = self._fill_ghosts(u, lvl_i, bvals)
        out = c_sum * u
        for d in range(2 * ndim):
            dim, low = neighb_dim(d), neighb_low(d)
            sl = [slice(1, -1)] * ndim
            sl[dim] = slice(0, -2) if low else slice(2, None)
            out = out + c_nb[d] * (up[tuple(sl)] - u)
        return out

    def _gsrb(self, u, rhs, lvl_i: int, bvals, n_sweeps: int = 2):
        shp, _ = self.levels[lvl_i]
        c0, c_nb, c_sum = self.ops[lvl_i]
        ndim = self.ndim
        xp = np if isinstance(u, np.ndarray) else jnp
        for sweep in range(2 * n_sweeps):
            new = u + (rhs - self._apply(u, lvl_i, bvals)) / c0
            mask = self._parity_mask(shp, sweep % 2)
            u = xp.where(mask, new, u)
        return u

    def _restrict(self, r):
        """2^ndim average to the next coarser grid."""
        ndim = self.ndim
        for d in range(ndim):
            shp = r.shape
            new = list(shp)
            new[d] = shp[d] // 2
            r = r.reshape(shp[:d] + (new[d], 2) + shp[d + 1:]).mean(axis=d + 1)
        return r

    def _prolong_add(self, u_f, e_c, lvl_i_c: int):
        """u_f += sparse (0.75/0.25) prolongation of the coarse error."""
        xp = np if isinstance(u_f, np.ndarray) else jnp
        ndim = self.ndim
        e = e_c
        for d in range(ndim):
            ep = xp.pad(e, [(1, 1) if k == d else (0, 0)
                            for k in range(e.ndim)], mode="edge")
            lo = [slice(None)] * e.ndim
            hi = [slice(None)] * e.ndim
            ctr = [slice(None)] * e.ndim
            lo[d] = slice(0, -2)
            hi[d] = slice(2, None)
            ctr[d] = slice(1, -1)
            f_lo = 0.75 * ep[tuple(ctr)] + 0.25 * ep[tuple(lo)]
            f_hi = 0.75 * ep[tuple(ctr)] + 0.25 * ep[tuple(hi)]
            e = xp.stack([f_lo, f_hi], axis=d + 1).reshape(
                e.shape[:d] + (2 * e.shape[d],) + e.shape[d + 1:])
        return u_f + e

    def _vcycle(self, u, rhs, lvl_i: int, bvals):
        if lvl_i == len(self.levels) - 1:
            xp = np if isinstance(u, np.ndarray) else jnp
            if bvals is not None:
                # eliminate inhomogeneous ghosts into the rhs
                rhs = rhs - (self._apply(u, lvl_i, bvals)
                             - self._apply(u, lvl_i, None))
            Ainv = self._bottom_inv if xp is np else \
                jnp.asarray(self._bottom_inv, rhs.dtype)
            return (Ainv @ rhs.reshape(-1)).reshape(rhs.shape)
        u = self._gsrb(u, rhs, lvl_i, bvals, 2)
        res = rhs - self._apply(u, lvl_i, bvals)
        r_c = self._restrict(res)
        xp = np if isinstance(u, np.ndarray) else jnp
        e_c = self._vcycle(xp.zeros_like(r_c), r_c, lvl_i + 1, None)
        u = self._prolong_add(u, e_c, lvl_i + 1)
        u = self._gsrb(u, rhs, lvl_i, bvals, 2)
        return u

    # -------------------------------------------------------------- solve
    def solve(self, cc, i_phi: int, i_rhs: int, params):
        xp = np if isinstance(cc, np.ndarray) else jnp
        ndim = self.ndim
        rhs_boxes = cc[i_rhs, self.ids1[:, None], self.interior_sidx[None, :]]
        phi_boxes = cc[i_phi, self.ids1[:, None], self.interior_sidx[None, :]]
        N = int(np.prod(self.shape))
        rhs = xp.zeros(N, dtype=rhs_boxes.dtype)
        u = xp.zeros(N, dtype=rhs_boxes.dtype)
        rm = self.rows_map.ravel()
        if xp is np:
            rhs[rm] = rhs_boxes.ravel()
            u[rm] = phi_boxes.ravel()
        else:
            rmj = jnp.asarray(rm)
            rhs = rhs.at[rmj].set(rhs_boxes.ravel())
            u = u.at[rmj].set(phi_boxes.ravel())
        rhs = rhs.reshape(self.shape)
        u = u.reshape(self.shape)

        # boundary values at solve time (e.g. the applied voltage)
        bvals = []
        for d in range(2 * ndim):
            if self.bc_coords[d] is None:
                bvals.append(0.0)
                continue
            _, bval = self.sides_bc(i_phi, d, self.bc_coords[d][None],
                                    params)
            val = bval + xp.zeros(len(self.bc_coords[d]), rhs.dtype)
            shp_t = [self.shape[k] for k in range(ndim)
                     if k != neighb_dim(d)]
            bvals.append(val.reshape([1 if k == neighb_dim(d)
                                      else self.shape[k]
                                      for k in range(ndim)])
                         if np.ndim(bval) or True else val)
        # reshape flat face values into broadcastable slabs
        bvals2 = []
        for d in range(2 * ndim):
            v = bvals[d]
            bvals2.append(v if np.ndim(v) == 0 else
                          v.reshape([1 if k == neighb_dim(d)
                                     else self.shape[k]
                                     for k in range(ndim)])[
                              tuple(0 if k == neighb_dim(d)
                                    else slice(None)
                                    for k in range(ndim))])
        bvals = bvals2

        rhs_scale = float(np.max(np.abs(np.asarray(rhs)))) if xp is np \
            else None
        for it in range(self.MAX_VCYCLES):
            u = self._vcycle(u, rhs, 0, bvals)
            if xp is np:
                res = float(np.max(np.abs(rhs - self._apply(u, 0, bvals))))
                if res <= self.TOL * max(rhs_scale, 1e-300):
                    break
            elif it >= 3:
                # traced path: fixed 4 V-cycles (residual ~1e-10 relative
                # after 4 cycles for the smooth FAS coarse-grid rhs)
                break

        flat = u.reshape(-1)
        if xp is np:
            cc[i_phi, self.ids1[:, None], self.interior_sidx[None, :]] = \
                flat[self.rows_map]
            return cc
        return cc.at[i_phi, jnp.asarray(self.ids1)[:, None],
                     jnp.asarray(self.interior_sidx)[None, :]].set(
                         flat[jnp.asarray(self.rows_map)])
