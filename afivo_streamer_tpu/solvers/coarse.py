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
                              BC_DIRICHLET_COPY)

_MAX_DENSE = 32768  # beyond this a dense inverse is unreasonable


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
                f"coarse grid with {N} unknowns too large for dense solve; "
                "use a deeper coarse multigrid (planned)")
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
        if np.ndim(phi_b) or phi_b != 0.0 or not isinstance(phi_b, float):
            rhs = rhs + (xp.asarray(self.F, rhs.dtype)
                         * xp.asarray(self.BCC, rhs.dtype) * phi_b)
        # domain-boundary contributions
        for d in range(2 * len(self.tree.dr_base)):
            if len(self.bc_rows[d]) == 0:
                continue
            _, bval = self.sides_bc(i_phi, d, self.bc_coords[d][None], params)
            contrib = self.bc_coeff[d] * (bval + xp.zeros(len(self.bc_rows[d])))
            if isinstance(cc, np.ndarray):
                np.subtract.at(rhs, self.bc_rows[d],
                               np.asarray(contrib).ravel())
            else:
                rhs = rhs.at[jnp.asarray(self.bc_rows[d])].add(
                    -contrib.ravel())
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
