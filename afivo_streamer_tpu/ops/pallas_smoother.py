"""Fused Pallas TPU kernel for the multigrid smoother (2D).

One half red-black sweep of the reference's gsrb_boxes
(``afivo/src/m_af_multigrid.f90:648-687``) is: fill the ghost layer of
every box on the level, then update one parity of the interior from the
5-point stencil. As XLA ops this is ~50 small kernels per half sweep; on
the TPU backend each op costs microseconds of fixed overhead, so the
smoother dominates the step time. This module fuses the whole half sweep
into ONE Pallas kernel per level:

* the grid runs over the level's boxes; each program loads its own
  (nc+2)^2 phi block plus its four same-level neighbor blocks, selected
  with scalar-prefetched global row indices;
* every ghost value is a uniform linear form
  ``ghost = Wnb*nb_slab + W1*f1 + W2*f2 + W1s*swap(f1) + W2s*swap(f2) + A``
  that covers same-level copies, physical boundaries
  (Dirichlet/Neumann/continuous/dirichlet_copy with the boundary value
  folded into A), the mg_sides_rb refinement-boundary scheme (the coarse
  strip interpolation is constant during a level visit and folded into
  A), and the extrapolating variable-eps variant (the parity-swap terms);
* the red-black update uses per-box stencil coefficient blocks, so the
  constant, cylindrical, variable-eps and level-set operators all work.

The host (NumPy) path and the generic traced path are untouched; this
kernel is a TPU fast path selected in Multigrid._gsrb_boxes and verified
bitwise against the host smoother in tests/test_pallas_smoother.py.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import ghostcell as gc
from ..core import spatial as sp
from ..core.tree import Tree, NO_BOX, neighb_dim, neighb_low


def z():
    return np.int32(0)


def _edge_slabs_2d(nc: int):
    """(ghost writer, nb slab reader, f1, f2) slice info per direction."""
    # direction d: 0 x-low, 1 x-high, 2 y-low, 3 y-high; block axes (x, y)
    return [
        dict(axis=0, low=True, nb_row=nc, f1_row=1, f2_row=2, g_row=0),
        dict(axis=0, low=False, nb_row=1, f1_row=nc, f2_row=nc - 1,
             g_row=nc + 1),
        dict(axis=1, low=True, nb_row=nc, f1_row=1, f2_row=2, g_row=0),
        dict(axis=1, low=False, nb_row=1, f1_row=nc, f2_row=nc - 1,
             g_row=nc + 1),
    ]


class PallasSmoother2D:
    """Static tables for the fused half sweep of one (epoch, level)."""

    def __init__(self, tree: Tree, lvl: int, op, bc_fn, params,
                 rb_extrap_mask: Optional[Dict] = None, i_phi: int = 0):
        ndim, nc = tree.ndim, tree.nc
        assert ndim == 2
        self.nc = nc
        self.i_phi = i_phi
        plan = gc.get_gc_plan(tree, lvl)
        ids = np.asarray(tree.lvl_ids[lvl - 1], np.int32)
        self.ids = ids
        n = len(ids)
        self.n = n
        pos = {int(b): k for k, b in enumerate(ids)}

        # level-local row table: own + 4 neighbors (same-level neighbors
        # are by definition on this level; self row when absent)
        g = np.tile(np.arange(n, dtype=np.int64)[:, None], (1, 5))
        for d in range(4):
            for k, b in enumerate(ids):
                nb = int(tree.neighbors[int(b), d])
                if nb >= 0:
                    g[k, 1 + d] = pos[nb]
        self.g = g.astype(np.int32)

        # ghost linear-form coefficients per (box, dir):
        # Wnb, W1, W2, W1s, W2s (pad to 8 for the block layout)
        W = np.zeros((n, 4, 8))
        # A-build recipe per (dir): lists of (kind, rows, tables...)
        self.a_groups = []
        for d, p in enumerate(plan.dirs):
            for k_loc, b in enumerate(p.copy_ids):
                W[pos[int(b)], d, 0] = 1.0
            if len(p.bc_ids):
                bc_type, _ = bc_fn(i_phi, d, p.bc_coords, params or {})
                rows = np.array([pos[int(b)] for b in p.bc_ids], np.int32)
                dim, low = neighb_dim(d), neighb_low(d)
                if bc_type == gc.BC_DIRICHLET:
                    W[rows, d, 1] = -1.0
                    gamma = 2.0
                elif bc_type == gc.BC_NEUMANN:
                    W[rows, d, 1] = 1.0
                    gamma = (1.0 if not low else -1.0) * plan.dr[dim]
                elif bc_type == gc.BC_CONTINUOUS:
                    W[rows, d, 1] = 2.0
                    W[rows, d, 2] = -1.0
                    gamma = 0.0
                elif bc_type == gc.BC_DIRICHLET_COPY:
                    gamma = 1.0
                else:
                    raise ValueError("unsupported bc type")
                self.a_groups.append(("bc", d, rows, p.bc_coords, gamma))
            if len(p.rb_ids):
                rows = np.array([pos[int(b)] for b in p.rb_ids], np.int32)
                emask = (None if rb_extrap_mask is None
                         else rb_extrap_mask.get(d))
                std = np.ones(len(rows), bool) if emask is None else ~emask
                W[rows[std], d, 1] = 0.75
                W[rows[std], d, 2] = -0.25
                if emask is not None and emask.any():
                    er = rows[emask]
                    W[er, d, 1] = 1.125
                    W[er, d, 2] = -0.375
                    W[er, d, 3] = -0.375
                    W[er, d, 4] = 0.125
                self.a_groups.append(
                    ("rb", d, rows, p, emask))
        self.W = W
        #: whether any parity-swap (veps extrapolation) terms are present
        self.has_swap = bool(np.any(W[:, :, 3:5] != 0.0))

        # stencil coefficient blocks [n, 6, nc, nc]: c0, 4 neighbor
        # coeffs, and the difference-form sum c_sum (see LevelOp.c_sum)
        cs = np.zeros((n, 6, nc, nc))
        shape = (n, nc, nc)
        cs[:, 0] = np.broadcast_to(np.asarray(op.c0), shape)
        for d in range(4):
            cs[:, 1 + d] = np.broadcast_to(np.asarray(op.c_nb[d]), shape)
        cs[:, 5] = np.broadcast_to(np.asarray(op.c_sum), shape)
        self.cs = cs
        self._op = op
        self._bc_fn = bc_fn

    # -------------------------------------------------- per-visit consts
    def build_consts(self, cc, i_phi, i_rhs, params, phi_b):
        """A[n, 4, nc] ghost constants and the rhs block incl. internal-
        boundary corrections; evaluated once per level visit."""
        nc, n = self.nc, self.n
        ids = jnp.asarray(self.ids)
        A = jnp.zeros((n, 4, nc), cc.dtype)
        for grp in self.a_groups:
            if grp[0] == "bc":
                _, d, rows, coords, gamma = grp
                if gamma == 0.0:
                    continue
                _, val = self._bc_fn(self.i_phi, d, coords, params or {})
                val = gamma * (jnp.asarray(val, cc.dtype)
                               + jnp.zeros((len(rows), nc), cc.dtype))
                A = A.at[jnp.asarray(rows), d].add(val)
            else:
                _, d, rows, p, emask = grp
                # standard entries: A = 0.5 * interp(coarse strip)
                tmp = cc[i_phi, jnp.asarray(p.rb_coarse)[:, None],
                         jnp.asarray(p.rb_tmp)]
                gci = gc._mg_rb_interp(tmp[None], 2, nc)[0]
                contrib = 0.5 * gci
                if emask is not None and emask.any():
                    # extrapolating entries use the parent copy instead
                    pc = cc[i_phi, jnp.asarray(p.rb_parent)[:, None],
                            jnp.asarray(p.rb_pcopy)]
                    contrib = jnp.where(jnp.asarray(emask)[:, None],
                                        0.5 * pc, contrib)
                A = A.at[jnp.asarray(rows), d].add(contrib)
        # rhs block + lsf boundary correction
        interior = sp.interior_flat(2, nc)
        R = cc[i_rhs, ids[:, None], jnp.asarray(interior)[None, :]]
        R = R.reshape(n, nc, nc)
        if self._op.f is not None:
            corr = self._op.bc_corr(phi_b)
            R = R + jnp.asarray(corr).reshape(n, nc, nc)
        return A, R

    # --------------------------------------------------------- kernels
    def sweep(self, phi3, R, mask, interpret: bool = False):
        """Red-black interior update using the blocks' current ghosts
        (matches the host order: sweep first, then ghost exchange).
        phi3: [cap, C, C]; returns updated [n, C, C] blocks."""
        cs = jnp.asarray(self.cs, phi3.dtype)
        return _sweep_2d(phi3, R, mask, self.g, cs, self.nc, self.n,
                         interpret)

    def fill(self, phi3, A, interpret: bool = False):
        """Ghost exchange: every side ghost from the uniform linear form
        over the (updated) neighbor slab and own edge layers."""
        W = jnp.asarray(self.W, phi3.dtype)
        return _fill_2d(phi3, A, self.g, W, self.nc, self.n,
                        self.has_swap, interpret)


def _sweep_2d(phi3, R, mask, g, cs, nc: int, n: int,
              interpret: bool = False):
    """Fused half red-black sweep over [n, C, C] level-local blocks.
    ``g``/``cs`` may be constants (legacy baked mode) or traced runtime
    tables (epoch-pack mode)."""
    C = nc + 2

    def kernel(g0, g1, g2, g3, g4, own_ref, cs_ref, R_ref, M_ref,
               o_ref):
        B = own_ref[0]
        c = cs_ref[0]
        B0 = B[1:nc + 1, 1:nc + 1]
        # difference form (see LevelOp.c_sum): no |phi|-scale
        # cancellation, so the f32 residual floor tracks d(phi) not phi
        lphi = (c[5] * B0
                + c[1] * (B[0:nc, 1:nc + 1] - B0)
                + c[2] * (B[2:nc + 2, 1:nc + 1] - B0)
                + c[3] * (B[1:nc + 1, 0:nc] - B0)
                + c[4] * (B[1:nc + 1, 2:nc + 2] - B0))
        new = B0 + (R_ref[0] - lphi) / c[0]
        upd = jnp.where(M_ref[...] > 0, new, B0)
        o_ref[0] = B
        o_ref[0, 1:nc + 1, 1:nc + 1] = upd

    # int32 prefetch indices (the backend cannot pass s64 operands to
    # the custom call); the index maps below return int32 constants so
    # the Mosaic transform is type-consistent under jax_enable_x64
    gs = [jnp.asarray(g[:, k], jnp.int32) for k in range(5)]
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, C, C),
                             lambda i, g0, g1, g2, g3, g4:
                             (g0[i], z(), z())),
                pl.BlockSpec((1, 6, nc, nc),
                             lambda i, *g: (i, z(), z(), z())),
                pl.BlockSpec((1, nc, nc), lambda i, *g: (i, z(), z())),
                pl.BlockSpec((nc, nc), lambda i, *g: (z(), z())),
            ],
            out_specs=pl.BlockSpec((1, C, C), lambda i, *g: (i, z(), z())),
        ),
        out_shape=jax.ShapeDtypeStruct((n, C, C), phi3.dtype),
        interpret=interpret,
    )(*gs, phi3, cs, R, mask)


def _fill_2d(phi3, A, g, W, nc: int, n: int, has_swap: bool,
             interpret: bool = False):
    """Fused ghost exchange over [n, C, C] level-local blocks."""
    C = nc + 2
    slabs = _edge_slabs_2d(nc)
    par = jnp.asarray((np.arange(nc) % 2 == 0).astype(np.float32))

    def kernel(g0, g1, g2, g3, g4, own_ref, nb0_ref, nb1_ref,
               nb2_ref, nb3_ref, W_ref, A_ref, o_ref):
        B = own_ref[0]
        nbs = (nb0_ref[0], nb1_ref[0], nb2_ref[0], nb3_ref[0])
        rows = []
        cols = []
        for d, s in enumerate(slabs):
            nb = nbs[d]
            if s["axis"] == 0:
                slab = nb[s["nb_row"], 1:nc + 1]
                f1 = B[s["f1_row"], 1:nc + 1]
                f2 = B[s["f2_row"], 1:nc + 1]
            else:
                slab = nb[1:nc + 1, s["nb_row"]]
                f1 = B[1:nc + 1, s["f1_row"]]
                f2 = B[1:nc + 1, s["f2_row"]]
            w = W_ref[0, d]
            ghost = (w[0] * slab + w[1] * f1 + w[2] * f2
                     + A_ref[0, d])
            if has_swap:
                # adjacent-pair swap via rolls + parity select
                # (reshape-based swaps do not lower on this backend)
                f1s = jnp.where(par > 0, jnp.roll(f1, -1),
                                jnp.roll(f1, 1))
                f2s = jnp.where(par > 0, jnp.roll(f2, -1),
                                jnp.roll(f2, 1))
                ghost = ghost + w[3] * f1s + w[4] * f2s
            if s["axis"] == 0:
                rows.append((s["g_row"], ghost))
            else:
                cols.append((s["g_row"], ghost))
        # rebuild B with the new ghost rows/columns (corners kept)
        row_lo = jnp.concatenate(
            [B[0:1, 0:1], rows[0][1][None, :], B[0:1, nc + 1:]], 1)
        row_hi = jnp.concatenate(
            [B[nc + 1:, 0:1], rows[1][1][None, :],
             B[nc + 1:, nc + 1:]], 1)
        Bmid = B[1:nc + 1]
        col_lo = cols[0][1][:, None]
        col_hi = cols[1][1][:, None]
        Bmid = jnp.concatenate([col_lo, Bmid[:, 1:nc + 1], col_hi], 1)
        o_ref[0] = jnp.concatenate([row_lo, Bmid, row_hi], 0)

    # int32 prefetch indices (see _sweep_2d)
    gs = [jnp.asarray(g[:, k], jnp.int32) for k in range(5)]
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, C, C),
                             lambda i, g0, g1, g2, g3, g4:
                             (g0[i], z(), z())),
                pl.BlockSpec((1, C, C),
                             lambda i, g0, g1, g2, g3, g4:
                             (g1[i], z(), z())),
                pl.BlockSpec((1, C, C),
                             lambda i, g0, g1, g2, g3, g4:
                             (g2[i], z(), z())),
                pl.BlockSpec((1, C, C),
                             lambda i, g0, g1, g2, g3, g4:
                             (g3[i], z(), z())),
                pl.BlockSpec((1, C, C),
                             lambda i, g0, g1, g2, g3, g4:
                             (g4[i], z(), z())),
                pl.BlockSpec((1, 4, 8), lambda i, *g: (i, z(), z())),
                pl.BlockSpec((1, 4, nc), lambda i, *g: (i, z(), z())),
            ],
            out_specs=pl.BlockSpec((1, C, C), lambda i, *g: (i, z(), z())),
        ),
        out_shape=jax.ShapeDtypeStruct((n, C, C), phi3.dtype),
        interpret=interpret,
    )(*gs, phi3, phi3, phi3, phi3, phi3, W, A)


def _fill_sweep_2d(phi3, R, mask, A, g, W, cs, nc: int, n: int,
                   interpret: bool = False):
    """ONE kernel for a (ghost fill, red-black sweep) pair: each program
    rebuilds its block's side ghosts from the neighbors' current edge
    slabs (exactly ``_fill_2d``; neighbor interiors are post-previous-
    half-sweep, which is what the separate fill read too) and then
    applies the red-black interior update (exactly ``_sweep_2d``) on the
    freshly filled block. Halves the smoother's program count per half
    sweep — the block V-cycle was measured kernel-launch bound (~0.2 ms
    per (sweep, fill) pair against ~us of vector work; round-4 README).
    No parity-swap (veps) terms: pack mode never sets them (the legacy
    baked mode keeps the separate kernels)."""
    C = nc + 2

    def kernel(g0, g1, g2, g3, g4, own_ref, nb0_ref, nb1_ref,
               nb2_ref, nb3_ref, W_ref, A_ref, cs_ref, R_ref, M_ref,
               o_ref):
        B = own_ref[0]
        nbs = (nb0_ref[0], nb1_ref[0], nb2_ref[0], nb3_ref[0])
        slabs = _edge_slabs_2d(nc)
        rows = []
        cols = []
        for d, s in enumerate(slabs):
            nb = nbs[d]
            if s["axis"] == 0:
                slab = nb[s["nb_row"], 1:nc + 1]
                f1 = B[s["f1_row"], 1:nc + 1]
                f2 = B[s["f2_row"], 1:nc + 1]
            else:
                slab = nb[1:nc + 1, s["nb_row"]]
                f1 = B[1:nc + 1, s["f1_row"]]
                f2 = B[1:nc + 1, s["f2_row"]]
            w = W_ref[0, d]
            ghost = (w[0] * slab + w[1] * f1 + w[2] * f2
                     + A_ref[0, d])
            if s["axis"] == 0:
                rows.append((s["g_row"], ghost))
            else:
                cols.append((s["g_row"], ghost))
        row_lo = jnp.concatenate(
            [B[0:1, 0:1], rows[0][1][None, :], B[0:1, nc + 1:]], 1)
        row_hi = jnp.concatenate(
            [B[nc + 1:, 0:1], rows[1][1][None, :],
             B[nc + 1:, nc + 1:]], 1)
        Bmid = B[1:nc + 1]
        Bf = jnp.concatenate(
            [row_lo,
             jnp.concatenate([cols[0][1][:, None], Bmid[:, 1:nc + 1],
                              cols[1][1][:, None]], 1),
             row_hi], 0)
        # red-black update on the filled block (see _sweep_2d)
        c = cs_ref[0]
        B0 = Bf[1:nc + 1, 1:nc + 1]
        lphi = (c[5] * B0
                + c[1] * (Bf[0:nc, 1:nc + 1] - B0)
                + c[2] * (Bf[2:nc + 2, 1:nc + 1] - B0)
                + c[3] * (Bf[1:nc + 1, 0:nc] - B0)
                + c[4] * (Bf[1:nc + 1, 2:nc + 2] - B0))
        new = B0 + (R_ref[0] - lphi) / c[0]
        upd = jnp.where(M_ref[...] > 0, new, B0)
        o_ref[0] = Bf
        o_ref[0, 1:nc + 1, 1:nc + 1] = upd

    gs = [jnp.asarray(g[:, k], jnp.int32) for k in range(5)]
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, C, C),
                             lambda i, g0, g1, g2, g3, g4:
                             (g0[i], z(), z())),
                pl.BlockSpec((1, C, C),
                             lambda i, g0, g1, g2, g3, g4:
                             (g1[i], z(), z())),
                pl.BlockSpec((1, C, C),
                             lambda i, g0, g1, g2, g3, g4:
                             (g2[i], z(), z())),
                pl.BlockSpec((1, C, C),
                             lambda i, g0, g1, g2, g3, g4:
                             (g3[i], z(), z())),
                pl.BlockSpec((1, C, C),
                             lambda i, g0, g1, g2, g3, g4:
                             (g4[i], z(), z())),
                pl.BlockSpec((1, 4, 8), lambda i, *g: (i, z(), z())),
                pl.BlockSpec((1, 4, nc), lambda i, *g: (i, z(), z())),
                pl.BlockSpec((1, 6, nc, nc),
                             lambda i, *g: (i, z(), z(), z())),
                pl.BlockSpec((1, nc, nc), lambda i, *g: (i, z(), z())),
                pl.BlockSpec((nc, nc), lambda i, *g: (z(), z())),
            ],
            out_specs=pl.BlockSpec((1, C, C), lambda i, *g: (i, z(), z())),
        ),
        out_shape=jax.ShapeDtypeStruct((n, C, C), phi3.dtype),
        interpret=interpret,
    )(*gs, phi3, phi3, phi3, phi3, phi3, W, A, cs, R, mask)


class PallasSmoother3D:
    """Fused half sweep for 3D levels: same design as PallasSmoother2D
    with six neighbor blocks and 2D ghost faces written by direct
    sub-slab stores (the 3D extrapolating veps variant uses the 1D form,
    matching the host fallback, so no parity-swap terms)."""

    def __init__(self, tree: Tree, lvl: int, op, bc_fn, params,
                 rb_extrap_mask: Optional[Dict] = None, i_phi: int = 0):
        ndim, nc = tree.ndim, tree.nc
        assert ndim == 3
        self.nc = nc
        self.i_phi = i_phi
        plan = gc.get_gc_plan(tree, lvl)
        ids = np.asarray(tree.lvl_ids[lvl - 1], np.int32)
        self.ids = ids
        n = len(ids)
        self.n = n
        pos = {int(b): k for k, b in enumerate(ids)}

        # level-local rows (see PallasSmoother2D)
        g = np.tile(np.arange(n, dtype=np.int64)[:, None], (1, 7))
        for d in range(6):
            for k, b in enumerate(ids):
                nb = int(tree.neighbors[int(b), d])
                if nb >= 0:
                    g[k, 1 + d] = pos[nb]
        self.g = g.astype(np.int32)

        W = np.zeros((n, 6, 8))
        self.a_groups = []
        for d, p in enumerate(plan.dirs):
            for b in p.copy_ids:
                W[pos[int(b)], d, 0] = 1.0
            if len(p.bc_ids):
                bc_type, _ = bc_fn(i_phi, d, p.bc_coords, params or {})
                rows = np.array([pos[int(b)] for b in p.bc_ids], np.int32)
                dim, low = neighb_dim(d), neighb_low(d)
                if bc_type == gc.BC_DIRICHLET:
                    W[rows, d, 1] = -1.0
                    gamma = 2.0
                elif bc_type == gc.BC_NEUMANN:
                    W[rows, d, 1] = 1.0
                    gamma = (1.0 if not low else -1.0) * plan.dr[dim]
                elif bc_type == gc.BC_CONTINUOUS:
                    W[rows, d, 1] = 2.0
                    W[rows, d, 2] = -1.0
                    gamma = 0.0
                elif bc_type == gc.BC_DIRICHLET_COPY:
                    gamma = 1.0
                else:
                    raise ValueError("unsupported bc type")
                self.a_groups.append(("bc", d, rows, p.bc_coords, gamma))
            if len(p.rb_ids):
                rows = np.array([pos[int(b)] for b in p.rb_ids], np.int32)
                emask = (None if rb_extrap_mask is None
                         else rb_extrap_mask.get(d))
                # standard + extrapolating 3D forms share the fine-side
                # coefficients (the host 3D extrap falls back to the 1D
                # form, ghostcell._rb_extrap_ghost)
                W[rows, d, 1] = 0.75
                W[rows, d, 2] = -0.25
                self.a_groups.append(("rb", d, rows, p, emask))
        self.W = W

        cs = np.zeros((n, 8, nc, nc, nc))
        shape = (n, nc, nc, nc)
        cs[:, 0] = np.broadcast_to(np.asarray(op.c0), shape)
        for d in range(6):
            cs[:, 1 + d] = np.broadcast_to(np.asarray(op.c_nb[d]), shape)
        cs[:, 7] = np.broadcast_to(np.asarray(op.c_sum), shape)
        self.cs = cs
        self._op = op
        self._bc_fn = bc_fn

    def build_consts(self, cc, i_phi, i_rhs, params, phi_b):
        nc, n = self.nc, self.n
        ids = jnp.asarray(self.ids)
        A = jnp.zeros((n, 6, nc * nc), cc.dtype)
        for grp in self.a_groups:
            if grp[0] == "bc":
                _, d, rows, coords, gamma = grp
                if gamma == 0.0:
                    continue
                _, val = self._bc_fn(self.i_phi, d, coords, params or {})
                val = gamma * (jnp.asarray(val, cc.dtype)
                               + jnp.zeros((len(rows), nc * nc), cc.dtype))
                A = A.at[jnp.asarray(rows), d].add(val)
            else:
                _, d, rows, p, emask = grp
                tmp = cc[i_phi, jnp.asarray(p.rb_coarse)[:, None],
                         jnp.asarray(p.rb_tmp)]
                gci = gc._mg_rb_interp(tmp[None], 3, nc)[0]
                contrib = 0.5 * gci
                if emask is not None and emask.any():
                    pc = cc[i_phi, jnp.asarray(p.rb_parent)[:, None],
                            jnp.asarray(p.rb_pcopy)]
                    contrib = jnp.where(jnp.asarray(emask)[:, None],
                                        0.5 * pc, contrib)
                A = A.at[jnp.asarray(rows), d].add(contrib)
        interior = sp.interior_flat(3, nc)
        R = cc[i_rhs, ids[:, None], jnp.asarray(interior)[None, :]]
        R = R.reshape(n, nc, nc, nc)
        if self._op.f is not None:
            corr = self._op.bc_corr(phi_b)
            R = R + jnp.asarray(corr).reshape(n, nc, nc, nc)
        return A.reshape(n, 6, nc, nc), R

    def sweep(self, phi3, R, mask, interpret: bool = False):
        cs = jnp.asarray(self.cs, phi3.dtype)
        return _sweep_3d(phi3, R, mask, self.g, cs, self.nc, self.n,
                         interpret)

    def fill(self, phi3, A, interpret: bool = False):
        W = jnp.asarray(self.W, phi3.dtype)
        return _fill_3d(phi3, A, self.g, W, self.nc, self.n, interpret)


def _sweep_3d(phi3, R, mask, g, cs, nc: int, n: int,
              interpret: bool = False):
    """Fused half red-black sweep over [n, C, C, C] level-local blocks
    (3D analog of _sweep_2d; g/cs may be runtime pack tables)."""
    C = nc + 2

    def kernel(g0, g1, g2, g3, g4, g5, g6, own_ref, cs_ref, R_ref,
               M_ref, o_ref):
        B = own_ref[0]
        c = cs_ref[0]
        B0 = B[1:nc + 1, 1:nc + 1, 1:nc + 1]
        # difference form, see LevelOp.c_sum / _sweep_2d
        lphi = (c[7] * B0
                + c[1] * (B[0:nc, 1:nc + 1, 1:nc + 1] - B0)
                + c[2] * (B[2:nc + 2, 1:nc + 1, 1:nc + 1] - B0)
                + c[3] * (B[1:nc + 1, 0:nc, 1:nc + 1] - B0)
                + c[4] * (B[1:nc + 1, 2:nc + 2, 1:nc + 1] - B0)
                + c[5] * (B[1:nc + 1, 1:nc + 1, 0:nc] - B0)
                + c[6] * (B[1:nc + 1, 1:nc + 1, 2:nc + 2] - B0))
        new = B0 + (R_ref[0] - lphi) / c[0]
        upd = jnp.where(M_ref[...] > 0, new, B0)
        o_ref[0] = B
        o_ref[0, 1:nc + 1, 1:nc + 1, 1:nc + 1] = upd

    gs = [jnp.asarray(g[:, k], jnp.int32) for k in range(7)]
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, C, C, C),
                             lambda i, g0, *g: (g0[i], z(), z(), z())),
                pl.BlockSpec((1, 8, nc, nc, nc),
                             lambda i, *g: (i, z(), z(), z(), z())),
                pl.BlockSpec((1, nc, nc, nc),
                             lambda i, *g: (i, z(), z(), z())),
                pl.BlockSpec((nc, nc, nc),
                             lambda i, *g: (z(), z(), z())),
            ],
            out_specs=pl.BlockSpec(
                (1, C, C, C), lambda i, *g: (i, z(), z(), z())),
        ),
        out_shape=jax.ShapeDtypeStruct((n, C, C, C), phi3.dtype),
        interpret=interpret,
    )(*gs, phi3, cs, R, mask)


def _fill_3d(phi3, A, g, W, nc: int, n: int, interpret: bool = False):
    """Fused ghost exchange over [n, C, C, C] level-local blocks."""
    C = nc + 2
    faces = [
        (0, True, nc, 1, 2, 0), (0, False, 1, nc, nc - 1, nc + 1),
        (1, True, nc, 1, 2, 0), (1, False, 1, nc, nc - 1, nc + 1),
        (2, True, nc, 1, 2, 0), (2, False, 1, nc, nc - 1, nc + 1),
    ]

    def face_slab(B, axis, row):
        if axis == 0:
            return B[row, 1:nc + 1, 1:nc + 1]
        if axis == 1:
            return B[1:nc + 1, row, 1:nc + 1]
        return B[1:nc + 1, 1:nc + 1, row]

    def kernel(g0, g1, g2, g3, g4, g5, g6, own_ref, n0, n1, n2, n3,
               n4, n5, W_ref, A_ref, o_ref):
        B = own_ref[0]
        nbs = (n0[0], n1[0], n2[0], n3[0], n4[0], n5[0])
        o_ref[0] = B
        for d, (axis, low, nb_row, f1_row, f2_row, g_row) in \
                enumerate(faces):
            slab = face_slab(nbs[d], axis, nb_row)
            f1 = face_slab(B, axis, f1_row)
            f2 = face_slab(B, axis, f2_row)
            w = W_ref[0, d]
            ghost = (w[0] * slab + w[1] * f1 + w[2] * f2
                     + A_ref[0, d])
            if axis == 0:
                o_ref[0, g_row, 1:nc + 1, 1:nc + 1] = ghost
            elif axis == 1:
                o_ref[0, 1:nc + 1, g_row, 1:nc + 1] = ghost
            else:
                o_ref[0, 1:nc + 1, 1:nc + 1, g_row] = ghost

    gs = [jnp.asarray(g[:, k], jnp.int32) for k in range(7)]

    def gsel(k):
        return lambda i, *g: (g[k][i], z(), z(), z())
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=(n,),
            in_specs=(
                [pl.BlockSpec((1, C, C, C), gsel(k))
                 for k in range(7)]
                + [pl.BlockSpec((1, 6, 8), lambda i, *g: (i, z(), z())),
                   pl.BlockSpec((1, 6, nc, nc),
                                lambda i, *g: (i, z(), z(), z()))]),
            out_specs=pl.BlockSpec(
                (1, C, C, C), lambda i, *g: (i, z(), z(), z())),
        ),
        out_shape=jax.ShapeDtypeStruct((n, C, C, C), phi3.dtype),
        interpret=interpret,
    )(*gs, phi3, phi3, phi3, phi3, phi3, phi3, phi3, W, A)


# ---------------------------------------------------------------------------
# Epoch-pack mode: runtime tables instead of baked constants
# ---------------------------------------------------------------------------
class PackSmoother2D:
    """Fused-smoother tables for one level in epoch-pack mode.

    The legacy :class:`PallasSmoother2D` bakes its neighbor-row and
    ghost-weight tables into the trace as constants, which retraces on
    every refinement epoch. This variant builds the same tables on the
    host per epoch from the *padded* pack plan (core/treepack.py) and is
    registered as a pytree, so the tables flow into the jitted units as
    runtime arguments: epochs with equal bucket shapes reuse the
    compiled kernels.

    Padded plan entries (key box = trash) are routed to a sacrificial
    row ``n`` during the host build and sliced away, so they can never
    corrupt a real box's weights. Level rows that are themselves padding
    keep ``g = self`` and scatter back to the global trash row.
    """

    def __init__(self, tree: Tree, lvl: int, plan, tb, bc_fn, i_phi: int,
                 trash: int):
        nc, ndim = tree.nc, tree.ndim
        assert ndim == 2
        self.nc = nc
        ids = np.asarray(tb.ids)
        n = len(ids)
        self.n = n
        # box id -> local row; trash (padded) -> sacrificial row n
        pos = np.full(max(int(ids.max(initial=0)), trash) + 2, n,
                      np.int64)
        realm = ids != trash
        pos[ids[realm]] = np.nonzero(realm)[0]

        g = np.tile(np.arange(n + 1, dtype=np.int64)[:, None], (1, 5))
        W = np.zeros((n + 1, 4, 8))
        bc_recipe = []
        rb_dirs = []
        bc_pos = [None] * 4
        rb_pos = [None] * 4
        for d, p in enumerate(plan.dirs):
            if len(p.copy_ids):
                rows = pos[np.asarray(p.copy_ids)]
                g[rows, 1 + d] = pos[np.asarray(p.copy_nb)]
                W[rows, d, 0] = 1.0
            if len(p.bc_ids):
                bc_type, _ = bc_fn(i_phi, d, p.bc_coords, {})
                rows = pos[np.asarray(p.bc_ids)]
                dim, low = neighb_dim(d), neighb_low(d)
                if bc_type == gc.BC_DIRICHLET:
                    W[rows, d, 1] = -1.0
                    gamma = 2.0
                elif bc_type == gc.BC_NEUMANN:
                    W[rows, d, 1] = 1.0
                    gamma = (1.0 if not low else -1.0) * float(plan.dr[dim])
                elif bc_type == gc.BC_CONTINUOUS:
                    W[rows, d, 1] = 2.0
                    W[rows, d, 2] = -1.0
                    gamma = 0.0
                elif bc_type == gc.BC_DIRICHLET_COPY:
                    gamma = 1.0
                else:
                    raise ValueError("unsupported bc type")
                bc_recipe.append((d, int(bc_type), float(gamma)))
                bc_pos[d] = rows.astype(np.int32)
            if len(p.rb_ids):
                rows = pos[np.asarray(p.rb_ids)]
                W[rows, d, 1] = 0.75
                W[rows, d, 2] = -0.25
                rb_dirs.append(d)
                rb_pos[d] = rows.astype(np.int32)
        # the sacrificial row collected every padded entry's writes
        self.g = g[:n].astype(np.int32)
        self.W = W[:n]
        self.bc_pos = bc_pos
        self.rb_pos = rb_pos
        self.bc_recipe = tuple(bc_recipe)
        self.rb_dirs = tuple(rb_dirs)

    # ------------------------------------------------- per-visit consts
    def build_consts(self, cc, i_phi, i_rhs, plan, tb, op, bc_fn, params):
        """A[n, 4, nc] ghost constants (physical-boundary values folded
        with the runtime voltage; mg_sides_rb coarse-strip interpolation)
        and the rhs block. LSF/eps operators are not supported in pack
        mode (multigrid.enable_jit rejects them)."""
        nc, n = self.nc, self.n
        dtype = cc.dtype
        A = jnp.zeros((n + 1, 4, nc), dtype)
        for d, _bc_type, gamma in self.bc_recipe:
            if gamma == 0.0:
                continue
            p = plan.dirs[d]
            _, val = bc_fn(i_phi, d, p.bc_coords, params or {})
            nbc = len(self.bc_pos[d])
            val = gamma * (jnp.asarray(val).astype(dtype)
                           + jnp.zeros((nbc, nc), dtype))
            A = A.at[jnp.asarray(self.bc_pos[d]), d].add(val)
        for d in self.rb_dirs:
            p = plan.dirs[d]
            tmp = cc[i_phi, jnp.asarray(sp.aix(p.rb_coarse))[:, None],
                     jnp.asarray(sp.aix(p.rb_tmp))]
            gci = gc._mg_rb_interp(tmp[None], 2, nc)[0]
            A = A.at[jnp.asarray(self.rb_pos[d]), d].add(
                (0.5 * gci).astype(dtype))
        A = A[:n]
        interior = sp.interior_flat(2, nc)
        ids = jnp.asarray(sp.aix(tb.ids))
        R = cc[i_rhs, ids[:, None],
               jnp.asarray(interior)[None, :]].reshape(n, nc, nc)
        return A, R

    def make_cs(self, op, dtype):
        """Stencil coefficient blocks [n, 6, nc, nc] from the (runtime)
        LevelOp coefficients (c0, 4 neighbors, c_sum); the broadcast
        happens on device inside the jitted unit (cheap, fused by XLA)."""
        n, nc = self.n, self.nc
        cols = [jnp.broadcast_to(jnp.asarray(op.c0).astype(dtype),
                                 (n, nc, nc))]
        for d in range(4):
            cols.append(jnp.broadcast_to(
                jnp.asarray(op.c_nb[d]).astype(dtype), (n, nc, nc)))
        cols.append(jnp.broadcast_to(
            jnp.asarray(op.c_sum).astype(dtype), (n, nc, nc)))
        return jnp.stack(cols, axis=1)

    def sweep(self, phi3, R, mask, cs, interpret: bool = False):
        return _sweep_2d(phi3, R, mask, self.g, cs, self.nc, self.n,
                         interpret)

    def fill(self, phi3, A, interpret: bool = False):
        W = jnp.asarray(self.W).astype(phi3.dtype)
        return _fill_2d(phi3, A, self.g, W, self.nc, self.n, False,
                        interpret)

    def fill_sweep(self, phi3, R, mask, A, cs, interpret: bool = False):
        """One kernel for the (ghost fill, red-black sweep) pair — the
        values are exactly fill(...) then sweep(...)."""
        W = jnp.asarray(self.W).astype(phi3.dtype)
        return _fill_sweep_2d(phi3, R, mask, A, self.g, W, cs, self.nc,
                              self.n, interpret)


def _register_pack_smoother():
    from ..core.treepack import register_plan
    try:
        register_plan(PackSmoother2D,
                      dyn_fields=("g", "W", "bc_pos", "rb_pos"),
                      aux_fields=("nc", "n", "bc_recipe", "rb_dirs"))
    except ValueError:
        pass  # already registered


_register_pack_smoother()


class PackSmoother3D:
    """3D analog of :class:`PackSmoother2D`: runtime neighbor-row and
    ghost-weight tables built per epoch from the padded pack plan."""

    def __init__(self, tree: Tree, lvl: int, plan, tb, bc_fn, i_phi: int,
                 trash: int):
        nc, ndim = tree.nc, tree.ndim
        assert ndim == 3
        self.nc = nc
        ids = np.asarray(tb.ids)
        n = len(ids)
        self.n = n
        pos = np.full(max(int(ids.max(initial=0)), trash) + 2, n,
                      np.int64)
        realm = ids != trash
        pos[ids[realm]] = np.nonzero(realm)[0]

        g = np.tile(np.arange(n + 1, dtype=np.int64)[:, None], (1, 7))
        W = np.zeros((n + 1, 6, 8))
        bc_recipe = []
        rb_dirs = []
        bc_pos = [None] * 6
        rb_pos = [None] * 6
        for d, p in enumerate(plan.dirs):
            if len(p.copy_ids):
                rows = pos[np.asarray(p.copy_ids)]
                g[rows, 1 + d] = pos[np.asarray(p.copy_nb)]
                W[rows, d, 0] = 1.0
            if len(p.bc_ids):
                bc_type, _ = bc_fn(i_phi, d, p.bc_coords, {})
                rows = pos[np.asarray(p.bc_ids)]
                dim, low = neighb_dim(d), neighb_low(d)
                if bc_type == gc.BC_DIRICHLET:
                    W[rows, d, 1] = -1.0
                    gamma = 2.0
                elif bc_type == gc.BC_NEUMANN:
                    W[rows, d, 1] = 1.0
                    gamma = (1.0 if not low else -1.0) * float(plan.dr[dim])
                elif bc_type == gc.BC_CONTINUOUS:
                    W[rows, d, 1] = 2.0
                    W[rows, d, 2] = -1.0
                    gamma = 0.0
                elif bc_type == gc.BC_DIRICHLET_COPY:
                    gamma = 1.0
                else:
                    raise ValueError("unsupported bc type")
                bc_recipe.append((d, int(bc_type), float(gamma)))
                bc_pos[d] = rows.astype(np.int32)
            if len(p.rb_ids):
                rows = pos[np.asarray(p.rb_ids)]
                W[rows, d, 1] = 0.75
                W[rows, d, 2] = -0.25
                rb_dirs.append(d)
                rb_pos[d] = rows.astype(np.int32)
        self.g = g[:n].astype(np.int32)
        self.W = W[:n]
        self.bc_pos = bc_pos
        self.rb_pos = rb_pos
        self.bc_recipe = tuple(bc_recipe)
        self.rb_dirs = tuple(rb_dirs)

    def build_consts(self, cc, i_phi, i_rhs, plan, tb, op, bc_fn, params):
        """A[n, 6, nc, nc] ghost constants + rhs block (3D analog of
        PackSmoother2D.build_consts)."""
        nc, n = self.nc, self.n
        dtype = cc.dtype
        A = jnp.zeros((n + 1, 6, nc * nc), dtype)
        for d, _bc_type, gamma in self.bc_recipe:
            if gamma == 0.0:
                continue
            p = plan.dirs[d]
            _, val = bc_fn(i_phi, d, p.bc_coords, params or {})
            nbc = len(self.bc_pos[d])
            val = gamma * (jnp.asarray(val).astype(dtype)
                           + jnp.zeros((nbc, nc * nc), dtype))
            A = A.at[jnp.asarray(self.bc_pos[d]), d].add(val)
        for d in self.rb_dirs:
            p = plan.dirs[d]
            tmp = cc[i_phi, jnp.asarray(sp.aix(p.rb_coarse))[:, None],
                     jnp.asarray(sp.aix(p.rb_tmp))]
            gci = gc._mg_rb_interp(tmp[None], 3, nc)[0]
            A = A.at[jnp.asarray(self.rb_pos[d]), d].add(
                (0.5 * gci).astype(dtype))
        A = A[:n].reshape(n, 6, nc, nc)
        interior = sp.interior_flat(3, nc)
        ids = jnp.asarray(sp.aix(tb.ids))
        R = cc[i_rhs, ids[:, None],
               jnp.asarray(interior)[None, :]].reshape(n, nc, nc, nc)
        return A, R

    def make_cs(self, op, dtype):
        """Stencil blocks [n, 8, nc, nc, nc]: c0, 6 neighbors, c_sum."""
        n, nc = self.n, self.nc
        cols = [jnp.broadcast_to(jnp.asarray(op.c0).astype(dtype),
                                 (n, nc, nc, nc))]
        for d in range(6):
            cols.append(jnp.broadcast_to(
                jnp.asarray(op.c_nb[d]).astype(dtype), (n, nc, nc, nc)))
        cols.append(jnp.broadcast_to(
            jnp.asarray(op.c_sum).astype(dtype), (n, nc, nc, nc)))
        return jnp.stack(cols, axis=1)

    def sweep(self, phi3, R, mask, cs, interpret: bool = False):
        return _sweep_3d(phi3, R, mask, self.g, cs, self.nc, self.n,
                         interpret)

    def fill(self, phi3, A, interpret: bool = False):
        W = jnp.asarray(self.W).astype(phi3.dtype)
        return _fill_3d(phi3, A, self.g, W, self.nc, self.n, interpret)


def _register_pack_smoother_3d():
    from ..core.treepack import register_plan
    try:
        register_plan(PackSmoother3D,
                      dyn_fields=("g", "W", "bc_pos", "rb_pos"),
                      aux_fields=("nc", "n", "bc_recipe", "rb_dirs"))
    except ValueError:
        pass


_register_pack_smoother_3d()
