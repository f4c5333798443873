"""Tests for tree topology, ghost cells, prolongation/restriction.

Mirrors the reference's afivo framework tests (``afivo/tests/``,
test_ghostcell / test_refinement) plus exactness checks: the interpolation
schemes reproduce linear fields exactly at refinement boundaries.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from afivo_streamer_tpu.core.tree import (Tree, NO_BOX, PHYS_BOUNDARY, DO_REF,
                                          KEEP_REF, RM_REF)
from afivo_streamer_tpu.core.batch import BoxBatch
from afivo_streamer_tpu.core import ghostcell as gc
from afivo_streamer_tpu.core import prolong_restrict as pr
from afivo_streamer_tpu.core import spatial as sp


def neumann0(iv, d, coords, params):
    return gc.BC_NEUMANN, 0.0


def dirichlet0(iv, d, coords, params):
    return gc.BC_DIRICHLET, 0.0


def make_tree_1d():
    return Tree(1, 8, [32e-3], [8])


def test_tree_init_2d():
    t = Tree(2, 8, [16e-3, 16e-3], [16, 16])
    assert t.highest_lvl == 1
    assert len(t.lvl_ids[0]) == 4
    # all level-1 boxes are leaves
    assert len(t.lvl_leaves[0]) == 4
    # neighbors: interior vs physical
    b00 = [int(b) for b in t.lvl_ids[0] if tuple(t.ix[b]) == (0, 0)][0]
    assert t.neighbors[b00, 0] == PHYS_BOUNDARY  # low-x
    assert t.neighbors[b00, 1] >= 0              # high-x
    assert t.neighbors[b00, 2] == PHYS_BOUNDARY  # low-y


def test_refine_up_to_lvl():
    t = Tree(2, 8, [16e-3, 16e-3], [16, 16])
    t.refine_up_to_lvl(3)
    assert t.highest_lvl == 3
    assert len(t.lvl_ids[2]) == 64
    assert len(t.all_leaves) == 64
    # check 2:1 neighbor wiring at level 3
    for b in t.lvl_ids[2]:
        for d in range(4):
            nb = t.neighbors[b, d]
            assert nb >= 0 or nb == PHYS_BOUNDARY


def test_adjust_refinement_balance():
    t = Tree(2, 8, [16e-3, 16e-3], [16, 16])

    # refine one corner box repeatedly; 2:1 balance must refine neighbors
    def flags_fn(ids):
        out = np.full((len(ids), t.nc, t.nc), KEEP_REF, dtype=np.int64)
        for n, b in enumerate(ids):
            r0 = t.box_r_min(np.asarray([int(b)]))[0]
            if np.all(r0 < 1e-9) and t.lvl[int(b)] == t.highest_lvl:
                out[n, 0, 0] = DO_REF
        return out

    for _ in range(3):
        t.adjust_refinement(flags_fn, ref_buffer=0)
    assert t.highest_lvl == 4
    # 2:1 balance: no leaf has a neighbor more than one level away
    for lvl in range(1, t.highest_lvl + 1):
        for b in t.lvl_leaves[lvl - 1]:
            for d in range(4):
                if t.neighbors[b, d] == NO_BOX:
                    p = t.parent[b]
                    assert t.neighbors[p, d] >= 0


def _fill_linear_np(cc, t, iv, coef, const=1.0):
    """Set cc = coef . r + const on interior + ghost of every box."""
    for lvl in range(1, t.highest_lvl + 1):
        for b in t.lvl_ids[lvl - 1]:
            coords = t.cell_coords(int(b))
            vals = coords @ np.asarray(coef) + const
            cc[iv, int(b)] = vals.ravel()
    return cc


def _zero_ghosts_np(cc, t, iv):
    nc, ndim = t.nc, t.ndim
    interior = np.zeros([nc + 2] * ndim, dtype=bool)
    interior[tuple([slice(1, nc + 1)] * ndim)] = True
    for b in range(t.highest_id):
        if not t.in_use[b]:
            continue
        v = cc[iv, b].reshape([nc + 2] * ndim)
        v[~interior] = 0.0
    return cc


@pytest.mark.parametrize("ndim", [1, 2, 3])
def test_gc_linear_exact(ndim):
    """Ghost filling of a linear field is exact for interp and mg_sides_rb,
    with refinement boundaries present."""
    nc = 8
    t = Tree(ndim, nc, [16e-3] * ndim, [16] * ndim)

    # refine the low corner once -> refinement boundaries at level 2
    def flags_fn(ids):
        out = np.full([len(ids)] + [nc] * ndim, KEEP_REF, dtype=np.int64)
        for n, b in enumerate(ids):
            r0 = t.box_r_min(np.asarray([int(b)]))[0]
            if np.all(r0 < 1e-9) and t.lvl[int(b)] == 1:
                out[n] = DO_REF
        return out

    t.adjust_refinement(flags_fn)
    assert t.highest_lvl == 2

    batch = BoxBatch(t, 1, 0)
    coef = np.arange(1, ndim + 1) * 1000.0
    cc0 = _fill_linear_np(np.array(batch.cc), t, 0, coef)
    cc0 = _zero_ghosts_np(cc0, t, 0)

    # a linear-exact BC: use continuous (x0 = 2 x1 - x2)
    def bc_cont(iv, d, coords, params):
        return gc.BC_CONTINUOUS, 0.0

    for rb_method in (gc.RB_INTERP, gc.RB_MG):
        cc = cc0.copy()
        for lvl in range(1, t.highest_lvl + 1):
            plan = gc.get_gc_plan(t, lvl)
            cc = gc.fill_ghosts_lvl(cc, plan, [0], rb_method, bc_cont, {})
        # every box's ghost layer must match the linear field
        for b in range(t.highest_id):
            if not t.in_use[b]:
                continue
            coords = t.cell_coords(int(b))
            expect = coords @ coef + 1.0
            got = np.asarray(cc[0, b]).reshape(*([nc + 2] * ndim))
            assert np.allclose(got, expect, rtol=1e-12, atol=1e-8), \
                f"rb={rb_method} ndim={ndim} box={b} lvl={t.lvl[b]}"


def test_bc_formulas_1d():
    t = make_tree_1d()
    batch = BoxBatch(t, 1, 0)
    cc0 = _fill_linear_np(np.array(batch.cc), t, 0, [2.0], 0.0)
    plan = gc.get_gc_plan(t, 1)

    cc = gc.fill_ghosts_lvl(cc0.copy(), plan, [0], gc.RB_INTERP, dirichlet0, {})
    b = int(t.lvl_ids[0][0])
    v = np.asarray(cc[0, b])
    # Dirichlet 0: ghost = -first interior
    assert np.isclose(v[0], -v[1])
    cc = gc.fill_ghosts_lvl(cc0.copy(), plan, [0], gc.RB_INTERP, neumann0, {})
    v = np.asarray(cc[0, b])
    assert np.isclose(v[0], v[1])


@pytest.mark.parametrize("ndim", [1, 2])
def test_prolong_linear_exact(ndim):
    nc = 8
    t = Tree(ndim, nc, [1.0] * ndim, [16] * ndim)
    t.refine_up_to_lvl(2)
    batch = BoxBatch(t, 1, 0)
    coef = np.arange(1, ndim + 1) * 3.0
    cc0 = _fill_linear_np(np.array(batch.cc), t, 0, coef)
    # zero the children interiors, then prolong from parents
    for b in t.lvl_ids[1]:
        cc0[0, int(b)] = 0.0
    plan = pr.get_full_plan(t, 2)
    for method in ("linear", "limit", "linear_cons", "sparse"):
        if method == "linear_cons" and t.coord == "cyl":
            continue
        cc = pr.prolong(cc0.copy(), plan, [0], method)
        for b in t.lvl_ids[1]:
            coords = t.cell_coords(int(b))
            expect = coords @ coef + 1.0
            got = np.asarray(cc[0, int(b)]).reshape(*([nc + 2] * ndim))
            itr = tuple([slice(1, nc + 1)] * ndim)
            assert np.allclose(got[itr], expect[itr], rtol=1e-12), method


@pytest.mark.parametrize("ndim", [1, 2, 3])
def test_restrict_average(ndim):
    nc = 4
    t = Tree(ndim, nc, [1.0] * ndim, [8] * ndim)
    t.refine_up_to_lvl(2)
    batch = BoxBatch(t, 1, 0)
    cc0 = np.array(batch.cc)
    rng = np.random.default_rng(0)
    vals = {}
    for b in t.lvl_ids[1]:
        v = rng.random([nc + 2] * ndim)
        vals[int(b)] = v
        cc0[0, int(b)] = v.ravel()
    plan = pr.get_full_plan(t, 2)
    cc = pr.restrict(cc0, plan, [0], use_geometry=False)
    # parent interior values must equal the mean of 2^ndim children cells
    for p in t.lvl_ids[0]:
        got = np.asarray(cc[0, int(p)]).reshape(*([nc + 2] * ndim))
        for c in t.children[int(p)]:
            off = t.child_offset(int(c))
            v = vals[int(c)]
            for idx in np.ndindex(*([nc // 2] * ndim)):
                idx = np.asarray(idx)
                fine = v[tuple(slice(1 + 2 * i, 3 + 2 * i) for i in idx)]
                tgt = tuple(off + idx + 1)
                assert np.isclose(got[tgt], fine.mean())


def test_restrict_cyl_weights():
    """Cylindrical restriction is volume-weighted (af_restrict_box cyl)."""
    nc = 4
    t = Tree(2, nc, [1.0, 1.0], [8, 8], coord="cyl")
    t.refine_up_to_lvl(2)
    batch = BoxBatch(t, 1, 0)
    cc0 = np.array(batch.cc)
    # f = r: volume-weighted average of r over the 4 fine cells
    for b in t.lvl_ids[1]:
        coords = t.cell_coords(int(b))
        cc0[0, int(b)] = coords[..., 0].ravel()
    plan = pr.get_full_plan(t, 2)
    cc = pr.restrict(cc0, plan, [0], use_geometry=True)
    p = int(t.lvl_ids[0][0])
    got = np.asarray(cc[0, p]).reshape(nc + 2, nc + 2)
    coords_p = t.cell_coords(p)
    drp = t.lvl_dr(1)[0]
    # exact volume-weighted mean of f=r over a coarse cell of width drp
    # centered at r_c: (r_c^2 + dr^2/12 ... ) -> for children at +-dr/4:
    # w1*(r_c - dr/4) + w2*(r_c + dr/4) with w = 1 -+ dr/(4 r_c)
    r_c = coords_p[1:-1, 1:-1, 0]
    tmp = 0.25 * drp / r_c
    expect = 0.5 * ((1 - tmp) * (r_c - drp / 4) + (1 + tmp) * (r_c + drp / 4))
    assert np.allclose(got[1:-1, 1:-1], expect, rtol=1e-12)


def test_prolong_linear_cons_cyl_conserves():
    """Cylindrical conservative prolongation preserves the volume integral
    per coarse cell (af_prolong_linear_cons, m_af_prolong.f90:472-476)."""
    nc = 4
    t = Tree(2, nc, [1.0, 1.0], [8, 8], coord="cyl")
    t.refine_up_to_lvl(2)
    batch = BoxBatch(t, 1, 0)
    cc0 = np.array(batch.cc)
    rng = np.random.default_rng(1)
    for b in t.lvl_ids[0]:
        cc0[0, int(b)] = rng.random((nc + 2) ** 2)
    for b in t.lvl_ids[1]:
        cc0[0, int(b)] = 0.0
    plan = pr.get_full_plan(t, 2)
    cc = pr.prolong(cc0.copy(), plan, [0], "linear_cons")
    # per coarse cell: sum_children r_f u_f / 4 == r_c u_c
    for p in t.lvl_ids[0]:
        p = int(p)
        got = np.zeros((nc, nc))
        for c in t.children[p]:
            off = t.child_offset(int(c))
            v = np.asarray(cc[0, int(c)]).reshape(nc + 2, nc + 2)
            r = t.cell_coords(int(c))[..., 0]
            ru = (v * r)[1:-1, 1:-1]
            # sum fine 2x2 blocks into the coarse cells they cover
            s = ru.reshape(nc // 2, 2, nc // 2, 2).sum(axis=(1, 3)) / 4.0
            got[off[0]:off[0] + nc // 2, off[1]:off[1] + nc // 2] += s
        pv = np.asarray(cc0[0, p]).reshape(nc + 2, nc + 2)[1:-1, 1:-1]
        r_c = t.cell_coords(p)[1:-1, 1:-1, 0]
        assert np.allclose(got, pv * r_c, rtol=1e-12)
