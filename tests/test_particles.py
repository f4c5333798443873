"""Particle <-> grid transfer (core/particles.py vs m_af_particles.f90)."""

import numpy as np
import pytest

from afivo_streamer_tpu.core import particles as part
from afivo_streamer_tpu.core import spatial as sp
from afivo_streamer_tpu.core.tree import Tree, DO_REF, KEEP_REF


def _refined_tree(ndim=2, nc=8):
    t = Tree(ndim, nc, [1.0] * ndim, [2 * nc] * ndim)

    def flags(ids):
        # refine the quadrant near the origin twice
        out = []
        for b in ids:
            rmin = t.box_r_min(np.asarray([int(b)]))[0]
            f = DO_REF if np.all(rmin < 0.4) and t.lvl[int(b)] < 3 \
                else KEEP_REF
            out.append(np.full((nc,) * ndim, f))
        return np.asarray(out)

    for _ in range(2):
        t.adjust_refinement(flags)
    return t


def test_locate_levels():
    t = _refined_tree()
    r = np.array([[0.1, 0.1], [0.9, 0.9], [-0.1, 0.5], [0.5, 0.99]])
    ids = part.locate(t, r)
    assert ids[2] == -1
    assert t.lvl[ids[0]] == 3          # refined corner
    assert t.lvl[ids[1]] == 1
    assert t.children[ids[0], 0] < 0   # a leaf
    # the containing box really contains the point
    for k in (0, 1, 3):
        r0 = t.box_r_min(np.asarray([ids[k]]))[0]
        dx = t.lvl_dr(int(t.lvl[ids[k]])) * t.nc
        assert np.all(r[k] >= r0) and np.all(r[k] < r0 + dx)


@pytest.mark.parametrize("order", [0, 1])
def test_deposit_conserves_weight(order):
    # order 1 spills across refinement boundaries onto same-level
    # neighbors that may be parents (exactly as the reference's
    # tree_add_from_ghostcells), so strict leaf conservation holds on a
    # uniform tree; order 0 deposits into the located leaf cell directly
    t = Tree(2, 8, [1.0, 1.0], [16, 16]) if order == 1 \
        else _refined_tree()
    nv, nc = 1, t.nc
    cc = np.zeros((nv, t.highest_id + 1, (nc + 2) ** t.ndim))
    rng = np.random.default_rng(3)
    r = rng.uniform(0.05, 0.95, size=(500, 2))
    w = rng.uniform(0.5, 2.0, size=500)
    cc = part.particles_to_grid(cc, t, 0, r, w, order=order,
                                density=False)
    # total deposited weight over LEAF interiors equals the input sum
    leaves = np.concatenate([np.asarray(l) for l in t.lvl_leaves])
    interior = sp.interior_flat(t.ndim, nc)
    total = cc[0, leaves[:, None], interior[None, :]].sum()
    np.testing.assert_allclose(total, w.sum(), rtol=1e-12)


def test_density_deposit_integrates_back():
    t = _refined_tree()
    nc = t.nc
    cc = np.zeros((1, t.highest_id + 1, (nc + 2) ** t.ndim))
    r = np.array([[0.7, 0.7], [0.12, 0.08]])
    cc = part.particles_to_grid(cc, t, 0, r, np.array([3.0, 5.0]),
                                order=0, density=True)
    # integral n dV == total weight
    total = 0.0
    for lvl in range(1, t.highest_lvl + 1):
        leaves = np.asarray(t.lvl_leaves[lvl - 1])
        if not len(leaves):
            continue
        vol = float(np.prod(t.lvl_dr(lvl)))
        interior = sp.interior_flat(t.ndim, nc)
        total += cc[0, leaves[:, None], interior[None, :]].sum() * vol
    np.testing.assert_allclose(total, 8.0, rtol=1e-12)


def test_linear_interpolation_exact_for_linear_field():
    t = _refined_tree()
    nc = t.nc
    cc = np.zeros((1, t.highest_id + 1, (nc + 2) ** t.ndim))
    # fill cc[0] (incl. ghosts) with f(x, y) = 2x + 3y + 1 at centers
    for lvl in range(1, t.highest_lvl + 1):
        ids = np.asarray(t.lvl_ids[lvl - 1])
        if not len(ids):
            continue
        dr = t.lvl_dr(lvl)
        r0 = t.box_r_min(ids)
        ax = np.arange(nc + 2) - 0.5
        gx, gy = np.meshgrid(ax, ax, indexing="ij")
        for k, b in enumerate(ids):
            x = r0[k, 0] + gx * dr[0]
            y = r0[k, 1] + gy * dr[1]
            cc[0, int(b)] = (2 * x + 3 * y + 1).ravel()
    rng = np.random.default_rng(5)
    r = rng.uniform(0.1, 0.9, size=(200, 2))
    vals = part.grid_to_particles(cc, t, 0, r)
    np.testing.assert_allclose(vals, 2 * r[:, 0] + 3 * r[:, 1] + 1,
                               rtol=1e-12)
