"""Multigrid Poisson tests with analytic solutions.

Mirrors the reference's afivo examples used as semi-tests
(``afivo/examples/poisson_basic.f90``, ``poisson_cyl_analytic.f90``):
solve lap(phi) = rhs with the exact solution imposed via Dirichlet
boundaries, on uniform and locally refined meshes, in 1D/2D/3D/cylindrical.
"""

import numpy as np
import pytest

from afivo_streamer_tpu.core.tree import Tree, DO_REF, KEEP_REF
from afivo_streamer_tpu.core.batch import BoxBatch
from afivo_streamer_tpu.core import ghostcell as gc
from afivo_streamer_tpu.solvers.multigrid import Multigrid

I_PHI, I_RHS, I_TMP = 0, 1, 2


def setup(ndim, refine=False, coord="xyz", nc=8, n1=16):
    t = Tree(ndim, nc, [1.0] * ndim, [n1] * ndim, coord=coord)
    if refine:
        def flags(ids):
            out = np.full([len(ids)] + [nc] * ndim, KEEP_REF, np.int64)
            for n, b in enumerate(ids):
                r0 = t.box_r_min(np.asarray([int(b)]))[0]
                ctr = r0 + 0.5 * t.nc * t.lvl_dr(int(t.lvl[int(b)]))
                if np.all(np.abs(ctr - 0.3) < 0.25) and \
                        t.lvl[int(b)] == t.highest_lvl:
                    out[n] = DO_REF
            return out
        t.adjust_refinement(flags, ref_buffer=2)
        t.adjust_refinement(flags, ref_buffer=2)
    return t


def exact_and_rhs(ndim, coord):
    if coord == "cyl":
        # phi = r^2 + z^2 -> lap phi = 4 + 2 = 6
        def phi(r):
            return r[..., 0] ** 2 + r[..., 1] ** 2

        def rhs(r):
            return 6.0 + 0.0 * r[..., 0]
        return phi, rhs
    k = 2.0 * np.pi

    def phi(r):
        out = 1.0
        for d in range(ndim):
            out = out * np.sin(k * r[..., d])
        return out

    def rhs(r):
        return -ndim * k**2 * phi(r)
    return phi, rhs


@pytest.mark.parametrize("ndim,refine,coord", [
    (1, False, "xyz"), (2, False, "xyz"), (2, True, "xyz"),
    (3, False, "xyz"), (2, False, "cyl"), (2, True, "cyl"),
])
def test_poisson(ndim, refine, coord):
    nc, n1 = 8, 16
    t = setup(ndim, refine, coord, nc, n1)
    batch = BoxBatch(t, 3, 0)
    cc = np.array(batch.cc)
    phi_f, rhs_f = exact_and_rhs(ndim, coord)

    for lvl in range(1, t.highest_lvl + 1):
        for b in t.lvl_ids[lvl - 1]:
            r = t.cell_coords(int(b))
            cc[I_RHS, int(b)] = rhs_f(r).ravel()

    def bc(iv, d, coords, params):
        if coord == "cyl" and d == 0:
            return gc.BC_NEUMANN, 0.0  # symmetry axis
        return gc.BC_DIRICHLET, phi_f(coords)

    mg = Multigrid(t, I_PHI, I_RHS, I_TMP, bc)
    cc = mg.fill_ghosts_phi(cc, {})
    cc = mg.fas_fmg(cc, {}, set_residual=True, have_guess=False)
    for _ in range(8):
        cc = mg.fas_vcycle(cc, {}, set_residual=True)
    res = float(mg.max_abs_residual(cc))
    max_rhs = float(np.max(np.abs(cc[I_RHS])))
    assert res < 1e-8 * max(max_rhs, 1.0), f"MG did not converge: {res}"

    # compare with analytic solution on the leaves
    err = 0.0
    hmax = 0.0
    for lvl in range(1, t.highest_lvl + 1):
        for b in t.lvl_leaves[lvl - 1]:
            r = t.cell_coords(int(b))
            got = cc[I_PHI, int(b)].reshape([nc + 2] * ndim)
            expect = phi_f(r)
            itr = tuple([slice(1, nc + 1)] * ndim)
            err = max(err, np.max(np.abs(got[itr] - expect[itr])))
            hmax = max(hmax, float(t.lvl_dr(lvl).max()))
    # second-order discretization error
    scale = 1.0 if coord == "cyl" else 4.0 * np.pi**2
    assert err < 2.0 * scale * hmax**2, f"error {err} too large (h={hmax})"


def test_vcycle_reduces_residual():
    """Each V-cycle must reduce the residual substantially (convergence
    factor well below 1), matching geometric multigrid behavior."""
    t = setup(2, refine=True)
    batch = BoxBatch(t, 3, 0)
    cc = np.array(batch.cc)
    phi_f, rhs_f = exact_and_rhs(2, "xyz")
    for lvl in range(1, t.highest_lvl + 1):
        for b in t.lvl_ids[lvl - 1]:
            r = t.cell_coords(int(b))
            cc[I_RHS, int(b)] = rhs_f(r).ravel()

    def bc(iv, d, coords, params):
        return gc.BC_DIRICHLET, 0.0

    mg = Multigrid(t, I_PHI, I_RHS, I_TMP, bc)
    cc = mg.fill_ghosts_phi(cc, {})
    res = [float(mg.max_abs_residual(cc))]
    for _ in range(6):
        cc = mg.fas_vcycle(cc, {})
        res.append(float(mg.max_abs_residual(cc)))
    # average contraction factor < 0.2
    factor = (res[-1] / res[0]) ** (1.0 / 6.0)
    assert factor < 0.2, f"weak V-cycle contraction: {factor}, {res}"


@pytest.mark.parametrize("refine", [False, True])
def test_poisson_dielectric_capacitor(refine):
    """Planar capacitor with a dielectric slab (eps=2 for y<0.25): the
    exact potential is piecewise linear with eps*E continuous across the
    interface (mg_box_lpld_stencil harmonic-mean couplings,
    ``afivo/src/m_af_multigrid.f90:1476-``). The discrete solution is
    exact for this profile, so the solver must reproduce it to roundoff."""
    nc, n1 = 8, 16
    ndim = 2
    a, e1, e2, V = 0.25, 2.0, 1.0, 100.0
    # piecewise-linear phi: slope c1 below the interface, c2 above
    c2 = V / ((e2 / e1) * a + (1 - a))
    c1 = (e2 / e1) * c2

    def phi_f(r):
        y = r[..., 1]
        return np.where(y < a, c1 * y, c1 * a + c2 * (y - a))

    t = Tree(ndim, nc, [1.0] * ndim, [n1] * ndim)
    if refine:
        def flags(ids):
            out = np.full([len(ids)] + [nc] * ndim, KEEP_REF, np.int64)
            for n, b in enumerate(ids):
                r0 = t.box_r_min(np.asarray([int(b)]))[0]
                ctr = r0 + 0.5 * t.nc * t.lvl_dr(int(t.lvl[int(b)]))
                # refine strictly inside the gas region (linear solution)
                if ctr[1] > 0.5 and t.lvl[int(b)] == t.highest_lvl:
                    out[n] = DO_REF
            return out
        t.adjust_refinement(flags, ref_buffer=0)

    I_EPS = 3
    batch = BoxBatch(t, 4, 0)
    cc = np.array(batch.cc)
    for lvl in range(1, t.highest_lvl + 1):
        for b in t.lvl_ids[lvl - 1]:
            r = t.cell_coords(int(b))  # incl. ghost layer
            cc[I_EPS, int(b)] = np.where(r[..., 1] < a, e1, e2).ravel()
            cc[I_RHS, int(b)] = 0.0

    def eps_data(lvl):
        ids = np.asarray(t.lvl_ids[lvl - 1])
        return cc[I_EPS, ids]

    def bc(iv, d, coords, params):
        if d // 2 == 0:
            return gc.BC_NEUMANN, 0.0
        return gc.BC_DIRICHLET, phi_f(coords)

    mg = Multigrid(t, I_PHI, I_RHS, I_TMP, bc, eps_data=eps_data)
    cc = mg.fill_ghosts_phi(cc, {})
    cc = mg.fas_fmg(cc, {}, set_residual=True, have_guess=False)
    for _ in range(10):
        cc = mg.fas_vcycle(cc, {}, set_residual=True)
    res = float(mg.max_abs_residual(cc))
    assert res < 1e-7, f"dielectric MG did not converge: {res}"

    err = 0.0
    for lvl in range(1, t.highest_lvl + 1):
        for b in t.lvl_leaves[lvl - 1]:
            r = t.cell_coords(int(b))
            got = cc[I_PHI, int(b)].reshape([nc + 2] * ndim)
            itr = tuple([slice(1, nc + 1)] * ndim)
            err = max(err, np.max(np.abs(got[itr] - phi_f(r)[itr])))
    assert err < 1e-8 * V, f"capacitor solution error {err}"


@pytest.mark.parametrize("coord", ["xyz", "cyl"])
def test_large_coarse_grid_uniform_mg(coord):
    """Coarse grids beyond the dense-solve cap use the geometric uniform
    multigrid (the PFMG analog, m_coarse_solver.f90:15-21): solve Poisson
    on a 256x256 level-1-only tree (65k unknowns > 32k dense cap)."""
    from afivo_streamer_tpu.solvers.coarse import UniformCoarseMG
    nc, n1, ndim = 8, 256, 2
    t = Tree(ndim, nc, [1.0] * ndim, [n1] * ndim, coord=coord)
    batch = BoxBatch(t, 3, 0)
    cc = np.array(batch.cc)
    phi_f, rhs_f = exact_and_rhs(ndim, coord)
    for b in t.lvl_ids[0]:
        r = t.cell_coords(int(b))
        cc[I_RHS, int(b)] = rhs_f(r).ravel()

    def bc(iv, d, coords, params):
        if coord == "cyl" and d == 0:
            return gc.BC_NEUMANN, 0.0
        return gc.BC_DIRICHLET, phi_f(coords)

    mg = Multigrid(t, I_PHI, I_RHS, I_TMP, bc)
    assert isinstance(mg.coarse_solver(), UniformCoarseMG)
    cc = mg.fill_ghosts_phi(cc, {})
    cc = mg.fas_fmg(cc, {}, set_residual=True, have_guess=False)
    res = float(mg.max_abs_residual(cc))
    max_rhs = float(np.max(np.abs(cc[I_RHS])))
    assert res < 1e-8 * max(max_rhs, 1.0), f"coarse MG did not converge: {res}"

    err = 0.0
    for b in t.lvl_leaves[0]:
        r = t.cell_coords(int(b))
        got = cc[I_PHI, int(b)].reshape([nc + 2] * ndim)
        expect = phi_f(r)
        itr = tuple([slice(1, nc + 1)] * ndim)
        err = max(err, np.max(np.abs(got[itr] - expect[itr])))
    h = float(t.lvl_dr(1).max())
    scale = 1.0 if coord == "cyl" else 4.0 * np.pi**2
    assert err < 2.0 * scale * h**2, f"error {err} too large (h={h})"
