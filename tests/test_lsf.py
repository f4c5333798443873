"""Level-set (electrode) multigrid tests.

Analog of the reference's ``afivo/examples/poisson_lsf_test.f90``: with a
planar electrode (level set linear in the last coordinate) held at a fixed
potential and a Dirichlet far boundary, the exact solution is linear and the
generalized-distance stencil must reproduce it to machine precision,
including the corrected field at the electrode surface.
"""

import numpy as np
import pytest

from afivo_streamer_tpu.core.tree import Tree, DO_REF, KEEP_REF
from afivo_streamer_tpu.core.batch import BoxBatch
from afivo_streamer_tpu.core import ghostcell as gc
from afivo_streamer_tpu.core import spatial as sp
from afivo_streamer_tpu.solvers.multigrid import Multigrid
from afivo_streamer_tpu.solvers.lsf import LsfData

I_PHI, I_RHS, I_TMP = 0, 1, 2


@pytest.mark.parametrize("ndim,refine", [(1, False), (2, False), (2, True)])
def test_planar_electrode_exact(ndim, refine):
    nc = 8
    t = Tree(ndim, nc, [1.0] * ndim, [16] * ndim)
    if refine:
        def flags(ids):
            out = np.full([len(ids)] + [nc] * ndim, KEEP_REF, np.int64)
            for n, b in enumerate(ids):
                r0 = t.box_r_min(np.asarray([int(b)]))[0]
                if r0[-1] < 0.5 and t.lvl[int(b)] == t.highest_lvl:
                    out[n] = DO_REF
            return out
        t.adjust_refinement(flags, ref_buffer=2)

    # electrode occupies z < 0.303; boundary potential V0; phi(1) = 0
    z0 = 0.303
    V0 = 750.0

    def lsf_fn(r):
        return r[..., -1] - z0

    lsf_data = LsfData(t, lsf_fn, dist_mode="gss")

    def bc(iv, d, coords, params):
        if d // 2 == ndim - 1:
            if d % 2 == 0:
                return gc.BC_DIRICHLET, 0.0  # low side is inside electrode
            return gc.BC_DIRICHLET, 0.0
        return gc.BC_NEUMANN, 0.0

    mg = Multigrid(t, I_PHI, I_RHS, I_TMP, bc, lsf_data=lsf_data)
    batch = BoxBatch(t, 3, 1)
    cc = np.array(batch.cc)
    fc = np.array(batch.fc)
    params = {"lsf_phi_b": V0}
    cc = mg.fill_ghosts_phi(cc, params)
    for _ in range(12):
        cc = mg.fas_vcycle(cc, params)
    res = float(mg.max_abs_residual(cc, phi_b=V0))
    assert res < 1e-6, f"MG residual too large: {res}"

    # exact: phi = V0 * (1 - z) / (1 - z0) for z > z0
    def exact(z):
        return V0 * (1.0 - z) / (1.0 - z0)

    nc2 = nc
    interior = sp.interior_flat(ndim, nc2)
    for lvl in range(1, t.highest_lvl + 1):
        data = lsf_data.level_data(lvl)
        for n_i, b in enumerate(data["ids"]):
            if t.has_children(int(b)):
                continue
            coords = t.cell_coords(int(b))[(slice(1, nc + 1),) * ndim]
            z = coords[..., -1].ravel()
            phi = cc[I_PHI, int(b), interior]
            outside = z > z0
            if not outside.any():
                continue
            err = np.max(np.abs(phi[outside] - exact(z[outside])))
            assert err < 1e-6 * V0, f"lvl {lvl} box {b}: err {err}"

    # corrected field at the electrode: E = -d(phi)/dz = V0/(1-z0) everywhere
    fc = mg.compute_phi_gradient(cc, fc, 0, -1.0)
    # apply the lsf gradient correction manually (as FieldSolver does)
    from afivo_streamer_tpu.physics.field import FieldSolver
    E_exact = V0 / (1.0 - z0)
    d = ndim - 1
    for lvl in range(1, t.highest_lvl + 1):
        data = lsf_data.level_data(lvl)
        leaves = [int(b) for b in t.lvl_leaves[lvl - 1]]
        for n_i, b in enumerate(data["ids"]):
            if int(b) not in leaves:
                continue
            faxes = [np.arange(0, nc + 1) if k == d else np.arange(0, nc)
                     for k in range(ndim)]
            fidx = sp.fc_flat(ndim, nc, *faxes)
            F = fc[0, d, int(b), fidx]
            lsfv = data["lsf_cc"][n_i]
            # faces strictly between outside cells must carry -grad phi
            # (faces adjacent to the boundary are corrected by the field
            # solver; regular interior faces must already be exact)
            cshape = (nc,) * ndim
            lsf_nd = lsfv.reshape(cshape)
            F_nd = F.reshape(tuple(nc + 1 if k == d else nc
                                   for k in range(ndim)))
            lo = tuple(slice(0, nc - 1) if k == d else slice(None)
                       for k in range(ndim))
            hi = tuple(slice(1, nc) if k == d else slice(None)
                       for k in range(ndim))
            inner_faces = (lsf_nd[lo] > 0) & (lsf_nd[hi] > 0)
            mid = tuple(slice(1, nc) if k == d else slice(None)
                        for k in range(ndim))
            # fc holds fac*grad(phi) with fac=-1, i.e. +E here
            errs = np.abs(F_nd[mid][inner_faces] - E_exact)
            if errs.size:
                assert np.max(errs) < 1e-6 * E_exact


@pytest.mark.parametrize("refine", [False, True])
def test_cylinder_electrode_analytic(refine):
    """2D disk electrode at potential V0 inside a disk domain with the
    analytic log-potential imposed on the outer boundary:
    phi(r) = V0 * log(r_out / r) / log(r_out / r_el). Checks the
    curved-boundary distances (gss) and the variable stencil: the error
    must be at the discretization level (second order)."""
    nc = 8
    t = Tree(2, nc, [1.0, 1.0], [32, 32])
    ctr = np.array([0.5, 0.5])
    r_el = 0.1
    r_out = 2.0  # outer reference radius for the analytic solution
    V0 = 100.0

    def lsf_fn(r):
        return np.linalg.norm(r - ctr, axis=-1) - r_el

    def exact(r):
        rr = np.maximum(np.linalg.norm(r - ctr, axis=-1), r_el)
        return V0 * np.log(r_out / rr) / np.log(r_out / r_el)

    if refine:
        def flags(ids):
            out = np.full([len(ids), nc, nc], KEEP_REF, np.int64)
            for n, b in enumerate(ids):
                r0 = t.box_r_min(np.asarray([int(b)]))[0]
                c = r0 + 0.5 * nc * t.lvl_dr(int(t.lvl[int(b)]))
                if (np.linalg.norm(c - ctr) < 0.25
                        and t.lvl[int(b)] == t.highest_lvl):
                    out[n] = DO_REF
            return out
        t.adjust_refinement(flags, ref_buffer=2)

    lsf_data = LsfData(t, lsf_fn, dist_mode="gss")

    def bc(iv, d, coords, params):
        return gc.BC_DIRICHLET, exact(coords)

    mg = Multigrid(t, I_PHI, I_RHS, I_TMP, bc, lsf_data=lsf_data)
    batch = BoxBatch(t, 3, 0)
    cc = np.array(batch.cc)
    params = {"lsf_phi_b": V0}
    cc = mg.fill_ghosts_phi(cc, params)
    for _ in range(15):
        cc = mg.fas_vcycle(cc, params)
    res = float(mg.max_abs_residual(cc, phi_b=V0))
    assert res < 1e-5, f"MG residual too large: {res}"

    interior = sp.interior_flat(2, nc)
    max_err = 0.0
    for lvl in range(1, t.highest_lvl + 1):
        for b in t.lvl_leaves[lvl - 1]:
            coords = t.cell_coords(int(b))[1:-1, 1:-1]
            rr = np.linalg.norm(coords - ctr, axis=-1).ravel()
            phi = cc[I_PHI, int(b), interior]
            outside = rr > r_el + 0.01
            if outside.any():
                err = np.max(np.abs(phi[outside] - exact(
                    coords.reshape(-1, 2)[outside])))
                max_err = max(max_err, err)
    # second-order discretization error: dx^2 * |phi''| ~ (1/32/8)^2 * ...
    assert max_err < 0.5, f"analytic error too large: {max_err}"
