"""IMEX time integrators against an analytic stiff reaction-diffusion
problem.

The reference builds imex_euler / imex_trapezoidal from the same
forward-Euler callback plus a user implicit solver
(``afivo/src/m_af_advance.f90:185-200``); its reaction_diffusion example
solves the stiff diffusion implicitly as a Helmholtz problem per step.
Here: u_t = D lap(u) - a u with u = exp(-(2 D k^2 + a) t) sin(kx) sin(ky)
on [0,1]^2 (Dirichlet zero), advanced with dt ~ 8x the explicit diffusion
stability limit — only the IMEX schemes are stable, and the trapezoidal
variant is second order.
"""

import numpy as np
import pytest

from afivo_streamer_tpu.core.tree import Tree
from afivo_streamer_tpu.core.batch import BoxBatch
from afivo_streamer_tpu.core import ghostcell as gc
from afivo_streamer_tpu.solvers.multigrid import Multigrid
from afivo_streamer_tpu.physics import advance as adv

I_U = 0          # 3 temporal copies: states 0..2
I_PHI, I_RHS, I_TMP = 3, 4, 5

D = 1.0          # diffusion coefficient (stiff)
A = 5.0          # linear loss rate (non-stiff)
K = np.pi


def _bc_zero(iv, d, coords, params):
    return gc.BC_DIRICHLET, 0.0


def _setup():
    t = Tree(2, 8, [1.0, 1.0], [16, 16])
    t.refine_up_to_lvl(2)          # leaves: 32x32 cells, dx = 1/32
    batch = BoxBatch(t, 6, 0)
    cc = np.array(batch.cc)
    allids = np.concatenate([np.asarray(i) for i in t.lvl_ids])
    for b in allids:
        r = t.cell_coords(int(b))
        cc[I_U, int(b)] = (np.sin(K * r[..., 0])
                           * np.sin(K * r[..., 1])).ravel()
    return t, cc, allids


def _interior(t):
    from afivo_streamer_tpu.core import spatial as sp
    return sp.interior_flat(t.ndim, t.nc)


def _run(integrator, dt, n_steps_time):
    t, cc, allids = _setup()
    itr = _interior(t)
    mgs = {}
    nc = t.nc

    def gc_fill(cc, iv):
        for lvl in range(1, t.highest_lvl + 1):
            plan = gc.get_gc_plan(t, lvl)
            cc = gc.fill_ghosts_lvl(cc, plan, [iv], gc.RB_INTERP,
                                    _bc_zero, {})
        return cc

    def laplacian(cc, iv):
        """D lap(u) on the interiors of all boxes, [n_all, nc^2]."""
        out = np.zeros((len(allids), nc * nc))
        pos = {int(b): i for i, b in enumerate(allids)}
        for lvl in range(1, t.highest_lvl + 1):
            ids = np.asarray(t.lvl_ids[lvl - 1])
            dx = float(t.lvl_dr(lvl)[0])
            B = cc[iv, ids].reshape(len(ids), nc + 2, nc + 2)
            lap = (B[:, 2:, 1:-1] + B[:, :-2, 1:-1] + B[:, 1:-1, 2:]
                   + B[:, 1:-1, :-2] - 4.0 * B[:, 1:-1, 1:-1]) / dx**2
            rows = np.array([pos[int(b)] for b in ids])
            out[rows] = lap.reshape(len(ids), -1)
        return out

    def substep(cc, fc, dt_s, dt_lim, time, s_deriv, s_prev, w_prev,
                s_out, i_step, n_steps, params):
        # the reference forward_euler contract applies the non-stiff part
        # with dt and the stiff part EXPLICITLY with dt_stiff
        # (m_af_advance.f90:31, reaction_diffusion.f90 step_F)
        dt_stiff = params["dt_stiff"]
        acc = 0.0
        for s, w in zip(s_prev, w_prev):
            acc = acc + w * cc[I_U + s][allids[:, None], itr[None, :]]
        du = dt_s * -A * cc[I_U + s_deriv][allids[:, None], itr[None, :]]
        if dt_stiff != 0.0:
            cc = gc_fill(cc, I_U + s_deriv)
            du = du + dt_stiff * D * laplacian(cc, I_U + s_deriv)
        cc[I_U + s_out, allids[:, None], itr[None, :]] = acc + du
        return cc, fc, 1.0, {}

    def implicit_solver(cc, fc, dt_stiff, time, s_prev, w_prev, s_out,
                        params):
        # solve y_out = sum(w y_prev) + dt_stiff * D lap(y_out):
        # lap(phi) - lam * phi = -lam * sum(w y_prev), lam = 1/(dt_stiff D)
        lam = 1.0 / (dt_stiff * D)
        if lam not in mgs:
            mgs[lam] = Multigrid(t, I_PHI, I_RHS, I_TMP, _bc_zero,
                                 helmholtz_lambda=lam)
        mg = mgs[lam]
        acc = 0.0
        for s, w in zip(s_prev, w_prev):
            acc = acc + w * cc[I_U + s][allids[:, None], itr[None, :]]
        cc[I_RHS, allids[:, None], itr[None, :]] = -lam * acc
        cc[I_PHI, allids] = cc[I_U + s_out, allids]  # initial guess
        cc = mg.fill_ghosts_phi(cc, {})
        for _ in range(10):
            cc = mg.fas_fmg(cc, {}, set_residual=True, have_guess=True)
            res = float(np.max(np.abs(
                cc[I_TMP, allids[:, None], itr[None, :]])))
            rhs_max = float(np.max(np.abs(
                cc[I_RHS, allids[:, None], itr[None, :]])))
            if res < 1e-8 * max(rhs_max, 1e-30):
                break
        cc[I_U + s_out, allids] = cc[I_PHI, allids]
        return cc, fc

    time = 0.0
    for _ in range(n_steps_time):
        cc, _, _, time, _ = adv.advance(
            cc, None, dt, time, integrator, substep,
            implicit_solver=implicit_solver)
    # compare against the analytic solution on the leaves
    leaves = np.asarray(t.lvl_leaves[t.highest_lvl - 1])
    num = cc[I_U, leaves[:, None], itr[None, :]]
    exact = []
    for b in leaves:
        r = t.cell_coords(int(b))[1:-1, 1:-1]
        exact.append((np.sin(K * r[..., 0]) * np.sin(K * r[..., 1])).ravel())
    exact = np.asarray(exact) * np.exp(-(2 * D * K**2 + A) * time)
    err = np.max(np.abs(num - exact)) / np.max(np.abs(exact))
    return err


def test_imex_euler_stable_and_first_order():
    # dt ~ 8x the explicit diffusion limit dx^2/(4D) = 2.44e-4
    err = _run("imex_euler", 2.0e-3, 10)
    assert np.isfinite(err) and err < 0.05, err
    # first order: halving dt roughly halves the error
    err2 = _run("imex_euler", 1.0e-3, 20)
    assert err2 < 0.65 * err, (err, err2)


def test_imex_trapezoidal_second_order():
    err = _run("imex_trapezoidal", 2.0e-3, 10)
    err_e = _run("imex_euler", 2.0e-3, 10)
    # far more accurate than imex_euler at the same (stiff-unstable) dt,
    # and already at the spatial discretization floor (~3e-4 on 32^2)
    assert err < 0.15 * err_e, (err, err_e)
    assert err < 5.0e-4, err


def test_imex_requires_implicit_solver():
    with pytest.raises(ValueError, match="implicit_solver"):
        adv.advance(None, None, 1e-3, 0.0, "imex_euler",
                    lambda *a: (None, None, 1.0, {}))
