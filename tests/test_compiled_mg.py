"""Compiled multigrid units: epoch pack as jit argument.

The round-1 design baked index plans into the jit as constants, retracing
on every refinement epoch. Here the plans are pytree *arguments* with
power-of-two bucketed padding (core/treepack.py): a topology change whose
bucket shapes match reuses the compiled executable. These tests check
(a) the jitted V-cycle/FMG equal the host solve on a padded AMR mesh, and
(b) two different topologies with equal buckets share one compilation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from afivo_streamer_tpu.core.tree import Tree, DO_REF, KEEP_REF
from afivo_streamer_tpu.core.batch import BoxBatch
from afivo_streamer_tpu.core import ghostcell as gc
from afivo_streamer_tpu.solvers.multigrid import Multigrid

I_PHI, I_RHS, I_TMP = 0, 1, 2
NC = 8


def make_tree(center):
    """Uniform 2-level mesh plus a third level around the given interior
    point (away from the domain boundary, so different centers produce
    the same ghost-case structure)."""
    t = Tree(2, NC, [1.0, 1.0], [16, 16])
    t.refine_up_to_lvl(2)

    def flags(ids):
        out = np.full([len(ids), NC, NC], KEEP_REF, np.int64)
        for n, b in enumerate(ids):
            if t.lvl[int(b)] != 2:
                continue
            r0 = t.box_r_min(np.asarray([int(b)]))[0]
            ctr = r0 + 0.5 * NC * t.lvl_dr(2)
            if np.all(np.abs(ctr - np.asarray(center)) < 0.13):
                out[n] = DO_REF
        return out

    t.adjust_refinement(flags, ref_buffer=0)
    return t


def setup_problem(t, n_extra_cap=8):
    batch = BoxBatch(t, 3, 0)
    cc = np.array(batch.cc)
    # extra capacity so the trash box exists
    grow = np.zeros((cc.shape[0], cc.shape[1] + n_extra_cap, cc.shape[2]))
    grow[:, :cc.shape[1]] = cc
    cc = grow
    k = 2.0 * np.pi
    for lvl in range(1, t.highest_lvl + 1):
        for b in t.lvl_ids[lvl - 1]:
            r = t.cell_coords(int(b))
            cc[I_RHS, int(b)] = (-2 * k**2 * np.sin(k * r[..., 0])
                                 * np.sin(k * r[..., 1])).ravel()
    return cc


def bc(iv, d, coords, params):
    return gc.BC_DIRICHLET, 0.0


def solve_host(t, cc):
    mg = Multigrid(t, I_PHI, I_RHS, I_TMP, bc)
    cc = mg.fill_ghosts_phi(cc, {})
    cc = mg.fas_fmg(cc, {}, set_residual=True, have_guess=True)
    for _ in range(4):
        cc = mg.fas_vcycle(cc, {}, set_residual=True)
    return cc, float(mg.max_abs_residual(cc))


def solve_jit(t, cc_np, mg=None):
    mg = mg or Multigrid(t, I_PHI, I_RHS, I_TMP, bc)
    trash = cc_np.shape[1] - 1
    mg.enable_jit(pad=True, trash=trash)
    cc = jnp.asarray(cc_np)
    cc = mg.fill_ghosts_phi(cc, {})  # eager device ghost fill (host plans)
    cc, res = mg.jit_fmg_res(cc, {})
    for _ in range(4):
        cc, res = mg.jit_vcycle_res(cc, {})
    return np.asarray(cc), float(res), mg


def test_jit_matches_host():
    t = make_tree((0.375, 0.375))
    cc0 = setup_problem(t)
    host, res_h = solve_host(t, cc0.copy())
    dev, res_d, _ = solve_jit(t, cc0.copy())
    # same algorithm, same plans (padding only adds inert work)
    real = t.highest_id
    np.testing.assert_allclose(dev[I_PHI, :real], host[I_PHI, :real],
                               rtol=1e-12, atol=1e-14)
    assert res_d == pytest.approx(res_h, rel=1e-6)


def test_bucketed_topology_reuses_compilation():
    # two different refined regions with equal table buckets
    t1 = make_tree((0.375, 0.375))
    t2 = make_tree((0.625, 0.625))
    cc1 = setup_problem(t1)
    cc2 = setup_problem(t2)
    dev1, res1, mg1 = solve_jit(t1, cc1.copy())
    n_traces_1 = mg1._jit_units["vcycle_res"]._cache_size()
    # same Multigrid object but a NEW tree/epoch: swap the tree
    mg1.tree = t2
    mg1._coarse = None  # level-1 topology identical, but rebuild cleanly
    dev2, res2, _ = solve_jit(t2, cc2.copy(), mg=mg1)
    n_traces_2 = mg1._jit_units["vcycle_res"]._cache_size()
    assert n_traces_1 == n_traces_2 == 1, "retrace despite equal buckets"

    # and the result still matches the host solve of the new topology
    host2, _ = solve_host(t2, cc2.copy())
    real = t2.highest_id
    np.testing.assert_allclose(dev2[I_PHI, :real], host2[I_PHI, :real],
                               rtol=1e-12, atol=1e-14)
