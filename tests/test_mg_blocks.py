"""The local-block V-cycle (solvers/mg_blocks.py, Pallas interpret mode)
must reproduce the host FAS V-cycle on refined 2D meshes, for both the
constant and cylindrical operators, and the block field solve must match
the generic compiled solve."""

import numpy as np
import jax.numpy as jnp
import pytest

from afivo_streamer_tpu.core.tree import Tree, DO_REF, KEEP_REF
from afivo_streamer_tpu.core.batch import BoxBatch
from afivo_streamer_tpu.core import ghostcell as gc
from afivo_streamer_tpu.solvers.multigrid import Multigrid

I_PHI, I_RHS, I_TMP = 0, 1, 2
NC = 8


def make_tree(coord="xyz"):
    t = Tree(2, NC, [1.0, 1.0], [16, 16], coord=coord)

    def flags(ids):
        out = np.full([len(ids), NC, NC], KEEP_REF, np.int64)
        for n, b in enumerate(ids):
            r0 = t.box_r_min(np.asarray([int(b)]))[0]
            if np.all(r0 < 0.45) and t.lvl[int(b)] == t.highest_lvl:
                out[n] = DO_REF
        return out

    t.adjust_refinement(flags, ref_buffer=1)
    t.adjust_refinement(flags, ref_buffer=1)
    return t


def bc(iv, d, coords, params):
    if d == 3:
        return gc.BC_DIRICHLET, params.get("voltage", 0.0)
    if d == 2:
        return gc.BC_DIRICHLET, 0.0
    return gc.BC_NEUMANN, 0.0


def setup_cc(t, pad=8, seed=3):
    batch = BoxBatch(t, 3, 0)
    cc = np.array(batch.cc)
    grow = np.zeros((cc.shape[0], cc.shape[1] + pad, cc.shape[2]))
    grow[:, :cc.shape[1]] = cc
    cc = grow
    rng = np.random.default_rng(seed)
    k = 2.0 * np.pi
    for lvl in range(1, t.highest_lvl + 1):
        for b in t.lvl_ids[lvl - 1]:
            r = t.cell_coords(int(b))
            cc[I_RHS, int(b)] = (-2 * k**2 * np.sin(k * r[..., 0])
                                 * np.sin(k * r[..., 1])).ravel()
    cc[I_PHI] = rng.random(cc.shape[1:]) * 0.01
    return cc


@pytest.mark.parametrize("coord", ["xyz", "cyl"])
def test_block_vcycle_matches_host(coord, monkeypatch):
    monkeypatch.setenv("AFIVO_PALLAS", "interpret")
    t = make_tree(coord)
    cc0 = setup_cc(t)
    params = {"voltage": 25.0}

    # host reference
    mg_h = Multigrid(t, I_PHI, I_RHS, I_TMP, bc)
    h = mg_h.fill_ghosts_phi(cc0.copy(), params)
    for _ in range(3):
        h = mg_h.fas_vcycle(h, params, set_residual=True)
    res_h = float(mg_h.max_abs_residual(h))

    # block path through the jitted unit (interpret-mode Pallas)
    mg_d = Multigrid(t, I_PHI, I_RHS, I_TMP, bc)
    trash = cc0.shape[1] - 1
    mg_d.enable_jit(pad=True, trash=trash)
    d = jnp.asarray(cc0.copy())
    d = mg_d.fill_ghosts_phi(d, params)
    for _ in range(3):
        d, res_d = mg_d.jit_vcycle_res(d, params)
    d = np.asarray(d)

    # the block path was actually engaged (plan objects were built)
    _, aux = mg_d._pack_and_ops(dtype=np.float64)
    assert aux[3] is not None, "LevelBlockPlans missing"

    real = t.highest_id
    np.testing.assert_allclose(d[I_PHI, :real], h[I_PHI, :real],
                               rtol=1e-10, atol=1e-12)
    assert float(res_d) == pytest.approx(res_h, rel=1e-6, abs=1e-10)


def test_block_vcycle_converges_poisson(monkeypatch):
    """Sanity: the block V-cycle drives the residual down like the host
    cycle does (factor >= 10 per cycle on this smooth problem)."""
    monkeypatch.setenv("AFIVO_PALLAS", "interpret")
    t = make_tree()
    cc0 = setup_cc(t)
    params = {"voltage": 0.0}
    mg_d = Multigrid(t, I_PHI, I_RHS, I_TMP, bc)
    mg_d.enable_jit(pad=True, trash=cc0.shape[1] - 1)
    d = jnp.asarray(cc0)
    d = mg_d.fill_ghosts_phi(d, params)
    residuals = []
    for _ in range(4):
        d, res = mg_d.jit_vcycle_res(d, params)
        residuals.append(float(res))
    assert residuals[-1] < residuals[0] / 1e3


@pytest.mark.parametrize("nsteps", [2])
def test_block_solve_in_compiled_engine(nsteps, monkeypatch, tmp_path):
    """End-to-end: the compiled engine's field solve through the block
    path (interpret mode) reproduces the generic compiled path on a
    short test_cyl production prefix (3-level AMR)."""
    import os
    ref = "/root/reference/programs/standard_2d/tests"
    if not os.path.isdir(ref):
        pytest.skip("reference data not available")
    from afivo_streamer_tpu.driver import Simulation

    def run(interpret):
        if interpret:
            monkeypatch.setenv("AFIVO_PALLAS", "interpret")
        else:
            monkeypatch.delenv("AFIVO_PALLAS", raising=False)
        sim = Simulation(argv=[
            f"{ref}/test_cyl.cfg", "-ndim=2",
            f"-input_data%file={ref}/td_air_siglo_swarm.txt",
            f"-output%name={tmp_path}/run{int(interpret)}",
            "-compiled%enabled=T", "-compiled%fused=F",
            "-refine_max_dx=5.2e-4", "-refine_adx=1e99",
            "-refine_init_time=-1"])
        sim.run(max_steps=nsteps)
        sim._to_host()
        return sim

    s_gen = run(False)
    s_blk = run(True)
    real = s_gen.tree.highest_id
    a = s_gen.cc[s_gen.i_phi, :real]
    b = s_blk.cc[s_blk.i_phi, :real]
    np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-11)
    ne_a = s_gen.cc[s_gen.i_electron, :real]
    ne_b = s_blk.cc[s_blk.i_electron, :real]
    np.testing.assert_allclose(ne_b, ne_a, rtol=1e-9, atol=1.0)
