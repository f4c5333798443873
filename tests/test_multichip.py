"""Multi-device sharded execution of the compiled step.

The TPU-native replacement of the reference's OpenMP box-loop parallelism
(``afivo/documentation/parallelization.md``): the SoA box axis is sharded
over a ``jax.sharding.Mesh`` and halo gathers / multigrid transfers /
reductions become XLA collectives. The conftest provisions 8 virtual CPU
devices; here the sharded step must produce the same result as the
unsharded one, including neighbor gathers that cross shard boundaries.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from afivo_streamer_tpu.driver import Simulation
from afivo_streamer_tpu.parallel.compiled import (make_step_fn,
                                                  pad_capacity_to,
                                                  shard_over_boxes)

REF = "/root/reference/programs/standard_2d/tests"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="no reference data")


def _build_sim(tmp_path):
    # four-level uniformly refined mesh of the flagship axisymmetric case
    # (1 + 4 + 16 + 64 boxes): each of the 8 shards holds several boxes
    # and same-level neighbors live on other shards, so halo gathers
    # cross shard boundaries
    return Simulation(argv=[
        f"{REF}/test_cyl.cfg", "-ndim=2",
        f"-input_data%file={REF}/td_air_siglo_swarm.txt",
        f"-output%name={tmp_path}/run",
        "-refine_max_dx=2.6e-4", "-refine_adx=1e99", "-refine_init_time=-1"])


def test_sharded_step_matches_unsharded(tmp_path):
    devs = jax.devices()
    assert len(devs) >= 8, "conftest should provide 8 virtual CPU devices"
    sim = _build_sim(tmp_path)
    pad_capacity_to(sim, 8)
    fn = make_step_fn(sim, n_vcycles=2)

    cc = jnp.asarray(sim.cc)
    fc = jnp.asarray(sim.fc)
    dt = 1.0e-13
    volt = sim.field.current_voltage

    # unsharded (single device)
    cc1, fc1, dt_lim1 = jax.jit(fn)(cc, fc, dt, volt)

    # sharded over the box axis of an 8-device mesh
    mesh = Mesh(np.asarray(devs[:8]), ("boxes",))
    cc_s, fc_s, cc_sh, fc_sh = shard_over_boxes(mesh, cc, fc)
    step = jax.jit(fn, in_shardings=(cc_sh, fc_sh, None, None))
    cc2, fc2, dt_lim2 = step(cc_s, fc_s, dt, volt)

    assert float(dt_lim2) == pytest.approx(float(dt_lim1), rel=1e-12)
    # sharded execution reorders reductions (coarse solve, psum), so
    # expect f64 rounding-level noise relative to each variable's scale
    a1, a2 = np.asarray(cc1), np.asarray(cc2)
    for iv in sim.all_densities + [sim.i_phi, sim.i_electric_fld]:
        scale = max(np.abs(a1[iv]).max(), 1.0)
        np.testing.assert_allclose(
            a2[iv], a1[iv], rtol=1e-10, atol=1e-12 * scale,
            err_msg=f"cc variable {sim.registry.cc_names[iv]}")
    f1, f2 = np.asarray(fc1), np.asarray(fc2)
    for ifc in sim.fc_flux + [sim.fc_E]:
        scale = max(np.abs(f1[ifc]).max(), 1.0)
        np.testing.assert_allclose(
            f2[ifc], f1[ifc], rtol=1e-10, atol=1e-12 * scale,
            err_msg=f"fc variable {ifc}")
    # the output really was computed distributed
    assert len(cc2.sharding.device_set) == 8


def test_neighbor_gathers_cross_shards(tmp_path):
    """The level-2 box batch spans all shards: verify the same-level
    ghost-cell plan links boxes living on different devices."""
    from afivo_streamer_tpu.core import ghostcell as gc
    sim = _build_sim(tmp_path)
    pad_capacity_to(sim, 8)
    cap = sim.cc.shape[1]
    shard_of = lambda b: int(b) // (cap // 8)
    t = sim.tree
    plan = gc.get_gc_plan(t, t.highest_lvl)
    crossing = 0
    for p in plan.dirs:
        for b, nb in zip(p.copy_ids, p.copy_nb):
            if shard_of(b) != shard_of(nb):
                crossing += 1
    assert crossing > 0, "no cross-shard neighbor copies in this mesh"


@pytest.mark.slow
def test_sharded_production_run_matches_unsharded(tmp_path):
    """The PRODUCTION loop (Simulation.run: fused compiled steps, dt
    control, refinement epochs with capacity growth and re-sharding)
    executed over the 8-device mesh via ``-compiled%shards=8`` must
    reproduce the unsharded compiled run's regression log. Spans real
    AMR epochs: the 1D golden case refines every 2 steps, so the run
    re-buckets plans and re-lays the grown box axis over the mesh
    (driver._sync_capacity / _mesh_shardings). Reference analog: OpenMP
    wraps the whole run (afivo/documentation/parallelization.md)."""
    ref1 = "/root/reference/programs/standard_1d/tests"
    argv = [f"{ref1}/test_1d.cfg", "-ndim=1",
            f"-input_data%file={ref1}/td_air_siglo_swarm.txt",
            "-compiled%enabled=T"]
    end = "-end_time=0.3e-9"

    sim_u = Simulation(argv=argv + [f"-output%name={tmp_path}/unsharded",
                                    end])
    sim_u.run()

    sim_s = Simulation(argv=argv + [f"-output%name={tmp_path}/sharded",
                                    end, "-compiled%shards=8"])
    sim_s.run()
    assert len(sim_s.cc.sharding.device_set) == 8

    a = np.loadtxt(f"{tmp_path}/unsharded_rtest.log", skiprows=1)
    b = np.loadtxt(f"{tmp_path}/sharded_rtest.log", skiprows=1)
    assert a.shape == b.shape and len(a) >= 2
    # sharded execution reorders f64 reductions (coarse solve, max |res|
    # convergence control), so allow rounding-level noise only
    np.testing.assert_allclose(b, a, rtol=1e-8, atol=1e-10)


@pytest.mark.slow
def test_sharded_2d_production_crosses_growth_epoch(tmp_path):
    """The 2D axisymmetric bench configuration, sharded over the
    8-device mesh, run PAST the first level-adding refinement epoch
    (~0.28 ns adds level 10): capacity growth re-lays the grown box axis
    over the mesh (driver._enable_compiled / _mesh_shardings), which the
    1D gate above cannot exercise in the configuration bench.py actually
    measures. Per-unit compiled mode (the fused 2D trace costs tens of
    minutes of CPU XLA; sharding rides the same jitted units either
    way). Log must match the unsharded compiled run at rounding level."""
    argv = [f"{REF}/test_cyl.cfg", "-ndim=2",
            f"-input_data%file={REF}/td_air_siglo_swarm.txt",
            "-compiled%enabled=T", "-compiled%fused=F"]
    end = "-end_time=0.3e-9"

    sim_u = Simulation(argv=argv + [f"-output%name={tmp_path}/u2", end])
    lvl0 = sim_u.tree.highest_lvl
    sim_u.run()
    assert sim_u.tree.highest_lvl > lvl0, \
        "horizon did not cross a level-adding epoch"

    sim_s = Simulation(argv=argv + [f"-output%name={tmp_path}/s2", end,
                                    "-compiled%shards=8"])
    sim_s.run()
    assert len(sim_s.cc.sharding.device_set) == 8
    assert sim_s.tree.highest_lvl == sim_u.tree.highest_lvl

    a = np.loadtxt(f"{tmp_path}/u2_rtest.log", skiprows=1, ndmin=2)
    b = np.loadtxt(f"{tmp_path}/s2_rtest.log", skiprows=1, ndmin=2)
    assert a.shape == b.shape and len(a) >= 2
    np.testing.assert_allclose(b, a, rtol=1e-8, atol=1e-10)
