"""Phantom-level pre-compilation: killing the new-level retrace cliff.

When AMR adds a refinement level, the epoch pack gains one entry per
per-level list and every compiled unit retraces (minutes of remote XLA
per level on TPU, measured round 3). The phantom machinery
(core/treepack.phantom_levels, driver._warm_next_level) builds a pack
with the EXACT pytree structure and table shapes the pack will have once
level ``highest_lvl+1`` exists, and executes one fused step on donated
state copies in a background thread — so the growth epoch's dispatch is
a jit cache hit. These tests gate the two claims:

* structural: the phantom pack's treedef + leaf shapes equal the real
  pack's after the level is actually added,
* end-to-end: a compiled 1D production run that crosses a level-adding
  refinement epoch does NOT retrace the fused step when warmed.
"""

import os

import numpy as np
import jax
import pytest

from afivo_streamer_tpu.core.tree import Tree, DO_REF, KEEP_REF
from afivo_streamer_tpu.core import treepack as tp
from afivo_streamer_tpu.core import ghostcell as gc

REF1 = "/root/reference/programs/standard_1d/tests"


def _refine_low_corner(t):
    def flags_fn(ids):
        out = np.full([len(ids)] + [t.nc] * t.ndim, KEEP_REF,
                      dtype=np.int64)
        for n, b in enumerate(ids):
            r0 = t.box_r_min(np.asarray([int(b)]))[0]
            if np.all(r0 < 1e-9) and t.lvl[int(b)] == t.highest_lvl:
                out[n] = DO_REF
        return out
    t.adjust_refinement(flags_fn)


def _sig(tree_like):
    leaves, treedef = jax.tree_util.tree_flatten(tree_like)
    shapes = [(getattr(x, "shape", ()), str(getattr(x, "dtype", type(x))))
              for x in leaves]
    return treedef, shapes


@pytest.mark.parametrize("coord", ["1d", "xyz", "cyl"])
def test_phantom_pack_matches_future_level(coord):
    """build_epoch_pack(phantom=1) at level L == the real pack at L+1 in
    pytree structure and leaf shapes (the jit cache key)."""
    if coord == "1d":
        t = Tree(1, 8, [16e-3], [64])
    else:
        t = Tree(2, 8, [16e-3, 16e-3], [16, 16], coord=coord)
    for _ in range(3):
        _refine_low_corner(t)
    ph = tp.build_epoch_pack(t, pad=True, trash=500, with_gc2=True,
                             phantom=1)
    ph_def, ph_shapes = _sig(ph)
    _refine_low_corner(t)  # the level the phantom anticipated
    real = tp.get_epoch_pack(t, pad=True, trash=500, with_gc2=True)
    r_def, r_shapes = _sig(real)
    assert ph_def == r_def, "phantom pack treedef differs from the real one"
    assert ph_shapes == r_shapes
    # the phantom finest level is inert: all ids target the trash box
    assert np.all(np.asarray(ph.tables[-1].ids) == 500)
    assert np.all(np.asarray(ph.tables[-1].leaf_valid) == 0.0)


def test_phantom_mg_aux_matches_future_level():
    """Multigrid._phantom_pack_and_ops == the real (ops, smoother,
    blocks) aux after the level exists."""
    from afivo_streamer_tpu.solvers.multigrid import Multigrid
    t = Tree(2, 8, [16e-3, 16e-3], [16, 16], coord="cyl")
    for _ in range(3):
        _refine_low_corner(t)
    mg = Multigrid(t, 0, 1, 2,
                   lambda iv, d, c, p: (gc.BC_DIRICHLET, 0.0))
    mg.enable_jit(pad=True, trash=500)
    ph_pack, ph_aux = mg._phantom_pack_and_ops(dtype=np.float64)
    ph_def, ph_shapes = _sig((ph_pack, ph_aux))
    _refine_low_corner(t)
    pack, aux = mg._pack_and_ops(dtype=np.float64)
    r_def, r_shapes = _sig((pack, aux))
    assert ph_def == r_def
    assert ph_shapes == r_shapes


def test_phantom_mg_aux_matches_future_level_lsf():
    """Phantom warm for the ELECTRODE (LSF) operator (VERDICT round-4
    item 5): the phantom aux — including the per-level lsf side tables
    (_build_level_extras) — matches the real aux once the level exists.
    The growth is placed ON the electrode boundary so the newborn level
    has real lsf distance entries."""
    from afivo_streamer_tpu.solvers.multigrid import Multigrid
    from afivo_streamer_tpu.solvers.lsf import LsfData
    t = Tree(2, 8, [16e-3, 16e-3], [16, 16])

    def lsf_fn(r):
        # rod along x = 4 mm, radius 1 mm (vectorized [n, 2] -> [n])
        r = np.atleast_2d(r)
        return np.abs(r[:, 0] - 4e-3) - 1e-3

    lsf = LsfData(t, lsf_fn, length_scale=1e-3)

    def refine_on_rod(tt):
        # grow exactly ONE finest-level box straddling the rod edge: the
        # phantom warm predicts the pack STRUCTURE of a new level, not
        # bucket-mark doublings (a growth that crosses a power-of-two
        # bucket forces the documented synchronized retrace regardless)
        def flags_fn(ids):
            out = np.full([len(ids)] + [tt.nc] * 2, KEEP_REF, np.int64)
            done = [False]
            for n, b in enumerate(ids):
                r0 = tt.box_r_min(np.asarray([int(b)]))[0]
                dx = tt.lvl_dr(int(tt.lvl[int(b)]))[0] * tt.nc
                if (not done[0] and r0[0] <= 4e-3 <= r0[0] + dx
                        and tt.lvl[int(b)] == tt.highest_lvl):
                    out[n] = DO_REF
                    done[0] = True
            return out
        tt.adjust_refinement(flags_fn)

    for _ in range(3):
        refine_on_rod(t)
    # production prepad (compiled%prepad): first-sighting buckets get
    # headroom so the single-box growth below stays within every mark
    # (a growth past a mark is a synchronized doubling — the documented
    # full retrace the phantom warm does not cover)
    t._prepad = 4.0
    mg = Multigrid(t, 0, 1, 2,
                   lambda iv, d, c, p: (gc.BC_DIRICHLET, 0.0),
                   lsf_data=lsf)
    mg.enable_jit(pad=True, trash=500)
    ph_pack, ph_aux = mg._phantom_pack_and_ops(dtype=np.float64)
    ph_def, ph_shapes = _sig((ph_pack, ph_aux))
    assert ph_aux[2] is not None          # lsf extras present
    refine_on_rod(t)
    pack, aux = mg._pack_and_ops(dtype=np.float64)
    r_def, r_shapes = _sig((pack, aux))
    assert any(ex["lsf"] is not None for ex in aux[2])
    assert ph_def == r_def
    assert ph_shapes == r_shapes


@pytest.mark.skipif(not os.path.isdir(REF1), reason="no reference data")
@pytest.mark.heavy
def test_warm_next_level_avoids_retrace(tmp_path):
    """A compiled fused 1D production run crossing a level-adding epoch:
    with warming forced on, the growth epoch must hit the pre-compiled
    executable (fused-step jit cache size unchanged across the growth)."""
    from afivo_streamer_tpu.driver import Simulation
    out = str(tmp_path / "w")
    sim = Simulation(argv=[
        f"{REF1}/test_1d.cfg", "-ndim=1",
        f"-input_data%file={REF1}/td_air_siglo_swarm.txt",
        f"-output%name={out}", "-compiled%enabled=T",
        "-compiled%warm_next_level=T",
        # generous capacity/bucket headroom so the only structure change
        # in the window is the level add itself
        "-compiled%prepad=4"])
    sim.run(max_steps=3)
    # early refine epochs can still grow bucket marks (a synchronized
    # doubling changes every padded shape and invalidates an earlier
    # warm); step until the CURRENT structure generation's warm has
    # completed, so the forced growth below deterministically hits it
    for _ in range(20):
        th = sim.__dict__.get("_warm_thread")
        if th is not None:
            th.join(timeout=900)
            assert not th.is_alive(), "warm compile did not finish"
        if sim._warm_key() in sim._warmed:
            break
        sim.run(max_steps=sim.it + 2)
    assert sim._warm_key() in sim._warmed, "warm never covered current gen"
    fn = sim._fused_fn()
    n0 = fn._cache_size()
    assert n0 >= 2, "expected the live + warmed executables in cache"
    L0 = sim.tree.highest_lvl
    warmed0 = set(sim._warmed)
    # freeze the warmer: any further cache-size change below can then
    # only be a main-thread retrace (what this test must rule out)
    sim.compiled_warm = "F"

    # force a level-adding refinement epoch deterministically (this case
    # reaches its criterion-stable depth during initial refinement, so
    # mid-run growth must be injected): flag the first finest-level box
    t = sim.tree
    target = int(t.lvl_leaves[L0 - 1][0])

    def force_refine(ids):
        out = np.full([len(ids), t.nc], KEEP_REF, dtype=np.int64)
        for n, b in enumerate(ids):
            if int(b) == target:
                out[n] = DO_REF
        return out

    sim.user.refine = force_refine
    sim.run(max_steps=sim.it + 2 * sim.refine_cfg.per_steps + 1)
    sim.user.refine = None
    assert sim.tree.highest_lvl > L0, "forced refinement did not add a level"
    sim.run(max_steps=sim.it + 2)   # step on the grown mesh
    assert fn._cache_size() == n0, \
        "fused step retraced across the level-adding epoch"
    assert set(sim._warmed) == warmed0  # warmer was frozen above
