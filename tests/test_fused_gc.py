"""The fused (traced) ghost fill must reproduce the host (NumPy) fill
bitwise for every rb method, boundary type, and the corner stage."""

import numpy as np
import jax.numpy as jnp
import pytest

from afivo_streamer_tpu.core.tree import Tree, DO_REF, KEEP_REF
from afivo_streamer_tpu.core.batch import BoxBatch
from afivo_streamer_tpu.core import ghostcell as gc


@pytest.fixture(autouse=True)
def _enable_fused(monkeypatch):
    monkeypatch.setenv("AFIVO_FUSED_GC", "1")


def make_refined_tree(ndim, nc=8):
    t = Tree(ndim, nc, [1.0] * ndim, [2 * nc] * ndim)

    def flags(ids):
        out = np.full([len(ids)] + [nc] * ndim, KEEP_REF, np.int64)
        for n, b in enumerate(ids):
            r0 = t.box_r_min(np.asarray([int(b)]))[0]
            if np.all(r0 < 0.49) and t.lvl[int(b)] == t.highest_lvl:
                out[n] = DO_REF
        return out
    t.adjust_refinement(flags, ref_buffer=0)
    t.adjust_refinement(flags, ref_buffer=0)
    return t


def bc_mixed(iv, d, coords, params):
    if d == 0:
        return gc.BC_NEUMANN, 1.5
    if d == 1:
        return gc.BC_DIRICHLET, params.get("voltage", 0.0) * coords[..., -1]
    if d == 2:
        return gc.BC_CONTINUOUS, 0.0
    return gc.BC_DIRICHLET_COPY, 0.25


@pytest.mark.parametrize("ndim", [1, 2, 3])
@pytest.mark.parametrize("method", [gc.RB_INTERP, gc.RB_INTERP_LIM,
                                    gc.RB_MG, gc.RB_PROLONG_COPY])
def test_fused_matches_host(ndim, method):
    t = make_refined_tree(ndim)
    nv = 3
    batch = BoxBatch(t, nv, 0)
    rng = np.random.default_rng(3)
    cc_host = rng.random(np.asarray(batch.cc).shape)
    cc_dev = jnp.array(cc_host, copy=True)
    params = {"voltage": 7.5}
    ivs = [0, 2]
    for lvl in range(1, t.highest_lvl + 1):
        plan = gc.get_gc_plan(t, lvl)
        cc_host = gc.fill_ghosts_lvl(cc_host, plan, ivs, method, bc_mixed,
                                     params)
        cc_dev = gc.fill_ghosts_lvl(cc_dev, plan, ivs, method, bc_mixed,
                                    params)
    diff = np.max(np.abs(np.asarray(cc_dev) - cc_host))
    assert diff < 1e-13, f"fused fill differs by {diff}"


def test_fused_matches_host_extrap_2d():
    t = make_refined_tree(2)
    batch = BoxBatch(t, 2, 0)
    rng = np.random.default_rng(5)
    cc_host = rng.random(np.asarray(batch.cc).shape)
    cc_dev = jnp.array(cc_host, copy=True)
    params = {}
    for lvl in range(1, t.highest_lvl + 1):
        plan = gc.get_gc_plan(t, lvl)
        mask = {}
        for d, p in enumerate(plan.dirs):
            if len(p.rb_ids):
                m = np.zeros(len(p.rb_ids), bool)
                m[::2] = True  # alternate extrapolating entries
                mask[d] = m
        mask = mask or None
        cc_host = gc.fill_ghosts_lvl(cc_host, plan, [0], gc.RB_MG,
                                     bc_mixed, params,
                                     rb_extrap_mask=mask)
        cc_dev = gc.fill_ghosts_lvl(cc_dev, plan, [0], gc.RB_MG,
                                    bc_mixed, params,
                                    rb_extrap_mask=mask)
    diff = np.max(np.abs(np.asarray(cc_dev) - cc_host))
    assert diff < 1e-13, f"fused extrap fill differs by {diff}"
