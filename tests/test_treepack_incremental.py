"""Incremental epoch-pack caching (core/treepack.cached_plan).

Refinement epochs rebuild + device_put only the levels whose topology
changed; this gates that the incrementally assembled pack is leaf-for-leaf
identical to a from-scratch build (same pytree structure, so the compiled
units' jit caches are hit identically), and that untouched levels reuse
the previous epoch's plan objects (zero rebuild / zero host->device
traffic for them).
"""

import numpy as np
import jax
import pytest

from afivo_streamer_tpu.core.tree import Tree, DO_REF, KEEP_REF
from afivo_streamer_tpu.core import treepack as tp


def _refine_low_corner(t):
    def flags_fn(ids):
        out = np.full([len(ids)] + [t.nc] * t.ndim, KEEP_REF, dtype=np.int64)
        for n, b in enumerate(ids):
            r0 = t.box_r_min(np.asarray([int(b)]))[0]
            if np.all(r0 < 1e-9) and t.lvl[int(b)] == t.highest_lvl:
                out[n] = DO_REF
        return out
    t.adjust_refinement(flags_fn)


def _assert_packs_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb, "pack pytree structure differs"
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("pad", [False, True])
def test_incremental_pack_matches_scratch(pad):
    t = Tree(2, 8, [16e-3, 16e-3], [16, 16])
    trash = 100 if pad else 0
    for _ in range(4):
        _refine_low_corner(t)
        inc = tp.get_epoch_pack(t, pad=pad, trash=trash, with_gc2=True)
        scratch = tp.EpochPack(t, pad=pad, trash=trash, with_gc2=True)
        _assert_packs_equal(inc, scratch)


def test_unchanged_levels_reuse_objects():
    t = Tree(2, 8, [16e-3, 16e-3], [16, 16])
    _refine_low_corner(t)
    _refine_low_corner(t)
    _refine_low_corner(t)
    p1 = tp.get_epoch_pack(t, pad=True, trash=100, with_gc2=True)
    # refining the low corner again only touches the finest level(s)
    _refine_low_corner(t)
    p2 = tp.get_epoch_pack(t, pad=True, trash=100, with_gc2=True)
    assert p2.n_levels == p1.n_levels + 1
    # level 1-2 plans must be the SAME objects (cache hit, not a rebuild)
    for l in range(2):
        assert p2.gc[l] is p1.gc[l]
        assert p2.tables[l] is p1.tables[l]
        assert p2.gc2[l] is p1.gc2[l]
    assert p2.pr[1] is p1.pr[1]


def test_generation_doubling_invalidates_padded_plans():
    t = Tree(2, 8, [16e-3, 16e-3], [16, 16])

    def refine_first_n_lvl1(n):
        def flags_fn(ids):
            out = np.full([len(ids)] + [t.nc] * t.ndim, KEEP_REF,
                          dtype=np.int64)
            lvl1 = sorted(int(b) for b in t.lvl_ids[0])[:n]
            for k, b in enumerate(ids):
                if int(b) in lvl1:
                    out[k] = DO_REF
            return out
        t.adjust_refinement(flags_fn)

    refine_first_n_lvl1(1)  # level 2: 4 boxes (bucket 4)
    tp.get_epoch_pack(t, pad=True, trash=100, with_gc2=True)
    gen1 = t.__dict__.get("_bucket_gen", 0)
    # widen level 2 past its bucket mark -> synchronized doubling
    for n in (2, 3, 4):
        refine_first_n_lvl1(n)
        tp.get_epoch_pack(t, pad=True, trash=100, with_gc2=True)
        if t.__dict__.get("_bucket_gen", 0) != gen1:
            break
    assert t.__dict__.get("_bucket_gen", 0) != gen1, \
        "expected a bucket generation doubling under level growth"
    # after doubling, the pack must still match a scratch build exactly
    inc = tp.get_epoch_pack(t, pad=True, trash=100, with_gc2=True)
    scratch = tp.EpochPack(t, pad=True, trash=100, with_gc2=True)
    _assert_packs_equal(inc, scratch)


def test_plan_cache_evicts_stale_entries():
    t = Tree(2, 8, [16e-3, 16e-3], [16, 16])
    for _ in range(3):
        _refine_low_corner(t)
        tp.get_epoch_pack(t, pad=True, trash=100, with_gc2=True)
    n_before = len(t._plan_cache)
    # many epochs later, entries from old fingerprints must be gone
    for _ in range(12):
        t.epoch += 1  # simulate epochs without topology change
        tp.get_epoch_pack(t, pad=True, trash=100, with_gc2=True)
    assert len(t._plan_cache) <= n_before
