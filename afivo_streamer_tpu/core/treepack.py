"""Epoch pack: all topology-derived tables of one refinement epoch as a
JAX pytree, so the compiled step takes them as *runtime arguments*.

The reference re-meshes every ``refine_per_steps`` steps
(``src/m_refine.f90:10-13``); baking index plans into the jit as constants
(round-1 design) retraces on every mesh change. Here every plan class is
registered as a pytree whose index/weight tables are leaves: jit caches on
the pytree *structure and shapes*, so two epochs whose tables share shapes
reuse the compiled executable. Shape stability across epochs comes from
**bucketed padding** (SURVEY.md section 7.3): every topology-length table is
padded to the next power of two, with padded entries made inert by

* gathering from / scattering to a reserved **trash box** (the last row of
  the state arrays, zeroed at the start of each compiled unit), and
* validity masks on the per-leaf/per-box reductions (dt limits, residuals,
  volume integrals), carried in :class:`LevelTables`.

The host (NumPy) path uses the exact same objects unpadded.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax

from . import ghostcell as gc
from . import prolong_restrict as pr
from .tree import Tree


# ---------------------------------------------------------------------------
# padding helpers
# ---------------------------------------------------------------------------
def bucket(n: int) -> int:
    """Shape bucket: next power of two (>= 4 for non-empty tables)."""
    if n <= 0:
        return 0
    b = 4
    while b < n:
        b *= 2
    return b


def bucket_hwm(tree, key, n: int) -> int:
    """Bucket with a per-tree high-water mark: a table that shrinks keeps
    its previous bucket, so derefinement epochs never change shapes (and
    never recompile); only growth past the mark does.

    Growth is SYNCHRONIZED into generations: the first table that grows
    past its mark in an epoch doubles EVERY existing mark. Without this,
    the dozens of per-(level, plan, direction) tables cross their own
    power-of-two boundaries at different refinement epochs during streamer
    growth, and every crossing changes the epoch-pack pytree shapes —
    i.e. retraces every compiled unit. Doubling together costs at most 2x
    padding (only ever on tables whose level is actively growing) and
    bounds the number of full retraces per run by ~log2(total growth)."""
    hw = tree.__dict__.setdefault("_bucket_hwm", {})
    b = bucket(n)
    old = hw.get(key, 0)
    if old == 0 and b > 0:
        # prepad: first sighting of a table reserves headroom so that
        # expected AMR growth never crosses a bucket boundary mid-run.
        # One retrace of the fused production step costs minutes of
        # remote XLA compile on TPU; padded device work is nearly free
        # in the latency-bound regime (driver.compiled%prepad)
        b = bucket(int(np.ceil(n * tree.__dict__.get("_prepad", 1.0))))
    # GLOBAL floor: every padded case table exists (all-trash) even while
    # the case is empty, at every level, from the level's first pack.
    # Plan builders key their pytree children on mark>0 ("empty this
    # epoch but mark nonzero -> dummy tables"); a mark of 0 means the
    # child is ABSENT, so the first real occurrence of a case mid-run
    # (e.g. a refinement boundary on a side a level never exposed, or a
    # coarse-fine flux coupling on a new direction) changed the epoch
    # pack's TREEDEF and forced a blocking retrace of every compiled
    # unit (~minutes of remote XLA; the round-4 bench's deterministic
    # it=554 stall). With the floor, a case birth with <=4 rows is a jit
    # cache hit; larger births fall into the synchronized-doubling path
    # below (one logged retrace). The cost is 4 trash rows per case.
    b = max(b, 4)
    if b > old > 0:
        if tree.__dict__.get("_bucket_gen_epoch") != tree.epoch:
            tree._bucket_gen_epoch = tree.epoch
            # generation counter: keys of the incremental per-level plan
            # cache include it, so a synchronized doubling invalidates
            # every cached padded plan at once (their shapes changed)
            tree._bucket_gen = tree.__dict__.get("_bucket_gen", 0) + 1
            # a synchronized doubling retraces every compiled unit
            # (~minutes of remote XLA on TPU): name the trigger so runs
            # that hit one are diagnosable from the log alone
            print(f"bucket doubling -> gen "
                  f"{tree._bucket_gen}: table {key} needs {n} "
                  f"(mark was {old})", flush=True)
            for k in hw:
                hw[k] = 2 * hw[k]
            old = hw.get(key, 0)
    hw[key] = max(b, old)
    return hw[key]


def pad_ids(a: np.ndarray, n_pad: int, trash: int) -> np.ndarray:
    """Pad a box-id table along axis 0 with the trash box."""
    if n_pad <= len(a):
        return a
    out = np.full((n_pad,) + a.shape[1:], trash, a.dtype)
    out[:len(a)] = a
    return out


def pad_rows(a: np.ndarray, n_pad: int) -> np.ndarray:
    """Pad a per-entry table along axis 0 by repeating the last row
    (harmless: the padded entry's scatter targets the trash box). An
    EMPTY table pads with zeros: phantom-level plans (see
    ``build_epoch_pack(phantom_levels=...)``) must produce the same
    shapes an eventual real level will."""
    if n_pad <= len(a):
        return a
    if len(a) == 0:
        return np.zeros((n_pad,) + a.shape[1:], a.dtype)
    reps = np.broadcast_to(a[-1:], (n_pad - len(a),) + a.shape[1:])
    return np.concatenate([a, reps], axis=0)


def pad_pos(a: np.ndarray, n_pad: int, pos: int) -> np.ndarray:
    """Pad a position table along axis 0 with a fixed position."""
    if n_pad <= len(a):
        return a
    out = np.full((n_pad,) + a.shape[1:], pos, a.dtype)
    out[:len(a)] = a
    return out


# ---------------------------------------------------------------------------
# phantom levels: pre-compiling the NEXT refinement level's executable
#
# When AMR adds a level, the epoch pack gains one entry per per-level list
# and every compiled unit retraces (~minutes of remote XLA on TPU, the
# round-3 "new-level compile cliff"). A *phantom* pack has the structure
# the pack WILL have once level L+1 exists — the phantom level's plans are
# built from an empty level, with their bucket marks seeded from level L's
# so their table shapes equal what the real level-(L+1) plans will get
# (new finest levels are born far smaller than the previous finest's
# bucket). The driver uses a phantom pack to warm the fused-step
# executable in a background thread; when the real level appears, the jit
# cache already holds the executable. Production packs never carry
# phantom levels — steady-state work is unchanged.
# ---------------------------------------------------------------------------
import contextlib


def seed_phantom_marks(tree, src_lvl: int, dst_lvl: int) -> None:
    """Mirror every bucket high-water mark of level ``src_lvl`` to
    ``dst_lvl`` (never shrinking an existing mark). Mark keys are
    ``(kind, lvl, ...)`` tuples throughout the package."""
    hw = tree.__dict__.setdefault("_bucket_hwm", {})
    for k, v in list(hw.items()):
        if isinstance(k, tuple) and len(k) >= 2 and k[1] == src_lvl:
            dk = (k[0], dst_lvl) + k[2:]
            hw[dk] = max(hw.get(dk, 0), v)


@contextlib.contextmanager
def phantom_levels(tree, n: int):
    """Temporarily append ``n`` empty levels to the tree's per-level id
    lists so plan constructors can build inert plans for levels
    ``highest_lvl+1 .. highest_lvl+n``. Seeds the phantom levels' bucket
    marks from the current finest level (and the finest coarse-fine
    coupling for the flux-matching groups)."""
    L = tree.highest_lvl
    for k in range(1, n + 1):
        seed_phantom_marks(tree, L, L + k)
        # (every case of the phantom level is additionally floored at the
        # minimum bucket by bucket_hwm's global floor)
        # flux-matching groups key on the COARSE level of the coupling:
        # the phantom coupling (L -> L+1) mirrors the (L-1 -> L) one
        hw = tree.__dict__.setdefault("_bucket_hwm", {})
        for d in range(2 * tree.ndim):
            sk, dk = ("cons", L - 1, d), ("cons", L + k - 1, d)
            if sk in hw:
                hw[dk] = max(hw.get(dk, 0), hw[sk])
        empty = np.zeros(0, np.int32)
        tree.lvl_ids.append(empty)
        tree.lvl_leaves.append(empty)
        tree.lvl_parents.append(empty)
    try:
        yield
    finally:
        del tree.lvl_ids[-n:]
        del tree.lvl_leaves[-n:]
        del tree.lvl_parents[-n:]


# ---------------------------------------------------------------------------
# incremental per-level plan cache
#
# Refinement epochs usually touch only the finest level or two; rebuilding
# and device_put-ing EVERY level's plans per epoch dominated refine cost
# (45% of wall in round 2). Each plan kind is cached on the tree keyed by
# the topology fingerprints of the levels it reads; unchanged levels reuse
# the previous (already device-resident) plan objects.
# ---------------------------------------------------------------------------
def level_fingerprint(tree, lvl: int):
    """Digest of everything plans read about one level: the id lists and
    the per-box ix/parent/children/neighbors wiring. Unchanged levels
    produce identical digests across epochs (box ids are stable)."""
    if lvl < 1 or lvl > tree.highest_lvl:
        return None
    fps = tree.__dict__.get("_lvl_fp")
    if fps is None or fps.get("epoch") != tree.epoch:
        fps = {"epoch": tree.epoch}
        tree._lvl_fp = fps
    if lvl not in fps:
        import hashlib
        h = hashlib.blake2b(digest_size=16)
        ids = np.ascontiguousarray(tree.lvl_ids[lvl - 1], np.int32)
        h.update(ids.tobytes())
        h.update(np.ascontiguousarray(tree.lvl_leaves[lvl - 1],
                                      np.int32).tobytes())
        h.update(np.ascontiguousarray(tree.lvl_parents[lvl - 1],
                                      np.int32).tobytes())
        for arr in (tree.ix[ids], tree.parent[ids], tree.children[ids],
                    tree.neighbors[ids]):
            h.update(np.ascontiguousarray(arr).tobytes())
        fps[lvl] = h.digest()
    return fps[lvl]


def cached_plan(tree, key, builder, dtype=None, device=False):
    """Build-or-reuse one plan object keyed by topology fingerprints.

    ``device=True`` stores the object device-resident (one device_put at
    build time; cache hits re-serve the same on-device arrays with zero
    host->device traffic). Inside a :func:`plan_transfer_batch` scope the
    device_put is DEFERRED and coalesced with every other plan built in
    the scope into one transfer call — on a remote TPU link each
    device_put is a round trip, and a topology-changing refinement epoch
    otherwise issues one per rebuilt plan."""
    cache = tree.__dict__.setdefault("_plan_cache", {})
    uses = tree.__dict__.setdefault("_plan_cache_uses", {})
    if key not in cache:
        obj = builder()
        if dtype is not None and np.dtype(dtype) != np.float64:
            obj = cast_pack_floats(obj, dtype)
        if device:
            batch = tree.__dict__.get("_plan_put_batch")
            if batch is not None:
                batch.append((key, obj))
            else:
                # sharded production runs replicate every plan over the
                # mesh (a single-device committed plan mixed with
                # mesh-sharded state in one jit call is an error);
                # unsharded runs place on the default device
                sh = tree.__dict__.get("_replicate_sharding")
                obj = jax.device_put(obj, sh) if sh is not None \
                    else jax.device_put(obj)
        cache[key] = obj
    uses[key] = tree.__dict__.get("_plan_cache_tick", 0)
    return cache[key]


@contextlib.contextmanager
def plan_transfer_batch(tree):
    """Coalesce every device-resident plan built in this scope into ONE
    jax.device_put call (transfers overlap instead of paying one tunnel
    round trip each). Re-entrant: inner scopes join the outermost."""
    if tree.__dict__.get("_plan_put_batch") is not None:
        yield  # already inside a batch scope
        return
    batch = []
    tree._plan_put_batch = batch
    try:
        yield
    finally:
        tree._plan_put_batch = None
        if batch:
            cache = tree.__dict__.setdefault("_plan_cache", {})
            keys = [k for k, _ in batch]
            objs = [o for _, o in batch]
            sh = tree.__dict__.get("_replicate_sharding")
            objs = _device_put_packed(objs, sh)
            for k, o in zip(keys, objs):
                cache[k] = o


def _device_put_packed(objs, sh=None):
    """device_put a pytree of host plan arrays as ONE packed buffer per
    dtype, then carve the leaves back out with device-side slices.

    Why: over a remote TPU tunnel, ``jax.device_put`` pays one blocking
    round trip per NOVEL buffer (~15-45 ms measured; repeated content is
    deduplicated). A topology-changing refinement epoch rebuilds a few
    hundred small plan tables with fresh content — i.e. seconds of wall
    per epoch, which was the dominant 'refine' share of the production
    bench for three rounds. Packing makes the epoch <=6 transfers (one
    per dtype); the per-leaf slice+reshape are ASYNC device dispatches
    (~0.1 ms each, they pipeline behind the transfer)."""
    from jax import lax
    leaves, treedef = jax.tree_util.tree_flatten(objs)
    by_dt = {}   # dtype -> [host ravels], running offset via list
    metas = []   # per leaf: (dtype_key, offset, n, shape) or None (0-size)
    for lf in leaves:
        a = np.asarray(lf)
        if a.dtype.kind in "OUS":
            raise TypeError(f"non-numeric plan leaf of dtype {a.dtype}")
        if a.size == 0:
            metas.append((None, 0, 0, (a.shape, a.dtype)))
            continue
        bucket_l = by_dt.setdefault(a.dtype.str, [0, []])
        off = bucket_l[0]
        bucket_l[1].append(a.ravel())
        bucket_l[0] = off + a.size
        metas.append((a.dtype.str, off, a.size, a.shape))
    bufs = {k: np.concatenate(v[1]) for k, v in by_dt.items()}
    dbufs = (jax.device_put(bufs, sh) if sh is not None
             else jax.device_put(bufs))
    out = []
    for dk, off, n, shape in metas:
        if dk is None:
            shape, dt = shape
            out.append(jax.device_put(np.zeros(shape, dt), sh)
                       if sh is not None
                       else jax.device_put(np.zeros(shape, dt)))
            continue
        seg = lax.slice(dbufs[dk], (off,), (off + n,))
        out.append(seg.reshape(shape))
    return jax.tree_util.tree_unflatten(treedef, out)


def plan_cache_tick(tree, keep: int = 8):
    """Advance the cache clock and evict entries unused for ``keep``
    builds (bounds device memory held by stale epochs)."""
    tick = tree.__dict__.get("_plan_cache_tick", 0) + 1
    tree._plan_cache_tick = tick
    cache = tree.__dict__.get("_plan_cache")
    uses = tree.__dict__.get("_plan_cache_uses")
    if not cache:
        return
    for k in [k for k, t in uses.items() if tick - t > keep]:
        del cache[k]
        del uses[k]


# ---------------------------------------------------------------------------
# per-level topology/geometry tables
# ---------------------------------------------------------------------------
class LevelTables:
    """Box-id lists and geometry factors of one level, with optional
    padding and validity masks (the pack analog of ``tree%lvls(lvl)``,
    ``m_af_types.f90:326-393``)."""

    def __init__(self, tree: Tree, lvl: int, pad: bool = False,
                 trash: int = 0):
        ndim, nc = tree.ndim, tree.nc
        self.lvl = lvl
        ids = np.asarray(tree.lvl_ids[lvl - 1], np.int32)
        leaves = np.asarray(tree.lvl_leaves[lvl - 1], np.int32)
        parents = np.asarray(tree.lvl_parents[lvl - 1], np.int32)
        self.n_ids = len(ids)
        self.n_leaves = len(leaves)
        self.n_parents = len(parents)
        pos = {int(b): i for i, b in enumerate(ids)}
        leaves_pos = np.array([pos[int(b)] for b in leaves], np.int32)
        parents_pos = np.array([pos[int(b)] for b in parents], np.int32)

        # geometry on the real leaves BEFORE padding (the trash box has no
        # tree row): cell volumes and cylindrical radial flux factors
        # (af_cyl_volume_cc / af_cyl_flux_factors)
        dr = tree.lvl_dr(lvl)
        n = len(leaves)
        # leaf-box lower corners [n, ndim]: traced geometry masks (e.g.
        # the plasma-region cell mask) derive cell coordinates from these
        self.leaf_r0 = tree.box_r_min(leaves).reshape(n, ndim)
        if tree.coord == "cyl":
            r0 = tree.box_r_min(leaves)[:, 0]
            i = np.arange(1, nc + 1)
            r_cc = r0[:, None] + (i[None, :] - 0.5) * dr[0]  # [n, nc]
            vol = 2.0 * np.pi * r_cc * np.prod(dr)
            self.vol = np.repeat(vol[:, :, None], nc ** (ndim - 1),
                                 axis=2).reshape(n, nc ** ndim)
            self.rfac_lo = (r_cc - 0.5 * dr[0]) / r_cc
            self.rfac_hi = (r_cc + 0.5 * dr[0]) / r_cc
        else:
            self.vol = np.full((n, nc ** ndim), float(np.prod(dr)))
            self.rfac_lo = None
            self.rfac_hi = None

        ids_valid = np.ones(len(ids))
        leaf_valid = np.ones(len(leaves))
        if pad:
            nb_ids = bucket_hwm(tree, ("tb", lvl, "i"), len(ids))
            nb_leaves = bucket_hwm(tree, ("tb", lvl, "l"), len(leaves))
            # parents min-bucket with headroom even on a childless (finest)
            # level: when the NEXT level first appears, this level's
            # parents table must not change shape (which would retrace
            # every compiled unit past the phantom-level pre-compile,
            # see phantom_levels above)
            nb_parents = bucket_hwm(tree, ("tb", lvl, "p"),
                                    max(len(parents), nb_ids // 8, 1))
            ids = pad_ids(ids, nb_ids, trash)
            leaves = pad_ids(leaves, nb_leaves, trash)
            parents = pad_ids(parents, nb_parents, trash)
            # padded positions point at the last (possibly padded) id slot
            leaves_pos = pad_pos(leaves_pos, nb_leaves, nb_ids - 1)
            parents_pos = pad_pos(parents_pos, nb_parents, nb_ids - 1)
            ids_valid = np.zeros(nb_ids)
            ids_valid[:self.n_ids] = 1.0
            leaf_valid = np.zeros(nb_leaves)
            leaf_valid[:self.n_leaves] = 1.0
            self.vol = pad_rows(self.vol, nb_leaves)
            if self.vol.shape[0] < nb_leaves:  # level with zero leaves
                self.vol = np.zeros((nb_leaves, nc ** ndim))
            self.leaf_r0 = pad_rows(self.leaf_r0, nb_leaves)
            if self.leaf_r0.shape[0] < nb_leaves:
                self.leaf_r0 = np.zeros((nb_leaves, ndim))
            if self.rfac_lo is not None:
                self.rfac_lo = pad_rows(self.rfac_lo, nb_leaves)
                self.rfac_hi = pad_rows(self.rfac_hi, nb_leaves)
                if self.rfac_lo.shape[0] < nb_leaves:
                    self.rfac_lo = np.ones((nb_leaves, nc))
                    self.rfac_hi = np.ones((nb_leaves, nc))
        self.ids = ids
        self.leaves = leaves
        self.parents = parents
        self.leaves_pos = leaves_pos
        self.parents_pos = parents_pos
        self.ids_valid = ids_valid
        self.leaf_valid = leaf_valid


# ---------------------------------------------------------------------------
# generic pytree registration for plan classes
# ---------------------------------------------------------------------------
_ARRAYLIKE = (np.ndarray, jax.Array)


def _is_dyn(v) -> bool:
    return isinstance(v, _ARRAYLIKE) or isinstance(v, jax.core.Tracer)


def register_plan(cls, dyn_fields, aux_fields, drop_fields=()):
    """Register ``cls`` so the attrs in dyn_fields are pytree children
    (index tables -> traced) and aux_fields are static (hashable values).
    Attrs in drop_fields are discarded on flatten (rebuild caches)."""
    dyn_fields = tuple(dyn_fields)
    aux_fields = tuple(aux_fields)

    def flatten(obj):
        children = tuple(getattr(obj, k, None) for k in dyn_fields)
        aux = tuple(_freeze(getattr(obj, k, None)) for k in aux_fields)
        return children, aux

    def unflatten(aux, children):
        obj = object.__new__(cls)
        for k, v in zip(dyn_fields, children):
            setattr(obj, k, v)
        for k, v in zip(aux_fields, aux):
            setattr(obj, k, _thaw(v))
        for k in drop_fields:
            setattr(obj, k, None)
        return obj

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


class _FrozenArray:
    """Hashable wrapper for a small static NumPy array in pytree aux."""

    __slots__ = ("data", "shape", "dtype")

    def __init__(self, a: np.ndarray):
        self.data = a.tobytes()
        self.shape = a.shape
        self.dtype = a.dtype.str

    def thaw(self) -> np.ndarray:
        return np.frombuffer(self.data, np.dtype(self.dtype)).reshape(
            self.shape)

    def __eq__(self, other):
        return (isinstance(other, _FrozenArray) and self.data == other.data
                and self.shape == other.shape and self.dtype == other.dtype)

    def __hash__(self):
        return hash((self.data, self.shape, self.dtype))


def _freeze(v):
    if isinstance(v, np.ndarray):
        return _FrozenArray(v)
    if isinstance(v, list):
        return ("__list__",) + tuple(_freeze(x) for x in v)
    return v


def _thaw(v):
    if isinstance(v, _FrozenArray):
        return v.thaw()
    if isinstance(v, tuple) and len(v) and v[0] == "__list__":
        return [_thaw(x) for x in v[1:]]
    return v


# ---------------------------------------------------------------------------
# plan-class registrations
# ---------------------------------------------------------------------------
register_plan(
    gc._DirPlan,
    dyn_fields=("copy_ids", "copy_nb", "bc_ids", "bc_coords", "rb_ids",
                "rb_coarse", "rb_parent", "rb_c1", "rb_c2", "rb_c3",
                "rb_tmp", "rb_pcopy"),
    aux_fields=("ghost_sidx", "f1_sidx", "f2_sidx", "nbint_sidx"))

register_plan(
    gc.GcLevelPlan,
    dyn_fields=("dirs", "corner_plans", "edge_plans"),
    aux_fields=("ndim", "nc", "lvl", "dr"))

register_plan(
    LevelTables,
    dyn_fields=("ids", "leaves", "parents", "leaves_pos", "parents_pos",
                "ids_valid", "leaf_valid", "vol", "rfac_lo", "rfac_hi",
                "leaf_r0"),
    # the true counts must NOT be pytree aux: they change at every
    # growth epoch, which would invalidate the jit cache (full retrace)
    # even when the bucketed shapes are unchanged. Traced code must use
    # shapes/validity masks only; the counts are dropped on flatten.
    aux_fields=("lvl",),
    drop_fields=("n_ids", "n_leaves", "n_parents"))


def _prp_flatten(p):
    children = tuple((g[1], g[2], g[3], g[4]) for g in p.groups)
    aux = (p.ndim, p.nc, p.coord, tuple(g[0].parity for g in p.groups))
    return children, aux


def _prp_unflatten(aux, children):
    ndim, nc, coord, parities = aux
    obj = object.__new__(pr.ProlongRestrictPlan)
    obj.ndim, obj.nc, obj.coord = ndim, nc, coord
    obj.groups = [(pr.parity_tables(ndim, nc, par),) + tuple(ch)
                  for par, ch in zip(parities, children)]
    return obj


jax.tree_util.register_pytree_node(pr.ProlongRestrictPlan, _prp_flatten,
                                   _prp_unflatten)


def _op_flatten(op):
    cnb_dyn = [c if _is_dyn(c) else None for c in op.c_nb]
    cnb_aux = tuple(None if _is_dyn(c) else float(c) for c in op.c_nb)
    c0_dyn = op.c0 if _is_dyn(op.c0) else None
    c0_aux = None if _is_dyn(op.c0) else float(op.c0)
    cs_dyn = op.c_sum if _is_dyn(op.c_sum) else None
    cs_aux = None if _is_dyn(op.c_sum) else float(op.c_sum)
    # veps is a child (its per-epoch content must not bust the jit cache)
    children = (c0_dyn, cnb_dyn, op.f, op.bc_coeff, op.ids, cs_dyn,
                op.veps)
    aux = (c0_aux, cnb_aux, op.per_box, cs_aux)
    return children, aux


def _op_unflatten(aux, children):
    from ..solvers.multigrid import LevelOp
    obj = object.__new__(LevelOp)
    (c0_dyn, cnb_dyn, obj.f, obj.bc_coeff, obj.ids, cs_dyn,
     obj.veps) = children
    c0_aux, cnb_aux, obj.per_box, cs_aux = aux
    obj.c0 = c0_dyn if c0_aux is None else c0_aux
    obj.c_nb = [d if a is None else a for d, a in zip(cnb_dyn, cnb_aux)]
    obj.c_sum = cs_dyn if cs_aux is None else cs_aux
    return obj


def register_level_op():
    from ..solvers.multigrid import LevelOp
    try:
        jax.tree_util.register_pytree_node(LevelOp, _op_flatten,
                                           _op_unflatten)
    except ValueError:
        pass  # already registered


_GC2_DIR_AUX = ("dim", "low", "rb_sign_dims")


def _gc2_flatten(p):
    dyn_dirs = [{k: v for k, v in info.items() if k not in _GC2_DIR_AUX}
                for info in p.dirs]
    aux_dirs = tuple(
        tuple((k, tuple(info[k]) if isinstance(info[k], list) else info[k])
              for k in _GC2_DIR_AUX if k in info)
        for info in p.dirs)
    children = (p.leaves, dyn_dirs)
    aux = (p.ndim, p.nc, p.lvl, _freeze(p.dr), _freeze(p.center_ext),
           _freeze(p.cc_all), aux_dirs)
    return children, aux


def _gc2_unflatten(aux, children):
    from ..physics.fluid import Gc2LevelPlan
    obj = object.__new__(Gc2LevelPlan)
    obj.leaves, dyn_dirs = children
    (obj.ndim, obj.nc, obj.lvl, dr, ce, ca, aux_dirs) = aux
    obj.dr = _thaw(dr)
    obj.center_ext = _thaw(ce)
    obj.cc_all = _thaw(ca)
    obj.leaf_pos = None
    obj.dirs = []
    for dyn, auxkv in zip(dyn_dirs, aux_dirs):
        info = dict(dyn)
        for k, v in auxkv:
            info[k] = list(v) if k == "rb_sign_dims" else v
        obj.dirs.append(info)
    return obj


def register_gc2():
    from ..physics.fluid import Gc2LevelPlan
    try:
        jax.tree_util.register_pytree_node(Gc2LevelPlan, _gc2_flatten,
                                           _gc2_unflatten)
    except ValueError:
        pass


class ConsistentGroup:
    """One (level, direction) flux-matching group (af_consistent_fluxes)."""

    def __init__(self, d, dim, nbs, chs, tgt, src, w):
        self.d, self.dim = d, dim
        self.nbs, self.chs, self.tgt = nbs, chs, tgt
        self.src, self.w = src, w


register_plan(ConsistentGroup,
              dyn_fields=("nbs", "chs", "tgt", "src", "w"),
              aux_fields=("d", "dim"))


# ---------------------------------------------------------------------------
# the epoch pack
# ---------------------------------------------------------------------------
class EpochPack:
    """All topology-derived plan objects of one epoch, one pytree.

    Built once per refinement epoch (host), passed as a jit argument to
    every compiled unit. ``pad=True`` buckets every table (see module
    docstring); the host path uses the same object unpadded."""

    def __init__(self, tree: Tree, pad: bool = False, trash: int = 0,
                 with_gc2: bool = False):
        from ..physics.fluid import Gc2LevelPlan
        L = tree.highest_lvl
        self.n_levels = L
        self.pad = pad
        self.trash = trash
        self.gc = [gc.GcLevelPlan(tree, l, pad=pad, trash=trash)
                   for l in range(1, L + 1)]
        # pr plan for level l prolongs/restricts between l-1 and l
        self.pr = [None] + [
            pr.ProlongRestrictPlan(tree, tree.lvl_ids[l - 1], pad=pad,
                                   trash=trash)
            for l in range(2, L + 1)]
        self.tables = [LevelTables(tree, l, pad=pad, trash=trash)
                       for l in range(1, L + 1)]
        self.gc2 = None
        self.consistent = None
        if with_gc2:
            from ..physics.fluid import build_consistent_plan
            self.gc2 = [Gc2LevelPlan(tree, l, pad=pad, trash=trash)
                        for l in range(1, L + 1)]
            self.consistent = build_consistent_plan(tree, pad=pad,
                                                    trash=trash)


register_plan(EpochPack,
              dyn_fields=("gc", "pr", "tables", "gc2", "consistent"),
              aux_fields=("n_levels", "pad", "trash"))


def cast_pack_floats(obj, dtype):
    """Cast every floating leaf of a plan pytree to ``dtype`` (the f32
    TPU path must not receive f64 leaves, which would promote the traced
    computation to emulated f64)."""
    def cast(leaf):
        if isinstance(leaf, np.ndarray) and \
                np.issubdtype(leaf.dtype, np.floating):
            return leaf.astype(dtype)
        return leaf
    return jax.tree_util.tree_map(cast, obj)


def build_epoch_pack(tree: Tree, pad: bool, trash: int, with_gc2: bool,
                     dtype=None, phantom: int = 0) -> EpochPack:
    """Assemble an EpochPack from per-level cached plans: only levels whose
    topology fingerprint changed since the last build are rebuilt (and, in
    compiled mode, device_put). See :func:`cached_plan`.

    ``phantom > 0`` appends that many inert (empty, all-trash) levels
    beyond ``highest_lvl``, structurally identical to the real plans the
    next refinement level will produce (see :func:`phantom_levels`) — used
    to pre-compile the next level's executables, never in production."""
    from ..physics.fluid import Gc2LevelPlan, build_consistent_plan
    dkey = None if dtype is None else np.dtype(dtype).str
    if phantom > 0:
        # the real levels' bucket marks must exist before the phantom
        # context mirrors them (cheap: per-level plans are cached)
        build_epoch_pack(tree, pad, trash, with_gc2, dtype=dtype)
        with phantom_levels(tree, phantom):
            return build_epoch_pack(tree, pad, trash, with_gc2,
                                    dtype=dtype, phantom=-phantom)
    if pad and tree.__dict__.get("_plan_put_batch") is None:
        # coalesce every missing plan's device transfer into ONE call,
        # then re-assemble from the (now device-resident) cache: on a
        # remote TPU link each device_put costs a round trip, and a
        # topology-changing epoch rebuilds several plans at once. The
        # second pass is pure cache hits (batching is a no-op there
        # because the scope below already closed and transferred).
        with plan_transfer_batch(tree):
            _build_epoch_pack_once(tree, pad, trash, with_gc2, dtype,
                                   phantom)
        return _build_epoch_pack_once(tree, pad, trash, with_gc2, dtype,
                                      phantom)
    return _build_epoch_pack_once(tree, pad, trash, with_gc2, dtype,
                                  phantom)


def _build_epoch_pack_once(tree, pad, trash, with_gc2, dtype, phantom):
    from ..physics.fluid import Gc2LevelPlan, build_consistent_plan
    dkey = None if dtype is None else np.dtype(dtype).str
    obj = None
    for _attempt in range(2):
        # a synchronized bucket doubling mid-build changes the shapes of
        # every padded table; restart so one pack is one generation
        # (doubling happens at most once per epoch, so pass 2 is stable)
        gen0 = tree.__dict__.get("_bucket_gen", 0)
        L = tree.highest_lvl + max(-phantom, 0)
        base = (pad, trash, dkey, gen0 if pad else -1)

        def fp(l):
            return level_fingerprint(tree, l)

        obj = object.__new__(EpochPack)
        obj.n_levels = L
        obj.pad = pad
        obj.trash = trash
        obj.gc = [
            cached_plan(tree, ("gc", l, fp(l - 1), fp(l)) + base,
                        lambda l=l: gc.GcLevelPlan(tree, l, pad=pad,
                                                   trash=trash),
                        dtype=dtype, device=pad)
            for l in range(1, L + 1)]
        obj.pr = [None] + [
            cached_plan(tree, ("pr", l, fp(l - 1), fp(l)) + base,
                        lambda l=l: pr.ProlongRestrictPlan(
                            tree, tree.lvl_ids[l - 1], pad=pad, trash=trash,
                            lvl=l),
                        dtype=dtype, device=pad)
            for l in range(2, L + 1)]
        obj.tables = [
            cached_plan(tree, ("tb", l, fp(l)) + base,
                        lambda l=l: LevelTables(tree, l, pad=pad,
                                                trash=trash),
                        dtype=dtype, device=pad)
            for l in range(1, L + 1)]
        obj.gc2 = None
        obj.consistent = None
        if with_gc2:
            obj.gc2 = [
                cached_plan(tree, ("gc2", l, fp(l - 1), fp(l)) + base,
                            lambda l=l: Gc2LevelPlan(tree, l, pad=pad,
                                                     trash=trash),
                            dtype=dtype, device=pad)
                for l in range(1, L + 1)]
            cons = [
                cached_plan(tree, ("cons", l, fp(l), fp(l + 1)) + base,
                            lambda l=l: build_consistent_plan(
                                tree, pad=pad, trash=trash, lvls=(l,)),
                            dtype=dtype, device=pad)
                for l in range(1, L)]
            obj.consistent = [g for lst in cons for g in lst]
        if tree.__dict__.get("_bucket_gen", 0) == gen0:
            break
    return obj


def get_epoch_pack(tree: Tree, pad: bool = False, trash: int = 0,
                   with_gc2: bool = False, dtype=None) -> EpochPack:
    cache = getattr(tree, "_epoch_pack_cache", None)
    dkey = None if dtype is None else np.dtype(dtype).str
    key = (pad, trash, with_gc2, dkey)
    if cache is None or cache.get("epoch") != tree.epoch:
        cache = {"epoch": tree.epoch}
        tree._epoch_pack_cache = cache
        plan_cache_tick(tree)
    if key not in cache:
        obj = build_epoch_pack(tree, pad=pad, trash=trash,
                               with_gc2=with_gc2, dtype=dtype)
        if tree.__dict__.get("_plan_put_batch") is not None:
            # inside a transfer-batch first pass the pack references
            # host-side plans — usable by the caller, but must not be
            # cached past the batch scope (the cache would keep serving
            # host arrays)
            return obj
        cache[key] = obj
    return cache[key]


def get_level_tables(tree: Tree, lvl: int) -> LevelTables:
    """Host-path per-level tables, cached per epoch (unpadded)."""
    cache = getattr(tree, "_lvl_tables_cache", None)
    if cache is None or cache.get("epoch") != tree.epoch:
        cache = {"epoch": tree.epoch}
        tree._lvl_tables_cache = cache
    if lvl not in cache:
        cache[lvl] = LevelTables(tree, lvl)
    return cache[lvl]
