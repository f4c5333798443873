"""Drift-diffusion-reaction fluid model: the hot path.

Re-designs the reference's ``src/m_fluid.f90`` (forward_euler ``:21-99``,
flux_upwind ``:102-209``, add_source_terms ``:298-466``) plus the flux
engine of ``afivo/src/m_af_flux_schemes.f90`` (flux_upwind_tree/box
``:666-848``, reconstruct_upwind_1d ``:282-303``, flux_update_densities
``:320-436``) and the 2-ghost assembly ``m_af_ghostcell.f90:672-856``
(af_gc2_box + gc2_prolong_rb) and fine-to-coarse flux matching
``m_af_core.f90:1257-1404`` (af_consistent_fluxes).

Instead of per-box line loops, every level pass operates on an extended
array ``E[n_leaves, n_species, (nc+4)^ndim]`` with two ghost layers; the
Koren-limited upwind reconstruction, transport-coefficient lookups, flux
evaluation, CFL/dielectric-relaxation time step terms, chemistry source
terms and the conservative update are batched elementwise ops that XLA
fuses into a few kernels per level.
"""

from __future__ import annotations

import threading as _threading
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from .. import constants as uc
from ..core import spatial as sp
from ..core import ghostcell as gc
from ..core import prolong_restrict as pr
from ..core import rowops as ro
from ..core.tree import Tree, NO_BOX, neighb_dim, neighb_low
from ..ops.limiters import limiter_apply, LIMITER_KOREN
from .transport_data import (TD_MOBILITY, TD_DIFFUSION, TD_EE_MOBILITY,
                             TD_EE_DIFFUSION, TD_EE_LOSS)

#: energy fluxes are 5/3 times the electron flux (m_fluid.f90:122)
FIVE_THIRD = 5.0 / 3.0


def _xp(a):
    return np if isinstance(a, np.ndarray) else jnp


def _cst(a, like):
    """Cast NumPy f64 constants to the operand dtype (avoid emulated-f64
    promotion of the traced f32 path)."""
    if isinstance(a, (np.ndarray, np.generic)) and not isinstance(like, np.ndarray):
        return np.asarray(a).astype(like.dtype)
    return a


def _tiny(xp):
    """The reference's 1e-100 guard; on the traced path a value inside the
    f32 exponent range, since TPU f64 emulation flushes 1e-100 to zero."""
    return 1e-100 if xp is np else 1e-30


def _huge(xp):
    """The reference's 1e100 sentinel, f32-range-safe when traced."""
    return 1e100 if xp is np else 1e30


# --------------------------------------------------------------------------
# 2-ghost extended-array plan (af_gc2_box)
# --------------------------------------------------------------------------
class Gc2LevelPlan:
    """Index tables to assemble [n_leaves, nv, (nc+4)^ndim] extended arrays
    for the leaves of one level. Reference coordinates -1..nc+2 map to
    extended indices 0..nc+3 (shift +1)."""

    def __init__(self, tree: Tree, lvl: int, pad: bool = False,
                 trash: int = 0):
        ndim, nc = tree.ndim, tree.nc
        self.ndim, self.nc, self.lvl = ndim, nc, lvl
        hnc = nc // 2
        leaves = tree.lvl_leaves[lvl - 1]
        self.leaves = np.asarray(leaves, np.int32)
        self.leaf_pos = {int(b): i for i, b in enumerate(leaves)}
        self.dr = tree.lvl_dr(lvl)

        # center copy: cc (nc+2)^d -> ext at 1..nc+2 per dim
        self.center_ext = sp.ext_flat(ndim, nc, *[np.arange(1, nc + 3)] * ndim)
        self.cc_all = sp.all_flat(ndim, nc)

        self.dirs = []
        for d in range(2 * ndim):
            dim, low = neighb_dim(d), neighb_low(d)
            info: Dict = {"dim": dim, "low": low}

            def axes_ext(face_vals):
                return [face_vals if k == dim else np.arange(2, nc + 2)
                        for k in range(ndim)]

            # extended-array target slabs (transverse: interior ref 1..nc)
            l12 = np.array([0, 1]) if low else np.array([nc + 2, nc + 3])
            info["slab_ext"] = sp.ext_flat(ndim, nc, *axes_ext(l12))
            # neighbor source cells (cc coords): low: nc-1..nc ; high: 1..2
            nbv = np.array([nc - 1, nc]) if low else np.array([1, 2])
            info["nb_cc"] = sp.cc_flat(ndim, nc, *[
                nbv if k == dim else np.arange(1, nc + 1) for k in range(ndim)])
            # first/second interior layers (for BC)
            f1 = 1 if low else nc
            f2 = 2 if low else nc - 1
            info["f1_cc"] = sp.cc_flat(ndim, nc, *[
                np.array([f1]) if k == dim else np.arange(1, nc + 1)
                for k in range(ndim)])
            info["f2_cc"] = sp.cc_flat(ndim, nc, *[
                np.array([f2]) if k == dim else np.arange(1, nc + 1)
                for k in range(ndim)])
            info["l1_ext"] = sp.ext_flat(ndim, nc, *axes_ext(
                np.array([1] if low else [nc + 2])))
            info["l2_ext"] = sp.ext_flat(ndim, nc, *axes_ext(
                np.array([0] if low else [nc + 3])))
            # ghost layer of the 1-ghost cc array (for write-back)
            info["gc_cc"] = sp.cc_flat(ndim, nc, *[
                np.array([0 if low else nc + 1]) if k == dim
                else np.arange(1, nc + 1) for k in range(ndim)])

            copy_ids, copy_nb, bc_ids, rb_ids = [], [], [], []
            for b in leaves:
                nb = int(tree.neighbors[b, d])
                if nb >= 0:
                    copy_ids.append(int(b))
                    copy_nb.append(nb)
                elif nb == NO_BOX:
                    rb_ids.append(int(b))
                else:
                    bc_ids.append(int(b))
            info["copy_pos"] = np.array([self.leaf_pos[b] for b in copy_ids],
                                        np.int32)
            info["copy_nb"] = np.asarray(copy_nb, np.int32)
            info["bc_pos"] = np.array([self.leaf_pos[b] for b in bc_ids],
                                      np.int32)
            info["bc_ids"] = np.asarray(bc_ids, np.int32)
            # face coordinates for BC values
            if bc_ids:
                coords = []
                for bid in bc_ids:
                    r0 = tree.box_r_min(np.asarray([bid]))[0]
                    dr = self.dr
                    axes = []
                    for k in range(ndim):
                        if k == dim:
                            axes.append(np.array(
                                [r0[k] if low else r0[k] + nc * dr[k]]))
                        else:
                            axes.append(r0[k] + (np.arange(nc) + 0.5) * dr[k])
                    mesh = np.meshgrid(*axes, indexing="ij")
                    coords.append(np.stack([m.ravel() for m in mesh], -1))
                info["bc_coords"] = np.asarray(coords)

            # refinement boundaries: gc2_prolong_rb gather tables
            info["rb_pos"] = np.array([self.leaf_pos[b] for b in rb_ids],
                                      np.int32)
            if rb_ids:
                rb_ids_np = np.asarray(rb_ids)
                parents = tree.parent[rb_ids_np]
                info["rb_coarse"] = tree.neighbors[parents, d].astype(np.int32)
                T = hnc ** (ndim - 1)
                cface = nc if low else 1
                tdims = [k for k in range(ndim) if k != dim]
                # coarse cell coordinates per entry: [n_rb, T, ndim]
                n_rb = len(rb_ids)
                cc0 = np.zeros((n_rb, T), np.int32)
                lo_t = [np.zeros((n_rb, T), np.int32) for _ in range(ndim)]
                hi_t = [np.zeros((n_rb, T), np.int32) for _ in range(ndim)]
                for n_i, b in enumerate(rb_ids):
                    off = tree.child_offset(int(b))
                    if ndim == 1:
                        base = np.array([[cface]])
                        coords_c = base.reshape(1, 1)
                        v = np.zeros((1, 1), np.int64)
                        v[:, 0] = cface
                    else:
                        axes = []
                        for k in range(ndim):
                            if k == dim:
                                axes.append(np.array([cface]))
                            else:
                                axes.append(off[k] + np.arange(1, hnc + 1))
                        mesh = np.meshgrid(*axes, indexing="ij")
                        v = np.stack([m.ravel() for m in mesh], -1)
                    cc0[n_i] = sp.cc_flat_nd(ndim, nc, v)
                    for k in range(ndim):
                        vl = v.copy(); vl[:, k] -= 1
                        vh = v.copy(); vh[:, k] += 1
                        lo_t[k][n_i] = sp.cc_flat_nd(ndim, nc, vl)
                        hi_t[k][n_i] = sp.cc_flat_nd(ndim, nc, vh)
                info["rb_c0"] = cc0
                info["rb_lo"] = lo_t
                info["rb_hi"] = hi_t
                # static fine targets in the extended array per sign combo:
                # (s_face, s_t1[, s_t2]) each in {-1,+1}
                import itertools as it
                targets = {}
                for signs in it.product([-1, 1], repeat=ndim):
                    # face-dim ext position
                    if low:
                        fpos = 0 if signs[0] < 0 else 1
                    else:
                        fpos = nc + 2 if signs[0] < 0 else nc + 3
                    if ndim == 1:
                        tg = sp.ext_flat(1, nc, np.array([fpos]))
                    else:
                        axes = []
                        ti = 0
                        for k in range(ndim):
                            if k == dim:
                                axes.append(np.array([fpos]))
                            else:
                                tcells = np.arange(hnc)
                                base = 2 + 2 * tcells  # ext coord of fine lo
                                axes.append(base + (1 if signs[1 + ti] > 0
                                                    else 0))
                                ti += 1
                        mesh = np.meshgrid(*axes, indexing="ij")
                        v = np.stack([m.ravel() for m in mesh], -1)
                        tg = sp.cc_flat_nd(ndim, nc, v * 0) * 0  # placeholder
                        tg = np.ravel_multi_index(
                            [v[:, k] for k in range(ndim)],
                            [nc + 4] * ndim).astype(np.int32)
                    targets[signs] = tg
                # order sign dims: (face, transverse in dim order)
                info["rb_targets"] = targets
                # map sign tuple position k -> actual dim
                info["rb_sign_dims"] = [dim] + tdims
            self.dirs.append(info)

        if pad:
            # bucketed padding (core/treepack.py): padded leaf slots gather
            # from / scatter to the trash box; padded case entries target a
            # padded row of the extended array
            from ..core import treepack as tp
            n_real = len(self.leaves)
            n_pad = tp.bucket_hwm(tree, ("g2", lvl, "L"), n_real)
            self.leaves = tp.pad_ids(self.leaves, n_pad, trash)
            pad_row = max(n_pad - 1, 0)
            for di, info in enumerate(self.dirs):
                nb = tp.bucket_hwm(tree, ("g2", lvl, di, "c"),
                                   len(info["copy_pos"]))
                info["copy_pos"] = tp.pad_pos(info["copy_pos"], nb, pad_row)
                info["copy_nb"] = tp.pad_ids(info["copy_nb"], nb, trash)
                nb = tp.bucket_hwm(tree, ("g2", lvl, di, "b"),
                                   len(info["bc_pos"]))
                info["bc_pos"] = tp.pad_pos(info["bc_pos"], nb, pad_row)
                info["bc_ids"] = tp.pad_ids(info["bc_ids"], nb, trash)
                if "bc_coords" in info:
                    info["bc_coords"] = tp.pad_rows(info["bc_coords"], nb)
                elif nb > 0:
                    info["bc_coords"] = np.zeros((nb, nc ** (ndim - 1),
                                                  ndim))
                nb = tp.bucket_hwm(tree, ("g2", lvl, di, "r"),
                                   len(info["rb_pos"]))
                info["rb_pos"] = tp.pad_pos(info["rb_pos"], nb, pad_row)
                if nb and "rb_coarse" in info:
                    info["rb_coarse"] = tp.pad_ids(info["rb_coarse"], nb,
                                                   trash)
                    info["rb_c0"] = tp.pad_rows(info["rb_c0"], nb)
                    info["rb_lo"] = [tp.pad_rows(a, nb)
                                     for a in info["rb_lo"]]
                    info["rb_hi"] = [tp.pad_rows(a, nb)
                                     for a in info["rb_hi"]]
                elif nb:
                    # empty this epoch, nonzero high-water mark: dummy
                    # tables keep the pytree structure and shapes stable
                    T = hnc ** (ndim - 1)
                    info["rb_coarse"] = np.full(nb, trash, np.int32)
                    info["rb_c0"] = np.zeros((nb, T), np.int32)
                    info["rb_lo"] = [np.zeros((nb, T), np.int32)
                                     for _ in range(ndim)]
                    info["rb_hi"] = [np.zeros((nb, T), np.int32)
                                     for _ in range(ndim)]
                    import itertools as it
                    if "rb_targets" not in info:
                        # static tables: rebuild minimal placeholders
                        info["rb_targets"] = {
                            signs: np.zeros(max(T, 1), np.int32)
                            for signs in it.product([-1, 1], repeat=ndim)}
                        info["rb_sign_dims"] = [info["dim"]] + [
                            k for k in range(ndim) if k != info["dim"]]


def get_gc2_plan(tree: Tree, lvl: int) -> Gc2LevelPlan:
    cache = getattr(tree, "_gc2_plan_cache", None)
    if cache is None or cache.get("epoch") != tree.epoch:
        cache = {"epoch": tree.epoch}
        tree._gc2_plan_cache = cache
    if lvl not in cache:
        cache[lvl] = Gc2LevelPlan(tree, lvl)
    return cache[lvl]


def gc2_extend(cc, plan: Gc2LevelPlan, ivs, bc_fn, params,
               prolong_limiter: int):
    """Assemble the 2-ghost extended array for the level's leaves and write
    the first ghost layer back into cc (af_gc2_box semantics).

    Returns (E, cc): E has shape [n_leaves, n_iv, (nc+4)^ndim]."""
    xp = _xp(cc)
    ndim, nc = plan.ndim, plan.nc
    ivs = np.asarray(ivs, np.int32)
    n_leaves = len(plan.leaves)
    E = xp.zeros((n_leaves, len(ivs), (nc + 4) ** ndim), dtype=cc.dtype)

    # center
    center = cc[ivs][:, plan.leaves][:, :, plan.cc_all]  # [nv, n, S]
    center = xp.transpose(center, (1, 0, 2))
    if isinstance(E, np.ndarray):
        E[:, :, plan.center_ext] = center
    else:
        E = E.at[:, :, plan.center_ext].set(center)

    for info in plan.dirs:
        dim, low = info["dim"], info["low"]
        # same-level neighbors
        if len(info["copy_pos"]):
            vals = cc[ivs][:, info["copy_nb"]][:, :, info["nb_cc"]]
            vals = xp.transpose(vals, (1, 0, 2))
            if isinstance(E, np.ndarray):
                E[info["copy_pos"][:, None, None], np.arange(len(ivs))[None, :, None],
                  info["slab_ext"][None, None, :]] = vals
            else:
                E = E.at[jnp.asarray(info["copy_pos"])[:, None, None],
                         jnp.arange(len(ivs))[None, :, None],
                         jnp.asarray(info["slab_ext"])[None, None, :]].set(vals)
        # physical boundaries (bc_to_gc2, m_af_ghostcell.f90:283-378)
        if len(info["bc_pos"]):
            x1 = cc[ivs][:, info["bc_ids"]][:, :, info["f1_cc"]]
            x2 = cc[ivs][:, info["bc_ids"]][:, :, info["f2_cc"]]
            x1 = xp.transpose(x1, (1, 0, 2))
            x2 = xp.transpose(x2, (1, 0, 2))
            l1 = []
            l2 = []
            for i, iv in enumerate(ivs):
                bc_type, b = bc_fn(int(iv), 2 * dim + (0 if low else 1),
                                   info.get("bc_coords"), params)
                if bc_type == gc.BC_DIRICHLET:
                    c0, c1, c2 = 2.0, -1.0, 2.0
                elif bc_type == gc.BC_NEUMANN:
                    sgn = -1.0 if low else 1.0
                    c0 = sgn * float(plan.dr[dim])
                    c1, c2 = 1.0, 3.0 * c0
                elif bc_type == gc.BC_DIRICHLET_COPY:
                    c0, c1, c2 = 1.0, 0.0, 1.0
                else:
                    raise ValueError("unsupported bc for gc2")
                l1.append(c0 * b + c1 * x1[:, i])
                l2.append(c2 * b + c1 * x2[:, i])
            l1 = xp.stack(l1, axis=1)
            l2 = xp.stack(l2, axis=1)
            if isinstance(E, np.ndarray):
                E[info["bc_pos"][:, None, None], np.arange(len(ivs))[None, :, None],
                  info["l1_ext"][None, None, :]] = l1
                E[info["bc_pos"][:, None, None], np.arange(len(ivs))[None, :, None],
                  info["l2_ext"][None, None, :]] = l2
            else:
                ai = jnp.arange(len(ivs))[None, :, None]
                bp = jnp.asarray(info["bc_pos"])[:, None, None]
                E = E.at[bp, ai, jnp.asarray(info["l1_ext"])[None, None, :]].set(l1)
                E = E.at[bp, ai, jnp.asarray(info["l2_ext"])[None, None, :]].set(l2)
        # refinement boundaries (gc2_prolong_rb, m_af_ghostcell.f90:753-856)
        if len(info["rb_pos"]):
            coarse = info["rb_coarse"]
            c0v = cc[ivs][:, coarse[:, None], info["rb_c0"]]  # [nv, n_rb, T]
            fvals = []
            for k in range(ndim):
                lo = cc[ivs][:, coarse[:, None], info["rb_lo"][k]]
                hi = cc[ivs][:, coarse[:, None], info["rb_hi"][k]]
                fvals.append(0.25 * limiter_apply(c0v - lo, hi - c0v,
                                                  prolong_limiter))
            sdims = info["rb_sign_dims"]
            for signs, tg in info["rb_targets"].items():
                vals = c0v
                for k_pos, s in enumerate(signs):
                    vals = vals + s * fvals[sdims[k_pos]]
                vals = xp.transpose(vals, (1, 0, 2))
                if isinstance(E, np.ndarray):
                    E[info["rb_pos"][:, None, None],
                      np.arange(len(ivs))[None, :, None],
                      tg[None, None, :]] = vals
                else:
                    E = E.at[jnp.asarray(info["rb_pos"])[:, None, None],
                             jnp.arange(len(ivs))[None, :, None],
                             jnp.asarray(tg)[None, None, :]].set(vals)

    # write the first ghost layer back into cc (af_gc2_box :739-744)
    for info in plan.dirs:
        vals = E[:, :, info["l1_ext"]]
        vals = xp.transpose(vals, (1, 0, 2))
        if isinstance(cc, np.ndarray):
            cc[ivs[:, None, None], plan.leaves[None, :, None],
               info["gc_cc"][None, None, :]] = vals
        else:
            cc = cc.at[jnp.asarray(ivs)[:, None, None],
                       jnp.asarray(plan.leaves)[None, :, None],
                       jnp.asarray(info["gc_cc"])[None, None, :]].set(vals)
    return E, cc


# --------------------------------------------------------------------------
# Flux computation, consistent fluxes, conservative update with sources
# --------------------------------------------------------------------------
@dataclass
class FluidIndices:
    """Variable indices wired by the simulation setup."""
    i_electron: int
    i_1pos_ion: int
    i_electric_fld: int  # cc field norm
    fc_E: int            # fc electric field
    flux_species: List[int]      # cc base indices of species with fluxes
    flux_fc: List[int]           # fc indices of their fluxes
    flux_charge_sign: np.ndarray
    all_densities: List[int]     # cc base indices of all evolving densities
    species_cc: List[int]        # cc index per chemistry species
    i_photo: int = -1
    photoi_species_cc: int = -1
    i_gas_dens: int = -1
    i_electron_energy: int = -1  # flux variable 2 for the ee53 model
    i_srcfac: int = -1           # output variable for the source factor


class FluidModel:
    """Batched forward-Euler step of the plasma fluid model."""

    def __init__(self, tree: Tree, idx: FluidIndices, chemistry, transport,
                 gas, bc_species: Callable, dt_cfg, settings,
                 prolong_limiter: int, limiter: int = LIMITER_KOREN):
        self.tree = tree
        self.idx = idx
        self.chem = chemistry
        self.td = transport
        self.gas = gas
        self.bc_species = bc_species
        self.dt_cfg = dt_cfg
        self.st = settings
        self.prolong_limiter = prolong_limiter
        self.limiter = limiter
        self.field_compute = None  # wired by the simulation (m_field)
        self.wc = None             # wall-clock breakdown dict (driver)
        self.mask_provider = None  # callable(lvl) -> bool mask [n_leaves, C]
        self.dielectric = None     # wired when use_dielectric
        self.last_diag = {}
        # compiled-path state (core/treepack.py): ambient epoch pack while
        # tracing, jitted units keyed by substep configuration. The pack
        # slots are THREAD-LOCAL (property block below the class): the
        # driver warms next-level executables by tracing in a background
        # thread concurrently with main-thread traces
        self._pack_tls = _threading.local()
        self._pack = None
        self._pack_surf = None     # SurfacePack while tracing (dielectric)
        self._jit_cfg = None
        self._jit_units = {}

    # ------------------------------------------------- compiled plumbing
    def enable_jit(self, pad: bool = True, trash: int = 0):
        if self._jit_cfg != (pad, trash):
            # the trash row index is baked into the traced closures
            self._jit_units.clear()
        self._jit_cfg = (pad, trash)

    def _tb(self, lvl: int):
        from ..core import treepack as tp
        if self._pack is not None:
            return self._pack.tables[lvl - 1]
        return tp.get_level_tables(self.tree, lvl)

    def _gc2_plan(self, lvl: int):
        if self._pack is not None:
            return self._pack.gc2[lvl - 1]
        return get_gc2_plan(self.tree, lvl)

    def _n_levels(self) -> int:
        if self._pack is not None:
            return self._pack.n_levels
        return self.tree.highest_lvl

    def _leaf_valid(self, lvl: int, n: int, extra_dims: int):
        """Per-leaf validity mask shaped [n] + [1]*extra, or None."""
        if self._pack is None or not self._pack.pad:
            return None
        v = self._tb(lvl).leaf_valid
        return (v > 0).reshape((n,) + (1,) * extra_dims)

    # -------------------------------------------------------- flux kernel
    def compute_fluxes(self, cc, fc, s_deriv: int, params):
        """flux_upwind_tree: per-level 2-ghost assembly + Koren upwind flux
        + CFL/DRT terms + fine-to-coarse flux matching.

        Returns (cc, fc, dt_cfl, dt_drt)."""
        t = self.tree
        nc, ndim = t.nc, t.ndim
        xp = _xp(cc)
        idx = self.idx
        sp_ivs = [iv + s_deriv for iv in idx.flux_species]
        n_sp = len(sp_ivs)
        has_ee = idx.i_electron_energy >= 0
        n_elec = 2 if has_ee else 1  # flux_num_electron_vars
        cfl_factor = FIVE_THIRD if has_ee else 1.0
        sign = idx.flux_charge_sign

        # ghost-cell validity near refinement boundaries
        cc = pr.restrict_tree(cc, t, np.asarray(sp_ivs), use_geometry=True,
                              pack=self._pack)

        inv_max_cfl = 0.0   # max over cells of sum_d cfl terms
        max_sigma = _tiny(xp)

        mob_tbl = self.td.tbl
        N_inv = self.gas.inverse_number_density

        for lvl in range(1, self._n_levels() + 1):
            plan = self._gc2_plan(lvl)
            if len(plan.leaves) == 0:
                continue
            E, cc = gc2_extend(cc, plan, sp_ivs, self.bc_species, params,
                               self.prolong_limiter)
            n = len(plan.leaves)
            dr = plan.dr
            valid = self._leaf_valid(lvl, n, ndim)
            Eb = E.reshape((n, n_sp) + (nc + 4,) * ndim)
            # cell-centered field norm with 1 ghost
            Bfld = cc[idx.i_electric_fld, sp.aix(plan.leaves)].reshape(
                (n,) + (nc + 2,) * ndim)
            Bgas = None
            if not self.gas.constant_density:
                Bgas = cc[idx.i_gas_dens, sp.aix(plan.leaves)].reshape(
                    (n,) + (nc + 2,) * ndim)
            cfl_sum = xp.zeros((n,) + (nc,) * ndim, dtype=cc.dtype)

            for d in range(ndim):
                def sl_faces(arr, start, width, ghost=1):
                    # slice along dim d: [start, start+width) in that dim,
                    # transverse interior of `ghost`-ghost array
                    tot = arr.shape[-1] if False else None
                    slc = []
                    for k in range(ndim):
                        if k == d:
                            slc.append(slice(start, start + width))
                        else:
                            slc.append(slice(ghost, ghost + nc))
                    return arr[(Ellipsis,) + tuple(slc)]

                cL2 = sl_faces(Eb, 0, nc + 1, ghost=2)
                cL = sl_faces(Eb, 1, nc + 1, ghost=2)
                cR = sl_faces(Eb, 2, nc + 1, ghost=2)
                cR2 = sl_faces(Eb, 3, nc + 1, ghost=2)

                # upwind reconstruction (reconstruct_upwind_1d)
                u_pos = cL + 0.5 * limiter_apply(cR - cL, cL - cL2,
                                                 self.limiter)
                u_neg = cR - 0.5 * limiter_apply(cR - cL, cR2 - cR,
                                                 self.limiter)

                # face-centered E-field component
                E_fc = ro.fc_get_faces(fc, idx.fc_E, d, plan.leaves,
                                       nc, ndim)

                dir_pos = (_cst(sign, E_fc).reshape(
                    (1, n_sp) + (1,) * ndim) * E_fc[:, None]) > 0
                u_f = xp.where(dir_pos, u_pos, u_neg)

                # field strength at faces -> mobility/diffusion lookup;
                # with dynamic gas the inverse density is face-averaged
                # (flux_upwind, m_fluid.f90:147-153)
                if Bgas is not None:
                    Ng_lo = sl_faces(Bgas, 0, nc + 1, ghost=1)
                    Ng_hi = sl_faces(Bgas, 1, nc + 1, ghost=1)
                    # trash/padded rows carry N = 0: guard the division —
                    # an inf/NaN in the trash row poisons every real row
                    # that 0-weight-gathers it (0 * inf = NaN)
                    Ng_sum = Ng_lo + Ng_hi
                    N_inv_f = 2.0 / xp.where(Ng_sum > 0.0, Ng_sum, 1.0)
                else:
                    N_inv_f = N_inv
                if has_ee:
                    # local energy approximation: mobility/diffusion from
                    # the face mean energy (flux_upwind, m_fluid.f90:159-168)
                    mean_en_f = u_f[:, 1] / xp.maximum(u_f[:, 0], 1.0)
                    mu, dc = self.td.ee_tbl.get_cols(
                        (TD_EE_MOBILITY, TD_EE_DIFFUSION), mean_en_f)
                    mu = mu * N_inv_f
                    dc = dc * N_inv_f
                else:
                    fld_lo = sl_faces(Bfld, 0, nc + 1, ghost=1)
                    fld_hi = sl_faces(Bfld, 1, nc + 1, ghost=1)
                    fld_face = (0.5 * (fld_lo + fld_hi)
                                * uc.SI_to_Townsend * N_inv_f)
                    mu, dc = mob_tbl.get_cols(
                        (TD_MOBILITY, TD_DIFFUSION), fld_face)
                    mu = mu * N_inv_f
                    dc = dc * N_inv_f

                inv_dx = 1.0 / float(dr[d])
                v_e = -mu * E_fc
                ne_L = cL[:, 0]
                ne_R = cR[:, 0]
                flux_e = v_e * u_f[:, 0] - dc * inv_dx * (ne_R - ne_L)
                fluxes = [flux_e]
                sigma = mu * u_f[:, 0]
                if has_ee:
                    # energy flux = 5/3 * electron-like flux of the energy
                    # density (m_fluid.f90:188-192)
                    fluxes.append(FIVE_THIRD * (
                        v_e * u_f[:, 1]
                        - dc * inv_dx * (cR[:, 1] - cL[:, 1])))
                for m in range(n_elec, n_sp):
                    mu_i = self.td.ion_mobilities[m - n_elec] * N_inv_f
                    v_i = sign[m] * mu_i * E_fc
                    fluxes.append(v_i * u_f[:, m])
                    sigma = sigma + mu_i * u_f[:, m]
                if valid is not None:
                    sigma = xp.where(valid, sigma, 0.0)
                max_sigma = xp.maximum(max_sigma, xp.max(sigma))

                # CFL sum per cell (flux_upwind, m_fluid.f90:195-197)
                def cells_lo(F):
                    slc = [slice(0, nc) if k == d else slice(None)
                           for k in range(ndim)]
                    return F[(Ellipsis,) + tuple(slc)]

                def cells_hi(F):
                    slc = [slice(1, nc + 1) if k == d else slice(None)
                           for k in range(ndim)]
                    return F[(Ellipsis,) + tuple(slc)]

                # the 5/3 factor applies to the advective term only
                # (flux_upwind, m_fluid.f90:195-197)
                cfl_sum = cfl_sum + (
                    cfl_factor
                    * xp.maximum(xp.abs(cells_lo(v_e)), xp.abs(cells_hi(v_e)))
                    * inv_dx
                    + 2.0 * xp.maximum(cells_lo(dc), cells_hi(dc))
                    * inv_dx ** 2)

                # store fluxes; inside dielectric boxes fluxes are zero
                # (flux_upwind, m_fluid.f90:139-144)
                diel_zero = None
                if self.dielectric is not None:
                    first = sp.cc_flat(ndim, nc, *([np.array([1])] * ndim))[0]
                    eps_first = cc[self.dielectric.idx_eps, plan.leaves,
                                   first]
                    diel_zero = (eps_first > 1.0)
                for m, f_iv in enumerate(idx.flux_fc):
                    flat = fluxes[m].reshape(n, -1)
                    if diel_zero is not None:
                        flat = xp.where(diel_zero[:, None], 0.0, flat)
                    fc = ro.fc_set_faces(fc, f_iv, d, plan.leaves, flat,
                                         nc, ndim)
            if valid is not None:
                cfl_sum = xp.where(valid, cfl_sum, 0.0)
            inv_max_cfl = xp.maximum(inv_max_cfl, xp.max(cfl_sum))

        fc = self.consistent_fluxes(fc, idx.flux_fc)
        dt_cfl = 1.0 / xp.maximum(inv_max_cfl, _tiny(xp))
        dt_drt = uc.eps0 / (uc.elem_charge * max_sigma)
        return cc, fc, dt_cfl, dt_drt

    # ----------------------------------------------- consistent fluxes
    def _consistent_plan(self):
        """(coarse leaf, fine child) flux-matching groups per direction
        (af_consistent_fluxes, ``m_af_core.f90:1257-1404``)."""
        if self._pack is not None:
            return self._pack.consistent
        t = self.tree
        cache = getattr(t, "_consistent_flux_cache", None)
        if cache is not None and cache.get("epoch") == t.epoch:
            return cache["plan"]
        plan = build_consistent_plan(t)
        t._consistent_flux_cache = {"epoch": t.epoch, "plan": plan}
        return plan


    def consistent_fluxes(self, fc, flux_fc: List[int]):
        """Replace coarse fluxes at refinement boundaries by the average of
        the fine fluxes."""
        plan = self._consistent_plan()
        xp = _xp(fc)
        fvars = np.asarray(flux_fc, np.int32)
        for g in plan:
            nsrc = len(g.src)
            acc = 0.0
            for si in range(nsrc):
                vals = fc[fvars[:, None, None], g.dim,
                          sp.aix(g.chs)[None, :, None],
                          sp.aix(g.src[si])[None, :, :]]
                acc = acc + _cst(g.w[si], vals)[None] * vals
            acc = acc / nsrc
            if isinstance(fc, np.ndarray):
                fc[fvars[:, None, None], g.dim, g.nbs[None, :, None],
                   g.tgt[None, :, :]] = acc
            else:
                fc = fc.at[jnp.asarray(fvars)[:, None, None], g.dim,
                           jnp.asarray(sp.aix(g.nbs))[None, :, None],
                           jnp.asarray(sp.aix(g.tgt))[None, :, :]].set(acc)
        return fc

    # ------------------------------------------------------------ update
    def _cell_volumes(self, lvl: int, n: int):
        """Cell volumes [n, nc^ndim] (cyl: 2 pi r dr dz)."""
        t = self.tree
        nc, ndim = t.nc, t.ndim
        dr = t.lvl_dr(lvl)
        if t.coord == "cyl":
            leaves = t.lvl_leaves[lvl - 1]
            r0 = t.box_r_min(leaves)[:, 0]
            i = np.arange(1, nc + 1)
            r_cc = r0[:, None] + (i[None, :] - 0.5) * dr[0]
            vol = 2.0 * np.pi * r_cc * np.prod(dr)  # [n, nc]
            return np.repeat(vol[:, :, None], nc, axis=2).reshape(n, -1)
        return np.full((n, nc ** ndim), float(np.prod(dr)))

    def update_densities(self, cc, fc, dt: float, s_deriv: int,
                         s_prev: List[int], w_prev: List[float], s_out: int,
                         last_step: bool, params):
        """flux_update_densities + add_source_terms. Returns
        (cc, dt_chem, diag)."""
        t = self.tree
        idx = self.idx
        nc, ndim = t.nc, t.ndim
        xp = _xp(cc)
        interior = sp.interior_flat(ndim, nc)
        dt_chem = _huge(xp)
        dt_other = _huge(xp)
        total_rates = 0.0
        total_JdotE = 0.0
        eps = _tiny(xp)
        has_ee = idx.i_electron_energy >= 0

        for lvl in range(1, self._n_levels() + 1):
            tb = self._tb(lvl)
            leaves = tb.leaves
            if len(leaves) == 0:
                continue
            n = len(leaves)
            dr = t.lvl_dr(lvl)
            valid = self._leaf_valid(lvl, n, 1)  # [n, 1] or None

            # cell mask (set_box_mask, m_fluid.f90:469-515): no update
            # inside electrodes / dielectrics / outside the plasma region
            mask = None
            if self.mask_provider is not None:
                mask = self.mask_provider(cc, lvl, leaves)

            # weighted sum of previous states for ALL densities — written
            # UNCONDITIONALLY, exactly like the reference
            # (flux_update_densities, m_af_flux_schemes.f90:370-380): the
            # mask gates only the divergence and source updates below. A
            # masked electrode-boundary cell is thereby RESET to the base
            # state each substep, so substep >= 2's upwind reconstruction
            # sees the fresh emission average (electrode_species_bc) —
            # masking this sum kept a one-substep-stale copy there, which
            # compounds exponentially at the cathode sheath (the round-4
            # open cathode-emission deficit)
            for iv in idx.all_densities:
                acc = 0.0
                for s, w in zip(s_prev, w_prev):
                    acc = acc + w * ro.cc_get_interior(cc, iv + s, leaves,
                                                       nc, ndim)
                cc = ro.cc_set_interior(cc, iv + s_out, leaves, acc,
                                        nc, ndim)

            # ---------------- flux divergence (flux_update_densities);
            # applied before the source terms as in the reference, so the
            # energy-model source terms see the post-flux s_out states
            rfac = None
            if t.coord == "cyl":
                rfac = (tb.rfac_lo, tb.rfac_hi)  # [n, nc]
            for m, iv in enumerate(idx.flux_species):
                f_iv = idx.flux_fc[m]
                div = 0.0
                for d in range(ndim):
                    F = ro.fc_get_faces(fc, f_iv, d, leaves, nc, ndim)
                    lo_slc = tuple(slice(0, nc) if k == d else slice(None)
                                   for k in range(ndim))
                    hi_slc = tuple(slice(1, nc + 1) if k == d else slice(None)
                                   for k in range(ndim))
                    F_lo = F[(slice(None),) + lo_slc]
                    F_hi = F[(slice(None),) + hi_slc]
                    if rfac is not None and d == 0:
                        shape = (n, nc) + (1,) * (ndim - 1)
                        F_lo = F_lo * _cst(rfac[0], F_lo).reshape(shape)
                        F_hi = F_hi * _cst(rfac[1], F_hi).reshape(shape)
                    div = div + (F_lo - F_hi) / float(dr[d])
                upd = dt * div.reshape(n, -1)
                if mask is not None:
                    upd = xp.where(mask, upd, 0.0)
                cc = ro.cc_add_interior(cc, iv + s_out, leaves, upd,
                                        nc, ndim)

            # ---------------- chemistry source terms (add_source_terms)
            if self.gas.constant_density:
                fields_td = (ro.cc_get_interior(
                    cc, idx.i_electric_fld, leaves, nc, ndim)
                             * uc.SI_to_Townsend
                             * self.gas.inverse_number_density)
                gas_cols = []
            else:
                Ncell = ro.cc_get_interior(cc, idx.i_gas_dens, leaves,
                                           nc, ndim)
                # N = 0 trash rows: see compute_fluxes (keep trash finite)
                fields_td = (ro.cc_get_interior(
                    cc, idx.i_electric_fld, leaves, nc, ndim)
                             * uc.SI_to_Townsend
                             / xp.where(Ncell > 0.0, Ncell, 1.0))
                gas_cols = [float(self.gas.fractions[k]) * Ncell
                            for k in range(self.chem.n_gas_species)]
            dens_cols = list(gas_cols)
            for s_cc in idx.species_cc:
                dens_cols.append(ro.cc_get_interior(
                    cc, s_cc + s_deriv, leaves, nc, ndim))
            dens = xp.stack(dens_cols, axis=-1)
            dens = xp.maximum(dens, 0.0)
            flat_fields = fields_td.reshape(-1)
            mean_energies = None
            if has_ee:
                # mean energy from the post-flux s_out states
                # (add_source_terms, m_fluid.f90:358-364)
                ne_out = ro.cc_get_interior(
                    cc, idx.i_electron + s_out, leaves, nc, ndim)
                en_out = ro.cc_get_interior(
                    cc, idx.i_electron_energy + s_out, leaves, nc, ndim)
                mean_energies = en_out / xp.maximum(ne_out, 1.0)
                rates = self.chem.get_rates(
                    flat_fields, energy_eV=mean_energies.reshape(-1))
            else:
                rates = self.chem.get_rates(flat_fields)
            ngas = self.chem.n_gas_species
            if self.st.source_factor != "none":
                cc, rates = self._apply_source_factor(
                    cc, fc, rates, dens, leaves, lvl, xp)
            full, derivs = self.chem.get_derivatives(
                dens.reshape(-1, ngas + len(idx.species_cc)), rates)
            C = nc ** ndim
            derivs = derivs.reshape(n, C, -1)
            full = full.reshape(n, C, -1)

            # chemistry time step restriction (add_source_terms :404-414);
            # padded leaf slots are masked to no-restriction
            nsp_tot = ngas + len(idx.species_cc)
            if self.dt_cfg.chemistry_nmin > 0:
                dflat = dens.reshape(-1, nsp_tot)
                tmp = ((dflat + self.dt_cfg.chemistry_nmin)
                       / xp.maximum(xp.abs(derivs.reshape(dflat.shape)),
                                    eps))
                if valid is not None:
                    tmp = xp.where(
                        valid.reshape(n, 1, 1) > 0,
                        tmp.reshape(n, -1, nsp_tot), _huge(xp))
                dt_chem = xp.minimum(dt_chem, xp.min(tmp))
            elif self.dt_cfg.chemistry_limit_loss:
                dflat = dens.reshape(-1, nsp_tot)
                tmp = (xp.maximum(dflat, eps)
                       / xp.maximum(-derivs.reshape(dflat.shape), eps))
                if valid is not None:
                    tmp = xp.where(
                        valid.reshape(n, 1, 1) > 0,
                        tmp.reshape(n, -1, nsp_tot), _huge(xp))
                dt_chem = xp.minimum(dt_chem, xp.min(tmp))

            if last_step:
                vol = tb.vol
                fullv = full * _cst(vol, full)[:, :, None]
                if valid is not None:
                    fullv = xp.where(valid[:, :, None] > 0, fullv, 0.0)
                total_rates = total_rates + xp.sum(fullv, axis=(0, 1))
                # J.E with cell volumes (sum_global_JdotE, m_fluid.f90:702-731)
                total_JdotE = total_JdotE + self._sum_JdotE(
                    fc, lvl, vol, leaves, valid)

            # photoionization source
            if idx.i_photo >= 0:
                photo = ro.cc_get_interior(cc, idx.i_photo, leaves,
                                           nc, ndim)
                e_pos = ngas + idx.species_cc.index(idx.i_electron)
                ph_pos = ngas + idx.species_cc.index(idx.photoi_species_cc)
                if isinstance(derivs, np.ndarray):
                    derivs[:, :, e_pos] += photo
                    derivs[:, :, ph_pos] += photo
                else:
                    derivs = derivs.at[:, :, e_pos].add(photo)
                    derivs = derivs.at[:, :, ph_pos].add(photo)

            if has_ee:
                # electron energy source: Joule gain from the electron flux
                # minus the tabulated loss rate (add_source_terms,
                # m_fluid.f90:442-447); applied before the species derivs
                gain = 0.0
                for d in range(ndim):
                    Fe = ro.fc_get_faces(fc, idx.flux_fc[0], d, leaves,
                                         nc, ndim)
                    Ef = ro.fc_get_faces(fc, idx.fc_E, d, leaves, nc, ndim)
                    prod = Fe * Ef
                    lo = tuple(slice(0, nc) if k == d else slice(None)
                               for k in range(ndim))
                    hi = tuple(slice(1, nc + 1) if k == d else slice(None)
                               for k in range(ndim))
                    gain = gain + 0.5 * (prod[(slice(None),) + lo]
                                         + prod[(slice(None),) + hi]
                                         ).reshape(n, -1)
                gain = -gain
                loss_rate = self.td.ee_tbl.get_col(
                    TD_EE_LOSS, mean_energies)
                upd_en = dt * (gain - loss_rate * ne_out)
                if mask is not None:
                    upd_en = xp.where(mask, upd_en, 0.0)
                cc = ro.cc_add_interior(cc, idx.i_electron_energy + s_out,
                                        leaves, upd_en, nc, ndim)
                # energy-loss time step restriction (m_fluid.f90:163-166);
                # zero mean energy has zero loss -> no restriction
                tmp = xp.max(mean_energies)
                restr = xp.where(
                    tmp > 0.0,
                    tmp / xp.maximum(
                        self.td.ee_tbl.get_col(TD_EE_LOSS, tmp), eps),
                    _huge(xp))
                dt_other = xp.minimum(dt_other, restr)

            # apply source terms (plasma species only; gas species are not
            # stored in the tree, m_chemistry.f90:265-266)
            for spi, s_cc in enumerate(idx.species_cc):
                upd = dt * derivs[:, :, ngas + spi]
                if mask is not None:
                    upd = xp.where(mask, upd, 0.0)
                cc = ro.cc_add_interior(cc, s_cc + s_out, leaves, upd,
                                        nc, ndim)

        diag = {"rates": total_rates, "JdotE": total_JdotE,
                "dt_other": dt_other}
        return cc, dt_chem, diag

    def _apply_source_factor(self, cc, fc, rates, dens, leaves, lvl, xp):
        """Scale ionization rates with |flux|/(n_e mu E) to counter
        unphysical diffusion-driven ionization (compute_source_factor,
        ``m_fluid.f90:525-583`` and add_source_terms ``:368-398``)."""
        t = self.tree
        idx = self.idx
        nc, ndim = t.nc, t.ndim
        n = len(leaves)
        interior = sp.interior_flat(ndim, nc)
        small_flux = 1.0e-9
        ngas = self.chem.n_gas_species
        ne = dens[:, :, ngas + idx.species_cc.index(idx.i_electron)]

        # cell-centered electron flux norm: 0.5 * |(lo+hi per dim)|
        acc = 0.0
        for d in range(ndim):
            Fe = ro.fc_get_faces(fc, idx.flux_fc[0], d, leaves, nc, ndim)
            lo = tuple(slice(0, nc) if k == d else slice(None)
                       for k in range(ndim))
            hi = tuple(slice(1, nc + 1) if k == d else slice(None)
                       for k in range(ndim))
            comp = (Fe[(slice(None),) + lo]
                    + Fe[(slice(None),) + hi]).reshape(n, -1)
            acc = acc + comp ** 2
        flux_norm = 0.5 * xp.sqrt(acc)

        fld = ro.cc_get_interior(cc, idx.i_electric_fld, leaves, nc, ndim)
        if self.gas.constant_density:
            N_inv_c = self.gas.inverse_number_density
            fld_td = fld * uc.SI_to_Townsend * N_inv_c
        else:
            Ng = ro.cc_get_interior(cc, idx.i_gas_dens, leaves, nc, ndim)
            # N = 0 trash rows: see compute_fluxes (keep trash finite)
            N_inv_c = 1.0 / xp.where(Ng > 0.0, Ng, 1.0)
            fld_td = fld * uc.SI_to_Townsend * N_inv_c
        mob = self.td.tbl.get_col(TD_MOBILITY, fld_td) * N_inv_c
        factor = (flux_norm + small_flux) / (small_flux + ne * mob * fld)
        factor = xp.clip(factor, 0.0, 1.0)

        if self.st.source_min_electrons_per_cell > 0:
            dr = t.lvl_dr(lvl)
            factor = xp.where(
                ne * float(dr.min()) ** 3
                < self.st.source_min_electrons_per_cell, 0.0, factor)

        if idx.i_srcfac >= 0:
            cc = ro.cc_set_interior(cc, idx.i_srcfac, leaves, factor,
                                    nc, ndim)

        fac_flat = factor.reshape(-1)
        ioniz = self._ionization_mask()
        if isinstance(rates, np.ndarray):
            rates[:, ioniz] *= fac_flat[:, None]
        else:
            rates = rates.at[:, jnp.asarray(np.nonzero(ioniz)[0])].multiply(
                fac_flat[:, None])
        return cc, rates

    def _ionization_mask(self):
        from .chemistry import IONIZATION_REACTION
        if not hasattr(self, "_ioniz_mask"):
            self._ioniz_mask = np.array(
                [r.reaction_type == IONIZATION_REACTION
                 for r in self.chem.reactions], dtype=bool)
        return self._ioniz_mask

    def _sum_JdotE(self, fc, lvl: int, vol, leaves=None, valid=None):
        """Volume-integrated J.E * elec_charge for the level's leaves
        (padded leaf slots masked out)."""
        t = self.tree
        idx = self.idx
        nc, ndim = t.nc, t.ndim
        xp = _xp(fc)
        if leaves is None:
            leaves = np.asarray(t.lvl_leaves[lvl - 1])
        n = len(leaves)
        acc = 0.0
        for d in range(ndim):
            Fe = ro.fc_get_faces(fc, idx.flux_fc[0], d, leaves, nc, ndim)
            Ef = ro.fc_get_faces(fc, idx.fc_E, d, leaves, nc, ndim)
            lo = tuple(slice(0, nc) if k == d else slice(None)
                       for k in range(ndim))
            hi = tuple(slice(1, nc + 1) if k == d else slice(None)
                       for k in range(ndim))
            prod = 0.5 * ((Fe * Ef)[(slice(None),) + lo]
                          + (Fe * Ef)[(slice(None),) + hi])
            prod = prod.reshape(n, -1) * _cst(vol, prod)
            if valid is not None:
                prod = xp.where(valid > 0, prod, 0.0)
            acc = acc + xp.sum(prod)
        return acc * uc.elec_charge

    # ----------------------------------------------------- forward Euler
    def forward_euler(self, cc, fc, dt: float, dt_lim_state, time: float,
                      s_deriv: int, s_prev: List[int], w_prev: List[float],
                      s_out: int, i_step: int, n_steps: int, params,
                      field_compute=None):
        """One explicit sub-step (forward_euler, ``m_fluid.f90:21-99``).

        Returns (cc, fc, dt_lim, diag). ``field_compute`` overrides the
        wired field solve (used by the compiled step, which substitutes a
        fixed-V-cycle variant without mutating this model)."""
        import time as _time
        last_step = i_step == n_steps
        field_compute = field_compute or self.field_compute
        if i_step > 1 and field_compute is not None:
            t0 = _time.time()
            cc, fc = field_compute(cc, fc, s_deriv, time, True, params)
            if self.wc is not None:
                if not isinstance(cc, np.ndarray):
                    import jax
                    jax.block_until_ready(cc)
                self.wc["field"] += _time.time() - t0
        if not isinstance(cc, np.ndarray) and self._jit_cfg is not None:
            # compiled path: the whole flux + conservative-update +
            # chemistry substep is one jitted unit over the epoch pack;
            # blocked so wc["advance"] is real device time, not dispatch
            t0 = _time.time()
            out = self._jit_flux_update(cc, fc, dt, s_deriv, s_prev,
                                        w_prev, s_out, last_step, params)
            if self.wc is not None:
                import jax
                jax.block_until_ready(out[0])
                self.wc["advance"] += _time.time() - t0
            return out
        t0 = _time.time()
        cc, fc, dt_cfl, dt_drt = self.compute_fluxes(cc, fc, s_deriv, params)
        t1 = _time.time()
        cc, dt_chem, diag = self.update_densities(
            cc, fc, dt, s_deriv, s_prev, w_prev, s_out, last_step, params)
        if self.wc is not None:
            # cost breakdown (wc_time_flux / wc_time_source,
            # m_fluid.f90:57-75); only meaningful on the host path
            self.wc["flux"] += t1 - t0
            self.wc["source"] += _time.time() - t1
        if self.dielectric is not None:
            # surface charge from fluxes + SE + photon emission
            # (forward_euler, m_fluid.f90:77-94)
            cc = self.dielectric.update_surface_charge(
                cc, fc, dt, s_prev, w_prev, s_out,
                self.dielectric.flux_species_charge,
                self.dielectric.flux_pos_ion)
            cc = self.dielectric.photon_emission(cc, fc, dt, s_out)
        return self._finish_substep(cc, fc, dt_cfl, dt_drt, dt_chem, diag)

    def _finish_substep(self, cc, fc, dt_cfl, dt_drt, dt_chem, diag):
        xp = _xp(cc)
        # NOTE: the reference *assigns* dt_lim in each substep
        # (m_fluid.f90:96-98), so af_advance returns the limit of the LAST
        # substep, not the minimum over substeps.
        dt_other = diag.get("dt_other", _huge(xp))
        dt_lim = xp.minimum(
            self.dt_cfg.dt_max,
            xp.minimum(xp.minimum(dt_cfl * self.dt_cfg.cfl_number, dt_drt),
                       xp.minimum(dt_chem, dt_other)))
        # the four dt restrictions in the reference's order (m_dt.f90:13-25:
        # cfl, drt, rates, other); "other" is only set by the energy model
        diag["dt_limits"] = xp.stack([
            dt_cfl * self.dt_cfg.cfl_number + 0.0 * dt_lim,
            dt_drt + 0.0 * dt_lim, dt_chem + 0.0 * dt_lim,
            dt_other + 0.0 * dt_lim])
        return cc, fc, dt_lim, diag

    def _flux_update_body(self, cc, fc, dt_, scal, s_deriv, s_prev, w_prev,
                          s_out, last_step):
        """Traced flux + conservative update + chemistry substep; the
        ambient epoch pack (self._pack) must be set by the caller —
        either _jit_flux_update below or the fused production step
        (driver._jit_full_step)."""
        import jax
        # named scopes flow into the HLO op metadata, so a device-timeline
        # profile of the fused step can be bucketed by stage (bench.py's
        # device_breakdown; the reference's per-phase timers,
        # src/m_streamer.f90:181-187)
        with jax.named_scope("flux"):
            cc, fc, dt_cfl, dt_drt = self.compute_fluxes(cc, fc, s_deriv,
                                                         scal)
        with jax.named_scope("source"):
            cc, dt_chem, diag = self.update_densities(
                cc, fc, dt_, s_deriv, list(s_prev), list(w_prev), s_out,
                last_step, scal)
        if self.dielectric is not None and self._pack_surf is not None:
            # surface charge from fluxes + SE + photon emission on the
            # cc-resident surface state (forward_euler, m_fluid.f90:77-94)
            from ..solvers import surface as sf
            dl = self.dielectric
            cc = sf.pack_update_surface_charge(
                cc, fc, self._pack_surf, dt_, list(s_prev), list(w_prev),
                s_out, dl.i_surf_sigma_cc, self.idx.i_electron,
                self.idx.flux_fc, dl.flux_species_charge,
                dl.flux_pos_ion, dl.gamma_se_ion)
            cc = sf.pack_photon_emission(
                cc, fc, self._pack_surf, dt_, s_out, dl.i_surf_photon_cc,
                dl.i_surf_sigma_cc, self.idx.i_electron, self.idx.fc_E,
                uc.elem_charge)
        return self._finish_substep(cc, fc, dt_cfl, dt_drt, dt_chem, diag)

    def _jit_flux_update(self, cc, fc, dt, s_deriv, s_prev, w_prev, s_out,
                         last_step, params):
        """Jitted flux + update unit keyed by the substep configuration;
        the epoch pack is a runtime argument (no retrace across epochs
        with equal bucket shapes)."""
        import jax
        from ..core import treepack as tp
        pad, trash = self._jit_cfg
        pack = tp.get_epoch_pack(self.tree, pad=pad, trash=trash,
                                 with_gc2=True, dtype=cc.dtype)
        spack = None
        if self.dielectric is not None:
            from ..solvers.surface import get_surface_pack
            spack = get_surface_pack(self.dielectric.surf, pad, trash,
                                     dtype=cc.dtype)
        key = ("fu", s_deriv, tuple(s_prev), tuple(float(w) for w in w_prev),
               s_out, last_step)
        if key not in self._jit_units:
            def traced(cc, fc, dt_, scal, pack, spack):
                old = (self._pack, self._pack_surf)
                self._pack, self._pack_surf = pack, spack
                try:
                    if pad:
                        cc = cc.at[:, trash].set(0.0)
                        fc = fc.at[:, :, trash].set(0.0)
                    return self._flux_update_body(
                        cc, fc, dt_, scal, s_deriv, list(s_prev),
                        list(w_prev), s_out, last_step)
                finally:
                    self._pack, self._pack_surf = old
            self._jit_units[key] = jax.jit(traced)
        scal = {k: v for k, v in (params or {}).items()
                if k in ("voltage", "lsf_phi_b", "dt_stiff")
                and np.ndim(v) == 0}
        scal.setdefault("dt_stiff", 0.0)
        return self._jit_units[key](cc, fc, dt, scal, pack, spack)


def _tls_prop(name):
    """Thread-local ambient-pack slot (see solvers/multigrid.py:_tls_prop
    — the warm thread traces concurrently with the main thread)."""
    def fget(self):
        return getattr(self._pack_tls, name, None)

    def fset(self, v):
        setattr(self._pack_tls, name, v)
    return property(fget, fset)


for _n in ("_pack", "_pack_surf"):
    setattr(FluidModel, _n, _tls_prop(_n))


def build_consistent_plan(tree: Tree, pad: bool = False, trash: int = 0,
                          lvls=None):
    """Build the flux-matching groups (free function so the epoch pack
    can carry them as pytree leaves; see core/treepack.py). ``lvls``
    restricts to the given coarse levels (the incremental pack builder
    caches one level's groups at a time)."""
    from ..core.treepack import (ConsistentGroup, bucket_hwm,
                                 pad_ids, pad_rows)
    if True:
        t = tree
        nc, ndim = t.nc, t.ndim
        hnc = nc // 2
        groups = []  # (d, coarse_ids[], fine_ids[], tgt_fidx, src lists, cylw)
        for lvl in (range(1, t.highest_lvl) if lvls is None else lvls):
            for p_id in t.lvl_parents[lvl - 1]:
                for d in range(2 * ndim):
                    nb = int(t.neighbors[p_id, d])
                    if nb < 0 or t.has_children(nb):
                        continue
                    dim, low = neighb_dim(d), neighb_low(d)
                    # children of p_id adjacent to direction d
                    for c in t.children[int(p_id)]:
                        cdix = (t.ix[c] % 2)
                        if cdix[dim] != (0 if low else 1):
                            continue
                        groups.append((lvl, d, int(nb), int(c)))
        # build per-(lvl, d) batched index tables
        by_key: Dict = {}
        for lvl, d, nb, c in groups:
            by_key.setdefault((lvl, d), []).append((nb, c))
        if pad:
            # padded mode emits EVERY (lvl, d) group — empty ones as
            # min-bucket all-trash tables. The group list's length is then
            # a function of the level count alone, so epochs that gain or
            # lose a direction's coarse-fine interfaces (and phantom
            # levels, core/treepack.py) do not change the pack pytree
            # structure — which would retrace every compiled unit.
            all_lvls = (range(1, t.highest_lvl) if lvls is None else lvls)
            for lvl in all_lvls:
                for d in range(2 * ndim):
                    by_key.setdefault((lvl, d), [])
        plan = []
        for (lvl, d), pairs in sorted(by_key.items()):
            dim, low = neighb_dim(d), neighb_low(d)
            # coarse target faces: on the coarse neighbor, the face adjacent
            # to the fine box: ref i_nb = nc+1 (low side: fine is to its
            # right... reference: i_nb = nc+1 if fine box is on the high
            # side of the coarse box). Direction d is from the parent to the
            # coarse neighbor; from the coarse box, the fine children are in
            # direction d^1.
            i_nb_ref = (nc + 1) if low else 1
            tgt_face = i_nb_ref - 1  # my 0-based face index
            nbs = np.array([p[0] for p in pairs], np.int32)
            chs = np.array([p[1] for p in pairs], np.int32)
            # fine source faces: ref i = 1 (low side of child) or nc+1
            src_face = 0 if low else nc
            # transverse offsets on the coarse box from the child parity
            offs = []
            for p in pairs:
                off_all = (t.ix[p[1]] % 2) * hnc
                offs.append([off_all[k] for k in range(t.ndim)
                             if k != dim])
            offs = (np.asarray(offs, np.int64).reshape(len(pairs), -1)
                    if pairs else np.zeros((0, t.ndim - 1), np.int64))
            # build gather/scatter index arrays
            ndim_ = t.ndim
            if ndim_ == 1:
                tgt = np.array([sp.fc_flat(1, nc, np.array([tgt_face]))[0]])
                tgt_idx = np.tile(tgt, (len(pairs), 1))
                src_idx = [np.tile(np.array(
                    [sp.fc_flat(1, nc, np.array([src_face]))[0]]),
                    (len(pairs), 1))]
                weights = [np.ones((len(pairs), 1))]
            else:
                tdims = [k for k in range(ndim_) if k != dim]
                tcells = np.arange(hnc)
                # target coarse face cells: off + 0..hnc-1 per transverse dim
                tgt_idx = np.zeros((len(pairs), hnc ** (ndim_ - 1)), np.int32)
                nsrc = 2 ** (ndim_ - 1)
                src_idx = [np.zeros((len(pairs), hnc ** (ndim_ - 1)), np.int32)
                           for _ in range(nsrc)]
                weights = [np.ones((len(pairs), hnc ** (ndim_ - 1)))
                           for _ in range(nsrc)]
                for pi, p in enumerate(pairs):
                    axes = []
                    for ti, k in enumerate(tdims):
                        axes.append(offs[pi][ti] + tcells)
                    mesh = np.meshgrid(*axes, indexing="ij")
                    coarse_t = np.stack([m.ravel() for m in mesh], -1)
                    v = np.zeros((coarse_t.shape[0], ndim_), np.int64)
                    v[:, dim] = tgt_face
                    for ti, k in enumerate(tdims):
                        v[:, k] = coarse_t[:, ti]
                    tgt_idx[pi] = np.ravel_multi_index(
                        [v[:, k] for k in range(ndim_)],
                        [nc + 1] * ndim_).astype(np.int32)
                    # fine faces: 2 per transverse dim per coarse cell
                    import itertools as it
                    for si, bits in enumerate(it.product([0, 1],
                                                         repeat=ndim_ - 1)):
                        vf = np.zeros((coarse_t.shape[0], ndim_), np.int64)
                        vf[:, dim] = src_face
                        for ti, k in enumerate(tdims):
                            fine_t = 2 * tcells  # local fine cells 0,2,..
                            mesh_f = None
                        # recompute fine transverse coords from local cells
                        axes_f = []
                        for ti, k in enumerate(tdims):
                            axes_f.append(2 * tcells + bits[ti])
                        mesh_f = np.meshgrid(*axes_f, indexing="ij")
                        fine_tc = np.stack([m.ravel() for m in mesh_f], -1)
                        for ti, k in enumerate(tdims):
                            vf[:, k] = fine_tc[:, ti]
                        src_idx[si][pi] = np.ravel_multi_index(
                            [vf[:, k] for k in range(ndim_)],
                            [nc + 1] * ndim_).astype(np.int32)
                        # cylindrical weights for z-fluxes (dim=1 in cyl 2D)
                        if (t.coord == "cyl" and dim == 1):
                            # weight depends on the radial fine position
                            nb_id = p[0]
                            r0 = t.box_r_min(np.asarray([nb_id]))[0][0]
                            drc = t.lvl_dr(lvl)[0]
                            i_c = offs[pi][0] + tcells + 1  # 1-based
                            r_c = r0 + (i_c - 0.5) * drc
                            tmp = 0.25 * drc / r_c
                            w = (1.0 - tmp) if bits[0] == 0 else (1.0 + tmp)
                            weights[si][pi] = w
            if pad:
                # min-bucket 4 even when empty this epoch: the group must
                # exist (all-trash) so the plan structure is stable
                nb_p = bucket_hwm(tree, ("cons", lvl, d),
                                  max(len(nbs), 1))
                nbs = pad_ids(nbs, nb_p, trash)
                chs = pad_ids(chs, nb_p, trash)
                tgt_idx = pad_rows(tgt_idx, nb_p)
                src_idx = [pad_rows(a, nb_p) for a in src_idx]
                weights = [pad_rows(a, nb_p) for a in weights]
            plan.append(ConsistentGroup(d, dim, nbs, chs, tgt_idx,
                                        src_idx, weights))
        return plan


# register the Gc2 plan as a pytree (compiled path; core/treepack.py)
from ..core import treepack as _tp  # noqa: E402
_tp.register_gc2()
