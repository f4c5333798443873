"""Surface grids on dielectric boundaries.

Re-implements the reference's ``afivo/src/m_af_surface.f90``: surfaces live
on box faces where the permittivity jumps (surface_initialize ``:89-172``),
store per-face densities (charge, photon flux, time-state copies), deposit
surface charge into the Poisson rhs split between the gas and dielectric
side (surface_charge_to_rhs ``:514-566``), correct the face-centered field
from sigma (surface_correct_field_fc ``:629-727``), follow refinement by
prolongation/restriction of the surface data (``:327-467``), and provide
refinement links so the mesh never jumps across a surface
(surface_get_refinement_links ``:472-491``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from ..core import spatial as sp
from ..core.tree import Tree, neighb_dim, neighb_low


def dir_statics(ndim: int, nc: int, d: int):
    """Static flat-index tables of one surface direction: the gas/
    dielectric cell slabs adjacent to the surface, the shared face on
    both boxes, and the ghost layers toward the surface (the per-surface
    analog of Surfaces._face_slabs/_face_fidx below, factored out so the
    traced pack operations can precompute them per direction)."""
    dim, low = neighb_dim(d), neighb_low(d)
    g_idx = 1 if low else nc
    i_idx = nc if low else 1
    gas = sp.cc_flat(ndim, nc, *[
        np.array([g_idx]) if k == dim else np.arange(1, nc + 1)
        for k in range(ndim)])
    die = sp.cc_flat(ndim, nc, *[
        np.array([i_idx]) if k == dim else np.arange(1, nc + 1)
        for k in range(ndim)])
    f_out = 0 if low else nc
    f_in = nc if low else 0
    fo = sp.fc_flat(ndim, nc, *[
        np.array([f_out]) if k == dim else np.arange(0, nc)
        for k in range(ndim)])
    fi = sp.fc_flat(ndim, nc, *[
        np.array([f_in]) if k == dim else np.arange(0, nc)
        for k in range(ndim)])
    g_ghost = sp.cc_flat(ndim, nc, *[
        np.array([0 if low else nc + 1]) if k == dim
        else np.arange(1, nc + 1) for k in range(ndim)])
    i_ghost = sp.cc_flat(ndim, nc, *[
        np.array([nc + 1 if low else 0]) if k == dim
        else np.arange(1, nc + 1) for k in range(ndim)])
    return dict(dim=dim, low=low, gas=gas, die=die, fo=fo, fi=fi,
                g_ghost=g_ghost, i_ghost=i_ghost)


class SurfacePack:
    """Per-direction index/weight tables of the active surfaces, for the
    compiled engine (the runtime-argument analog of the Surfaces object
    below, following the epoch-pack pattern of core/treepack.py). The
    surface *state* itself lives in dedicated cc variables stored at the
    gas-side box row (first ``nc^(ndim-1)`` entries), so it rides through
    the fused production step, the rejection loop's state copies and the
    box-axis sharding like any other variable."""

    def __init__(self, surfaces: "Surfaces", pad: bool = False,
                 trash: int = 0):
        from ..core import treepack as tp
        t = surfaces.tree
        self.ndim, self.nc = t.ndim, t.nc
        nd2 = 2 * t.ndim
        self.rows_out = [None] * nd2
        self.rows_in = [None] * nd2
        self.inv_dr = [None] * nd2
        self.eps = [None] * nd2
        for d in range(nd2):
            ss = [s for s in surfaces.active() if s.direction == d]
            if not ss and not pad:
                continue
            dim = neighb_dim(d)
            ro = np.array([s.id_out for s in ss], np.int32)
            ri = np.array([s.id_in for s in ss], np.int32)
            idr = np.array([1.0 / t.lvl_dr(int(t.lvl[s.id_out]))[dim]
                            for s in ss], np.float64)
            ep = np.array([s.eps for s in ss], np.float64)
            if pad:
                nb = tp.bucket_hwm(t, ("surfp", d), len(ss))
                if nb == 0:
                    continue
                ro = tp.pad_ids(ro, nb, trash)
                ri = tp.pad_ids(ri, nb, trash)
                if len(ss):
                    idr = tp.pad_rows(idr, nb)
                    ep = tp.pad_rows(ep, nb)
                else:
                    idr = np.zeros(nb)
                    ep = np.ones(nb)
            self.rows_out[d] = ro
            self.rows_in[d] = ri
            self.inv_dr[d] = idr
            self.eps[d] = ep


def _register_surface_pack():
    from ..core import treepack as tp
    tp.register_plan(SurfacePack,
                     dyn_fields=("rows_out", "rows_in", "inv_dr", "eps"),
                     aux_fields=("ndim", "nc"))


try:
    _register_surface_pack()
except ValueError:
    pass


def get_surface_pack(surfaces: "Surfaces", pad: bool, trash: int,
                     dtype=None) -> SurfacePack:
    """Build-or-reuse the SurfacePack of the current refinement epoch
    (device-resident via treepack.cached_plan; surfaces only change at
    refinement epochs, so the tree epoch keys the cache)."""
    from ..core import treepack as tp
    t = surfaces.tree
    return tp.cached_plan(
        t, ("surfpack", t.epoch, pad, trash,
            None if dtype is None else np.dtype(dtype).str),
        lambda: SurfacePack(surfaces, pad=pad, trash=trash),
        dtype=dtype, device=True)


def _pack_dirs(pk: SurfacePack):
    for d in range(2 * pk.ndim):
        ro = pk.rows_out[d]
        if ro is None or len(ro) == 0:
            continue
        yield d, ro, pk.rows_in[d], pk.inv_dr[d], pk.eps[d]


def pack_charge_to_rhs(cc, pk: SurfacePack, i_sigma: int, i_rhs: int,
                       fac: float):
    """Traced surface_charge_to_rhs (``m_af_surface.f90:514-566``) on the
    cc-resident surface state: deposit sigma into the rhs, split between
    the gas and dielectric side. Padded rows scatter to the trash box."""
    import jax.numpy as jnp
    nc, ndim = pk.nc, pk.ndim
    F = nc ** (ndim - 1)
    fidx = jnp.arange(F)
    for d, ro, ri, idr, ep in _pack_dirs(pk):
        st = dir_statics(ndim, nc, d)
        roj = jnp.asarray(sp.aix(ro))
        sig = cc[i_sigma, roj[:, None], fidx[None, :]]
        idr = jnp.asarray(idr).astype(cc.dtype)
        frac_gas = 1.0 / (1.0 + jnp.asarray(ep).astype(cc.dtype))
        cc = cc.at[i_rhs, roj[:, None],
                   jnp.asarray(st["gas"])[None, :]].add(
                       (frac_gas * fac * idr)[:, None] * sig)
        cc = cc.at[i_rhs, jnp.asarray(sp.aix(ri))[:, None],
                   jnp.asarray(st["die"])[None, :]].add(
                       ((1.0 - frac_gas) * fac * idr)[:, None] * sig)
    return cc


def pack_correct_field_fc(cc, fc, pk: SurfacePack, i_sigma: int,
                          i_fld: int, i_phi: int, fac: float):
    """Traced surface_correct_field_fc (``m_af_surface.f90:629-727``):
    one-sided field at the surface faces including the sigma jump."""
    import jax.numpy as jnp
    nc, ndim = pk.nc, pk.ndim
    F = nc ** (ndim - 1)
    fidx = jnp.arange(F)
    for d, ro, ri, idr, ep in _pack_dirs(pk):
        st = dir_statics(ndim, nc, d)
        dim, low = st["dim"], st["low"]
        roj = jnp.asarray(sp.aix(ro))
        rij = jnp.asarray(sp.aix(ri))
        idr = jnp.asarray(idr).astype(cc.dtype)
        ep = jnp.asarray(ep).astype(cc.dtype)
        fac_fld0 = 2.0 * ep / (1.0 + ep)
        fac_fld1 = 2.0 / (1.0 + ep)
        fac_charge = fac / (1.0 + ep)
        sig = cc[i_sigma, roj[:, None], fidx[None, :]]
        phi_g = cc[i_phi, roj[:, None], jnp.asarray(st["gas"])[None, :]]
        phi_gg = cc[i_phi, roj[:, None],
                    jnp.asarray(st["g_ghost"])[None, :]]
        phi_i = cc[i_phi, rij[:, None], jnp.asarray(st["die"])[None, :]]
        phi_ig = cc[i_phi, rij[:, None],
                    jnp.asarray(st["i_ghost"])[None, :]]
        foj = jnp.asarray(st["fo"])
        fij = jnp.asarray(st["fi"])
        if low:
            out_val = ((fac_fld0 * idr)[:, None] * (phi_gg - phi_g)
                       + fac_charge[:, None] * sig)
            in_val = ((fac_fld1 * idr)[:, None] * (phi_i - phi_ig)
                      - fac_charge[:, None] * sig)
        else:
            out_val = ((fac_fld0 * idr)[:, None] * (phi_g - phi_gg)
                       - fac_charge[:, None] * sig)
            in_val = ((fac_fld1 * idr)[:, None] * (phi_ig - phi_i)
                      + fac_charge[:, None] * sig)
        fc = fc.at[i_fld, dim, roj[:, None], foj[None, :]].set(out_val)
        fc = fc.at[i_fld, dim, rij[:, None], fij[None, :]].set(in_val)
    return cc, fc


def pack_update_surface_charge(cc, fc, pk: SurfacePack, dt, s_prev,
                               w_prev, s_out: int, i_sigma: int,
                               i_electron: int, flux_fc, charges,
                               pos_ion_fc, gamma_se_ion: float):
    """Traced dielectric_update_surface_charge
    (``src/m_dielectric.f90:94-182``): d(sigma)/dt = +-sum(q flux) at the
    surface face; ion-impact secondary emission adds electrons in the
    first gas cell."""
    import jax.numpy as jnp
    nc, ndim = pk.nc, pk.ndim
    F = nc ** (ndim - 1)
    fidx = jnp.arange(F)
    for d, ro, ri, idr, ep in _pack_dirs(pk):
        st = dir_statics(ndim, nc, d)
        dim, low = st["dim"], st["low"]
        roj = jnp.asarray(sp.aix(ro))
        foj = jnp.asarray(st["fo"])
        idr = jnp.asarray(idr).astype(cc.dtype)
        sign = -1.0 if low else 1.0
        sd_new = 0.0
        for s, w in zip(s_prev, w_prev):
            sd_new = sd_new + float(w) * cc[i_sigma + s, roj[:, None],
                                            fidx[None, :]]
        flux_sum = 0.0
        for m, f_iv in enumerate(flux_fc):
            q = float(charges[m])
            if q == 0.0:
                continue
            flux_sum = flux_sum + q * fc[f_iv, dim, roj[:, None],
                                         foj[None, :]]
        sd_new = sd_new + (sign * dt) * flux_sum
        if len(pos_ion_fc) and gamma_se_ion > 0:
            ion_flux = 0.0
            for f_iv in pos_ion_fc:
                ion_flux = ion_flux + fc[f_iv, dim, roj[:, None],
                                         foj[None, :]]
            se_flux = (sign * gamma_se_ion) * ion_flux
            cc = cc.at[i_electron + s_out, roj[:, None],
                       jnp.asarray(st["gas"])[None, :]].add(
                           dt * idr[:, None] * se_flux)
            sd_new = sd_new + dt * se_flux
        cc = cc.at[i_sigma + s_out, roj[:, None], fidx[None, :]].set(
            sd_new)
    return cc


def pack_photon_emission(cc, fc, pk: SurfacePack, dt, s_out: int,
                         i_photon: int, i_sigma: int, i_electron: int,
                         fc_E: int, elem_charge: float):
    """Traced dielectric_photon_emission (``src/m_dielectric.f90:
    184-237``): where the face field points into the surface, emit
    electrons proportional to the stored photon flux."""
    import jax.numpy as jnp
    nc, ndim = pk.nc, pk.ndim
    F = nc ** (ndim - 1)
    fidx = jnp.arange(F)
    for d, ro, ri, idr, ep in _pack_dirs(pk):
        st = dir_statics(ndim, nc, d)
        dim, low = st["dim"], st["low"]
        roj = jnp.asarray(sp.aix(ro))
        foj = jnp.asarray(st["fo"])
        idr = jnp.asarray(idr).astype(cc.dtype)
        E_face = fc[fc_E, dim, roj[:, None], foj[None, :]]
        into = (E_face < 0.0) if low else (E_face > 0.0)
        pf = cc[i_photon, roj[:, None], fidx[None, :]]
        cc = cc.at[i_electron + s_out, roj[:, None],
                   jnp.asarray(st["gas"])[None, :]].add(
                       jnp.where(into, pf * dt * idr[:, None], 0.0))
        cc = cc.at[i_sigma + s_out, roj[:, None], fidx[None, :]].add(
            jnp.where(into, pf * (dt * elem_charge), 0.0))
    return cc


@dataclass
class Surface:
    in_use: bool
    id_in: int      #: box inside the dielectric
    id_out: int     #: box outside (gas side)
    direction: int  #: neighbor direction of the *outside* box toward inside
    eps: float
    ix_parent: int = -1
    offset_parent: Optional[np.ndarray] = None
    sd: Optional[np.ndarray] = None  #: [n_vars, nc^(ndim-1)]


class Surfaces:
    def __init__(self, tree: Tree, eps_of_box, n_variables: int):
        """eps_of_box: callable(id) -> eps array [(nc+2)^ndim] (host)."""
        self.tree = tree
        self.n_variables = n_variables
        self.surfaces: List[Surface] = []
        self.box_out_to_ix: Dict[int, int] = {}
        self.box_in_to_ix: Dict[int, int] = {}
        nc, ndim = tree.nc, tree.ndim
        self.face_cells = nc ** (ndim - 1)

        # find box pairs with an eps jump (surface_initialize)
        for lvl in range(1, tree.highest_lvl + 1):
            for b in tree.lvl_ids[lvl - 1]:
                b = int(b)
                eps_b = float(np.median(eps_of_box(b)))
                for d in range(2 * ndim):
                    nb = int(tree.neighbors[b, d])
                    if nb < 0:
                        continue
                    eps_nb = float(np.median(eps_of_box(nb)))
                    if eps_b <= 1.0 + 1e-8 < eps_nb:
                        # b is the gas side, nb the dielectric
                        self._add_surface(b, nb, d, eps_nb)

    def _add_surface(self, id_out: int, id_in: int, direction: int,
                     eps: float, parent_ix: int = -1,
                     offset=None) -> int:
        if id_out in self.box_out_to_ix:
            return self.box_out_to_ix[id_out]
        s = Surface(True, id_in, id_out, direction, eps,
                    ix_parent=parent_ix,
                    offset_parent=offset,
                    sd=np.zeros((self.n_variables, self.face_cells)))
        self.surfaces.append(s)
        ix = len(self.surfaces) - 1
        self.box_out_to_ix[id_out] = ix
        self.box_in_to_ix[id_in] = ix
        return ix

    def active(self):
        return [s for s in self.surfaces if s.in_use]

    # ------------------------------------------- compiled-engine state sync
    def sd_to_cc(self, cc, iv_photon: int, iv_sigma: int):
        """Push the host surface state (s.sd) into the dedicated cc
        variables at the gas-side box rows (the compiled engine's surface
        storage; see SurfacePack). Works on host or device cc."""
        ss = self.active()
        if not ss:
            return cc
        F = self.face_cells
        rows = np.array([s.id_out for s in ss], np.int64)
        vals = np.stack([s.sd for s in ss])  # [n, n_vars, F]
        nv = self.n_variables
        ivs = np.array([iv_photon] + [iv_sigma + v for v in range(nv - 1)],
                       np.int64)
        if isinstance(cc, np.ndarray):
            cc[ivs[:, None, None], rows[None, :, None],
               np.arange(F)[None, None, :]] = vals.transpose(1, 0, 2)
        else:
            import jax.numpy as jnp
            cc = cc.at[jnp.asarray(ivs)[:, None, None],
                       jnp.asarray(rows)[None, :, None],
                       jnp.arange(F)[None, None, :]].set(
                           jnp.asarray(vals.transpose(1, 0, 2), cc.dtype))
        return cc

    def cc_to_sd(self, cc, iv_photon: int, iv_sigma: int):
        """Pull the surface state from the cc variables back into the
        host s.sd arrays (before output / refinement / MC photoi, which
        operate on the host representation)."""
        ss = self.active()
        if not ss:
            return
        F = self.face_cells
        rows = np.array([s.id_out for s in ss], np.int64)
        nv = self.n_variables
        ivs = np.array([iv_photon] + [iv_sigma + v for v in range(nv - 1)],
                       np.int64)
        vals = np.asarray(cc[ivs[:, None, None], rows[None, :, None],
                             np.arange(F)[None, None, :]], np.float64)
        for k, s in enumerate(ss):
            s.sd[:] = vals[:, k]

    # ------------------------------------------------------------ helpers
    def _face_slabs(self, s: Surface):
        """(gas-side cells, dielectric-side cells) flat cc indices adjacent
        to the surface."""
        t = self.tree
        nc, ndim = t.nc, t.ndim
        d = s.direction
        dim, low = neighb_dim(d), neighb_low(d)
        g_idx = 1 if low else nc
        # inside box: adjacent layer is on the opposite side
        i_idx = nc if low else 1
        gas = sp.cc_flat(ndim, nc, *[
            np.array([g_idx]) if k == dim else np.arange(1, nc + 1)
            for k in range(ndim)])
        die = sp.cc_flat(ndim, nc, *[
            np.array([i_idx]) if k == dim else np.arange(1, nc + 1)
            for k in range(ndim)])
        return gas, die

    def _face_fidx(self, s: Surface):
        """Flat face indices of the shared face (on both boxes)."""
        t = self.tree
        nc, ndim = t.nc, t.ndim
        d = s.direction
        dim, low = neighb_dim(d), neighb_low(d)
        f_out = 0 if low else nc
        f_in = nc if low else 0
        fo = sp.fc_flat(ndim, nc, *[
            np.array([f_out]) if k == dim else np.arange(0, nc)
            for k in range(ndim)])
        fi = sp.fc_flat(ndim, nc, *[
            np.array([f_in]) if k == dim else np.arange(0, nc)
            for k in range(ndim)])
        return fo, fi

    # ---------------------------------------------------------- operations
    def charge_to_rhs(self, cc, i_sigma: int, i_rhs: int, fac: float):
        """Deposit sigma into the rhs, split between gas and dielectric
        (surface_charge_to_rhs)."""
        t = self.tree
        for s in self.active():
            dim = neighb_dim(s.direction)
            dr = t.lvl_dr(int(t.lvl[s.id_out]))[dim]
            frac_gas = 1.0 / (1.0 + s.eps)
            gas, die = self._face_slabs(s)
            cc[i_rhs, s.id_out, gas] += (frac_gas * fac / dr
                                         * s.sd[i_sigma])
            cc[i_rhs, s.id_in, die] += ((1 - frac_gas) * fac / dr
                                        * s.sd[i_sigma])
        return cc

    def correct_field_fc(self, cc, fc, i_sigma: int, i_fld: int, i_phi: int,
                         fac: float):
        """One-sided field at the surface incl. sigma jump
        (surface_correct_field_fc)."""
        t = self.tree
        nc, ndim = t.nc, t.ndim
        for s in self.active():
            d = s.direction
            dim, low = neighb_dim(d), neighb_low(d)
            dr = t.lvl_dr(int(t.lvl[s.id_out]))[dim]
            eps = s.eps
            fac_fld = np.array([2 * eps, 2.0]) / (1 + eps)
            fac_charge = fac / (1 + eps)
            sign = 1.0 if low else -1.0  # sign of sigma term on gas side
            gas, die = self._face_slabs(s)
            fo, fi = self._face_fidx(s)
            # ghost-layer cells of each box toward the surface
            g_ghost = sp.cc_flat(ndim, nc, *[
                np.array([0 if low else nc + 1]) if k == dim
                else np.arange(1, nc + 1) for k in range(ndim)])
            i_ghost = sp.cc_flat(ndim, nc, *[
                np.array([nc + 1 if low else 0]) if k == dim
                else np.arange(1, nc + 1) for k in range(ndim)])
            phi_g = cc[i_phi, s.id_out, gas]
            phi_gg = cc[i_phi, s.id_out, g_ghost]
            phi_i = cc[i_phi, s.id_in, die]
            phi_ig = cc[i_phi, s.id_in, i_ghost]
            if low:
                fc[i_fld, dim, s.id_out, fo] = (
                    fac_fld[0] / dr * (phi_gg - phi_g)
                    + fac_charge * s.sd[i_sigma])
                fc[i_fld, dim, s.id_in, fi] = (
                    fac_fld[1] / dr * (phi_i - phi_ig)
                    - fac_charge * s.sd[i_sigma])
            else:
                fc[i_fld, dim, s.id_out, fo] = (
                    fac_fld[0] / dr * (phi_g - phi_gg)
                    - fac_charge * s.sd[i_sigma])
                fc[i_fld, dim, s.id_in, fi] = (
                    fac_fld[1] / dr * (phi_ig - phi_i)
                    + fac_charge * s.sd[i_sigma])
        return fc

    def copy_variable(self, i_in: int, i_out: int):
        for s in self.active():
            s.sd[i_out] = s.sd[i_in]

    def weighted_sum(self, i_out: int, i_in: List[int], w: List[float]):
        for s in self.active():
            s.sd[i_out] = sum(wi * s.sd[ii] for ii, wi in zip(i_in, w))

    def get_integral(self, i_surf: int) -> float:
        """Integral of a surface density (surface_get_integral,
        ``m_af_surface.f90:293-324``): in cylindrical coordinates each
        surface element is weighted with 2 pi r of its face center."""
        t = self.tree
        nc = t.nc
        total = 0.0
        for s in self.active():
            d = s.direction
            dim, low = neighb_dim(d), neighb_low(d)
            lvl = int(t.lvl[s.id_out])
            dr = t.lvl_dr(lvl)
            tdims = [k for k in range(t.ndim) if k != dim]
            area = float(np.prod([dr[k] for k in tdims])) if tdims else 1.0
            if t.coord == "cyl":
                r0 = t.box_r_min(np.asarray([s.id_out]))[0]
                if dim == 1:  # z-normal surface: elements at varying r
                    i = np.arange(1, nc + 1)
                    r_face = r0[0] + (i - 0.5) * dr[0]
                else:         # r-normal surface: constant radius R
                    r_face = np.full(nc, r0[0] + (0.0 if low else nc * dr[0]))
                total += float(np.sum(
                    2 * np.pi * r_face * area * s.sd[i_surf]))
            else:
                total += area * float(np.sum(s.sd[i_surf]))
        return total

    def refinement_links(self) -> np.ndarray:
        """Box pairs that must have equal refinement
        (surface_get_refinement_links)."""
        out = [(s.id_in, s.id_out) for s in self.active()]
        return np.asarray(out, np.int64).reshape(-1, 2)

    # --------------------------------------------------- refinement update
    def update_after_refinement(self, ref_info):
        """surface_update_after_refinement (``m_af_surface.f90:327-363``)."""
        t = self.tree
        nc, ndim = t.nc, t.ndim
        hnc = nc // 2
        # removed boxes: restrict child surfaces back to the parent surface
        for rid in ref_info.removed:
            ix = self.box_out_to_ix.get(int(rid))
            if ix is None or not self.surfaces[ix].in_use:
                continue
            s = self.surfaces[ix]
            p_ix = s.ix_parent
            if p_ix < 0:
                raise RuntimeError("Too much derefinement on surface")
            sp_ = self.surfaces[p_ix]
            dix = s.offset_parent
            if ndim == 2:
                sp_.sd[:, dix[0]:dix[0] + hnc] = 0.5 * (
                    s.sd[:, 0::2] + s.sd[:, 1::2])
            elif ndim == 3:
                sd3 = s.sd.reshape(-1, nc, nc)
                avg = 0.25 * (sd3[:, 0::2, 0::2] + sd3[:, 1::2, 0::2]
                              + sd3[:, 0::2, 1::2] + sd3[:, 1::2, 1::2])
                spd = sp_.sd.reshape(-1, nc, nc)
                spd[:, dix[0]:dix[0] + hnc, dix[1]:dix[1] + hnc] = avg
            sp_.in_use = True
            self.box_out_to_ix.pop(s.id_out, None)
            self.box_in_to_ix.pop(s.id_in, None)
            s.in_use = False

        # new boxes: prolong parent surfaces onto children
        handled = set()
        for cid in ref_info.added:
            p_id = int(t.parent[int(cid)])
            p_ix = self.box_out_to_ix.get(p_id)
            if p_ix is None or not self.surfaces[p_ix].in_use or \
                    p_ix in handled:
                continue
            handled.add(p_ix)
            sp_ = self.surfaces[p_ix]
            d = sp_.direction
            dim = neighb_dim(d)
            low = neighb_low(d)
            tdims = [k for k in range(ndim) if k != dim]
            # children of p_id adjacent to the dielectric side
            for c in t.children[p_id]:
                c = int(c)
                cdix = t.ix[c] % 2
                if cdix[dim] != (0 if low else 1):
                    continue
                id_in = int(t.neighbors[c, d])
                if id_in < 0:
                    raise RuntimeError("surface prolongation: missing child")
                dix = np.array([hnc * cdix[k] for k in tdims], np.int64)
                ix = self._add_surface(c, id_in, d, sp_.eps, p_ix, dix)
                s = self.surfaces[ix]
                if ndim == 2:
                    vals = sp_.sd[:, dix[0]:dix[0] + hnc]
                    s.sd[:, 0::2] = vals
                    s.sd[:, 1::2] = vals
                elif ndim == 3:
                    spd = sp_.sd.reshape(-1, nc, nc)
                    vals = spd[:, dix[0]:dix[0] + hnc, dix[1]:dix[1] + hnc]
                    sd3 = s.sd.reshape(-1, nc, nc)
                    sd3[:, 0::2, 0::2] = vals
                    sd3[:, 1::2, 0::2] = vals
                    sd3[:, :, 1::2] = sd3[:, :, 0::2]
            # deactivate the parent surface
            self.box_out_to_ix.pop(sp_.id_out, None)
            self.box_in_to_ix.pop(sp_.id_in, None)
            sp_.in_use = False
            # re-register children mappings (done in _add_surface)
        return
