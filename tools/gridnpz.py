"""Shared loader for this framework's grid outputs.

Two formats (io/output.py):

* AMR leaf-block files ``<name>_grid_NNNNNN.npz`` — per-leaf cell-centered
  blocks with ``box_id``/``box_lvl``/``box_r_min`` and ``var_names``; the
  analysis tools below sample/integrate these directly (no rasterization,
  volumes are exact per leaf, cylindrical weights included).
* Uniform-grid files ``<name>_NNNNNN.npz`` — finest-level rasters with
  ``r_min``/``r_max``.

These replace the reference's Silo+VisIt pipeline (``tools/visit_*.py``
drive VisIt over Silo databases) with plain NumPy over npz.
"""

import glob

import numpy as np


class GridData:
    """One AMR leaf-block npz output."""

    def __init__(self, fname):
        X = np.load(fname, allow_pickle=False)
        self.fname = fname
        self.nc = int(X["nc"])
        self.ndim = int(X["ndim"])
        self.coord = str(X["coord"])
        self.time = float(X["time"])
        self.lvl = np.asarray(X["box_lvl"])
        self.r_min = np.asarray(X["box_r_min"])  # [n_leaves, ndim]
        self.dr_base = np.asarray(X["dr_base"])
        self.box_id = (np.asarray(X["box_id"]) if "box_id" in X
                       else np.full(len(self.lvl), -1))
        self.var_names = [str(v) for v in X["var_names"]]
        interior = _interior_flat(self.ndim, self.nc)
        # [n_leaves, nc^ndim] interior cell values per variable
        self.data = {v: np.asarray(X[v])[:, interior]
                     for v in self.var_names}
        self.surface_sd = (np.asarray(X["surface_sd"])
                           if "surface_sd" in X else None)
        self.surface_info = (np.asarray(X["surface_info"])
                             if "surface_info" in X else None)

    # ------------------------------------------------------- geometry
    def dr(self):
        """[n_leaves, ndim] cell size per leaf."""
        return self.dr_base[None, :] / 2.0 ** (self.lvl - 1)[:, None]

    def centers(self):
        """[n_leaves, nc^ndim, ndim] cell-center coordinates."""
        nc, ndim = self.nc, self.ndim
        dr = self.dr()
        offs = np.stack(np.meshgrid(*([np.arange(nc) + 0.5] * ndim),
                                    indexing="ij"),
                        axis=-1).reshape(-1, ndim)
        return (self.r_min[:, None, :] + offs[None, :, :]
                * dr[:, None, :])

    def volumes(self):
        """[n_leaves, nc^ndim] cell volumes (cylindrical-aware: in 'cyl'
        the first axis is r and dV = 2 pi r dr dz)."""
        dr = self.dr()
        vol = np.prod(dr, axis=1)[:, None] * np.ones(
            (1, self.nc ** self.ndim))
        if self.coord == "cyl":
            r = self.centers()[:, :, 0]
            vol = vol * 2.0 * np.pi * r
        return vol

    # ------------------------------------------------------- sampling
    def sample_points(self, var, pts):
        """Nearest-cell sample of ``var`` at points [n, ndim] (leaves are
        disjoint, so the containing leaf is unique)."""
        nc, ndim = self.nc, self.ndim
        dr = self.dr()
        vals = np.full(len(pts), np.nan)
        arr = self.data[var]
        hi = self.r_min + nc * dr
        for n, p in enumerate(np.asarray(pts, float)):
            inside = np.all((p >= self.r_min) & (p < hi), axis=1)
            rows = np.nonzero(inside)[0]
            if len(rows) == 0:
                continue
            b = rows[np.argmax(self.lvl[rows])]  # finest containing leaf
            ix = np.minimum(((p - self.r_min[b]) / dr[b]).astype(int),
                            nc - 1)
            flat = 0
            for k in range(ndim):
                flat = flat * nc + ix[k]
            vals[n] = arr[b, flat]
        return vals

    def lineout(self, var, r0, r1, n=512):
        """(path_length, values) sampled along the segment r0 -> r1
        (the reference's visit_lineout curve format)."""
        r0 = np.asarray(r0, float)[: self.ndim]
        r1 = np.asarray(r1, float)[: self.ndim]
        s = np.linspace(0.0, 1.0, n)
        pts = r0[None, :] + s[:, None] * (r1 - r0)[None, :]
        return s * np.linalg.norm(r1 - r0), self.sample_points(var, pts)

    # ------------------------------------------------------- reductions
    def integrate(self, var, rmin=None, rmax=None, where=None):
        """(integral of var dV, integration volume) over an optional
        coordinate box and an optional boolean mask array
        [n_leaves, nc^ndim] (visit_integrate_region/_conditional)."""
        c = self.centers()
        vol = self.volumes()
        sel = np.ones(vol.shape, bool)
        if rmin is not None:
            sel &= np.all(c >= np.asarray(rmin, float)[None, None,
                                                       :self.ndim], axis=2)
        if rmax is not None:
            sel &= np.all(c <= np.asarray(rmax, float)[None, None,
                                                       :self.ndim], axis=2)
        if where is not None:
            sel &= where
        v = self.data[var]
        return float(np.sum(v * vol * sel)), float(np.sum(vol * sel))

    def max_location(self, var):
        """(value, coordinates) of the maximum of ``var``."""
        arr = self.data[var]
        b, i = np.unravel_index(np.argmax(arr), arr.shape)
        return float(arr[b, i]), self.centers()[b, i]


def _interior_flat(ndim, nc):
    full = (nc + 2,) * ndim
    idx = np.arange(np.prod(full)).reshape(full)
    return idx[(slice(1, nc + 1),) * ndim].ravel()


def expand_files(patterns):
    out = []
    for p in patterns:
        out.extend(sorted(glob.glob(p)) or [p])
    return out
