#!/usr/bin/env python3
"""Quick-look rendering of 3D outputs: maximum-intensity projections of
a variable along the three axes (and optionally an isosurface level
drawn as a contour on each projection). npz-based equivalent of the
reference's ``tools/visit_visualize_3d.py`` (which scripts a VisIt
contour render over Silo data)."""

import argparse

import numpy as np

from gridnpz import GridData, expand_files


def rasterize(g, var):
    """Uniform finest-level raster of an AMR grid npz variable."""
    nc, ndim = g.nc, g.ndim
    lmax = int(g.lvl.max())
    dr_f = g.dr_base / 2.0 ** (lmax - 1)
    r0 = g.r_min.min(axis=0)
    shape = np.round((g.r_min + nc * g.dr() - r0).max(axis=0)
                     / dr_f).astype(int)
    grid = np.zeros(shape)
    for b in range(len(g.lvl)):
        scale = 2 ** (lmax - int(g.lvl[b]))
        vals = g.data[var][b].reshape((nc,) * ndim)
        for k in range(ndim):
            vals = np.repeat(vals, scale, axis=k)
        ix0 = np.round((g.r_min[b] - r0) / dr_f).astype(int)
        grid[tuple(slice(ix0[k], ix0[k] + nc * scale)
                   for k in range(ndim))] = vals
    return grid


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("database", help='3D grid npz file(s)')
    p.add_argument("-var", default="electric_fld")
    p.add_argument("-iso", type=float, default=None,
                   help="overlay a contour of the projection at this "
                        "level")
    p.add_argument("-log", action="store_true", help="log10 scale")
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for fname in expand_files([args.database]):
        g = GridData(fname)
        if g.ndim != 3:
            raise SystemExit(f"{fname}: not a 3D output")
        grid = rasterize(g, args.var)
        fig, axes = plt.subplots(1, 3, figsize=(13, 4),
                                 constrained_layout=True)
        for ax, axis_, name in zip(axes, range(3), "xyz"):
            mip = grid.max(axis=axis_)
            img = np.log10(np.maximum(mip, 1e-300)) if args.log else mip
            im = ax.imshow(img.T, origin="lower")
            if args.iso is not None:
                ax.contour(mip.T, levels=[args.iso], colors="w",
                           linewidths=0.6)
            ax.set_title(f"max along {name}", fontsize=9)
            fig.colorbar(im, ax=ax, shrink=0.8)
        fig.suptitle(f"{args.var} t={g.time:.3E}")
        out = fname.replace(".npz", f"_{args.var}_mip.png")
        fig.savefig(out, dpi=150)
        print(f"wrote {out}")
        plt.close(fig)


if __name__ == "__main__":
    main()
