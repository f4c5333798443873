#!/usr/bin/env python3
"""Plot a variable from a per-leaf npz grid output.

The TPU-native analog of the reference's Visit plotting scripts
(``tools/visit_*.py``): the framework writes per-leaf npz snapshots
(io/output.py) instead of Silo files, and this tool renders one
variable of one snapshot as a matplotlib pcolormesh per AMR leaf box
(2D / cylindrical), a 1D line plot, or a 2D slice of a 3D snapshot.

Usage:
  python tools/plot_grid.py run_grid_000003.npz e out.png
  python tools/plot_grid.py run_grid_000003.npz electric_fld out.png \
      --log --boxes
  python tools/plot_grid.py run3d_grid_000002.npz e out.png --slice z=0.01
"""
import argparse

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("npz")
    ap.add_argument("var")
    ap.add_argument("out")
    ap.add_argument("--log", action="store_true",
                    help="log10 color scale")
    ap.add_argument("--boxes", action="store_true",
                    help="draw AMR box outlines")
    ap.add_argument("--slice", default=None,
                    help="3D: axis=value, e.g. z=0.01")
    args = ap.parse_args()

    d = np.load(args.npz, allow_pickle=True)
    names = [str(v) for v in d["var_names"]]
    if args.var not in names:
        raise SystemExit(f"variable {args.var!r} not in {names}")
    nc = int(d["nc"])
    ndim = int(d["ndim"])
    C = nc + 2
    data = d[args.var]
    lvl = np.asarray(d["box_lvl"])
    rmin = np.asarray(d["box_r_min"])
    drb = np.asarray(d["dr_base"])
    vals = data.reshape(len(lvl), *(C,) * ndim)
    itr = (slice(1, nc + 1),) * ndim

    fig, ax = plt.subplots(figsize=(7, 6))
    if ndim == 1:
        for b in range(len(lvl)):
            dr = drb / 2 ** (lvl[b] - 1)
            x = rmin[b, 0] + (np.arange(nc) + 0.5) * dr[0]
            ax.plot(x, vals[b][itr], "k.-", ms=2, lw=0.5)
        ax.set_xlabel("x [m]")
        ax.set_ylabel(args.var)
        if args.log:
            ax.set_yscale("log")
    else:
        if ndim == 3:
            if args.slice is None:
                raise SystemExit("3D snapshots need --slice axis=value")
            axname, val = args.slice.split("=")
            k = "xyz".index(axname)
            val = float(val)
        plot = None
        vmin, vmax = np.inf, -np.inf
        panels = []
        for b in range(len(lvl)):
            dr = drb / 2 ** (lvl[b] - 1)
            v = vals[b][itr]
            r0 = rmin[b]
            if ndim == 3:
                lo, hi = r0[k], r0[k] + nc * dr[k]
                if not (lo <= val < hi):
                    continue
                ci = int((val - lo) // dr[k])
                v = np.take(v, ci, axis=k)
                dims = [a for a in range(3) if a != k]
            else:
                dims = [0, 1]
            if args.log:
                v = np.log10(np.maximum(np.abs(v), 1e-300))
            vmin, vmax = min(vmin, v.min()), max(vmax, v.max())
            x = r0[dims[0]] + np.arange(nc + 1) * dr[dims[0]]
            y = r0[dims[1]] + np.arange(nc + 1) * dr[dims[1]]
            panels.append((x, y, v))
        for x, y, v in panels:
            plot = ax.pcolormesh(x, y, v.T, vmin=vmin, vmax=vmax,
                                 cmap="viridis")
            if args.boxes:
                ax.plot([x[0], x[-1], x[-1], x[0], x[0]],
                        [y[0], y[0], y[-1], y[-1], y[0]],
                        "w-", lw=0.3, alpha=0.5)
        if plot is not None:
            lbl = f"log10|{args.var}|" if args.log else args.var
            fig.colorbar(plot, ax=ax, label=lbl)
        ax.set_aspect("equal")
        ax.set_xlabel("r [m]" if ndim == 2 else "axis 1 [m]")
        ax.set_ylabel("z [m]" if ndim == 2 else "axis 2 [m]")
    ax.set_title(f"{args.var} at t = {float(d['time']):.3e} s")
    fig.tight_layout()
    fig.savefig(args.out, dpi=150)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
