#!/usr/bin/env python3
"""Extract streamer head paths from a series of field-maxima files.

Consumes the ``<name>_Emax_NNNNNN.txt`` outputs (io/output.py: one line
per detected field maximum, ``x .. E``), links maxima across outputs into
paths (a point joins the path whose last point is nearest, within
``-dmax`` and with field at least ``-Efac`` times the parent's), filters
short/weak paths, reports each path's straight-line velocity (least
squares over its positions vs time) and writes the paths as a text
table; optional overview plot. Reference analog:
``tools/streamer_paths.py`` (sklearn-regressor fits over the same
files)."""

import argparse
import glob
import re

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("first_file",
                   help="first maxima file, e.g. run_Emax_000001.txt")
    p.add_argument("-n", type=int, default=1000,
                   help="search up to this output index")
    p.add_argument("-dt", type=float, default=0.1e-9,
                   help="time between outputs (s)")
    p.add_argument("-Emin", type=float, default=10e6,
                   help="ignore maxima below this field")
    p.add_argument("-Efac", type=float, default=0.8,
                   help="minimum field relative to the parent point")
    p.add_argument("-dmax", type=float, default=0.3e-3,
                   help="maximum hop distance between path points")
    p.add_argument("-min_points", type=int, default=10)
    p.add_argument("-lmin", type=float, default=0.5e-3,
                   help="minimum path length")
    p.add_argument("-o", default="streamer_paths.txt")
    p.add_argument("-plot", help="optional overview image")
    args = p.parse_args()

    m = re.match(r"(.*_Emax_)(\d+)(\.txt)$", args.first_file)
    if not m:
        raise ValueError("expected a file named ..._Emax_NNNNNN.txt")
    stem, first_ix, ext = m.group(1), int(m.group(2)), m.group(3)
    width = len(m.group(2))

    paths = []  # each: list of (t, coords..., E)
    for k in range(first_ix, first_ix + args.n):
        fname = f"{stem}{k:0{width}d}{ext}"
        if not glob.glob(fname):
            break
        pts = np.loadtxt(fname, ndmin=2)
        if pts.size == 0:
            continue
        t = (k - first_ix) * args.dt
        E = pts[:, -1]
        xy = pts[:, :-1]
        for row in np.argsort(E)[::-1]:
            if E[row] < args.Emin:
                continue
            best, best_d = None, args.dmax
            for path in paths:
                last = path[-1]
                d = np.linalg.norm(xy[row] - last[1:-1])
                if d < best_d and E[row] >= args.Efac * last[-1] \
                        and last[0] < t:
                    best, best_d = path, d
            if best is not None:
                best.append((t, *xy[row], E[row]))
            else:
                paths.append([(t, *xy[row], E[row])])

    def length(path):
        q = np.asarray(path)[:, 1:-1]
        return float(np.sum(np.linalg.norm(np.diff(q, axis=0), axis=1)))

    paths = [q for q in paths
             if len(q) >= args.min_points and length(q) >= args.lmin]
    print(f"{len(paths)} paths")
    with open(args.o, "w") as f:
        f.write("# path time coords... E\n")
        for i, q in enumerate(paths):
            arr = np.asarray(q)
            t = arr[:, 0]
            pos = arr[:, 1:-1]
            # straight-line velocity: least-squares slope of each
            # coordinate vs time
            A = np.stack([t, np.ones_like(t)], axis=1)
            v = np.linalg.lstsq(A, pos, rcond=None)[0][0]
            print(f"path {i}: {len(q)} points, length {length(q):.3e} m, "
                  f"|v| = {np.linalg.norm(v):.3e} m/s")
            for row in arr:
                f.write(f"{i} " + " ".join(f"{x:.8E}" for x in row) + "\n")
    print(f"wrote {args.o}")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        for i, q in enumerate(paths):
            arr = np.asarray(q)
            ax.plot(arr[:, 1], arr[:, 2], ".-", ms=2, label=f"path {i}")
        ax.set_xlabel("x (m)")
        ax.set_ylabel("y (m)")
        ax.legend(fontsize=6)
        fig.savefig(args.plot, dpi=150)
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
