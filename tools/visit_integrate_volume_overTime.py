#!/usr/bin/env python3
"""Volume integral of a variable (optionally over a coordinate box) for
every output in a series: prints and saves a (time, integral, volume)
table. npz-based equivalent of the reference's
``tools/visit_integrate_volume_overTime.py`` (cylindrical geometry is
applied automatically from the file's coord metadata)."""

import argparse

import numpy as np

from gridnpz import GridData, expand_files


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("database", help='npz series, e.g. "run_grid_*.npz"')
    p.add_argument("variable")
    p.add_argument("-rmin", nargs="+", type=float,
                   default=[-1e10, -1e10, -1e10])
    p.add_argument("-rmax", nargs="+", type=float,
                   default=[1e10, 1e10, 1e10])
    p.add_argument("-i0", type=int, default=0, help="start index")
    p.add_argument("-i1", type=int, default=None, help="stop index")
    p.add_argument("-output", default="integral_vs_time.txt")
    args = p.parse_args()

    files = expand_files([args.database])[args.i0:args.i1]
    rows = []
    for fname in files:
        g = GridData(fname)
        total, vol = g.integrate(args.variable, args.rmin, args.rmax)
        rows.append((g.time, total, vol))
        print(f"{g.time:.8E} {total:.8E} {vol:.8E}")
    np.savetxt(args.output, np.asarray(rows),
               header=f"time integral({args.variable}) volume")
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
