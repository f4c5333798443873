#!/usr/bin/env python3
"""Save lineout data from AMR grid npz outputs in curve format (two
columns: path length, variable). npz-based equivalent of the reference's
``tools/visit_lineout.py`` (which drives VisIt over Silo databases)."""

import argparse
import os

import numpy as np

from gridnpz import GridData, expand_files


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("database", help='npz file(s), e.g. "run_grid_*.npz"')
    p.add_argument("varname", help="variable name (e.g. electric_fld)")
    p.add_argument("-r0", nargs="+", type=float, required=True,
                   help="start point")
    p.add_argument("-r1", nargs="+", type=float, required=True,
                   help="end point")
    p.add_argument("-n", type=int, default=512, help="sample count")
    p.add_argument("-outdir", default=".", help="output directory")
    args = p.parse_args()

    for fname in expand_files([args.database]):
        g = GridData(fname)
        s, vals = g.lineout(args.varname, args.r0, args.r1, args.n)
        base = os.path.basename(fname).replace(".npz", "")
        out = os.path.join(args.outdir,
                           f"{base}_{args.varname}.curve")
        np.savetxt(out, np.column_stack([s, vals]),
                   header=f"lineout {args.varname} t={g.time:.6E}")
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
