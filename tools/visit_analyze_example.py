#!/usr/bin/env python3
"""Worked example of scripted analysis over a series of grid npz
outputs: for every output, the location/value of max(E), the ionized
volume (E above a threshold) and an on-axis lineout — the npz-based
counterpart of the reference's ``tools/visit_analyze_example.py``
VisIt-CLI template. Copy and adapt."""

import argparse

import numpy as np

from gridnpz import GridData, expand_files


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("database", help='grid npz series, e.g. "run_grid_*.npz"')
    p.add_argument("-var", default="electric_fld")
    p.add_argument("-threshold", type=float, default=3e6)
    args = p.parse_args()

    print("# time max_val max_coords volume_above_threshold")
    for fname in expand_files([args.database]):
        g = GridData(fname)
        val, loc = g.max_location(args.var)
        _, vol = g.integrate(args.var,
                             where=g.data[args.var] >= args.threshold)
        print(f"{g.time:.6E} {val:.6E} "
              + " ".join(f"{x:.6E}" for x in loc) + f" {vol:.6E}")

        # example lineout through the maximum, along the last axis
        r0, r1 = loc.copy(), loc.copy()
        r0[-1] = g.r_min[:, -1].min()
        r1[-1] = (g.r_min[:, -1] + g.nc * g.dr()[:, -1]).max()
        s, vals = g.lineout(args.var, r0, r1, 256)
        out = fname.replace(".npz", f"_{args.var}_axis.curve")
        np.savetxt(out, np.column_stack([s, vals]))


if __name__ == "__main__":
    main()
