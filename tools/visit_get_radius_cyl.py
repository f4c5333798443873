#!/usr/bin/env python3
"""Streamer radius vs z in axisymmetric data: for a range of z values,
the radius where the electron density crosses a threshold (linear
interpolation between samples along r), 0 where the axis value is below
the threshold. npz-based equivalent of the reference's
``tools/visit_get_radius_cyl.py``."""

import argparse

import numpy as np

from gridnpz import GridData


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("npz_file", help="AMR grid npz of a cyl run")
    p.add_argument("-zrange", nargs=2, type=float, required=True)
    p.add_argument("-npoints", type=int, default=50)
    p.add_argument("-var", default="e", help="density variable")
    p.add_argument("-threshold_e", type=float, default=5e17)
    p.add_argument("-rmax", type=float, default=None,
                   help="lineout extent in r (default: domain width)")
    p.add_argument("-nsamples", type=int, default=512)
    p.add_argument("-output", default="r_vs_z.txt")
    args = p.parse_args()

    g = GridData(args.npz_file)
    rmax = args.rmax
    if rmax is None:
        rmax = float((g.r_min[:, 0] + g.nc * g.dr()[:, 0]).max())
    z_values = np.linspace(args.zrange[0], args.zrange[1], args.npoints)
    r_values = np.zeros(args.npoints)
    for i, z in enumerate(z_values):
        s, dens = g.lineout(args.var, [0.0, z], [rmax, z], args.nsamples)
        ok = np.isfinite(dens)
        s, dens = s[ok], dens[ok]
        if len(dens) == 0 or dens.max() < args.threshold_e:
            continue
        below = np.nonzero(dens < args.threshold_e)[0]
        j = below[0] if len(below) else len(dens) - 1
        if j > 0:
            w0 = dens[j - 1] / args.threshold_e
            w1 = dens[j] / args.threshold_e
            c = (1 - w1) / (w0 - w1)
            r_values[i] = c * s[j] + (1 - c) * s[j - 1]
        else:
            r_values[i] = s[j]
    np.savetxt(args.output, np.column_stack([z_values, r_values]),
               header=f"z radius({args.var} >= {args.threshold_e:.3E})")
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
