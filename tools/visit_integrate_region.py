#!/usr/bin/env python3
"""Volume integral of a variable over a coordinate box, plus the total
integration volume (cylindrical volumes included automatically for
axisymmetric runs). npz-based equivalent of the reference's
``tools/visit_integrate_region.py``."""

import argparse

from gridnpz import GridData


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("filename", help="AMR grid npz")
    p.add_argument("variable")
    p.add_argument("-rmin", nargs="+", type=float,
                   default=[-1e10, -1e10, -1e10])
    p.add_argument("-rmax", nargs="+", type=float,
                   default=[1e10, 1e10, 1e10])
    args = p.parse_args()

    g = GridData(args.filename)
    total, vol = g.integrate(args.variable, args.rmin, args.rmax)
    print("integral volume")
    print(f"{total:.8E} {vol:.8E}")


if __name__ == "__main__":
    main()
