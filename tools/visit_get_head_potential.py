#!/usr/bin/env python3
"""Potential at the streamer head: locate max(electric_fld) in a later
output, sample phi there and in a background (t0) output, print the
difference. npz-based equivalent of the reference's
``tools/visit_get_head_potential.py``."""

import argparse

from gridnpz import GridData


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("filename_t0", help="grid npz with background phi")
    p.add_argument("filename_t1", help="grid npz at a later time")
    args = p.parse_args()

    g1 = GridData(args.filename_t1)
    g0 = GridData(args.filename_t0)
    _, loc = g1.max_location("electric_fld")
    phi1 = float(g1.sample_points("phi", loc[None, :])[0])
    phi0 = float(g0.sample_points("phi", loc[None, :])[0])
    print("delta_phi phi_head phi_background location_head")
    print(phi1 - phi0, phi1, phi0, tuple(loc))


if __name__ == "__main__":
    main()
