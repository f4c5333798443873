#!/usr/bin/env python3
"""Streamer radius (FWHM) from the framework's uniform-grid npz outputs.

Accumulates a variable (default the electron density as an emission
proxy; pass e.g. a stored emission variable for the reference's
time-integrated optical emission analysis) over a series of ``*.npz``
outputs, then computes the full width at half maximum of the transverse
profile at every axial position, and reports the radius at the axial
location of maximum signal plus a per-z csv.

Works for axisymmetric 2D (first axis = r) and 3D (transverse plane
through the maximum). Reference analog: ``tools/get_radius.py``.
"""

import argparse
import glob

import numpy as np


def fwhm_1d(profile, dx):
    """Full width at half maximum by linear interpolation of crossings."""
    m = float(np.max(profile))
    if m <= 0:
        return 0.0
    half = 0.5 * m
    above = profile >= half
    idx = np.nonzero(above)[0]
    if len(idx) == 0:
        return 0.0
    lo, hi = idx[0], idx[-1]
    x_lo = float(lo)
    if lo > 0:
        f0, f1 = profile[lo - 1], profile[lo]
        x_lo = lo - 1 + (half - f0) / max(f1 - f0, 1e-300)
    x_hi = float(hi)
    if hi < len(profile) - 1:
        f0, f1 = profile[hi], profile[hi + 1]
        x_hi = hi + (f0 - half) / max(f0 - f1, 1e-300)
    return (x_hi - x_lo) * dx


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("npz", nargs="+",
                    help="npz output files (wildcards ok)")
    ap.add_argument("--var", default="e",
                    help="variable to analyze (emission proxy)")
    ap.add_argument("--axisymmetric", action="store_true",
                    help="first axis is r: profile weighting uses |r|")
    ap.add_argument("--csv", default="fwhm.csv")
    args = ap.parse_args()

    files = sorted(sum((glob.glob(p) for p in args.npz), []))
    if not files:
        raise SystemExit("no input files")

    acc = None
    dx = None
    for f in files:
        d = np.load(f)
        grid = d[args.var]
        if acc is None:
            acc = np.zeros_like(grid)
            dx = (np.asarray(d["dr"]) if "dr" in d
                  else np.ones(grid.ndim))
        acc += grid

    nd = acc.ndim
    if nd == 1:
        print(f"FWHM: {fwhm_1d(acc, float(dx[0])):.6e} m")
        return
    # axial dimension is the last; transverse profile per z
    z_axis = nd - 1
    nz = acc.shape[z_axis]
    rows = []
    for k in range(nz):
        sl = np.take(acc, k, axis=z_axis)
        if nd == 3:
            # 1D cut through the transverse maximum, x then y averaged
            i, j = np.unravel_index(np.argmax(sl), sl.shape)
            w = 0.5 * (fwhm_1d(sl[:, j], float(dx[0]))
                       + fwhm_1d(sl[i, :], float(dx[1])))
        else:
            prof = sl
            if args.axisymmetric:
                # mirror r >= 0 profile to a full diameter
                prof = np.concatenate([prof[::-1], prof])
            w = fwhm_1d(prof, float(dx[0]))
        rows.append((k, float(np.max(sl)), w))

    ks, peaks, widths = zip(*rows)
    k_star = int(np.argmax(peaks))
    print(f"n_files={len(files)} var={args.var}")
    print(f"FWHM at peak z-index {k_star}: {widths[k_star]:.6e} m")
    with open(args.csv, "w") as f:
        f.write("z_index peak fwhm\n")
        for k, p, w in rows:
            f.write(f"{k} {p:.6e} {w:.6e}\n")
    print(f"wrote {args.csv}")


if __name__ == "__main__":
    main()
