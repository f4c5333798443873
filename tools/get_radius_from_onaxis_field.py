#!/usr/bin/env python3
"""Electrodynamic streamer radius from the on-axis field profile E(z).

Fits the head-potential model E(z) = E_bg + (E_max - E_bg)(z/R + 1)^-2
ahead of the streamer head, where z is the distance from the field
maximum and R the fitted radius. Input: a whitespace table with a
z column and an E column (e.g. a lineout produced by
``tools/visit_lineout.py`` on a grid npz, or an extracted log profile).
Reference analog: ``tools/get_radius_from_onaxis_field.py``."""

import argparse

import numpy as np
from scipy.optimize import curve_fit


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("infile")
    p.add_argument("-z_column", type=int, default=0)
    p.add_argument("-E_column", type=int, default=1)
    p.add_argument("-E_bg", type=float,
                   help="background field (default: median of E)")
    p.add_argument("-factor", type=float, default=0.5,
                   help="fit until E drops below factor * max(E)")
    p.add_argument("-skiprows", type=int, default=0)
    p.add_argument("-charge_layer_width", type=float,
                   help="skip this distance ahead of the maximum "
                        "(default: location of max |dE/dz|)")
    p.add_argument("-o", help="optional plot image")
    args = p.parse_args()

    raw = np.loadtxt(args.infile, skiprows=args.skiprows, ndmin=2)
    z = raw[:, args.z_column]
    E = raw[:, args.E_column]

    i_max = int(np.argmax(np.abs(E)))
    if E[i_max] < 0:
        E = -E
    E_max = E[i_max]
    E_bg = args.E_bg if args.E_bg is not None else float(np.median(E))
    if args.E_bg is None:
        print(f"estimated background field: {E_bg:.3e}")

    # profile ahead of the head: pick the side where E decays further
    n_pos = int(np.argmax(E[i_max:] < args.factor * E_max))
    n_neg = int(np.argmax(np.flip(E[:i_max + 1]) < args.factor * E_max))
    if n_pos >= n_neg:
        zz = z[i_max:i_max + n_pos + 1] - z[i_max]
        EE = E[i_max:i_max + n_pos + 1]
    else:
        zz = z[i_max] - np.flip(z[i_max - n_neg:i_max + 1])
        EE = np.flip(E[i_max - n_neg:i_max + 1])

    if args.charge_layer_width is None:
        n_skip = int(np.argmax(np.abs(np.gradient(EE))))
        print(f"estimated charge layer width: {zz[n_skip]:.3e}")
    else:
        n_skip = int(np.argmax(zz >= args.charge_layer_width))

    def model(s, R, E0):
        return E_bg + (E0 - E_bg) * (s / R + 1.0) ** -2

    f = args.factor
    R_guess = (f + np.sqrt(f)) / (1.0 - f) * zz[-1]
    popt, _ = curve_fit(model, zz[n_skip:], EE[n_skip:],
                        p0=[R_guess, EE[n_skip]])
    print(f"fitted radius: {popt[0]:.3e}")
    print(f"fitted E_max:  {popt[1]:.3e}")

    if args.o:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        ax.plot(zz, EE, label="data")
        ax.plot(zz[n_skip:], EE[n_skip:], ls="--", label="fit range")
        ax.plot(zz, model(zz, *popt), label="fit")
        ax.set_xlabel("distance from head (m)")
        ax.set_ylabel("E (V/m)")
        ax.legend()
        fig.savefig(args.o, dpi=150)
        print(f"wrote {args.o}")


if __name__ == "__main__":
    main()
