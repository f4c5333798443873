#!/usr/bin/env python3
"""Plot a run's ``<name>_summary.txt`` (swarm parameters vs E/N)
written at startup by io/output.py (chemistry_write_summary analog).
Reference analog: ``tools/plot_transport_data_summary.py``."""

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("summary_file", nargs="+",
                   help="File <simulation>_summary.txt")
    p.add_argument("-SI_field", action="store_true",
                   help="Index by E[V/m] rather than E/N[Td]")
    p.add_argument("-o", default="summary.png", help="output image")
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    runs = []
    for f in args.summary_file:
        with open(f) as fh:
            names = fh.readline().split()
        runs.append((names, np.loadtxt(f, skiprows=1, ndmin=2)))

    names0 = runs[0][0]
    xcol = "E[V/m]" if args.SI_field else "E/N[Td]"
    drop = {"E[V/m]", "E/N[Td]"}
    ycols = [n for n in names0 if n not in drop]
    ncols = 2
    nrows = (len(ycols) + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(10, 2.5 * nrows),
                             sharex=True, constrained_layout=True)
    axes = np.atleast_1d(axes).ravel()
    for names, data in runs:
        x = data[:, names.index(xcol)]
        for ax, y in zip(axes, ycols):
            ax.plot(x, data[:, names.index(y)])
            ax.set_title(y, fontsize=8)
    for ax in axes[-ncols:]:
        ax.set_xlabel(xcol)
    fig.savefig(args.o, dpi=150)
    print(f"wrote {args.o}")


if __name__ == "__main__":
    main()
