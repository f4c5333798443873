#!/usr/bin/env python3
"""Plot columns of a simulation _log.txt (plot_log_file.py analog)."""

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser(description="Plot log-file columns")
    p.add_argument("log_files", nargs="+")
    p.add_argument("-x", default="time", help="x column name")
    p.add_argument("-y", nargs="+", default=["max(E)"],
                   help="y column names")
    p.add_argument("-logy", action="store_true")
    p.add_argument("-o", default="log_plot.png", help="output image")
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for fname in args.log_files:
        with open(fname) as f:
            cols = f.readline().split()
        # duplicate coordinate labels get suffixes
        seen = {}
        names = []
        for c in cols:
            seen[c] = seen.get(c, 0) + 1
            names.append(c if seen[c] == 1 else f"{c}_{seen[c]}")
        data = np.loadtxt(fname, skiprows=1, ndmin=2)
        xi = names.index(args.x)
        for y in args.y:
            plt.plot(data[:, xi], data[:, names.index(y)],
                     label=f"{fname}: {y}")
    plt.xlabel(args.x)
    if args.logy:
        plt.yscale("log")
    plt.legend(fontsize=7)
    plt.tight_layout()
    plt.savefig(args.o, dpi=150)
    print(f"wrote {args.o}")


if __name__ == "__main__":
    main()
