#!/usr/bin/env python3
"""Plot one log column against another for one or more runs
(reference analog: ``tools/plot_log_xy.py``)."""

import argparse

import numpy as np


def read_log(fname):
    """Column-name -> array dict; duplicate coordinate labels (x, y of
    several observables) get _2, _3 ... suffixes."""
    with open(fname) as f:
        cols = f.readline().split()
    seen, names = {}, []
    for c in cols:
        seen[c] = seen.get(c, 0) + 1
        names.append(c if seen[c] == 1 else f"{c}_{seen[c]}")
    data = np.loadtxt(fname, skiprows=1, ndmin=2)
    return {n: data[:, i] for i, n in enumerate(names)}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("log_files", nargs="+")
    p.add_argument("-x", default="time", help="x column name")
    p.add_argument("-y", nargs="+", default=["max(E)"], help="y columns")
    p.add_argument("-o", default="log_xy.png", help="output image")
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(constrained_layout=True)
    fig.suptitle("\n".join(f"{i}: {f}"
                           for i, f in enumerate(args.log_files)),
                 fontsize=8)
    for i, f in enumerate(args.log_files):
        log = read_log(f)
        for y in args.y:
            ax.plot(log[args.x], log[y], label=f"{y}-{i}")
    ax.set_xlabel(args.x)
    ax.legend()
    fig.savefig(args.o, dpi=150)
    print(f"wrote {args.o}")


if __name__ == "__main__":
    main()
