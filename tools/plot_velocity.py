#!/usr/bin/env python3
"""Streamer velocity from the observable log's max(E) position columns.

Computes |d position/dt| per axis from the ``x``/``y``/``z`` columns that
follow ``max(E)`` in the framework's ``*_log.txt`` (io/output.py writes
the same layout as the reference's ``m_output.f90:496-670``), both as a
raw ``np.gradient`` and Savitzky-Golay smoothed. Plots (or saves) one
panel per file plus a CSV option for headless use.

Reference analog: ``tools/plot_velocity.py``.
"""

import argparse

import numpy as np


def load_log(fname):
    """Parse the log; duplicate coordinate column names get suffixes."""
    with open(fname) as f:
        names = f.readline().split()
    seen = {}
    cols = []
    for n in names:
        k = seen.get(n, 0)
        seen[n] = k + 1
        cols.append(n if k == 0 else f"{n}.{k}")
    data = np.loadtxt(fname, skiprows=1, ndmin=2)
    return cols, data


def velocities(cols, data, width, order):
    """(time, {axis: (v_raw, v_smooth)}) from the max(E) location."""
    time = data[:, cols.index("time")]
    out = {}
    # the first x/y/z group after max(E) is its location
    for ax in ("x", "y", "z"):
        if ax not in cols:
            continue
        pos = data[:, cols.index(ax)]
        v_raw = np.abs(np.gradient(pos, time))
        try:
            from scipy.signal import savgol_filter
            dt = time[1] - time[0] if len(time) > 1 else 1.0
            w = min(width, len(pos) - (1 - len(pos) % 2))
            v_smooth = np.abs(savgol_filter(pos, max(w, order + 1), order,
                                            deriv=1, delta=dt))
        except Exception:
            v_smooth = v_raw
        out[ax] = (v_raw, v_smooth)
    return time, out


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("logs", nargs="+", help="*_log.txt files")
    ap.add_argument("--savgol-width", type=int, default=5)
    ap.add_argument("--savgol-order", type=int, default=2)
    ap.add_argument("--csv", help="write time/velocity table instead")
    ap.add_argument("--save", help="save the figure to this path")
    args = ap.parse_args()

    results = []
    for f in args.logs:
        cols, data = load_log(f)
        results.append((f, *velocities(cols, data, args.savgol_width,
                                       args.savgol_order)))

    if args.csv:
        with open(args.csv, "w") as f:
            f.write("file time " + " ".join(
                f"v{ax} v{ax}_savgol" for ax in results[0][2]) + "\n")
            for name, time, vs in results:
                for i, t in enumerate(time):
                    row = [name, f"{t:.6e}"]
                    for ax, (vr, vsm) in vs.items():
                        row += [f"{vr[i]:.6e}", f"{vsm[i]:.6e}"]
                    f.write(" ".join(row) + "\n")
        print(f"wrote {args.csv}")
        return

    import matplotlib
    if args.save:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(constrained_layout=True)
    for i, (name, time, vs) in enumerate(results):
        for axn, (vr, vsm) in vs.items():
            ax.plot(time, vr, alpha=0.3, label=f"{i}:v{axn}")
            ax.plot(time, vsm, label=f"{i}:v{axn} (savgol)")
    ax.set_xlabel("time (s)")
    ax.set_ylabel("velocity (m/s)")
    ax.legend()
    fig.suptitle("\n".join(f"{i}: {n}" for i, (n, _, _) in
                           enumerate(results)), fontsize=8)
    if args.save:
        fig.savefig(args.save, dpi=150)
        print(f"wrote {args.save}")
    else:
        plt.show()


if __name__ == "__main__":
    main()
