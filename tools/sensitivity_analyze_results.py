#!/usr/bin/env python3
"""Analyze a chemistry sensitivity study produced by
``tools/sensitivity_generate_commands.py``: for every modified reaction,
the elementary-effect statistics of the chosen observables w.r.t. the
rate factor (mu = mean normalized derivative, mustar = mean |.|,
sigma = std), reactions ranked by max(mustar), optional bar chart.
Accepts either ``*_log.txt`` files (observable columns) or
``*_amounts.txt`` files (species amounts; -y then names species).
Reference analog: ``tools/sensitivity_analyze_results.py``."""

import argparse
import re

import numpy as np


def read_table(fname):
    if fname.endswith("_amounts.txt"):
        base = fname[: -len("_amounts.txt")]
        with open(base + "_species.txt") as f:
            names = ["time"] + [x.strip() for x in f if x.strip()]
        data = np.loadtxt(fname, ndmin=2)
    else:
        with open(fname) as f:
            cols = f.readline().split()
        seen, names = {}, []
        for c in cols:
            seen[c] = seen.get(c, 0) + 1
            names.append(c if seen[c] == 1 else f"{c}_{seen[c]}")
        data = np.loadtxt(fname, skiprows=1, ndmin=2)
    return names, data


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("logs", nargs="+", help="log/amounts files of the study")
    p.add_argument("-y", nargs="+", default=["sum(n_e)"],
                   help="observables to compare (species names for "
                        "amounts files; default switches to 'e')")
    p.add_argument("-time_index", type=int, default=-1)
    p.add_argument("-num_bar_plot", type=int, default=0,
                   help="if >0, bar-chart the N most important reactions "
                        "for y[0]")
    p.add_argument("-figname", default="sensitivity.png")
    args = p.parse_args()

    logs = sorted(args.logs)
    if all(x.endswith("_amounts.txt") for x in logs) \
            and args.y == ["sum(n_e)"]:
        args.y = ["e"]

    cases = {}
    for fname in logs:
        m = re.search(r"_ix(\d+)_fac([0-9.eE+-]+)_", fname + "_")
        if not m:
            raise ValueError(f"cannot parse _ixNNNN_facF from {fname}")
        ix, fac = int(m.group(1)), float(m.group(2))
        names, data = read_table(fname)
        cases.setdefault(ix, []).append((fac, names, data))
    if 0 not in cases:
        raise ValueError("base case (..._ix0000_...) not found")

    base_names, base = cases[0][0][1:]
    n_rows = min(min(len(d) for _, _, d in runs)
                 for runs in cases.values())
    times = base[:n_rows, base_names.index("time")]
    print(f"using data at time t = {times[args.time_index]:.6E}\n")
    print(f'R{"#":<4} {"variable":15} {"mu":>15} {"mustar":>15} '
          f'{"sigma":>15}')

    ycols = [base_names.index(y) for y in args.y]
    base_vals = base[:n_rows][args.time_index, ycols]
    rix = np.array(sorted(ix for ix in cases if ix != 0))
    mustar_max = np.zeros(len(rix))
    mu = np.zeros((len(rix), len(args.y)))
    sigma = np.zeros((len(rix), len(args.y)))
    for i, ix in enumerate(rix):
        facs = np.array([f for f, _, _ in cases[ix]])
        vals = np.array([d[:n_rows][args.time_index, ycols]
                         for _, _, d in cases[ix]])
        derivs = (vals - base_vals[None, :]) / (facs - 1.0)[:, None] \
            / base_vals[None, :]
        mu[i] = derivs.mean(axis=0)
        mustar = np.abs(derivs).mean(axis=0)
        sigma[i] = derivs.std(axis=0, ddof=1) if len(facs) > 1 else 0.0
        mustar_max[i] = mustar.max()
        for name, m_, ms, s in zip(args.y, mu[i], mustar, sigma[i]):
            print(f"R{ix:<4} {name:15} {m_:15.8f} {ms:15.8f} {s:15.8f}")

    print("\nreactions sorted by overall importance:")
    print(f'{"rank":<6} R{"#":<6} {"reaction":40} {"max(mustar)":15}')
    reactions = None
    base_file = [f for f in logs if "_ix0000_" in f][0]
    base_prefix = re.sub(r"(_log\.txt|_amounts\.txt)$", "", base_file)
    try:
        with open(base_prefix + "_reactions.txt") as f:
            reactions = [x.strip() for x in f if x.strip()]
    except OSError:
        pass
    order = np.argsort(mustar_max)[::-1]
    for rank, i in enumerate(order):
        name = (reactions[rix[i] - 1] if reactions
                and rix[i] - 1 < len(reactions) else "?")
        print(f"{rank + 1:<6} R{rix[i]:<6} {name:40} "
              f"{mustar_max[i]:<15.8f}")

    if args.num_bar_plot > 0:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        N = min(args.num_bar_plot, len(order))
        sel = order[:N]
        labels = [(reactions[rix[i] - 1] if reactions else f"R{rix[i]}")
                  for i in sel]
        colors = ["green" if mu[i, 0] > 0 else "red" for i in sel]
        fig, ax = plt.subplots(figsize=(6, 0.5 * N + 1.5),
                               constrained_layout=True)
        bars = ax.barh(np.arange(N, 0, -1), np.abs(mu[sel, 0]),
                       tick_label=labels, color=colors)
        ax.bar_label(bars, [f"± {s:.2f}" for s in sigma[sel, 0]],
                     padding=4)
        ax.set_xlabel(f"|mu| of {args.y[0]}")
        fig.savefig(args.figname, dpi=150)
        print(f"wrote {args.figname}")


if __name__ == "__main__":
    main()
