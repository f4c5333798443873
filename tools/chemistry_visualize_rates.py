#!/usr/bin/env python3
"""Analyze a run's accumulated reaction rates: list species/reactions,
plot all rates over time, and break down the source/sink reactions of a
species of interest.

Consumes the companion outputs written per run (io/output.py):
``<name>_rates.txt`` (time + accumulated reaction counts),
``<name>_amounts.txt`` (time + space-integrated species amounts),
``<name>_species.txt``, ``<name>_reactions.txt`` and
``<name>_stoich_matrix.txt``. Reference analog:
``tools/chemistry_visualize_rates.py``."""

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("rates_file", help="<name>_rates.txt of a run")
    p.add_argument("-soi", help="species of interest")
    p.add_argument("-list_species", action="store_true")
    p.add_argument("-list_reactions", action="store_true")
    p.add_argument("-plot_all", action="store_true",
                   help="plot every accumulated reaction rate over time")
    p.add_argument("-time_interval", nargs=2, type=float,
                   help="restrict the analysis to [t0, t1] seconds")
    p.add_argument("-threshold", type=float, default=0.01,
                   help="relative contribution below which a reaction "
                        "is not drawn")
    p.add_argument("-savefig", default="chemistry_rates.png")
    args = p.parse_args()

    base = args.rates_file.replace("_rates.txt", "")
    with open(base + "_species.txt") as f:
        species = [x.strip() for x in f if x.strip()]
    with open(base + "_reactions.txt") as f:
        reactions = [x.strip() for x in f if x.strip()]
    stoich = np.loadtxt(base + "_stoich_matrix.txt", ndmin=2)

    raw = np.loadtxt(args.rates_file, ndmin=2)
    time, rates = raw[:, 0], raw[:, 1:]
    amounts = np.loadtxt(base + "_amounts.txt", ndmin=2)[:, 1:]

    if args.time_interval is not None:
        t0, t1 = args.time_interval
        sel = (time >= t0) & (time <= t1)
        time, rates, amounts = time[sel], rates[sel], amounts[sel]
    rates = rates - rates[0]  # accumulated counts within the window

    if args.list_species:
        for i, s in enumerate(species):
            print(f"{i:4} {s}")
    if args.list_reactions:
        for i, r in enumerate(reactions):
            print(f"{i:4} {r}")
    if not (args.plot_all or args.soi):
        return

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if args.plot_all:
        fig, ax = plt.subplots(figsize=(9, 7), constrained_layout=True)
        total = max(rates[-1].sum(), 1e-300)
        for i in np.argsort(rates[-1])[::-1]:
            ax.plot(time, rates[:, i],
                    label=f"{reactions[i]} "
                          f"({100 * rates[-1, i] / total:.2f}%)")
        ax.set_xlabel("time (s)")
        ax.set_ylabel("accumulated rate (#)")
        ax.legend(fontsize=6, bbox_to_anchor=(1.02, 1), loc="upper left")
        fig.savefig(args.savefig, dpi=150, bbox_inches="tight")
        print(f"wrote {args.savefig}")

    if args.soi:
        sidx = species.index(args.soi)
        # stoich_matrix.txt rows = species (the reference layout)
        srce = np.nonzero(stoich[sidx] > 0)[0]
        sink = np.nonzero(stoich[sidx] < 0)[0]
        fig, ax = plt.subplots(3, figsize=(6, 8), sharex=True,
                               constrained_layout=True)
        for k, (ix, title) in enumerate(
                zip([srce, sink], ["Source", "Sink"])):
            contrib = stoich[sidx, ix] * rates[:, ix]
            total = contrib[-1].sum()
            frac = contrib[-1] / (total if total != 0 else 1.0)
            for j, r in enumerate(ix):
                if abs(frac[j]) > args.threshold:
                    ax[k].plot(time, contrib[:, j],
                               label=f"{reactions[r]} "
                                     f"({100 * frac[j]:.2f}%)")
            ax[k].set_title(f"{title} reactions", fontsize=9)
            ax[k].set_ylabel("production (#)")
            ax[k].legend(fontsize=6)
        ax[2].plot(time, rates[:, srce] @ stoich[sidx, srce],
                   label="gross production")
        ax[2].plot(time, rates @ stoich[sidx], label="net production")
        ax[2].plot(time, amounts[:, sidx], "--", label="amount present")
        ax[2].set_xlabel("time (s)")
        ax[2].set_ylabel("production (#)")
        ax[2].legend(fontsize=7)
        fig.suptitle(f"{len(srce) + len(sink)} of {len(reactions)} "
                     f"reactions influence {args.soi}")
        out = args.savefig.replace(".png", f"_{args.soi}.png")
        fig.savefig(out, dpi=150)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
