#!/usr/bin/env python3
"""Plot dielectric-surface variables of a 2D run along the surface
coordinate: surface charge density, photon flux and grid spacing, from
an AMR grid npz that was written with ``output%surface_write=T``
(io/output.py stores ``surface_sd`` [n_surf, n_vars, nc] with
sd[0] = photon flux, sd[1] = charge — physics/dielectric.py — plus
``surface_info`` = [id_out, id_in, direction]). Reference analog:
``tools/surface_plot_2d.py`` (reads the reference's surface npz)."""

import argparse

import numpy as np

from gridnpz import GridData


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("npz", help="<name>_grid_NNNNNN.npz with surface data")
    p.add_argument("-o", default="surface.png")
    args = p.parse_args()

    g = GridData(args.npz)
    if g.surface_sd is None:
        raise SystemExit("no surface data in this file "
                         "(-output%surface_write=T)")
    if -1 in g.box_id:
        raise SystemExit("grid npz predates box_id; rerun the simulation")

    id2row = {int(b): i for i, b in enumerate(g.box_id)}
    nc = g.nc
    dr = g.dr()

    coords, charge, flux, spacing = [], [], [], []
    for (id_out, _id_in, direction), sd in zip(g.surface_info,
                                               g.surface_sd):
        row = id2row[int(id_out)]
        # face-cell centers along the tangential dimension
        normal_dim = int(direction) // 2
        tang_dim = 1 - normal_dim
        r0 = g.r_min[row, tang_dim]
        h = dr[row, tang_dim]
        coords.append(r0 + (np.arange(nc) + 0.5) * h)
        flux.append(sd[0])
        charge.append(sd[1])
        spacing.append(np.full(nc, h))
    r = np.concatenate(coords)
    order = np.argsort(r)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(3, sharex=True, constrained_layout=True)
    for a, vals, label in zip(
            ax, [charge, flux, spacing],
            ["surface charge", "photon flux", "grid spacing"]):
        a.plot(r[order], np.concatenate(vals)[order])
        a.set_ylabel(label, fontsize=8)
    ax[-1].set_xlabel("surface coordinate (m)")
    fig.savefig(args.o, dpi=150)
    print(f"wrote {args.o}")


if __name__ == "__main__":
    main()
