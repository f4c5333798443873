"""Legacy-VTK unstructured-grid writer for the AMR leaves.

Replaces the reference's Silo output (``afivo/src/m_write_silo.f90`` +
m_af_output.f90 af_write_silo) and mirrors its pure-Fortran VTK fallback
(af_write_vtk, ``afivo/src/m_af_output.f90:556-752`` and ``m_vtk.f90``):
every leaf cell becomes a quad/hexahedron with cell-centered data arrays.
Readable by VisIt/ParaView."""

from __future__ import annotations

import numpy as np

from ..core import spatial as sp


def write_vtk(fname: str, sim, cycle: int = 0, time: float = 0.0) -> None:
    t = sim.tree
    nc, ndim = t.nc, t.ndim
    if ndim == 1:
        _write_vtk_nd(fname, sim, 1, cycle, time)
    elif ndim == 2:
        _write_vtk_nd(fname, sim, 2, cycle, time)
    else:
        _write_vtk_nd(fname, sim, 3, cycle, time)


def _write_vtk_nd(fname: str, sim, ndim: int, cycle: int, time: float):
    t = sim.tree
    nc = t.nc
    interior = sp.interior_flat(ndim, nc)
    reg = sim.registry

    points = []
    cells = []
    data = {name: [] for iv, name in enumerate(reg.cc_names)
            if reg.cc_write_output[iv]}
    point_offset = 0
    ppc = 2 ** ndim  # points per cell

    for lvl in range(1, t.highest_lvl + 1):
        leaves = np.asarray(t.lvl_leaves[lvl - 1])
        if len(leaves) == 0:
            continue
        dr = t.lvl_dr(lvl)
        r0s = t.box_r_min(leaves)
        # cell corner offsets
        cell_nd = np.stack(np.meshgrid(*[np.arange(nc)] * ndim,
                                       indexing="ij"), -1).reshape(-1, ndim)
        for n_i, b in enumerate(leaves):
            base = r0s[n_i] + cell_nd * dr  # lower corner of each cell
            # corners in VTK order (x fastest): 2D quad: (0,0),(1,0),(1,1),(0,1)
            if ndim == 1:
                corners = [np.array([0.0]), np.array([1.0])]
            elif ndim == 2:
                corners = [np.array(c, dtype=np.float64) for c in
                           [(0, 0), (1, 0), (1, 1), (0, 1)]]
            else:
                corners = [np.array(c, dtype=np.float64) for c in
                           [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
                            (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)]]
            for c in corners:
                points.append(base + c * dr)
            ncell = len(cell_nd)
            pts_per_cell = len(corners)
            # points were appended corner-major: index of (cell i, corner k)
            # is point_offset + k * ncell + i
            cells.append(point_offset
                         + np.arange(ncell)[:, None]
                         + np.arange(pts_per_cell)[None, :] * ncell)
            point_offset += ncell * pts_per_cell
            for iv, name in enumerate(reg.cc_names):
                if not reg.cc_write_output[iv]:
                    continue
                data[name].append(np.asarray(sim.cc[iv, int(b), interior]))

    # assemble points array (appended as corner-major blocks per box)
    all_pts = np.concatenate([p if p.ndim == 2 else p[None]
                              for p in points], axis=0)
    all_cells = np.concatenate(cells, axis=0)
    n_cells = len(all_cells)
    ctype = {1: 3, 2: 9, 3: 12}[ndim]  # VTK_LINE, VTK_QUAD, VTK_HEXAHEDRON

    with open(fname, "w") as f:
        f.write("# vtk DataFile Version 3.0\n")
        f.write(f"cycle {cycle} time {time:.8E}\n")
        f.write("ASCII\nDATASET UNSTRUCTURED_GRID\n")
        np3 = np.zeros((len(all_pts), 3))
        np3[:, :ndim] = all_pts
        f.write(f"POINTS {len(all_pts)} double\n")
        np.savetxt(f, np3, fmt="%.10E")
        f.write(f"\nCELLS {n_cells} {n_cells * (2 ** ndim + 1)}\n")
        arr = np.column_stack([np.full(n_cells, 2 ** ndim), all_cells])
        np.savetxt(f, arr, fmt="%d")
        f.write(f"\nCELL_TYPES {n_cells}\n")
        np.savetxt(f, np.full(n_cells, ctype), fmt="%d")
        f.write(f"\nCELL_DATA {n_cells}\n")
        for name, chunks in data.items():
            f.write(f"SCALARS {name} double 1\nLOOKUP_TABLE default\n")
            np.savetxt(f, np.concatenate(chunks), fmt="%.10E")
