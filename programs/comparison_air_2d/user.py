"""User code for the comparison_air_2d program (6-code benchmark setup).

Port of ``programs/comparison_air_2d/m_user.f90``: the boundary potential
in the last dimension is read from position-dependent tables for the
upper/lower electrodes (scaled by the current voltage); the other sides
get zero-Neumann conditions.
"""

import os

import numpy as np

from afivo_streamer_tpu.core import ghostcell as gc
from afivo_streamer_tpu.utils.table_data import table_from_file


def user_initialize(cfg, sim):
    here = os.path.dirname(os.path.abspath(__file__))
    ref = "/root/reference/programs/comparison_air_2d"
    base = here if os.path.exists(
        os.path.join(here, "applied_voltage_upper.txt")) else ref
    xu, yu = table_from_file(
        os.path.join(base, "applied_voltage_upper.txt"),
        "location[m]_vs_potential[V]")
    xl, yl = table_from_file(
        os.path.join(base, "applied_voltage_lower.txt"),
        "location[m]_vs_potential[V]")

    def potential_bc(iv, d, coords, params):
        ndim = coords.shape[-1]
        if d // 2 == ndim - 1:
            x, y = (xl, yl) if d % 2 == 0 else (xu, yu)
            prof = np.interp(coords[..., 0], x, y)
            return gc.BC_DIRICHLET, params.get("voltage", 0.0) * prof
        return gc.BC_NEUMANN, 0.0

    sim.user.potential_bc = potential_bc
