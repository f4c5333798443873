"""User code for the dielectric_2d program.

Port of the reference's ``programs/dielectric_2d/m_user.f90``: sets the
permittivity pattern (a dielectric slab at the top/bottom/left of the
domain) and zeroes the plasma densities inside the dielectric.
"""

import numpy as np


def user_initialize(cfg, sim):
    dielectric_type = cfg.add_get("dielectric_type", "top",
                                  "What kind of dielectric to use")
    dielectric_eps = cfg.add_get("dielectric_eps", 2.0,
                                 "The dielectric permittivity")
    def set_ics(s, ids):
        # user_initialize runs before the domain is set up (module order,
        # streamer.f90:439-455), so read the geometry at hook time
        L = s.st.domain_len
        t = s.tree
        for b in np.asarray(ids):
            coords = t.cell_coords(int(b))  # incl. ghost layer
            if dielectric_type == "top":
                inside = coords[..., 1] > 0.75 * L[1]
            elif dielectric_type == "bottom":
                inside = coords[..., 1] < 0.25 * L[1]
            elif dielectric_type == "left":
                inside = coords[..., 0] < 0.25 * L[0]
            else:
                raise ValueError(f"unknown dielectric_type {dielectric_type}")
            eps = np.where(inside, dielectric_eps, 1.0)
            s.cc[s.i_eps, int(b)] = eps.ravel()
            for iv in (s.i_electron, s.i_1pos_ion):
                vals = s.cc[iv, int(b)].reshape(eps.shape)
                s.cc[iv, int(b)] = np.where(inside, 0.0, vals).ravel()

    sim.user.initial_conditions = set_ics
