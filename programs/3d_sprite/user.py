"""User code for the 2d_sprite program (axisymmetric sprite discharge).

Port of the reference's ``programs/2d_sprite/m_user.f90``: altitude-
dependent air density (scale height 7.2 km) and a Wait-Spies ambient
electron/ion profile added to the configured seeds.
"""

import numpy as np

from afivo_streamer_tpu.utils.geometry import density_line

E_DECAY_HEIGHT = 2.86e3
SCALE_HEIGHT = 7.2e3
N_E0 = 1e4


def user_initialize(cfg, sim):
    def gas_density(s, coords):
        # 2.5e25 * exp(-z / scale_height) (m_user.f90:33-40)
        return 2.5e25 * np.exp(-coords[..., -1] / SCALE_HEIGHT)

    def init_cond(s, ids):
        ic = s.init_cond
        for b in np.asarray(ids):
            rr = s.tree.cell_coords(int(b))  # incl. ghost layer
            n_e = N_E0 * np.exp((rr[..., -1] - 60e3) / E_DECAY_HEIGHT)
            ne = n_e.copy()
            ni = n_e.copy()
            for n in range(ic.n_cond):
                dens = density_line(
                    rr, ic.seed_r0[n], ic.seed_r1[n], ic.seed_density[n],
                    ic.seed_density2[n], ic.seed_width[n],
                    ic.seed_falloff[n])
                if ic.seed_charge_type[n] <= 0:
                    ne = ne + dens
                if ic.seed_charge_type[n] >= 0:
                    ni = ni + dens
            s.cc[s.i_electron, int(b)] = ne.ravel()
            s.cc[s.i_1pos_ion, int(b)] = ni.ravel()

    sim.user.gas_density = gas_density
    sim.user.initial_conditions = init_cond
