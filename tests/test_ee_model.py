"""Electron energy-equation (model%type=ee53) tests.

The reference has no regression golden for the ee53 model, so the model is
checked against its physics: in a uniform field the mean electron energy
must relax to the input table's "Mean energy (eV)" at that reduced field
(the energy source mu(eps)E^2 balances the tabulated loss exactly there,
m_transport_data.f90:165-195 and m_fluid.f90:442-447).
"""

import numpy as np
import pytest

from afivo_streamer_tpu.driver import Simulation
from afivo_streamer_tpu import constants as uc
from afivo_streamer_tpu.core import reductions as red

REF1D = "/root/reference/programs/standard_1d/tests"


@pytest.fixture(scope="module")
def ee_sim():
    sim = Simulation(argv=[
        f"{REF1D}/test_1d_chemistry.cfg", "-ndim=1",
        f"-input_data%file={REF1D}/air_chemistry_Baohong_reactions.txt",
        "-model%type=ee53", "-seed_density=0",
        "-background_density=1e13",
        "-output%name=/tmp/ee_test/run"])
    sim.run(end_time=3.0e-10)
    return sim


def test_energy_relaxes_to_table(ee_sim):
    sim = ee_sim
    t = sim.tree
    # sample mid-domain, away from the boundaries
    ids = np.asarray(t.lvl_leaves[t.highest_lvl - 1])
    b = ids[len(ids) // 2]
    nc = t.nc
    ne = np.asarray(sim.cc[sim.i_electron, b]).reshape(nc + 2)[nc // 2]
    en = np.asarray(sim.cc[sim.i_electron_energy, b]).reshape(
        nc + 2)[nc // 2]
    fld = np.asarray(sim.cc[sim.i_electric_fld, b]).reshape(
        nc + 2)[nc // 2]
    mean_eV = en / max(ne, 1.0)
    Td = fld * uc.SI_to_Townsend * sim.gas.inverse_number_density
    expect_eV = float(sim.td.tbl.get_col(4, np.array([Td]))[0])  # ENERGY_EV
    assert ne > 0
    assert abs(mean_eV - expect_eV) < 0.05 * expect_eV, \
        f"mean energy {mean_eV} eV vs table {expect_eV} eV at {Td} Td"


def test_energy_nonnegative_and_limits(ee_sim):
    sim = ee_sim
    mn = red.tree_min_cc(sim.cc, sim.tree, sim.i_electron_energy)
    assert mn >= 0.0
    # the energy-loss restriction (dt_limits[3], "other") must be active
    assert sim.dt_limits[3] < 1e99
    assert "e_energy" in sim.chem.species_list
