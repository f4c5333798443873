"""Chemistry engine tests: parser grammar, rates, derivatives.

Validates against the reference's shipped chemistry datasets
(``programs/standard_2d/tests/air_chemistry_v1.txt``) and hand-computed
cases (SURVEY.md section 7.2 step 3).
"""

import os

import numpy as np
import pytest

from afivo_streamer_tpu.utils.config import CFG
from afivo_streamer_tpu.utils.table_data import TableDataSettings
from afivo_streamer_tpu.physics.gas import Gas
from afivo_streamer_tpu.physics.transport_data import (TransportData,
                                                       TD_MOBILITY, TD_ALPHA)
from afivo_streamer_tpu.physics.chemistry import (Chemistry, to_simple_ascii,
                                                  IONIZATION_REACTION,
                                                  ATTACHMENT_REACTION)
from afivo_streamer_tpu import constants as uc

AIR_V1 = "/root/reference/programs/standard_2d/tests/air_chemistry_v1.txt"
SIGLO = "/root/reference/programs/standard_1d/tests/td_air_siglo_swarm.txt"


def make_setup(td_file, old_style):
    cfg = CFG()
    cfg._store_raw("input_data%file", td_file)
    if old_style:
        cfg._store_raw("input_data%old_style", "T")
    ts = TableDataSettings(cfg)
    gas = Gas(cfg)
    td = TransportData(cfg, gas, ts)
    return cfg, ts, gas, td


def test_to_simple_ascii():
    assert to_simple_ascii("e") == ("e", -1)
    assert to_simple_ascii("N2+") == ("N2_plus", 1)
    assert to_simple_ascii("O2-") == ("O2_min", -1)
    assert to_simple_ascii("N2(C3)") == ("N2_C3", 0)
    assert to_simple_ascii("O(1D)") == ("O_1D", 0)
    assert to_simple_ascii("N^2D") == ("N_hat2D", 0)


@pytest.mark.skipif(not os.path.exists(AIR_V1), reason="no reference data")
def test_air_chemistry_v1():
    cfg, ts, gas, td = make_setup(AIR_V1, False)
    chem = Chemistry(gas, td, AIR_V1, ts, cfg=cfg)
    assert chem.species_list[:3] == ["e", "N2_plus", "O2_plus"]
    assert chem.n_reactions == 25
    # first three reactions are ionization, then two attachments
    assert all(chem.reaction_types[:3] == IONIZATION_REACTION)
    assert all(chem.reaction_types[3:5] == ATTACHMENT_REACTION)
    # breakdown field of air should be around 100-130 Td
    bf = chem.get_breakdown_field_td(1e3)
    assert 80 < bf < 150
    # rate factor of 'e + O2 + O2 -> O2-' includes the O2 density twice
    r = chem.reactions[3]
    assert np.isclose(r.rate_factor, (0.2 * gas.number_density) ** 2)
    # 'O2- + M -> e' detachment: factor N
    r = chem.reactions[5]
    assert np.isclose(r.rate_factor, gas.number_density)


@pytest.mark.skipif(not os.path.exists(SIGLO), reason="no reference data")
def test_standard_model_from_old_style():
    cfg, ts, gas, td = make_setup(SIGLO, True)
    chem = Chemistry(gas, td, SIGLO, ts, cfg=cfg)
    # fallback model: e, M+, M-
    assert chem.species_list == ["e", "M_plus", "M_min"]
    assert chem.species_charge == [-1, 1, -1]
    assert chem.n_reactions == 2
    # ionization rate k = alpha * mu * E (converted via Townsend); compare
    # exactly on a table grid point (between points the table interpolates
    # the product, not the product of interpolants)
    fld = np.array([td.tbl.x[500]])
    rates = chem.get_rates(fld)
    alpha = td.tbl.rows_cols[500, TD_ALPHA]
    mu = td.tbl.rows_cols[500, TD_MOBILITY]
    k_ion = alpha * mu * fld * uc.Townsend_to_SI * gas.number_density
    assert np.allclose(rates[:, 0], k_ion, rtol=1e-10)


def test_derivatives_hand_case(tmp_path):
    """A -> B with constant rate k; check derivs = +-k*n_A."""
    p = tmp_path / "chem.txt"
    p.write_text("""\
reaction_list
-----------------------
A+ + B- -> C,c1,2.0
-----------------------
""")
    if not os.path.exists(SIGLO):
        pytest.skip("needs transport file")
    ts = TableDataSettings(CFG())
    gas = Gas()
    # use siglo transport but custom reactions
    cfg2 = CFG()
    cfg2._store_raw("input_data%file", SIGLO)
    cfg2._store_raw("input_data%old_style", "T")
    td = TransportData(cfg2, gas, TableDataSettings(cfg2))
    chem = Chemistry(gas, td, str(p), ts)
    assert chem.species_list == ["A_plus", "B_min", "C"]
    dens = np.array([[3.0, 5.0, 0.0]])
    rates = chem.get_rates(np.array([100.0]))
    full, derivs = chem.get_derivatives(dens, rates)
    assert np.isclose(full[0, 0], 2.0 * 3.0 * 5.0)
    assert np.allclose(derivs[0], [-30.0, -30.0, 30.0])


def test_group_substitution(tmp_path):
    p = tmp_path / "chem.txt"
    p.write_text("""\
reaction_list
-----------------------
@x = A, B
e + @x+ -> @x,c1,1.0
-----------------------
""")
    cfg2 = CFG()
    cfg2._store_raw("input_data%file", SIGLO)
    cfg2._store_raw("input_data%old_style", "T")
    if not os.path.exists(SIGLO):
        pytest.skip("needs transport file")
    gas = Gas()
    td = TransportData(cfg2, gas, TableDataSettings(cfg2))
    chem = Chemistry(gas, td, str(p), TableDataSettings(CFG()))
    assert chem.n_reactions == 2
    assert chem.reactions[0].description.startswith("e + A+")
    assert chem.reactions[1].description.startswith("e + B+")
