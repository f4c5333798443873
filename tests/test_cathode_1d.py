"""1D cathode-sheath minimal case (the electrode-parity investigation).

The open cathode-emission discrepancy (README: test_2d_neg_electrode
peaks 74% off at the first output; matching the golden needs an
effective emission ~2.5-3x this implementation's) calls for a minimal
configuration where every term of the emission pipeline can be diffed
against HAND-COMPUTED formulas transcribed from the reference source —
a flat 1D cathode in a uniform field:

* the boundary-cell electron average (``electrode_species_bc``,
  ``/root/reference/src/streamer.f90:578-636``): inside cells zeroed,
  boundary cells set to the mean of outside face neighbors, first
  positive ion mirrored;
* the one-sided electrode-face field over the boundary distance
  (``mg_box_lpllsf_gradient``,
  ``/root/reference/afivo/src/m_af_multigrid.f90:2030-2122``);
* the emission-face flux: Koren-upwind reconstruction + drift/diffusion
  with face mobility from the mean of the cell-centered field norms
  (``flux_upwind``, ``/root/reference/src/m_fluid.f90:110-210``;
  ``af_limiter_koren``, ``m_af_limiters.f90``).

The Fortran toolchain is absent from this environment, so the oracle is
the transcription, not a reference run: agreement here proves the 1D
emission pipeline is formula-exact and localizes the remaining 2D
discrepancy to geometry-dependent terms (tip emission area / the
distance field at the curved tip), not the emission formulas.
"""

import os

import numpy as np
import pytest

from afivo_streamer_tpu import constants as uc
from afivo_streamer_tpu.driver import Simulation
from afivo_streamer_tpu.physics.transport_data import TD_MOBILITY, \
    TD_DIFFUSION

REF1 = "/root/reference/programs/standard_1d/tests"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF1),
                                reason="no reference data")


def koren_ref(a, b):
    """af_limiter_koren transcribed from m_af_limiters.f90 (elemental)."""
    aa, ab = a * a, a * b
    if ab <= 0:
        return 0.0
    if aa <= 0.25 * ab:
        return 2.0 * a
    if aa <= 2.5 * ab:
        return (b + 2.0 * a) / 3.0
    return 2.0 * b


def _setup(tmp_path):
    out = str(tmp_path / "c1d")
    sim = Simulation(argv=[
        f"{REF1}/test_1d.cfg", "-ndim=1",
        f"-input_data%file={REF1}/td_air_siglo_swarm.txt",
        f"-output%name={out}",
        # flat cathode: grounded rod occupying x < ~2.1 mm
        "-use_electrode=T", "-field_electrode_grounded=T",
        "-field_rod_r0=0.0", "-field_rod_r1=0.1",
        "-field_rod_radius=5e-4",
        "-field_amplitude=-2.5e6",
        "-refine_electrode_dx=1.0",       # no electrode-driven refinement
        "-refine_per_steps=1000000",
        "-background_density=1e15", "-seed_density=0",
        "-time_integrator=forward_euler",
        "-photoi%enabled=f",
    ])
    return sim


def test_cathode_1d_emission_pipeline(tmp_path):
    sim = _setup(tmp_path)
    t = sim.tree
    nc = t.nc
    i_e, i_ip = sim.i_electron, sim.i_1pos_ion
    i_lsf, i_phi = sim.i_lsf, sim.i_phi

    # flatten the composite grid: assume a frozen single-level-ish mesh;
    # work per box on the finest level containing the boundary
    lsf_data = sim.field.lsf_data
    assert lsf_data is not None
    lvl = t.highest_lvl
    data = lsf_data.level_data(lvl)
    sel = np.nonzero(data["has_bnd"])[0]
    assert len(sel) >= 1, "no box contains the electrode boundary"
    b = int(data["ids"][sel[0]])
    bpos = sel[0]

    # ---------------- 1. boundary-cell average (electrode_species_bc)
    cc0 = sim.cc.copy()
    sim._set_electrode_densities()
    lsf_b = sim.cc[i_lsf, b]               # [nc+2] incl. ghosts
    ne0 = cc0[i_e, b]
    inside = lsf_b[1:nc + 1] < 0
    for i in range(1, nc + 1):             # 1-based interior
        if not inside[i - 1]:
            continue
        nbs = [i - 1, i + 1]
        outs = [j for j in nbs if lsf_b[j] > 0]
        got_e = sim.cc[i_e, b, i]
        got_ip = sim.cc[i_ip, b, i]
        if outs:
            want = float(np.mean([ne0[j] for j in outs]))
            assert got_e == pytest.approx(want, rel=1e-13), \
                f"boundary-cell average differs at cell {i}"
            assert got_ip == pytest.approx(want, rel=1e-13)
        else:
            assert got_e == 0.0 and got_ip == 0.0

    # ---------------- 2. one-sided electrode-face field
    params = {"voltage": sim.field.current_voltage,
              "lsf_phi_b": sim.field.lsf_phi_b()
              if hasattr(sim.field, "lsf_phi_b")
              else sim.field.current_voltage}
    sim.cc, sim.fc = sim.field.compute(sim.cc, sim.fc, 0,
                                       sim.global_time, True)
    # geometry: lsf(x) = x - x0 near the surface (rod along -x)
    dr = float(t.lvl_dr(lvl)[0])
    r0 = t.box_r_min(np.asarray([b]))[0][0]
    # first gas cell in the box and its boundary distance
    i_gas = int(np.nonzero(~inside)[0][0]) + 1      # 1-based
    x_gas = r0 + (i_gas - 0.5) * dr
    lsf_gas = sim.cc[i_lsf, b, i_gas]
    assert lsf_gas > 0
    dd = lsf_gas / dr          # linear lsf: distance fraction to boundary
    assert 0.0 < dd <= 1.0
    phi_gas = sim.cc[i_phi, b, i_gas]
    phi_b = 0.0                # grounded electrode
    # one-sided gradient: E = -(phi_gas - phi_b) / (dd * dr) pointing +x
    # (mg_box_lpllsf_gradient: gradient over the boundary distance)
    E_face_want = -(phi_gas - phi_b) / (dd * dr)
    fcE = sim.fc[sim.fluid.idx.fc_E, 0, b]          # [nc+1] faces
    E_face_got = fcE[i_gas - 1]                     # low face of i_gas
    # tolerance: the boundary distance comes from the golden-section
    # root search (mg_lsf_dist_gss, as in the reference), whose root
    # tolerance puts ~4e-4 relative on dd even for a linear lsf
    assert E_face_got == pytest.approx(E_face_want, rel=1e-3), \
        "corrected emission-face field differs from the one-sided formula"

    # ---------------- 3. emission-face flux (Koren upwind + drift/diff)
    cc = sim.cc.copy()
    fc = sim.fc.copy()
    cc2, fc2, dt_cfl, dt_drt = sim.fluid.compute_fluxes(cc, fc, 0, params)
    # hand-compute the electron flux at the emission face:
    # u(face) via Koren from (.., n[i_gas-2], n[i_gas-1], n[i_gas], ..)
    ne = cc[i_e, b]            # post-bc densities incl. ghosts
    v_sign = -1.0              # electrons, charge sign -1: v = -mu E
    E_at_face = E_face_got
    # face mobility from the mean of cell-centered field norms
    # (flux_upwind: tmp_fc = 0.5 (E_cc(i-1) + E_cc(i)) Td)
    i_efld = sim.i_electric_fld
    fld_cc = sim.cc[i_efld, b]
    Td = (0.5 * (fld_cc[i_gas - 1] + fld_cc[i_gas])
          * uc.SI_to_Townsend * sim.fluid.gas.inverse_number_density)
    mu = float(sim.td.tbl.get_col(TD_MOBILITY, np.asarray([Td]))[0]) \
        * sim.fluid.gas.inverse_number_density
    dc = float(sim.td.tbl.get_col(TD_DIFFUSION, np.asarray([Td]))[0]) \
        * sim.fluid.gas.inverse_number_density
    v = -mu * E_at_face
    assert v > 0, "electrons must drift OUT of the cathode (emission)"
    # upwind side = the boundary cell (i_gas - 1); Koren reconstruction
    cL2, cL, cR = ne[i_gas - 2], ne[i_gas - 1], ne[i_gas]
    u_face = cL + 0.5 * koren_ref(cR - cL, cL - cL2)
    flux_want = v * u_face - dc / dr * (cR - cL)
    i_fe = sim.fluid.idx.flux_fc[0]
    flux_got = fc2[i_fe, 0, b, i_gas - 1]
    assert flux_got == pytest.approx(flux_want, rel=1e-12), (
        f"emission-face flux {flux_got:.6e} differs from the "
        f"hand-computed reference formula {flux_want:.6e}")

    # ---------------- 4. one full step runs and conserves sanity
    sim.run(max_steps=sim.it + 1)
    assert np.isfinite(np.asarray(sim.cc[i_e])).all()
