"""2D curved-tip cathode oracle (the electrode-parity investigation).

Round 4's 1D minimal case (`test_cathode_1d.py`) proved the flat-cathode
emission pipeline formula-exact and localized the open 2D neg-electrode
discrepancy (README) to geometry-dependent terms at the CURVED rod tip.
This oracle closes that loop: on a frozen test_2d_neg_electrode mesh it
hand-transcribes the reference's full 2D machinery and diffs every term
cell-by-cell against this implementation:

* the possible-root mask and the 4-direction boundary-distance matrix,
  including the golden-section bracket + bisection distance and the
  gradient-descent fallback for under-resolved electrodes
  (``get_possible_lsf_root_mask`` + ``store_lsf_distance_matrix``,
  ``/root/reference/afivo/src/m_af_multigrid.f90:954-1097``; ``gss`` /
  ``bisection`` / ``mg_lsf_dist_gss`` ``:1607-1758``),
* the generalized-Laplacian stencil with eliminated boundary couplings
  (``mg_box_lsf_stencil``, ``:1762-1834``),
* the one-sided electrode-face field over the boundary distances
  (``mg_box_lpllsf_gradient``, ``:2030-2122``) applied to the SAME
  potential,
* the discrete emission set — which (inside boundary cell, outside
  neighbor) pairs exist and the boundary-cell electron average
  (``electrode_species_bc``, ``/root/reference/src/streamer.f90:578-636``).

The Fortran toolchain is absent, so the oracle is the transcription of
the reference source, not a reference run. Every comparison prints its
max deviation so a term-level difference is named and quantified.
"""

import os

import numpy as np
import pytest

from afivo_streamer_tpu.driver import Simulation
from afivo_streamer_tpu.solvers.lsf import lsf_stencil_coefficients

REF2 = "/root/reference/programs/standard_2d/tests"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF2),
                                reason="no reference data")

SQRTEPS = np.sqrt(np.finfo(np.float64).eps)
MINSTEP = np.finfo(np.float64).eps
INVPHI = (np.sqrt(5.0) - 1) / 2
INVPHI2 = (3 - np.sqrt(5.0)) / 2
LSF_TOL = 1e-8            # mg%lsf_tol default (m_af_types.f90:613)
MIN_REL_DIST = 1e-4       # mg%lsf_min_rel_distance (:616)
SAFETY = 1.5              # mg%lsf_gradient_safety_factor (:607)


# ---------------------------------------------------------------------------
# reference transcriptions (scalar, straight from the Fortran)
# ---------------------------------------------------------------------------
def ref_grad(f, r):
    """numerical_gradient (m_af_multigrid.f90:2144-2170)."""
    step = np.maximum(MINSTEP, SQRTEPS * np.abs(r))
    g = np.zeros_like(r)
    for d in range(len(r)):
        rp = r.copy()
        rp[d] = r[d] + step[d]
        rm = r.copy()
        rm[d] = r[d] - step[d]
        g[d] = (f(rp[None])[0] - f(rm[None])[0]) / (2 * step[d])
    return g


def ref_bisection(f, a, b, tol=LSF_TOL, max_iter=100):
    """bisection (m_af_multigrid.f90:1666-1692)."""
    a, b = a.copy(), b.copy()
    for _ in range(max_iter):
        c = 0.5 * (a + b)
        fc = f(c[None])[0]
        if 0.5 * np.linalg.norm(b - a) < tol or abs(fc) <= 0:
            break
        if f(a[None])[0] * fc <= 0:
            b = c
        else:
            a = c
    return c


def ref_gss_bracket(f, in_a, in_b, minimization, tol):
    """gss(find_bracket=.true.) (m_af_multigrid.f90:1694-1758)."""
    a, b = in_a.copy(), in_b.copy()
    h = b - a
    if np.linalg.norm(h) <= tol:
        return a, b
    n = int(np.ceil(np.log(tol / np.linalg.norm(h)) / np.log(INVPHI)))
    c = a + INVPHI2 * h
    d = a + INVPHI * h
    ya = f(a[None])[0]
    yc = f(c[None])[0]
    yd = f(d[None])[0]
    for _ in range(n - 1):
        if (yc < yd) == minimization:
            b = d
            d = c
            yd = yc
            h = INVPHI * h
            c = a + INVPHI2 * h
            yc = f(c[None])[0]
        else:
            a = c
            c = d
            yc = yd
            h = INVPHI * h
            d = a + INVPHI * h
            yd = f(d[None])[0]
        if ya * yc <= 0 and ya * yd <= 0:
            break
    if (yc < yd) == minimization:
        return a, d
    return c, b


def ref_dist_gss(f, a, b):
    """mg_lsf_dist_gss (m_af_multigrid.f90:1629-1664)."""
    la = f(a[None])[0]
    lb = f(b[None])[0]
    if la * lb <= 0:
        root = ref_bisection(f, a, b)
    else:
        br0, br1 = ref_gss_bracket(f, a, b, minimization=(la >= 0),
                                   tol=LSF_TOL)
        b_new = br0 if f(br0[None])[0] * la <= 0 else br1
        if f(b_new[None])[0] * la > 0:
            return 1.0
        root = ref_bisection(f, a, b_new)
    dist = np.linalg.norm(root - a) / np.linalg.norm(b - a)
    return max(dist, MIN_REL_DIST)


def ref_distance_matrix(f, coords, lsf_cc, dr, length_scale):
    """store_lsf_distance_matrix for one box's interior cells
    (m_af_multigrid.f90:977-1097). coords: [C, 2]; returns dd [C, 4]
    (1 = no boundary) and the root mask."""
    C = len(coords)
    dmax = float(np.linalg.norm(dr))
    min_dr = float(min(dr))
    dd = np.ones((C, 4))
    root_mask = np.zeros(C, bool)
    for c in range(C):
        a = coords[c]
        g = ref_grad(f, a)
        root_mask[c] = abs(lsf_cc[c]) < dmax * np.linalg.norm(g) * SAFETY
        if not root_mask[c]:
            continue
        for d in range(4):
            dim, hi = d // 2, d % 2
            b = a.copy()
            b[dim] += dr[dim] if hi else -dr[dim]
            dd[c, d] = ref_dist_gss(f, a, b)
        # gradient-descent fallback (:1044-1072)
        if min_dr > length_scale and np.all(dd[c] >= 1):
            n_steps = int(np.ceil(min_dr / length_scale))
            step = np.sign(lsf_cc[c]) * length_scale
            x = a.copy()
            for _ in range(n_steps):
                g = ref_grad(f, x)
                g = g / max(np.linalg.norm(g), 1e-50)
                x = x - g * step
                if f(x[None])[0] * lsf_cc[c] <= 0:
                    break
            dist = ref_dist_gss(f, a, x)
            if dist < 1:
                dist = dist * np.linalg.norm(x - a) / min_dr
                dvec = x - a
                dim = int(np.argmax(np.abs(dvec)))
                nb = 2 * dim + (1 if dvec[dim] > 0 else 0)
                dd[c, nb] = dist
    return dd, root_mask


def ref_stencil(dd, dr):
    """mg_box_lsf_stencil (m_af_multigrid.f90:1762-1834), Cartesian 2D.
    Returns (c0, c_nb[4], f) per cell."""
    C = len(dd)
    v = np.zeros((C, 5))
    f = np.zeros(C)
    for d in range(4):
        dim = d // 2
        other = 2 * dim + (1 - d % 2)
        v[:, 1 + d] = 1.0 / (0.5 * dr[dim] ** 2
                             * (dd[:, 2 * dim] + dd[:, 2 * dim + 1])
                             * dd[:, d])
    v[:, 0] = -np.sum(v[:, 1:], axis=1)
    for d in range(4):
        bnd = dd[:, d] < 1.0
        f[bnd] -= v[bnd, 1 + d]
        v[bnd, 1 + d] = 0.0
    return v[:, 0], [v[:, 1 + d] for d in range(4)], f


# ---------------------------------------------------------------------------
# the frozen 2D neg-electrode mesh
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def sim2d(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("c2d") / "run")
    sim = Simulation(argv=[
        f"{REF2}/test_2d_neg_electrode.cfg", "-ndim=2",
        f"{''}-input_data%file={REF2}/td_air_siglo_swarm.txt",
        f"-output%name={out}",
        # coarser electrode refinement keeps the oracle mesh small while
        # the rod tip still spans ~5 cells per radius; frozen thereafter
        "-refine_electrode_dx=2e-4", "-refine_per_steps=1000000",
        "-photoi%enabled=f",
    ])
    return sim


def _boundary_levels(sim):
    """(lvl, data) for every level with boundary boxes."""
    t = sim.tree
    out = []
    for lvl in range(1, t.highest_lvl + 1):
        data = sim.field.lsf_data.level_data(lvl)
        if data["has_bnd"].any():
            out.append((lvl, data))
    return out


def _cell_coords(t, ids, lvl):
    nc = t.nc
    dr = t.lvl_dr(lvl)
    r0 = t.box_r_min(np.asarray(ids))
    ax = np.arange(nc) + 0.5
    mesh = np.stack(np.meshgrid(ax, ax, indexing="ij"), -1)  # [nc,nc,2]
    return r0[:, None, :] + mesh.reshape(-1, 2)[None] * dr  # [n, C, 2]


def test_distance_matrix_matches_reference(sim2d):
    """dd (4-direction boundary distances) and the root mask at every
    boundary box equal the transcription — including around the curved
    tip where the golden-section bracket path engages."""
    sim = sim2d
    t = sim.tree
    lsf = sim.field.lsf_data.lsf
    ls = sim.field.lsf_data.length_scale
    worst = 0.0
    n_checked = 0
    for lvl, data in _boundary_levels(sim):
        dr = t.lvl_dr(lvl)
        sel = np.nonzero(data["has_bnd"])[0]
        coords = _cell_coords(t, data["ids"][sel], lvl)
        for k in range(len(sel)):
            dd_ref, _mask = ref_distance_matrix(
                lsf, coords[k], data["lsf_cc"][sel[k]], dr, ls)
            dd_ours = data["dd"][sel[k]]
            # same boundary-face set
            assert ((dd_ref < 1) == (dd_ours < 1)).all(), (
                f"lvl {lvl} box {data['ids'][sel[k]]}: boundary-face set "
                f"differs: ref {np.argwhere(dd_ref < 1)} vs "
                f"ours {np.argwhere(dd_ours < 1)}")
            d = np.abs(dd_ref - dd_ours).max()
            worst = max(worst, d)
            n_checked += len(dd_ref)
    assert n_checked > 0
    # both sides locate roots to lsf_tol; distances are relative to dr
    print(f"\ndd oracle: {n_checked} cells checked, max |diff| = {worst:.3e}")
    assert worst < 5e-4, f"distance matrix differs by {worst}"


def test_lsf_stencil_matches_reference(sim2d):
    """The generalized-Laplacian stencil + eliminated-boundary rhs factor
    equal the transcription at every boundary box."""
    sim = sim2d
    t = sim.tree
    worst = 0.0
    for lvl, data in _boundary_levels(sim):
        dr = t.lvl_dr(lvl)
        c0, c_nb, f = lsf_stencil_coefficients(t, lvl, data, lam=0.0)
        sel = np.nonzero(data["has_bnd"])[0]
        for k in sel:
            r0, rnb, rf = ref_stencil(data["dd"][k], dr)
            scale = np.abs(r0).max()
            worst = max(worst, np.abs(r0 - c0[k]).max() / scale)
            for d in range(4):
                worst = max(worst, np.abs(rnb[d] - c_nb[d][k]).max() / scale)
            worst = max(worst, np.abs(rf - f[k]).max() / scale)
    print(f"\nstencil oracle: max rel |diff| = {worst:.3e}")
    assert worst < 1e-13


def test_face_field_matches_reference(sim2d):
    """The one-sided electrode-face E (over the boundary distances)
    equals the transcription applied to the SAME potential, at every
    corrected face of every LEAF boundary box. The reference's dispatch
    (mg_compute_phi_gradient, m_af_multigrid.f90:1838-1876) applies
    mg_box_lpllsf_gradient to CHILDLESS lsf boxes only; lsf boxes WITH
    children keep the plain central-difference gradient (its own @todo
    notes the coarse one-sided gradient is inconsistent) — parent boxes
    are checked against the central form below."""
    sim = sim2d
    t = sim.tree
    nc = t.nc
    sim.cc, sim.fc = sim.field.compute(sim.cc, sim.fc, 0, 0.0, True)
    worst = 0.0
    worst_parent = 0.0
    n_faces = 0
    n_parent_faces = 0
    for lvl, data in _boundary_levels(sim):
        dr = t.lvl_dr(lvl)
        sel = np.nonzero(data["has_bnd"])[0]
        leaf_set = set(int(x) for x in t.lvl_leaves[lvl - 1])
        for k in sel:
            b = int(data["ids"][k])
            if b not in leaf_set:
                # parent lsf box: plain central differences through the
                # electrode (mg_box_lpl_gradient), interior faces only
                phi = sim.cc[sim.i_phi, b].reshape(nc + 2, nc + 2)
                Er = sim.fc[sim.fc_E, 0, b].reshape(
                    nc + 1, nc + 1)[:, :nc]
                Ez = sim.fc[sim.fc_E, 1, b].reshape(
                    nc + 1, nc + 1)[:nc, :]
                want_r = -(phi[1:nc + 2, 1:nc + 1]
                           - phi[0:nc + 1, 1:nc + 1]) / dr[0]
                want_z = -(phi[1:nc + 1, 1:nc + 2]
                           - phi[1:nc + 1, 0:nc + 1]) / dr[1]
                scale = max(np.abs(want_r).max(), np.abs(want_z).max(),
                            1.0)
                worst_parent = max(
                    worst_parent,
                    np.abs(Er - want_r).max() / scale,
                    np.abs(Ez - want_z).max() / scale)
                n_parent_faces += want_r.size + want_z.size
                continue
            phi = sim.cc[sim.i_phi, b].reshape(nc + 2, nc + 2)
            lsf_b = data["lsf_cc"][k].reshape(nc, nc)
            dd = data["dd"][k].reshape(nc, nc, 4)
            bcv = 0.0  # grounded electrode (cfg: field_electrode_grounded)
            Er = sim.fc[sim.fc_E, 0, b].reshape(nc + 1, nc + 1)[:, :nc]
            Ez = sim.fc[sim.fc_E, 1, b].reshape(nc + 1, nc + 1)[:nc, :]
            for i in range(nc):
                for j in range(nc):
                    if not (dd[i, j] < 1).any() or lsf_b[i, j] < 0:
                        continue
                    p = phi[i + 1, j + 1]
                    # E = -grad(phi): the driver stores fac = -1
                    if dd[i, j, 0] < 1:
                        want = -(p - bcv) / (dd[i, j, 0] * dr[0])
                        worst = max(worst, abs(Er[i, j] - want)
                                    / max(abs(want), 1.0))
                        n_faces += 1
                    if dd[i, j, 1] < 1:
                        want = -(bcv - p) / (dd[i, j, 1] * dr[0])
                        worst = max(worst, abs(Er[i + 1, j] - want)
                                    / max(abs(want), 1.0))
                        n_faces += 1
                    if dd[i, j, 2] < 1:
                        want = -(p - bcv) / (dd[i, j, 2] * dr[1])
                        worst = max(worst, abs(Ez[i, j] - want)
                                    / max(abs(want), 1.0))
                        n_faces += 1
                    if dd[i, j, 3] < 1:
                        want = -(bcv - p) / (dd[i, j, 3] * dr[1])
                        worst = max(worst, abs(Ez[i, j + 1] - want)
                                    / max(abs(want), 1.0))
                        n_faces += 1
    print(f"\nface-field oracle: {n_faces} corrected leaf faces "
          f"(max rel |diff| = {worst:.3e}), {n_parent_faces} parent "
          f"central faces (max rel |diff| = {worst_parent:.3e})")
    assert n_faces > 0
    assert worst < 1e-12
    assert worst_parent < 1e-12


def test_emission_set_and_average_matches_reference(sim2d):
    """The discrete emission set — inside cells with >= 1 outside
    4-neighbor (including neighbors seen through ghost cells) — and the
    boundary-cell electron average equal the transcription
    (electrode_species_bc), level by level in the reference's loop
    order."""
    sim = sim2d
    t = sim.tree
    nc = t.nc
    i_e = sim.i_electron
    # a non-trivial electron field so the average is informative
    rng = np.random.default_rng(7)
    sim.cc[i_e] = np.abs(rng.normal(1e15, 1e14, sim.cc[i_e].shape))
    # ghost cells must be consistent before the box loop, as in the
    # production loop (restrict+gc ran in the previous step's epoch)
    sim.restrict_and_gc_densities()

    # transcription on a frozen copy, per level in order
    mirror = sim.cc.copy()
    expected = {}
    n_bnd_cells = 0
    for lvl, data in _boundary_levels(sim):
        sel = np.nonzero(data["has_bnd"])[0]
        for k in sel:
            b = int(data["ids"][k])
            lsf_blk = mirror[sim.i_lsf, b].reshape(nc + 2, nc + 2)
            ne_blk = mirror[i_e, b].reshape(nc + 2, nc + 2)
            for i in range(1, nc + 1):
                for j in range(1, nc + 1):
                    if lsf_blk[i, j] >= 0:
                        continue
                    lsf_nb = np.array([lsf_blk[i - 1, j], lsf_blk[i + 1, j],
                                       lsf_blk[i, j - 1], lsf_blk[i, j + 1]])
                    if (lsf_nb > 0).any():
                        dens_nb = np.array(
                            [ne_blk[i - 1, j], ne_blk[i + 1, j],
                             ne_blk[i, j - 1], ne_blk[i, j + 1]])
                        expected[(b, i, j)] = (dens_nb[lsf_nb > 0].mean())
                        n_bnd_cells += 1

    sim._set_electrode_densities()
    worst = 0.0
    for (b, i, j), want in expected.items():
        got = sim.cc[i_e, b].reshape(nc + 2, nc + 2)[i, j]
        worst = max(worst, abs(got - want) / max(abs(want), 1.0))
        # charge neutrality mirror
        ip = sim.cc[sim.i_1pos_ion, b].reshape(nc + 2, nc + 2)[i, j]
        assert ip == got
    print(f"\nemission oracle: {n_bnd_cells} boundary cells, "
          f"max rel |diff| = {worst:.3e}")
    assert n_bnd_cells > 0
    assert worst < 1e-13
