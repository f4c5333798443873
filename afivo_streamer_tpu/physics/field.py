"""Electric field computation: Poisson solve + gradient.

Re-implements the reference's ``src/m_field.f90``: the space-charge
right-hand side (field_set_rhs ``:363-401``), voltage control with
rise/fall/pulse trains and tabulated time series (field_set_voltage
``:508-543``), the convergence-controlled multigrid solve (field_compute
``:405-485``: initial FMG loop with stagnation detection, then V-cycles
against a residual threshold scaled by max|rhs| and a roundoff estimate),
the field from the potential (field_from_potential ``:488-505``), and the
built-in boundary conditions (homogeneous / neumann / all_neumann,
``:547-608``).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from .. import constants as uc
from ..core import spatial as sp
from ..core import ghostcell as gc
from ..solvers.multigrid import Multigrid, blocks, scatter_interior
from ..solvers.lsf import LsfData
from ..utils import geometry
from ..utils.lookup_table import lin_interp_list
from ..utils.table_data import table_from_file


def _xp(a):
    return np if isinstance(a, np.ndarray) else jnp


class FieldSolver:
    SCALAR_VOLTAGE = 1
    TABULATED_VOLTAGE = 2

    def __init__(self, cfg, tree, settings, registry, i_phi, i_rhs, i_tmp,
                 i_electric_fld, fc_E, charged_species_cc, charged_sign):
        self.tree = tree
        self.st = settings
        self.i_phi, self.i_rhs, self.i_tmp = i_phi, i_rhs, i_tmp
        self.i_electric_fld = i_electric_fld
        self.fc_E = fc_E
        self.charged_species_cc = list(charged_species_cc)
        self.charged_sign = np.asarray(charged_sign, np.float64)
        self.registry = registry
        ndim = tree.ndim

        # ------------------------------------------------ voltage control
        self.field_rise_time = cfg.add_get(
            "field_rise_time", 0.0, "Linear rise time of field (s)")
        self.field_pulse_width = cfg.add_get(
            "field_pulse_width", uc.huge_real,
            "Pulse width excluding rise and fall time (s)")
        self.field_num_pulses = cfg.add_get(
            "field_num_pulses", 1, "Number of voltage pulses (default: 1)")
        self.field_pulse_period = cfg.add_get(
            "field_pulse_period", uc.huge_real,
            "Time of one complete voltage pulse (s)")
        field_amplitude = cfg.add_get(
            "field_amplitude", uc.undefined_real,
            "The (initial) vertical applied electric field (V/m)")
        given_by = cfg.add_get("field_given_by", "undefined",
                               "How the electric field or voltage is specified")
        domain_len = settings.domain_len[ndim - 1]
        self.field_table = None
        if given_by != "undefined":
            kind, _, value = given_by.partition(" ")
            value = value.strip()
            if kind == "voltage":
                self.given_by = self.SCALAR_VOLTAGE
                self.field_voltage = float(value)
            elif kind == "field":
                self.given_by = self.SCALAR_VOLTAGE
                self.field_voltage = -domain_len * float(value)
            elif kind == "voltage_table":
                self.given_by = self.TABULATED_VOLTAGE
                tt, tv = table_from_file(value, "voltage_vs_time")
                self.field_table = (tt, tv)
            elif kind == "field_table":
                self.given_by = self.TABULATED_VOLTAGE
                tt, tv = table_from_file(value, "field_vs_time")
                self.field_table = (tt, -domain_len * tv)
            else:
                raise ValueError(f"Unknown field_given_by value: {given_by}")
        elif field_amplitude > uc.undefined_real:
            self.given_by = self.SCALAR_VOLTAGE
            self.field_voltage = -domain_len * field_amplitude
        else:
            raise ValueError("field_amplitude not specified")

        self.bc_type = cfg.add_get("field_bc_type", "homogeneous",
                                   "Boundary condition for electric potential")
        self.field_amplitude = field_amplitude
        self.current_voltage = 0.0
        self.user_potential_bc = None
        #: callable(time) -> field amplitude; overrides the voltage control
        #: (user_field_amplitude, m_field.f90:515-519)
        self.user_field_amplitude = None
        self.user_lsf_bc = None
        self.surfaces = None   # wired by the driver when use_dielectric
        self.i_surf_dens = 1   # photon flux = 0, charge = 1 (+ copies)
        self.i_surf_sigma_cc = -1  # cc row of sigma (compiled engine)
        self.i_eps = -1

        # ------------------------------------------- electrode geometry
        # (field_initialize electrode settings, m_field.f90:197-345)
        self.lsf_data = None
        self.i_lsf = -1
        self.electrode_grounded = cfg.add_get(
            "field_electrode_grounded", False,
            "Whether electrode 1 is grounded or at the applied voltage")
        self.electrode2_grounded = cfg.add_get(
            "field_electrode2_grounded", False,
            "Whether electrode 2 is grounded or at the applied voltage")
        rod_r0 = cfg.add_get("field_rod_r0", [-1.0e100] * ndim,
                             "Electrode 1: first relative coordinate",
                             dynamic=True)
        rod_r1 = cfg.add_get("field_rod_r1", [-1.0e100] * ndim,
                             "Electrode 1: second relative coordinate",
                             dynamic=True)
        rod2_r0 = cfg.add_get("field_rod2_r0", [-1.0e100] * ndim,
                              "Electrode 2: first relative coordinate",
                              dynamic=True)
        rod2_r1 = cfg.add_get("field_rod2_r1", [-1.0e100] * ndim,
                              "Electrode 2: second relative coordinate",
                              dynamic=True)
        self.rod_radius = cfg.add_get("field_rod_radius", -1.0e100,
                                      "Electrode 1 radius (in m)")
        self.rod2_radius = cfg.add_get("field_rod2_radius", -1.0e100,
                                       "Electrode 2 radius (in m)")
        self.electrode_type = cfg.add_get(
            "field_electrode_type", "rod",
            "Type of electrode (sphere, rod, rod_cone_top, rod_rod, "
            "two_rod_cone_electrodes, user)")
        if settings.use_electrode:
            dl, o = settings.domain_len, settings.domain_origin
            r0 = o + np.asarray([float(x) for x in rod_r0]) * dl
            r1 = o + np.asarray([float(x) for x in rod_r1]) * dl
            r20 = o + np.asarray([float(x) for x in rod2_r0]) * dl
            r21 = o + np.asarray([float(x) for x in rod2_r1]) * dl
            rr, rr2 = self.rod_radius, self.rod2_radius
            et = self.electrode_type
            if et == "sphere":
                def lsf_fn(r):
                    return np.linalg.norm(r - r0, axis=-1) - rr
            elif et == "rod":
                def lsf_fn(r):
                    return geometry.dist_line(r, r0, r1) - rr
            elif et == "rod_rod":
                def lsf_fn(r):
                    return np.minimum(geometry.dist_line(r, r0, r1) - rr,
                                      geometry.dist_line(r, r20, r21) - rr2)
            elif et in ("rod_cone_top", "two_rod_cone_electrodes"):
                # rod with a conical top ending in a spherical tip
                # (conical_rod_lsf + get_conical_rod_properties,
                # m_field.f90:633-700)
                tip_r = cfg.add_get(
                    "cone_tip_radius", -1.0e100,
                    "Radius of curvature of the conical electrode tip")
                clf = cfg.add_get(
                    "cone_length_frac", -1.0e100,
                    "Fraction of the rod length that is conical")
                if tip_r <= 0 or tip_r > rr:
                    raise ValueError(
                        "cone_tip_radius should be smaller than rod radius")
                if clf < 0 or clf > 1:
                    raise ValueError("cone_length_frac not set correctly")

                def conical_props(a0, a1, rad, tipr):
                    cone_length = clf * np.linalg.norm(a1 - a0)
                    cone_angle = np.arctan((rad - tipr) / cone_length)
                    r_curv = tipr / np.cos(cone_angle)
                    ctr = a1 - (np.sin(cone_angle) * r_curv
                                * (a1 - a0) / np.linalg.norm(a1 - a0))
                    return ctr, r_curv

                def conical_lsf(r, a0, a1, rad, tipr, lfrac):
                    ctr, r_curv = conical_props(a0, a1, rad, tipr)
                    dist_vec, frac = geometry.dist_vec_line(r, a0, a1)
                    dist = np.linalg.norm(dist_vec, axis=-1)
                    tmp = (1.0 - frac) / lfrac
                    radius_at_h = tipr + tmp * (rad - tipr)
                    tip_d = np.linalg.norm(r - ctr, axis=-1) - r_curv
                    return np.where(
                        frac <= 1 - lfrac, dist - rad,
                        np.where(frac < 1.0, dist - radius_at_h, tip_d))

                if et == "rod_cone_top":
                    def lsf_fn(r):
                        return conical_lsf(r, r0, r1, rr, tip_r, clf)
                else:
                    tip_r2 = cfg.add_get(
                        "cone2_tip_radius", -1.0e100,
                        "Radius of curvature of the second conical tip")
                    clf2 = cfg.add_get(
                        "cone2_length_frac", -1.0e100,
                        "Fraction of the second rod that is conical")
                    if tip_r2 <= 0 or tip_r2 > rr2:
                        raise ValueError("cone2_tip_radius incorrect")
                    if clf2 < 0 or clf2 > 1:
                        raise ValueError("cone2_length_frac incorrect")

                    def lsf_fn(r):
                        return np.minimum(
                            conical_lsf(r, r0, r1, rr, tip_r, clf),
                            conical_lsf(r, r20, r21, rr2, tip_r2, clf2))
            elif et == "user":
                lsf_fn = None  # wired later via set_user_lsf
            else:
                raise ValueError(f"Invalid electrode type {et}")
            if rr <= 0:
                raise ValueError(
                    "set field_rod_radius to the electrode length scale")

            g1 = 0.0 if self.electrode_grounded else 1.0
            g2 = 0.0 if self.electrode2_grounded else 1.0
            if et in ("rod_rod", "two_rod_cone_electrodes"):
                # electrode-dependent potential (rod_rod_get_potential /
                # two_conical_rods_get_potential)
                def bc_coeff_fn(r):
                    lsf1 = geometry.dist_line(r, r0, r1) - rr
                    lsf2 = geometry.dist_line(r, r20, r21) - rr2
                    return np.where(lsf1 < lsf2, g1, g2)
            else:
                def bc_coeff_fn(r):
                    return np.full(r.shape[:-1], g1)
            if lsf_fn is not None:
                self.lsf_data = LsfData(tree, lsf_fn,
                                        length_scale=rr,
                                        boundary_coeff_fn=bc_coeff_fn)
            self._lsf_fn = lsf_fn
            self._default_bc_coeff_fn = bc_coeff_fn

        # multigrid for phi
        self.mg = Multigrid(tree, i_phi, i_rhs, i_tmp, self.phi_bc,
                            lsf_data=self.lsf_data)

    def set_user_lsf(self, lsf_fn, lsf_bc_fn=None):
        """Wire a user-supplied electrode geometry (field_electrode_type =
        user, m_field.f90:323-333). lsf_fn(r[...,ndim]) -> level set;
        lsf_bc_fn(r) -> boundary potential (overrides the grounded /
        at-voltage coefficient; the solve then uses lsf_phi_b = 1)."""
        if lsf_fn is None:
            raise ValueError("user electrode type requires user.lsf")
        self.user_lsf_bc = lsf_bc_fn
        coeff_fn = (lsf_bc_fn if lsf_bc_fn is not None
                    else self._default_bc_coeff_fn)
        self.lsf_data = LsfData(self.tree, lsf_fn,
                                length_scale=self.rod_radius,
                                boundary_coeff_fn=coeff_fn)
        self._lsf_fn = lsf_fn
        self.mg.lsf_data = self.lsf_data

    # ------------------------------------------------- boundary conditions
    def phi_bc(self, iv, d, coords, params):
        """Potential BC (field_bc_homogeneous / _neumann / _all_neumann)."""
        ndim = self.tree.ndim
        voltage = params.get("voltage", 0.0)
        if self.user_potential_bc is not None:
            return self.user_potential_bc(iv, d, coords, params)
        if self.bc_type == "homogeneous":
            if d // 2 == ndim - 1:
                if d % 2 == 0:
                    return gc.BC_DIRICHLET, 0.0
                return gc.BC_DIRICHLET, voltage
            return gc.BC_NEUMANN, 0.0
        if self.bc_type == "neumann":
            if d // 2 == ndim - 1:
                if d % 2 == 0:
                    return gc.BC_DIRICHLET, 0.0
                # float(): a np.float64 length would strong-type the BC
                # value and widen a traced f32 ghost fill to f64
                return gc.BC_NEUMANN, voltage / float(
                    self.st.domain_len[ndim - 1])
            return gc.BC_NEUMANN, 0.0
        if self.bc_type == "all_neumann":
            return gc.BC_NEUMANN, 0.0
        raise ValueError(f"invalid field_bc_type {self.bc_type}")

    # -------------------------------------------------------- voltage
    def set_voltage(self, time: float) -> float:
        """Set current_voltage (field_set_voltage, ``m_field.f90:508-543``)."""
        if self.user_field_amplitude is not None:
            amp = self.user_field_amplitude(time)
            self.current_voltage = float(
                -self.st.domain_len[self.tree.ndim - 1] * amp)
            return self.current_voltage
        if self.given_by == self.TABULATED_VOLTAGE:
            tt, tv = self.field_table
            self.current_voltage = float(lin_interp_list(tt, tv, time))
            return self.current_voltage
        v = 0.0
        if time < self.field_pulse_period * self.field_num_pulses:
            t = np.mod(time, self.field_pulse_period)
            if t < self.field_rise_time:
                v = self.field_voltage * (t / self.field_rise_time)
            elif t < self.field_pulse_width + self.field_rise_time:
                v = self.field_voltage
            else:
                tmp = t - (self.field_pulse_width + self.field_rise_time)
                v = self.field_voltage * max(
                    0.0, 1.0 - tmp / self.field_rise_time)
        self.current_voltage = float(v)
        return self.current_voltage

    # ------------------------------------------------------------- rhs
    def set_rhs(self, cc, s_in: int):
        """rhs = -sum(q_s n_s) e / eps0 (field_set_rhs)."""
        t = self.tree
        xp = _xp(cc)
        fac = -uc.elem_charge / uc.eps0
        ids_per_lvl = [sp.aix(self.mg._tb(l).ids)
                       for l in range(1, self.mg._n_levels() + 1)]
        allids = (np.concatenate(ids_per_lvl)
                  if isinstance(ids_per_lvl[0], np.ndarray)
                  else jnp.concatenate([jnp.asarray(i)
                                        for i in ids_per_lvl]))
        acc = 0.0
        for s_cc, q in zip(self.charged_species_cc, self.charged_sign):
            # float(): a np.float64 scalar would promote a traced f32
            # state to emulated f64
            acc = acc + (float(q) * fac) * cc[s_cc + s_in, allids]
        if isinstance(cc, np.ndarray):
            cc[self.i_rhs, allids] = acc
        else:
            cc = cc.at[self.i_rhs, jnp.asarray(allids)].set(acc)
        if self.surfaces is not None:
            # the reference always deposits the base-state surface charge
            # (field_set_rhs, m_field.f90:398-400)
            if isinstance(cc, np.ndarray):
                cc = self.surfaces.charge_to_rhs(
                    cc, self.i_surf_dens, self.i_rhs,
                    -uc.elem_charge / uc.eps0)
            else:
                from ..solvers import surface as sf
                cc = sf.pack_charge_to_rhs(
                    cc, self.mg._pack_surf, self.i_surf_sigma_cc,
                    self.i_rhs, -uc.elem_charge / uc.eps0)
        return cc

    # ------------------------------------------------------------ solve
    def compute(self, cc, fc, s_in: int, time: float, have_guess: bool,
                params: Optional[dict] = None):
        """field_compute (``m_field.f90:405-485``)."""
        t = self.tree
        xp = _xp(cc)
        compiled_one_shot = (not isinstance(cc, np.ndarray)
                             and getattr(self.mg, "_jit_cfg", None)
                             is not None and have_guess)
        if compiled_one_shot:
            # single-dispatch path: rhs/threshold/while(vcycle)/E in one
            # compiled unit (see jit_field_solve)
            self.set_voltage(time)
            params = dict(params or {})
            params["voltage"] = self.current_voltage
            if self.lsf_data is not None:
                params["lsf_phi_b"] = (
                    1.0 if getattr(self, "user_lsf_bc", None) is not None
                    else self.current_voltage)
            cc, fc, _res = self.jit_field_solve(cc, fc, s_in, params)
            return cc, fc
        if not isinstance(cc, np.ndarray) and \
                getattr(self.mg, "_jit_cfg", None) is not None:
            cc = self.jit_set_rhs(cc, s_in)
        else:
            cc = self.set_rhs(cc, s_in)
        self.set_voltage(time)
        params = dict(params or {})
        params["voltage"] = self.current_voltage
        if self.lsf_data is not None:
            # boundary potential on the electrode; grounded rods have a zero
            # per-cell coefficient (mg_lsf_boundary_value); a user boundary
            # function supplies the potential directly
            params["lsf_phi_b"] = (
                1.0 if getattr(self, "user_lsf_bc", None) is not None
                else self.current_voltage)

        compiled = not isinstance(cc, np.ndarray) and \
            getattr(self.mg, "_jit_cfg", None) is not None
        if compiled:
            max_rhs = float(self.mg.jit_max_abs_leaves(cc, self.i_rhs))
        else:
            leaves = np.concatenate([np.asarray(l) for l in t.lvl_leaves])
            interior = sp.interior_flat(t.ndim, t.nc)
            max_rhs = float(np.max(np.abs(np.asarray(
                cc[self.i_rhs, leaves[:, None], interior[None, :]]))))
        conv_fac = 1e-8 if self.st.use_electrode else 1e-10
        min_dr = float(t.lvl_dr(t.highest_lvl).min())
        residual_threshold = max(
            1e-6,
            max_rhs * self.st.multigrid_max_rel_residual,
            conv_fac * abs(self.current_voltage)
            / (self.st.domain_len[t.ndim - 1] * min_dr))

        if not have_guess:
            residuals = []
            for it in range(100):
                # the reference always passes have_guess=.true. here
                # (field_compute, m_field.f90:448-450)
                if compiled:
                    cc, res = self.mg.jit_fmg_res(cc, params)
                    res = float(res)
                else:
                    cc = self.mg.fas_fmg(cc, params, set_residual=True,
                                         have_guess=True)
                    res = float(self.mg.max_abs_residual(
                        cc, phi_b=params.get("lsf_phi_b", 0.0)))
                residuals.append(res)
                if res < residual_threshold:
                    break
                if it >= 2:
                    lo = min(residuals[-3:])
                    hi = max(residuals[-3:])
                    ratio = lo / hi if hi > 0 else 0.0
                    if 0.5 < ratio < 2.0 and res < 1e8:
                        break
            else:
                raise RuntimeError(
                    f"No convergence in initial field computation: "
                    f"{residuals}")

        for _ in range(self.st.multigrid_num_vcycles):
            if compiled:
                cc, res = self.mg.jit_vcycle_res(cc, params)
                res = float(res)
            else:
                cc = self.mg.fas_vcycle(cc, params, set_residual=True)
                res = float(self.mg.max_abs_residual(
                        cc, phi_b=params.get("lsf_phi_b", 0.0)))
            if res < residual_threshold:
                break

        if compiled:
            cc, fc = self.jit_from_potential(cc, fc, params)
        else:
            cc, fc = self.from_potential(cc, fc, params)
        return cc, fc

    def jit_from_potential(self, cc, fc, params):
        """Compiled from_potential (gradient + norm + ghost fill)."""
        def body(cc, scal, fc):
            return self.from_potential(cc, fc, scal)
        return self.mg._run_unit("from_potential", body, cc, params, fc)

    def voltage_traced(self, time):
        """Traced voltage(time) for the fused compiled step
        (field_set_voltage, ``m_field.f90:508-543``): the pulse-train and
        tabulated forms as jnp scalar math, bit-identical in f64 to
        set_voltage above. A user-supplied amplitude function is host-only
        (the driver falls back to the per-unit compiled path)."""
        import jax.numpy as jnp
        if self.user_field_amplitude is not None:
            raise ValueError("user field amplitude cannot be traced")
        time = jnp.asarray(time, jnp.float64)
        if self.given_by == self.TABULATED_VOLTAGE:
            tt, tv = self.field_table
            # lin_interp_list is clamped np.interp; jnp.interp matches
            return jnp.interp(time, jnp.asarray(tt, jnp.float64),
                              jnp.asarray(tv, jnp.float64))
        v = float(self.field_voltage)
        # TPU emulates f64 as a double-f32 pair: the reference's 1e100
        # "no pulsing" sentinels exceed the representable range (-> inf,
        # and mod(t, inf) -> NaN -> voltage 0). Clamp to 1e30 s, which
        # is identical in behavior for any physical time scale.
        period = min(float(self.field_pulse_period), 1e30)
        rise = float(self.field_rise_time)
        width = min(float(self.field_pulse_width), 1e30)
        t = jnp.mod(time, period)
        if rise > 0.0:
            tmp = t - (width + rise)
            val = jnp.where(
                t < rise, v * (t / rise),
                jnp.where(t < width + rise, v,
                          v * jnp.maximum(0.0, 1.0 - tmp / rise)))
        else:
            # rise_time 0: the host path's 1 - tmp/0 underflows to -inf
            # and the max() clamps it to 0 beyond the pulse width
            val = jnp.where(t < width, v, 0.0)
        end_t = min(period * float(self.field_num_pulses), 1e30)
        return jnp.where(time < end_t, val, 0.0)

    def lsf_phi_b_traced(self, voltage):
        """Traced electrode boundary potential (see compute above)."""
        if self.lsf_data is None:
            return 0.0
        if getattr(self, "user_lsf_bc", None) is not None:
            return 1.0
        return voltage

    def jit_field_solve(self, cc, fc, s_in: int, params):
        """The whole convergence-controlled solve as ONE compiled unit:
        rhs assembly, residual threshold, ``lax.while_loop`` over
        V-cycles, and E from the potential (field_compute,
        ``m_field.f90:405-485``).

        A single dispatch matters: the epoch pack has hundreds of pytree
        leaves and per-call flattening plus the per-V-cycle host residual
        sync dominate when the solve is split into many units (~80 ms of
        overhead per solve measured on TPU at 18k cells)."""
        def body(cc, scal, fc):
            return self._solve_body(cc, fc, scal, s_in)
        return self.mg._run_unit(f"field_solve_{s_in}", body, cc, params,
                                 fc)

    def _solve_body(self, cc, fc, scal, s_in: int):
        """Traced body of the one-dispatch field solve; the ambient packs
        (mg._pack/_pack_ops/...) must be set by the caller — either
        _run_unit (jit_field_solve) or the fused production step
        (driver._jit_full_step)."""
        import jax
        from ..solvers.multigrid import blocks
        mg = self.mg
        st = self.st
        conv_fac = 1e-8 if st.use_electrode else 1e-10
        max_v = int(st.multigrid_num_vcycles)
        rel = float(st.multigrid_max_rel_residual)
        dlen = float(st.domain_len[self.tree.ndim - 1])
        nc, ndim = self.tree.nc, self.tree.ndim

        import jax.numpy as jnp
        cc = self.set_rhs(cc, s_in)
        # masked max |rhs| over the leaves of all levels
        tbs = [mg._tb(l) for l in range(1, mg._n_levels() + 1)]
        tbs = [t for t in tbs if len(t.leaves)]
        leaves = jnp.concatenate([jnp.asarray(sp.aix(t.leaves))
                                  for t in tbs])
        valid = jnp.concatenate([jnp.asarray(t.leaf_valid)
                                 for t in tbs])
        B = blocks(cc, self.i_rhs, leaves, nc, ndim)
        B = B[(slice(None),) + (slice(1, nc + 1),) * ndim]
        B = jnp.where(valid.reshape((-1,) + (1,) * ndim) > 0,
                      jnp.abs(B), 0.0)
        max_rhs = jnp.max(B)
        min_dr = float(np.min(self.tree.lvl_dr(self.tree.highest_lvl)))
        voltage = jnp.abs(jnp.asarray(scal.get("voltage", 0.0))
                          .astype(cc.dtype))
        thr = jnp.maximum(
            jnp.asarray(1e-6, cc.dtype),
            jnp.maximum(max_rhs * rel,
                        (conv_fac / (dlen * min_dr)) * voltage))
        phi_b = scal.get("lsf_phi_b", 0.0)

        from ..solvers import mg_blocks as mgb
        if mgb.blocks_path_active(mg, cc):
            # local-block fast path: the whole convergence-controlled
            # solve runs on per-level block arrays; cc is read once
            # (gather) and written once (scatter) — see mg_blocks.py
            import os
            interp = os.environ.get("AFIVO_PALLAS", "") == "interpret"
            P, R = mgb.gather_levels(mg, cc)

            def bcond(state):
                _, _, res, k = state
                return jnp.logical_and(k < max_v, res >= thr)

            def bbody(state):
                P, R, _, k = state
                P, R = mgb.fas_vcycle_blocks(mg, P, R, scal, interp)
                res = mgb.max_leaf_residual_blocks(mg, P, R)
                return (P, R, res.astype(cc.dtype), k + 1)

            P, R, res, _ = jax.lax.while_loop(
                bcond, bbody,
                (P, R, jnp.asarray(jnp.inf, cc.dtype),
                 jnp.asarray(0, jnp.int32)))
            cc = mgb.scatter_phi(mg, cc, P)
            cc, fc = self.from_potential(cc, fc, scal)
            return cc, fc, res

        def cond(state):
            _, res, k = state
            return jnp.logical_and(k < max_v, res >= thr)

        def wbody(state):
            c, _, k = state
            if mg.lsf_data is None and mg.eps_data is None:
                c = mg.fas_vcycle(c, scal, set_residual=False)
                c, res = mg.residual_all_levels(c, phi_b)
            else:
                c = mg.fas_vcycle(c, scal, set_residual=True)
                res = mg.max_abs_residual(c, phi_b=phi_b)
            return (c, res.astype(cc.dtype), k + 1)

        cc, res, _ = jax.lax.while_loop(
            cond, wbody,
            (cc, jnp.asarray(jnp.inf, cc.dtype),
             jnp.asarray(0, jnp.int32)))
        cc, fc = self.from_potential(cc, fc, scal)
        return cc, fc, res

    def jit_set_rhs(self, cc, s_in: int):
        """Compiled set_rhs (one unit per temporal state index)."""
        def body(cc, scal):
            return self.set_rhs(cc, s_in)
        return self.mg._run_unit(f"set_rhs_{s_in}", body, cc, None)

    def from_potential(self, cc, fc, params):
        """E = -grad phi; cell norm; ghost fill of the norm
        (field_from_potential)."""
        fc = self.mg.compute_phi_gradient(cc, fc, self.fc_E, -1.0)
        if self.lsf_data is not None:
            fc = self._lsf_gradient_correction(cc, fc, params)
        if self.surfaces is not None:
            if isinstance(cc, np.ndarray):
                fc = self.surfaces.correct_field_fc(
                    cc, fc, self.i_surf_dens, self.fc_E, self.i_phi,
                    uc.elem_charge / uc.eps0)
            else:
                from ..solvers import surface as sf
                cc, fc = sf.pack_correct_field_fc(
                    cc, fc, self.mg._pack_surf, self.i_surf_sigma_cc,
                    self.fc_E, self.i_phi, uc.elem_charge / uc.eps0)
        cc = self.mg.compute_field_norm(cc, fc, self.fc_E,
                                        self.i_electric_fld)
        # gc for the norm: neumann-zero bc + unlimited interpolation rb
        for lvl in range(1, self.mg._n_levels() + 1):
            plan = self.mg._gc_plan(lvl)
            cc = gc.fill_ghosts_lvl(
                cc, plan, [self.i_electric_fld], gc.RB_INTERP,
                lambda iv, d, coords, p: (gc.BC_NEUMANN, 0.0), params)
        return cc, fc

    def compute_energy(self, cc, fc) -> float:
        """Total field energy 0.5 eps0 E^2 dV (field_compute_energy)."""
        t = self.tree
        nc, ndim = t.nc, t.ndim
        total = 0.0
        interior = sp.interior_flat(ndim, nc)
        for lvl in range(1, t.highest_lvl + 1):
            leaves = np.asarray(t.lvl_leaves[lvl - 1])
            if len(leaves) == 0:
                continue
            dr = t.lvl_dr(lvl)
            Ecc = cc[self.i_electric_fld, leaves[:, None], interior[None, :]]
            if t.coord == "cyl":
                r0 = t.box_r_min(leaves)[:, 0]
                i = np.arange(1, nc + 1)
                r_cc = r0[:, None] + (i[None, :] - 0.5) * dr[0]
                vol = (2.0 * np.pi * r_cc * np.prod(dr))
                vol = np.repeat(vol[:, :, None], nc, 2).reshape(len(leaves), -1)
            else:
                vol = float(np.prod(dr))
            total = total + float(np.sum(np.asarray(Ecc) ** 2 * vol))
        return 0.5 * uc.eps0 * total


    def _lsf_gradient_correction(self, cc, fc, params):
        """Correct E at faces adjacent to the electrode boundary
        (mg_box_lpllsf_gradient, ``m_af_multigrid.f90:2030-2122``):
        one-sided gradients over the boundary distance toward the electrode
        potential, applied on leaf boxes containing the boundary."""
        t = self.tree
        nc, ndim = t.nc, t.ndim
        xp = _xp(fc)
        fac = -1.0
        phi_b_scalar = params.get("lsf_phi_b", 0.0)
        interior = sp.interior_flat(ndim, nc)
        pack_extras = getattr(self.mg, "_pack_extras", None)
        n_levels = (self.mg._n_levels() if pack_extras is not None
                    else t.highest_lvl)
        for lvl in range(1, n_levels + 1):
            if pack_extras is not None:
                # compiled path: the per-epoch boundary tables are runtime
                # jit arguments (multigrid._build_level_extras) — baking
                # them in as constants would go stale across epochs
                ex = pack_extras[lvl - 1]["lsf"]
                if ex is None or len(ex["boxes"]) == 0:
                    continue
                boxes, dd_t, lsf_t, bcc_t = (ex["boxes"], ex["dd"],
                                             ex["lsf_cc"], ex["bc_coeff"])
            else:
                data = self.lsf_data.level_data(lvl)
                ids = data["ids"]
                leaf_set = set(int(b) for b in t.lvl_leaves[lvl - 1])
                sel = np.array([i for i, b in enumerate(ids)
                                if data["has_bnd"][i]
                                and int(b) in leaf_set], dtype=np.int64)
                if len(sel) == 0:
                    continue
                boxes = ids[sel]
                dd_t, lsf_t, bcc_t = (data["dd"][sel], data["lsf_cc"][sel],
                                      data["bc_coeff"][sel])
            n = len(boxes)
            dr = t.lvl_dr(lvl)
            cshape = (n,) + (nc,) * ndim
            dd = dd_t.reshape(cshape + (2 * ndim,))
            lsf_cc = lsf_t.reshape(cshape)
            bc_val = bcc_t.reshape(cshape) * phi_b_scalar
            phi = cc[self.i_phi, boxes[:, None],
                     interior[None, :]].reshape(cshape)
            for d in range(ndim):
                faxes = [np.arange(0, nc + 1) if k == d else np.arange(0, nc)
                         for k in range(ndim)]
                fidx = sp.fc_flat(ndim, nc, *faxes)
                fshape = (n,) + tuple(nc + 1 if k == d else nc
                                      for k in range(ndim))
                F = fc[self.fc_E, d, boxes[:, None],
                       fidx[None, :]].reshape(fshape)
                inv_dr = float(fac) / float(dr[d])
                m_lo = (dd[..., 2 * d] < 1) & (lsf_cc >= 0)
                m_hi = (dd[..., 2 * d + 1] < 1) & (lsf_cc >= 0)
                v_lo = inv_dr * (phi - bc_val) / xp.maximum(dd[..., 2 * d],
                                                            1e-100)
                v_hi = inv_dr * (bc_val - phi) / xp.maximum(
                    dd[..., 2 * d + 1], 1e-100)
                lo_slc = tuple(slice(0, nc) if k == d else slice(None)
                               for k in range(ndim))
                hi_slc = tuple(slice(1, nc + 1) if k == d else slice(None)
                               for k in range(ndim))
                if isinstance(fc, np.ndarray):
                    Fl = F[(slice(None),) + lo_slc]
                    F[(slice(None),) + lo_slc] = np.where(m_lo, v_lo, Fl)
                    Fh = F[(slice(None),) + hi_slc]
                    F[(slice(None),) + hi_slc] = np.where(m_hi, v_hi, Fh)
                    fc[self.fc_E, d, boxes[:, None], fidx[None, :]] = \
                        F.reshape(n, -1)
                else:
                    Fl = F[(slice(None),) + lo_slc]
                    F = F.at[(slice(None),) + lo_slc].set(
                        xp.where(m_lo, v_lo, Fl))
                    Fh = F[(slice(None),) + hi_slc]
                    F = F.at[(slice(None),) + hi_slc].set(
                        xp.where(m_hi, v_hi, Fh))
                    fc = fc.at[self.fc_E, d, jnp.asarray(boxes)[:, None],
                               jnp.asarray(fidx)[None, :]].set(
                                   F.reshape(n, -1))
        return fc
