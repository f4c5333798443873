"""Photoionization: Zheleznyak source + Helmholtz-approximation solver.

Re-implements the reference's ``src/m_photoi.f90`` (method switch, quench
factor p_q/(p+p_q), source = eta * quench * ionization rate,
photoionization_rate_from_alpha ``:233-265``, excited-species decay source
``:268-286``) and ``src/m_photoi_helmh.f90`` (multi-mode Helmholtz
nabla^2 phi_i - lambda_i^2 phi_i = f with Luque / Bourdon-2 / Bourdon-3 /
custom coefficient sets scaled by p*O2-fraction ``:80-139``; each mode
reuses the geometric multigrid with helmholtz_lambda = lambda_i^2 and runs
FMG cycles until the relative residual is below 1e-2 ``:162-204``).

The Monte-Carlo method lives in photoi_mc.py.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from .. import constants as uc
from ..core import spatial as sp
from ..core import ghostcell as gc
from ..core import reductions as red
from ..solvers.multigrid import Multigrid
from .transport_data import TD_ALPHA, TD_MOBILITY


def _xp(a):
    return np if isinstance(a, np.ndarray) else jnp


def helmh_bc(iv, d, coords, params, ndim=2):
    """Dirichlet zero in the last dimension, Neumann zero otherwise
    (photoi_helmh_bc)."""
    if d // 2 == ndim - 1:
        return gc.BC_DIRICHLET, 0.0
    return gc.BC_NEUMANN, 0.0


class Photoionization:
    def __init__(self, cfg, tree, registry, gas, transport, chemistry,
                 settings, i_rhs, i_tmp, i_electron, i_electric_fld):
        self.tree = tree
        self.gas = gas
        self.td = transport
        self.chem = chemistry
        self.st = settings
        self.i_rhs, self.i_tmp = i_rhs, i_tmp
        self.i_electron = i_electron
        self.i_electric_fld = i_electric_fld

        self.enabled = cfg.add_get("photoi%enabled", False,
                                   "Whether photoionization is enabled")
        self.per_steps = cfg.add_get(
            "photoi%per_steps", 5, "Update photoionization every N time steps")
        self.method = cfg.add_get(
            "photoi%method", "helmholtz",
            "Which photoionization method to use (helmholtz, montecarlo)")
        self.eta = cfg.add_get(
            "photoi%eta", 0.05,
            "Photoionization efficiency factor, typically around 0.05-0.1")
        self.quenching_pressure = cfg.add_get(
            "photoi%quenching_pressure", 40e-3,
            "Photoionization quenching pressure (bar)")
        # like the reference, the photoemission switch is exposed but the
        # surface photoemission runs through the Monte-Carlo photons + the
        # dielectric module (m_photoi.f90:18-19, 90-93)
        self.photoe_enabled = cfg.add_get(
            "photoe%enabled", False, "Whether photoemission is enabled")
        self.photoe_per_steps = cfg.add_get(
            "photoe%per_steps", 10,
            "Update photoemission every N time step")
        self.source_type = cfg.add_get(
            "photoi%source_type", "Zheleznyak",
            "How to compute the photoi. source (Zheleznyak, from_species)")
        self.excited_species = cfg.add_get(
            "photoi%excited_species", "UNDEFINED",
            "Which excited species to use when source_type = from_species")
        self.species = cfg.add_get(
            "photoi%species", "O2_plus",
            "Which species is ionized by photoionization")
        self.photoemission_time = cfg.add_get(
            "photoi%photoemission_time", 0.0,
            "Photoemission time delay for source_type = from_species")

        self.author = cfg.add_get(
            "photoi_helmh%author", "Bourdon-3",
            "Can be Bourdon-3 (default), Bourdon-2, Luque or custom")
        lam = cfg.add_get("photoi_helmh%lambdas", [],
                          "Lambdas to use in Helmholtz eq; unit 1/(m bar)",
                          dynamic=True)
        co = cfg.add_get("photoi_helmh%coeffs", [],
                         "Weights corresponding to the lambdas; "
                         "unit 1/(m bar)^2", dynamic=True)
        self.max_rel_residual = cfg.add_get(
            "photoi_helmh%max_rel_residual", 1.0e-2,
            "Maximum residual for Helmholtz solver, relative to max(|rhs|)")

        self.i_photo = -1
        self.species_cc = -1
        self.i_excited_cc = -1
        self.mc = None
        if not self.enabled:
            return
        if not (0.0 < self.eta <= 1.0):
            raise ValueError("photoi%eta out of range")

        six = chemistry.species_index(self.species)
        if six < 0:
            raise ValueError(f"photoi%species not present: {self.species}")
        self.species_index = six

        self.i_photo = registry.add_cc("photo")
        registry.set_cc_methods(
            self.i_photo,
            lambda iv, d, c, p: helmh_bc(iv, d, c, p, tree.ndim),
            rb=gc.RB_INTERP, prolong="linear")

        if self.method == "montecarlo":
            from .photoi_mc import PhotoiMC
            self.mc = PhotoiMC(cfg, tree, gas, settings,
                               rng_seed=abs(settings.rng_seed[0]) + 1)
            self.n_modes = 0
            self.i_modes = []
            self.mgs = []
            return

        # Helmholtz coefficient sets (photoi_helmh_initialize :80-139)
        ix = gas.index("O2")
        frac_O2 = gas.fractions[ix] if ix >= 0 else 0.0
        p = gas.pressure
        if self.author == "Luque":
            if frac_O2 <= 0:
                raise ValueError("Photoionization: no oxygen present")
            lambdas = np.array([4425.38, 750.06]) * (frac_O2 / 0.2) * p
            coeffs = np.array([337557.38, 19972.14]) * ((frac_O2 / 0.2) * p)**2
            if abs(self.eta - 1.0) > 0:
                raise ValueError("With Luque photoionization, photoi%eta "
                                 "should be 1.0")
        elif self.author == "Bourdon-2":
            if frac_O2 <= 0:
                raise ValueError("Photoionization: no oxygen present")
            lambdas = np.array([7305.62, 44081.25]) * frac_O2 * p
            coeffs = np.array([11814508.38, 998607256.0]) * (frac_O2 * p)**2
        elif self.author == "Bourdon-3":
            if frac_O2 <= 0:
                raise ValueError("Photoionization: no oxygen present")
            lambdas = np.array([4147.85, 10950.93, 66755.67]) * frac_O2 * p
            coeffs = np.array([1117314.935, 28692377.5, 2748842283.0]) \
                * (frac_O2 * p)**2
        elif self.author == "custom":
            lambdas = np.array([float(x) for x in lam]) * p
            coeffs = np.array([float(x) for x in co]) * p**2
            if len(lambdas) < 1:
                raise ValueError("Custom photoionization lambdas missing")
        else:
            raise ValueError(f"Unknown photoi_helmh author {self.author}")
        self.lambdas = lambdas
        self.coeffs = coeffs
        self.n_modes = len(lambdas)

        # one multigrid solver + mode variable per lambda
        self.i_modes = []
        self.mgs: List[Multigrid] = []
        for n in range(self.n_modes):
            iv = registry.add_cc(f"helmh_{n+1}", write_out=False)
            registry.set_cc_methods(
                iv, lambda i, d, c, pp: helmh_bc(i, d, c, pp, tree.ndim),
                rb=gc.RB_MG, prolong="linear")
            self.i_modes.append(iv)
            self.mgs.append(Multigrid(
                tree, iv, i_rhs, i_tmp,
                lambda i, d, c, pp: helmh_bc(i, d, c, pp, tree.ndim),
                helmholtz_lambda=float(lambdas[n] ** 2)))

    # -------------------------------------------------- compiled engine
    def enable_jit(self, pad: bool = True, trash: int = 0) -> bool:
        """Route set_src through jitted units (the per-mode Helmholtz
        solves reuse the compiled multigrid machinery with lambda^2 —
        m_photoi_helmh.f90:148-159 does exactly this with mg_t). Returns
        False when this photoi configuration has no compiled path (MC)."""
        if not self.enabled:
            return True
        if self.method != "helmholtz":
            return False
        for mg in self.mgs:
            mg.enable_jit(pad=pad, trash=trash)
        return True

    def jit_set_src(self, cc, dt, params):
        """photoi_set_src through the compiled engine as ONE dispatch:
        source assembly + max|rhs| + every mode's convergence-controlled
        Helmholtz solve (lax.while_loop over FMG cycles) in a single
        jitted unit — no host round-trip of the state and no per-mode
        dispatch latency over a remote TPU link (m_photoi.f90:140-187,
        m_photoi_helmh.f90:162-204)."""
        import jax
        import jax.numpy as jnp
        from contextlib import ExitStack
        from ..solvers.multigrid import ambient_packs
        packs = [mg._pack_and_ops(dtype=cc.dtype) for mg in self.mgs]
        scal = {k: v for k, v in (params or {}).items()
                if k in ("voltage", "lsf_phi_b") and np.ndim(v) == 0}
        cache = self.__dict__.setdefault("_jit_src_cache", {})
        key = str(cc.dtype)
        if key not in cache:
            pad, trash = self.mgs[0]._jit_cfg
            phself = self

            def traced(cc, scal, dt_, packs):
                with ExitStack() as st:
                    for mg, (pack, aux) in zip(phself.mgs, packs):
                        st.enter_context(ambient_packs(mg, pack, aux))
                    if pad:
                        cc = cc.at[:, trash].set(0.0)
                    return phself._set_src_body(cc, scal, dt_)

            cache[key] = jax.jit(traced)
        return cache[key](cc, scal, jnp.asarray(float(dt or 0.0)), packs)

    def _set_src_body(self, cc, scal, dt_):
        """Traced body of the one-dispatch photoi source update; the
        ambient packs of every mode's multigrid must be installed by the
        caller — jit_set_src above or the fused refinement-epoch epilogue
        (driver._jit_epoch_epilogue)."""
        import jax
        import jax.numpy as jnp
        from ..solvers.multigrid import blocks
        t = self.tree
        nc, ndim = t.nc, t.ndim
        quench_fac = float(self.quenching_pressure
                           / (self.gas.pressure + self.quenching_pressure))
        mg0 = self.mgs[0]

        def src_body(cc, scal, dt_):
            tbs = [mg0._tb(l) for l in range(1, mg0._n_levels() + 1)]
            tbs = [tb for tb in tbs if len(tb.leaves)]
            leaves = jnp.concatenate([jnp.asarray(sp.aix(tb.leaves))
                                      for tb in tbs])
            valid = jnp.concatenate([jnp.asarray(tb.leaf_valid)
                                     for tb in tbs])
            interior = sp.interior_flat(ndim, nc)
            # zero photo everywhere (all ids incl. parents)
            ids = jnp.concatenate([jnp.asarray(sp.aix(tb.ids))
                                   for tb in tbs])
            cc = cc.at[self.i_photo, ids].set(0.0)
            if self.source_type == "Zheleznyak":
                coeff = self.eta * quench_fac
                fld = cc[self.i_electric_fld, leaves[:, None],
                         interior[None, :]]
                td_ = (fld * uc.SI_to_Townsend
                       * self.gas.inverse_number_density)
                alpha = self.td.tbl.get_col(TD_ALPHA, td_)
                mob = self.td.tbl.get_col(TD_MOBILITY, td_)
                ne = cc[self.i_electron, leaves[:, None], interior[None, :]]
                src = jnp.maximum(fld * mob * alpha * ne * coeff, 0.0)
                cc = cc.at[self.i_rhs, leaves[:, None],
                           interior[None, :]].set(src)
            else:  # from_species (excited-species decay, :268-286)
                eff = self.photoemission_time
                dt_ = jnp.asarray(dt_).astype(cc.dtype)
                decay_fraction = 1.0 - jnp.exp(-dt_ / eff)
                decay_rate = jnp.where(dt_ > 1e-6 * eff,
                                       decay_fraction / jnp.maximum(
                                           dt_, 1e-30),
                                       1.0 / eff)
                i_exc = self.i_excited_cc
                exc = cc[i_exc, leaves[:, None], interior[None, :]]
                cc = cc.at[self.i_rhs, leaves[:, None],
                           interior[None, :]].set(
                               quench_fac * decay_rate * exc)
                cc = cc.at[i_exc, leaves[:, None], interior[None, :]].set(
                    (1.0 - decay_fraction) * exc)
            B = blocks(cc, self.i_rhs, leaves, nc, ndim)
            B = B[(slice(None),) + (slice(1, nc + 1),) * ndim]
            B = jnp.where(valid.reshape((-1,) + (1,) * ndim) > 0,
                          jnp.abs(B), 0.0)
            max_rhs = jnp.maximum(jnp.max(B),
                                  np.sqrt(np.finfo(np.float32).eps)
                                  if cc.dtype == jnp.float32
                                  else np.sqrt(np.finfo(np.float64).eps))
            return cc, max_rhs

        pad, trash = mg0._jit_cfg
        cc, max_rhs = src_body(cc, scal, dt_)

        rel = float(self.max_rel_residual)
        for n in range(self.n_modes):
            mg = self.mgs[n]
            coeff_n = float(self.coeffs[n])

            def mode_body(cc, scal, max_rhs, mg=mg, coeff_n=coeff_n):
                # re-zero the trash row per mode (the former per-mode
                # _run_unit dispatches did this before every body)
                if pad:
                    cc = cc.at[:, trash].set(0.0)

                def cond(state):
                    _, res, k = state
                    return jnp.logical_and(k < 10, res / max_rhs >= rel)

                def wbody(state):
                    c, _, k = state
                    c = mg.fas_fmg(c, scal, set_residual=False,
                                   have_guess=True)
                    c, res = mg.residual_all_levels(c, 0.0)
                    return (c, res.astype(cc.dtype), k + 1)

                cc, _, _ = jax.lax.while_loop(
                    cond, wbody,
                    (cc, jnp.asarray(jnp.inf, cc.dtype),
                     jnp.asarray(0, jnp.int32)))
                # photo -= c_n * phi_n on all cells of the leaf rows
                tbs = [mg._tb(l) for l in range(1, mg._n_levels() + 1)]
                tbs = [tb for tb in tbs if len(tb.leaves)]
                leaves = jnp.concatenate([jnp.asarray(sp.aix(tb.leaves))
                                          for tb in tbs])
                upd = (cc[self.i_photo, leaves]
                       - coeff_n * cc[mg.i_phi, leaves])
                return cc.at[self.i_photo, leaves].set(upd)

            cc = mode_body(cc, scal, max_rhs)
        return cc

    # ------------------------------------------------------------ source
    def set_src(self, cc, dt: Optional[float] = None, params=None):
        """photoi_set_src (``m_photoi.f90:140-187``)."""
        if not self.enabled:
            return cc
        t = self.tree
        xp = _xp(cc)
        nc, ndim = t.nc, t.ndim
        quench_fac = (self.quenching_pressure
                      / (self.gas.pressure + self.quenching_pressure))
        interior = sp.interior_flat(ndim, nc)
        params = params or {}

        if self.source_type == "Zheleznyak":
            coeff = self.eta * quench_fac
            for lvl in range(1, t.highest_lvl + 1):
                leaves = np.asarray(t.lvl_leaves[lvl - 1])
                if len(leaves) == 0:
                    continue
                fld = cc[self.i_electric_fld, leaves[:, None],
                         interior[None, :]]
                td_ = fld * uc.SI_to_Townsend * self.gas.inverse_number_density
                alpha = self.td.tbl.get_col(TD_ALPHA, td_)
                mob = self.td.tbl.get_col(TD_MOBILITY, td_)
                ne = cc[self.i_electron, leaves[:, None], interior[None, :]]
                src = xp.maximum(fld * mob * alpha * ne * coeff, 0.0)
                if isinstance(cc, np.ndarray):
                    cc[self.i_rhs, leaves[:, None], interior[None, :]] = src
                else:
                    cc = cc.at[self.i_rhs, jnp.asarray(leaves)[:, None],
                               jnp.asarray(interior)[None, :]].set(src)
        elif self.source_type == "from_species":
            eff = self.photoemission_time
            decay_fraction = 1.0 - np.exp(-dt / eff)
            decay_rate = (decay_fraction / dt if dt > 1e-6 * eff
                          else 1.0 / eff)
            i_exc = self.i_excited_cc
            for lvl in range(1, t.highest_lvl + 1):
                leaves = np.asarray(t.lvl_leaves[lvl - 1])
                if len(leaves) == 0:
                    continue
                exc = cc[i_exc, leaves[:, None], interior[None, :]]
                src = quench_fac * decay_rate * exc
                if isinstance(cc, np.ndarray):
                    cc[self.i_rhs, leaves[:, None], interior[None, :]] = src
                    cc[i_exc, leaves[:, None], interior[None, :]] = \
                        (1 - decay_fraction) * exc
                else:
                    cc = cc.at[self.i_rhs, jnp.asarray(leaves)[:, None],
                               jnp.asarray(interior)[None, :]].set(src)
                    cc = cc.at[i_exc, jnp.asarray(leaves)[:, None],
                               jnp.asarray(interior)[None, :]].set(
                                   (1 - decay_fraction) * exc)
        else:
            raise ValueError("Unknown photoi%source_type")

        if self.method == "helmholtz":
            cc = self._helmh_compute(cc, params)
        else:
            from .photoi_mc import phmc_set_src
            cc = phmc_set_src(self, cc, dt, params)
        return cc

    def _helmh_compute(self, cc, params):
        """photoi_helmh_compute (``m_photoi_helmh.f90:162-204``)."""
        t = self.tree
        allids = np.concatenate([np.asarray(i) for i in t.lvl_ids])
        if isinstance(cc, np.ndarray):
            cc[self.i_photo, allids] = 0.0
        else:
            cc = cc.at[self.i_photo, jnp.asarray(allids)].set(0.0)
        max_rhs = max(red.tree_maxabs_cc(cc, t, self.i_rhs)
                      if isinstance(cc, np.ndarray) else 1.0,
                      np.sqrt(np.finfo(np.float64).eps))
        for n in range(self.n_modes):
            mg = self.mgs[n]
            if isinstance(cc, np.ndarray):
                for _ in range(10):
                    cc = mg.fas_fmg(cc, params, set_residual=True,
                                    have_guess=True)
                    residu = float(mg.max_abs_residual(cc))
                    if residu / max_rhs < self.max_rel_residual:
                        break
            else:
                # fixed two FMG cycles in traced mode
                for _ in range(2):
                    cc = mg.fas_fmg(cc, params, have_guess=True)
            # photo -= c_n * phi_n on leaves (incl. ghost cells)
            leaves = np.concatenate([np.asarray(l) for l in t.lvl_leaves])
            upd = cc[self.i_photo, leaves] - self.coeffs[n] * \
                cc[self.i_modes[n], leaves]
            if isinstance(cc, np.ndarray):
                cc[self.i_photo, leaves] = upd
            else:
                cc = cc.at[self.i_photo, jnp.asarray(leaves)].set(upd)
        return cc
