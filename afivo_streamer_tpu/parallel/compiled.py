"""Compiled (jit) execution of the full time step, single- and multi-chip.

The host/NumPy path of the framework is bit-identical in structure to the
traced path: every kernel is backend-polymorphic. This module builds the
jitted step for a *fixed topology epoch* (the index plans are baked in as
constants; a refinement epoch triggers a retrace, mirroring the reference's
design where the mesh changes only every ``refine_per_steps`` steps,
``streamer.f90:380-411``).

Multi-chip execution shards the box axis of the SoA state over a
``jax.sharding.Mesh`` (SURVEY.md section 7: the sharded axis over TPU
devices is the box batch; halo exchange and multigrid transfers become XLA
collectives over ICI). The parallelism replaces the reference's OpenMP
box-loop parallelism (``afivo/documentation/parallelization.md``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..physics import advance as adv


def make_field_fixed_vcycles(sim, n_vcycles: int = 2):
    """Field solve with a fixed number of V-cycles (no data-dependent exit),
    the jit-friendly variant of field_compute."""
    field = sim.field

    def field_fn(cc, fc, s_in, time, have_guess, params):
        cc = field.set_rhs(cc, s_in)
        if n_vcycles > 1:
            # scan: the V-cycle body is traced/compiled once
            def body(c, _):
                return field.mg.fas_vcycle(c, params), None
            cc, _ = jax.lax.scan(body, cc, None, length=n_vcycles)
        else:
            cc = field.mg.fas_vcycle(cc, params)
        cc, fc = field.from_potential(cc, fc, params)
        return cc, fc

    return field_fn


def make_step_fn(sim, n_vcycles: int = 2):
    """Build a jittable full time step: advance (all substeps of the
    configured integrator, with field solves between stages) + final field
    solve. Signature: step(cc, fc, dt, voltage) -> (cc, fc, dt_lim)."""
    field_fn = make_field_fixed_vcycles(sim, n_vcycles)
    integrator = sim.dt_cfg.integrator

    def substep(cc, fc, dt, dt_lim, time, s_deriv, s_prev, w_prev, s_out,
                i_step, n_steps, params):
        return sim.fluid.forward_euler(cc, fc, dt, dt_lim, time, s_deriv,
                                       s_prev, w_prev, s_out, i_step,
                                       n_steps, params,
                                       field_compute=field_fn)

    def step(cc, fc, dt, voltage):
        params = {"voltage": voltage}
        cc, fc, dt_lim, time_new, diag = adv.advance(
            cc, fc, dt, 0.0, integrator, substep, params)
        cc, fc = field_fn(cc, fc, 0, 0.0, True, params)
        return cc, fc, dt_lim

    return step


def shard_over_boxes(mesh, cc, fc):
    """Place the state on a device mesh, sharded over the box axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    cc_sh = NamedSharding(mesh, P(None, "boxes", None))
    fc_sh = NamedSharding(mesh, P(None, None, "boxes", None))
    return (jax.device_put(cc, cc_sh), jax.device_put(fc, fc_sh),
            cc_sh, fc_sh)


def pad_capacity_to(sim, multiple: int):
    """Pad the box capacity so the box axis divides the mesh size."""
    cap = sim.cc.shape[1]
    new_cap = ((cap + multiple - 1) // multiple) * multiple
    if new_cap != cap:
        cc = np.zeros((sim.cc.shape[0], new_cap, sim.cc.shape[2]))
        cc[:, :cap] = sim.cc
        sim.cc = cc
        fshape = list(sim.fc.shape)
        fshape[2] = new_cap
        fc = np.zeros(fshape)
        fc[:, :, :cap] = sim.fc
        sim.fc = fc
    return sim
