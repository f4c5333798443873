"""Time integration built from a generic forward-Euler substep.

Exact port of the temporal-state construction of the reference's
``afivo/src/m_af_advance.f90:121-214``: each scheme is a fixed sequence of
calls ``y(s_out) = sum(w_prev * y(s_prev)) + dt * f(y(s_deriv))`` on
variable copies indexed by temporal state. The substep function signature is

    substep(cc, fc, dt, dt_lim, time, s_deriv, s_prev, w_prev, s_out,
            i_step, n_steps, params) -> (cc, fc, dt_lim, diag)
"""

from __future__ import annotations

THIRD = 1.0 / 3.0
SIXTH = 1.0 / 6.0

#: scheme table: list of substeps
#: (dt_factor, time_offset_factor, s_deriv, s_prev, w_prev, s_out)
SCHEMES = {
    "forward_euler": [
        (1.0, 0.0, 0, [0], [1.0], 0)],
    "midpoint_method": [
        (0.5, 0.0, 0, [0], [1.0], 1),
        (1.0, 0.5, 1, [0], [1.0], 0)],
    "heuns_method": [
        (1.0, 0.0, 0, [0], [1.0], 1),
        (0.5, 1.0, 1, [0, 1], [0.5, 0.5], 0)],
    "ssprk33": [
        (1.0, 0.0, 0, [0], [1.0], 1),
        (0.25, 1.0, 1, [0, 1], [0.75, 0.25], 2),
        (2 * THIRD, 0.5, 2, [0, 2], [THIRD, 2 * THIRD], 0)],
    "ssprk43": [
        (0.5, 0.0, 0, [0], [1.0], 1),
        (0.5, 0.5, 1, [1], [1.0], 2),
        (SIXTH, 1.0, 2, [0, 2], [2 * THIRD, THIRD], 3),
        (0.5, 0.5, 3, [3], [1.0], 0)],
    "rk4": [
        (0.5, 0.0, 0, [0], [1.0], 1),
        (0.5, 0.5, 1, [0], [1.0], 2),
        (1.0, 0.5, 2, [0], [1.0], 3),
        (SIXTH, 1.0, 3, [0, 1, 2, 3],
         [-THIRD, THIRD, 2 * THIRD, THIRD], 0)],
}


def advance(cc, fc, dt: float, time: float, integrator: str, substep,
            params=None):
    """Advance over dt (af_advance). Returns (cc, fc, dt_lim, time+dt,
    diag of the last substep)."""
    if integrator not in SCHEMES:
        raise ValueError(f"time integrator {integrator} not supported")
    steps = SCHEMES[integrator]
    n_steps = len(steps)
    dt_lim = None
    diag = {}
    for i_step, (f, toff, s_deriv, s_prev, w_prev, s_out) in enumerate(steps):
        cc, fc, dt_lim, diag = substep(
            cc, fc, f * dt, dt_lim, time + toff * dt, s_deriv, s_prev,
            w_prev, s_out, i_step + 1, n_steps, params)
    return cc, fc, dt_lim, time + dt, diag
