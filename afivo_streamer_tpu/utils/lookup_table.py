"""Regularly-spaced multi-column lookup tables, vectorized for the TPU.

Re-implements the semantics of the reference's vendored lookup_table_fortran
(``src/lookup_table_fortran/m_lookup_table.f90``): a 1D table with n_cols
columns on a regular x-grid with linear / quadratic / cubic x-spacing
(``m_lookup_table.f90:218-237``, table_set_x), clamped linear interpolation
(LT_get_loc, ``:330-362``), and column filling by linear interpolation of
irregular input data (LT_get_spaced_data, ``:240-254``).

On TPU the lookup is a fused gather + lerp over the whole cell batch, which
maps directly onto the VPU (SURVEY.md 7.1: "LT_get_col == jnp.take + lerp").
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

XSPACING_LINEAR = 1
XSPACING_QUADRATIC = 2
XSPACING_CUBIC = 3


def lin_interp_list(x_list, y_list, x):
    """Clamped linear interpolation on an irregular grid
    (LT_lin_interp_list, ``m_lookup_table.f90:163-186``)."""
    x_list = np.asarray(x_list, dtype=np.float64)
    y_list = np.asarray(y_list, dtype=np.float64)
    return np.interp(np.asarray(x, dtype=np.float64), x_list, y_list)


def _get_x(x_min: float, x_max: float, n_points: int, xspacing: int) -> np.ndarray:
    """x-coordinates of the table (get_x, ``m_lookup_table.f90:305-327``)."""
    t = np.arange(n_points, dtype=np.float64) / (n_points - 1)
    if xspacing == XSPACING_LINEAR:
        x = t
    elif xspacing == XSPACING_QUADRATIC:
        x = t**2
    elif xspacing == XSPACING_CUBIC:
        x = t**3
    else:
        raise ValueError("unknown xspacing")
    return x_min + x * (x_max - x_min)


class LookupTable:
    """Regular multi-column lookup table (LT_t)."""

    def __init__(self, x_min: float, x_max: float, n_points: int, n_cols: int,
                 xspacing: int = XSPACING_LINEAR, extrapolate_above: bool = False):
        if x_max <= x_min:
            raise ValueError("x_max should be > x_min")
        if n_points <= 1:
            raise ValueError("n_points should be > 1")
        self.n_points = n_points
        self.n_cols = n_cols
        self.x_min = float(x_min)
        self.x_max = float(x_max)
        self.xspacing = xspacing
        self.extrapolate_above = extrapolate_above
        # inverse x-spacing factor (table_set_x, m_lookup_table.f90:218-237)
        if xspacing == XSPACING_LINEAR:
            self.inv_fac = (n_points - 1) / (x_max - x_min)
        elif xspacing == XSPACING_QUADRATIC:
            self.inv_fac = (n_points - 1.0) ** 2 / (x_max - x_min)
        elif xspacing == XSPACING_CUBIC:
            self.inv_fac = (n_points - 1.0) ** 3 / (x_max - x_min)
        else:
            raise ValueError("unknown xspacing")
        self.x = _get_x(x_min, x_max, n_points, xspacing)
        # rows_cols[n_points, n_cols] in float64
        self.rows_cols = np.zeros((n_points, n_cols), dtype=np.float64)
        self._device_cols = None  # lazily-created jnp copy

    # ------------------------------------------------------------- filling
    def set_col(self, col_ix: int, x, y) -> None:
        """Fill a column by linearly interpolating (x, y) data
        (LT_set_col, ``m_lookup_table.f90:257-267``)."""
        self.rows_cols[:, col_ix] = lin_interp_list(x, y, self.x)
        self._device_cols = None

    def set_col_data(self, col_ix: int, y) -> None:
        y = np.asarray(y, dtype=np.float64)
        if y.shape != (self.n_points,):
            raise ValueError("size(y) /= number of rows")
        self.rows_cols[:, col_ix] = y
        self._device_cols = None

    # -------------------------------------------------------------- lookup
    def _loc(self, xp, x):
        """Return (low_ix, low_frac) as in LT_get_loc
        (``m_lookup_table.f90:330-362``). Works for numpy or jnp arrays."""
        frac = (x - float(self.x_min)) * float(self.inv_fac)
        if self.xspacing == XSPACING_QUADRATIC:
            frac = xp.where(frac > 0, xp.sqrt(xp.maximum(frac, 0.0)), frac)
        elif self.xspacing == XSPACING_CUBIC:
            frac = xp.where(frac > 0, xp.maximum(frac, 0.0) ** (1.0 / 3.0), frac)
        n = self.n_points
        low_ix = xp.clip(xp.ceil(frac), 1, n - 1).astype(xp.int32)
        low_frac = low_ix - frac
        low_frac = xp.where(frac <= 0, 1.0, low_frac)
        if self.extrapolate_above:
            hi_frac = (n - 1) - frac
        else:
            hi_frac = 0.0
        low_frac = xp.where(frac >= n - 1, hi_frac, low_frac)
        return low_ix, low_frac

    def get_col(self, col_ix: int, x):
        """Interpolate one column at (array of) x. Returns same array type.

        value = low_frac * v[low_ix-1] + (1-low_frac) * v[low_ix]
        (LT_get_col_at_loc; note Fortran 1-based low_ix).
        """
        if isinstance(x, jnp.ndarray) and not isinstance(x, np.ndarray):
            # match the query dtype (an f64 constant table would silently
            # promote the whole expression to emulated f64 on TPU)
            col = jnp.asarray(self.rows_cols[:, col_ix], x.dtype)
            low_ix, low_frac = self._loc(jnp, x)
            v0 = jnp.take(col, low_ix - 1)
            v1 = jnp.take(col, low_ix)
            return low_frac * v0 + (1.0 - low_frac) * v1
        x = np.asarray(x, dtype=np.float64)
        col = self.rows_cols[:, col_ix]
        low_ix, low_frac = self._loc(np, x)
        return low_frac * col[low_ix - 1] + (1.0 - low_frac) * col[low_ix]

    def get_cols(self, col_ixs, x):
        """Interpolate SEVERAL columns at the same x in one gather.

        The location (low_ix, low_frac) is shared; the per-column serial
        gathers of repeated get_col calls were a measured hot spot of the
        fused TPU step (transport lookups ~8 ms of a 15 ms flux substep
        at 18k cells — dozens of separate per-(level, direction, column)
        interpolation fusions). Returns a tuple of arrays, one per column
        index, matching get_col(col, x) exactly."""
        col_ixs = list(col_ixs)
        if isinstance(x, jnp.ndarray) and not isinstance(x, np.ndarray):
            sub = jnp.asarray(self.rows_cols[:, col_ixs], x.dtype)
            low_ix, low_frac = self._loc(jnp, x)
            v0 = jnp.take(sub, low_ix - 1, axis=0)   # [..., k]
            v1 = jnp.take(sub, low_ix, axis=0)
            out = (low_frac[..., None] * v0
                   + (1.0 - low_frac[..., None]) * v1)
            return tuple(out[..., i] for i in range(len(col_ixs)))
        x = np.asarray(x, dtype=np.float64)
        sub = self.rows_cols[:, col_ixs]
        low_ix, low_frac = self._loc(np, x)
        out = (low_frac[..., None] * sub[low_ix - 1]
               + (1.0 - low_frac[..., None]) * sub[low_ix])
        return tuple(out[..., i] for i in range(len(col_ixs)))

    def device_cols(self):
        # no caching: inside a trace jnp.asarray yields a jaxpr constant
        # (a tracer) that must not outlive the trace; XLA dedups the
        # embedded constant across uses anyway
        return jnp.asarray(self.rows_cols)

    def get_col_device(self, cols_rows_device, col_ix: int, x):
        """Lookup with an explicitly passed device copy of the table (so the
        table can be a traced argument of a jitted function)."""
        low_ix, low_frac = self._loc(jnp, x)
        col = cols_rows_device[:, col_ix]
        v0 = jnp.take(col, low_ix - 1)
        v1 = jnp.take(col, low_ix)
        return low_frac * v0 + (1.0 - low_frac) * v1
