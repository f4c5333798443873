"""Device-side SoA storage for the box batch.

The analog of the reference's per-box allocatable arrays
(``afivo/src/m_af_types.f90:286-322``): all cell-centered data lives in one
float64 array ``cc[n_var, cap, (nc+2)^ndim]`` (one ghost layer included,
spatial dims flattened) and face-centered data in
``fc[n_fc, ndim, cap, (nc+1)^ndim]``. Box ids are stable across refinement
epochs, so rows persist; capacity grows geometrically.

This flat SoA layout is what makes every tree pass a single batched XLA op,
and it is the natural layout for sharding the box axis over a TPU device
mesh (SURVEY.md section 7.1).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .tree import Tree


def _round_capacity(n: int) -> int:
    """Bucketed capacity to limit recompilation: next multiple of 64."""
    return max(64, ((n + 63) // 64) * 64)


class BoxBatch:
    def __init__(self, tree: Tree, n_var: int, n_fc: int,
                 dtype=jnp.float64):
        self.tree = tree
        self.ndim, self.nc = tree.ndim, tree.nc
        self.n_var, self.n_fc = n_var, n_fc
        self.dtype = dtype
        self.S = (tree.nc + 2) ** tree.ndim
        self.Sf = (tree.nc + 1) ** tree.ndim
        cap = _round_capacity(tree.highest_id)
        self.cap = cap
        self.cc = jnp.zeros((n_var, cap, self.S), dtype=dtype)
        self.fc = jnp.zeros((n_fc, tree.ndim, cap, self.Sf), dtype=dtype)

    def ensure_capacity(self) -> None:
        """Grow arrays after refinement added boxes."""
        need = _round_capacity(self.tree.highest_id)
        if need > self.cap:
            cc = jnp.zeros((self.n_var, need, self.S), dtype=self.dtype)
            self.cc = cc.at[:, :self.cap, :].set(self.cc)
            fc = jnp.zeros((self.n_fc, self.ndim, need, self.Sf),
                           dtype=self.dtype)
            self.fc = fc.at[:, :, :self.cap, :].set(self.fc)
            self.cap = need

    # convenience views (host-side inspection / tests)
    def cc_box(self, iv: int, bid: int) -> np.ndarray:
        """One box's cc data as an ndim array [nc+2]*ndim."""
        return np.array(self.cc[iv, bid]).reshape(
            *([self.nc + 2] * self.ndim))

    def set_cc_box(self, iv: int, bid: int, values) -> None:
        self.cc = self.cc.at[iv, bid].set(
            jnp.asarray(values, dtype=self.dtype).ravel())
