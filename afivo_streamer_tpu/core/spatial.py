"""Flat spatial indexing helpers for the SoA box batch.

Cell-centered data of one box is stored flattened: a box has (nc+2)^ndim
cells including one ghost layer; index 0 and nc+1 per dimension are ghost
cells, 1..nc is the interior (matching the reference's
``box%cc(0:nc+1, ...)`` layout, ``afivo/src/m_af_types.f90:286-322``).
Face-centered data uses (nc+1)^ndim per direction with index 1..nc+1 of the
reference mapped to 0..nc here.

All helpers return NumPy int32 index arrays; they run on the host when
building index plans at refinement epochs.
"""

from __future__ import annotations

import itertools
from typing import List, Sequence, Union

import numpy as np

IdxLike = Union[int, Sequence[int], np.ndarray]


def aix(x):
    """Index-array coercion that passes JAX arrays/tracers through.

    Plan index tables are NumPy constants on the host path, but become
    traced leaves when a plan is passed as a jit argument (the epoch-pack
    design: topology tables are runtime inputs, so a refinement epoch with
    unchanged bucket shapes reuses the compiled step)."""
    if isinstance(x, np.ndarray):
        return x
    import jax
    if isinstance(x, (jax.Array, jax.core.Tracer)):
        return x
    return np.asarray(x)


def _as_axes(nc: int, per_dim: Sequence[IdxLike]) -> List[np.ndarray]:
    axes = []
    for a in per_dim:
        if isinstance(a, slice):
            start = 0 if a.start is None else a.start
            stop = a.stop
            axes.append(np.arange(start, stop, dtype=np.int64))
        elif np.isscalar(a):
            axes.append(np.array([a], dtype=np.int64))
        else:
            axes.append(np.asarray(a, dtype=np.int64))
    return axes


def cc_flat(ndim: int, nc: int, *per_dim: IdxLike) -> np.ndarray:
    """Flat indices into the (nc+2)^ndim cell array for the outer product of
    per-dimension index lists. Returns shape = product of lengths, flattened
    in C order over the given per-dim axes."""
    axes = _as_axes(nc, per_dim)
    mesh = np.meshgrid(*axes, indexing="ij")
    return np.ravel_multi_index([m.ravel() for m in mesh],
                                [nc + 2] * ndim).astype(np.int32)


def cc_flat_nd(ndim: int, nc: int, idx_nd: np.ndarray) -> np.ndarray:
    """Flat indices for an array of nd coordinates [..., ndim] (0..nc+1)."""
    idx_nd = np.asarray(idx_nd)
    return np.ravel_multi_index(
        [idx_nd[..., k] for k in range(ndim)], [nc + 2] * ndim).astype(np.int32)


def fc_flat(ndim: int, nc: int, *per_dim: IdxLike) -> np.ndarray:
    """Flat indices into the (nc+1)^ndim face array (one direction)."""
    axes = _as_axes(nc, per_dim)
    mesh = np.meshgrid(*axes, indexing="ij")
    return np.ravel_multi_index([m.ravel() for m in mesh],
                                [nc + 1] * ndim).astype(np.int32)


def ext_flat(ndim: int, nc: int, *per_dim: IdxLike) -> np.ndarray:
    """Flat indices into the extended 2-ghost array (nc+4)^ndim. Coordinates
    here are shifted by +2 relative to reference convention (-1..nc+2 maps to
    0..nc+3)."""
    axes = _as_axes(nc, per_dim)
    mesh = np.meshgrid(*axes, indexing="ij")
    return np.ravel_multi_index([m.ravel() for m in mesh],
                                [nc + 4] * ndim).astype(np.int32)


def interior_flat(ndim: int, nc: int) -> np.ndarray:
    """Flat indices of the nc^ndim interior cells."""
    rng = np.arange(1, nc + 1)
    return cc_flat(ndim, nc, *([rng] * ndim))


def all_flat(ndim: int, nc: int) -> np.ndarray:
    rng = np.arange(0, nc + 2)
    return cc_flat(ndim, nc, *([rng] * ndim))


def face_transverse_axes(ndim: int, nc: int, dim: int, normal_idx: int,
                         lo: int = 1, hi: int = None) -> List:
    """Per-dim axes for one face layer: `normal_idx` in dimension `dim`,
    lo..hi (default 1..nc) in the others."""
    hi = nc if hi is None else hi
    axes: List = []
    for k in range(ndim):
        if k == dim:
            axes.append(normal_idx)
        else:
            axes.append(np.arange(lo, hi + 1))
    return axes


def corner_list(ndim: int, nc: int):
    """All 2^ndim corner ghost positions (each dim 0 or nc+1) with their
    inward offsets di (+1 at the low side, -1 at the high side)."""
    out = []
    for bits in itertools.product([0, 1], repeat=ndim):
        pos = np.array([nc + 1 if b else 0 for b in bits], dtype=np.int64)
        di = np.array([-1 if b else 1 for b in bits], dtype=np.int64)
        out.append((pos, di))
    return out
