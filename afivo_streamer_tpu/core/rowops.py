"""Row-granular access helpers for the traced path.

On the TPU backend, advanced indexing with per-element (row, cell) index
pairs lowers to element-wise gather/scatter, which executes orders of
magnitude slower than row-level gathers plus static-slice updates
(dynamic_update_slice). These helpers express interior/face access as:
gather whole rows -> reshape -> static slice (read) or slice-update +
row-level set (write). The host (NumPy) path keeps plain in-place
indexing.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import spatial as sp


def _interior_sl(nc: int, ndim: int):
    return (slice(None),) + (slice(1, nc + 1),) * ndim


def cc_get_interior(cc, iv: int, ids, nc: int, ndim: int):
    """Interior cells of cc rows: [n, nc^ndim] (same array type)."""
    if isinstance(cc, np.ndarray):
        sidx = sp.interior_flat(ndim, nc)
        return cc[iv, np.asarray(ids)[:, None], sidx[None, :]]
    idsj = jnp.asarray(sp.aix(ids))
    B = cc[iv, idsj].reshape((len(ids),) + (nc + 2,) * ndim)
    return B[_interior_sl(nc, ndim)].reshape(len(ids), -1)


def cc_set_interior(cc, iv: int, ids, vals, nc: int, ndim: int):
    """Write interior cells [n, nc^ndim] into cc rows."""
    flat = vals.reshape(len(ids), -1)
    if isinstance(cc, np.ndarray):
        sidx = sp.interior_flat(ndim, nc)
        cc[iv, np.asarray(ids)[:, None], sidx[None, :]] = flat
        return cc
    idsj = jnp.asarray(sp.aix(ids))
    B = cc[iv, idsj].reshape((len(ids),) + (nc + 2,) * ndim)
    B = B.at[_interior_sl(nc, ndim)].set(
        flat.reshape((len(ids),) + (nc,) * ndim))
    return cc.at[iv, idsj].set(B.reshape(len(ids), -1))


def cc_add_interior(cc, iv: int, ids, vals, nc: int, ndim: int):
    """Add to interior cells [n, nc^ndim] of cc rows."""
    flat = vals.reshape(len(ids), -1)
    if isinstance(cc, np.ndarray):
        sidx = sp.interior_flat(ndim, nc)
        cc[iv, np.asarray(ids)[:, None], sidx[None, :]] += flat
        return cc
    idsj = jnp.asarray(sp.aix(ids))
    B = cc[iv, idsj].reshape((len(ids),) + (nc + 2,) * ndim)
    B = B.at[_interior_sl(nc, ndim)].add(
        flat.reshape((len(ids),) + (nc,) * ndim))
    return cc.at[iv, idsj].set(B.reshape(len(ids), -1))


def _face_sl(nc: int, ndim: int, d: int):
    return (slice(None),) + tuple(
        slice(0, nc + 1) if k == d else slice(0, nc) for k in range(ndim))


def fc_get_faces(fc, f_iv: int, d: int, ids, nc: int, ndim: int):
    """Faces of one flux dim: [n] + [nc+1 if k==d else nc]."""
    shape = (len(ids),) + tuple(nc + 1 if k == d else nc
                                for k in range(ndim))
    if isinstance(fc, np.ndarray):
        faxes = [np.arange(0, nc + 1) if k == d else np.arange(0, nc)
                 for k in range(ndim)]
        fidx = sp.fc_flat(ndim, nc, *faxes)
        return fc[f_iv, d, np.asarray(ids)[:, None],
                  fidx[None, :]].reshape(shape)
    idsj = jnp.asarray(sp.aix(ids))
    B = fc[f_iv, d, idsj].reshape((len(ids),) + (nc + 1,) * ndim)
    return B[_face_sl(nc, ndim, d)]


def fc_set_faces(fc, f_iv: int, d: int, ids, vals, nc: int, ndim: int):
    """Write the faces of one flux dim back."""
    shape = (len(ids),) + tuple(nc + 1 if k == d else nc
                                for k in range(ndim))
    if isinstance(fc, np.ndarray):
        faxes = [np.arange(0, nc + 1) if k == d else np.arange(0, nc)
                 for k in range(ndim)]
        fidx = sp.fc_flat(ndim, nc, *faxes)
        fc[f_iv, d, np.asarray(ids)[:, None], fidx[None, :]] = \
            vals.reshape(len(ids), -1)
        return fc
    idsj = jnp.asarray(sp.aix(ids))
    B = fc[f_iv, d, idsj].reshape((len(ids),) + (nc + 1,) * ndim)
    B = B.at[_face_sl(nc, ndim, d)].set(vals.reshape(shape))
    return fc.at[f_iv, d, idsj].set(B.reshape(len(ids), -1))
