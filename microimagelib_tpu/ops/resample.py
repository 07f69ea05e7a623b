"""Separable resampling on the MXU: for *diagonal* affine transforms
(pure per-axis scaling + translation — exactly what ``imresize3d``'s
isotropization uses, reference:src/apifunc.cpp:429-446) trilinear
interpolation factorizes into three 1D linear-interpolation matrices, so
the whole resample becomes three dense matmuls on the systolic array
instead of an 8-neighbor gather per voxel.

Semantics are identical to the gather path (ops/affine.py): source
coordinate c = scale * out_index + offset, texel footprint clamped at the
borders, zero where c is outside [-0.5, size-0.5) per axis (the
``affinetransformkernel`` mask, reference:include/cukernel.cuh:515)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _interp_matrix(n_out, n_in, scale, offset):
    """(n_out, n_in) linear-interpolation matrix for c = scale*i + offset."""
    c = scale * np.arange(n_out, dtype=np.float64) + offset
    valid = (c >= -0.5) & (c < n_in - 0.5)
    i0 = np.floor(c).astype(np.int64)
    f = c - i0
    i0c = np.clip(i0, 0, n_in - 1)
    i1c = np.clip(i0 + 1, 0, n_in - 1)
    w = np.zeros((n_out, n_in), dtype=np.float32)
    rows = np.arange(n_out)
    np.add.at(w, (rows, i0c), ((1.0 - f) * valid).astype(np.float32))
    np.add.at(w, (rows, i1c), (f * valid).astype(np.float32))
    return w


@partial(jax.jit)
def _apply_separable(vol, wz, wy, wx):
    # out[zo,yo,xo] = sum_i wz[zo,zi] wy[yo,yi] wx[xo,xi] vol[zi,yi,xi]
    t = jnp.einsum("ab,byx->ayx", wz, vol, preferred_element_type=jnp.float32)
    t = jnp.einsum("cb,abx->acx", wy, t, preferred_element_type=jnp.float32)
    return jnp.einsum("dx,acx->acd", wx, t, preferred_element_type=jnp.float32)


def resize3d_separable(vol, out_shape_zyx, tmx_diag=None):
    """Resample through a diagonal affine using MXU matmuls.

    ``tmx_diag``: optional 12-vector whose off-diagonal rotation terms are
    all zero — (scale_x, scale_y, scale_z) on the diagonal and a
    translation column. Defaults to ``imresize3d`` scaling
    (in_size/out_size per axis, zero offset)."""
    vol = jnp.asarray(vol, jnp.float32)
    iz, iy, ix = vol.shape
    oz, oy, ox = out_shape_zyx
    if tmx_diag is None:
        sx, sy, sz = ix / ox, iy / oy, iz / oz
        tx = ty = tz = 0.0
    else:
        m = np.asarray(tmx_diag, np.float64).reshape(3, 4)
        if not (m[0, 1] == m[0, 2] == m[1, 0] == m[1, 2] == m[2, 0] == m[2, 1] == 0):
            raise ValueError("resize3d_separable requires a diagonal transform")
        sx, sy, sz = m[0, 0], m[1, 1], m[2, 2]
        tx, ty, tz = m[0, 3], m[1, 3], m[2, 3]
    wz = jnp.asarray(_interp_matrix(oz, iz, sz, tz))
    wy = jnp.asarray(_interp_matrix(oy, iy, sy, ty))
    wx = jnp.asarray(_interp_matrix(ox, ix, sx, tx))
    return _apply_separable(vol, wz, wy, wx)


def is_diagonal_tmx(tmx, tol=0.0):
    m = np.asarray(tmx, np.float64).reshape(3, 4)
    off = [m[0, 1], m[0, 2], m[1, 0], m[1, 2], m[2, 0], m[2, 1]]
    return all(abs(v) <= tol for v in off)
