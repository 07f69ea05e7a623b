"""Maximum-intensity projection outputs: packed 2D MPs and rotating 3D MIP
movies (``mp2dgpu``/``mp3dgpu``/``mip3dgpu``,
reference:src/apifunc.cpp:485-644).

The rotating MIP evaluates all ``project_num`` angles in ONE device call —
a jitted ``lax.map`` over the per-angle affine matrices — instead of the
reference's per-angle kernel-launch loop with a D2H copy per frame."""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from microimagelib_tpu.ops.affine import affine_transform_3d
from microimagelib_tpu.ops.basics import max_projection
from microimagelib_tpu.ops.matrix import rot_to_matrix


def mp2d(img, z_proj=True, x_proj=True, y_proj=True):
    """2D max projections. Returns a dict of 2D arrays keyed 'xy' (z-MIP,
    (y, x)), 'yz' (x-MIP, (z, y)), 'zx' (y-MIP, (x, z)) — the three panels
    the reference packs into one buffer (reference:src/apifunc.cpp:485-505).
    Note the reference gates the third panel on flagZProj (a copy-paste
    slip); we gate on y_proj as the interface documents."""
    img = jnp.asarray(img, jnp.float32)
    out = {}
    if z_proj:
        out["xy"] = np.asarray(max_projection(img, 1))
    if x_proj:
        out["yz"] = np.asarray(max_projection(img, 3))
    if y_proj:
        out["zx"] = np.asarray(max_projection(img, 2))
    return out


@partial(jax.jit, static_argnames=("out_shape",))
def _rotate_and_mip_all(img, mats, out_shape):
    """For each 3x4 matrix, resample img into the rotated grid and z-MIP.
    mats: (N, 12). Returns (N, out_shape[1], out_shape[2])."""
    def one(m):
        rot = affine_transform_3d(img, m, out_shape)
        return jnp.maximum(rot.max(axis=0), 0)
    return jax.lax.map(one, mats)


def mip3d(img, r_axis, project_num=36):
    """Rotating 3D MIP movie about the X (r_axis=1) or Y (r_axis=2) axis
    (``mip3dgpu``, reference:src/apifunc.cpp:576-644).

    img: (z, y, x). Returns a (project_num, H, W) stack:
      r_axis=1 -> H = round(hypot(sy, sz)), W = sx
      r_axis=2 -> H = sr=sy rows? matches reference layout (imRotation, sy)
    """
    img = jnp.asarray(img, jnp.float32)
    sz, sy, sx = img.shape
    if r_axis == 1:
        sr = sx
        im_rot = int(round(math.hypot(sy, sz)))
        out_shape = (im_rot, im_rot, sr)  # (z, y, x) of the rotated grid
    elif r_axis == 2:
        sr = sy
        im_rot = int(round(math.hypot(sx, sz)))
        out_shape = (im_rot, sr, im_rot)
    else:
        raise ValueError("r_axis must be 1 (X) or 2 (Y)")
    step = math.pi * 2 / project_num  # reference uses 3.14159*2/projectNum
    step = 3.14159 * 2 / project_num
    mats = np.stack([
        rot_to_matrix(step * i, sx, sy, sz, r_axis) for i in range(project_num)
    ]).astype(np.float32)
    frames = _rotate_and_mip_all(img, jnp.asarray(mats), out_shape)
    return np.asarray(frames)


def mp3d(img, x_axis=True, y_axis=True, project_num=36):
    """Both-axis rotating MIPs (``mp3dgpu``,
    reference:src/apifunc.cpp:507-574). Returns dict with 'x' and/or 'y'."""
    out = {}
    if x_axis:
        out["x"] = mip3d(img, 1, project_num)
    if y_axis:
        out["y"] = mip3d(img, 2, project_num)
    return out


def mp2d_packed(img, z_proj=True, x_proj=True, y_proj=True):
    """Packed single-buffer variant matching the reference API exactly:
    one flat array of [XY panel | YZ panel | ZX panel] plus the 6-element
    size vector (sx, sy, sy, sz, sz, sx) (``mp2dgpu``,
    reference:src/apifunc.cpp:485-505). Panels not requested stay zero,
    as the reference leaves them unwritten in its zeroed buffer."""
    img = jnp.asarray(img, jnp.float32)
    sz, sy, sx = img.shape
    buf = np.zeros(sx * sy + sy * sz + sz * sx, dtype=np.float32)
    mps = mp2d(img, z_proj, x_proj, y_proj)
    if z_proj:
        buf[: sx * sy] = np.asarray(mps["xy"]).ravel()
    if x_proj:
        buf[sx * sy : sx * sy + sy * sz] = np.asarray(mps["yz"]).ravel()
    if y_proj:
        buf[sx * sy + sy * sz :] = np.asarray(mps["zx"]).ravel()
    size_mp = np.array([sx, sy, sy, sz, sz, sx], dtype=np.uint32)
    return buf, size_mp
