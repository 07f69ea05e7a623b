"""Pallas TPU kernel for the registration hot op: fused affine resample +
NCC partial sums (the reference's ``corrkernel``,
reference:include/cukernel.cuh:526-556).

Same algorithm as ops/affine_fast.py (exact trilinear via one-hot
matmuls over per-row source boxes) but hand-scheduled: each grid step
processes a block of output rows, DMAs each row's (K, K, sx) source box
from HBM into VMEM scratch explicitly, builds the one-hot weights on the
VPU, contracts on the MXU, and accumulates the scalar partials in SMEM —
no lax.map/vmap staging overhead, no materialized intermediate volumes.

Correctness contract matches the gather path: clamped texel footprint,
strict-lower-bound zero mask. Rows whose footprint exceeds K flag a
`fits=0` output; the wrapper falls back to the gather implementation
(ops.affine.corr3d_partials) for those matrices.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from microimagelib_tpu.ops.affine import corr3d_partials as _corr_gather

K = 16          # source box extent in z and y
ROWS_PER_STEP = 8


def _kernel(m_ref, src_hbm, tgt_ref, out_ref, box_scratch, sem, *, sz, sy, sx, sxp):
    """Grid: one step per block of ROWS_PER_STEP output rows.

    m_ref: (1, 16) SMEM — the 12 matrix entries (padded).
    src_hbm: full (sz, sy, sx) volume left in ANY/HBM.
    tgt_ref: (ROWS_PER_STEP, sx) VMEM block of the target rows.
    out_ref: (8, 128) VMEM accumulator shared by all grid steps —
    [0,0]=ss, [0,1]=st, [0,2]=fits product.
    box_scratch: (K, K, sx) VMEM scratch.
    """
    step = pl.program_id(0)

    r_ids = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    c_ids = lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    def _cell(col):
        return (r_ids == 0) & (c_ids == col)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.where(_cell(2), 1.0, 0.0)

    m00 = m_ref[0, 0]
    m01 = m_ref[0, 1]
    m02 = m_ref[0, 2]
    m03 = m_ref[0, 3]
    m10 = m_ref[0, 4]
    m11 = m_ref[0, 5]
    m12 = m_ref[0, 6]
    m13 = m_ref[0, 7]
    m20 = m_ref[0, 8]
    m21 = m_ref[0, 9]
    m22 = m_ref[0, 10]
    m23 = m_ref[0, 11]

    xs_i = lax.broadcasted_iota(jnp.int32, (1, sxp), 1)
    xs = xs_i.astype(jnp.float32)
    kz = lax.broadcasted_iota(jnp.int32, (K + ROWS_PER_STEP, sxp), 0)
    ixs = lax.broadcasted_iota(jnp.int32, (sxp, sxp), 0)  # source-x index rows

    kz_n = min(K, sz)
    ky_n = min(K + ROWS_PER_STEP, sy)

    ss_acc = jnp.zeros((), jnp.float32)
    st_acc = jnp.zeros((), jnp.float32)

    # ---- pass 1: coordinates and the block's combined footprint ----
    rows = []
    z_lo_all = jnp.int32(sz)
    z_hi_all = jnp.int32(0)
    y_lo_all = jnp.int32(sy)
    y_hi_all = jnp.int32(0)
    for r in range(ROWS_PER_STEP):
        row = step * ROWS_PER_STEP + r
        z = (row // sy).astype(jnp.float32)
        y = (row % sy).astype(jnp.float32)
        cx = m00 * xs + (m01 * y + m02 * z + m03)
        cy = m10 * xs + (m11 * y + m12 * z + m13)
        cz = m20 * xs + (m21 * y + m22 * z + m23)
        valid = (cx > -0.5) & (cy > -0.5) & (cz > -0.5) & \
                (cx < sx - 0.5) & (cy < sy - 0.5) & (cz < sz - 0.5) & \
                (xs_i < sx)  # padded out-x tail contributes nothing
        x0 = jnp.floor(cx)
        y0 = jnp.floor(cy)
        z0 = jnp.floor(cz)
        fx = cx - x0
        fy = cy - y0
        fz = cz - z0
        x0r = x0.astype(jnp.int32)
        y0r = y0.astype(jnp.int32)
        z0r = z0.astype(jnp.int32)
        x0i = jnp.clip(x0r, 0, sx - 1)
        x1i = jnp.clip(x0r + 1, 0, sx - 1)
        y0i = jnp.clip(y0r, 0, sy - 1)
        y1i = jnp.clip(y0r + 1, 0, sy - 1)
        z0i = jnp.clip(z0r, 0, sz - 1)
        z1i = jnp.clip(z0r + 1, 0, sz - 1)
        y_lo_row = jnp.min(jnp.where(valid, y0i, sy))
        y_hi_row = jnp.max(jnp.where(valid, y1i, 0))
        z_lo_all = jnp.minimum(z_lo_all, jnp.min(jnp.where(valid, z0i, sz)))
        z_hi_all = jnp.maximum(z_hi_all, jnp.max(jnp.where(valid, z1i, 0)))
        y_lo_all = jnp.minimum(y_lo_all, y_lo_row)
        y_hi_all = jnp.maximum(y_hi_all, y_hi_row)
        rows.append((valid, x0i, x1i, y0i, y1i, z0i, z1i, fx, fy, fz,
                     y_lo_row, y_hi_row))

    oz = jnp.clip(z_lo_all, 0, sz - kz_n)
    oy = jnp.clip(y_lo_all, 0, sy - ky_n)
    fits_acc = ((z_hi_all - oz < kz_n) & (y_hi_all - oy < ky_n)).astype(jnp.float32)

    # ---- one DMA for the whole block of rows ----
    dma = pltpu.make_async_copy(
        src_hbm.at[pl.ds(oz, kz_n), pl.ds(oy, ky_n), :],
        box_scratch.at[:kz_n, :ky_n, :],
        sem,
    )
    dma.start()
    dma.wait()
    ky_row = min(K, ky_n)  # tight per-row window inside the block box

    # ---- pass 2: per-row one-hot contraction over a tight (kz, K) window ----
    for r in range(ROWS_PER_STEP):
        (valid, x0i, x1i, y0i, y1i, z0i, z1i, fx, fy, fz,
         y_lo_row, y_hi_row) = rows[r]
        oy_r = jnp.clip(y_lo_row - oy, 0, ky_n - ky_row)
        # The block-level check above covers the COMBINED footprint within
        # ky_n rows, but each row's contraction window is only ky_row wide:
        # a row whose own span exceeds ky_row must also flag no-fit.
        fits_acc = fits_acc * (
            y_hi_row - (oy + oy_r) < ky_row).astype(jnp.float32)
        box_row = box_scratch[:kz_n, pl.ds(oy_r, ky_row), :]
        z0l = z0i - oz
        z1l = z1i - oz
        y0l = y0i - (oy + oy_r)
        y1l = y1i - (oy + oy_r)
        wz = (1.0 - fz) * (kz[:kz_n] == z0l) + fz * (kz[:kz_n] == z1l)
        wy = (1.0 - fy) * (kz[:ky_row] == y0l) + fy * (kz[:ky_row] == y1l)
        wzy = (wz[:, None, :] * wy[None, :, :]).reshape(kz_n * ky_row, sxp)
        wx = (1.0 - fx) * (ixs == x0i) + fx * (ixs == x1i)
        q = jnp.dot(box_row.reshape(kz_n * ky_row, sxp), wx,
                    preferred_element_type=jnp.float32)
        s_row = jnp.sum(wzy * q, axis=0, keepdims=True)
        s_row = jnp.where(valid, s_row, 0.0)
        t_row = tgt_ref[r, :].reshape(1, sxp)
        ss_acc = ss_acc + jnp.sum(s_row * s_row)
        st_acc = st_acc + jnp.sum(s_row * t_row)

    cur = out_ref[:]
    new = cur + jnp.where(_cell(0), ss_acc, 0.0) + jnp.where(_cell(1), st_acc, 0.0)
    new = jnp.where(_cell(2), cur * fits_acc, new)
    out_ref[:] = new


def _corr_pallas_raw(src, tgt2d, m16, sz, sy, sx, sxp, interpret=False):
    n_rows = sz * sy
    n_steps = n_rows // ROWS_PER_STEP
    kernel = partial(_kernel, sz=sz, sy=sy, sx=sx, sxp=sxp)
    out = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((ROWS_PER_STEP, sxp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((K, K + ROWS_PER_STEP, sxp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(m16, src, tgt2d)
    return out[0, 0], out[0, 1], out[0, 2] > 0.5


@partial(jax.jit, static_argnames=("interpret",))
def corr3d_partials_pallas(src, tgt, tmx, interpret=False):
    """Fused resample + NCC partials as a Pallas kernel, with gather
    fallback for matrices whose footprint exceeds the box."""
    sz, sy, sx = src.shape
    if (sz * sy) % ROWS_PER_STEP:
        # odd row counts unsupported; XLA one-hot formulation instead
        from microimagelib_tpu.ops.affine_fast import corr3d_partials_mxu

        return corr3d_partials_mxu(src, tgt, tmx)
    # Mosaic requires the lane (minor) dim of HBM slices to be a multiple
    # of 128: pad x with zeros — index math uses the true sx (clamp at
    # sx-1 preserves edge semantics) and the padded out-x tail is masked
    sxp = -(-sx // 128) * 128
    src_u, tgt_u = src, tgt  # unpadded: the gather fallback must see true extents
    if sxp != sx:
        src = jnp.pad(src, ((0, 0), (0, 0), (0, sxp - sx)))
        tgt = jnp.pad(tgt, ((0, 0), (0, 0), (0, sxp - sx)))
    tmx = jnp.asarray(tmx, jnp.float32)
    m16 = jnp.zeros((1, 16), jnp.float32).at[0, :12].set(tmx)
    tgt2d = tgt.reshape(sz * sy, sxp)
    ss, st, all_fit = _corr_pallas_raw(src, tgt2d, m16, sz, sy, sx, sxp, interpret)

    def fast(_):
        return ss, st

    def slow(_):
        return _corr_gather(src_u, tgt_u, tmx)

    return lax.cond(all_fit, fast, slow, None)
