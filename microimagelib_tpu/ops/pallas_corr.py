"""Pallas TPU kernel for the registration hot op: fused affine resample +
NCC partial sums (the reference's ``corrkernel``,
reference:include/cukernel.cuh:526-556).

Same algorithm as ops/affine_fast.py (exact trilinear via one-hot
matmuls over per-row source boxes) but hand-scheduled: each grid step
processes a block of output rows, DMAs the block's (K, K+R, sx) source
box from HBM into VMEM, builds the one-hot weights on the VPU, contracts
on the MXU, and accumulates the scalar partials in VMEM — no
lax.map/vmap staging overhead, no materialized intermediate volumes.

Scheduling: the source-box DMA is DOUBLE-BUFFERED — while block i
computes, block i+1's box is already in flight, so per-step DMA latency
is hidden behind the MXU work (the round-1 kernel serialized
start/wait/compute every step).

Box size K is a static parameter. K=16 covers rotations of several
degrees at 128-scale; K=8 quarters the MXU work and covers near-identity
matrices (the 12-DOF polish stage, fine pyramid levels). The default
path CASCADES over K = 8/16/32 (and 64 when VMEM allows), STARTING at
the tier a conservative analytic footprint bound selects from the
matrix, escalating on the kernel's exact fit check, and falling back to
the exact gather implementation (ops.affine.corr3d_partials) last.
Override with MIL_PALLAS_K=<K>|cascade.

Correctness contract matches the gather path: clamped texel footprint,
strict-lower-bound zero mask. Rows whose footprint exceeds the per-row
window flag ``fits=0`` (checked per row AND per block); non-fitting
matrices take the next tier.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from microimagelib_tpu.ops.affine import corr3d_partials as _corr_gather

DEFAULT_ROWS = 8


def _mat_entries(m_ref, mi):
    """The 12 matrix scalars of SMEM row ``mi``."""
    return tuple(m_ref[mi, j] for j in range(12))


def _row_sample(mv, row, xs, xs_i, sz, sy, sx):
    """Per-output-row sample data for matrix scalars ``mv``: validity,
    clamped corner indices, lerp fractions, the row's y footprint
    bounds, and the (y, z) output coordinates (the grad kernel's
    chain-rule factors)."""
    m00, m01, m02, m03, m10, m11, m12, m13, m20, m21, m22, m23 = mv
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
    return (valid, x0i, x1i, y0i, y1i, z0i, z1i, fx, fy, fz,
            y_lo_row, y_hi_row, y, z)


def _block_coords_mv(mv, blk, rows, xs, xs_i, sz, sy, sx, kz_n, ky_n):
    """Per-row sample data + footprint origin/fit of one ``rows``-row
    block under matrix scalars ``mv`` (shared by all corr kernels)."""
    row_data = []
    z_lo_all = jnp.int32(sz)
    z_hi_all = jnp.int32(0)
    y_lo_all = jnp.int32(sy)
    y_hi_all = jnp.int32(0)
    for r in range(rows):
        rd = _row_sample(mv, blk * rows + r, xs, xs_i, sz, sy, sx)
        (valid, x0i, x1i, y0i, y1i, z0i, z1i, fx, fy, fz,
         y_lo_row, y_hi_row, y, z) = rd
        z_lo_all = jnp.minimum(z_lo_all, jnp.min(jnp.where(valid, z0i, sz)))
        z_hi_all = jnp.maximum(z_hi_all, jnp.max(jnp.where(valid, z1i, 0)))
        y_lo_all = jnp.minimum(y_lo_all, y_lo_row)
        y_hi_all = jnp.maximum(y_hi_all, y_hi_row)
        row_data.append(rd)
    oz = jnp.clip(z_lo_all, 0, sz - kz_n)
    oy = jnp.clip(y_lo_all, 0, sy - ky_n)
    fits = ((z_hi_all - oz < kz_n) & (y_hi_all - oy < ky_n)).astype(jnp.float32)
    return row_data, oz, oy, fits


def _kernel(m_ref, src_hbm, tgt_ref, out_ref, box0, box1, sem0, sem1,
            *, k, rows, sz, sy, sx, sxp, n_steps):
    """Grid: one step per block of ``rows`` output rows.

    m_ref: (1, 16) SMEM — the 12 matrix entries (padded).
    src_hbm: full (sz, sy, sx) volume left in ANY/HBM.
    tgt_ref: (rows, sxp) VMEM block of the target rows.
    out_ref: (24, 128) VMEM accumulator shared by all grid steps. Per-
    step ss/st partials are SPREAD over 1024 cells (rows 0-7 ss, 8-15
    st, cell [16,0] the fits product) and tree-reduced by the wrapper —
    sequential accumulation into one f32 cell would lose digits over
    tens of thousands of steps (the reference accumulates the NCC
    partials in double, reference:include/cukernel.cuh:526-556).
    box0/box1: (kz_n, ky_n, sxp) VMEM scratch, double-buffered.
    """
    step = pl.program_id(0)

    r_ids = lax.broadcasted_iota(jnp.int32, (24, 128), 0)
    c_ids = lax.broadcasted_iota(jnp.int32, (24, 128), 1)
    srow = step % 8
    scol = (step // 8) % 128

    def _cell(row, col):
        return (r_ids == row) & (c_ids == col)

    mv = _mat_entries(m_ref, 0)

    xs_i = lax.broadcasted_iota(jnp.int32, (1, sxp), 1)
    xs = xs_i.astype(jnp.float32)
    kz = lax.broadcasted_iota(jnp.int32, (k + rows, sxp), 0)
    ixs = lax.broadcasted_iota(jnp.int32, (sxp, sxp), 0)  # source-x index rows

    kz_n = min(k, sz)
    ky_n = min(k + rows, sy)
    ky_row = min(k, ky_n)  # tight per-row window inside the block box
    if sxp > 128:
        # Wide-lane volumes (beyond-HBM pooled ladders): Mosaic cannot
        # statically prove the dynamic sublane (dim-1) offset of the
        # per-row window slice is 8-aligned and refuses to compile
        # ("index in dimension 1 is a multiple of 8", round-5 hardware,
        # memref<32x48x512>). Use the full static box height instead —
        # slightly more MXU work per row ((k+rows)/k), only on shapes
        # the tight window never compiled for.
        ky_row = ky_n

    def block_coords(blk):
        """Per-row sample coordinates and the block's footprint origin."""
        return _block_coords_mv(mv, blk, rows, xs, xs_i, sz, sy, sx,
                                kz_n, ky_n)

    def block_origin(blk):
        """Footprint origin only (cheap recompute for the DMA prefetch)."""
        _, oz, oy, _ = block_coords(blk)
        return oz, oy

    def start_dma(blk, box, sem):
        oz, oy = block_origin(blk)
        pltpu.make_async_copy(
            src_hbm.at[pl.ds(oz, kz_n), pl.ds(oy, ky_n), :],
            box.at[:kz_n, :ky_n, :],
            sem,
        ).start()

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.where(_cell(16, 0), 1.0, 0.0)
        start_dma(jnp.int32(0), box0, sem0)

    # prefetch the NEXT block's box while this block computes
    @pl.when((step + 1 < n_steps) & (step % 2 == 0))
    def _():
        start_dma(step + 1, box1, sem1)

    @pl.when((step + 1 < n_steps) & (step % 2 == 1))
    def _():
        start_dma(step + 1, box0, sem0)

    row_data, oz, oy, fits_acc = block_coords(step)

    def compute(box_ref, sem):
        pltpu.make_async_copy(
            src_hbm.at[pl.ds(oz, kz_n), pl.ds(oy, ky_n), :],
            box_ref.at[:kz_n, :ky_n, :],
            sem,
        ).wait()
        ss_acc = jnp.zeros((), jnp.float32)
        st_acc = jnp.zeros((), jnp.float32)
        fits = fits_acc
        for r in range(rows):
            (valid, x0i, x1i, y0i, y1i, z0i, z1i, fx, fy, fz,
             y_lo_row, y_hi_row) = row_data[r][:12]
            # ky_row == ky_n -> static full-height window (offset 0, no
            # dynamic sublane index; see the sxp > 128 note above)
            oy_r = (0 if ky_row == ky_n
                    else jnp.clip(y_lo_row - oy, 0, ky_n - ky_row))
            # The block-level check covers the COMBINED footprint within
            # ky_n rows, but each row's contraction window is only ky_row
            # wide: a row whose own span exceeds it must also flag no-fit.
            fits = fits * (y_hi_row - (oy + oy_r) < ky_row).astype(jnp.float32)
            box_row = box_ref[:kz_n, pl.ds(oy_r, ky_row), :]
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
        new = (cur + jnp.where(_cell(srow, scol), ss_acc, 0.0)
               + jnp.where(_cell(8 + srow, scol), st_acc, 0.0))
        new = jnp.where(_cell(16, 0), cur * fits, new)
        out_ref[:] = new

    @pl.when(step % 2 == 0)
    def _():
        compute(box0, sem0)

    @pl.when(step % 2 == 1)
    def _():
        compute(box1, sem1)


def _kernel_nprobe(m_ref, src_hbm, tgt_ref, out_ref, box0, box1, sem0, sem1,
                   *, k, rows, sz, sy, sx, sxp, n_steps, n_mats):
    """N-matrix variant of :func:`_kernel` for vectorized line-search
    probes: per grid step ONE DMA fetches the UNION footprint box of all
    ``n_mats`` matrices (probes along a search direction overlap almost
    entirely), then each matrix's contraction runs against the shared
    box. Amortizes both the per-call issue floor and the HBM box traffic
    over the probe batch.

    out_ref is (24*n_mats, 128): matrix i's ss/st/fits occupy rows
    [24i, 24i+24) with the same spread layout as the single kernel."""
    step = pl.program_id(0)

    r_ids = lax.broadcasted_iota(jnp.int32, (24 * n_mats, 128), 0)
    c_ids = lax.broadcasted_iota(jnp.int32, (24 * n_mats, 128), 1)
    srow = step % 8
    scol = (step // 8) % 128

    def _cell(row, col):
        return (r_ids == row) & (c_ids == col)

    xs_i = lax.broadcasted_iota(jnp.int32, (1, sxp), 1)
    xs = xs_i.astype(jnp.float32)
    kz = lax.broadcasted_iota(jnp.int32, (k + rows, sxp), 0)
    ixs = lax.broadcasted_iota(jnp.int32, (sxp, sxp), 0)

    kz_n = min(k, sz)
    ky_n = min(k + rows, sy)
    ky_row = min(k, ky_n)
    if sxp > 128:
        ky_row = ky_n  # static window at wide lanes (see _kernel)

    def union_coords(blk):
        """Per-matrix row data + the union footprint origin; per-matrix
        fit is checked against the union window."""
        datas, ozs, oys = [], [], []
        for mi in range(n_mats):
            rd, oz, oy, _ = _block_coords_mv(
                _mat_entries(m_ref, mi), blk, rows, xs, xs_i, sz, sy, sx,
                kz_n, ky_n)
            datas.append(rd)
            ozs.append(oz)
            oys.append(oy)
        ozu = ozs[0]
        oyu = oys[0]
        for mi in range(1, n_mats):
            ozu = jnp.minimum(ozu, ozs[mi])
            oyu = jnp.minimum(oyu, oys[mi])
        # each per-matrix origin is already clipped to [0, n - box];
        # their minimum stays in range and lower-bounds every footprint
        fits = []
        for mi in range(n_mats):
            z_hi = jnp.int32(0)
            y_hi = jnp.int32(0)
            for r in range(rows):
                (valid, _x0, _x1, _y0, y1i, _z0, z1i, _fx, _fy, _fz,
                 _yl, y_hi_row, _y, _z) = datas[mi][r]
                z_hi = jnp.maximum(z_hi, jnp.max(jnp.where(valid, z1i, 0)))
                y_hi = jnp.maximum(y_hi, y_hi_row)
            fits.append(((z_hi - ozu < kz_n)
                         & (y_hi - oyu < ky_n)).astype(jnp.float32))
        return datas, ozu, oyu, fits

    def start_dma(blk, box, sem):
        _, oz, oy, _ = union_coords(blk)
        pltpu.make_async_copy(
            src_hbm.at[pl.ds(oz, kz_n), pl.ds(oy, ky_n), :],
            box.at[:kz_n, :ky_n, :],
            sem,
        ).start()

    @pl.when(step == 0)
    def _():
        init = jnp.zeros((24 * n_mats, 128), jnp.float32)
        for mi in range(n_mats):
            init = jnp.where(_cell(24 * mi + 16, 0), 1.0, init)
        out_ref[:] = init
        start_dma(jnp.int32(0), box0, sem0)

    @pl.when((step + 1 < n_steps) & (step % 2 == 0))
    def _():
        start_dma(step + 1, box1, sem1)

    @pl.when((step + 1 < n_steps) & (step % 2 == 1))
    def _():
        start_dma(step + 1, box0, sem0)

    datas, oz, oy, fits_mats = union_coords(step)

    def compute(box_ref, sem):
        pltpu.make_async_copy(
            src_hbm.at[pl.ds(oz, kz_n), pl.ds(oy, ky_n), :],
            box_ref.at[:kz_n, :ky_n, :],
            sem,
        ).wait()
        cur = out_ref[:]
        for mi in range(n_mats):
            ss_acc = jnp.zeros((), jnp.float32)
            st_acc = jnp.zeros((), jnp.float32)
            fits = fits_mats[mi]
            for r in range(rows):
                (valid, x0i, x1i, y0i, y1i, z0i, z1i, fx, fy, fz,
                 y_lo_row, y_hi_row) = datas[mi][r][:12]
                oy_r = (0 if ky_row == ky_n
                        else jnp.clip(y_lo_row - oy, 0, ky_n - ky_row))
                fits = fits * (y_hi_row - (oy + oy_r) < ky_row).astype(
                    jnp.float32)
                box_row = box_ref[:kz_n, pl.ds(oy_r, ky_row), :]
                z0l = z0i - oz
                z1l = z1i - oz
                y0l = y0i - (oy + oy_r)
                y1l = y1i - (oy + oy_r)
                wz = (1.0 - fz) * (kz[:kz_n] == z0l) + fz * (kz[:kz_n] == z1l)
                wy = (1.0 - fy) * (kz[:ky_row] == y0l) + fy * (kz[:ky_row] == y1l)
                wzy = (wz[:, None, :] * wy[None, :, :]).reshape(
                    kz_n * ky_row, sxp)
                wx = (1.0 - fx) * (ixs == x0i) + fx * (ixs == x1i)
                q = jnp.dot(box_row.reshape(kz_n * ky_row, sxp), wx,
                            preferred_element_type=jnp.float32)
                s_row = jnp.sum(wzy * q, axis=0, keepdims=True)
                s_row = jnp.where(valid, s_row, 0.0)
                t_row = tgt_ref[r, :].reshape(1, sxp)
                ss_acc = ss_acc + jnp.sum(s_row * s_row)
                st_acc = st_acc + jnp.sum(s_row * t_row)
            cur = (cur + jnp.where(_cell(24 * mi + srow, scol), ss_acc, 0.0)
                   + jnp.where(_cell(24 * mi + 8 + srow, scol), st_acc, 0.0))
            cur = jnp.where(_cell(24 * mi + 16, 0), cur * fits, cur)
        out_ref[:] = cur

    @pl.when(step % 2 == 0)
    def _():
        compute(box0, sem0)

    @pl.when(step % 2 == 1)
    def _():
        compute(box1, sem1)


def _grad_kernel(m_ref, src_hbm, tgt_ref, out_ref, box0, box1, sem0, sem1,
                 *, k, rows, sz, sy, sx, sxp, n_steps):
    """Fused NCC partials + analytic gradient sums (the TPU-native lever
    the CUDA texture path never had: the resample is differentiable
    w.r.t. the matrix). Per grid step (a block of ``rows`` output rows)
    this accumulates, besides ss = sum s^2 and st = sum s*t:

        Gs[j] = sum_v s_v * ds_v/dm_j   (= d(ss/2)/dm_j)
        Gt[j] = sum_v t_v * ds_v/dm_j   (= d(st)/dm_j)

    for the 12 matrix entries, using the exact a.e. derivative of the
    trilinear sample: ds/dc_axis is the lerp difference along that axis
    (one-hot difference weights), and dc_axis/dm_(a,j) = [x, y, z, 1].

    out_ref is (224, 128): rows 0-7 ss, 8-15 st, cell [16,0] the fits
    product, rows 32+8g..39+8g the 24 gradient components g (Gs 0-11,
    Gt 12-23), all spread-accumulated like the forward kernel."""
    step = pl.program_id(0)

    r_ids = lax.broadcasted_iota(jnp.int32, (224, 128), 0)
    c_ids = lax.broadcasted_iota(jnp.int32, (224, 128), 1)
    srow = step % 8
    scol = (step // 8) % 128

    def _cell(row, col):
        return (r_ids == row) & (c_ids == col)

    mv = _mat_entries(m_ref, 0)

    xs_i = lax.broadcasted_iota(jnp.int32, (1, sxp), 1)
    xs = xs_i.astype(jnp.float32)
    kz = lax.broadcasted_iota(jnp.int32, (k + rows, sxp), 0)
    ixs = lax.broadcasted_iota(jnp.int32, (sxp, sxp), 0)

    kz_n = min(k, sz)
    ky_n = min(k + rows, sy)
    ky_row = min(k, ky_n)
    if sxp > 128:
        ky_row = ky_n  # static window at wide lanes (see _kernel)

    def block_coords(blk):
        return _block_coords_mv(mv, blk, rows, xs, xs_i, sz, sy, sx,
                                kz_n, ky_n)

    def block_origin(blk):
        _, oz, oy, _ = block_coords(blk)
        return oz, oy

    def start_dma(blk, box, sem):
        oz, oy = block_origin(blk)
        pltpu.make_async_copy(
            src_hbm.at[pl.ds(oz, kz_n), pl.ds(oy, ky_n), :],
            box.at[:kz_n, :ky_n, :],
            sem,
        ).start()

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.where(_cell(16, 0), 1.0, 0.0)
        start_dma(jnp.int32(0), box0, sem0)

    @pl.when((step + 1 < n_steps) & (step % 2 == 0))
    def _():
        start_dma(step + 1, box1, sem1)

    @pl.when((step + 1 < n_steps) & (step % 2 == 1))
    def _():
        start_dma(step + 1, box0, sem0)

    row_data, oz, oy, fits_acc = block_coords(step)

    def compute(box_ref, sem):
        pltpu.make_async_copy(
            src_hbm.at[pl.ds(oz, kz_n), pl.ds(oy, ky_n), :],
            box_ref.at[:kz_n, :ky_n, :],
            sem,
        ).wait()
        ss_acc = jnp.zeros((), jnp.float32)
        st_acc = jnp.zeros((), jnp.float32)
        g_acc = [jnp.zeros((), jnp.float32) for _ in range(24)]
        fits = fits_acc
        for r in range(rows):
            (valid, x0i, x1i, y0i, y1i, z0i, z1i, fx, fy, fz,
             y_lo_row, y_hi_row, yf, zf) = row_data[r]
            oy_r = (0 if ky_row == ky_n
                    else jnp.clip(y_lo_row - oy, 0, ky_n - ky_row))
            fits = fits * (y_hi_row - (oy + oy_r) < ky_row).astype(jnp.float32)
            box_row = box_ref[:kz_n, pl.ds(oy_r, ky_row), :]
            z0l = z0i - oz
            z1l = z1i - oz
            y0l = y0i - (oy + oy_r)
            y1l = y1i - (oy + oy_r)
            oz0 = (kz[:kz_n] == z0l)
            oz1 = (kz[:kz_n] == z1l)
            oy0 = (kz[:ky_row] == y0l)
            oy1 = (kz[:ky_row] == y1l)
            wz = (1.0 - fz) * oz0 + fz * oz1
            wy = (1.0 - fy) * oy0 + fy * oy1
            dwz = oz1.astype(jnp.float32) - oz0
            dwy = oy1.astype(jnp.float32) - oy0
            wzy = (wz[:, None, :] * wy[None, :, :]).reshape(kz_n * ky_row, sxp)
            dzy_y = (wz[:, None, :] * dwy[None, :, :]).reshape(kz_n * ky_row, sxp)
            dzy_z = (dwz[:, None, :] * wy[None, :, :]).reshape(kz_n * ky_row, sxp)
            ox0 = (ixs == x0i)
            ox1 = (ixs == x1i)
            wx = (1.0 - fx) * ox0 + fx * ox1
            dwx = ox1.astype(jnp.float32) - ox0
            wx2 = jnp.concatenate([wx, dwx], axis=1)
            q2 = jnp.dot(box_row.reshape(kz_n * ky_row, sxp), wx2,
                         preferred_element_type=jnp.float32)
            q = q2[:, :sxp]
            qd = q2[:, sxp:]
            vmask = valid.astype(jnp.float32)
            s_row = jnp.sum(wzy * q, axis=0, keepdims=True) * vmask
            dsx = jnp.sum(wzy * qd, axis=0, keepdims=True) * vmask
            dsy = jnp.sum(dzy_y * q, axis=0, keepdims=True) * vmask
            dsz = jnp.sum(dzy_z * q, axis=0, keepdims=True) * vmask
            t_row = tgt_ref[r, :].reshape(1, sxp)
            ss_acc = ss_acc + jnp.sum(s_row * s_row)
            st_acc = st_acc + jnp.sum(s_row * t_row)
            for a, d in enumerate((dsx, dsy, dsz)):
                us = d * s_row
                ut = d * t_row * vmask
                a1s = jnp.sum(us * xs)
                a0s = jnp.sum(us)
                a1t = jnp.sum(ut * xs)
                a0t = jnp.sum(ut)
                g_acc[a * 4 + 0] += a1s
                g_acc[a * 4 + 1] += yf * a0s
                g_acc[a * 4 + 2] += zf * a0s
                g_acc[a * 4 + 3] += a0s
                g_acc[12 + a * 4 + 0] += a1t
                g_acc[12 + a * 4 + 1] += yf * a0t
                g_acc[12 + a * 4 + 2] += zf * a0t
                g_acc[12 + a * 4 + 3] += a0t
        cur = out_ref[:]
        new = (cur + jnp.where(_cell(srow, scol), ss_acc, 0.0)
               + jnp.where(_cell(8 + srow, scol), st_acc, 0.0))
        for g in range(24):
            new = new + jnp.where(_cell(32 + 8 * g + srow, scol), g_acc[g], 0.0)
        new = jnp.where(_cell(16, 0), cur * fits, new)
        out_ref[:] = new

    @pl.when(step % 2 == 0)
    def _():
        compute(box0, sem0)

    @pl.when(step % 2 == 1)
    def _():
        compute(box1, sem1)


def _corr_grad_pallas_raw(src, tgt2d, m16, k, rows, sz, sy, sx, sxp,
                          interpret=False):
    n_rows = sz * sy
    n_steps = n_rows // rows
    kz_n = min(k, sz)
    ky_n = min(k + rows, sy)
    kernel = partial(_grad_kernel, k=k, rows=rows, sz=sz, sy=sy, sx=sx,
                     sxp=sxp, n_steps=n_steps)
    out = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((rows, sxp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((224, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((224, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((kz_n, ky_n, sxp), jnp.float32),
            pltpu.VMEM((kz_n, ky_n, sxp), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(m16, src, tgt2d)
    ss = jnp.sum(out[0:8])
    st = jnp.sum(out[8:16])
    g = jnp.stack([jnp.sum(out[32 + 8 * i:40 + 8 * i]) for i in range(24)])
    return ss, st, g[:12], g[12:], out[16, 0] > 0.5


def _corr_pallas_raw(src, tgt2d, m16, k, rows, sz, sy, sx, sxp,
                     interpret=False):
    n_rows = sz * sy
    n_steps = n_rows // rows
    kz_n = min(k, sz)
    ky_n = min(k + rows, sy)
    kernel = partial(_kernel, k=k, rows=rows, sz=sz, sy=sy, sx=sx, sxp=sxp,
                     n_steps=n_steps)
    out = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((rows, sxp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((24, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((24, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((kz_n, ky_n, sxp), jnp.float32),
            pltpu.VMEM((kz_n, ky_n, sxp), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(m16, src, tgt2d)
    # tree-reduce the spread partials (pairwise-accurate, vs sequential)
    return jnp.sum(out[0:8]), jnp.sum(out[8:16]), out[16, 0] > 0.5


def _corr_pallas_raw_nprobe(src, tgt2d, m16s, k, rows, sz, sy, sx, sxp,
                            n_mats, interpret=False):
    n_steps = sz * sy // rows
    kz_n = min(k, sz)
    ky_n = min(k + rows, sy)
    kernel = partial(_kernel_nprobe, k=k, rows=rows, sz=sz, sy=sy, sx=sx,
                     sxp=sxp, n_steps=n_steps, n_mats=n_mats)
    out = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((n_mats, 16), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((rows, sxp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((24 * n_mats, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((24 * n_mats, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((kz_n, ky_n, sxp), jnp.float32),
            pltpu.VMEM((kz_n, ky_n, sxp), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(m16s, src, tgt2d)
    o = out.reshape(n_mats, 24, 128)
    ss = jnp.sum(o[:, 0:8], axis=(1, 2))
    st = jnp.sum(o[:, 8:16], axis=(1, 2))
    fit = o[:, 16, 0] > 0.5
    return ss, st, fit


def corr3d_partials_nprobe(src, tgt, m12s, interpret=False, k_mode=None,
                           rows=None):
    """(ss, st) of N matrices in ONE kernel launch — the vectorized
    line-search probe batch (SURVEY §7 step 4's allowed multi-probe
    deviation). Per block the kernel DMAs the UNION footprint box once
    and contracts every matrix against it, so the probe batch amortizes
    both the per-call issue floor and the HBM box traffic. Same K-tier
    cascade (start tier = the batch's worst analytic bound); matrices
    whose footprint outgrows every tier get the exact gather values."""
    if k_mode is None:
        env = os.environ.get("MIL_PALLAS_K", "cascade")
        k_mode = env if env == "cascade" else int(env)
    if rows is None:
        env_rows = os.environ.get("MIL_PALLAS_ROWS")
        if env_rows:
            rows = int(env_rows)
        else:
            sz0, sy0, _ = src.shape
            rows = next((r for r in (16, 8) if (sz0 * sy0) % r == 0),
                        DEFAULT_ROWS)
    return _corr3d_partials_nprobe_impl(src, tgt, m12s, interpret, k_mode,
                                        rows)


@partial(jax.jit, static_argnames=("interpret", "k_mode", "rows"))
def _corr3d_partials_nprobe_impl(src, tgt, m12s, interpret, k_mode, rows):
    sz, sy, sx = src.shape
    m12s = jnp.asarray(m12s, jnp.float32)

    def gather_all(_):
        return jax.vmap(lambda m: _corr_gather(src, tgt, m))(m12s)

    if (sz * sy) % rows:
        return gather_all(None)
    sxp = -(-sx // 128) * 128
    src_p, tgt_p = src, tgt
    if sxp != sx:
        src_p = jnp.pad(src, ((0, 0), (0, 0), (0, sxp - sx)))
        tgt_p = jnp.pad(tgt, ((0, 0), (0, 0), (0, sxp - sx)))
    n_mats = int(m12s.shape[0])
    m16s = jnp.zeros((n_mats, 16), jnp.float32).at[:, :12].set(m12s)
    tgt2d = tgt_p.reshape(sz * sy, sxp)

    def run(k):
        return _corr_pallas_raw_nprobe(src_p, tgt2d, m16s, k, rows, sz, sy,
                                       sx, sxp, n_mats, interpret)

    def mixed(ss, st, fit):
        """Kernel values where fit, exact gather values for the rest."""
        def full(_):
            gss, gst = gather_all(None)
            return jnp.where(fit, ss, gss), jnp.where(fit, st, gst)

        return lax.cond(fit.all(), lambda _: (ss, st), full, None)

    if k_mode != "cascade":
        ss, st, fit = run(int(k_mode))
        if int(k_mode) >= max(sy, sz):
            return ss, st
        return mixed(ss, st, fit)

    k64_bytes = 2 * 4 * min(64, sz) * min(64 + rows, sy) * sxp
    have64 = k64_bytes <= 12 * 1024 * 1024
    # K >= max(sy, sz) clamps the window to the whole volume and always
    # fits — prune unreachable tiers (see _corr3d_partials_pallas_impl)
    cover = max(sy, sz)

    span_x = jnp.float32(sx - 1)
    y_need = (jnp.abs(m12s[:, 4]) * span_x
              + jnp.abs(m12s[:, 5] - 1.0) * (rows - 1)
              + jnp.abs(m12s[:, 6]) + 3.0)
    z_need = (jnp.abs(m12s[:, 8]) * span_x
              + jnp.abs(m12s[:, 9]) * (rows - 1)
              + jnp.abs(m12s[:, 10] - 1.0) + 3.0)
    need = jnp.max(jnp.maximum(y_need, z_need))

    def tier64(_):
        if not have64:
            return gather_all(None)
        ss, st, fit = run(64)
        if 64 >= cover:
            return ss, st
        return mixed(ss, st, fit)

    def tier32(_):
        ss, st, fit = run(32)
        if 32 >= cover:
            return ss, st
        return lax.cond(fit.all(), lambda _: (ss, st), tier64, None)

    def tier16(_):
        ss, st, fit = run(16)
        if 16 >= cover:
            return ss, st
        return lax.cond(fit.all(), lambda _: (ss, st), tier32, None)

    def tier8(_):
        ss, st, fit = run(8)
        if 8 >= cover:
            return ss, st
        return lax.cond(fit.all(), lambda _: (ss, st), tier16, None)

    if cover <= 8:
        return tier8(None)
    if cover <= 16:
        return lax.cond(need <= 8, tier8, tier16, None)
    if cover <= 32:
        return lax.cond(
            need <= 8, tier8,
            lambda _: lax.cond(need <= 16, tier16, tier32, None), None)
    return lax.cond(
        need <= 8, tier8,
        lambda _: lax.cond(
            need <= 16, tier16,
            lambda _: lax.cond(need <= 32, tier32, tier64, None),
            None),
        None)


def corr3d_grad_pallas(src, tgt, tmx, interpret=False, k_mode=None,
                       rows=None):
    """Fused NCC partials + gradient sums: returns (ss, st, gs, gt) with
    gs[j] = sum s*ds/dm_j and gt[j] = sum t*ds/dm_j. Same K-tier cascade
    as :func:`corr3d_partials_pallas`; non-fitting matrices fall back to
    XLA autodiff through the exact gather formulation."""
    if k_mode is None:
        env = os.environ.get("MIL_PALLAS_K", "cascade")
        k_mode = env if env == "cascade" else int(env)
    if rows is None:
        env_rows = os.environ.get("MIL_PALLAS_ROWS")
        if env_rows:
            rows = int(env_rows)
        else:
            sz0, sy0, _ = src.shape
            rows = next((r for r in (16, 8) if (sz0 * sy0) % r == 0),
                        DEFAULT_ROWS)
    return _corr3d_grad_pallas_impl(src, tgt, tmx, interpret, k_mode, rows)


def grad_fallback_xla(src, tgt, tmx):
    """(ss, st, gs, gt) via XLA autodiff through the exact gather path —
    the correctness anchor for the Pallas gradient kernel and the
    fallback for footprints beyond every K tier."""
    def f(m):
        ss, st = _corr_gather(src, tgt, m)
        return jnp.stack([ss, st])

    vals, vjp = jax.vjp(f, jnp.asarray(tmx, jnp.float32))
    gs = 0.5 * vjp(jnp.array([1.0, 0.0], jnp.float32))[0]
    gt = vjp(jnp.array([0.0, 1.0], jnp.float32))[0]
    return vals[0], vals[1], gs, gt


@partial(jax.jit, static_argnames=("interpret", "k_mode", "rows"))
def _corr3d_grad_pallas_impl(src, tgt, tmx, interpret, k_mode, rows):
    sz, sy, sx = src.shape
    if (sz * sy) % rows:
        return grad_fallback_xla(src, tgt, tmx)
    sxp = -(-sx // 128) * 128
    src_u, tgt_u = src, tgt
    if sxp != sx:
        src = jnp.pad(src, ((0, 0), (0, 0), (0, sxp - sx)))
        tgt = jnp.pad(tgt, ((0, 0), (0, 0), (0, sxp - sx)))
    tmx = jnp.asarray(tmx, jnp.float32)
    m16 = jnp.zeros((1, 16), jnp.float32).at[0, :12].set(tmx)
    tgt2d = tgt.reshape(sz * sy, sxp)

    def run(kk):
        return _corr_grad_pallas_raw(src, tgt2d, m16, kk, rows, sz, sy, sx,
                                     sxp, interpret)

    def gather(_):
        return grad_fallback_xla(src_u, tgt_u, tmx)

    if k_mode != "cascade":
        ss, st, gs, gt, fit = run(int(k_mode))
        if int(k_mode) >= max(sy, sz):
            return ss, st, gs, gt
        return lax.cond(fit, lambda _: (ss, st, gs, gt), gather, None)

    k64_bytes = 2 * 4 * min(64, sz) * min(64 + rows, sy) * sxp
    have64 = k64_bytes <= 12 * 1024 * 1024
    # K >= max(sy, sz) clamps the window to the whole volume and always
    # fits — prune unreachable tiers (see _corr3d_partials_pallas_impl)
    cover = max(sy, sz)

    span_x = jnp.float32(sx - 1)
    y_need = (jnp.abs(tmx[4]) * span_x
              + jnp.abs(tmx[5] - 1.0) * (rows - 1)
              + jnp.abs(tmx[6])
              + 3.0)
    z_need = (jnp.abs(tmx[8]) * span_x
              + jnp.abs(tmx[9]) * (rows - 1)
              + jnp.abs(tmx[10] - 1.0) + 3.0)
    need = jnp.maximum(y_need, z_need)

    def tier64(_):
        if not have64:
            return gather(None)
        ss, st, gs, gt, fit = run(64)
        if 64 >= cover:
            return ss, st, gs, gt
        return lax.cond(fit, lambda _: (ss, st, gs, gt), gather, None)

    def tier32(_):
        ss, st, gs, gt, fit = run(32)
        if 32 >= cover:
            return ss, st, gs, gt
        return lax.cond(fit, lambda _: (ss, st, gs, gt), tier64, None)

    def tier16(_):
        ss, st, gs, gt, fit = run(16)
        if 16 >= cover:
            return ss, st, gs, gt
        return lax.cond(fit, lambda _: (ss, st, gs, gt), tier32, None)

    def tier8(_):
        ss, st, gs, gt, fit = run(8)
        if 8 >= cover:
            return ss, st, gs, gt
        return lax.cond(fit, lambda _: (ss, st, gs, gt), tier16, None)

    if cover <= 8:
        return tier8(None)
    if cover <= 16:
        return lax.cond(need <= 8, tier8, tier16, None)
    if cover <= 32:
        return lax.cond(
            need <= 8, tier8,
            lambda _: lax.cond(need <= 16, tier16, tier32, None), None)
    return lax.cond(
        need <= 8, tier8,
        lambda _: lax.cond(
            need <= 16, tier16,
            lambda _: lax.cond(need <= 32, tier32, tier64, None),
            None),
        None)


def corr3d_partials_pallas(src, tgt, tmx, interpret=False, k_mode=None,
                           rows=None):
    """Fused resample + NCC partials as a Pallas kernel. ``k_mode``: an
    int K | "cascade" (default, or MIL_PALLAS_K): cascade starts at the
    tier an analytic footprint bound selects, escalates through
    K = 8/16/32/64 on the kernel's exact fit check, and falls back to
    the exact gather path last.

    The env knobs resolve in THIS eager wrapper (not inside the jitted
    impl) so toggling MIL_PALLAS_K / MIL_PALLAS_ROWS takes effect on the
    next call instead of being frozen by the first trace. (Calls from
    inside another jit — the device ladder — still freeze them into that
    program, which is inherent to a single compiled ladder.)"""
    if k_mode is None:
        env = os.environ.get("MIL_PALLAS_K", "cascade")
        k_mode = env if env == "cascade" else int(env)
    if rows is None:
        env_rows = os.environ.get("MIL_PALLAS_ROWS")
        if env_rows:
            rows = int(env_rows)
        else:
            # measured on v5e at 128^3: rows=16 2.50 ms/eval, rows=8
            # 3.09, rows=32 3.33 (VMEM window growth) -> prefer 16
            sz0, sy0, _ = src.shape
            rows = next((r for r in (16, 8) if (sz0 * sy0) % r == 0),
                        DEFAULT_ROWS)
    return _corr3d_partials_pallas_impl(src, tgt, tmx, interpret, k_mode,
                                        rows)


@partial(jax.jit, static_argnames=("interpret", "k_mode", "rows"))
def _corr3d_partials_pallas_impl(src, tgt, tmx, interpret, k_mode, rows):
    sz, sy, sx = src.shape
    if (sz * sy) % rows:
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

    def run(k):
        return _corr_pallas_raw(src, tgt2d, m16, k, rows, sz, sy, sx, sxp,
                                interpret)

    def gather(_):
        return _corr_gather(src_u, tgt_u, tmx)

    if k_mode == "cascade":
        # K tiers 8 -> 16 -> 32 (-> 64 when VMEM allows) before the
        # exact-gather fallback: line searches probe far-out matrices
        # whose footprints blow past the small boxes, and each gather hit
        # costs ~170 ms at 128^3 — measured ladders with fewer tiers
        # spent most of their time there (69 s with K=16-only vs ~10 s
        # cascaded). The K=64 tier catches the line search's wild
        # rotation probes (a 20-degree probe measured 36.7 ms at K=64 vs
        # 165 ms via gather, exact to 4e-6).
        #
        # The START tier comes from a conservative ANALYTIC footprint
        # bound computed from the matrix, so probes that obviously need a
        # big box skip the doomed small-tier attempts (each failed tier
        # costs its full kernel run). The kernel's own exact fit check
        # still guards every tier — an analytic underestimate only costs
        # one escalation, never correctness.
        k64_bytes = 2 * 4 * min(64, sz) * min(64 + rows, sy) * sxp
        have64 = k64_bytes <= 12 * 1024 * 1024

        # A tier with K >= max(sy, sz) clamps its window to the WHOLE
        # volume (kz_n = min(K, sz), ky_row = min(K, sy)) and therefore
        # always fits — tiers above it and the gather fallback are
        # unreachable. Prune the chain there: small volumes (pyramid
        # coarse levels, tests) compile 1-2 tiers instead of 4 + gather
        # (every unreachable tier costs XLA compile time, and on the
        # tunneled TPU minutes-scale device program load).
        cover = max(sy, sz)

        # The block box grants a +1-row-per-row y allowance (ky_n = K +
        # rows), so the EXCESS drift per row is |m11 - 1| — for m11 near
        # -1 (mirror-like probes) the drift is ~2 rows/row, which
        # max(|m11|-1, 0) would miss and burn three doomed tiers on.
        span_x = jnp.float32(sx - 1)
        # y-from-z term |m12| (tmx[6]): within a block the z index steps by
        # one at the y-row wrap, shearing the y footprint — mirror the
        # z_need treatment of tmx[10] so z-shear-into-y matrices don't
        # start at a doomed small tier.
        y_need = (jnp.abs(tmx[4]) * span_x
                  + jnp.abs(tmx[5] - 1.0) * (rows - 1)
                  + jnp.abs(tmx[6])
                  + 3.0)
        z_need = (jnp.abs(tmx[8]) * span_x
                  + jnp.abs(tmx[9]) * (rows - 1)
                  + jnp.abs(tmx[10] - 1.0) + 3.0)
        need = jnp.maximum(y_need, z_need)

        def tier64(_):
            if not have64:
                return gather(None)
            ss64, st64, fit64 = run(64)
            if 64 >= cover:
                return ss64, st64
            return lax.cond(fit64, lambda _: (ss64, st64), gather, None)

        def tier32(_):
            ss32, st32, fit32 = run(32)
            if 32 >= cover:
                return ss32, st32
            return lax.cond(fit32, lambda _: (ss32, st32), tier64, None)

        def tier16(_):
            ss16, st16, fit16 = run(16)
            if 16 >= cover:
                return ss16, st16
            return lax.cond(fit16, lambda _: (ss16, st16), tier32, None)

        def tier8(_):
            ss8, st8, fit8 = run(8)
            if 8 >= cover:
                return ss8, st8
            return lax.cond(fit8, lambda _: (ss8, st8), tier16, None)

        if cover <= 8:
            return tier8(None)
        if cover <= 16:
            return lax.cond(need <= 8, tier8, tier16, None)
        if cover <= 32:
            return lax.cond(
                need <= 8, tier8,
                lambda _: lax.cond(need <= 16, tier16, tier32, None), None)
        return lax.cond(
            need <= 8, tier8,
            lambda _: lax.cond(
                need <= 16, tier16,
                lambda _: lax.cond(need <= 32, tier32, tier64, None),
                None),
            None)

    ss, st, all_fit = run(int(k_mode))
    if int(k_mode) >= max(sy, sz):
        return ss, st
    return lax.cond(all_fit, lambda _: (ss, st), gather, None)
