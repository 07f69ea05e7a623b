"""2D/3D intensity-based registration: phase correlation, exhaustive MIP
shift search, and Powell-optimized affine registration over normalized
cross-correlation, with the reference's DOF-escalation ladder and retry
semantics.

TPU-native design points:
  * The Powell cost (affine resample + NCC partials) is ONE jitted device
    call per evaluation — the analog of the reference's fused
    ``corrkernel`` + reductions (reference:src/api_subfunc.cu:954-988) but
    without its per-eval cudaMemcpyToSymbol/texture machinery.
  * The registration state the reference keeps in non-reentrant file-scope
    statics (reference:src/api_subfunc.cu:1798-1813) lives in closures; the
    library is re-entrant.
  * The 2D MIP shift-grid search evaluates its whole (2*totalStep)^2
    candidate grid in chunked vmapped device calls instead of serial
    kernel launches (reference loop: src/api_subfunc.cu:1951-1971).
  * ``gpuMemMode`` maps to real tiers: the affine ladder's resident set
    already matches the reference's memory-saving ``reg3d_affine2``
    (2 volumes); mem_mode 2 additionally streams final transforms and
    switches the phasor to its host-staged variant (``reg3d_phasor2``
    analog). Mesh sharding in microimagelib_tpu.parallel covers
    multi-chip beyond-HBM volumes.
"""

from __future__ import annotations

import math
import os

from microimagelib_tpu.utils.envflags import env_on
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from microimagelib_tpu.ops.affine import (
    affine_transform_2d,
    affine_transform_3d,
    corr2d_partials,
    corr2d_partials_batch,
    corr3d_partials,
)
from microimagelib_tpu.ops.basics import (
    align_size_3d,
    circshift,
    crop_at,
    imshift,
    max3d_with_coords,
    max_projection,
)
from microimagelib_tpu.ops.matrix import (
    compose_affine,
    dof_to_matrix,
    identity_tmx,
    matrix_to_params,
    params_to_matrix,
)
from microimagelib_tpu.ops.powell import EvalCounter, powell

NDIM = 12


# --------------------------------------------------------------------------
# Plausibility gate
# --------------------------------------------------------------------------

def checkmatrix(m, sx, sy, sz):
    """Affine sanity gate: diagonal scales in [0.5, 1.4], their sum in
    [2, 4], translations below 0.8x the extent
    (reference:src/api_reg.cpp:247-262)."""
    m = np.asarray(m, dtype=np.float64).reshape(12)
    if not (0.5 <= m[0] <= 1.4 and 0.5 <= m[5] <= 1.4 and 0.5 <= m[10] <= 1.4):
        return False
    tr = m[0] + m[5] + m[10]
    if not (2.0 <= tr <= 4.0):
        return False
    if abs(m[3]) > 0.8 * sx or abs(m[7]) > 0.8 * sy or abs(m[11]) > 0.8 * sz:
        return False
    return True


# --------------------------------------------------------------------------
# Standalone affine application (atrans3dgpu equivalents)
# --------------------------------------------------------------------------

def atrans3dgpu(img2, tmx, out_shape_zyx, device=None, mem_mode=-1):
    """Apply a 3x4 matrix to a volume, producing ``out_shape_zyx``
    (reference:src/api_reg.cpp:58-85). numpy in/out.

    mem_mode 2 (or auto when the two volumes exceed the probed budget)
    streams the transform: the source stays in host memory and each
    output z-block uploads only its bounded source window (the beyond-HBM
    analog of the reference's memory-saving tier)."""
    from microimagelib_tpu.models.deconvolution import hbm_budget_bytes
    from microimagelib_tpu.ops.affine import affine_transform_3d_streamed

    img2 = np.asarray(img2, np.float32)
    use_stream = mem_mode == 2
    if mem_mode == -1:
        budget = hbm_budget_bytes(device)
        need = 4 * (img2.size + int(np.prod(out_shape_zyx))) * 4
        if budget is not None and need > budget * 0.92:
            use_stream = True
    if use_stream:
        return affine_transform_3d_streamed(
            img2, np.asarray(tmx, np.float32), tuple(out_shape_zyx),
            budget_bytes=hbm_budget_bytes(device))
    src = jnp.asarray(img2)
    if device is not None:
        src = jax.device_put(src, device)
    out = affine_transform_3d(src, np.asarray(tmx, np.float32), tuple(out_shape_zyx))
    return np.asarray(out)


def atrans3dgpu_16bit(img2_u16, tmx, out_shape_zyx, device=None):
    """16-bit path: interpolate in float, truncate back to uint16
    (reference:src/api_reg.cpp:87-113; the reference's u16 texture config
    is broken — reference:src/api_subfunc.cu:909-919 — so we define the
    sane semantics: float trilinear then integer truncation)."""
    out = atrans3dgpu(np.asarray(img2_u16, np.float32), tmx, out_shape_zyx, device)
    return out.astype(np.uint16)


# --------------------------------------------------------------------------
# ZNCC (whole-volume)
# --------------------------------------------------------------------------

@jax.jit
def _zncc_dev(a, b):
    from microimagelib_tpu.ops.affine import sum_blocked

    am = a - jnp.mean(a)
    bm = b - jnp.mean(b)
    st = sum_blocked(am * bm)
    tt = sum_blocked(am * am)
    ss = sum_blocked(bm * bm)
    return st, tt, ss


def zncc(a, b):
    """Zero-normalized cross correlation of two equal-shape volumes
    (``zncc1``, reference:src/api_subfunc.cu:2414-2441); -2.0 sentinel on
    zero energy."""
    st, tt, ss = _zncc_dev(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32))
    denom = math.sqrt(float(tt) * float(ss))
    if denom == 0:
        return -2.0
    return float(st) / denom


# --------------------------------------------------------------------------
# Phase correlation (phasor) registration
# --------------------------------------------------------------------------

@jax.jit
def _phasor_surface3(img1, img2):
    f1c = jnp.conj(jnp.fft.rfftn(img1))
    f2 = jnp.fft.rfftn(img2)
    prod = f1c * f2
    mag = jnp.abs(prod)
    norm = jnp.where(mag != 0, prod / mag, 0.0)
    return jnp.fft.irfftn(norm, s=img1.shape)


@jax.jit
def _phasor_surface3_mm(img1, img2):
    """Phasor surface on the MXU matmul-form DFT (ops/fft_matmul.py).
    Used on TPU for large volumes, where XLA's own FFT was measured both
    slower AND inaccurate (6-7% error vs f64 ground truth at 256^3/512^3;
    BASELINE.md round-2 measurement)."""
    from microimagelib_tpu.ops.fft_matmul import irfft3_mm, rfft3_mm

    r1, i1 = rfft3_mm(img1)
    r2, i2 = rfft3_mm(img2)
    pr = r1 * r2 + i1 * i2  # conj(F1) * F2
    pi = r1 * i2 - i1 * r2
    mag = jnp.sqrt(pr * pr + pi * pi)
    nr = jnp.where(mag != 0, pr / mag, 0.0)
    ni = jnp.where(mag != 0, pi / mag, 0.0)
    return irfft3_mm(nr, ni, img1.shape[2])


def _phasor_surface(img1, img2):
    if img1.ndim == 3:
        from microimagelib_tpu.models.deconvolution import _fft_impl

        if _fft_impl(img1.shape, img1) == "matmul":
            return _phasor_surface3_mm(img1, img2)
    return _phasor_surface3(img1, img2)


def _phasor_shift_nd(img1, img2):
    """Raw phasor peak -> integer shift per axis (x, y, z ordering for 3D;
    x, y for 2D). Mirrors circshift-by-half then argmax-minus-half
    (reference:src/api_subfunc.cu:2476-2492)."""
    surf = _phasor_surface(img1, img2)
    if surf.ndim == 2:
        sy, sx = surf.shape
        surf = circshift(surf[None], sx // 2, sy // 2, 0)[0]
        _, (x, y, _z) = max3d_with_coords(surf[None])
        return [int(x) - sx // 2, int(y) - sy // 2]
    sz, sy, sx = surf.shape
    surf = circshift(surf, sx // 2, sy // 2, sz // 2)
    _, (x, y, z) = max3d_with_coords(surf)
    return [int(x) - sx // 2, int(y) - sy // 2, int(z) - sz // 2]


def _candidate_boxes(shifts, sizes):
    """Per-axis crop interpretations for the wraparound check: index 0
    keeps the found shift, 1 flips to the complementary one
    (reference:src/api_subfunc.cu:2496-2589). Returns (combs, offs, cs,
    valid) with one row per of the 2^nd combinations."""
    import itertools

    beta = 4
    nd = len(shifts)
    crop_sizes, offsets = [], []
    for i in range(nd):
        ab = abs(shifts[i])
        crop_sizes.append([sizes[i] - ab, ab])
        if shifts[i] > 0:
            offsets.append([0, sizes[i] - ab])
        else:
            offsets.append([ab, 0])
    combs, offs, cs, valid = [], [], [], []
    for comb in itertools.product(*([range(2)] * nd)):
        combs.append(comb)
        offs.append([offsets[i][comb[i]] for i in range(nd)])
        cs.append([crop_sizes[i][comb[i]] for i in range(nd)])
        valid.append(not any(crop_sizes[i][comb[i]] <= sizes[i] // beta
                             for i in range(nd)))
    return combs, offs, cs, valid


@jax.jit
def _imshift_dyn(a, dx, dy, dz):
    """imshift with TRACED shift values (one compiled program per volume
    shape, not per shift)."""
    sz, sy, sx = a.shape
    out = jnp.roll(a, shift=(dz, dy, dx), axis=(0, 1, 2))
    zi = jnp.arange(sz)[:, None, None]
    yi = jnp.arange(sy)[None, :, None]
    xi = jnp.arange(sx)[None, None, :]
    ok = ((zi - dz >= 0) & (zi - dz < sz)
          & (yi - dy >= 0) & (yi - dy < sy)
          & (xi - dx >= 0) & (xi - dx < sx))
    return jnp.where(ok, out, 0.0)


@jax.jit
def _masked_zncc_boxes(a, b, offs_xyz, cs_xyz, valid):
    """ZNCC of up-to-2^nd box hypotheses in ONE program: each box is a
    contiguous [off, off+cs) region evaluated as a masked reduction over
    the full (fixed-shape) volume, so no crop shape specializes the
    compiled program. Box offsets/sizes are traced data.

    a, b: (z, y, x); offs_xyz/cs_xyz: (n, 3) int32 (x, y, z per row);
    valid: (n,) bool. Returns (n,) ZNCCs (-3 for invalid rows)."""
    sz, sy, sx = a.shape
    zi = jnp.arange(sz)[:, None, None]
    yi = jnp.arange(sy)[None, :, None]
    xi = jnp.arange(sx)[None, None, :]
    # pre-centering by the global means costs nothing (per-box mean
    # subtraction removes any constant) and avoids f32 cancellation in
    # the sum-of-squares form
    a = a - jnp.mean(a)
    b = b - jnp.mean(b)

    def one(off, cs, ok):
        from microimagelib_tpu.ops.affine import sum_blocked

        w = ((xi >= off[0]) & (xi < off[0] + cs[0])
             & (yi >= off[1]) & (yi < off[1] + cs[1])
             & (zi >= off[2]) & (zi < off[2] + cs[2])).astype(a.dtype)
        n = jnp.sum(w)
        sa = sum_blocked(w * a)
        sb = sum_blocked(w * b)
        saa = sum_blocked(w * a * a)
        sbb = sum_blocked(w * b * b)
        sab = sum_blocked(w * a * b)
        nz = jnp.maximum(n, 1.0)
        va = saa - sa * sa / nz
        vb = sbb - sb * sb / nz
        cov = sab - sa * sb / nz
        denom = jnp.sqrt(jnp.maximum(va, 0.0) * jnp.maximum(vb, 0.0))
        cc = jnp.where(denom > 0, cov / denom, -2.0)
        return jnp.where(ok & (n > 0), cc, -3.0)

    return jax.vmap(one)(offs_xyz, cs_xyz, valid)


def _disambiguate_shifts(img1, img2, shifts, dims_xyz):
    """Wraparound disambiguation: when any |shift| exceeds size/4, compare
    ZNCC over the up-to-8 (3D) / 4 (2D) crop interpretations and flip the
    winning axes to the complementary shift
    (reference:src/api_subfunc.cu:2496-2589).

    TPU-native structure: all hypotheses are evaluated inside one jitted
    program with masked fixed-shape reductions (shift values are traced
    data), so a fresh volume shape costs ONE device program load instead
    of up to 8 shape-specialized ones."""
    beta = 4
    nd = len(shifts)
    sizes = dims_xyz
    if not any(abs(shifts[i]) > sizes[i] // beta for i in range(nd)):
        return shifts
    a3 = img1 if nd == 3 else img1[None]
    b3 = img2 if nd == 3 else img2[None]
    sh3 = list(shifts) + [0] * (3 - nd)
    shifted = _imshift_dyn(b3, jnp.int32(-sh3[0]), jnp.int32(-sh3[1]),
                           jnp.int32(-sh3[2]))
    combs, offs, cs, valid = _candidate_boxes(shifts, sizes)
    if not any(valid):
        return shifts
    # pad per-row (x, y, z) triples for the 2D case: z box = the full axis
    offs3 = np.zeros((len(combs), 3), np.int32)
    cs3 = np.ones((len(combs), 3), np.int32)
    offs3[:, :nd] = np.asarray(offs, np.int32)
    cs3[:, :nd] = np.asarray(cs, np.int32)
    ccs = np.asarray(_masked_zncc_boxes(
        a3, shifted, jnp.asarray(offs3), jnp.asarray(cs3),
        jnp.asarray(valid)))
    best = combs[int(np.argmax(ccs))]
    out = list(shifts)
    for i in range(nd):
        if best[i] == 1:
            out[i] = shifts[i] - sizes[i] if shifts[i] > 0 else shifts[i] + sizes[i]
    return out


def reg3d_phasor(img1, img2):
    """3D phase correlation with 8-case wraparound disambiguation
    (``reg3d_phasor1``, reference:src/api_subfunc.cu:2465-2590). Inputs
    are (z, y, x) device/NumPy arrays of equal shape; returns (sx, sy, sz)
    integer shifts (x, y, z order)."""
    a = jnp.asarray(img1, jnp.float32)
    b = jnp.asarray(img2, jnp.float32)
    sz, sy, sx = a.shape
    shifts = _phasor_shift_nd(a, b)
    return _disambiguate_shifts(a, b, shifts, [sx, sy, sz])


def reg2d_phasor(img1, img2):
    """2D analog (``reg2d_phasor1``, reference:src/api_subfunc.cu:2127-2224)."""
    a = jnp.asarray(img1, jnp.float32)
    b = jnp.asarray(img2, jnp.float32)
    sy, sx = a.shape
    shifts = _phasor_shift_nd(a, b)
    return _disambiguate_shifts(a, b, shifts, [sx, sy])


# --------------------------------------------------------------------------
# Low-memory (host-staged) 3D phasor — the reference's reg3d_phasor2
# --------------------------------------------------------------------------

@jax.jit
def _crosspow_chunk(s1r, s1i, s2r, s2i):
    """FFT both spectra chunks along z, normalized cross-power, inverse z
    FFT (the streamed middle pass of the phasor). All host<->device
    traffic is f32 re/im planes — the axon TPU raises UNIMPLEMENTED on
    complex64 transfers (BASELINE.md round-2 notes)."""
    f1 = jnp.fft.fft(jax.lax.complex(s1r, s1i), axis=0)
    f2 = jnp.fft.fft(jax.lax.complex(s2r, s2i), axis=0)
    prod = jnp.conj(f1) * f2
    mag = jnp.abs(prod)
    norm = jnp.where(mag != 0, prod / mag, 0.0)
    out = jnp.fft.ifft(norm, axis=0)
    return (jnp.real(out).astype(jnp.float32),
            jnp.imag(out).astype(jnp.float32))


@partial(jax.jit, static_argnames=("x_out",))
def _irfft2_argmax_slab(sr, si, n_valid, x_out):
    """Peak over the slab's first ``n_valid`` z rows (the tail slab is
    zero-padded to the chunk shape to keep one compiled program; padded
    rows must not win the argmax over negative true surface values)."""
    s = jnp.fft.irfft2(jax.lax.complex(sr, si), s=(sr.shape[1], x_out))
    zi = jnp.arange(s.shape[0])[:, None, None]
    s = jnp.where(zi < n_valid, s, -jnp.inf)
    idx = jnp.argmax(s)
    return s.reshape(-1)[idx], idx


@jax.jit
def _box_stats_slab(a_slab, b_slab, z0, offs_xyz, cs_xyz):
    """Per-slab partial sums (n, sa, sb, saa, sbb, sab) for each candidate
    box; host accumulates across slabs in float64."""
    cz, sy, sx = a_slab.shape
    zi = z0 + jnp.arange(cz)[:, None, None]
    yi = jnp.arange(sy)[None, :, None]
    xi = jnp.arange(sx)[None, None, :]

    def one(off, cs):
        w = ((xi >= off[0]) & (xi < off[0] + cs[0])
             & (yi >= off[1]) & (yi < off[1] + cs[1])
             & (zi >= off[2]) & (zi < off[2] + cs[2])).astype(a_slab.dtype)
        return jnp.stack([jnp.sum(w), jnp.sum(w * a_slab), jnp.sum(w * b_slab),
                          jnp.sum(w * a_slab * a_slab),
                          jnp.sum(w * b_slab * b_slab),
                          jnp.sum(w * a_slab * b_slab)])

    return jax.vmap(one)(offs_xyz, cs_xyz)


def reg3d_phasor_lowmem(img1, img2, budget_bytes=None):
    """3D phase correlation with the device never holding a full volume —
    the TPU-native analog of the memory-saving ``reg3d_phasor2``
    (reference:src/api_subfunc.cu:2591-2726), which staged spectra through
    host RAM. Both spectra, the cross-power surface, and the disambiguation
    statistics are streamed through host numpy buffers in z-slab / y-chunk
    passes; results match ``reg3d_phasor`` (float32 rounding aside)."""
    from microimagelib_tpu.models.decon_streamed import _chunk_counts

    a = np.asarray(img1, np.float32)
    b = np.asarray(img2, np.float32)
    sz, sy, sx = a.shape
    xh = sx // 2 + 1
    # ceil-sized chunks, tail zero-padded back to the chunk shape: every
    # row covered for arbitrary extents (a floor-sized loop would skip
    # the tail and leak uninitialized scratch into the z-FFT) with ONE
    # compiled program per pass (a tail-shaped second program would pay
    # another minutes-scale axon device load)
    nz, ny = _chunk_counts(a.shape, budget_bytes)
    cz, cy = -(-sz // nz), -(-sy // ny)
    from microimagelib_tpu.models.decon_streamed import _fft2_slab, _pad_axis

    spec1r = np.empty((sz, sy, xh), np.float32)
    spec1i = np.empty((sz, sy, xh), np.float32)
    spec2r = np.empty((sz, sy, xh), np.float32)
    spec2i = np.empty((sz, sy, xh), np.float32)
    for lo in range(0, sz, cz):
        n = min(cz, sz - lo)
        sl = slice(lo, lo + n)
        r, m = _fft2_slab(_pad_axis(a[sl], 0, cz))
        spec1r[sl], spec1i[sl] = np.asarray(r)[:n], np.asarray(m)[:n]
        r, m = _fft2_slab(_pad_axis(b[sl], 0, cz))
        spec2r[sl], spec2i[sl] = np.asarray(r)[:n], np.asarray(m)[:n]
    for lo in range(0, sy, cy):
        n = min(cy, sy - lo)
        sl = slice(lo, lo + n)
        r, m = _crosspow_chunk(_pad_axis(spec1r[:, sl], 1, cy),
                               _pad_axis(spec1i[:, sl], 1, cy),
                               _pad_axis(spec2r[:, sl], 1, cy),
                               _pad_axis(spec2i[:, sl], 1, cy))
        spec1r[:, sl], spec1i[:, sl] = np.asarray(r)[:, :n], np.asarray(m)[:, :n]
    best_val, best_idx = -np.inf, 0
    for lo in range(0, sz, cz):
        n = min(cz, sz - lo)
        sl = slice(lo, lo + n)
        v, idx = _irfft2_argmax_slab(_pad_axis(spec1r[sl], 0, cz),
                                     _pad_axis(spec1i[sl], 0, cz),
                                     jnp.int32(n), sx)
        v = float(v)
        if v > best_val:
            best_val, best_idx = v, int(idx) + lo * sy * sx
    pz, rem = divmod(best_idx, sy * sx)
    py, px = divmod(rem, sx)

    def wrap(p, s):
        return ((p + s // 2) % s) - s // 2

    shifts = [wrap(px, sx), wrap(py, sy), wrap(pz, sz)]

    beta = 4
    if not any(abs(shifts[i]) > [sx, sy, sz][i] // beta for i in range(3)):
        return shifts
    # host-side zero-filling shift of the moving volume
    shifted = np.roll(b, shift=(-shifts[2], -shifts[1], -shifts[0]),
                      axis=(0, 1, 2))
    zi = np.arange(sz)[:, None, None]
    yi = np.arange(sy)[None, :, None]
    xi = np.arange(sx)[None, None, :]
    ok = ((zi + shifts[2] >= 0) & (zi + shifts[2] < sz)
          & (yi + shifts[1] >= 0) & (yi + shifts[1] < sy)
          & (xi + shifts[0] >= 0) & (xi + shifts[0] < sx))
    shifted = np.where(ok, shifted, 0.0).astype(np.float32)
    combs, offs, cs, valid = _candidate_boxes(shifts, [sx, sy, sz])
    if not any(valid):
        return shifts
    offs3 = jnp.asarray(np.asarray(offs, np.int32))
    cs3 = jnp.asarray(np.asarray(cs, np.int32))
    acc = np.zeros((len(combs), 6), np.float64)
    for lo in range(0, sz, cz):
        n = min(cz, sz - lo)
        sl = slice(lo, lo + n)
        # padded z rows have global zi >= sz, outside every candidate
        # box, so their weight is 0 and they contribute nothing
        acc += np.asarray(_box_stats_slab(_pad_axis(a[sl], 0, cz),
                                          _pad_axis(shifted[sl], 0, cz),
                                          jnp.int32(lo), offs3, cs3),
                          np.float64)
    ccs = np.full(len(combs), -3.0)
    for k in range(len(combs)):
        if not valid[k]:
            continue
        n, sa, sb, saa, sbb, sab = acc[k]
        if n <= 0:
            continue
        va = saa - sa * sa / n
        vb = sbb - sb * sb / n
        cov = sab - sa * sb / n
        denom = math.sqrt(max(va, 0.0) * max(vb, 0.0))
        ccs[k] = cov / denom if denom > 0 else -2.0
    best = combs[int(np.argmax(ccs))]
    out = list(shifts)
    for i in range(3):
        if best[i] == 1:
            out[i] = (shifts[i] - [sx, sy, sz][i] if shifts[i] > 0
                      else shifts[i] + [sx, sy, sz][i])
    return out


# --------------------------------------------------------------------------
# 2D registration: shift-grid search and Powell affine
# --------------------------------------------------------------------------

def _prep_2d(img1, img2):
    """Mean-subtract both 2D images; return device arrays + target SD."""
    t = np.asarray(img1, np.float64)
    s = np.asarray(img2, np.float64)
    t_ms = t - t.mean()
    sd_t = math.sqrt(float((t_ms * t_ms).sum()))
    if sd_t == 0:
        raise ValueError("SD of image 1 is zero, empty image input")
    s_ms = s - s.mean()
    return jnp.asarray(t_ms, jnp.float32), jnp.asarray(s_ms, jnp.float32), sd_t


def _cost2d(src_dev, tgt_dev, sd_t):
    def cost(p6):
        m = np.asarray(p6, np.float32)
        ss, st = corr2d_partials(src_dev, tgt_dev, m)
        ssf = math.sqrt(float(ss))
        if ssf == 0:
            return 2.0
        return -(float(st) / ssf) / sd_t
    return cost


def reg2d_shiftalign(img1, img2, tmx_init=None, shift_region=0.4, total_step=40,
                     x_only=False, records=None):
    """Exhaustive 2D translation grid search over +-shift_region*size in
    2*total_step steps per axis (``reg2d_shiftalign1``/``X1``,
    reference:src/api_subfunc.cu:1859-2120). All candidates are evaluated
    in chunked vmapped device calls. Returns (reg_ms, tmx6) where reg_ms
    is the transformed mean-subtracted source (the reference returns that
    too) and tmx6 the found 6-parameter matrix."""
    t0 = time.time()
    sy1, sx1 = np.asarray(img1).shape
    sy2, sx2 = np.asarray(img2).shape
    tgt, src, sd_t = _prep_2d(img1, img2)
    if tmx_init is not None:
        aff = np.asarray(tmx_init, np.float64).copy()
    else:
        aff = np.array([1, 0, (sx2 - sx1) // 2, 0, 1, (sy2 - sy1) // 2], np.float64)
    cost = _cost2d(src, tgt, sd_t)
    initial_cost = -cost(aff.astype(np.float32))
    if records is not None:
        records[4] = initial_cost

    off_x, off_y = aff[2], aff[5]
    step_x = sx2 * shift_region / total_step
    steps = np.arange(-int(total_step), int(total_step))
    cand_x = off_x + step_x * steps
    if x_only:
        cands = np.stack([
            np.broadcast_to(aff[0], cand_x.shape), np.broadcast_to(aff[1], cand_x.shape), cand_x,
            np.broadcast_to(aff[3], cand_x.shape), np.broadcast_to(aff[4], cand_x.shape),
            np.broadcast_to(aff[5], cand_x.shape),
        ], axis=1).astype(np.float32)
    else:
        step_y = sy2 * shift_region / total_step
        cand_y = off_y + step_y * steps
        gx, gy = np.meshgrid(cand_x, cand_y, indexing="ij")
        flat_x, flat_y = gx.ravel(), gy.ravel()
        n = flat_x.size
        cands = np.stack([
            np.broadcast_to(aff[0], (n,)), np.broadcast_to(aff[1], (n,)), flat_x,
            np.broadcast_to(aff[3], (n,)), np.broadcast_to(aff[4], (n,)), flat_y,
        ], axis=1).astype(np.float32)
    # evaluate candidates in chunks to bound memory
    best_cost = 0.0  # reference starts the max at 0 => shift stays (0,0) if all <= 0
    best_x, best_y = 0.0, 0.0
    chunk = 256
    for i in range(0, len(cands), chunk):
        batch = jnp.asarray(cands[i : i + chunk])
        ss_b, st_b = corr2d_partials_batch(src, tgt, batch)
        ss_b = np.asarray(ss_b)
        st_b = np.asarray(st_b)
        with np.errstate(divide="ignore", invalid="ignore"):
            ncc = np.where(np.sqrt(ss_b) == 0, -2.0, st_b / np.sqrt(ss_b) / sd_t)
        j = int(np.argmax(ncc))
        if ncc[j] > best_cost:
            best_cost = float(ncc[j])
            best_x = float(cands[i + j, 2])
            best_y = float(cands[i + j, 5])
    aff_out = aff.copy()
    aff_out[2] = best_x
    if not x_only:
        aff_out[5] = best_y
    fret = -cost(aff_out.astype(np.float32))
    reg = affine_transform_2d(src, aff_out.astype(np.float32), (sy1, sx1))
    if records is not None:
        records[5] = fret
        records[7] = time.time() - t0
        records[8] = (2 * int(total_step)) ** 2 if not x_only else 2 * int(total_step)
    return np.asarray(reg), aff_out.astype(np.float32)


def reg2d_affine(img1, img2, tmx_init=None, aff_method=1, ftol=1e-4, it_limit=3000,
                 records=None):
    """2D Powell affine registration, 6 parameters, mean-subtracted NCC
    (``reg2d_affine1``, reference:src/api_subfunc.cu:2232-2336). Returns
    (registered original source, tmx6)."""
    t0 = time.time()
    sy1, sx1 = np.asarray(img1).shape
    sy2, sx2 = np.asarray(img2).shape
    tgt, src, sd_t = _prep_2d(img1, img2)
    if tmx_init is not None:
        aff = np.asarray(tmx_init, np.float64).copy()
    else:
        aff = np.array([1, 0, (sx2 - sx1) // 2, 0, 1, (sy2 - sy1) // 2], np.float64)
    cost = _cost2d(src, tgt, sd_t)
    counter = EvalCounter(cost)
    if records is not None:
        records[1] = -counter(aff)
    fret = None
    if aff_method > 0:
        aff, fret, _, counter = powell(aff, cost, ftol, it_limit, counter=counter)
    # final resample of the ORIGINAL (non-mean-subtracted) source
    src_orig = jnp.asarray(np.asarray(img2, np.float32))
    reg = affine_transform_2d(src_orig, aff.astype(np.float32), (sy1, sx1))
    if records is not None:
        records[3] = -fret if fret is not None else records[1]
        records[5] = counter.count
        records[7] = time.time() - t0
    return np.asarray(reg), aff.astype(np.float32)


# --------------------------------------------------------------------------
# 3D Powell affine registration core
# --------------------------------------------------------------------------

def _np_align_size_3d(img, out_shape):
    """Host twin of ops.basics.align_size_3d for the beyond-HBM tier
    (delegates to the single copy of the centering span math)."""
    from microimagelib_tpu.models.decon_streamed import np_align_size_3d

    return np_align_size_3d(img, out_shape)


def _final_transform(img2, aff_coef, out_shape, mem_mode):
    """Final re-sample of the ORIGINAL source; mem_mode 2 streams it
    through host-staged z-windows (beyond-HBM tier)."""
    if mem_mode == 2:
        from microimagelib_tpu.models.deconvolution import hbm_budget_bytes
        from microimagelib_tpu.ops.affine import affine_transform_3d_streamed

        return affine_transform_3d_streamed(
            np.asarray(img2, np.float32), np.asarray(aff_coef, np.float32),
            tuple(out_shape), budget_bytes=hbm_budget_bytes(None))
    return affine_transform_3d(img2, aff_coef, out_shape)


# Typical whole-ladder cost-eval counts per affMethod (from measured
# method-7 runs, ~1400 evals; lower-DOF methods converge in fewer) —
# used only to PROJECT runtime for the watchdog gate, never to cap it.
_LADDER_EVAL_ESTIMATE = {1: 250, 2: 450, 3: 550, 4: 700, 5: 900, 6: 1100,
                         7: 1400}

# engine-auto decisions per (shape, aff_method): repeated registrations
# of the same configuration must agree, or the later call pays cold
# program loads for a different engine (see the probe comment below)
_ENGINE_DECISION_CACHE = {}


def _reg_mode1_fits(shape, device):
    """Whether the mode-1 affine ladder's working set (source + target +
    a few block temporaries, ~5 volumes) fits the probed device budget."""
    from microimagelib_tpu.models.deconvolution import hbm_budget_bytes

    budget = hbm_budget_bytes(device)
    if budget is None:
        return True
    vox = int(np.prod(shape))
    return 5 * vox * 4 <= budget * 0.92


def _resolve_reg_mem_mode(shape, mem_mode, device):
    """-1 auto / 1 HBM-resident / 2 memory-saving. Auto drops to tier 2
    when the mode-1 working set exceeds the probed budget (the
    reference's ``reg3d_affine2`` auto probe,
    reference:src/api_reg.cpp:330-372). Explicit mode 2 on a volume that
    still fits keeps the reference-identical search and only streams the
    final transform (``reg3d_affine2`` semantics: same answer, smaller
    footprint); when the volumes genuinely exceed the device, the
    beyond-HBM scheme in :func:`_reg3d_affine_lowmem` engages."""
    if mem_mode in (0, 1, 2):
        return int(mem_mode)
    return 1 if _reg_mode1_fits(shape, device) else 2


def _reg3d_affine_lowmem(img1, img2, aff_method, flag_tmx, tmx, ftol,
                         it_limit, verbose, records, device, engine,
                         want_reg=True):
    """Beyond-HBM affine registration: the device never holds a full
    volume. TPU-native replacement for ``reg3d_affine2``
    (reference:src/api_subfunc.cu:2995-3266) that goes further — the
    reference's memory-saving tier still required one full volume + one
    texture array on the GPU; here:

      1. both volumes mean-pool ON THE HOST until a level fits the mode-1
         working set, and the normal device ladder runs there;
      2. the scaled-up matrix is POLISHED at full resolution with the
         streamed NCC cost (``corr3d_partials_streamed``: one bounded
         source window + one target block on device per call) under a
         bounded eval budget BY DEFAULT (MIL_REG_STREAM_BUDGET, 100) —
         the reference's tier always searched full-res;
         MIL_REG_STREAM_POLISH=1 removes the cap, =0 disables polish;
      3. the final NCC is evaluated once with the streamed cost, and the
         final transform of the original source streams through bounded
         z-windows.

    Returns (registered, tmx12, records) like ``reg3d_affine``.
    ``want_reg=False`` skips the streamed final transform and returns
    ``None`` for the registered volume; a truthy ``want_reg`` (including
    ``'device'``) always yields a HOST array — a beyond-HBM volume cannot
    be materialized device-resident by definition."""
    from microimagelib_tpu.models.deconvolution import hbm_budget_bytes
    from microimagelib_tpu.ops.affine import corr3d_partials_streamed

    t_start = time.time()
    if records is None:
        records = np.zeros(11, dtype=np.float64)
    img1 = np.asarray(img1, np.float32)
    img2 = np.asarray(img2, np.float32)
    budget = hbm_budget_bytes(device)
    # coarse level: pool until ~5 volumes fit in half the budget
    vox_budget = (budget * 0.5 / 20.0) if budget else 96 ** 3
    factor = _auto_pool_factors(img1.shape, budget=vox_budget)
    # Pallas-NCC envelope: the pooled x-extent must fit ONE 128-lane
    # tile. Wider lanes crash the TPU compile helper (Mosaic dynamic-
    # sublane refusal, then an XLA CHECK in the cascade), and the
    # alternatives measured worse or fatal on hardware: the one-hot MXU
    # formulation materializes an O(sz*sy*sx*max(sy,sz)) intermediate
    # (200 GB OOM at (384,512,512)). Anisotropic coarse pooling is fine
    # here — the streamed full-resolution polish below restores the
    # x accuracy. Round-5 hardware, BASELINE.md beyond-HBM section.
    kz_f, ky_f, kx_f = factor
    while -(-img1.shape[2] // kx_f) > 128:
        kx_f *= 2
    factor = (kz_f, ky_f, kx_f)
    if verbose:
        print(f"\t... beyond-HBM registration: coarse ladder at "
              f"1/{factor} resolution, streamed full-resolution cost")
    c1 = _mean_pool(img1, factor)
    c2 = _mean_pool(img2, factor)
    tmx_c = (_tmx_full_to_coarse(tmx, factor)
             if (flag_tmx and tmx is not None) else None)
    _, m_coarse, rec_c = reg3d_affine(c1, c2, aff_method,
                                      tmx_c is not None, tmx_c, ftol,
                                      it_limit, verbose, None, device,
                                      engine, mem_mode=1)
    m_full = _tmx_coarse_to_full(m_coarse, factor)
    records[2] = rec_c[3]

    # host mean-subtracted copies for the streamed NCC
    total = img1.size
    tgt_ms = img1 - np.float64(img1.sum(dtype=np.float64) / total)
    tgt_ms = tgt_ms.astype(np.float32)
    sd_t = math.sqrt(float(np.sum(tgt_ms.astype(np.float64) ** 2)))
    src_ms = img2 - np.float64(img2.sum(dtype=np.float64) / total)
    src_ms = src_ms.astype(np.float32)
    if sd_t == 0:
        raise ValueError("SD of image 1 is zero, empty image input")

    n_evals = 0

    def cost_streamed(src, m12):
        nonlocal n_evals
        n_evals += 1
        ss, st = corr3d_partials_streamed(src, tgt_ms,
                                          np.asarray(m12, np.float32),
                                          budget_bytes=budget)
        ssf = math.sqrt(ss)
        if ssf == 0:
            return 2.0
        return -(st / ssf) / sd_t

    def cost_from_matrix(m12):
        return cost_streamed(src_ms, m12)

    t_e = time.time()
    fret = cost_from_matrix(m_full)
    records[1] = rec_c[1]
    records[4] = (time.time() - t_e) * 1000.0

    t_iter0 = time.time()
    # Full-resolution refinement policy (round-2 verdict #5): the
    # reference's reg3d_affine2 always searched at FULL resolution
    # (reference:src/api_subfunc.cu:2995-3266), so shipping only the
    # coarse-ladder matrix silently degrades beyond-HBM users. Default is
    # a BOUNDED streamed polish of the requested model (cap
    # MIL_REG_STREAM_BUDGET evals, default 100 — each eval streams the
    # volume through the device); MIL_REG_STREAM_POLISH=1 removes the
    # cap, =0 restores the coarse-only round-2 behavior.
    polish_env = os.environ.get("MIL_REG_STREAM_POLISH", "budget")
    if polish_env == "0":
        polish_cap = 0
    elif polish_env == "1":
        polish_cap = int(it_limit)
    else:
        polish_cap = min(int(it_limit),
                         int(os.environ.get("MIL_REG_STREAM_BUDGET", "100")))
    if polish_cap > 0:
        # polish with the REQUESTED transform model (reference dofNum
        # semantics, reference:src/api_subfunc.cu:2893-2916): methods >= 5
        # search the 12 matrix params seeded from the coarse result;
        # methods 1-4 pre-transform the source by the coarse matrix
        # (streamed) and search the residual DOF model from identity
        if aff_method >= 5:
            def cost12(p):
                return cost_from_matrix(params_to_matrix(p))

            counter = EvalCounter(cost12)
            p0 = matrix_to_params(np.asarray(m_full, np.float64))
            p_min, fret, _, _ = powell(p0, cost12, ftol, polish_cap,
                                       counter=counter)
            m_full = params_to_matrix(p_min).astype(np.float32)
        else:
            pre = _final_transform(img2, m_full, img1.shape, 2)
            pre_ms = pre - np.float64(pre.sum(dtype=np.float64) / total)
            pre_ms32 = pre_ms.astype(np.float32)
            dof_num = {1: 3, 2: 6, 3: 7, 4: 9}[aff_method]

            def cost_dof_stream(sub):
                full = np.zeros(9, np.float64)
                full[6:9] = 1.0
                full[:dof_num] = sub
                return cost_streamed(pre_ms32, dof_to_matrix(full, dof_num))

            counter = EvalCounter(cost_dof_stream)
            sub0 = np.zeros(dof_num, np.float64)
            if dof_num >= 7:
                sub0[6:dof_num] = 1.0
            p_min, fret, _, _ = powell(sub0, cost_dof_stream, ftol,
                                       polish_cap, counter=counter)
            full = np.zeros(9, np.float64)
            full[6:9] = 1.0
            full[:dof_num] = p_min
            m_full = compose_affine(np.asarray(m_full, np.float32),
                                    dof_to_matrix(full, dof_num))

    records[3] = -fret
    records[5] = n_evals
    records[6] = time.time() - t_iter0
    reg = (np.asarray(_final_transform(img2, m_full, img1.shape, 2))
           if want_reg else None)
    records[7] = time.time() - t_start
    if verbose:
        print(f"\t... optimized cross correlation value: {-fret:f};")
        print(f"\t... time cost for registration: {records[7]:f} s;")
    return reg, np.asarray(m_full, np.float32), records


@jax.jit
def _reg_stats(src_base, tgt):
    """Mean-subtracted volumes + their energies, one device program
    (the reference computes these as separate reduction launches,
    reference:src/api_subfunc.cu:2802-2824)."""
    n = src_base.size
    sm = jnp.sum(src_base) / n
    src_ms = src_base - sm
    tm = jnp.sum(tgt) / n
    tgt_ms = tgt - tm
    return (src_ms, tgt_ms, jnp.sum(src_ms * src_ms),
            jnp.sum(tgt_ms * tgt_ms))


def reg3d_affine(img1, img2, aff_method=7, flag_tmx=False, tmx=None, ftol=1e-4,
                 it_limit=3000, verbose=False, records=None, device=None,
                 engine="auto", mem_mode=-1, *, want_reg=True,
                 finish_sweeps=None, grad_finish=None):
    """Core 3D affine registration (``reg3d_affine1``,
    reference:src/api_subfunc.cu:2732-2994).

    Memory tier: the ladder's device working set is already the
    reference's memory-saving ``reg3d_affine2`` profile (one source + one
    target volume resident, reference:src/api_subfunc.cu:2995-3266);
    ``mem_mode=2`` additionally streams the FINAL full-volume transform
    through bounded host-staged windows instead of materializing source
    and output on device together.

    img1: target (fixed), img2: source (moving), equal (z, y, x) shapes.
    aff_method 0-7 as the reference ladder; flag_tmx/tmx is the input
    matrix. Returns (registered source, tmx12, records).

    engine: 'host' runs the NR Powell on the host with one device call per
    cost evaluation (the reference's structure); 'device' compiles the
    ENTIRE ladder into one on-device program (powell_device) — the
    TPU-native fast path; 'auto' picks 'device' on accelerator backends.

    records layout (len 8+): [1] initial NCC, [2] intermediate NCC,
    [3] final NCC, [4] per-eval ms, [5] total evals, [6] iteration s,
    [7] total s (reference:src/api_reg.cpp:295-300).

    finish_sweeps: cap on the grad engine's Powell finisher direction-set
    sweeps (0 = run to Powell's own ftol convergence, i.e. the full
    reference semantics; None = the MIL_REG_FINISH_SWEEPS env default,
    1). grad_finish: run the Powell finisher at all (None = the
    MIL_REG_GRAD_FINISH env default, on). Exposed as API parameters so
    callers need not mutate the environment (round-4 advisor item)."""
    t_start = time.time()
    if records is None:
        records = np.zeros(11, dtype=np.float64)
    if tuple(np.shape(img1)) != tuple(np.shape(img2)):
        # the reg3d dispatcher centered-aligns mismatched sources first
        # (reference:src/api_reg.cpp:398-407); the ladder itself assumes
        # equal extents, and the NCC kernels would mis-pad otherwise
        raise ValueError(
            f"reg3d_affine needs equal shapes, got {np.shape(img1)} vs "
            f"{np.shape(img2)}; use reg3d, which aligns the source first")
    mem_mode = _resolve_reg_mem_mode(np.shape(img1), mem_mode, device)
    if (mem_mode == 2
            and not _reg_mode1_fits(np.shape(img1), device)):
        if aff_method == 0:
            # apply-only on a beyond-HBM volume: streamed transform (or
            # pass-through), never a full-volume device upload
            out_shape = tuple(np.shape(img1))
            if flag_tmx and tmx is not None:
                reg = _final_transform(np.asarray(img2, np.float32),
                                       np.asarray(tmx, np.float32),
                                       out_shape, 2)
                out_tmx = np.asarray(tmx, np.float32).copy()
            else:
                reg = np.asarray(img2, np.float32)
                out_tmx = identity_tmx()
            records[7] = time.time() - t_start
            if verbose:
                print("\t... no registration performed!")
            return reg, out_tmx, records
        return _reg3d_affine_lowmem(img1, img2, aff_method, flag_tmx, tmx,
                                    ftol, it_limit, verbose, records,
                                    device, engine, want_reg=want_reg)
    if mem_mode == 0:
        # CPU processing tier, matching the decon entries' mode-0 routing
        # (overrides any passed accelerator device — the CLIs always pass
        # one, and '-gm 0' must actually run on the CPU)
        device = jax.devices("cpu")[0]
    if device is not None:
        # device_put the HOST arrays directly: jnp.asarray would first
        # materialize them on the DEFAULT backend (a transient full-volume
        # TPU allocation when mode 0 asked for the CPU)
        img1 = jax.device_put(np.asarray(img1, np.float32), device)
        img2 = jax.device_put(np.asarray(img2, np.float32), device)
    else:
        img1 = jnp.asarray(img1, jnp.float32)
        img2 = jnp.asarray(img2, jnp.float32)
    sz, sy, sx = img1.shape

    if aff_method == 0:
        if flag_tmx and tmx is not None:
            reg = affine_transform_3d(img2, np.asarray(tmx, np.float32), img1.shape)
            out_tmx = np.asarray(tmx, np.float32).copy()
        else:
            reg = img2
            out_tmx = identity_tmx()
        records[7] = time.time() - t_start
        if verbose:
            print("\t... no registration performed!")
        if not want_reg:
            reg = None
        elif want_reg != "device":
            reg = np.asarray(reg)
        return reg, out_tmx, records

    def _finish_reg(aff_coef):
        """Final full-volume transform of the source — skipped (None) for
        ``want_reg=False`` callers (pyramid coarse/mid stages need only
        the matrix), left device-resident for ``want_reg='device'``
        callers (the fusion pipeline feeds it straight to the decon —
        the host fetch alone costs ~0.3-0.4 s at fusion shapes on a
        tunneled device)."""
        if not want_reg:
            return None
        reg = _final_transform(img2, aff_coef, img1.shape, mem_mode)
        return reg if want_reg == "device" else np.asarray(reg)

    aff_initial = identity_tmx().astype(np.float64)
    pre_transformed = False
    if flag_tmx and tmx is not None:
        if aff_method == 5:
            aff_initial = np.asarray(tmx, np.float64).copy()
        else:
            src_pre = affine_transform_3d(img2, np.asarray(tmx, np.float32), img1.shape)
            pre_transformed = True

    # --- preprocess both volumes in ONE program: mean-subtract + energy
    # (each separate scalar fetch is a full dispatch+fetch round trip on
    # a tunneled device; the old 4-fetch sequence cost ~0.1-0.2 s) ---
    src_base = src_pre if pre_transformed else img2
    src_ms, tgt_ms, se2, st2 = _reg_stats(src_base, img1)
    se2_f, st2_f = jax.device_get((se2, st2))
    src_energy = math.sqrt(float(se2_f))
    if src_energy == 0:
        raise ValueError("SD of image 2 is zero, empty image input or empty image after initial transformation")
    sd_t = math.sqrt(float(st2_f))
    if sd_t == 0:
        raise ValueError("SD of image 1 is zero, empty image input")

    # --- cost closure: one fused device call per evaluation ---
    from microimagelib_tpu.ops.affine_fast import (
        corr3d_auto,
        resolve_ncc_impl,
    )

    def cost_from_matrix(m12):
        ss, st = corr3d_auto(src_ms, tgt_ms, np.asarray(m12, np.float32))
        ssf = math.sqrt(float(ss))
        if ssf == 0:
            return 2.0
        return -(float(st) / ssf) / sd_t

    def cost12(p):
        return cost_from_matrix(params_to_matrix(p))

    def cost_dof(dof_vec, dof_num):
        return cost_from_matrix(dof_to_matrix(dof_vec, dof_num))

    # one counter shared across ladder stages so it_limit caps the total,
    # as the reference's itNumStatic does
    counter = EvalCounter(None)

    t1 = time.time()
    p_init = matrix_to_params(aff_initial)
    initial_cost = cost12(p_init)
    records[1] = -initial_cost
    records[4] = (time.time() - t1) * 1000.0
    if verbose:
        print(f"\t... initial cross correlation value: {-initial_cost:f};")
        print(f"\t... time cost for single sub iteration: {records[4]:f} ms;")

    t_iter0 = time.time()

    if engine == "auto" and os.environ.get("MIL_REG_ENGINE"):
        engine = os.environ.get("MIL_REG_ENGINE")

    if engine == "auto":
        from microimagelib_tpu.utils.device import committed_platform

        platform = committed_platform(src_ms)
        if platform == "cpu":
            # CPU-committed volumes (mem_mode 0, CPU hosts) have no
            # device watchdog: the single-program ladder is always right
            engine = "device"
        elif env_on("MIL_REG_GRAD", True):
            # accelerator default (round 3): the gradient ladder — the
            # analytic-gradient L-BFGS stages reach the Powell finisher's
            # basin in ~10x fewer evaluations, and the finisher
            # guarantees at-least-Powell NCC (registration_grad.py).
            # MIL_REG_GRAD=0 restores the round-2 measured auto choice.
            engine = "grad"
        else:
            # accelerator: the single-program ladder is fastest, but very
            # long single executions can trip device watchdogs (observed:
            # a 128^3 ladder at gather-cost speed ~240 s crashed the
            # worker; at Pallas speed ~8 s it is fine). Project the whole-
            # ladder runtime from a MEASURED warm cost eval and fall back
            # to the hybrid one-call-per-linmin engine above the budget.
            # MIL_DEVICE_LADDER_MAX_VOXELS restores the fixed voxel gate.
            # The decision is CACHED per (shape, method): the eager probe
            # carries a ~25-50 ms dispatch-overhead floor on the axon
            # tunnel, so a borderline projection could flip between
            # calls — and a flip leaves the chosen engine's programs
            # cold in the later call, costing minutes of device program
            # loads (observed: a warm-then-timed pair where the timed
            # call flipped measured 230 s instead of 6).
            max_vox_env = os.environ.get("MIL_DEVICE_LADDER_MAX_VOXELS")
            # the budget and NCC-impl env knobs change the decision (and
            # the per-eval speed being probed), so they key the cache too
            # — otherwise flipping them mid-process silently reuses a
            # stale engine choice
            cache_key = (tuple(img1.shape), aff_method, int(it_limit),
                         platform,
                         os.environ.get("MIL_DEVICE_LADDER_BUDGET_S", "90"),
                         resolve_ncc_impl(src_ms))
            if max_vox_env is not None:
                engine = "device" if total <= int(max_vox_env) else "hybrid"
            elif cache_key in _ENGINE_DECISION_CACHE:
                engine = _ENGINE_DECISION_CACHE[cache_key]
            else:
                t_e = time.perf_counter()
                cost12(p_init)  # warm (initial_cost above compiled it);
                # cost_from_matrix fetches scalars, so this is fenced
                per_eval_s = time.perf_counter() - t_e
                t_e = time.perf_counter()
                cost12(p_init)  # min-of-2 reduces load/jitter bias
                per_eval_s = min(per_eval_s, time.perf_counter() - t_e)
                est_evals = min(int(it_limit),
                                _LADDER_EVAL_ESTIMATE.get(aff_method, 1400))
                budget = float(os.environ.get("MIL_DEVICE_LADDER_BUDGET_S", "90"))
                engine = ("device" if per_eval_s * est_evals <= budget
                          else "hybrid")
                _ENGINE_DECISION_CACHE[cache_key] = engine
                if verbose:
                    print(f"\t... engine auto: {per_eval_s*1e3:.1f} ms/eval x "
                          f"~{est_evals} evals -> {engine}")

    if engine == "grad" and aff_method in (1, 2, 3, 4, 5, 6, 7):
        from microimagelib_tpu.models.registration_grad import reg_ladder_grad

        # budgeted finisher (MIL_REG_FINISH_SWEEPS, 0 = uncapped): from
        # the L-BFGS point ONE Powell sweep captures the remaining
        # improvement; the run-to-ftol tail costs ~3x the evals for
        # no NCC gain (hardware A/B, BASELINE.md round-4 fusion table:
        # sweeps 1/2/uncapped = 3.37 s @ 0.8052 / 3.57 @ 0.8033 /
        # 4.74 @ 0.8048)
        from microimagelib_tpu.ops.lbfgs import lbfgs_env

        sweeps = (int(os.environ.get("MIL_REG_FINISH_SWEEPS", "1"))
                  if finish_sweeps is None else int(finish_sweeps))
        ls_mi, ls_pa = lbfgs_env()  # per-call env read; static jit keys
        aff_dev, fret_dev, stage_costs, nev = reg_ladder_grad(
            src_ms, tgt_ms, jnp.float32(sd_t), jnp.asarray(p_init, jnp.float32),
            aff_method, jnp.float32(ftol), jnp.int32(it_limit),
            ncc_impl=resolve_ncc_impl(src_ms),
            finish=(env_on("MIL_REG_GRAD_FINISH", True)
                    if grad_finish is None else bool(grad_finish)),
            batch_ls=env_on("MIL_REG_BATCH_LS"),
            finish_sweeps=(None if sweeps <= 0 else sweeps),
            ls_max_iters=ls_mi, ls_patience=ls_pa)
        aff_coef = np.asarray(aff_dev, np.float32)
        fret = float(fret_dev)
        stage = np.asarray(stage_costs)
        if aff_method in (6, 7) and np.isfinite(stage[-2 if aff_method == 7 else 0]):
            records[2] = -float(stage[2] if aff_method == 7 else stage[0])
        if verbose and aff_method == 7:
            labels = ("3 DOF", "6 DOF", "9 DOF")
            for lbl, c in zip(labels, stage[:3]):
                if np.isfinite(c):
                    print(f"\t... cross correlation value after {lbl}: {-float(c):f};")
        counter.count = int(nev)
        if flag_tmx and tmx is not None and aff_method != 5:
            aff_coef = compose_affine(np.asarray(tmx, np.float32), aff_coef)
        records[3] = -fret
        records[5] = counter.count
        records[6] = time.time() - t_iter0
        if verbose:
            print(f"\t... optimized cross correlation value: {-fret:f};")
            print(f"\t... total sub iteration number: {counter.count};")
            print(f"\t... time cost for all iterations: {records[6]:f} s;")
        reg = _finish_reg(aff_coef)
        records[7] = time.time() - t_start
        if verbose:
            print(f"\t... time cost for registration: {records[7]:f} s;")
        return reg, np.asarray(aff_coef, np.float32), records

    if engine == "hybrid" and aff_method in (1, 2, 3, 4, 5, 6, 7):
        from microimagelib_tpu.models.registration_device import (
            cost_eval_reg_device,
            linmin_reg_device,
        )

        sd_t_f = jnp.float32(sd_t)

        def stage_powell(p0, mode, this_ftol):
            def func(p):
                return float(cost_eval_reg_device(
                    src_ms, tgt_ms, sd_t_f, np.asarray(p, np.float32),
                    mode, ncc_impl=resolve_ncc_impl(src_ms)))

            def linmin_fn(p_cur, xi_cur):
                return linmin_reg_device(src_ms, tgt_ms, sd_t_f,
                                         np.asarray(p_cur, np.float32),
                                         np.asarray(xi_cur, np.float32),
                                         mode,
                                         ncc_impl=resolve_ncc_impl(src_ms))

            counter.func = func
            p_min, f_min, _, _ = powell(p0, func, this_ftol, it_limit,
                                        counter=counter, linmin_fn=linmin_fn)
            return p_min, f_min

        fret = initial_cost
        dof9 = np.zeros(9, dtype=np.float64)
        dof9[6:9] = 1.0

        def hybrid_dof_stage(dof_num, this_ftol):
            nonlocal dof9
            mode = f"dof{dof_num}"
            sub, f_min = stage_powell(dof9[:dof_num].copy(), mode, this_ftol)
            dof9[:dof_num] = sub
            return f_min

        if aff_method in (1, 2, 3, 4):
            dof_num = {1: 3, 2: 6, 3: 7, 4: 9}[aff_method]
            fret = hybrid_dof_stage(dof_num, ftol)
            aff_coef = dof_to_matrix(dof9, dof_num)
        elif aff_method == 5:
            p, fret = stage_powell(p_init.astype(np.float64), "p12", ftol)
            aff_coef = params_to_matrix(p)
        elif aff_method == 6:
            fret = hybrid_dof_stage(6, 0.01)
            records[2] = -fret
            p = matrix_to_params(dof_to_matrix(dof9, 6)).astype(np.float64)
            p, fret = stage_powell(p, "p12", ftol)
            aff_coef = params_to_matrix(p)
        else:  # aff_method == 7
            fret = hybrid_dof_stage(3, 0.01)
            if verbose:
                print(f"\t... cross correlation value after 3 DOF: {-fret:f};")
            fret = hybrid_dof_stage(6, 0.01)
            if verbose:
                print(f"\t... cross correlation value after 6 DOF: {-fret:f};")
            fret = hybrid_dof_stage(9, 0.005)
            records[2] = -fret
            if verbose:
                print(f"\t... cross correlation value after 9 DOF: {-fret:f};")
            p = matrix_to_params(dof_to_matrix(dof9, 9)).astype(np.float64)
            p, fret = stage_powell(p, "p12", ftol)
            aff_coef = params_to_matrix(p)

        if flag_tmx and tmx is not None and aff_method != 5:
            aff_coef = compose_affine(np.asarray(tmx, np.float32), aff_coef)
        records[3] = -fret
        records[5] = counter.count
        records[6] = time.time() - t_iter0
        if verbose:
            print(f"\t... optimized cross correlation value: {-fret:f};")
            print(f"\t... total sub iteration number: {counter.count};")
            print(f"\t... time cost for all iterations: {records[6]:f} s;")
        reg = _finish_reg(aff_coef)
        records[7] = time.time() - t_start
        if verbose:
            print(f"\t... time cost for registration: {records[7]:f} s;")
        return reg, np.asarray(aff_coef, np.float32), records

    if engine == "device" and aff_method in (1, 2, 3, 4, 5, 6, 7):
        from microimagelib_tpu.models.registration_device import reg_ladder_device

        aff_dev, fret_dev, stage_costs, nev = reg_ladder_device(
            src_ms, tgt_ms, jnp.float32(sd_t), jnp.asarray(p_init, jnp.float32),
            aff_method, jnp.float32(ftol), jnp.int32(it_limit),
            ncc_impl=resolve_ncc_impl(src_ms),
            batch_ls=env_on("MIL_REG_BATCH_LS"))
        aff_coef = np.asarray(aff_dev, np.float32)
        fret = float(fret_dev)
        stage = np.asarray(stage_costs)
        if aff_method in (6, 7) and np.isfinite(stage[-2 if aff_method == 7 else 0]):
            records[2] = -float(stage[2] if aff_method == 7 else stage[0])
        if verbose and aff_method == 7:
            labels = ("3 DOF", "6 DOF", "9 DOF")
            for lbl, c in zip(labels, stage[:3]):
                if np.isfinite(c):
                    print(f"\t... cross correlation value after {lbl}: {-float(c):f};")
        counter.count = int(nev)
        if flag_tmx and tmx is not None and aff_method != 5:
            aff_coef = compose_affine(np.asarray(tmx, np.float32), aff_coef)
        records[3] = -fret
        records[5] = counter.count
        records[6] = time.time() - t_iter0
        if verbose:
            print(f"\t... optimized cross correlation value: {-fret:f};")
            print(f"\t... total sub iteration number: {counter.count};")
            print(f"\t... time cost for all iterations: {records[6]:f} s;")
        reg = _finish_reg(aff_coef)
        records[7] = time.time() - t_start
        if verbose:
            print(f"\t... time cost for registration: {records[7]:f} s;")
        return reg, np.asarray(aff_coef, np.float32), records

    def run_powell(p0, fn, this_ftol):
        counter.func = fn
        p_min, f_min, _, _ = powell(p0, fn, this_ftol, it_limit, counter=counter)
        return p_min, f_min

    fret = initial_cost
    dof9 = np.zeros(9, dtype=np.float64)
    dof9[6:9] = 1.0

    def run_dof_stage(dof_num, this_ftol):
        """Optimize only the first ``dof_num`` DOF components — like the
        reference passing dofNum as Powell's dimensionality
        (reference:src/api_subfunc.cu:2893-2916); the trailing components
        keep their current values and are never searched."""
        nonlocal dof9
        sub0 = dof9[:dof_num].copy()

        def fn(sub):
            full = dof9.copy()
            full[:dof_num] = sub
            return cost_dof(full, dof_num)

        sub_min, f_min = run_powell(sub0, fn, this_ftol)
        dof9[:dof_num] = sub_min
        return f_min

    if aff_method in (1, 2, 3, 4):
        dof_num = {1: 3, 2: 6, 3: 7, 4: 9}[aff_method]
        fret = run_dof_stage(dof_num, ftol)
        aff_coef = dof_to_matrix(dof9, dof_num)
    elif aff_method == 5:
        p, fret = run_powell(p_init.astype(np.float64), cost12, ftol)
        aff_coef = params_to_matrix(p)
    elif aff_method == 6:
        fret = run_dof_stage(6, 0.01)
        records[2] = -fret
        if verbose:
            print(f"\t... cross correlation value after 6 DOF: {-fret:f};")
        p = matrix_to_params(dof_to_matrix(dof9, 6)).astype(np.float64)
        p, fret = run_powell(p, cost12, ftol)
        aff_coef = params_to_matrix(p)
    elif aff_method == 7:
        fret = run_dof_stage(3, 0.01)
        if verbose:
            print(f"\t... cross correlation value after 3 DOF: {-fret:f};")
        fret = run_dof_stage(6, 0.01)
        if verbose:
            print(f"\t... cross correlation value after 6 DOF: {-fret:f};")
        fret = run_dof_stage(9, 0.005)
        records[2] = -fret
        if verbose:
            print(f"\t... cross correlation value after 9 DOF: {-fret:f};")
        p = matrix_to_params(dof_to_matrix(dof9, 9)).astype(np.float64)
        p, fret = run_powell(p, cost12, ftol)
        aff_coef = params_to_matrix(p)
    else:
        raise ValueError("Wrong affine registration method")

    if flag_tmx and tmx is not None and aff_method != 5:
        aff_coef = compose_affine(np.asarray(tmx, np.float32), aff_coef)

    records[3] = -fret
    records[5] = counter.count
    records[6] = time.time() - t_iter0
    if verbose:
        print(f"\t... optimized cross correlation value: {-fret:f};")
        print(f"\t... total sub iteration number: {counter.count};")
        print(f"\t... time cost for all iterations: {records[6]:f} s;")

    reg = _finish_reg(aff_coef)
    records[7] = time.time() - t_start
    if verbose:
        print(f"\t... time cost for registration: {records[7]:f} s;")
    return reg, np.asarray(aff_coef, np.float32), records


# --------------------------------------------------------------------------
# multi-resolution pyramid
# --------------------------------------------------------------------------

def _pool_factors(k):
    """Normalize a pooling spec to per-axis (kz, ky, kx)."""
    if np.isscalar(k):
        return (int(k),) * 3
    kz, ky, kx = (int(v) for v in k)
    return kz, ky, kx


def _mean_pool(vol, k):
    """Per-axis mean pooling (trailing remainders cropped). k: scalar or
    (kz, ky, kx)."""
    kz, ky, kx = _pool_factors(k)
    sz, sy, sx = vol.shape
    vol = vol[: sz - sz % kz, : sy - sy % ky, : sx - sx % kx]
    return vol.reshape(sz // kz, kz, sy // ky, ky, sx // kx, kx).mean(axis=(1, 3, 5))


def _k_xyz(k):
    """Pooling factors in matrix (x, y, z) coordinate order."""
    kz, ky, kx = _pool_factors(k)
    return np.array([kx, ky, kz], np.float64)


def _tmx_coarse_to_full(m_c, k):
    """Matrix found on a pooled grid -> full-resolution matrix.
    Pooled voxel centers sit at full coordinate k_i*i + (k_i-1)/2 per
    axis, so A_f[i,j] = k_i*A_c[i,j]/k_j and
    t_f = K@t_c + delta - A_f@delta with delta_i = (k_i-1)/2."""
    m = np.asarray(m_c, np.float64).reshape(3, 4)
    kv = _k_xyz(k)
    delta = (kv - 1) / 2.0
    a_full = m[:, :3] * kv[:, None] / kv[None, :]
    t_full = kv * m[:, 3] + delta - a_full @ delta
    out = np.concatenate([a_full, t_full[:, None]], axis=1)
    return out.reshape(12).astype(np.float32)


def _tmx_full_to_coarse(m_f, k):
    m = np.asarray(m_f, np.float64).reshape(3, 4)
    kv = _k_xyz(k)
    delta = (kv - 1) / 2.0
    a_coarse = m[:, :3] / kv[:, None] * kv[None, :]
    t_coarse = (m[:, 3] - delta + m[:, :3] @ delta) / kv
    out = np.concatenate([a_coarse, t_coarse[:, None]], axis=1)
    return out.reshape(12).astype(np.float32)


def _auto_pool_factors(shape, budget=None):
    """Per-axis pyramid pooling factors: halve z and y until the coarse
    level is under ``budget`` voxels; only pool x when the pooled extent
    stays a multiple of 128 (keeps the coarse level eligible for the
    Pallas NCC kernel). Each axis only pools while its coarse extent
    stays usable (>= 8) so thin-slab volumes (e.g. 2 x 2048 x 2048)
    never pool an axis to zero; stops when no axis can pool further.

    ``budget`` defaults to MIL_REG_PYRAMID_BUDGET (160k voxels): the
    deeper coarse level costs nothing in quality (the geometric mid
    polishes re-anchor the matrix on the way up) and moves most search
    evaluations to levels where they are ~5-25x cheaper (hardware
    profile in BASELINE.md round 4)."""
    if budget is None:
        budget = int(os.environ.get("MIL_REG_PYRAMID_BUDGET",
                                    str(160_000)))
    sz0, sy0, sx0 = shape
    kz = ky = kx = 1

    def vox():
        return (sz0 // kz) * (sy0 // ky) * (sx0 // kx)

    while vox() > budget:
        progressed = False
        if (sx0 // (kx * 2)) % 128 == 0 and sx0 // (kx * 2) >= 128:
            kx *= 2
            progressed = True
        if sz0 // (kz * 2) >= 8:
            kz *= 2
            progressed = True
        if sy0 // (ky * 2) >= 8:
            ky *= 2
            progressed = True
        if not progressed:
            break
    return (kz, ky, kx)


def reg3d_affine_pyramid(img1, img2, aff_method=7, flag_tmx=False, tmx=None,
                         ftol=1e-4, it_limit=3000, verbose=False, records=None,
                         device=None, engine="auto", factor=None, mem_mode=-1,
                         *, want_reg=True):
    """Coarse-to-fine affine registration: run the DOF ladder on a
    mean-pooled pair (where each cost evaluation is factor^3 cheaper),
    then polish with a full-resolution 12-DOF stage seeded by the scaled
    matrix. A standard multi-resolution strategy the reference lacks —
    it changes the search trajectory, not the transform model, and the
    final full-resolution stage optimizes the exact same NCC objective.

    factor: pooling factor (auto: halve until the coarse level is
    <= ~96^3 voxels)."""
    # device arrays pass through — np.asarray here would fetch a
    # device-resident pair to host just to re-upload it
    img1 = jnp.asarray(img1, jnp.float32)
    img2 = jnp.asarray(img2, jnp.float32)
    if records is None:
        records = np.zeros(11, dtype=np.float64)
    if aff_method == 0:
        return reg3d_affine(img1, img2, 0, flag_tmx, tmx, ftol,
                            it_limit, verbose, records, device, engine,
                            mem_mode, want_reg=want_reg)
    if factor is None:
        factor = _auto_pool_factors(img1.shape)
    if np.isscalar(factor) and factor <= 1:
        return reg3d_affine(img1, img2, aff_method, flag_tmx, tmx, ftol,
                            it_limit, verbose, records, device, engine,
                            mem_mode, want_reg=want_reg)
    if all(v == 1 for v in _pool_factors(factor)):
        return reg3d_affine(img1, img2, aff_method, flag_tmx, tmx, ftol,
                            it_limit, verbose, records, device, engine,
                            mem_mode, want_reg=want_reg)
    c1 = _mean_pool(img1, factor)
    c2 = _mean_pool(img2, factor)
    tmx_c = _tmx_full_to_coarse(tmx, factor) if (flag_tmx and tmx is not None) else None
    if verbose:
        print(f"\t... pyramid: coarse search at 1/{_pool_factors(factor)} resolution {tuple(c1.shape)}")
    _, m_coarse, rec_c = reg3d_affine(c1, c2, aff_method, flag_tmx, tmx_c,
                                      ftol, it_limit, verbose, None, device,
                                      engine, want_reg=False)
    m_init = _tmx_coarse_to_full(m_coarse, factor)
    # Polish with the REQUESTED transform model, not an unconditional
    # 12-DOF upgrade: dofNum is Powell's exact dimensionality in the
    # reference (reference:src/api_subfunc.cu:2893-2916), so affMethod 1
    # must yield a pure translation even through the pyramid. Escalation
    # methods 6/7 already end at 12-DOF, so they polish with 5.
    polish_method = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 5, 7: 5}[aff_method]
    mids = []
    if env_on("MIL_REG_PYRAMID_MID", True):
        # geometric mid schedule (default on; MIL_REG_PYRAMID_MID=0
        # restores the 2-level pyramid): polish the REQUESTED model at
        # every halved pooling on the way up — each mid eval is ~8x
        # cheaper than the level above it, so the full-resolution stage
        # starts near-converged and spends few of its expensive evals.
        # Hardware A/Bs: BASELINE.md round-4 pyramid section (session-3
        # single-mid arm: fusion1tp 6.09 vs 6.49 s, identical NCC).
        fmid = tuple(max(1, v // 2) for v in _pool_factors(factor))
        while any(v > 1 for v in fmid):
            mids.append(fmid)
            fmid = tuple(max(1, v // 2) for v in fmid)
    # Finisher placement (MIL_REG_FINISH_LEVEL): 'mid' (default) keeps
    # the grad engine's Powell finisher through the LAST mid level
    # (where direction-set evals are ~7x cheaper) and runs the
    # full-resolution stage L-BFGS-only — the full-res gradient stage is
    # itself the verification pass (it re-optimizes the exact objective
    # at full scale); 'full' restores the round-4 behavior (finisher at
    # every level incl. full resolution). Hardware A/B in BASELINE.md
    # round 5: fusion1tp 3.61 -> 1.96 s at NCC 0.805 -> 0.802; reg128
    # 3.37 (full) vs 3.25 (mid) standalone, NCC equal 0.9981.
    mid_finish = (os.environ.get("MIL_REG_FINISH_LEVEL", "mid") == "mid"
                  and bool(mids))
    for fm in mids:
        m1 = _mean_pool(img1, fm)
        m2 = _mean_pool(img2, fm)
        if verbose:
            print(f"\t... pyramid: mid polish at 1/{fm} resolution")
        _, m_mid, _rec_m = reg3d_affine(
            m1, m2, polish_method, True, _tmx_full_to_coarse(m_init, fm),
            ftol, it_limit, verbose, None, device, engine,
            want_reg=False)
        m_init = _tmx_coarse_to_full(m_mid, fm)
    if verbose:
        print(f"\t... pyramid: full-resolution polish (method {polish_method})")
    reg, m_full, records = reg3d_affine(img1, img2, polish_method, True, m_init,
                                        ftol, it_limit, verbose, records, device,
                                        engine, mem_mode, want_reg=want_reg,
                                        grad_finish=(False if mid_finish
                                                     else None))
    records[2] = rec_c[3]  # coarse-stage NCC as the intermediate record
    return reg, m_full, records


# --------------------------------------------------------------------------
# reg3d dispatcher
# --------------------------------------------------------------------------

def reg3d(img1, img2, reg_choice=2, aff_method=7, flag_tmx=False, tmx=None,
          ftol=1e-4, it_limit=3000, device=None, mem_mode=-1, verbose=False,
          records=None, engine="auto", pyramid="auto", *, as_device=False,
          want_reg=None, grad_finish=None):
    """Main 3D registration entry (``reg3d``,
    reference:src/api_reg.cpp:264-607).

    reg_choice: 0 apply-matrix only; 1 phasor; 2 affine; 3 phasor->affine;
    4 2D-MIP-shift-align->affine. Source is centered-aligned to the
    target's shape first when sizes differ (reference:src/api_reg.cpp:
    398-407). Returns (registered, tmx12, records).

    ``as_device=True`` leaves the registered volume device-resident
    (a jax array) instead of fetching it to host — the fusion/batch
    pipelines feed it straight into the deconvolution, and the fetch
    alone costs ~0.3-0.4 s at fusion shapes on a tunneled device.

    ``want_reg=False`` skips the final full-volume transform entirely and
    returns ``None`` for the registered volume — for callers that only
    need the matrix (the batch driver re-applies it inside its fused
    per-timepoint program). Default ``None`` keeps the as_device
    behavior."""
    t0 = time.time()
    if records is None:
        records = np.zeros(11, dtype=np.float64)
    from microimagelib_tpu.utils.device import free_memory_mb

    records[8] = free_memory_mb(device)
    mem_mode_requested = mem_mode
    mem_mode = _resolve_reg_mem_mode(np.shape(img1), mem_mode, device)
    beyond_hbm = mem_mode == 2 and not _reg_mode1_fits(np.shape(img1), device)
    if mem_mode == 0:
        device = jax.devices("cpu")[0]
    if beyond_hbm:
        # beyond-HBM: volumes stay host-resident end to end; the lowmem
        # affine tier pools its own pyramid, so the outer one is skipped
        img1 = np.asarray(img1, np.float32)
        img2 = np.asarray(img2, np.float32)
        if img1.shape != img2.shape:
            img2 = _np_align_size_3d(img2, img1.shape)
        pyramid = False
    else:
        if device is not None:
            # direct device_put of the host arrays (jnp.asarray would
            # stage through the default backend first)
            img1 = jax.device_put(np.asarray(img1, np.float32), device)
            img2 = jax.device_put(np.asarray(img2, np.float32), device)
        else:
            img1 = jnp.asarray(img1, jnp.float32)
            img2 = jnp.asarray(img2, jnp.float32)
        if img1.shape != img2.shape:
            img2 = align_size_3d(img2, img1.shape)
    sz, sy, sx = img1.shape
    records[0] = 1
    records[9] = free_memory_mb(device)

    if pyramid == "auto":
        pyramid = img1.size > 96 ** 3 and engine != "host"

    if want_reg is False:
        want = False
    else:
        want = "device" if as_device else True

    def run_affine(i1, i2, method, flag, mx):
        if pyramid:
            return reg3d_affine_pyramid(i1, i2, method, flag, mx, ftol, it_limit,
                                        verbose, records, device, engine,
                                        mem_mode=mem_mode, want_reg=want)
        # grad_finish (non-pyramid engines only; the pyramid places its
        # own finisher per MIL_REG_FINISH_LEVEL): False = L-BFGS-only,
        # the batch driver's warm-timepoint speed mode
        return reg3d_affine(i1, i2, method, flag, mx, ftol, it_limit,
                            verbose, records, device, engine, mem_mode,
                            want_reg=want, grad_finish=grad_finish)

    def run_phasor(i1, i2):
        # memory-saving phasor tier (the reference's reg3d_phasor2,
        # reference:src/api_subfunc.cu:2591-2726): explicit mem_mode 2, or
        # auto when the ~6x working set exceeds the probed budget
        from microimagelib_tpu.models.deconvolution import hbm_budget_bytes

        use_lowmem = mem_mode == 2
        if mem_mode_requested == -1 and not use_lowmem:
            # the affine resolution above uses a ~5-volume working set;
            # the phasor needs ~6 — re-probe with its own footprint
            budget = hbm_budget_bytes(device)
            if budget is not None and 6 * i1.size * 4 > budget * 0.92:
                use_lowmem = True
        if use_lowmem:
            if verbose:
                print("\t... phasor in host-staged memory-saving mode")
            return reg3d_phasor_lowmem(np.asarray(i1), np.asarray(i2),
                                       budget_bytes=hbm_budget_bytes(device))
        return reg3d_phasor(i1, i2)

    if reg_choice == 0:
        if mem_mode == 2 and flag_tmx and tmx is not None:
            out_tmx = np.asarray(tmx, np.float32).copy()
            reg = (_final_transform(img2, out_tmx, img1.shape, 2)
                   if want else None)
        else:
            reg, out_tmx, records = reg3d_affine(
                img1, img2, 0, flag_tmx, tmx, ftol, it_limit, verbose,
                records, device, engine, mem_mode, want_reg=want)
    elif reg_choice == 1:
        shifts = run_phasor(img1, img2)
        out_tmx = identity_tmx()
        out_tmx[3], out_tmx[7], out_tmx[11] = shifts
        if not want:
            reg = None
        elif mem_mode == 2:
            reg = _final_transform(img2, out_tmx, img1.shape, 2)
        else:
            reg = imshift(img2, -shifts[0], -shifts[1], -shifts[2])
    elif reg_choice == 2:
        reg, out_tmx, records = run_affine(img1, img2, aff_method, flag_tmx, tmx)
    elif reg_choice == 3:
        shifts = run_phasor(img1, img2)
        t = identity_tmx()
        t[3], t[7], t[11] = shifts
        reg, out_tmx, records = run_affine(img1, img2, aff_method, True, t)
    elif reg_choice == 4:
        if verbose:
            print("\t... 2D MIP registration ... ")
        # XY MIPs -> 2D shift align (both axes)
        mip1_xy = np.asarray(max_projection(img1, 1))
        mip2_xy = np.asarray(max_projection(img2, 1))
        _, tmx1 = reg2d_shiftalign(mip1_xy, mip2_xy, None, 0.3, 30, x_only=False)
        # ZX MIPs -> X-only align (x of the MIP = volume z); carries the
        # found x-shift into the unsearched second component like the
        # reference (tmx2[5] = tmx1[2], reference:src/api_reg.cpp:494)
        mip1_zx = np.asarray(max_projection(img1, 2))
        mip2_zx = np.asarray(max_projection(img2, 2))
        t2_init = np.array([1, 0, 0, 0, 1, tmx1[2]], np.float32)
        _, tmx2 = reg2d_shiftalign(mip1_zx, mip2_zx, t2_init, 0.3, 30, x_only=True)
        t = identity_tmx()
        t[3], t[7], t[11] = tmx1[2], tmx1[5], tmx2[2]
        if verbose:
            print(f"\t... shift translation, X: {t[3]:.1f}; Y: {t[7]:.1f}; Z: {t[11]:.1f}")
            print("\t... 3D registration ... ")
        reg, out_tmx, records = run_affine(img1, img2, aff_method, True, t)
    else:
        raise ValueError("Wrong registration choice")

    records[7] = time.time() - t0
    records[10] = free_memory_mb(device)
    if reg is not None and not as_device:
        reg = np.asarray(reg)
    return reg, out_tmx, records


def reg_3dgpu(img1, img2, aff_method=7, input_tmx=False, tmx=None, ftol=1e-4,
              it_limit=3000, device=None, records=None):
    """Legacy wrapper: MIP-initialized registration with checkmatrix
    fallback to plain affine (``reg_3dgpu``,
    reference:src/api_reg.cpp:609-652)."""
    reg_choice = 2 if input_tmx else 4
    reg, out_tmx, records = reg3d(img1, img2, reg_choice, aff_method, input_tmx,
                                  tmx, ftol, it_limit, device, 1, False, records)
    sz, sy, sx = np.asarray(img1).shape
    if not checkmatrix(out_tmx, sx, sy, sz):
        reg, out_tmx, records = reg3d(img1, img2, 2, aff_method, input_tmx,
                                      tmx, ftol, it_limit, device, 1, False, records)
    return reg, out_tmx, records


# --------------------------------------------------------------------------
# reg2d dispatcher
# --------------------------------------------------------------------------

def reg2d(img1, img2, reg_choice=2, flag_tmx=False, tmx=None, ftol=1e-4,
          it_limit=3000, records=None):
    """2D registration dispatcher (``reg2d``,
    reference:src/api_reg.cpp:115-244). reg_choice: 0 apply matrix,
    1 shift grid, 2 affine, 3 phasor. Returns (registered, tmx6, records)."""
    if records is None:
        records = np.zeros(11, dtype=np.float64)
    sy1, sx1 = np.asarray(img1).shape
    if reg_choice == 0:
        if flag_tmx and tmx is not None:
            src = jnp.asarray(np.asarray(img2, np.float32))
            reg = np.asarray(affine_transform_2d(src, np.asarray(tmx, np.float32), (sy1, sx1)))
            return reg, np.asarray(tmx, np.float32), records
        return np.asarray(img2, np.float32), np.array([1, 0, 0, 0, 1, 0], np.float32), records
    if reg_choice == 1:
        reg, out = reg2d_shiftalign(img1, img2, tmx if flag_tmx else None, 0.4, 40, records=records)
        return reg, out, records
    if reg_choice == 2:
        reg, out = reg2d_affine(img1, img2, tmx if flag_tmx else None, 1, ftol, it_limit, records)
        return reg, out, records
    if reg_choice == 3:
        if np.asarray(img1).shape != np.asarray(img2).shape:
            raise ValueError("Image size of the 2D images is not matched")
        shifts = reg2d_phasor(img1, img2)
        src = jnp.asarray(np.asarray(img2, np.float32))
        reg = np.asarray(imshift(src[None], -shifts[0], -shifts[1], 0)[0])
        out = np.array([1, 0, shifts[0], 0, 1, shifts[1]], np.float32)
        return reg, out, records
    raise ValueError("Wrong registration choice")
