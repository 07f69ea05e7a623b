"""Separable compact-PSF convolution: the RL decon hot op with NO
spectrum at all.

The FFT formulation of the RL convolution is bandwidth-capped on this
machine (BASELINE.md round-3 model: ~26-30 ms floor at 512^3 from the
volume + spectrum + OTF HBM traffic at 211-244 GB/s). But the microscopy
PSFs the reference deconvolves with are COMPACT (a few dozen voxels of
support) and low separation rank — a Gaussian bead PSF is exactly
rank 1 — and a circular convolution with a compact separable kernel
needs only ONE pass over the volume:

    out = sum_r  kz_r (*)_z  ky_r (*)_y  kx_r (*)_x  v      (circular)

This module plans that decomposition on the host (two-stage unfold-SVD
of the PSF: z vs (y,x), then y vs x per component) and executes the
whole convolution — x and y as banded-circulant bf16x3 matmuls on the
MXU, z as a short FMA stencil — in ONE software-pipelined Pallas kernel:

  * grid over z-slabs; step i copies the incoming slab into a rolling
    raw-slab VMEM history window and, once the window covers an output
    slab's full z reach, emits it: per rank, a z FMA over the window —
    each tap's block optionally ROLLED in xy by the PSF's per-slab
    centroid drift (tilted/curved measured PSFs plan at straight-PSF
    rank this way, see :func:`slab_align`) — then one xy conv per row.
    The z wraparound of the circular conv is handled purely by the grid
    index maps (the lookahead steps re-fetch the first/last slabs) — no
    halo DMA, no spectrum, no intermediate HBM traffic;
  * the RL elementwise stages fuse into the same kernel (``mode``):
    ``ratio`` emits img / conv, ``update`` emits
    max(est * conv, smallvalue) — one RL iteration is exactly TWO kernel
    launches and ~6 volume-sized HBM passes.

Exactness: the plan is accepted only if the separable reconstruction
matches the (sum-normalized) PSF to ``tol`` relative Frobenius error, so
the result matches irfftn(rfftn(v) * OTF) with gen_otf's conventions
(center = size//2 circular split, ops/basics.py::pad_psf_to_origin;
reference ``padPSFgpu`` reference:include/cukernel.cuh:679-697) to
matmul precision. Callers fall back to the FFT paths when ``plan_sep``
returns None (support too large, rank above the VMEM-bounded cap, or an
unsupported grid).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from microimagelib_tpu.ops.fft_pallas import _dot3_cl, _dot3_cr, _hi_lo

__all__ = ["plan_sep", "plan_sep_pair", "conv3_sep", "SepPlan",
           "sep_grid_supported", "plan_rl_fused", "rl_iter_fused",
           "RLFusedPlan", "slab_align"]

_VMEM_LIMIT = 100 * 1024 * 1024
_T = 128  # lane tile for the banded xy circulant blocks


class SepPlan(NamedTuple):
    """Planned separable convolution. ``meta`` = (zb, a, b, rank, nsteps,
    g, bx, by, sy, sx) is static; the arrays are device constants.

    The xy circulants come in two layouts, chosen per axis:

      * dense — cx* (R, nx, nx), cy* (R, ny, ny); bx/by is None;
      * banded — the kernel band is compact, so each 128-lane output
        tile only reads a 2-tile input window: cx* (R, nx/128, 256, 128)
        right-multiply blocks, cy* (R, ny/128, 128, 256) left-multiply
        blocks; bx/by is the window's tile offset (-1 causal / 0
        anticausal). This halves the MXU work of the dominant xy matmuls
        once nx (ny) reaches 512.

    ``sy, sx``: the plan's frame shift sigma per axis — it maps an input
    in frame f to an output in frame f + sigma (frame = volume rolled by
    that many voxels along the axis). RL pairs from :func:`plan_sep_pair`
    use +s on the forward and -s on the back projector so the roll
    cancels over one iteration (the constant image is pre-rolled once);
    standalone plans have sigma 0."""

    cxh: jax.Array
    cxl: jax.Array
    cyh: jax.Array
    cyl: jax.Array
    tz: jax.Array    # (R, nsteps) f32 reversed z taps (SMEM)
    meta: tuple


def sep_grid_supported(shape, zb=8):
    nz, ny, nx = shape
    return nz % zb == 0 and nz >= zb and nx % 128 == 0 and ny % 8 == 0


def _support_1d(mass, tol):
    """[lo, hi) of the entries of nonneg vector ``mass`` whose excluded
    tails keep below tol of the total."""
    n = mass.shape[0]
    total = float(mass.sum())
    if total <= 0:
        return 0, 1
    lo, hi = 0, n
    while lo < n - 1 and mass[:lo + 1].sum() <= tol * total:
        lo += 1
    while hi > lo + 1 and mass[hi - 1:].sum() <= tol * total:
        hi -= 1
    return lo, hi


def _decompose(psf, tol, max_rank):
    """Greedy two-stage SVD separation: psf ~= sum_r kz_r x ky_r x kx_r.
    Returns (terms, err) with terms = list of (kz, ky, kx) f64 vectors on
    the FULL psf box, or None if max_rank is not enough."""
    pz, py, px = psf.shape
    m = psf.reshape(pz, py * px)
    u, s, vt = np.linalg.svd(m, full_matrices=False)
    cands = []
    for r in range(min(len(s), max_rank)):
        if s[r] <= 1e-14 * s[0]:
            break
        v2 = vt[r].reshape(py, px)
        uy, sy, vx = np.linalg.svd(v2, full_matrices=False)
        for q in range(min(len(sy), max_rank)):
            w = s[r] * sy[q]
            if w <= 1e-14 * s[0]:
                break
            cands.append((w, u[:, r] * s[r] * sy[q], uy[:, q], vx[q]))
    cands.sort(key=lambda c: -c[0])
    norm = np.linalg.norm(psf)
    terms = []
    recon = np.zeros_like(psf, dtype=np.float64)
    for _w, kz, ky, kx in cands[:max_rank]:
        terms.append((kz.astype(np.float64), ky.astype(np.float64),
                      kx.astype(np.float64)))
        recon += np.einsum("i,j,k->ijk", *terms[-1])
        if np.linalg.norm(psf - recon) <= tol * norm:
            return terms, float(np.linalg.norm(psf - recon) / norm)
    return None


def _circulant(taps, offs, n):
    """Dense (n, n) circulant for out[w] = sum_d t[d] v[(w-d) mod n],
    built in f64. ``offs`` are the displacements d of ``taps``."""
    c = np.zeros((n, n), np.float64)
    w = np.arange(n)
    for t, d in zip(taps, offs):
        c[(w - d) % n, w] += t
    return c


def _band_t0(offs_eff, n):
    """Tile offset t0 of the 2-tile window that covers a circulant with
    effective displacements ``offs_eff`` on axis length ``n``, or None
    when the axis must stay dense (too short, unaligned, or the band
    does not fit an aligned 256-lane window)."""
    if n % _T != 0 or n < 2 * _T or len(offs_eff) == 0:
        return None
    d_min, d_max = int(min(offs_eff)), int(max(offs_eff))
    if 0 <= d_min and d_max <= _T:
        return -1
    if -_T <= d_min and d_max <= 0:
        return 0
    return None


def _banded_blocks(c_eff, t0, left):
    """Slice the (n, n) effective circulant into per-output-tile 2-tile
    window blocks. ``left=False``: right-multiply x blocks (nt, 256,
    128) with B[j][r, c] = C[((j+t0)*128+r) % n, j*128+c]. ``left=True``:
    left-multiply y blocks (nt, 128, 256), D[i][c, r] = that same slice
    transposed per block (out index on rows, window index on columns)."""
    n = c_eff.shape[0]
    nt = n // _T
    rows = (np.arange(2 * _T)[None, :] + (np.arange(nt)[:, None] + t0) * _T) % n
    cols = np.arange(nt)[:, None] * _T + np.arange(_T)[None, :]
    blocks = c_eff[rows[:, :, None], cols[:, None, :]]   # (nt, 256, 128)
    return blocks.transpose(0, 2, 1) if left else blocks


def _crop_offsets(pshape, shape):
    """Per-axis (slice, displacement array) of a PSF of box ``pshape`` on
    grid ``shape``: identity when the PSF fits, else genOTF's
    alignsize-crop re-centering (models/deconvolution._gen_otf;
    reference:src/api_subfunc.cu:3269-3307)."""
    if any(p > f for p, f in zip(pshape, shape)):
        sls, offsets = [], []
        for p, f in zip(pshape, shape):
            so = (f - p) // 2
            o_lo = max(so, 0)
            i_lo = o_lo - so
            n = min(p - i_lo, f - o_lo)
            sls.append(slice(i_lo, i_lo + n))
            offsets.append(o_lo - f // 2 + np.arange(n))
        return tuple(sls), offsets
    return (tuple(slice(None) for _ in pshape),
            [np.arange(p) - p // 2 for p in pshape])


def slab_align(psf, mass_tol=1e-3):
    """Per-slab integer recentering of a tilted/curved PSF — the step
    that makes real light-sheet PSFs low-separation-rank: slab k is
    shifted by -(uy_k, ux_k), uy/ux = rint(slab xy mass centroid - the
    mass-weighted mean centroid), onto an enlarged zero canvas whose
    center convention (size//2) is preserved. Returns
    (aligned, rolls_z) with rolls_z[k] = (uy_k, ux_k) — slab k of
    ``aligned`` stands for the true slab shifted by +rolls_z[k], which
    :func:`plan_sep` re-applies EXACTLY as per-tap xy rolls at the
    kernel's z FMA (circular convolution with per-slab-shifted taps is
    identical to rolled per-slab convolution:
    sum_d Shift_m(d)[psf_al[d]] (*)_xy v[z-d]
    = sum_d Roll_m(d)( psf_al[d] (*)_xy v[z-d] )). Slabs below
    ``mass_tol`` of the peak mass inherit the nearest fitted slab's
    shift (their taps are negligible; ANY choice keeps exactness)."""
    p = np.asarray(psf, np.float64)
    pz, py, px = p.shape
    q = np.abs(p)
    m = q.sum(axis=(1, 2))
    u = np.zeros((pz, 2), np.int64)
    if not (np.isfinite(m.max()) and m.max() > 0):
        return p, u
    keep = m > mass_tol * m.max()
    cy = (q[keep] * np.arange(py)[None, :, None]).sum(axis=(1, 2)) / m[keep]
    cx = (q[keep] * np.arange(px)[None, None, :]).sum(axis=(1, 2)) / m[keep]
    w = m[keep]
    u[keep, 0] = np.rint(cy - np.average(cy, weights=w))
    u[keep, 1] = np.rint(cx - np.average(cx, weights=w))
    fitted = np.where(keep)[0]
    for k in np.where(~keep)[0]:
        u[k] = u[fitted[np.argmin(np.abs(fitted - k))]]
    if not u.any():
        return p, u
    my, mx = int(np.abs(u[:, 0]).max()), int(np.abs(u[:, 1]).max())
    out = np.zeros((pz, py + 2 * my, px + 2 * mx))
    for k in range(pz):
        out[k, my - u[k, 0]:my - u[k, 0] + py,
            mx - u[k, 1]:mx - u[k, 1] + px] = p[k]
    return out, u


def plan_sep(psf, shape, zb=8, tol=1e-6, max_rank=4, vmem_budget=None,
             sigma=(0, 0), rolls_z=None, align=False):
    """Plan the separable conv of a compact PSF on grid ``shape``
    (z, y, x). Returns a :class:`SepPlan` or None when the kernel/grid
    does not qualify. The PSF is sum-normalized like ``gen_otf``.

    ``sigma`` = (sy, sx) frame shift: the planned conv maps an input
    rolled by f to an output rolled by f + sigma along that axis (see
    :class:`SepPlan`); each axis goes banded when its shifted band fits
    an aligned 2-tile window, else dense (correct for any sigma).

    ``rolls_z``: optional (pz, 2) int array parallel to the PSF z axis —
    slab k of the given (already recentered) PSF stands for the true
    slab shifted by (+uy, +ux); the kernel re-applies the shift as an
    exact per-tap xy roll at the z FMA. ``align=True`` computes it
    internally via :func:`slab_align` — the route that makes TILTED
    measured PSFs (reference:src/decon_sv.cpp:51-54 feeds measured PSF
    files) low-rank: each z slab is recentered on its own integer mass
    centroid, so any smooth drift of the PSF core through z (linear
    light-sheet tilt or a curved focal trace) is absorbed by the rolls
    instead of inflating the separation rank."""
    nz, ny, nx = shape
    psf = np.asarray(psf, np.float64)
    if psf.ndim != 3 or not sep_grid_supported(shape, zb):
        return None
    if align:
        if rolls_z is not None:
            raise ValueError("align=True computes rolls_z internally")
        psf, rolls_z = slab_align(psf)
    tot = psf.sum()
    if not np.isfinite(tot) or tot <= 0:
        return None
    psf = psf / tot
    rolls_z = (np.zeros((psf.shape[0], 2), np.int64) if rolls_z is None
               else np.asarray(rolls_z, np.int64))
    if rolls_z.shape != (psf.shape[0], 2):
        raise ValueError("rolls_z must be (psf_z, 2)")

    # genOTF's oversized-PSF path center-crops to the FFT grid with
    # alignsize offsets and re-centers at grid//2 — which shifts
    # odd-size axes by the (f-p)//2 truncation (models/deconvolution
    # ._gen_otf; reference:src/api_subfunc.cu:3269-3307 + alignsize
    # launcher :1779-1787). Mirror it: tap t of axis (p -> f) sits at
    # grid index o_lo + (t - i_lo), displacement = that - f//2.
    sls, (offz, offy, offx) = _crop_offsets(psf.shape, shape)
    psf = psf[sls]
    rolls_z = rolls_z[sls[0]]

    # trim the y/x box to its mass support (recentered/oversized canvases
    # carry zero margins that would otherwise defeat the band windows)
    ylo, yhi = _support_1d(np.abs(psf).sum(axis=(0, 2)), tol * 1e-2)
    xlo, xhi = _support_1d(np.abs(psf).sum(axis=(0, 1)), tol * 1e-2)
    psf = psf[:, ylo:yhi, xlo:xhi]
    offy, offx = offy[ylo:yhi], offx[xlo:xhi]

    # compact z support (absolute indices) around the center convention
    mz = np.abs(psf).sum(axis=(1, 2))
    zlo, zhi = _support_1d(mz, tol * 1e-2)
    d_min, d_max = int(offz[zlo]), int(offz[zhi - 1])
    a, b = max(d_max, 0), max(-d_min, 0)
    if a + b + 1 > nz:
        return None   # z reach wider than the (circular) volume
    nsteps = a + b + 1
    lb = -(-b // zb)  # future slabs the emit must wait for

    dec = _decompose(psf[zlo:zhi], tol, max_rank)
    if dec is None:
        return None
    terms, _err = dec
    rank = len(terms)

    # VMEM bound: raw-slab history window ((lb+1)*zb + a rows — the
    # generalized tail/prev/cur pipeline, so z-support is NOT capped at
    # zb, and rank-INDEPENDENT since the z FMA runs before the xy conv)
    # + pipeline blocks (in/out/aux double-buffered) + the acc/zsum/roll
    # temporaries + the circulant constants
    row = ny * nx * 4
    hist = (lb + 1) * zb + a

    sy, sx = int(sigma[0]), int(sigma[1])
    bx = _band_t0(offx + sx, nx)
    by = _band_t0(offy + sy, ny)

    cxb = 2 * rank * 4 * (nx * 2 * _T if bx is not None else nx * nx)
    cyb = 2 * rank * 4 * (ny * 2 * _T if by is not None else ny * ny)
    need = (hist + 6 * zb + 4 * zb + nsteps) * row + cxb + cyb
    budget = vmem_budget if vmem_budget is not None else _VMEM_LIMIT
    if need > budget * 0.9:
        return None

    def build(taps, offs, s, n, t0, left):
        c = _circulant(taps, offs + s, n)
        if t0 is None:
            # the y pass is a LEFT multiply (Cy @ rows), so transpose the
            # source-major circulant; asymmetric (even-size) kernels care
            return _hi_lo(c.T if left else c)
        return _hi_lo(_banded_blocks(c, t0, left))

    cx = [build(kx, offx, sx, nx, bx, False) for _kz, _ky, kx in terms]
    cy = [build(ky, offy, sy, ny, by, True) for _kz, ky, _kx in terms]
    tz = np.zeros((rank, nsteps), np.float32)
    rolls = np.zeros((nsteps, 2), np.int64)
    for r, (kz, _ky, _kx) in enumerate(terms):
        # out[q] = sum_s tz[s] * asm[q + s] with asm row q+s = xy row
        # (w - a + s): s = a - d  ->  tz[s] = kz at d = a - s
        for idx in range(zlo, zhi):
            d = int(offz[idx])
            tz[r, a - d] += kz[idx - zlo]
            rolls[a - d] = rolls_z[idx]
    # torus rolls: keep the representative nearest zero
    rolls = (rolls + np.array([ny, nx]) // 2) % np.array([ny, nx]) \
        - np.array([ny, nx]) // 2
    rolls_t = (tuple((int(dy), int(dx)) for dy, dx in rolls)
               if rolls.any() else None)

    meta = (zb, a, b, rank, nsteps, nz // zb, bx, by, sy, sx, rolls_t)
    return SepPlan(
        jnp.asarray(np.stack([h for h, _ in cx])),
        jnp.asarray(np.stack([l for _, l in cx])),
        jnp.asarray(np.stack([h for h, _ in cy])),
        jnp.asarray(np.stack([l for _, l in cy])),
        jnp.asarray(tz), meta)


def _mass_bands(p, shape, tol=1e-6):
    """Per-axis (back, fwd) displacement reach of the MASS support of
    ``p`` on ``shape`` (zero canvas margins ignored, like plan_sep)."""
    sls, offs = _crop_offsets(np.shape(p), shape)
    q = np.abs(np.asarray(p, np.float64)[sls])
    out = []
    for ax, o in enumerate(offs):
        m = q.sum(axis=tuple(i for i in range(3) if i != ax))
        lo, hi = _support_1d(m, tol * 1e-2)
        o = o[lo:hi]
        out.append((max(-int(o.min()), 0), max(int(o.max()), 0))
                   if o.size else (0, 0))
    return out


def _plan_pair_arrays(psf, psf_bp, shape, zb, tol, max_rank, vmem_budget,
                      rz1=None, rz2=None):
    """plan_sep_pair's inner worker for one (psf, psf_bp[, rolls])
    candidate: picks the banded frame shifts and tries the zb ladder."""
    nz, ny, nx = shape
    (_, _), (ay1, by1), (ax1, bx1) = _mass_bands(psf, shape, tol)
    (_, _), (ay2, by2), (ax2, bx2) = _mass_bands(psf_bp, shape, tol)

    def pick(a1, b1, a2, b2, n):
        s = max(a1, b2)
        if n % _T == 0 and n >= 2 * _T and s + max(b1, a2) <= _T:
            return s
        return 0

    sx = pick(ax1, bx1, ax2, bx2, nx)
    sy = pick(ay1, by1, ay2, by2, ny)
    for zb_c in ((8, 4) if zb is None else (zb,)):
        if not sep_grid_supported(shape, zb_c):
            continue
        fwd = plan_sep(psf, shape, zb=zb_c, tol=tol, max_rank=max_rank,
                       vmem_budget=vmem_budget, sigma=(sy, sx),
                       rolls_z=rz1)
        if fwd is None:
            continue
        bp = plan_sep(psf_bp, shape, zb=zb_c, tol=tol, max_rank=max_rank,
                      vmem_budget=vmem_budget, sigma=(-sy, -sx),
                      rolls_z=rz2)
        if bp is not None:
            return fwd, bp
    return None


def plan_sep_pair(psf, psf_bp, shape, zb=None, tol=1e-6, max_rank=4,
                  vmem_budget=None):
    """Plan the RL projector PAIR with per-axis frame shifts chosen so
    BOTH stages run banded: the forward conv gets sigma = +s (its
    shifted band is causal, window tiles [j-1, j]) and the back
    projector sigma = -s (anticausal, window [j, j+1]), with
    s = max(a_fwd, b_bp) per axis so the round trip returns to frame 0 —
    only the constant image needs one pre-roll by (sy, sx).

    ``zb`` None tries slab heights (8, 4) in order — tall z supports
    at big xy grids only fit the VMEM history window at zb=4.

    Both the raw projectors and their :func:`slab_align` recentered
    forms are tried, and the LOWER total separation rank wins (ties
    favor raw — no per-tap rolls at the emit): tilted measured PSFs
    (VERDICT r3 #1) plan at the straight-PSF rank this way. Returns
    (fwd_plan, bp_plan) or None when every candidate fails
    :func:`plan_sep`."""
    p1 = np.asarray(psf, np.float64)
    p2 = np.asarray(psf_bp, np.float64)
    cands = [(p1, None, p2, None)]
    a1, rz1 = slab_align(p1)
    a2, rz2 = slab_align(p2)
    if rz1.any() or rz2.any():
        cands.append((a1, rz1, a2, rz2))
    best = None
    for q1, r1, q2, r2 in cands:
        pair = _plan_pair_arrays(q1, q2, shape, zb, tol, max_rank,
                                 vmem_budget, r1, r2)
        if pair is None:
            continue
        rank = pair[0].meta[3] + pair[1].meta[3]
        if best is None or rank < best[0]:
            best = (rank, pair)
    return None if best is None else best[1]


# --------------------------------------------------------------------------
# kernel
# --------------------------------------------------------------------------

def _roll_xy(m, dy, dx):
    """Static circular roll of the trailing (y, x) axes of value ``m``
    by slice+concat (jnp.roll traces a closed_call, which the Mosaic
    pallas lowering rejects)."""
    for ax, d in ((m.ndim - 2, dy), (m.ndim - 1, dx)):
        d %= m.shape[ax]
        if d:
            sl_hi = [slice(None)] * m.ndim
            sl_lo = [slice(None)] * m.ndim
            sl_hi[ax] = slice(m.shape[ax] - d, None)
            sl_lo[ax] = slice(None, m.shape[ax] - d)
            m = jnp.concatenate([m[tuple(sl_hi)], m[tuple(sl_lo)]],
                                axis=ax)
    return m


def _win2(m, lo_tile, nt, axis):
    """2-tile (256-wide) window starting at tile ``lo_tile`` (mod nt)
    along ``axis`` of value ``m``; wraps circularly at the edges."""
    lo = lo_tile % nt
    sl = [slice(None)] * m.ndim
    if lo + 1 < nt:
        sl[axis] = slice(lo * _T, (lo + 2) * _T)
        return m[tuple(sl)]
    parts = []
    for tt in (lo, (lo + 1) % nt):
        sl[axis] = slice(tt * _T, (tt + 1) * _T)
        parts.append(m[tuple(sl)])
    return jnp.concatenate(parts, axis=axis)


def _xy_conv(row, r, cxh_ref, cxl_ref, cyh_ref, cyl_ref, bx, by):
    """One z-row's separable xy pass for rank term ``r``: x as a
    right-multiply circulant, y as a left-multiply — each either dense
    or banded (2-tile window blocks, tile offset bx/by)."""
    ny, nx = row.shape
    if bx is None:
        t = _dot3_cr(row, cxh_ref[r], cxl_ref[r])
    else:
        nt = nx // _T
        t = jnp.concatenate(
            [_dot3_cr(_win2(row, j + bx, nt, 1), cxh_ref[r, j],
                      cxl_ref[r, j]) for j in range(nt)], axis=1)
    if by is None:
        return _dot3_cl(cyh_ref[r], cyl_ref[r], t)
    nt = ny // _T
    return jnp.concatenate(
        [_dot3_cl(cyh_ref[r, i], cyl_ref[r, i], _win2(t, i + by, nt, 0))
         for i in range(nt)], axis=0)


def _kernel(v_ref, aux_ref, cxh_ref, cxl_ref, cyh_ref, cyl_ref, tz_ref,
            o_ref, hist_ref, *, zb, a, b, rank, nsteps, la, lb, bx, by,
            rolls, mode, smallvalue):
    """Software-pipelined step: shift the RAW slab history window down
    one slab, copy the incoming slab to its top, and — once the window
    covers the emit slab's full z reach — emit output slab
    ``i - la - lb``: per rank, the z FMA over the window (each tap's
    block optionally rolled in xy by the PSF's per-slab drift ``rolls``,
    see plan_sep) followed by ONE xy conv per output row.
    ``la/lb = ceil(a/zb) / ceil(b/zb)`` warmup and lookahead slab counts
    generalize the round-3 tail/prev/cur pipeline to arbitrary z support
    (VERDICT r3 #1b). The z-FMA-first order is exact because xy
    circulants commute with the per-tap rolls, and it keeps the history
    window rank-independent (raw slabs shared by all rank terms)."""
    i = pl.program_id(0)
    h = (lb + 1) * zb + a   # history rows (raw input slabs)

    if h > zb:
        hist_ref[0:h - zb] = hist_ref[zb:h]
    hist_ref[h - zb:h] = v_ref[...]

    @pl.when(i >= la + lb)
    def _emit():
        # emit slab j = i - la - lb: its rows j*zb - a .. j*zb+zb-1+b sit
        # at history offsets 0 .. zb-1+nsteps-1 after this step's shift
        acc = jnp.zeros((zb,) + v_ref.shape[1:], jnp.float32)
        for r in range(rank):
            zsum = jnp.zeros((zb,) + v_ref.shape[1:], jnp.float32)
            for s in range(nsteps):
                blk = hist_ref[s:s + zb]
                dy, dx = rolls[s] if rolls else (0, 0)
                if dy or dx:
                    blk = _roll_xy(blk, dy, dx)
                zsum = zsum + tz_ref[r, s] * blk
            # per-z-row 2D matmuls measure FASTER than one batched
            # (zb*ny, nx) x-pass (24.7 vs 23.3 ms/iter at 512^3) — the
            # reshape materializes and breaks x/y pass interleaving
            rows = [_xy_conv(zsum[dz], r, cxh_ref, cxl_ref, cyh_ref,
                             cyl_ref, bx, by) for dz in range(zb)]
            acc = acc + jnp.stack(rows)
        if mode == "ratio":
            out = aux_ref[...] / acc
        elif mode == "update":
            out = jnp.maximum(aux_ref[...] * acc, smallvalue)
        else:
            out = acc
        o_ref[...] = out


@partial(jax.jit, static_argnames=("meta", "mode", "smallvalue", "interpret"))
def _conv3_sep(v, aux, cxh, cxl, cyh, cyl, tz, meta, mode, smallvalue,
               interpret):
    nz, ny, nx = v.shape
    zb, a, b, rank, nsteps, g, bx, by = meta[:8]
    rolls = meta[10] if len(meta) > 10 else None
    la, lb = -(-a // zb), -(-b // zb)
    lag = la + lb
    in_spec = pl.BlockSpec((zb, ny, nx),
                           lambda i: ((i + g - la) % g, 0, 0),
                           memory_space=pltpu.VMEM)
    out_map = lambda i: (jnp.maximum(i - lag, 0), 0, 0)  # noqa: E731
    aux_spec = pl.BlockSpec((zb, ny, nx), out_map, memory_space=pltpu.VMEM)

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        partial(_kernel, zb=zb, a=a, b=b, rank=rank, nsteps=nsteps,
                la=la, lb=lb, bx=bx, by=by, rolls=rolls, mode=mode,
                smallvalue=smallvalue),
        grid=(g + lag,),
        in_specs=[in_spec, aux_spec,
                  const_spec(cxh), const_spec(cxl),
                  const_spec(cyh), const_spec(cyl),
                  pl.BlockSpec(tz.shape, lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((zb, ny, nx), out_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(((lb + 1) * zb + a, ny, nx), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(v, aux, cxh, cxl, cyh, cyl, tz)


class RLFusedPlan(NamedTuple):
    """Both RL projector stages planned for ONE fused kernel per
    iteration. ``meta`` = (zb, a1, b1, rank1, n1, a2, b2, rank2, n2, g,
    bx1, by1, bx2, by2, sy, sx) static; arrays are device constants (fwd
    stage then bp stage). b*/s* as in :class:`SepPlan` — the image must
    be pre-rolled by (sy, sx); est stays in frame 0."""

    c1xh: jax.Array
    c1xl: jax.Array
    c1yh: jax.Array
    c1yl: jax.Array
    tz1: jax.Array
    c2xh: jax.Array
    c2xl: jax.Array
    c2yh: jax.Array
    c2yl: jax.Array
    tz2: jax.Array
    meta: tuple


def plan_rl_fused(psf, psf_bp, shape, tol=1e-6, max_rank=4,
                  vmem_budget=None):
    """Plan a whole RL iteration (fwd conv -> ratio -> bp conv ->
    update) as ONE pallas call: ~3 volume-sized HBM passes per
    iteration instead of the two-call path's ~6. Returns None when
    either projector fails :func:`plan_sep` or the doubled VMEM
    working set does not fit; callers fall back to two fused-mode
    :func:`conv3_sep` calls."""
    nz, ny, nx = shape
    budget = vmem_budget if vmem_budget is not None else _VMEM_RL_LIMIT
    row = ny * nx * 4
    for zb in (8, 4):
        if not sep_grid_supported(shape, zb):
            continue
        pair = plan_sep_pair(psf, psf_bp, shape, zb=zb, tol=tol,
                             max_rank=max_rank, vmem_budget=budget)
        if pair is None:
            continue
        pf, pb = pair
        _, a1, b1, r1, n1, g, bx1, by1, sy, sx, ro1 = pf.meta
        _, a2, b2, r2, n2, _, bx2, by2, _, _, ro2 = pb.meta
        if max(a1, b1, a2, b2) > zb or ro1 is not None or ro2 is not None:
            # the fused kernel keeps the round-3 two-slab (tail/prev/cur)
            # xy-at-arrival layout; tall z supports and per-tap-rolled
            # (recentered tilted) plans run the generalized two-call path
            continue
        # est/img/out pipelines (2 blocks each) + est ring (2) + both
        # stages' rolling buffers + assembly/acc/ratio temporaries
        need = row * (8 * zb
                      + r1 * (2 * zb + max(a1, 1))
                      + r2 * (2 * zb + max(a2, 1))
                      + 4 * zb + n1 + n2)
        if need > budget * 0.9:
            continue
        return RLFusedPlan(pf.cxh, pf.cxl, pf.cyh, pf.cyl, pf.tz,
                           pb.cxh, pb.cxl, pb.cyh, pb.cyl, pb.tz,
                           (zb, a1, b1, r1, n1, a2, b2, r2, n2, g,
                            bx1, by1, bx2, by2, sy, sx))
    return None


_VMEM_RL_LIMIT = 128 * 1024 * 1024


def _zconv_emit(cur, prev, tail, tz_ref, r, a, b, zb, nsteps, shape):
    """z-FMA over the [tail | prev | head-of-cur] assembly of one
    stage's rolling xy-convolved slabs."""
    asm = jnp.concatenate(
        ([tail[r]] if a else []) + [prev[r]]
        + ([cur[r, :b]] if b else []), axis=0)
    acc = jnp.zeros((zb,) + shape, jnp.float32)
    for s in range(nsteps):
        acc += tz_ref[r, s] * asm[s:s + zb]
    return acc


def _rl_kernel(v_ref, img_ref, c1xh, c1xl, c1yh, c1yl, tz1,
               c2xh, c2xl, c2yh, c2yl, tz2, o_ref,
               cur1, prev1, tail1, cur2, prev2, tail2, keep, *,
               zb, a1, b1, r1, n1, a2, b2, r2, n2, bx1, by1, bx2, by2,
               smallvalue):
    i = pl.program_id(0)
    pshape = v_ref.shape[1:]

    for r in range(r1):
        for dz in range(zb):
            cur1[r, dz] = _xy_conv(v_ref[dz], r, c1xh, c1xl, c1yh, c1yl,
                                   bx1, by1)

    @pl.when(i >= 2)
    def _ratio_stage():
        fwd = jnp.zeros((zb,) + pshape, jnp.float32)
        for r in range(r1):
            fwd += _zconv_emit(cur1, prev1, tail1, tz1, r, a1, b1, zb,
                               n1, pshape)
        ratio = img_ref[...] / fwd
        for r in range(r2):
            for dz in range(zb):
                cur2[r, dz] = _xy_conv(ratio[dz], r, c2xh, c2xl, c2yh,
                                       c2yl, bx2, by2)

    @pl.when(i >= 4)
    def _update_stage():
        upd = jnp.zeros((zb,) + pshape, jnp.float32)
        for r in range(r2):
            upd += _zconv_emit(cur2, prev2, tail2, tz2, r, a2, b2, zb,
                               n2, pshape)
        # est slab (i-4) was stashed from v_ref two steps ago; read it
        # BEFORE this step's stash overwrites the 2-slot ring
        o_ref[...] = jnp.maximum(keep[i % 2] * upd, smallvalue)

    keep[i % 2] = v_ref[...]
    for r in range(r1):
        if a1:
            tail1[r] = prev1[r, zb - a1:]
        prev1[r] = cur1[r]

    @pl.when(i >= 2)
    def _roll2():
        for r in range(r2):
            if a2:
                tail2[r] = prev2[r, zb - a2:]
            prev2[r] = cur2[r]


@partial(jax.jit, static_argnames=("meta", "smallvalue", "interpret"))
def _rl_iter_fused(est, img, c1xh, c1xl, c1yh, c1yl, tz1,
                   c2xh, c2xl, c2yh, c2yl, tz2, meta, smallvalue,
                   interpret):
    nz, ny, nx = est.shape
    zb, a1, b1, r1, n1, a2, b2, r2, n2, g, bx1, by1, bx2, by2 = meta[:14]
    est_spec = pl.BlockSpec((zb, ny, nx),
                            lambda i: ((i + g - 2) % g, 0, 0),
                            memory_space=pltpu.VMEM)
    img_spec = pl.BlockSpec((zb, ny, nx),
                            lambda i: ((i + 2 * g - 3) % g, 0, 0),
                            memory_space=pltpu.VMEM)
    out_map = lambda i: (jnp.maximum(i - 4, 0), 0, 0)  # noqa: E731

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        partial(_rl_kernel, zb=zb, a1=a1, b1=b1, r1=r1, n1=n1, a2=a2,
                b2=b2, r2=r2, n2=n2, bx1=bx1, by1=by1, bx2=bx2, by2=by2,
                smallvalue=smallvalue),
        grid=(g + 4,),
        in_specs=[est_spec, img_spec,
                  const_spec(c1xh), const_spec(c1xl),
                  const_spec(c1yh), const_spec(c1yl),
                  pl.BlockSpec(tz1.shape, lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  const_spec(c2xh), const_spec(c2xl),
                  const_spec(c2yh), const_spec(c2yl),
                  pl.BlockSpec(tz2.shape, lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((zb, ny, nx), out_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((r1, zb, ny, nx), jnp.float32),
            pltpu.VMEM((r1, zb, ny, nx), jnp.float32),
            pltpu.VMEM((r1, max(a1, 1), ny, nx), jnp.float32),
            pltpu.VMEM((r2, zb, ny, nx), jnp.float32),
            pltpu.VMEM((r2, zb, ny, nx), jnp.float32),
            pltpu.VMEM((r2, max(a2, 1), ny, nx), jnp.float32),
            pltpu.VMEM((2, zb, ny, nx), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_RL_LIMIT),
        interpret=interpret,
    )(est, img, c1xh, c1xl, c1yh, c1yl, tz1,
      c2xh, c2xl, c2yh, c2yl, tz2)


def rl_iter_fused(est, img, plan, smallvalue=0.01, interpret=None):
    """One full RL iteration as ONE pallas call:
    max(est * conv_bp(img / conv_fwd(est)), smallvalue)
    (reference per-iteration structure reference:src/api_subfunc.cu:
    3404-3416). ``plan`` from :func:`plan_rl_fused`."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _rl_iter_fused(est, img, *plan[:10], plan.meta,
                          float(smallvalue), bool(interpret))


def conv3_sep(v, plan, aux=None, mode="plain", smallvalue=0.01,
              interpret=None):
    """Circular convolution of ``v`` with the planned separable kernel;
    matches irfftn(rfftn(v) * gen_otf(psf)) to matmul precision.

    mode 'plain': returns conv(v). mode 'ratio': returns aux / conv(v).
    mode 'update': returns max(aux * conv(v), smallvalue) — the fused RL
    elementwise stages (reference:src/api_subfunc.cu:3404-3416)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if aux is None:
        if mode != "plain":
            raise ValueError("aux is required for mode %r" % (mode,))
        aux = v
    return _conv3_sep(v, aux, plan.cxh, plan.cxl, plan.cyh, plan.cyl,
                      plan.tz, plan.meta, mode, float(smallvalue),
                      bool(interpret))
