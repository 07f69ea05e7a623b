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

  * grid over z-slabs; step i computes the xy-convolved slab (i-1) mod G
    into a rolling VMEM buffer and emits the z-convolved slab i-2 from
    the [tail | prev | head-of-current] assembly, so the z wraparound of
    the circular conv is handled purely by the grid index maps (the two
    extra steps re-fetch the first/last slab) — no halo DMA, no
    spectrum, no intermediate HBM traffic;
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

__all__ = ["plan_sep", "conv3_sep", "SepPlan", "sep_grid_supported"]

_VMEM_LIMIT = 100 * 1024 * 1024


class SepPlan(NamedTuple):
    """Planned separable convolution. ``meta`` = (zb, a, b, rank, nsteps,
    g) is static; the arrays are device constants."""

    cxh: jax.Array   # (R, nx, nx) bf16 circulant hi
    cxl: jax.Array   # (R, nx, nx) bf16 circulant lo
    cyh: jax.Array   # (R, ny, ny) bf16
    cyl: jax.Array   # (R, ny, ny) bf16
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


def plan_sep(psf, shape, zb=8, tol=1e-6, max_rank=4, vmem_budget=None):
    """Plan the separable conv of a compact PSF on grid ``shape``
    (z, y, x). Returns a :class:`SepPlan` or None when the kernel/grid
    does not qualify. The PSF is sum-normalized like ``gen_otf``."""
    nz, ny, nx = shape
    psf = np.asarray(psf, np.float64)
    if psf.ndim != 3 or not sep_grid_supported(shape, zb):
        return None
    tot = psf.sum()
    if not np.isfinite(tot) or tot <= 0:
        return None
    psf = psf / tot

    if any(p > f for p, f in zip(psf.shape, shape)):
        # genOTF's oversized-PSF path center-crops to the FFT grid with
        # alignsize offsets and re-centers at grid//2 — which shifts
        # odd-size axes by the (f-p)//2 truncation (models/deconvolution
        # ._gen_otf; reference:src/api_subfunc.cu:3269-3307 + alignsize
        # launcher :1779-1787). Mirror it: tap t of axis (p -> f) sits at
        # grid index o_lo + (t - i_lo), displacement = that - f//2.
        sls, offsets = [], []
        for p, f in zip(psf.shape, shape):
            so = (f - p) // 2
            o_lo = max(so, 0)
            i_lo = o_lo - so
            n = min(p - i_lo, f - o_lo)
            sls.append(slice(i_lo, i_lo + n))
            offsets.append(o_lo - f // 2 + np.arange(n))
        psf = psf[tuple(sls)]
        offz, offy, offx = offsets
    else:
        offz, offy, offx = (np.arange(p) - p // 2 for p in psf.shape)

    # compact z support (absolute indices) around the center convention
    mz = np.abs(psf).sum(axis=(1, 2))
    zlo, zhi = _support_1d(mz, tol * 1e-2)
    d_min, d_max = int(offz[zlo]), int(offz[zhi - 1])
    a, b = max(d_max, 0), max(-d_min, 0)
    if a > zb or b > zb:
        return None
    nsteps = a + b + 1

    dec = _decompose(psf[zlo:zhi], tol, max_rank)
    if dec is None:
        return None
    terms, _err = dec
    rank = len(terms)

    # VMEM bound: rolling buffers (2*zb + a rows per rank) + pipeline
    # blocks (in/out/aux double-buffered) + the asm/acc temporaries
    row = ny * nx * 4
    need = rank * (2 * zb + a) * row + 6 * zb * row + (zb + nsteps) * row
    budget = vmem_budget if vmem_budget is not None else _VMEM_LIMIT
    if need > budget * 0.9:
        return None

    cxh = np.empty((rank, nx, nx), np.float32)
    cxl = np.empty_like(cxh)
    cyh = np.empty((rank, ny, ny), np.float32)
    cyl = np.empty_like(cyh)
    tz = np.zeros((rank, nsteps), np.float32)
    for r, (kz, ky, kx) in enumerate(terms):
        h, l = _hi_lo(_circulant(kx, offx, nx))
        cxh[r], cxl[r] = np.asarray(h, np.float32), np.asarray(l, np.float32)
        # the y pass is a LEFT multiply (Cy @ rows), so transpose the
        # source-major circulant; asymmetric (even-size) kernels care
        h, l = _hi_lo(_circulant(ky, offy, ny).T)
        cyh[r], cyl[r] = np.asarray(h, np.float32), np.asarray(l, np.float32)
        # out[q] = sum_s tz[s] * asm[q + s] with asm row q+s = xy row
        # (w - a + s): s = a - d  ->  tz[s] = kz at d = a - s
        for idx in range(zlo, zhi):
            d = int(offz[idx])
            tz[r, a - d] += kz[idx - zlo]

    meta = (zb, a, b, rank, nsteps, nz // zb)
    return SepPlan(
        jnp.asarray(cxh.astype(jnp.bfloat16)),
        jnp.asarray(cxl.astype(jnp.bfloat16)),
        jnp.asarray(cyh.astype(jnp.bfloat16)),
        jnp.asarray(cyl.astype(jnp.bfloat16)),
        jnp.asarray(tz), meta)


# --------------------------------------------------------------------------
# kernel
# --------------------------------------------------------------------------

def _kernel(v_ref, aux_ref, cxh_ref, cxl_ref, cyh_ref, cyl_ref, tz_ref,
            o_ref, cur_ref, prev_ref, tail_ref, *,
            zb, a, b, rank, nsteps, mode, smallvalue):
    i = pl.program_id(0)

    for r in range(rank):
        for dz in range(zb):
            t = _dot3_cr(v_ref[dz], cxh_ref[r], cxl_ref[r])
            cur_ref[r, dz] = _dot3_cl(cyh_ref[r], cyl_ref[r], t)

    @pl.when(i >= 2)
    def _emit():
        acc = jnp.zeros((zb,) + v_ref.shape[1:], jnp.float32)
        for r in range(rank):
            asm = jnp.concatenate(
                ([tail_ref[r]] if a else []) + [prev_ref[r]]
                + ([cur_ref[r, :b]] if b else []), axis=0)
            for s in range(nsteps):
                acc += tz_ref[r, s] * asm[s:s + zb]
        if mode == "ratio":
            out = aux_ref[...] / acc
        elif mode == "update":
            out = jnp.maximum(aux_ref[...] * acc, smallvalue)
        else:
            out = acc
        o_ref[...] = out

    for r in range(rank):
        if a:
            tail_ref[r] = prev_ref[r, zb - a:]
        prev_ref[r] = cur_ref[r]


@partial(jax.jit, static_argnames=("meta", "mode", "smallvalue", "interpret"))
def _conv3_sep(v, aux, cxh, cxl, cyh, cyl, tz, meta, mode, smallvalue,
               interpret):
    nz, ny, nx = v.shape
    zb, a, b, rank, nsteps, g = meta
    in_spec = pl.BlockSpec((zb, ny, nx), lambda i: ((i + g - 1) % g, 0, 0),
                           memory_space=pltpu.VMEM)
    out_map = lambda i: (jnp.maximum(i - 2, 0), 0, 0)  # noqa: E731
    aux_spec = pl.BlockSpec((zb, ny, nx), out_map, memory_space=pltpu.VMEM)

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        partial(_kernel, zb=zb, a=a, b=b, rank=rank, nsteps=nsteps,
                mode=mode, smallvalue=smallvalue),
        grid=(g + 2,),
        in_specs=[in_spec, aux_spec,
                  const_spec(cxh), const_spec(cxl),
                  const_spec(cyh), const_spec(cyl),
                  pl.BlockSpec(tz.shape, lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((zb, ny, nx), out_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rank, zb, ny, nx), jnp.float32),
            pltpu.VMEM((rank, zb, ny, nx), jnp.float32),
            pltpu.VMEM((rank, max(a, 1), ny, nx), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(v, aux, cxh, cxl, cyh, cyl, tz)


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
