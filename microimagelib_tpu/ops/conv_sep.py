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

__all__ = ["plan_sep", "conv3_sep", "SepPlan", "sep_grid_supported",
           "plan_rl_fused", "rl_iter_fused", "RLFusedPlan"]

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
        # per-z-row 2D matmuls measure FASTER than one batched
        # (zb*ny, nx) x-pass (24.7 vs 23.3 ms/iter at 512^3) — the
        # reshape materializes and breaks x/y pass interleaving
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


class RLFusedPlan(NamedTuple):
    """Both RL projector stages planned for ONE fused kernel per
    iteration. ``meta`` = (zb, a1, b1, rank1, n1, a2, b2, rank2, n2, g)
    static; arrays are device constants (fwd stage then bp stage)."""

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
        pf = plan_sep(psf, shape, zb=zb, tol=tol, max_rank=max_rank,
                      vmem_budget=budget)
        pb = (plan_sep(psf_bp, shape, zb=zb, tol=tol, max_rank=max_rank,
                       vmem_budget=budget) if pf is not None else None)
        if pb is None:
            continue
        _, a1, b1, r1, n1, g = pf.meta
        _, a2, b2, r2, n2, _ = pb.meta
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
                           (zb, a1, b1, r1, n1, a2, b2, r2, n2, g))
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
               zb, a1, b1, r1, n1, a2, b2, r2, n2, smallvalue):
    i = pl.program_id(0)
    pshape = v_ref.shape[1:]

    for r in range(r1):
        for dz in range(zb):
            t = _dot3_cr(v_ref[dz], c1xh[r], c1xl[r])
            cur1[r, dz] = _dot3_cl(c1yh[r], c1yl[r], t)

    @pl.when(i >= 2)
    def _ratio_stage():
        fwd = jnp.zeros((zb,) + pshape, jnp.float32)
        for r in range(r1):
            fwd += _zconv_emit(cur1, prev1, tail1, tz1, r, a1, b1, zb,
                               n1, pshape)
        ratio = img_ref[...] / fwd
        for r in range(r2):
            for dz in range(zb):
                t = _dot3_cr(ratio[dz], c2xh[r], c2xl[r])
                cur2[r, dz] = _dot3_cl(c2yh[r], c2yl[r], t)

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
    zb, a1, b1, r1, n1, a2, b2, r2, n2, g = meta
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
                b2=b2, r2=r2, n2=n2, smallvalue=smallvalue),
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
