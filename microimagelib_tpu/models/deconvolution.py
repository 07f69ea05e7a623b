"""Richardson-Lucy deconvolution: single-view and joint dual-view, with
matched (flipped-PSF) or unmatched back projectors (the Guo et al. 2020
Nature Biotechnology acceleration).

TPU-native design: the whole iteration loop is one jitted
``lax.fori_loop`` of rFFT convolutions — XLA fuses the elementwise
ratio/update/clamp stages into the FFT pipeline, and the volume never
leaves HBM. This replaces the reference's per-step cuFFT launches with
full synchronization between each (reference:src/api_subfunc.cu:3404-3416).

Numerics note: the reference uses unnormalized cuFFT/FFTW transforms; the
two inverse-FFT scale factors cancel between the forward-projection ratio
and the back-projection update (1/N in the ratio's denominator, N on the
update), so normalized ``jnp.fft`` transforms produce identical results.

Fidelity choices mirrored from the reference:
  * observed image clamped to >= SMALLVALUE=0.01 before iterating, and the
    estimate re-clamped each half-iteration (reference:src/api_subfunc.cu:
    24, 3380, 3416)
  * "constant initial" uses the image SUM (the reference's ``meanValue``
    is ``sum3Dgpu`` without division — reference:src/api_subfunc.cu:3382);
    the constant cancels after the first iteration so this matches
    bit-for-bit rather than fixing the name
  * dual-view alternates view A then view B within each iteration
    (reference:src/api_subfunc.cu:3634-3660)
  * images padded to the FFT grid with replicate-edge values; PSFs
    sum-normalized, centered-aligned, circularly split to the origin
    (``genOTFgpu`` reference:src/api_subfunc.cu:3269-3307)
"""

from __future__ import annotations

import os

from microimagelib_tpu.utils.envflags import env_on
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from microimagelib_tpu.ops.basics import (
    align_size_3d,
    crop_center,
    flip3,
    pad_psf_to_origin,
    pad_stack_edge,
    snap_fft_size,
)
from microimagelib_tpu.ops.fft_matmul import conv3_mm, mm_precision

SMALLVALUE = 0.01


# --------------------------------------------------------------------------
# OTF preparation
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("fft_shape", "normalize", "fft_impl"))
def _gen_otf(psf, fft_shape, normalize, fft_impl):
    psf = jnp.asarray(psf, dtype=jnp.float32)
    if normalize:
        psf = psf / jnp.sum(psf)
    if any(p > f for p, f in zip(psf.shape, fft_shape)):
        psf = align_size_3d(psf, fft_shape)
    padded = pad_psf_to_origin(psf, fft_shape)
    if fft_impl == "matmul":
        from microimagelib_tpu.ops.fft_matmul import rfft3_mm

        re, im = rfft3_mm(padded)
        return jax.lax.complex(re, im)
    return jnp.fft.rfftn(padded)


_OTF_CACHE = {}


def gen_otf(psf, fft_shape, normalize=True):
    """PSF -> OTF on the (z, y, x) FFT grid ``fft_shape``.

    Optional sum-normalization, centered re-size when the PSF exceeds the
    grid, circular split around the PSF center to the origin, forward
    rFFT. (``genOTFgpu``, reference:src/api_subfunc.cu:3269-3307.)

    Grids that the RL loop routes through the matmul DFT build their OTF
    the same way, keeping forward and inverse transforms consistent; the
    impl is resolved from the CONCRETE psf array's committed device (a
    CPU-pinned PSF in mem_mode 0 keeps the CPU FFT). The OTF stays
    device-resident as complex64; only host<->device c64 TRANSFERS are
    unsupported on axon.

    Small PSFs (<= 1 MB) cache the prepared device OTF keyed by content,
    grid, impl, and device — fusion and the batch driver rebuild the
    same OTFs every call/timepoint, and each rebuild costs several
    dispatches on the tunneled TPU (MIL_OTF_CACHE=0 disables; 16-entry
    LRU)."""
    impl = _fft_impl(fft_shape, psf)
    key = None
    if env_on("MIL_OTF_CACHE", True):
        try:
            host = np.asarray(psf)
            if host.nbytes <= (1 << 20):
                dev = (str(sorted(map(str, psf.devices())))
                       if isinstance(psf, jax.Array) else "host")
                key = (host.tobytes(), host.shape, tuple(fft_shape),
                       bool(normalize), impl, dev)
                hit = _OTF_CACHE.get(key)
                if hit is not None:
                    return hit
        except Exception:   # traced/abstract psf: no caching
            key = None
    out = _gen_otf(psf, tuple(fft_shape), normalize, impl)
    if key is not None:
        while len(_OTF_CACHE) >= 16:
            _OTF_CACHE.pop(next(iter(_OTF_CACHE)))
        _OTF_CACHE[key] = out
    return out


# --------------------------------------------------------------------------
# Jitted RL loops
# --------------------------------------------------------------------------

def _conv_spec(x, otf, shape):
    return jnp.fft.irfftn(jnp.fft.rfftn(x) * otf, s=shape)


def _fft_impl(shape, arr=None):
    """Resolve the FFT backend for the RL loops: ``MIL_FFT_IMPL`` =
    xla | matmul | pallas | auto. Auto picks the fused Pallas CT
    convolution (ops/fft_pallas.py — 3 kernel launches per conv instead
    of ~17 XLA ops) on TPU when the shape supports it, the MXU
    matmul-form DFT (ops/fft_matmul.py) otherwise, for volumes where
    those were measured faster than XLA's FFT (BASELINE.md); smaller
    volumes and other backends keep ``jnp.fft``. When ``arr`` is a
    committed jax array, ITS device decides — a CPU-pinned volume
    (mem_mode 0) on a TPU host must not take the MXU-motivated paths."""
    from microimagelib_tpu.ops.fft_pallas import ct_supported
    from microimagelib_tpu.utils.device import committed_platform

    impl = os.environ.get("MIL_FFT_IMPL", "auto")
    if impl in ("xla", "matmul"):
        return impl
    if impl == "pallas":
        return "pallas" if ct_supported(shape) else "matmul"
    if committed_platform(arr) != "tpu":
        return "xla"
    vox = shape[0] * shape[1] * shape[2]
    min_vox = int(os.environ.get("MIL_FFT_MM_MIN_VOXELS", str(2 ** 23)))
    if vox < min_vox:
        return "xla"
    # the fused CT conv wins only once the volume is large enough to
    # amortize its per-call grid setup (measured ms/conv, scalar-fenced
    # chains: 2^23 3.3 mm / 3.9 ct; 2^24 4.8 / 6.0; 2^25 ~9.1 / 8.2;
    # 512^3 31.2 / 24.8 — BASELINE.md)
    ct_min = int(os.environ.get("MIL_FFT_CT_MIN_VOXELS", str(2 ** 25)))
    return ("pallas" if vox >= ct_min and ct_supported(shape)
            else "matmul")


_SEP_PLAN_CACHE = {}


def _sep_plans(psf, psf_bp, fft_shape, arr=None):
    """Try the separable compact-PSF conv route (ops/conv_sep.py) for the
    RL loops when BOTH projectors are compact, low-separation-rank, and
    the policy allows it. Returns ('fused', RLFusedPlan) — whole
    iteration in one pallas call — or ('pair', (fwd, bp)) for the
    two-call fallback, else None. ``MIL_CONV_SEP`` = auto (TPU above the
    measured voxel floor) | 1 (force, interpret off-TPU) | 0 (off);
    ``MIL_CONV_SEP_FUSED=1`` opts into the one-call-per-iteration form
    (measured no faster than two fused conv calls on this part, but half
    the HBM traffic — see the policy comment below)."""
    from microimagelib_tpu.ops.conv_sep import plan_sep_pair
    from microimagelib_tpu.utils.device import committed_platform

    mode = os.environ.get("MIL_CONV_SEP", "auto")
    if mode in ("0", "off"):
        return None
    if mode == "auto":
        if committed_platform(arr) != "tpu":
            return None
        vox = fft_shape[0] * fft_shape[1] * fft_shape[2]
        # measured v5e crossover (ms/iter sep vs fft-auto, BASELINE.md):
        # 2^23 5.4/4.0, 256^3 6.4/7.3, 128x256x512 8.2/7.3, 2^25 13/14.8,
        # 512^3 22/51. The dense x/y circulant matmuls scale with
        # (nx + ny) per voxel, so elongated xy grids need more voxels to
        # amortize — min_vox grows with (nx + ny) * 2^15.
        floor = int(os.environ.get("MIL_CONV_SEP_MIN_VOXELS", str(2 ** 24)))
        if vox < max(floor, (fft_shape[1] + fft_shape[2]) << 15):
            return None
    # tol cascade: exact-to-matmul-precision first, then the measured-PSF
    # tier — a 1e-4 relative projector error moves the RL fixed point by
    # far less than the reference's own fp32 FFT noise (gate:
    # tools/sep_accuracy_gate.py), and it is what admits realistic
    # tilted/curved PSFs at low rank (MIL_CONV_SEP_TOL pins one tol)
    tol_env = os.environ.get("MIL_CONV_SEP_TOL")
    tols = (float(tol_env),) if tol_env else (1e-6, 1e-4)
    psf_np = np.asarray(psf, np.float32)
    bp_np = np.asarray(psf_bp, np.float32)
    fused_env = env_on("MIL_CONV_SEP_FUSED")
    # plans are pure functions of (projectors, grid, tol, form): cache
    # the device constants — fusion/batch re-plan identical projectors
    # every call, paying the host SVD plus ~8 small H2D transfers each
    key = None
    if (env_on("MIL_SEP_PLAN_CACHE", True)
            and psf_np.nbytes <= (1 << 20) and bp_np.nbytes <= (1 << 20)):
        key = (psf_np.tobytes(), bp_np.tobytes(), psf_np.shape, bp_np.shape,
               tuple(fft_shape), tols, fused_env)
        hit = _SEP_PLAN_CACHE.get(key)
        if hit is not None:
            return hit[0]

    def plan():
        # the one-call-per-iteration form measured NO faster than two
        # fused conv calls (512^3: 25.7 vs 22.4 ms/iter at its
        # VMEM-forced zb=4; 256^3 at zb=8: 6.06 vs 6.03 — the kernel is
        # MXU-bound, so halving HBM traffic doesn't pay). Kept
        # selectable; default off.
        for tol in tols:
            if fused_env:
                from microimagelib_tpu.ops.conv_sep import plan_rl_fused

                fused = plan_rl_fused(psf_np, bp_np, fft_shape, tol=tol)
                if fused is not None:
                    return "fused", fused
            pair = plan_sep_pair(psf_np, bp_np, fft_shape, tol=tol)
            if pair is not None:
                return "pair", pair
        return None

    route = plan()
    if key is not None:
        while len(_SEP_PLAN_CACHE) >= 8:
            _SEP_PLAN_CACHE.pop(next(iter(_SEP_PLAN_CACHE)))
        _SEP_PLAN_CACHE[key] = (route,)
    return route


@partial(jax.jit, static_argnames=("n_iters", "const_initial", "meta",
                                   "interpret", "accel", "stop_tol"))
def _rl_single_sep_fused(img, arrs, n_iters, const_initial, meta,
                         interpret, accel=False, stop_tol=None):
    """RL loop where each iteration is ONE pallas call (~3 volume-sized
    HBM passes): ops/conv_sep.py::rl_iter_fused."""
    from microimagelib_tpu.ops.conv_sep import RLFusedPlan, rl_iter_fused

    plan = RLFusedPlan(*arrs, meta)
    img = jnp.maximum(img, SMALLVALUE)
    if const_initial:
        est0 = jnp.full(img.shape, jnp.sum(img), dtype=img.dtype)
    else:
        est0 = img
    # the banded pair runs its intermediates in frame (sy, sx); the
    # constant image is pre-rolled ONCE to meet the ratio stage there
    img = jnp.roll(img, meta[14:16], axis=(1, 2))

    def step(est):
        return rl_iter_fused(est, img, plan, SMALLVALUE, interpret)

    return _rl_loop(step, est0, n_iters, accel, stop_tol)


@partial(jax.jit, static_argnames=("n_iters", "const_initial", "meta_a",
                                   "meta_b", "interpret", "accel",
                                   "stop_tol"))
def _rl_dual_sep_fused(img_a, img_b, arrs_a, arrs_b, n_iters,
                       const_initial, meta_a, meta_b, interpret,
                       accel=False, stop_tol=None):
    from microimagelib_tpu.ops.conv_sep import RLFusedPlan, rl_iter_fused

    plan_a = RLFusedPlan(*arrs_a, meta_a)
    plan_b = RLFusedPlan(*arrs_b, meta_b)
    img_a = jnp.maximum(img_a, SMALLVALUE)
    img_b = jnp.maximum(img_b, SMALLVALUE)
    if const_initial:
        est0 = jnp.full(img_a.shape, (jnp.sum(img_a) + jnp.sum(img_b)) / 2,
                        dtype=img_a.dtype)
    else:
        est0 = (img_a + img_b) * 0.5
    img_a = jnp.roll(img_a, meta_a[14:16], axis=(1, 2))
    img_b = jnp.roll(img_b, meta_b[14:16], axis=(1, 2))

    def step(est):
        est = rl_iter_fused(est, img_a, plan_a, SMALLVALUE, interpret)
        return rl_iter_fused(est, img_b, plan_b, SMALLVALUE, interpret)

    return _rl_loop(step, est0, n_iters, accel, stop_tol)


@partial(jax.jit, static_argnames=("n_iters", "const_initial", "fwd_meta",
                                   "bp_meta", "interpret", "accel",
                                   "stop_tol"))
def _rl_single_sep(img, fwd_arrs, bp_arrs, n_iters, const_initial,
                   fwd_meta, bp_meta, interpret, accel=False,
                   stop_tol=None):
    """RL loop over the fused separable conv kernel: ratio and update are
    each ONE pallas launch (mode='ratio'/'update'), ~6 volume-sized HBM
    passes per iteration and no spectrum at all
    (reference:src/api_subfunc.cu:3404-3416 per-iteration structure)."""
    from microimagelib_tpu.ops.conv_sep import SepPlan, conv3_sep

    fwd = SepPlan(*fwd_arrs, fwd_meta)
    bp = SepPlan(*bp_arrs, bp_meta)
    img = jnp.maximum(img, SMALLVALUE)
    if const_initial:
        est0 = jnp.full(img.shape, jnp.sum(img), dtype=img.dtype)
    else:
        est0 = img
    # banded-pair frame: ratio runs in frame (sy, sx); pre-roll the
    # constant image once (the bp stage rolls back, est stays frame 0)
    img = jnp.roll(img, fwd_meta[8:10], axis=(1, 2))

    def step(est):
        ratio = conv3_sep(est, fwd, aux=img, mode="ratio",
                          interpret=interpret)
        return conv3_sep(ratio, bp, aux=est, mode="update",
                         smallvalue=SMALLVALUE, interpret=interpret)

    return _rl_loop(step, est0, n_iters, accel, stop_tol)


@partial(jax.jit, static_argnames=("n_iters", "const_initial", "fwd_a_meta",
                                   "bp_a_meta", "fwd_b_meta", "bp_b_meta",
                                   "interpret", "accel", "stop_tol"))
def _rl_dual_sep(img_a, img_b, fwd_a_arrs, bp_a_arrs, fwd_b_arrs, bp_b_arrs,
                 n_iters, const_initial, fwd_a_meta, bp_a_meta, fwd_b_meta,
                 bp_b_meta, interpret, accel=False, stop_tol=None):
    from microimagelib_tpu.ops.conv_sep import SepPlan, conv3_sep

    fwd_a = SepPlan(*fwd_a_arrs, fwd_a_meta)
    bp_a = SepPlan(*bp_a_arrs, bp_a_meta)
    fwd_b = SepPlan(*fwd_b_arrs, fwd_b_meta)
    bp_b = SepPlan(*bp_b_arrs, bp_b_meta)
    img_a = jnp.maximum(img_a, SMALLVALUE)
    img_b = jnp.maximum(img_b, SMALLVALUE)
    if const_initial:
        est0 = jnp.full(img_a.shape, (jnp.sum(img_a) + jnp.sum(img_b)) / 2,
                        dtype=img_a.dtype)
    else:
        est0 = (img_a + img_b) * 0.5
    img_a = jnp.roll(img_a, fwd_a_meta[8:10], axis=(1, 2))
    img_b = jnp.roll(img_b, fwd_b_meta[8:10], axis=(1, 2))

    def half(est, img, fwd, bp):
        ratio = conv3_sep(est, fwd, aux=img, mode="ratio",
                          interpret=interpret)
        return conv3_sep(ratio, bp, aux=est, mode="update",
                         smallvalue=SMALLVALUE, interpret=interpret)

    def step(est):
        est = half(est, img_a, fwd_a, bp_a)
        return half(est, img_b, fwd_b, bp_b)

    return _rl_loop(step, est0, n_iters, accel, stop_tol)


def _rl_loop(step, est0, n_iters, accel, stop_tol=None):
    """Run up to ``n_iters`` RL iterations of ``step``: plain fixed-point
    loop, or — with ``accel`` — Biggs-Andrews vector extrapolation
    (y_k = x_{k-1} + alpha_k (x_{k-1} - x_{k-2}),
    alpha_k = <g_{k-1}, g_{k-2}> / <g_{k-2}, g_{k-2}> clamped to [0, 1),
    g = x - y; Biggs & Andrews, Appl. Opt. 36:1766, 1997), which reaches
    a given restoration quality in roughly half the RL steps. A
    capability the reference lacks; opt-in via MIL_RL_ACCEL=1 (two extra
    volume buffers and ~4 elementwise passes per iteration).

    ``stop_tol``: early-stop once the relative L1 update
    ||x_k - x_{k-1}||_1 / ||x_{k-1}||_1 falls below it — the iteration
    count becomes an upper bound instead of a fixed cost (the reference
    always runs the full count; MIL_RL_STOP_TOL / the entries'
    ``stop_tol`` kwarg)."""
    if not accel and stop_tol is None:
        return jax.lax.fori_loop(0, n_iters, lambda _, e: step(e), est0)

    tol = jnp.float32(stop_tol if stop_tol is not None else 0.0)

    def rel(x2, x1):
        if stop_tol is None:
            return jnp.float32(jnp.inf)
        return (jnp.sum(jnp.abs(x2 - x1))
                / jnp.maximum(jnp.sum(jnp.abs(x1)), 1e-20))

    if not accel:
        def cond(st):
            it, x, r = st
            return (it < n_iters) & (r > tol)

        def body(st):
            it, x, _ = st
            x2 = step(x)
            return it + 1, x2, rel(x2, x)

        _, x, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), est0, jnp.float32(jnp.inf)))
        return x

    def cond_a(st):
        it, x1, x2, g1, g2, r = st
        return (it < n_iters) & (r > tol)

    def body_a(st):
        k, x1, x2, g1, g2, _ = st
        den = jnp.sum(g2 * g2)
        alpha = jnp.where(den > 0, jnp.sum(g1 * g2) / den, 0.0)
        alpha = jnp.where(k < 2, 0.0, jnp.clip(alpha, 0.0, 0.9999))
        y = jnp.maximum(x1 + alpha * (x1 - x2), SMALLVALUE)
        x = step(y)
        return k + 1, x, x1, x - y, g1, rel(x, x1)

    z = jnp.zeros_like(est0)
    _, x, _, _, _, _ = jax.lax.while_loop(
        cond_a, body_a,
        (jnp.int32(0), est0, est0, z, z, jnp.float32(jnp.inf)))
    return x


def _accel_env():
    return env_on("MIL_RL_ACCEL")


def _stop_env(stop_tol=None):
    """Resolve the early-stop tolerance: explicit kwarg wins, else
    MIL_RL_STOP_TOL (unset/0 = off, the reference's fixed-count loop)."""
    if stop_tol is not None:
        return float(stop_tol) or None
    env = os.environ.get("MIL_RL_STOP_TOL")
    return float(env) if env else None


@partial(jax.jit,
         static_argnames=("n_iters", "const_initial", "fft_impl", "prec",
                          "accel", "stop_tol"))
def _rl_single(img, otf, otf_bp, n_iters, const_initial, fft_impl, prec,
               accel=False, stop_tol=None):
    shape = img.shape
    img = jnp.maximum(img, SMALLVALUE)
    if const_initial:
        est0 = jnp.full(shape, jnp.sum(img), dtype=img.dtype)
    else:
        est0 = img

    if fft_impl == "pallas":
        from microimagelib_tpu.ops.fft_pallas import conv3_ct, permute_otf_jnp

        planes = [permute_otf_jnp(h, shape) for h in (otf, otf_bp)]

        def conv(x, which):
            hr, hi = planes[which]
            return conv3_ct(x, hr, hi)
    elif fft_impl == "matmul":
        planes = [(jnp.real(h).astype(jnp.float32),
                   jnp.imag(h).astype(jnp.float32)) for h in (otf, otf_bp)]

        def conv(x, which):
            hr, hi = planes[which]
            return conv3_mm(x, hr, hi, prec)
    else:
        otfs = (otf, otf_bp)

        def conv(x, which):
            return _conv_spec(x, otfs[which], shape)

    def step(est):
        fwd = conv(est, 0)
        ratio = img / fwd
        upd = conv(ratio, 1)
        return jnp.maximum(est * upd, SMALLVALUE)

    return _rl_loop(step, est0, n_iters, accel, stop_tol)


def rl_decon_single(img, otf, otf_bp, n_iters, const_initial=False,
                    psf=None, psf_bp=None, stop_tol=None):
    """Single-view RL on a pre-padded FFT-grid image. Returns the estimate
    on the same grid. (``decon_singleview_OTF1`` loop,
    reference:src/api_subfunc.cu:3404-3416.) The FFT backend is resolved
    per call by :func:`_fft_impl`; when the raw projectors are also given
    (``psf``, optional ``psf_bp``; host arrays) and both are compact and
    separable, the loop takes the fused spectrum-free conv instead
    (:func:`_sep_plans`)."""
    if psf is not None:
        psf_np = np.asarray(psf, np.float32)
        bp_np = (np.asarray(psf_bp, np.float32) if psf_bp is not None
                 else psf_np[::-1, ::-1, ::-1])
        route = _sep_plans(psf_np, bp_np, tuple(img.shape), img)
        if route is not None:
            from microimagelib_tpu.utils.device import committed_platform

            kind, p = route
            interp = committed_platform(img) != "tpu"
            if kind == "fused":
                return _rl_single_sep_fused(img, tuple(p[:10]), n_iters,
                                            const_initial, p.meta, interp,
                                            _accel_env(), _stop_env(stop_tol))
            fwd, bp = p
            return _rl_single_sep(img, tuple(fwd[:5]), tuple(bp[:5]),
                                  n_iters, const_initial, fwd.meta, bp.meta,
                                  interp, _accel_env(), _stop_env(stop_tol))
        if otf is None:
            # caller relied on the sep route but the plan was refused;
            # fall back through the PSF instead of crashing on None OTFs
            otf = gen_otf(jnp.asarray(psf_np), img.shape)
            otf_bp = gen_otf(jnp.asarray(bp_np), img.shape)
    return _rl_single(img, otf, otf_bp, n_iters, const_initial,
                      _fft_impl(img.shape, img), mm_precision(),
                      _accel_env(), _stop_env(stop_tol))


@partial(jax.jit,
         static_argnames=("n_iters", "const_initial", "fft_impl", "prec",
                          "accel", "stop_tol"))
def _rl_dual(img_a, img_b, otf_a, otf_b, otf_bp_a, otf_bp_b, n_iters,
             const_initial, fft_impl, prec, accel=False, stop_tol=None):
    shape = img_a.shape
    img_a = jnp.maximum(img_a, SMALLVALUE)
    img_b = jnp.maximum(img_b, SMALLVALUE)
    if const_initial:
        est0 = jnp.full(shape, (jnp.sum(img_a) + jnp.sum(img_b)) / 2, dtype=img_a.dtype)
    else:
        est0 = (img_a + img_b) * 0.5

    if fft_impl == "pallas":
        from microimagelib_tpu.ops.fft_pallas import conv3_ct, permute_otf_jnp

        planes = [permute_otf_jnp(h, shape)
                  for h in (otf_a, otf_bp_a, otf_b, otf_bp_b)]

        def conv(x, which):
            hr, hi = planes[which]
            return conv3_ct(x, hr, hi)
    elif fft_impl == "matmul":
        planes = [(jnp.real(h).astype(jnp.float32),
                   jnp.imag(h).astype(jnp.float32))
                  for h in (otf_a, otf_bp_a, otf_b, otf_bp_b)]

        def conv(x, which):
            hr, hi = planes[which]
            return conv3_mm(x, hr, hi, prec)
    else:
        otfs = (otf_a, otf_bp_a, otf_b, otf_bp_b)

        def conv(x, which):
            return _conv_spec(x, otfs[which], shape)

    def half(est, img, base):
        fwd = conv(est, base)
        ratio = img / fwd
        upd = conv(ratio, base + 1)
        return jnp.maximum(est * upd, SMALLVALUE)

    def step(est):
        est = half(est, img_a, 0)
        return half(est, img_b, 2)

    return _rl_loop(step, est0, n_iters, accel, stop_tol)


def rl_decon_dual(img_a, img_b, otf_a, otf_b, otf_bp_a, otf_bp_b, n_iters,
                  const_initial=False, psf_a=None, psf_b=None,
                  psf_bp_a=None, psf_bp_b=None, stop_tol=None):
    """Joint dual-view RL: view A then view B per iteration
    (``decon_dualview_OTF1``, reference:src/api_subfunc.cu:3634-3660).
    The FFT backend is resolved per call by :func:`_fft_impl`; raw
    projector kwargs opt into the fused separable conv when ALL FOUR
    projectors qualify (:func:`_sep_plans`)."""
    if psf_a is not None and psf_b is not None:
        pa = np.asarray(psf_a, np.float32)
        pb = np.asarray(psf_b, np.float32)
        bpa = (np.asarray(psf_bp_a, np.float32) if psf_bp_a is not None
               else pa[::-1, ::-1, ::-1])
        bpb = (np.asarray(psf_bp_b, np.float32) if psf_bp_b is not None
               else pb[::-1, ::-1, ::-1])
        route_a = _sep_plans(pa, bpa, tuple(img_a.shape), img_a)
        route_b = (_sep_plans(pb, bpb, tuple(img_a.shape), img_a)
                   if route_a is not None else None)
        if route_a is not None and route_b is not None:
            from microimagelib_tpu.utils.device import committed_platform

            interp = committed_platform(img_a) != "tpu"
            if route_a[0] == "fused" and route_b[0] == "fused":
                pa_, pb_ = route_a[1], route_b[1]
                return _rl_dual_sep_fused(img_a, img_b, tuple(pa_[:10]),
                                          tuple(pb_[:10]), n_iters,
                                          const_initial, pa_.meta, pb_.meta,
                                          interp, _accel_env(),
                                          _stop_env(stop_tol))
            # mixed fused/pair (e.g. one view's rank blows the fused VMEM
            # budget): coerce to pairs — a fused plan implies both stage
            # plans exist
            from microimagelib_tpu.ops.conv_sep import plan_sep_pair

            tol_env = os.environ.get("MIL_CONV_SEP_TOL")
            tols = (float(tol_env),) if tol_env else (1e-6, 1e-4)
            shape = tuple(img_a.shape)

            def as_pair(route, p_np, b_np):
                if route[0] == "pair":
                    return route[1]
                # a fused plan may exist only at zb=4 (nz % 8 != 0);
                # mirror its zb fallback rather than assume zb=8 plans
                for tol in tols:
                    for zb in (8, 4):
                        pair = plan_sep_pair(p_np, b_np, shape, zb=zb,
                                             tol=tol)
                        if pair is not None:
                            return pair
                return None

            pair_a = as_pair(route_a, pa, bpa)
            pair_b = as_pair(route_b, pb, bpb) if pair_a is not None else None
            if pair_b is not None:
                fa, ba = pair_a
                fb, bb = pair_b
                return _rl_dual_sep(img_a, img_b, tuple(fa[:5]),
                                    tuple(ba[:5]), tuple(fb[:5]),
                                    tuple(bb[:5]), n_iters, const_initial,
                                    fa.meta, ba.meta, fb.meta, bb.meta,
                                    interp, _accel_env(),
                                    _stop_env(stop_tol))
            # pairing impossible for one view: fall through to the FFT
            # loop (OTFs built below when not supplied)
        if otf_a is None:
            # sep route refused; build the OTFs from the PSFs instead of
            # crashing on None
            otf_a = gen_otf(jnp.asarray(pa), img_a.shape)
            otf_b = gen_otf(jnp.asarray(pb), img_a.shape)
            otf_bp_a = gen_otf(jnp.asarray(bpa), img_a.shape)
            otf_bp_b = gen_otf(jnp.asarray(bpb), img_a.shape)
    return _rl_dual(img_a, img_b, otf_a, otf_b, otf_bp_a, otf_bp_b, n_iters,
                    const_initial, _fft_impl(img_a.shape, img_a),
                    mm_precision(), _accel_env(), _stop_env(stop_tol))


# --------------------------------------------------------------------------
# Memory-capacity tiering (the reference's gpuMemMode auto probe,
# reference:src/api_decon.cpp:111-135)
# --------------------------------------------------------------------------

_TPU_HBM_GB = {  # total HBM per chip by device-kind substring
    "v6e": 32, "v6": 32, "v5p": 95, "v5e": 16, "v5 lite": 16,
    "v4": 32, "v3": 16, "v2": 8,
}


def hbm_budget_bytes(device=None):
    """Free device-memory budget in bytes. ``MIL_HBM_BUDGET_MB`` overrides
    (for testing the tiering deterministically); otherwise the backend's
    memory stats are probed like ``cudaMemGetInfo``. Backends without
    ``memory_stats`` (the experimental axon TPU plugin — discovered when
    the round-5 beyond-HBM hardware probe saw the auto tiers treat an
    18 GB working set as fitting a 16 GB chip) fall back to the chip's
    known HBM size from ``device_kind`` at 90%; None when unknown."""
    env = os.environ.get("MIL_HBM_BUDGET_MB")
    if env:
        return float(env) * 1048576.0
    d = device if device is not None else jax.devices()[0]
    try:
        stats = d.memory_stats() or {}
        if "bytes_limit" in stats:
            return float(stats["bytes_limit"] - stats.get("bytes_in_use", 0))
    except Exception:
        pass
    try:
        if d.platform in ("tpu", "axon"):
            kind = (getattr(d, "device_kind", "") or "").lower()
            for key, gb in _TPU_HBM_GB.items():
                if key in kind:
                    return gb * 0.90e9
            return 16 * 0.90e9  # unknown TPU kind: the smallest modern chip
    except Exception:
        pass
    return None


def _workingset_bytes(fft_shape, dual):
    """HBM-resident working set of the mode-1 RL loop on the FFT grid:
    real volumes (est + imgs) + complex OTFs + XLA FFT scratch. The dual
    path needs ~9 grid-sized buffers, single ~6 — the same tiers the
    reference sizes its probe against (reference:src/api_decon.cpp:402-413)."""
    vol = fft_shape[0] * fft_shape[1] * fft_shape[2] * 4
    return (9 if dual else 6) * vol


def _resolve_mem_mode(mem_mode, fft_shape, dual, device, verbose=False):
    """-1 auto / 0 CPU / 1 HBM-resident / 2 host-staged streamed
    (reference ``gpuMemMode``, reference:src/api_decon.cpp:111-135)."""
    if mem_mode in (0, 1, 2):
        return int(mem_mode)
    budget = hbm_budget_bytes(device)
    if budget is None:
        return 1
    need = _workingset_bytes(fft_shape, dual)
    mode = 1 if need <= budget * 0.92 else 2
    if verbose and mode == 2:
        print(f"...device memory budget {budget/1048576:.0f} MB below the "
              f"{need/1048576:.0f} MB working set: host-staged streaming mode")
    return mode


# --------------------------------------------------------------------------
# Full entries (host orchestration, numpy in/out)
# --------------------------------------------------------------------------

def _fft_grid(shape_zyx, tpu_friendly=True):
    return tuple(snap_fft_size(int(s), tpu_friendly) for s in shape_zyx)


def _prep_pad(img, fft_shape):
    if tuple(img.shape) != tuple(fft_shape):
        return pad_stack_edge(img, fft_shape)
    return img


def decon_singleview(img, psf, n_iters=20, const_initial=False, psf_bp=None,
                     device=None, mem_mode=-1, verbose=False, records=None,
                     tpu_friendly_fft=True):
    """Single-view RL deconvolution, full pipeline
    (``decon_singleview``, reference:src/api_decon.cpp:53-331).

    img, psf: (z, y, x) arrays. ``psf_bp`` switches to the unmatched
    back-projector path (reference ``flagUnmatch``); otherwise the back
    projector is the flipped PSF. Returns the deconvolved volume with
    img's shape as float32 numpy.

    ``records`` (len-10 list/array, optional) is filled with the reference
    telemetry layout: [0] mem mode used, [1..5] free-memory snapshots MB,
    [6..9] init/preproc/decon/total seconds
    (reference:src/api_decon.cpp:56-59).

    ``mem_mode``: -1 auto-probe / 0 CPU backend / 1 HBM-resident /
    2 host-staged streaming for volumes beyond one chip's HBM (the
    reference's gpuMemMode, reference:src/api_decon.cpp:111-135; mesh
    sharding in microimagelib_tpu.parallel is the multi-chip option)."""
    t0 = time.time()
    from microimagelib_tpu.utils.device import free_memory_mb

    if records is not None:
        records[1] = free_memory_mb(device)
    # device-array inputs pass through without host staging (the fetch +
    # re-upload costs ~0.1-0.2 s each at pipeline shapes on a tunneled
    # TPU); the streamed tier below materializes host copies when taken
    img_shape = tuple(np.shape(img))
    psf_np = np.asarray(psf, dtype=np.float32)
    fft_shape = _fft_grid(img_shape, tpu_friendly_fft)
    if verbose:
        print(f"...Image size {img_shape[2]} x {img_shape[1]} x {img_shape[0]}")
        print(f"...PSF size {psf_np.shape[2]} x {psf_np.shape[1]} x {psf_np.shape[0]}")
        print(f"...FFT size {fft_shape[2]} x {fft_shape[1]} x {fft_shape[0]}")
    mode = _resolve_mem_mode(mem_mode, fft_shape, dual=False, device=device,
                             verbose=verbose)

    if mode == 2:
        img_np = np.asarray(img, dtype=np.float32)
        from microimagelib_tpu.models.decon_streamed import (
            np_crop_center,
            np_gen_otf,
            np_pad_stack_edge,
            rl_decon_single_streamed,
        )

        t1 = time.time()
        otf = np_gen_otf(psf_np, fft_shape)
        bp_np = (np.asarray(psf_bp, np.float32) if psf_bp is not None
                 else psf_np[::-1, ::-1, ::-1])
        otf_bp = np_gen_otf(bp_np, fft_shape)
        padded = (np_pad_stack_edge(img_np, fft_shape)
                  if tuple(img_np.shape) != fft_shape else img_np)
        t2 = time.time()
        if records is not None:
            records[2] = free_memory_mb(device)
        est = rl_decon_single_streamed(padded, otf, otf_bp, n_iters,
                                       const_initial,
                                       budget_bytes=hbm_budget_bytes(device))
        if records is not None:
            records[3] = free_memory_mb(device)
        out_np = np.asarray(np_crop_center(est, img_np.shape))
        t3 = time.time()
        if records is not None:
            records[0] = 2
            records[4] = free_memory_mb(device)
            records[5] = free_memory_mb(device)
            records[6] = t1 - t0
            records[7] = t2 - t1
            records[8] = t3 - t2
            records[9] = t3 - t0
        return out_np

    if mode == 0:
        device = jax.devices("cpu")[0]
    if device is not None:
        # device_put host arrays directly (jnp.asarray would stage a
        # transient full-volume copy on the default backend first);
        # device-resident inputs transfer only if pinned elsewhere
        img = jax.device_put(img if isinstance(img, jax.Array)
                             else np.asarray(img, np.float32), device)
        psf = jax.device_put(psf_np, device)
    else:
        img = jnp.asarray(img, jnp.float32)
        psf = jnp.asarray(psf_np)
    t1 = time.time()

    otf = gen_otf(psf, fft_shape, normalize=True)
    if psf_bp is not None:
        if device is not None:
            bp = jax.device_put(np.asarray(psf_bp, np.float32), device)
        else:
            bp = jnp.asarray(psf_bp, dtype=jnp.float32)
        otf_bp = gen_otf(bp, fft_shape, normalize=True)
    else:
        otf_bp = gen_otf(flip3(psf), fft_shape, normalize=True)
    padded = _prep_pad(img, fft_shape)
    t2 = time.time()
    if records is not None:
        records[2] = free_memory_mb(device)

    est = rl_decon_single(padded, otf, otf_bp, n_iters, const_initial,
                          psf=psf_np,
                          psf_bp=(np.asarray(psf_bp, np.float32)
                                  if psf_bp is not None else None))
    if records is not None:
        records[3] = free_memory_mb(device)
    out = crop_center(est, img.shape) if fft_shape != tuple(img.shape) else est
    out_np = np.asarray(out)
    t3 = time.time()
    if records is not None:
        records[0] = mode
        records[4] = free_memory_mb(device)
        records[5] = free_memory_mb(device)
        records[6] = t1 - t0
        records[7] = t2 - t1
        records[8] = t3 - t2
        records[9] = t3 - t0
    return out_np


def decon_dualview(img_a, img_b, psf_a, psf_b, n_iters=10, const_initial=False,
                   psf_bp_a=None, psf_bp_b=None, device=None, mem_mode=-1,
                   verbose=False, records=None, tpu_friendly_fft=True):
    """Joint dual-view RL deconvolution
    (``decon_dualview``, reference:src/api_decon.cpp:333-704). Views must
    share a shape (validated like reference:src/decon_dv.cpp:167-188).
    Unmatched back projectors apply only when BOTH are provided, matching
    the reference's single ``flagUnmatch``."""
    t0 = time.time()
    from microimagelib_tpu.utils.device import free_memory_mb

    if records is not None:
        records[1] = free_memory_mb(device)
    shape_a = tuple(np.shape(img_a))
    shape_b = tuple(np.shape(img_b))
    if shape_a != shape_b:
        raise ValueError(f"Dual-view images must match in size: {shape_a} vs {shape_b}")
    psf_a_np = np.asarray(psf_a, dtype=np.float32)
    psf_b_np = np.asarray(psf_b, dtype=np.float32)
    fft_shape = _fft_grid(shape_a, tpu_friendly_fft)
    mode = _resolve_mem_mode(mem_mode, fft_shape, dual=True, device=device,
                             verbose=verbose)

    if mode == 2:
        img_a_np = np.asarray(img_a, dtype=np.float32)
        img_b_np = np.asarray(img_b, dtype=np.float32)
        from microimagelib_tpu.models.decon_streamed import (
            np_crop_center,
            np_gen_otf,
            np_pad_stack_edge,
            rl_decon_dual_streamed,
        )

        t1 = time.time()
        otf_a_h = np_gen_otf(psf_a_np, fft_shape)
        otf_b_h = np_gen_otf(psf_b_np, fft_shape)
        unmatch = psf_bp_a is not None and psf_bp_b is not None
        bp_a = (np.asarray(psf_bp_a, np.float32) if unmatch
                else psf_a_np[::-1, ::-1, ::-1])
        bp_b = (np.asarray(psf_bp_b, np.float32) if unmatch
                else psf_b_np[::-1, ::-1, ::-1])
        otf_bp_a_h = np_gen_otf(bp_a, fft_shape)
        otf_bp_b_h = np_gen_otf(bp_b, fft_shape)
        pad_a = (np_pad_stack_edge(img_a_np, fft_shape)
                 if tuple(img_a_np.shape) != fft_shape else img_a_np)
        pad_b = (np_pad_stack_edge(img_b_np, fft_shape)
                 if tuple(img_b_np.shape) != fft_shape else img_b_np)
        t2 = time.time()
        if records is not None:
            records[2] = free_memory_mb(device)
        est = rl_decon_dual_streamed(pad_a, pad_b, otf_a_h, otf_b_h,
                                     otf_bp_a_h, otf_bp_b_h, n_iters,
                                     const_initial,
                                     budget_bytes=hbm_budget_bytes(device))
        if records is not None:
            records[3] = free_memory_mb(device)
        out_np = np.asarray(np_crop_center(est, img_a_np.shape))
        t3 = time.time()
        if records is not None:
            records[0] = 2
            records[4] = free_memory_mb(device)
            records[5] = free_memory_mb(device)
            records[6] = t1 - t0
            records[7] = t2 - t1
            records[8] = t3 - t2
            records[9] = t3 - t0
        return out_np

    if mode == 0:
        device = jax.devices("cpu")[0]
    def _stage(v):
        arr = v if isinstance(v, jax.Array) else np.asarray(v, np.float32)
        return (jax.device_put(arr, device) if device is not None
                else jnp.asarray(arr, jnp.float32))

    img_a = _stage(img_a)
    img_b = _stage(img_b)
    psf_a = _stage(psf_a_np)
    psf_b = _stage(psf_b_np)
    t1 = time.time()

    otf_a = gen_otf(psf_a, fft_shape, normalize=True)
    otf_b = gen_otf(psf_b, fft_shape, normalize=True)
    unmatch = psf_bp_a is not None and psf_bp_b is not None
    if unmatch:
        # unmatched back projectors follow the same device routing as the
        # images — a default-backend OTF next to CPU-pinned volumes would
        # need a cross-device c64 transfer, which axon rejects
        if device is not None:
            bp_a = jax.device_put(np.asarray(psf_bp_a, np.float32), device)
            bp_b = jax.device_put(np.asarray(psf_bp_b, np.float32), device)
        else:
            bp_a = jnp.asarray(psf_bp_a, dtype=jnp.float32)
            bp_b = jnp.asarray(psf_bp_b, dtype=jnp.float32)
        otf_bp_a = gen_otf(bp_a, fft_shape, normalize=True)
        otf_bp_b = gen_otf(bp_b, fft_shape, normalize=True)
    else:
        otf_bp_a = gen_otf(flip3(psf_a), fft_shape, normalize=True)
        otf_bp_b = gen_otf(flip3(psf_b), fft_shape, normalize=True)
    pad_a = _prep_pad(img_a, fft_shape)
    pad_b = _prep_pad(img_b, fft_shape)
    t2 = time.time()
    if records is not None:
        records[2] = free_memory_mb(device)

    est = rl_decon_dual(pad_a, pad_b, otf_a, otf_b, otf_bp_a, otf_bp_b,
                        n_iters, const_initial, psf_a=psf_a_np, psf_b=psf_b_np,
                        psf_bp_a=(np.asarray(psf_bp_a, np.float32)
                                  if unmatch else None),
                        psf_bp_b=(np.asarray(psf_bp_b, np.float32)
                                  if unmatch else None))
    if records is not None:
        records[3] = free_memory_mb(device)
    out = crop_center(est, img_a.shape) if fft_shape != tuple(img_a.shape) else est
    out_np = np.asarray(out)
    t3 = time.time()
    if records is not None:
        records[0] = mode
        records[4] = free_memory_mb(device)
        records[5] = free_memory_mb(device)
        records[6] = t1 - t0
        records[7] = t2 - t1
        records[8] = t3 - t2
        records[9] = t3 - t0
    return out_np


def decon_dualview_prepared(pad_a, pad_b, otf_a, otf_b, otf_bp_a, otf_bp_b,
                            n_iters, const_initial, out_shape):
    """Batch-mode fast path: everything already on device / precomputed
    OTFs, for reuse across timepoints (the reference's
    ``decon_dualview_batch`` with precomputed OTFs,
    reference:src/api_decon.cpp:707-985). Returns a device array."""
    est = rl_decon_dual(pad_a, pad_b, otf_a, otf_b, otf_bp_a, otf_bp_b, n_iters, const_initial)
    if tuple(out_shape) != tuple(est.shape):
        est = crop_center(est, out_shape)
    return est


def decon_dualview_prepared_batch(pads_a, pads_b, otf_a, otf_b, otf_bp_a,
                                  otf_bp_b, n_iters, const_initial,
                                  out_shape):
    """Grouped single-chip batch decon: a GROUP of prepared timepoints
    runs through ONE vmapped RL program — one dispatch instead of one
    per timepoint, amortizing the per-call overhead the reference's
    serial loop pays every time (reference:src/spim_fusion_batch.cpp:
    613-627; round-2 verdict #7). pads_*: (g, z, y, x) on the FFT grid.

    The fused Pallas conv does not vmap; groups route through the
    matmul/XLA implementations (batch volumes sit below the pallas-auto
    threshold anyway)."""
    impl = _fft_impl(tuple(pads_a.shape[1:]), pads_a)
    if impl == "pallas":
        impl = "matmul"
    return _rl_dual_batch(pads_a, pads_b, otf_a, otf_b, otf_bp_a, otf_bp_b,
                          n_iters, const_initial, impl, mm_precision(),
                          tuple(out_shape))


@partial(jax.jit, static_argnames=("n_iters", "const_initial", "fft_impl",
                                   "prec", "out_shape"))
def _rl_dual_batch(pads_a, pads_b, otf_a, otf_b, otf_bp_a, otf_bp_b,
                   n_iters, const_initial, fft_impl, prec, out_shape):
    def one(a, b):
        est = _rl_dual(a, b, otf_a, otf_b, otf_bp_a, otf_bp_b, n_iters,
                       const_initial, fft_impl, prec)
        if tuple(out_shape) != tuple(est.shape):
            est = crop_center(est, out_shape)
        return est

    return jax.vmap(one)(pads_a, pads_b)
