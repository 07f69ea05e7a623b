"""Matmul-form 3D real FFTs on the MXU.

The reference's RL deconvolution is cuFFT-bound (one R2C + C2R pair per
half-iteration, reference:src/api_subfunc.cu:3404-3416). On TPU the XLA
FFT is far from the roofline: measured 82.9 ms for a 512^3 rfftn on a
v5e where one read+write pass over the spectrum is ~2 ms (BASELINE.md).
The MXU-native alternative implemented here expresses each axis DFT as
a dense matmul with a precomputed DFT matrix:

  * x axis (innermost): real -> half spectrum, two real matmuls with
    (nx, nx//2+1) cos/sin matrices;
  * y and z axes: complex -> complex, four real matmuls each (explicit
    real/imag planes — the MXU has no complex type);
  * inverse: complex passes with e^{+i} matrices, then a Hermitian-
    weighted half-spectrum -> real matmul pair along x with the full
    1/(nz*ny*nx) normalization folded into the matrices.

At 512^3 this is ~0.7 TFLOP per transform — a few ms of MXU time versus
XLA's 83 ms — and it works for ARBITRARY axis lengths (no radix-2
restriction), so no FFT-grid snapping is required for this path.

Numerics: DFT matrices are built in float64 and cast to float32; the
contraction precision is configurable (``MIL_FFT_MM_PRECISION`` =
default | high | highest, mapping to the TPU's bf16 / bf16x3 / f32
matmul passes). ``highest`` keeps a 512-point transform at ~1e-6
relative error, far inside the decon budget.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "rfft3_mm",
    "irfft3_mm",
    "conv3_mm",
    "mm_precision",
]


def mm_precision():
    """Contraction precision for the DFT matmuls (env-tunable).

    Default ``high`` (bf16x3 passes): measured 2.7e-5 per-conv / 6.6e-5
    per-10-RL-iteration deviation from the full-f32 ``highest`` at 512^3
    — far inside the <1e-3 fidelity budget — at 1.8x the speed (56 vs
    77 ms per conv roundtrip, 16.3 vs 9.9 RL iters/s end to end)."""
    name = os.environ.get("MIL_FFT_MM_PRECISION", "high").lower()
    table = {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }
    if name not in table:
        raise ValueError(
            f"MIL_FFT_MM_PRECISION={name!r} is not valid; "
            f"use one of {sorted(table)}")
    return table[name]


# --------------------------------------------------------------------------
# DFT matrices (built once per length on the host, f64 -> f32)
# --------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _rfft_mats(n):
    """Forward real->half matrices: (n, k) cos and -sin, k = n//2 + 1."""
    k = n // 2 + 1
    ang = -2.0 * np.pi * np.outer(np.arange(n), np.arange(k)) / n
    return (np.cos(ang).astype(np.float32),
            np.sin(ang).astype(np.float32))


@lru_cache(maxsize=None)
def _cfft_mats(n, sign):
    """Full complex DFT matrices: (n, n) cos and sign*sin."""
    ang = sign * 2.0 * np.pi * np.outer(np.arange(n), np.arange(n)) / n
    return (np.cos(ang).astype(np.float32),
            np.sin(ang).astype(np.float32))


@lru_cache(maxsize=None)
def _irfft_mats(n, norm):
    """Inverse half->real matrices: (k, n) with Hermitian weights and the
    total normalization ``norm`` folded in.  v[x] = sum_k w_k/norm *
    (Xr[k] cos(2 pi k x / n) - Xi[k] sin(2 pi k x / n))."""
    k = n // 2 + 1
    w = np.full(k, 2.0)
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    ang = 2.0 * np.pi * np.outer(np.arange(k), np.arange(n)) / n
    scale = (w / norm)[:, None]
    return ((np.cos(ang) * scale).astype(np.float32),
            (-np.sin(ang) * scale).astype(np.float32))


# --------------------------------------------------------------------------
# Axis passes
# --------------------------------------------------------------------------

def _split_factor(n):
    """Pick the Cooley-Tukey split n = n1 * n2 with n1 the MXU-sized
    inner contraction. Returns None when no useful split exists."""
    for n1 in (128, 256, 64):
        if n % n1 == 0 and n // n1 >= 2:
            return n1, n // n1
    return None


@lru_cache(maxsize=None)
def _twiddle_mats(n, n1, n2, sign):
    """W_n^{sign * k1 * j2} twiddles, shape (n1, n2)."""
    ang = sign * 2.0 * np.pi * np.outer(np.arange(n1), np.arange(n2)) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def mm_algo():
    """DFT algorithm: full (one dense matmul per axis) | split (two-stage
    Cooley-Tukey, ~4x fewer FLOPs when an axis divides by 128). Full is
    the default: measured FASTER than split at 512^3 on the v5e (74.9 vs
    98.4 ms per conv roundtrip) — the split's small outer contraction
    (n2 = 4) underfills the MXU and its twiddle stage adds an HBM pass,
    while the dense 512-wide contraction runs at high MXU utilization."""
    return os.environ.get("MIL_FFT_MM_ALGO", "full")


def _cpass_full(re, im, fr, fi, spec, prec):
    """One complex-to-complex axis DFT on explicit real/imag planes.
    ``spec`` is the einsum spec, e.g. 'zyk,yj->zjk' for the y axis.

    Uses the 3-multiplication (Karatsuba) form by default — the volume
    operand appears in 3 contractions instead of 4 (m1 = re@fr,
    m2 = im@fi, m3 = (re+im)@(fr+fi)) for a 25% FLOP cut on the complex
    passes; ``MIL_FFT_MM_COMPLEX=naive`` restores the 4-matmul form."""
    ein = partial(jnp.einsum, spec, precision=prec)
    if os.environ.get("MIL_FFT_MM_COMPLEX", "karatsuba") == "naive":
        return (ein(re, fr) - ein(im, fi),
                ein(re, fi) + ein(im, fr))
    m1 = ein(re, fr)
    m2 = ein(im, fi)
    m3 = ein(re + im, fr + fi)
    return m1 - m2, m3 - m1 - m2


# Per-axis einsum specs for the split algorithm: (inner, outer) with the
# transformed axis expanded to (j1=a, j2=b) and producing (k2=B, k1=A) in
# its place — flattening (B, A) yields k = k1 + n1*k2, the CT index map.
_SPLIT_SPECS = {
    0: ("abyk,aA->Abyk", "Abyk,bB->BAyk"),
    1: ("zabk,aA->zAbk", "zAbk,bB->zBAk"),
}


def _cpass_split(re, im, axis, n, sign, prec):
    """Two-stage Cooley-Tukey complex DFT along ``axis``: an MXU-sized
    inner contraction (n1 = 128), a twiddle multiply, and a small outer
    contraction (n2 = n/128). Identical math to :func:`_cpass_full`."""
    n1, n2 = _split_factor(n)
    f1r, f1i = (jnp.asarray(m) for m in _cfft_mats(n1, sign))
    f2r, f2i = (jnp.asarray(m) for m in _cfft_mats(n2, sign))
    tr, ti = (jnp.asarray(m) for m in _twiddle_mats(n, n1, n2, sign))
    inner, outer = _SPLIT_SPECS[axis]

    shape = re.shape
    split = shape[:axis] + (n1, n2) + shape[axis + 1:]
    re, im = re.reshape(split), im.reshape(split)

    ein = partial(jnp.einsum, inner, precision=prec)
    ar, ai = (ein(re, f1r) - ein(im, f1i)), (ein(re, f1i) + ein(im, f1r))

    tw_shape = [1] * len(split)
    tw_shape[axis], tw_shape[axis + 1] = n1, n2
    tr, ti = tr.reshape(tw_shape), ti.reshape(tw_shape)
    br, bi = ar * tr - ai * ti, ar * ti + ai * tr

    ein = partial(jnp.einsum, outer, precision=prec)
    xr, xi = (ein(br, f2r) - ein(bi, f2i)), (ein(br, f2i) + ein(bi, f2r))
    return xr.reshape(shape), xi.reshape(shape)


def _cpass(re, im, axis, n, sign, spec, prec, algo):
    if algo == "split" and _split_factor(n) is not None:
        return _cpass_split(re, im, axis, n, sign, prec)
    fr, fi = (jnp.asarray(m) for m in _cfft_mats(n, sign))
    return _cpass_full(re, im, fr, fi, spec, prec)


def rfft3_mm(v, precision=None, algo=None):
    """3D rFFT of a real (z, y, x) volume as MXU matmuls.

    Returns (re, im) float32 planes of shape (z, y, x//2 + 1), matching
    ``jnp.fft.rfftn(v)`` (unnormalized forward)."""
    prec = mm_precision() if precision is None else precision
    algo = mm_algo() if algo is None else algo
    nz, ny, nx = v.shape
    cr, ci = (jnp.asarray(m) for m in _rfft_mats(nx))
    ein = partial(jnp.einsum, "zyx,xk->zyk", precision=prec)
    re, im = ein(v, cr), ein(v, ci)
    re, im = _cpass(re, im, 1, ny, -1, "zyk,yj->zjk", prec, algo)
    return _cpass(re, im, 0, nz, -1, "zyk,zi->iyk", prec, algo)


def irfft3_mm(re, im, nx, precision=None, algo=None):
    """Inverse of :func:`rfft3_mm`: (re, im) half-spectrum planes ->
    real (z, y, nx) volume, matching ``jnp.fft.irfftn(spec, s=shape)``."""
    prec = mm_precision() if precision is None else precision
    algo = mm_algo() if algo is None else algo
    nz, ny, _k = re.shape
    re, im = _cpass(re, im, 0, nz, +1, "zyk,zi->iyk", prec, algo)
    re, im = _cpass(re, im, 1, ny, +1, "zyk,yj->zjk", prec, algo)
    ar, ai = (jnp.asarray(m) for m in _irfft_mats(nx, float(nz) * ny * nx))
    ein = partial(jnp.einsum, "zyk,kx->zyx", precision=prec)
    return ein(re, ar) + ein(im, ai)


def conv3_mm(v, otf_re, otf_im, precision=None, algo=None):
    """Circular convolution ``irfftn(rfftn(v) * OTF)`` fused on the MXU.

    ``otf_re``/``otf_im`` are the real/imag planes of the OTF on the
    same grid (from ``gen_otf``). Matches the reference's per-step
    FFT-multiply-iFFT (reference:src/api_subfunc.cu:3404-3416)."""
    prec = mm_precision() if precision is None else precision
    algo = mm_algo() if algo is None else algo
    re, im = rfft3_mm(v, prec, algo)
    pr = re * otf_re - im * otf_im
    pi = re * otf_im + im * otf_re
    return irfft3_mm(pr, pi, v.shape[2], prec, algo)
