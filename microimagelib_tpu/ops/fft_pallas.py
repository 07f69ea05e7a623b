"""Fused Pallas TPU FFT-convolution: the RL decon hot op as THREE kernel
launches instead of ~17 XLA ops.

Why: on the axon v5e every sizeable XLA op (and every pallas_call)
carries a measured ~1.3 ms fixed cost, and dense-DFT matmuls cost
~3.3 TFLOP of bf16 passes per 512^3 conv — together they explain the
round-2 conv floor (~30 ms in-loop, BASELINE.md). This module attacks
both:

  * op count: forward-xy, z-conv (fwd*OTF*inv), inverse-yx are each ONE
    pallas_call with all intermediates in VMEM (grid-step pipelined);
  * FLOPs: the y and z axes use a radix-4 Cooley-Tukey split — a VPU
    butterfly + twiddle and ONE shared dense (n/4)-point DFT matmul per
    karatsuba component (slabs concatenated along lanes), ~4x fewer
    matmul FLOPs than the dense DFT;
  * precision: Mosaic rejects precision=HIGH (measured), so every
    matmul is a MANUAL bf16x3 (hi/lo split, drop lo*lo): measured
    3.5e-6 max rel err per matmul on DFT-like operands — inside the
    <=1e-4 budget the round-2 verdict sets.

Frequency-domain ordering: the CT split leaves y and z frequencies in
(q, r) interleaved order (j = r + 4q, with q on sublanes and r on lane
groups). Nothing ever needs natural order mid-pipeline — the OTF is
PRE-PERMUTED into this layout once (``permute_otf``) and phase C applies
the exact adjoint, so no reordering passes exist at runtime.

Matches the reference's per-iteration FFT-multiply-iFFT structure
(reference:src/api_subfunc.cu:3404-3416) with identical circular-conv
semantics as ops/fft_matmul.py::conv3_mm.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3_ct", "permute_otf", "permute_otf_jnp", "ct_supported"]


def _kxp(nx):
    return -(-(nx // 2 + 1) // 128) * 128


def ct_supported(shape):
    """The fused path needs: x (lanes) a multiple of 128; y and z
    radix-4-splittable with sublane-aligned quarters; and xy planes no
    larger than the proven 512x512 — the kernel's slab windows scale
    with ny*nx and Mosaic VMEM-OOMs at 1024x1024 planes (measured
    round 5: 155.5M of 128M used at (704, 1024, 1024); 512^3 fits).
    Larger planes fall back to the matmul DFT, whose XLA einsums are
    compiler-tiled and VMEM-safe."""
    nz, ny, nx = shape
    return (nx % 128 == 0 and ny % 32 == 0 and nz % 32 == 0
            and ny >= 32 and nz >= 32 and ny * nx <= 512 * 512)


# --------------------------------------------------------------------------
# host-built constants (f64 -> f32 -> bf16 hi/lo pairs)
# --------------------------------------------------------------------------

def _hi_lo(m32):
    hi = m32.astype(np.float32).astype(jnp.bfloat16)
    lo = (m32.astype(np.float32) - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return np.asarray(hi), np.asarray(lo)


@lru_cache(maxsize=None)
def _consts_rfft_x(nx):
    """(4, nx, kxp) bf16: [cos_hi, sin_hi, cos_lo, sin_lo]; ang = -2pi x k/n.
    Columns beyond nx//2 are zero."""
    k = nx // 2 + 1
    kp = _kxp(nx)
    ang = -2.0 * np.pi * np.outer(np.arange(nx), np.arange(k)) / nx
    c = np.zeros((nx, kp), np.float64)
    s = np.zeros((nx, kp), np.float64)
    c[:, :k] = np.cos(ang)
    s[:, :k] = np.sin(ang)
    ch, cl = _hi_lo(c)
    sh, sl = _hi_lo(s)
    return np.stack([ch, sh, cl, sl])


@lru_cache(maxsize=None)
def _consts_irfft_x(nx, norm):
    """(4, kxp, nx) bf16 with Hermitian weights and 1/norm folded;
    v[x] = sum_k w_k/norm (Re cos + Im*(-sin)). Pad rows zero."""
    k = nx // 2 + 1
    kp = _kxp(nx)
    w = np.full(k, 2.0)
    w[0] = 1.0
    if nx % 2 == 0:
        w[-1] = 1.0
    ang = 2.0 * np.pi * np.outer(np.arange(k), np.arange(nx)) / nx
    scale = (w / norm)[:, None]
    a = np.zeros((kp, nx), np.float64)
    b = np.zeros((kp, nx), np.float64)
    a[:k] = np.cos(ang) * scale
    b[:k] = -np.sin(ang) * scale
    ah, al = _hi_lo(a)
    bh, bl = _hi_lo(b)
    return np.stack([ah, bh, al, bl])


@lru_cache(maxsize=None)
def _consts_ct(n, inverse, lanes):
    """Radix-4 CT constants for axis length n = 4*n1.

    Returns (F6, T2): F6 (6, n1, n1) bf16 = karatsuba dense set
    [Fr_hi, Fi_hi, Fri_hi, Fr_lo, Fi_lo, Fri_lo] with
    F[a, b] = exp(sign*2pi i a b / n1); T2 (2, n1, 4*lanes) f32 FORWARD
    twiddles T[a, r] = exp(-2pi i a r / n) pre-broadcast over each
    r-group's ``lanes`` columns (so the kernel multiplies the whole
    concatenated slab in one VPU op — no per-lane selects). The dense
    set's sign is -1 forward, +1 inverse (inverse is UNNORMALIZED; the
    1/n rides in the irfft-x matrices); twiddles are always the forward
    ones — the inverse kernels conjugate in place."""
    n1 = n // 4
    sign = 1.0 if inverse else -1.0
    ang_f = sign * 2.0 * np.pi * np.outer(np.arange(n1), np.arange(n1)) / n1
    fr, fi = np.cos(ang_f), np.sin(ang_f)
    fh = []
    for m in (fr, fi, fr + fi):
        h, l = _hi_lo(m)
        fh.append((h, l))
    f6 = np.stack([fh[0][0], fh[1][0], fh[2][0], fh[0][1], fh[1][1], fh[2][1]])
    ang_t = -2.0 * np.pi * np.outer(np.arange(n1), np.arange(4)) / n
    t2 = np.stack([np.cos(ang_t), np.sin(ang_t)]).astype(np.float32)
    t2 = np.repeat(t2, lanes, axis=2)  # (2, n1, 4*lanes)
    return f6, t2


def permute_otf(otf_re, otf_im, shape):
    """Pre-permute a natural-order half-spectrum OTF (nz, ny, nx//2+1)
    into the CT pipeline's phase-B layout:

      O[q_y, q_z, r_z * (4*kxp) ... ] with lane order
      [r_y-group(kxp)][within: r_z(kxp-chunks)]  -- precisely:
      O[q_y, q_z, r_y*(4*kxp) + r_z*kxp + k] = OTF[r_z + 4*q_z,
                                                   r_y + 4*q_y, k]

    so that the block for grid step (row=q_y, chunk=r_y) is the
    contiguous (1, n1z, 4*kxp) slab the kernel needs after its z-CT
    (lane groups indexed by r_z). k >= nx//2+1 lanes are zero."""
    nz, ny, nx = shape
    n1y, n1z = ny // 4, nz // 4
    kp = _kxp(nx)
    kx = nx // 2 + 1
    otf_re = np.asarray(otf_re, np.float32)
    otf_im = np.asarray(otf_im, np.float32)
    qy = np.arange(n1y)[:, None, None, None, None]
    ry = np.arange(4)[None, :, None, None, None]
    qz = np.arange(n1z)[None, None, :, None, None]
    rz = np.arange(4)[None, None, None, :, None]
    kk = np.arange(kx)[None, None, None, None, :]
    o_re = np.zeros((n1y, 4, n1z, 4, kp), np.float32)
    o_im = np.zeros((n1y, 4, n1z, 4, kp), np.float32)
    o_re[:, :, :, :, :kx] = otf_re[rz + 4 * qz, ry + 4 * qy, kk]
    o_im[:, :, :, :, :kx] = otf_im[rz + 4 * qz, ry + 4 * qy, kk]
    out_shape = (n1y, 4, n1z, 4 * kp)
    return (jnp.asarray(o_re.reshape(out_shape)),
            jnp.asarray(o_im.reshape(out_shape)))


def permute_otf_jnp(otf, shape):
    """Traced twin of :func:`permute_otf` for a device-resident complex
    OTF: the CT layout is just pad + reshape + transpose (kz = 4*qz + rz
    and jy = 4*qy + ry are exactly the reshape split), so inside a jitted
    RL entry this is one cheap relayout executed once per call, outside
    the iteration loop."""
    nz, ny, nx = shape
    n1y, n1z = ny // 4, nz // 4
    kp = _kxp(nx)
    kx = nx // 2 + 1
    otf = jnp.pad(otf, ((0, 0), (0, 0), (0, kp - kx)))
    o5 = otf.reshape(n1z, 4, n1y, 4, kp).transpose(2, 3, 0, 1, 4)
    o5 = o5.reshape(n1y, 4, n1z, 4 * kp)
    return (jnp.real(o5).astype(jnp.float32),
            jnp.imag(o5).astype(jnp.float32))


# --------------------------------------------------------------------------
# kernel helpers (traced inside Mosaic)
# --------------------------------------------------------------------------

def _split(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3_cl(ch, cl, x):
    """bf16x3 with CONSTANT LEFT operand (pre-split): c @ x."""
    xh, xl = _split(x)
    o = jnp.dot(ch, xh, preferred_element_type=jnp.float32)
    o += jnp.dot(ch, xl, preferred_element_type=jnp.float32)
    o += jnp.dot(cl, xh, preferred_element_type=jnp.float32)
    return o


def _dot3_cr(x, ch, cl):
    """bf16x3 with CONSTANT RIGHT operand: x @ c."""
    xh, xl = _split(x)
    o = jnp.dot(xh, ch, preferred_element_type=jnp.float32)
    o += jnp.dot(xl, ch, preferred_element_type=jnp.float32)
    o += jnp.dot(xh, cl, preferred_element_type=jnp.float32)
    return o


def _karatsuba_cl(f_ref, xr, xi):
    """Complex dense DFT, constant-left karatsuba * bf16x3 (9 matmuls):
    (Fr + iFi) @ (xr + i xi)."""
    m1 = _dot3_cl(f_ref[0], f_ref[3], xr)
    m2 = _dot3_cl(f_ref[1], f_ref[4], xi)
    m3 = _dot3_cl(f_ref[2], f_ref[5], xr + xi)
    return m1 - m2, m3 - m1 - m2


def _butterfly_fwd(sr, si, n1):
    """Radix-4 decimation butterfly over 4 sublane slabs; returns the 4
    complex branch pairs [(b0r,b0i),...] for r = 0..3 (W4 = -i)."""
    s = [(sr[i * n1:(i + 1) * n1, :], si[i * n1:(i + 1) * n1, :])
         for i in range(4)]
    er, ei = s[0][0] + s[2][0], s[0][1] + s[2][1]
    fr, fi = s[0][0] - s[2][0], s[0][1] - s[2][1]
    gr, gi = s[1][0] + s[3][0], s[1][1] + s[3][1]
    hr, hi = s[1][0] - s[3][0], s[1][1] - s[3][1]
    return [
        (er + gr, ei + gi),            # r=0: e + g
        (fr + hi, fi - hr),            # r=1: f - i h
        (er - gr, ei - gi),            # r=2: e - g
        (fr - hi, fi + hr),            # r=3: f + i h
    ]


def _butterfly_inv(d, axis):
    """Inverse radix-4 combine of 4 complex lane-group branches d[r] into
    output slabs s[z2] (W4^{+z2 r} = i^{z2 r}); concatenated on ``axis``."""
    (d0r, d0i), (d1r, d1i), (d2r, d2i), (d3r, d3i) = d
    er, ei = d0r + d2r, d0i + d2i
    fr, fi = d0r - d2r, d0i - d2i
    gr, gi = d1r + d3r, d1i + d3i
    hr, hi = d1r - d3r, d1i - d3i
    s0 = (er + gr, ei + gi)
    s1 = (fr - hi, fi + hr)            # f + i h
    s2 = (er - gr, ei - gi)
    s3 = (fr + hi, fi - hr)            # f - i h
    out_r = jnp.concatenate([s0[0], s1[0], s2[0], s3[0]], axis=axis)
    out_i = jnp.concatenate([s0[1], s1[1], s2[1], s3[1]], axis=axis)
    return out_r, out_i


def _ct_forward(sr, si, t_ref, f_ref, n1):
    """Full forward CT along the SUBLANE axis: butterfly -> twiddle ->
    lane-concat -> shared dense karatsuba. In: (4*n1, L) f32 planes.
    Out: (n1, 4*L) with lane groups r, sublanes q (j = r + 4q)."""
    branches = _butterfly_fwd(sr, si, n1)
    br = jnp.concatenate([b[0] for b in branches], axis=1)
    bi = jnp.concatenate([b[1] for b in branches], axis=1)
    tr = t_ref[0]
    ti = t_ref[1]
    xr = br * tr - bi * ti
    xi = br * ti + bi * tr
    return _karatsuba_cl(f_ref, xr, xi)


def _ct_inverse(xr, xi, t_ref, g_ref, n1, lc):
    """Inverse CT along sublanes: shared dense (contract q) -> conjugate
    twiddle per lane group -> inverse butterfly (sublane concat).
    In: (n1, 4*lc). Out: (4*n1, lc). ``t_ref`` holds the FORWARD
    twiddles; conjugation happens here. ``g_ref`` is the inverse dense
    set (sign +1, unnormalized)."""
    dr, di = _karatsuba_cl(g_ref, xr, xi)
    tr = t_ref[0]
    ti = t_ref[1]
    # multiply by conj(T) = tr - i ti
    cr = dr * tr + di * ti
    ci = di * tr - dr * ti
    d = [(cr[:, r * lc:(r + 1) * lc], ci[:, r * lc:(r + 1) * lc])
         for r in range(4)]
    return _butterfly_inv(d, axis=0)


# --------------------------------------------------------------------------
# phase kernels
# --------------------------------------------------------------------------

ZB = 8  # z-slices per phase-A/C grid step (Mosaic needs >= 8 on the
        # second-to-last dim of the spectrum blocks)


def _kernel_a(v_ref, cx_ref, ty_ref, fy_ref, or_ref, oi_ref, *, n1y):
    """Per step: ZB z-slices of x dense rfft (lanes) then y radix-4 CT
    (sublanes), written into the (n1y, nz, 4*kp) spectrum layout whose
    blocks phase B consumes contiguously."""
    for dz in range(ZB):
        v = v_ref[dz]
        re = _dot3_cr(v, cx_ref[0], cx_ref[2])
        im = _dot3_cr(v, cx_ref[1], cx_ref[3])
        xr, xi = _ct_forward(re, im, ty_ref, fy_ref, n1y)
        or_ref[:, dz, :] = xr
        oi_ref[:, dz, :] = xi


def _kernel_b(sr_ref, si_ref, otr_ref, oti_ref, tz_ref, fz_ref, gz_ref,
              our_ref, oui_ref, *, n1z, lc):
    """Per (q_y row, r_y chunk): z CT forward, OTF multiply, z CT inverse
    — the spectrum never leaves VMEM in z-frequency space."""
    sr = sr_ref[0]
    si = si_ref[0]
    xr, xi = _ct_forward(sr, si, tz_ref, fz_ref, n1z)
    otr = otr_ref[0, 0]
    oti = oti_ref[0, 0]
    pr = xr * otr - xi * oti
    pi = xr * oti + xi * otr
    our, oui = _ct_inverse(pr, pi, tz_ref, gz_ref, n1z, lc)
    our_ref[0] = our
    oui_ref[0] = oui


def _kernel_c(sr_ref, si_ref, ty_ref, gy_ref, ax_ref, o_ref, *, n1y, kp):
    """Per step: ZB z-slices of y CT inverse then x dense irfft
    (Hermitian weights + 1/(nz*ny*nx) folded into the matrices)."""
    for dz in range(ZB):
        xr = sr_ref[:, dz, :]
        xi = si_ref[:, dz, :]
        yr, yi = _ct_inverse(xr, xi, ty_ref, gy_ref, n1y, kp)
        out = (_dot3_cr(yr, ax_ref[0], ax_ref[2])
               + _dot3_cr(yi, ax_ref[1], ax_ref[3]))
        o_ref[dz] = out


# --------------------------------------------------------------------------
# pallas_call wrappers
# --------------------------------------------------------------------------

def _const_spec(arr):
    nd = np.ndim(arr)
    return pl.BlockSpec(arr.shape, lambda *_: (0,) * nd,
                        memory_space=pltpu.VMEM)


_VMEM_LIMIT = 100 * 1024 * 1024  # measured: v5e scoped vmem accepts >= 64 MB


@partial(jax.jit, static_argnames=("shape", "interpret"))
def _phase_a(v, *, shape, interpret=False):
    nz, ny, nx = shape
    n1y = ny // 4
    kp = _kxp(nx)
    cx = jnp.asarray(_consts_rfft_x(nx))
    fy, ty = _consts_ct(ny, False, kp)
    fy, ty = jnp.asarray(fy), jnp.asarray(ty)
    out_sh = jax.ShapeDtypeStruct((n1y, nz, 4 * kp), jnp.float32)
    spec_s = pl.BlockSpec((n1y, ZB, 4 * kp), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_kernel_a, n1y=n1y),
        grid=(nz // ZB,),
        in_specs=[
            pl.BlockSpec((ZB, ny, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            _const_spec(cx), _const_spec(ty), _const_spec(fy),
        ],
        out_specs=[spec_s, spec_s],
        out_shape=[out_sh, out_sh],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(v, cx, ty, fy)


@partial(jax.jit, static_argnames=("shape", "interpret"))
def _phase_b(sre, sim, otf_re, otf_im, *, shape, interpret=False):
    nz, ny, nx = shape
    n1y, n1z = ny // 4, nz // 4
    kp = _kxp(nx)
    fz, tz = _consts_ct(nz, False, kp)
    gz, _ = _consts_ct(nz, True, kp)
    fz, tz, gz = jnp.asarray(fz), jnp.asarray(tz), jnp.asarray(gz)
    sh = jax.ShapeDtypeStruct((n1y, nz, 4 * kp), jnp.float32)
    spec_io = pl.BlockSpec((1, nz, kp), lambda r, c: (r, 0, c),
                           memory_space=pltpu.VMEM)
    spec_otf = pl.BlockSpec((1, 1, n1z, 4 * kp), lambda r, c: (r, c, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_kernel_b, n1z=n1z, lc=kp),
        grid=(n1y, 4),
        in_specs=[spec_io, spec_io, spec_otf, spec_otf,
                  _const_spec(tz), _const_spec(fz), _const_spec(gz)],
        out_specs=[spec_io, spec_io],
        out_shape=[sh, sh],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(sre, sim, otf_re, otf_im, tz, fz, gz)


@partial(jax.jit, static_argnames=("shape", "interpret"))
def _phase_c(sre, sim, *, shape, interpret=False):
    nz, ny, nx = shape
    n1y = ny // 4
    kp = _kxp(nx)
    _, ty = _consts_ct(ny, False, kp)
    gy, _ = _consts_ct(ny, True, kp)
    ax = jnp.asarray(_consts_irfft_x(nx, float(nz) * ny * nx))
    ty, gy = jnp.asarray(ty), jnp.asarray(gy)
    spec_s = pl.BlockSpec((n1y, ZB, 4 * kp), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_kernel_c, n1y=n1y, kp=kp),
        grid=(nz // ZB,),
        in_specs=[spec_s, spec_s,
                  _const_spec(ty), _const_spec(gy), _const_spec(ax)],
        out_specs=pl.BlockSpec((ZB, ny, nx), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(sre, sim, ty, gy, ax)


def conv3_ct(v, otf_perm_re, otf_perm_im, interpret=None):
    """Circular convolution irfftn(rfftn(v) * OTF) via the fused CT
    pipeline. ``otf_perm_*`` come from :func:`permute_otf` (or its
    traced twin). Matches ops/fft_matmul.py::conv3_mm to ~1e-5 relative.
    ``interpret`` defaults to True off-TPU so CPU tests exercise the
    same kernels through the Pallas interpreter."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = tuple(v.shape)
    sre, sim = _phase_a(v, shape=shape, interpret=interpret)
    sre, sim = _phase_b(sre, sim, otf_perm_re, otf_perm_im, shape=shape,
                        interpret=interpret)
    return _phase_c(sre, sim, shape=shape, interpret=interpret)
