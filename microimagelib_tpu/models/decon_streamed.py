"""Beyond-HBM Richardson-Lucy deconvolution: host-staged, slab-streamed.

The reference's ``gpuMemMode 2`` processes volumes larger than device
memory by ping-ponging stacks/OTFs/spectra through host RAM between
whole-volume cuFFT calls (``decon_singleview_OTF2``
reference:src/api_subfunc.cu:3468-3516, dual ``decon_dualview_OTF2``
:3697-3791) — the full volume still has to fit on the GPU for each FFT.

The TPU-native tier here goes further: the 3D FFT convolution itself is
decomposed so the DEVICE only ever holds one chunk at a time:

  pass 1  stream z-slabs      : 2D rFFT over (y, x)        -> host spectrum
  pass 2  stream y-chunks     : FFT over z, multiply OTF,
                                inverse FFT over z          -> host spectrum
  pass 3  stream z-slabs      : 2D irFFT fused with the RL
                                elementwise stage (ratio or
                                estimate update + clamp)    -> host volume

FFTs along different axes commute, so pass1+2+3 compose to exactly
``irfftn(rfftn(x) * OTF)`` with jnp.fft's backward normalization — the
same transform the HBM-resident loop uses, to float32 rounding.

Host-resident working set: img (per view), est, ratio, one complex
spectrum buffer, plus the OTFs — all numpy. Device working set: one
(z_chunk, Y, Xh) or (Z, y_chunk, Xh) complex buffer plus its real twin,
bounded by the probed HBM budget. The public entries in
``models/deconvolution.py`` select this tier automatically when the
mode-1 working set exceeds the budget (``mem_mode`` -1/0/1/2 mirrors
reference:src/api_decon.cpp:111-135).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

SMALLVALUE = 0.01


# --------------------------------------------------------------------------
# numpy twins of the prep ops (host-side, no device memory)
# --------------------------------------------------------------------------

def np_pad_stack_edge(img, out_shape):
    """Host twin of ops.basics.pad_stack_edge (replicate-edge, centered)."""
    iz, iy, ix = img.shape
    oz, oy, ox = out_shape
    lo = ((oz - iz) // 2, (oy - iy) // 2, (ox - ix) // 2)
    hi = (oz - iz - lo[0], oy - iy - lo[1], ox - ix - lo[2])
    return np.pad(img, tuple(zip(lo, hi)), mode="edge")


def np_align_size_3d(img, out_shape):
    """Host twin of ops.basics.align_size_3d (centered zero-pad/crop) —
    the single copy of the centering span math for host-resident tiers."""
    img = np.asarray(img, np.float32)
    out = np.zeros(out_shape, np.float32)
    spans_o, spans_i = [], []
    for i_sz, o_sz in zip(img.shape, out_shape):
        so = (o_sz - i_sz) // 2
        o_lo = max(so, 0)
        i_lo = o_lo - so
        n = min(i_sz - i_lo, o_sz - o_lo)
        spans_o.append(slice(o_lo, o_lo + n))
        spans_i.append(slice(i_lo, i_lo + n))
    out[tuple(spans_o)] = img[tuple(spans_i)]
    return out


def np_crop_center(img, out_shape):
    """Host twin of ops.basics.crop_center."""
    iz, iy, ix = img.shape
    oz, oy, ox = out_shape
    so = ((iz - oz) // 2, (iy - oy) // 2, (ix - ox) // 2)
    return img[so[0]: so[0] + oz, so[1]: so[1] + oy, so[2]: so[2] + ox]


def np_gen_otf(psf, fft_shape, normalize=True):
    """Host twin of models.deconvolution.gen_otf: sum-normalize, centered
    re-size when the PSF exceeds the grid, circular split to the origin,
    forward rfftn (``genOTFcpu``, reference:src/api_subfunc.cu:1650-1676).
    Returns complex64."""
    psf = np.asarray(psf, np.float32)
    if normalize:
        psf = psf / psf.sum()
    if any(p > f for p, f in zip(psf.shape, fft_shape)):
        psf = np_align_size_3d(psf, fft_shape)
    pz, py, px = psf.shape
    tmp = np.zeros(fft_shape, np.float32)
    tmp[:pz, :py, :px] = psf
    tmp = np.roll(tmp, shift=(-(pz // 2), -(py // 2), -(px // 2)),
                  axis=(0, 1, 2))
    return np.fft.rfftn(tmp).astype(np.complex64)


def _pad_axis(arr, axis, size, fill=0.0):
    """Pad ``arr`` along ``axis`` up to ``size`` rows (no-op when already
    full) — keeps every streamed pass on ONE compiled chunk shape."""
    n = arr.shape[axis]
    if n == size:
        return arr
    shape = list(arr.shape)
    shape[axis] = size
    out = np.full(shape, fill, arr.dtype)
    sl = [slice(None)] * arr.ndim
    sl[axis] = slice(0, n)
    out[tuple(sl)] = arr
    return out


def _split_planes(spec):
    """Host complex64 -> contiguous f32 (re, im) planes (c64 never
    crosses the host/device boundary on the axon TPU)."""
    spec = np.asarray(spec)
    return (np.ascontiguousarray(spec.real, np.float32),
            np.ascontiguousarray(spec.imag, np.float32))


# --------------------------------------------------------------------------
# jitted per-chunk device programs (static chunk shapes -> reused programs)
#
# All host<->device traffic is float32 real/imag PLANE PAIRS, never
# complex64: the axon TPU backend raises UNIMPLEMENTED on any c64
# transfer in either direction (measured; see BASELINE.md round-2
# notes). Complex values exist only inside the compiled programs.
# --------------------------------------------------------------------------

@jax.jit
def _fft2_slab(slab):
    """(cz, Y, X) f32 -> ((cz, Y, X//2+1) f32 re, ... im): rFFT2 over (y, x)."""
    s = jnp.fft.rfft2(slab)
    return (jnp.real(s).astype(jnp.float32),
            jnp.imag(s).astype(jnp.float32))


@jax.jit
def _fftz_mul_ifftz(sr, si, otf_r, otf_i):
    """(Z, cy, Xh) re/im planes: FFT along z, multiply OTF, inverse FFT
    along z. Returns re/im planes."""
    s = jnp.fft.fft(jax.lax.complex(sr, si), axis=0)
    s = s * jax.lax.complex(otf_r, otf_i)
    s = jnp.fft.ifft(s, axis=0)
    return (jnp.real(s).astype(jnp.float32),
            jnp.imag(s).astype(jnp.float32))


@partial(jax.jit, static_argnames=("x_out",))
def _irfft2_ratio_slab(sr, si, img_slab, x_out):
    """irFFT2 fused with the RL ratio: img / fwd."""
    fwd = jnp.fft.irfft2(jax.lax.complex(sr, si),
                         s=(img_slab.shape[1], x_out))
    return (img_slab / fwd).astype(jnp.float32)


@partial(jax.jit, static_argnames=("x_out",))
def _irfft2_update_slab(sr, si, est_slab, x_out):
    """irFFT2 fused with the RL estimate update + SMALLVALUE clamp."""
    upd = jnp.fft.irfft2(jax.lax.complex(sr, si),
                         s=(est_slab.shape[1], x_out))
    return jnp.maximum(est_slab * upd, SMALLVALUE).astype(jnp.float32)


def _chunk_counts(fft_shape, budget_bytes):
    """Pick power-of-two chunk counts along z (pass 1/3) and y (pass 2) so
    each per-chunk device program stays within ~1/4 of the budget. The
    counts need not divide the axes: the streamed loops use ceil-sized
    chunks with a (padded) tail, so any extent is covered."""
    fz, fy, fx = fft_shape
    xh = fx // 2 + 1
    if budget_bytes is None or budget_bytes <= 0:
        return 1, 1
    per_call = budget_bytes / 4

    def pick(n_axis, bytes_full):
        n = 1
        while n < n_axis and bytes_full / n > per_call:
            n *= 2
        return min(n, n_axis)

    # pass 1/3: real slab (cz, fy, fx)*4 + complex slab (cz, fy, xh)*8
    z_bytes = fz * fy * (fx * 4 + xh * 8)
    # pass 2: ~3 complex (fz, cy, xh) buffers (in, otf, out)
    y_bytes = fz * fy * xh * 8 * 3
    return pick(fz, z_bytes), pick(fy, y_bytes)


def _conv_streamed(vol, spec_r, spec_i, otf_r, otf_i, out, elementwise,
                   other, nz, ny, x_out):
    """One streamed FFT convolution: out = elementwise(irfftn(rfftn(vol)*otf), other).

    vol, other, out: host f32 (Z, Y, X); spec_r/spec_i: host f32 (Z, Y, Xh)
    scratch planes; otf_r/otf_i: host f32 OTF planes. ``elementwise`` is
    'ratio' (other=img) or 'update' (other=est, in which case out may
    alias other).

    Chunks are ceil-sized, and the TAIL chunk is zero-PADDED back to the
    full chunk shape, so every row is covered for ANY axis extent (FFT
    grids are 64-multiples, not necessarily powers of two; a floor-sized
    chunk loop would silently skip the tail) while every pass keeps ONE
    compiled program — a second tail-shaped program would pay another
    minutes-scale axon device program load. Zero rows transform to zero
    spectra in the row-wise 2D passes and zero columns through the z
    pass, so padding never contaminates real rows."""
    fz = vol.shape[0]
    fy = vol.shape[1]
    cz = -(-fz // nz)
    cy = -(-fy // ny)
    for lo in range(0, fz, cz):
        n = min(cz, fz - lo)
        sl = slice(lo, lo + n)
        r, m = _fft2_slab(_pad_axis(vol[sl], 0, cz))
        spec_r[sl] = np.asarray(r)[:n]
        spec_i[sl] = np.asarray(m)[:n]
    for lo in range(0, fy, cy):
        n = min(cy, fy - lo)
        sl = slice(lo, lo + n)
        r, m = _fftz_mul_ifftz(_pad_axis(spec_r[:, sl], 1, cy),
                               _pad_axis(spec_i[:, sl], 1, cy),
                               _pad_axis(otf_r[:, sl], 1, cy),
                               _pad_axis(otf_i[:, sl], 1, cy))
        spec_r[:, sl] = np.asarray(r)[:, :n]
        spec_i[:, sl] = np.asarray(m)[:, :n]
    fn = _irfft2_ratio_slab if elementwise == "ratio" else _irfft2_update_slab
    for lo in range(0, fz, cz):
        n = min(cz, fz - lo)
        sl = slice(lo, lo + n)
        # padded rows produce inf (ratio: 1/irfft2(0)=1/0) or 0
        # (update) — harmless ONLY because [:n] slices them away before
        # use; 'other' pads with ones so no 0/0 NaN ever appears in
        # debugging dumps
        res = fn(_pad_axis(spec_r[sl], 0, cz), _pad_axis(spec_i[sl], 0, cz),
                 _pad_axis(other[sl], 0, cz, fill=1.0), x_out)
        out[sl] = np.asarray(res)[:n]


def rl_decon_single_streamed(img, otf, otf_bp, n_iters, const_initial=False,
                             budget_bytes=None):
    """Single-view RL on a pre-padded FFT-grid image, streamed through host
    RAM so the device never holds a full volume. Matches
    ``rl_decon_single`` to float32 rounding."""
    img = np.ascontiguousarray(np.maximum(np.asarray(img, np.float32),
                                          SMALLVALUE))
    fft_shape = img.shape
    xh = fft_shape[2] // 2 + 1
    nz, ny = _chunk_counts(fft_shape, budget_bytes)
    est = (np.full(fft_shape, img.sum(dtype=np.float64), np.float32)
           if const_initial else img.copy())
    ratio = np.empty(fft_shape, np.float32)
    spec_r = np.empty((fft_shape[0], fft_shape[1], xh), np.float32)
    spec_i = np.empty((fft_shape[0], fft_shape[1], xh), np.float32)
    otf_r, otf_i = _split_planes(otf)
    bp_r, bp_i = _split_planes(otf_bp)
    for _ in range(n_iters):
        _conv_streamed(est, spec_r, spec_i, otf_r, otf_i, ratio, "ratio",
                       img, nz, ny, fft_shape[2])
        _conv_streamed(ratio, spec_r, spec_i, bp_r, bp_i, est, "update",
                       est, nz, ny, fft_shape[2])
    return est


def rl_decon_dual_streamed(img_a, img_b, otf_a, otf_b, otf_bp_a, otf_bp_b,
                           n_iters, const_initial=False, budget_bytes=None):
    """Joint dual-view RL, streamed (view A then view B per iteration,
    matching ``rl_decon_dual`` / reference:src/api_subfunc.cu:3634-3660)."""
    img_a = np.ascontiguousarray(np.maximum(np.asarray(img_a, np.float32),
                                            SMALLVALUE))
    img_b = np.ascontiguousarray(np.maximum(np.asarray(img_b, np.float32),
                                            SMALLVALUE))
    fft_shape = img_a.shape
    xh = fft_shape[2] // 2 + 1
    nz, ny = _chunk_counts(fft_shape, budget_bytes)
    if const_initial:
        mean = (img_a.sum(dtype=np.float64) + img_b.sum(dtype=np.float64)) / 2
        est = np.full(fft_shape, mean, np.float32)
    else:
        est = ((img_a + img_b) * 0.5).astype(np.float32)
    ratio = np.empty(fft_shape, np.float32)
    spec_r = np.empty((fft_shape[0], fft_shape[1], xh), np.float32)
    spec_i = np.empty((fft_shape[0], fft_shape[1], xh), np.float32)
    planes = [(_split_planes(o), _split_planes(obp))
              for o, obp in ((otf_a, otf_bp_a), (otf_b, otf_bp_b))]
    for _ in range(n_iters):
        for img, ((o_r, o_i), (bp_r, bp_i)) in ((img_a, planes[0]),
                                                (img_b, planes[1])):
            _conv_streamed(est, spec_r, spec_i, o_r, o_i, ratio, "ratio",
                           img, nz, ny, fft_shape[2])
            _conv_streamed(ratio, spec_r, spec_i, bp_r, bp_i, est,
                           "update", est, nz, ny, fft_shape[2])
    return est
