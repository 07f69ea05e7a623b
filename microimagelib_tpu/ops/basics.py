"""Core volume ops: padding, cropping, flips, shifts, projections, FFT-size
policy. All functions take/return ``(z, y, x)`` C-order arrays and are
jit-compatible with static shapes.

Because the reference stores stacks as ``d[x + y*sx + z*sx*sy]`` — the same
memory layout as a C-order (z, y, x) array — its kernel index arithmetic
maps 1:1 onto whole-array jnp transforms here; no storage-order juggling
(reference ``changestorageordergpu``) is needed anywhere in this framework.
Shift arguments keep the reference's (dx, dy, dz) = (x, y, z) order.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def snap_transform_size(n: int) -> int:
    """The reference's FFT-size policy (reference:src/api_subfunc.cu:57-87):
    align up to 16; if the result is a power of two return it; else return
    the next power of two when <= 128, otherwise align up to 64."""
    n = int(n)
    n = -(-n // 16) * 16
    hi_bit = n.bit_length() - 1
    low_pot = 1 << hi_bit
    if low_pot == n:
        return n
    hi_pot = 1 << (hi_bit + 1)
    if hi_pot <= 128:
        return hi_pot
    return -(-n // 64) * 64


def snap_fft_size(n: int, tpu_friendly: bool = True) -> int:
    """FFT-size policy for this framework. Defaults to the reference policy;
    with ``tpu_friendly`` we additionally snap to the next power of two when
    it is within 25% — XLA's TPU FFT strongly prefers power-of-two factors
    and the RL loop amortizes any extra padding over many iterations."""
    base = snap_transform_size(n)
    if not tpu_friendly:
        return base
    pot = 1 << (base - 1).bit_length()
    if pot != base and pot <= base * 1.25:
        return pot
    return base


def flip3(a):
    """Flip along all three axes (matched back-projector PSF flip,
    reference:include/cukernel.cuh:667-677)."""
    return a[::-1, ::-1, ::-1]


def circshift(a, dx, dy, dz):
    """Circular shift: out[z,y,x] = in[(z-dz)%sz, (y-dy)%sy, (x-dx)%sx]
    (reference:include/cukernel.cuh:456-475)."""
    return jnp.roll(a, shift=(dz, dy, dx), axis=(0, 1, 2))


def imshift(a, dx, dy, dz):
    """Zero-filling shift (reference:include/cukernel.cuh:477-489)."""
    sz, sy, sx = a.shape
    out = jnp.roll(a, shift=(dz, dy, dx), axis=(0, 1, 2))
    zi = jnp.arange(sz)[:, None, None]
    yi = jnp.arange(sy)[None, :, None]
    xi = jnp.arange(sx)[None, None, :]
    valid = (
        (zi - dz >= 0) & (zi - dz < sz)
        & ((yi - dy >= 0) & (yi - dy < sy))
        & ((xi - dx >= 0) & (xi - dx < sx))
    )
    return jnp.where(valid, out, 0.0)


def pad_psf_to_origin(psf, fft_shape):
    """Circularly split the PSF around its center voxel so the center lands
    at index (0,0,0) of the FFT grid, zero elsewhere — the reference's
    ``padPSFgpu`` with origin = size//2 (reference:include/cukernel.cuh:
    679-697, launcher offsets reference:src/api_subfunc.cu:1691-1699).

    ``fft_shape`` is (z, y, x) and must be >= psf shape per axis."""
    pz, py, px = psf.shape
    fz, fy, fx = fft_shape
    tmp = jnp.zeros(fft_shape, dtype=psf.dtype)
    tmp = tmp.at[:pz, :py, :px].set(psf)
    # out[(i - o) mod f] = psf[i]  <=>  roll placed-at-zero psf by -o
    return jnp.roll(tmp, shift=(-(pz // 2), -(py // 2), -(px // 2)), axis=(0, 1, 2))


def pad_stack_edge(img, out_shape):
    """Pad to ``out_shape`` (z, y, x) with replicate-edge values, image
    centered with offsets (out-in)//2 per axis — ``padstackgpu``
    (reference:include/cukernel.cuh:699-737, offsets
    reference:src/api_subfunc.cu:1713-1721). Requires out >= in per axis."""
    iz, iy, ix = img.shape
    oz, oy, ox = out_shape
    lo = ((oz - iz) // 2, (oy - iy) // 2, (ox - ix) // 2)
    hi = (oz - iz - lo[0], oy - iy - lo[1], ox - ix - lo[2])
    return jnp.pad(img, tuple(zip(lo, hi)), mode="edge")


def crop_center(img, out_shape):
    """Centered crop with offsets (in-out)//2 — ``cropgpu``
    (reference:src/api_subfunc.cu:1736-1744)."""
    iz, iy, ix = img.shape
    oz, oy, ox = out_shape
    so = ((iz - oz) // 2, (iy - oy) // 2, (ix - ox) // 2)
    return img[so[0] : so[0] + oz, so[1] : so[1] + oy, so[2] : so[2] + ox]


def crop_at(img, out_shape, offset_xyz):
    """Crop at explicit (x, y, z) offsets — ``cropgpu2``
    (reference:src/api_subfunc.cu:1759-1766)."""
    oz, oy, ox = out_shape
    sox, soy, soz = offset_xyz
    return img[soz : soz + oz, soy : soy + oy, sox : sox + ox]


def align_size_3d(img, out_shape):
    """Centered re-size with zero padding (or centered crop when an output
    axis is smaller) — ``alignsize3Dgpu`` (reference:include/cukernel.cuh:
    754-770, offsets reference:src/api_subfunc.cu:1779-1787).

    out[d] = in[d - (out-in)//2] where in range, else 0."""
    iz, iy, ix = img.shape
    oz, oy, ox = out_shape
    out = jnp.zeros(out_shape, dtype=img.dtype)
    # per-axis copy spans
    spans_out = []
    spans_in = []
    for i_sz, o_sz in ((iz, oz), (iy, oy), (ix, ox)):
        so = (o_sz - i_sz) // 2
        o_lo = max(so, 0)
        i_lo = o_lo - so
        n = min(i_sz - i_lo, o_sz - o_lo)
        spans_out.append((o_lo, o_lo + n))
        spans_in.append((i_lo, i_lo + n))
    (zo, zo2), (yo, yo2), (xo, xo2) = spans_out
    (zi, zi2), (yi, yi2), (xi, xi2) = spans_in
    return out.at[zo:zo2, yo:yo2, xo:xo2].set(img[zi:zi2, yi:yi2, xi:xi2])


def max_projection(a, direction: int):
    """Maximum intensity projection (reference:include/cukernel.cuh:394-418).

    direction 1: along z -> (y, x) image;
    direction 2: along y -> (x, z) image (height = x extent, width = z);
    direction 3: along x -> (z, y) image.

    Note the reference accumulates against an initial 0, so projections of
    all-negative volumes floor at 0; we reproduce that."""
    if direction == 1:
        out = a.max(axis=0)
    elif direction == 2:
        out = a.max(axis=1).T
    elif direction == 3:
        out = a.max(axis=2)
    else:
        raise ValueError(f"Invalid projection direction {direction}")
    return jnp.maximum(out, 0)


def rot_by_y_axis(a, direction: int):
    """±90-degree rotation about the Y axis by index permutation
    (reference:include/cukernel.cuh:437-453). Output shape (x, y, z) in
    (z, y, x) terms — size x and z swap (reference:src/apifunc.cpp:467).

    direction  1: out[z', y, x'] = in[x', y, sx-1-z']
    direction -1: out[z', y, x'] = in[sz-1-x', y, z']
    """
    t = jnp.transpose(a, (2, 1, 0))
    if direction == 1:
        return t[::-1, :, :]
    if direction == -1:
        return t[:, :, ::-1]
    raise ValueError(f"Invalid rotation direction {direction}")


def change_storage_order(a, order_mode: int):
    """Transpose between TIFF order and x-major C order
    (reference:include/cukernel.cuh:422-435). With this framework's single
    canonical layout it is a plain axis transpose, kept for API parity."""
    if order_mode in (1, -1):
        return jnp.transpose(a, (2, 1, 0))
    raise ValueError(f"Invalid order mode {order_mode}")


def max3d_with_coords(a):
    """Max value and its (x, y, z) coordinates — ``max3Dgpu``
    (reference:src/api_subfunc.cu:436-470). First-occurrence index in
    C-order scan, matching the reference's row-major host scan."""
    a = jnp.asarray(a)
    flat_idx = jnp.argmax(a)
    sz, sy, sx = a.shape
    z, rem = jnp.divmod(flat_idx, sy * sx)
    y, x = jnp.divmod(rem, sx)
    return a.reshape(-1)[flat_idx], (x, y, z)


def np_snap_sizes(shape_zyx, tpu_friendly=True):
    """Convenience: snap each axis of a (z, y, x) shape for FFT."""
    return tuple(snap_fft_size(int(s), tpu_friendly) for s in shape_zyx)


def sum_dbl(a):
    """Sum in float64 like the reference's double-accumulator reductions
    (reference:include/cukernel.cuh:349-360). On TPU f64 is emulated and
    slow; we accumulate in f32 pairwise via jnp.sum which is adequate for
    the <1e-3 fidelity budget, but expose this helper so hosts (numpy) can
    use true doubles."""
    return np.sum(np.asarray(a, dtype=np.float64))
