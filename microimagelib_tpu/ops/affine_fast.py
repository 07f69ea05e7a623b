"""MXU-path fused resample + NCC: exact trilinear sampling expressed as
one-hot matmuls instead of per-voxel gathers.

Motivation: XLA's TPU gather costs ~10 ns/tap — the 8-tap trilinear NCC
evaluation at 128³ measures ~171 ms, which makes Powell registration two
orders slower than the reference's CUDA texture units. But registration
matrices are near-identity (checkmatrix bounds scales to [0.5, 1.4] and
angles stay small in the DOF ladder), so each output row's (z, y) source
footprint spans only a few voxels. This kernel:

  1. for each output row (fixed z, y; x = 0..sx-1) slices a (K, K, sx)
     source box around the row's footprint (one dynamic_slice per row —
     large contiguous chunks, not per-voxel gathers),
  2. builds the exact bilinear (z, y) weights as a one-hot (K^2, sx)
     matrix and the x-direction lerp weights as a one-hot (sx, sx)
     matrix (broadcasted-iota comparisons — pure VPU),
  3. contracts them with the box on the MXU:
        Q = box.reshape(K^2, sx) @ Wx          (K^2 x sx matmul)
        s_row = sum(Wzy * Q, axis=0)           (VPU reduce)

The result is numerically identical to the gather path (same clamped
texel footprint, same strict-lower-bound zero mask). Rows whose
footprint exceeds K fall back to the gather implementation via lax.cond
on an all-rows-fit predicate, so arbitrary matrices stay correct.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from microimagelib_tpu.ops.affine import corr3d_partials as _corr_gather

DEFAULT_K = 16
ROW_CHUNK = 256


def _corr_rows_mxu(src, tgt, m, K):
    """Returns (s volume, all_fit bool). m: (3,4)."""
    sz, sy, sx = src.shape
    kz_n = min(K, sz)  # boxes cannot exceed the volume extents
    ky_n = min(K, sy)
    xs = jnp.arange(sx, dtype=jnp.float32)

    z_ids = jnp.arange(sz, dtype=jnp.float32)
    y_ids = jnp.arange(sy, dtype=jnp.float32)
    # per-row constants (R = sz*sy rows)
    zz, yy = jnp.meshgrid(z_ids, y_ids, indexing="ij")
    zz = zz.reshape(-1)
    yy = yy.reshape(-1)

    kz = jnp.arange(kz_n, dtype=jnp.int32)
    ky = jnp.arange(ky_n, dtype=jnp.int32)
    ix = jnp.arange(sx, dtype=jnp.int32)

    def one_row(z, y):
        cx = m[0, 0] * xs + (m[0, 1] * y + m[0, 2] * z + m[0, 3])
        cy = m[1, 0] * xs + (m[1, 1] * y + m[1, 2] * z + m[1, 3])
        cz = m[2, 0] * xs + (m[2, 1] * y + m[2, 2] * z + m[2, 3])
        valid = (cx > -0.5) & (cy > -0.5) & (cz > -0.5) & \
                (cx < sx - 0.5) & (cy < sy - 0.5) & (cz < sz - 0.5)
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

        # only rows that contribute matter for the footprint check
        z_lo = jnp.min(jnp.where(valid, z0i, sz))
        z_hi = jnp.max(jnp.where(valid, z1i, 0))
        y_lo = jnp.min(jnp.where(valid, y0i, sy))
        y_hi = jnp.max(jnp.where(valid, y1i, 0))
        oz = jnp.clip(z_lo, 0, sz - kz_n)
        oy = jnp.clip(y_lo, 0, sy - ky_n)
        fits = (z_hi - oz < kz_n) & (y_hi - oy < ky_n)

        box = lax.dynamic_slice(src, (oz, oy, 0), (kz_n, ky_n, sx))

        z0l = z0i - oz
        z1l = z1i - oz
        y0l = y0i - oy
        y1l = y1i - oy
        # (K, sx) one-hot z / y weights — exact lerp coefficients
        wz = (1.0 - fz) * (kz[:, None] == z0l[None, :]) + fz * (kz[:, None] == z1l[None, :])
        wy = (1.0 - fy) * (ky[:, None] == y0l[None, :]) + fy * (ky[:, None] == y1l[None, :])
        wzy = (wz[:, None, :] * wy[None, :, :]).reshape(kz_n * ky_n, sx)
        # (sx_src, sx_out) one-hot x-lerp weights
        wx = (1.0 - fx)[None, :] * (ix[:, None] == x0i[None, :]) + \
            fx[None, :] * (ix[:, None] == x1i[None, :])
        q = jnp.dot(box.reshape(kz_n * ky_n, sx), wx, preferred_element_type=jnp.float32)
        s_row = jnp.sum(wzy * q, axis=0)
        return jnp.where(valid, s_row, 0.0), fits

    n_rows = sz * sy
    chunk = min(ROW_CHUNK, n_rows)
    n_chunks = -(-n_rows // chunk)
    pad = n_chunks * chunk - n_rows
    zz_p = jnp.pad(zz, (0, pad))
    yy_p = jnp.pad(yy, (0, pad))

    def chunk_fn(args):
        zc, yc = args
        return jax.vmap(one_row)(zc, yc)

    s_chunks, fit_chunks = lax.map(
        chunk_fn, (zz_p.reshape(n_chunks, chunk), yy_p.reshape(n_chunks, chunk)))
    s = s_chunks.reshape(-1, sx)[:n_rows].reshape(sz, sy, sx)
    all_fit = jnp.all(fit_chunks.reshape(-1)[:n_rows])
    return s, all_fit


@partial(jax.jit, static_argnames=("box_k",))
def corr3d_partials_mxu(src, tgt, tmx, box_k=DEFAULT_K):
    """Drop-in replacement for ops.affine.corr3d_partials: (sum s^2,
    sum s*t) of the affine-resampled source against the target, using the
    MXU formulation when every row's footprint fits in the box and the
    gather path otherwise."""
    tmx = jnp.asarray(tmx, jnp.float32)
    m = tmx.reshape(3, 4)
    s, all_fit = _corr_rows_mxu(src, tgt, m, box_k)

    def fast(_):
        from microimagelib_tpu.ops.affine import sum_blocked

        return sum_blocked(s * s), sum_blocked(s * tgt)

    def slow(_):
        return _corr_gather(src, tgt, tmx)

    return lax.cond(all_fit, fast, slow, None)


def resolve_ncc_impl(arr=None):
    """Resolve MIL_NCC_IMPL's 'auto' against the committed device of
    ``arr`` (falling back to the default backend). Must run EAGERLY —
    tracers carry no device.

    Auto picks the Pallas kernel only inside its hardware-proven
    envelope: TPU backend AND x-extent <= 128 (one 128-lane tile).
    Wider volumes crash the round-5 TPU compile helper (Mosaic refuses
    the dynamic sublane window at x=512; the cascade then dies in an
    XLA CHECK `limits[i] <= dim(i)` — beyond-HBM lowmem ladder,
    BASELINE.md round 5) and were never measured on hardware; the
    one-hot MXU formulation (plain XLA) is the proven route there.
    MIL_NCC_IMPL=pallas still forces the kernel at any shape."""
    import os

    import jax

    from microimagelib_tpu.utils.device import committed_platform

    impl = os.environ.get("MIL_NCC_IMPL", "auto")
    if impl != "auto":
        return impl
    if committed_platform(arr) != "tpu":
        return "mxu"
    sx = (arr.shape[-1] if arr is not None and getattr(arr, "ndim", 0)
          else 0)
    return "pallas" if sx <= 128 else "mxu"


def corr3d_auto(src, tgt, tmx, impl=None):
    """NCC partials through the configured implementation
    (MIL_NCC_IMPL = pallas | mxu | gather | auto, default auto):

      gather — 8 XLA gathers/voxel (exact reference formulation; ~202 ms
               per 128^3 evaluation on TPU v5e)
      mxu    — one-hot-matmul formulation in XLA (~83 ms)
      pallas — hand-scheduled kernel, block DMA + tight per-row windows
               (~63 ms); TPU only
      auto   — pallas on TPU backends, mxu elsewhere

    All are numerically equivalent (f32 summation order, ~1e-5). Auto
    keys off the COMMITTED device of ``src`` when it has one — a
    CPU-pinned volume (registration mem_mode 0) on a TPU host must not
    pick the Mosaic kernel, which cannot lower for CPU. Inside a jit
    trace ``src`` carries no device; callers there must resolve eagerly
    with :func:`resolve_ncc_impl` and pass ``impl`` explicitly."""
    if impl is None:
        impl = resolve_ncc_impl(src)
    if impl == "gather":
        return _corr_gather(src, tgt, tmx)
    if impl == "pallas":
        from microimagelib_tpu.ops.pallas_corr import corr3d_partials_pallas

        return corr3d_partials_pallas(src, tgt, tmx)
    return corr3d_partials_mxu(src, tgt, tmx)
