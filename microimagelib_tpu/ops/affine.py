"""Affine transform + trilinear interpolation, and the fused
resample-and-correlate op that powers registration.

The reference implements these with CUDA 3D textures: output voxel
(x, y, z) maps through a 3x4 matrix, then ``tex3D(tx+0.5, ...)`` performs
trilinear filtering (reference:include/cukernel.cuh:500-556). CUDA's
linear filter at coordinate c+0.5 interpolates texels floor(c) and
floor(c)+1 with fraction frac(c), clamping the footprint at the borders
(wrap addressing is ignored for unnormalized coordinates). TPU has no
texture units; we reproduce those semantics exactly with XLA gathers on a
flattened volume — 8 neighbor fetches + lerp, fully fused under jit.

Boundary masks (reference asymmetry, preserved deliberately):
  * transform kernel: coordinate valid iff c >= -0.5 and c < size-0.5
    (``tx >= 0`` after the +0.5 shift, reference:include/cukernel.cuh:515)
  * correlate kernel: strict  c > -0.5    (``tx > 0``,
    reference:include/cukernel.cuh:545)
Outside the mask the sample is 0.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def sum_blocked(x):
    """Two-stage f32 reduction for NCC partials: XLA fuses a flat
    ``jnp.sum`` into a SEQUENTIAL f32 accumulation whose rounding error
    grows as n*eps (measured ~1e-3 relative at just 16k elements); the
    blocked form bounds it at ~2*sqrt(n)*eps. The reference accumulates
    these partials in double (reference:include/cukernel.cuh:349-360,
    :526-556)."""
    flat = x.reshape(-1)
    n = flat.shape[0]
    if n <= 4096:
        return jnp.sum(flat)
    b = 1
    while b * b < n:
        b *= 2
    pad = -n % b
    if pad:
        flat = jnp.pad(flat, (0, pad))
    partials = jnp.sum(flat.reshape(-1, b), axis=1)
    # the barrier stops XLA's algebraic simplifier from re-fusing the two
    # stages back into one sequential reduce (verified: without it, the
    # gather-path NCC at 16k elements still lost ~8e-4)
    partials = jax.lax.optimization_barrier(partials)
    return jnp.sum(partials)


def _trilerp_window(src_win, cx, cy, cz, strict_lo, win_start, sz_global):
    """Trilinear sample at float coords (cx, cy, cz) in GLOBAL index
    space, zero outside the validity box. ``src_win`` holds global z rows
    [win_start, win_start + wz) of a (sz_global, sy, sx) volume — the
    full-volume case is simply win_start=0, wz=sz_global. This is the
    single source of truth for the CUDA-texture sampling contract (+0.5
    validity box, per-texel clamp addressing) shared by the full,
    windowed, and streamed affine/corr paths."""
    wz, sy, sx = src_win.shape
    flat = src_win.reshape(-1)

    if strict_lo:
        valid = (cx > -0.5) & (cy > -0.5) & (cz > -0.5)
    else:
        valid = (cx >= -0.5) & (cy >= -0.5) & (cz >= -0.5)
    valid &= (cx < sx - 0.5) & (cy < sy - 0.5) & (cz < sz_global - 0.5)

    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    z0 = jnp.floor(cz)
    fx = cx - x0
    fy = cy - y0
    fz = cz - z0

    # clamp each footprint texel independently (CUDA clamp addressing):
    # at c in [-1, 0) both neighbors resolve to texel 0. Global clamp
    # first, then window-local — the second clip only ever moves indices
    # of masked-out samples.
    x0r = x0.astype(jnp.int32)
    y0r = y0.astype(jnp.int32)
    z0r = z0.astype(jnp.int32)
    x0i = jnp.clip(x0r, 0, sx - 1)
    x1i = jnp.clip(x0r + 1, 0, sx - 1)
    y0i = jnp.clip(y0r, 0, sy - 1)
    y1i = jnp.clip(y0r + 1, 0, sy - 1)
    z0i = jnp.clip(jnp.clip(z0r, 0, sz_global - 1) - win_start, 0, wz - 1)
    z1i = jnp.clip(jnp.clip(z0r + 1, 0, sz_global - 1) - win_start, 0, wz - 1)

    # mode="clip" skips XLA's out-of-bounds fill checks — indices are
    # already clipped above, and the default 'fill' mode measured 3.7x
    # slower on TPU (665 vs 179 ms per 128^3 evaluation)
    syx = sy * sx
    b00 = z0i * syx + y0i * sx
    b01 = z0i * syx + y1i * sx
    b10 = z1i * syx + y0i * sx
    b11 = z1i * syx + y1i * sx

    v000 = jnp.take(flat, b00 + x0i, mode="clip")
    v001 = jnp.take(flat, b00 + x1i, mode="clip")
    v010 = jnp.take(flat, b01 + x0i, mode="clip")
    v011 = jnp.take(flat, b01 + x1i, mode="clip")
    v100 = jnp.take(flat, b10 + x0i, mode="clip")
    v101 = jnp.take(flat, b10 + x1i, mode="clip")
    v110 = jnp.take(flat, b11 + x0i, mode="clip")
    v111 = jnp.take(flat, b11 + x1i, mode="clip")

    c00 = v000 + (v001 - v000) * fx
    c01 = v010 + (v011 - v010) * fx
    c10 = v100 + (v101 - v100) * fx
    c11 = v110 + (v111 - v110) * fx
    c0 = c00 + (c01 - c00) * fy
    c1 = c10 + (c11 - c10) * fy
    val = c0 + (c1 - c0) * fz
    return jnp.where(valid, val, 0.0)


def _trilerp_flat(src, cx, cy, cz, strict_lo):
    """Full-volume trilinear sample (see :func:`_trilerp_window`)."""
    return _trilerp_window(src, cx, cy, cz, strict_lo,
                           jnp.int32(0), src.shape[0])


def _out_coords(out_shape, tmx):
    """Source-space coordinates for every output voxel of an affine map."""
    oz, oy, ox = out_shape
    xs = jnp.arange(ox, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(oy, dtype=jnp.float32)[None, :, None]
    zs = jnp.arange(oz, dtype=jnp.float32)[:, None, None]
    m = tmx.reshape(3, 4)
    cx = m[0, 0] * xs + m[0, 1] * ys + m[0, 2] * zs + m[0, 3]
    cy = m[1, 0] * xs + m[1, 1] * ys + m[1, 2] * zs + m[1, 3]
    cz = m[2, 0] * xs + m[2, 1] * ys + m[2, 2] * zs + m[2, 3]
    return cx, cy, cz


@partial(jax.jit, static_argnames=("out_shape",))
def affine_transform_3d(src, tmx, out_shape):
    """Resample ``src`` (z,y,x) through a 3x4 matrix into ``out_shape``
    (z,y,x). Equivalent of ``affinetransformkernel`` + texture fetch
    (reference:include/cukernel.cuh:500-524)."""
    tmx = jnp.asarray(tmx, dtype=jnp.float32)
    cx, cy, cz = _out_coords(out_shape, tmx)
    return _trilerp_flat(src, cx, cy, cz, strict_lo=False)


@partial(jax.jit, static_argnames=())
def corr3d_partials(src, target, tmx):
    """Fused resample + NCC partial sums: returns (sum s^2, sum s*t) where
    s is the affine-resampled ``src`` over ``target``'s grid (zero outside,
    strict lower bound), t the target. One device call per Powell cost
    evaluation — the ``corrkernel`` equivalent
    (reference:include/cukernel.cuh:526-556)."""
    tmx = jnp.asarray(tmx, dtype=jnp.float32)
    cx, cy, cz = _out_coords(target.shape, tmx)
    s = _trilerp_flat(src, cx, cy, cz, strict_lo=True)
    ss = sum_blocked(s * s)
    st = sum_blocked(s * target)
    return ss, st


def corr3d_partials_window(src_win, target_block, tmx, z0_out, win_start,
                           sz_global, n_valid=None):
    """NCC partials for a z-BLOCK of output rows sampling a z-WINDOW of the
    source — the building block of sharded registration (each device holds
    its target shard plus a bounded source window instead of the full
    volume; the reference's memory-saving analog is ``reg3d_affine2``,
    reference:src/api_subfunc.cu:2995-3266).

    src_win: (wz, sy, sx) source rows [win_start, win_start+wz) of a
    global (sz_global, sy, sx) volume; target_block: (bz, sy, sx) target
    rows starting at global z ``z0_out``. Validity masks and clamping use
    the GLOBAL extent, so summing the results over blocks covering the
    full target reproduces ``corr3d_partials`` exactly — provided the
    window covers the footprint of every valid sample (out-of-window
    fetches only ever happen for masked-out samples).

    z0_out/win_start may be traced (one compiled program per shape).
    ``n_valid`` (traced, optional) masks out the padded tail rows of a
    zero-padded block — they would otherwise contribute spurious s^2
    from real source samples against a zero target."""
    _wz, sy, sx = src_win.shape
    bz = target_block.shape[0]
    tmx = jnp.asarray(tmx, dtype=jnp.float32)
    xs = jnp.arange(sx, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(sy, dtype=jnp.float32)[None, :, None]
    zs = (jnp.asarray(z0_out, jnp.float32)
          + jnp.arange(bz, dtype=jnp.float32))[:, None, None]
    m = tmx.reshape(3, 4)
    cx = m[0, 0] * xs + m[0, 1] * ys + m[0, 2] * zs + m[0, 3]
    cy = m[1, 0] * xs + m[1, 1] * ys + m[1, 2] * zs + m[1, 3]
    cz = m[2, 0] * xs + m[2, 1] * ys + m[2, 2] * zs + m[2, 3]
    s = _trilerp_window(src_win, cx, cy, cz, True, win_start, sz_global)
    if n_valid is not None:
        row_ok = jnp.arange(bz)[:, None, None] < n_valid
        s = jnp.where(row_ok, s, 0.0)
    return sum_blocked(s * s), sum_blocked(s * target_block)


@partial(jax.jit, static_argnames=("block_shape",))
def affine_transform_3d_window(src_win, tmx, block_shape, z0_out, win_start,
                               sz_global):
    """Resample a z-BLOCK of output rows from a z-WINDOW of the source —
    the streaming building block for beyond-HBM affine transforms (the
    reference's memory-saving tier keeps one volume + one texture array
    resident, reference:src/api_subfunc.cu:2995-3266; here the source can
    stay in HOST memory and only the window visits the device).

    Same +0.5 texel / clamp / zero-outside semantics as
    ``affine_transform_3d`` with the validity box and clamping evaluated
    against the GLOBAL z extent; concatenating blocks over the full
    output grid reproduces the unstreamed result exactly, provided each
    window covers its block's valid-sample footprint."""
    bz, oy_n, ox_n = block_shape
    tmx = jnp.asarray(tmx, dtype=jnp.float32)
    xs = jnp.arange(ox_n, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(oy_n, dtype=jnp.float32)[None, :, None]
    zs = (jnp.asarray(z0_out, jnp.float32)
          + jnp.arange(bz, dtype=jnp.float32))[:, None, None]
    m = tmx.reshape(3, 4)
    cx = m[0, 0] * xs + m[0, 1] * ys + m[0, 2] * zs + m[0, 3]
    cy = m[1, 0] * xs + m[1, 1] * ys + m[1, 2] * zs + m[1, 3]
    cz = m[2, 0] * xs + m[2, 1] * ys + m[2, 2] * zs + m[2, 3]
    return _trilerp_window(src_win, cx, cy, cz, False, win_start, sz_global)


def _zspan_for_rows(m, zlo, zhi, oy_n, ox_n, sz):
    """Source z-window [lo, hi) that output rows [zlo, zhi] can sample —
    corners of the affine map (extrema of an affine function are at
    corners). Single source of truth shared by the streamed drivers and
    the sharded-halo bound."""
    import numpy as np

    czs = [m[2, 0] * x + m[2, 1] * y + m[2, 2] * z + m[2, 3]
           for x in (0.0, ox_n - 1.0) for y in (0.0, oy_n - 1.0)
           for z in (float(zlo), float(zhi))]
    lo = int(np.clip(np.floor(min(czs)), 0, sz - 1))
    hi = int(np.clip(np.floor(max(czs)) + 2, 1, sz))
    return lo, hi


def _stream_blocks(tmx, sz, oz, oy_n, ox_n, sy, sx, budget_bytes, n_blocks,
                   overlap_tail):
    """Shared plan for the streamed (beyond-HBM) z-block drivers: pick a
    ceil-sized block extent within the device budget (ANY output extent —
    a divisibility requirement would collapse odd extents to one full-
    volume block), then bound each block's source z-window from the
    affine corners. Returns (bz, blocks, width) with a FIXED window
    width (16-multiple) and fixed block extent ``bz`` so ONE compiled
    program serves every block; ``blocks`` is a list of
    (z0, n_valid_rows, win_lo, win_hi). With ``overlap_tail`` a short tail is
    instead re-anchored at oz - bz (recomputing overlapping rows —
    deterministic for pure transforms); without it the tail block keeps
    n_valid < bz for callers that SUM over blocks and must mask."""
    import numpy as np

    if n_blocks is None:
        if budget_bytes:
            per = budget_bytes / 4
            n_blocks = 1
            while n_blocks < oz and (sz / n_blocks + oz / n_blocks) * sy * sx * 4 > per:
                n_blocks *= 2
        else:
            n_blocks = 1
    n_blocks = max(1, min(n_blocks, oz))
    bz = -(-oz // n_blocks)
    m = np.asarray(tmx, np.float64).reshape(3, 4)
    blocks = []
    for z0 in range(0, oz, bz):
        n = min(bz, oz - z0)
        if n < bz and overlap_tail:
            z0, n = oz - bz, bz
        lo, hi = _zspan_for_rows(m, z0, z0 + n - 1, oy_n, ox_n, sz)
        blocks.append((z0, n, lo, hi))
    width = max(hi - lo for _z0, _n, lo, hi in blocks)
    width = min(-(-width // 16) * 16, sz)
    return bz, blocks, width


def affine_transform_3d_streamed(src_host, tmx, out_shape, budget_bytes=None,
                                 n_blocks=None):
    """Beyond-HBM affine transform: the source stays in host memory; each
    output z-block uploads only the bounded source z-window its rows can
    sample (computed on the host from the affine corners). One compiled
    program serves all blocks (fixed window width, traced offsets)."""
    import numpy as np

    src_host = np.asarray(src_host, np.float32)
    sz, sy, sx = src_host.shape
    oz, oy_n, ox_n = out_shape
    bz, blocks, width = _stream_blocks(tmx, sz, oz, oy_n, ox_n, sy, sx,
                                       budget_bytes, n_blocks,
                                       overlap_tail=True)
    out = np.empty(out_shape, np.float32)
    for z0, n, lo, _hi in blocks:
        start = min(lo, sz - width)
        win = jnp.asarray(src_host[start:start + width])
        blk = affine_transform_3d_window(
            win, jnp.asarray(tmx, jnp.float32), (bz, oy_n, ox_n),
            jnp.int32(z0), jnp.int32(start), sz)
        out[z0:z0 + n] = np.asarray(blk)[:n]
    return out


_corr3d_window_jit = None


def corr3d_partials_streamed(src_host, tgt_host, tmx, budget_bytes=None,
                             n_blocks=None):
    """NCC partials (sum(s^2), sum(s*t)) with BOTH volumes host-resident:
    each target z-block visits the device together with only the bounded
    source z-window its rows can sample (corners of the affine map give
    the bound), and the per-block partials accumulate on the host in
    float64. This is the beyond-HBM registration cost — the reference's
    memory-saving ``reg3d_affine2`` still required the full volume on the
    GPU (reference:src/api_subfunc.cu:2995-3266); here the device working
    set is one window + one block.

    src_host/tgt_host: (z, y, x) float32 numpy, already mean-subtracted
    like ``corr3d_partials`` inputs. One compiled program (fixed window
    and block extents, traced offsets) serves every block."""
    import numpy as np

    global _corr3d_window_jit
    if _corr3d_window_jit is None:
        _corr3d_window_jit = jax.jit(corr3d_partials_window,
                                     static_argnames=("sz_global",))

    src_host = np.asarray(src_host, np.float32)
    tgt_host = np.asarray(tgt_host, np.float32)
    sz, sy, sx = src_host.shape
    oz = tgt_host.shape[0]
    bz, blocks, width = _stream_blocks(tmx, sz, oz, sy, sx, sy, sx,
                                       budget_bytes, n_blocks,
                                       overlap_tail=False)
    tmx32 = np.asarray(tmx, np.float32)
    ss = st = 0.0
    for z0, n, lo, _hi in blocks:
        start = min(lo, sz - width)
        win = jnp.asarray(src_host[start:start + width])
        blk = tgt_host[z0:z0 + n]
        if n < bz:  # zero-pad the tail block; n_valid masks its rows
            pad = np.zeros((bz, sy, sx), np.float32)
            pad[:n] = blk
            blk = pad
        ss_b, st_b = _corr3d_window_jit(win, jnp.asarray(blk), tmx32,
                                        jnp.int32(z0), jnp.int32(start),
                                        sz_global=sz,
                                        n_valid=jnp.int32(n))
        ss += float(ss_b)
        st += float(st_b)
    return ss, st


def zslab_footprint_hops(tmx, shape_zyx, n_shards):
    """Host-side bound for the sharded-registration halo: the number of
    neighbor z-shards each device must receive so its source window covers
    the footprint of every valid sample of its own target rows. Evaluates
    the affine z-coordinate at the 8 corners of each shard's output block
    (the map is affine, so extrema are at corners). Returns n_shards - 1
    (i.e. full gather) if the matrix reaches that far."""
    import numpy as np

    m = np.asarray(tmx, np.float64).reshape(3, 4)
    sz, sy, sx = shape_zyx
    dz = sz // n_shards
    hops = 0
    for i in range(n_shards):
        zlo, zhi = i * dz, (i + 1) * dz - 1
        lo, hi_ex = _zspan_for_rows(m, zlo, zhi, sy, sx, sz)
        hi = hi_ex - 1
        need_lo_hops = -(-(i * dz - lo) // dz) if lo < i * dz else 0
        need_hi_hops = -(-(hi - ((i + 1) * dz - 1)) // dz) if hi >= (i + 1) * dz else 0
        hops = max(hops, need_lo_hops, need_hi_hops)
    return min(hops, n_shards - 1)


@partial(jax.jit, static_argnames=())
def corr3d_partials_batch(src, target, tmx_batch):
    """Vectorized NCC partials over a batch of candidate matrices — powers
    the multi-probe line search (a TPU-native upgrade the serial reference
    cannot do). ``tmx_batch``: (N, 12). Returns (N,), (N,)."""
    def one(m):
        return corr3d_partials(src, target, m)
    return jax.vmap(one)(tmx_batch)


def _bilerp_flat(src, cx, cy, strict_lo):
    sy, sx = src.shape
    flat = src.reshape(-1)
    if strict_lo:
        valid = (cx > -0.5) & (cy > -0.5)
    else:
        valid = (cx >= -0.5) & (cy >= -0.5)
    valid &= (cx < sx - 0.5) & (cy < sy - 0.5)
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = cx - x0
    fy = cy - y0
    x0r = x0.astype(jnp.int32)
    y0r = y0.astype(jnp.int32)
    x0i = jnp.clip(x0r, 0, sx - 1)
    x1i = jnp.clip(x0r + 1, 0, sx - 1)
    y0i = jnp.clip(y0r, 0, sy - 1)
    y1i = jnp.clip(y0r + 1, 0, sy - 1)
    v00 = jnp.take(flat, y0i * sx + x0i, mode="clip")
    v01 = jnp.take(flat, y0i * sx + x1i, mode="clip")
    v10 = jnp.take(flat, y1i * sx + x0i, mode="clip")
    v11 = jnp.take(flat, y1i * sx + x1i, mode="clip")
    c0 = v00 + (v01 - v00) * fx
    c1 = v10 + (v11 - v10) * fx
    val = c0 + (c1 - c0) * fy
    return jnp.where(valid, val, 0.0)


def _out_coords_2d(out_shape, tmx6):
    oy, ox = out_shape
    xs = jnp.arange(ox, dtype=jnp.float32)[None, :]
    ys = jnp.arange(oy, dtype=jnp.float32)[:, None]
    m = tmx6.reshape(2, 3)
    cx = m[0, 0] * xs + m[0, 1] * ys + m[0, 2]
    cy = m[1, 0] * xs + m[1, 1] * ys + m[1, 2]
    return cx, cy


@partial(jax.jit, static_argnames=("out_shape",))
def affine_transform_2d(src, tmx6, out_shape):
    """2D affine resample, 6-parameter matrix. Both the 2D transform and
    correlate kernels use the strict lower bound (``tx > 0``,
    reference:include/cukernel.cuh:558-573)."""
    tmx6 = jnp.asarray(tmx6, dtype=jnp.float32)
    cx, cy = _out_coords_2d(out_shape, tmx6)
    return _bilerp_flat(src, cx, cy, strict_lo=True)


@partial(jax.jit, static_argnames=())
def corr2d_partials(src, target, tmx6):
    """2D fused resample + NCC partials (``corr2Dkernel``,
    reference:include/cukernel.cuh:575-596). Note: the 2D kernel samples
    the *texture* as t over the target grid and multiplies by the static
    image; the roles match the 3D version in practice because the static
    image is the mean-subtracted target."""
    tmx6 = jnp.asarray(tmx6, dtype=jnp.float32)
    cx, cy = _out_coords_2d(target.shape, tmx6)
    s = _bilerp_flat(src, cx, cy, strict_lo=True)
    return sum_blocked(s * s), sum_blocked(s * target)


@partial(jax.jit, static_argnames=())
def corr2d_partials_batch(src, target, tmx_batch):
    """Batched 2D NCC partials: evaluates N candidate 6-param matrices in
    one device call. Used to turn the reference's serial (2*totalStep)^2
    MIP shift-grid search (reference:src/api_subfunc.cu:1951-1971) into a
    single vmapped sweep."""
    def one(m):
        return corr2d_partials(src, target, m)
    return jax.vmap(one)(tmx_batch)
