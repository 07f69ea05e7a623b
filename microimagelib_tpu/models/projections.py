"""Maximum-intensity projection outputs: packed 2D MPs and rotating 3D MIP
movies (``mp2dgpu``/``mp3dgpu``/``mip3dgpu``,
reference:src/apifunc.cpp:485-644).

The rotating MIP evaluates all ``project_num`` angles in ONE device call —
a jitted ``lax.map`` over the per-angle affine matrices — instead of the
reference's per-angle kernel-launch loop with a D2H copy per frame."""

from __future__ import annotations

import math
import os

from microimagelib_tpu.utils.envflags import env_on
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from microimagelib_tpu.ops.affine import affine_transform_3d
from microimagelib_tpu.ops.basics import max_projection
from microimagelib_tpu.ops.matrix import rot_to_matrix


@partial(jax.jit, static_argnames=("z_proj", "x_proj", "y_proj"))
def _mp2d_flat(img, z_proj, x_proj, y_proj):
    """Requested panels raveled into ONE device buffer — a single host
    fetch instead of one sync per panel (each round trip costs
    ~0.1-0.2 s on the tunneled TPU; the batch driver emits 2D MPs every
    timepoint)."""
    parts = []
    if z_proj:
        parts.append(max_projection(img, 1).ravel())
    if x_proj:
        parts.append(max_projection(img, 3).ravel())
    if y_proj:
        parts.append(max_projection(img, 2).ravel())
    return jnp.concatenate(parts) if parts else jnp.zeros(0, jnp.float32)


def mp2d(img, z_proj=True, x_proj=True, y_proj=True):
    """2D max projections. Returns a dict of 2D arrays keyed 'xy' (z-MIP,
    (y, x)), 'yz' (x-MIP, (z, y)), 'zx' (y-MIP, (x, z)) — the three panels
    the reference packs into one buffer (reference:src/apifunc.cpp:485-505).
    Note the reference gates the third panel on flagZProj (a copy-paste
    slip); we gate on y_proj as the interface documents."""
    img = jnp.asarray(img, jnp.float32)
    sz, sy, sx = img.shape
    flat = np.asarray(_mp2d_flat(img, z_proj, x_proj, y_proj))
    out = {}
    off = 0
    if z_proj:
        out["xy"] = flat[off:off + sy * sx].reshape(sy, sx)
        off += sy * sx
    if x_proj:
        out["yz"] = flat[off:off + sz * sy].reshape(sz, sy)
        off += sz * sy
    if y_proj:
        out["zx"] = flat[off:off + sx * sz].reshape(sx, sz)
    return out


@partial(jax.jit, static_argnames=("out_shape",))
def _rotate_and_mip_all(img, mats, out_shape):
    """For each 3x4 matrix, resample img into the rotated grid and z-MIP.
    mats: (N, 12). Returns (N, out_shape[1], out_shape[2])."""
    def one(m):
        rot = affine_transform_3d(img, m, out_shape)
        return jnp.maximum(rot.max(axis=0), 0)
    return jax.lax.map(one, mats)


@partial(jax.jit, static_argnames=("out_shape", "r_axis"))
def _rotate_and_mip_all_matmul(img, mats, out_shape, r_axis):
    """MXU path for the rotating MIP: a rotation about X or Y leaves one
    axis invariant, so each frame is a 2D bilinear resample applied
    identically to every slice along that axis — expressible as ONE dense
    matmul ``src(rows, s) @ W(s, P)`` per frame, where W carries the four
    bilinear weights per output point (built by scatter-add, so clamped
    coincident corners accumulate exactly like the gather path). Replaces
    36 full-volume 8-neighbor gathers: measured 4.74 s -> ~0.1 s for the
    batch MIP shape. Boundary semantics identical to
    ``affine_transform_3d`` (+0.5 validity box, CUDA clamp addressing,
    zero outside); the invariant axis passes through exactly (its
    interpolation weight is identically 1)."""
    sz, sy, sx = img.shape
    zo = out_shape[0]
    if r_axis == 2:  # rotation about Y: (z, x) plane resamples, y invariant
        po = out_shape[2]             # x_out
        src2 = img.transpose(1, 0, 2).reshape(sy, sz * sx)
        na, nb = sz, sx               # source plane extents (a=z, b=x)
    else:            # rotation about X: (z, y) plane resamples, x invariant
        po = out_shape[1]             # y_out
        src2 = img.transpose(2, 0, 1).reshape(sx, sz * sy)
        na, nb = sz, sy               # (a=z, b=y)
    s = na * nb
    p_total = zo * po

    zs = jnp.arange(zo, dtype=jnp.float32)[:, None]
    bs = jnp.arange(po, dtype=jnp.float32)[None, :]

    def one(m12):
        m = m12.reshape(3, 4)
        if r_axis == 2:
            cb = m[0, 0] * bs + m[0, 2] * zs + m[0, 3]   # cx over (z', x')
            ca = m[2, 0] * bs + m[2, 2] * zs + m[2, 3]   # cz
        else:
            cb = m[1, 1] * bs + m[1, 2] * zs + m[1, 3]   # cy over (z', y')
            ca = m[2, 1] * bs + m[2, 2] * zs + m[2, 3]   # cz
        valid = ((cb >= -0.5) & (ca >= -0.5)
                 & (cb < nb - 0.5) & (ca < na - 0.5))
        a0 = jnp.floor(ca)
        b0 = jnp.floor(cb)
        fa = ca - a0
        fb = cb - b0
        a0r = a0.astype(jnp.int32)
        b0r = b0.astype(jnp.int32)
        a0i = jnp.clip(a0r, 0, na - 1)
        a1i = jnp.clip(a0r + 1, 0, na - 1)
        b0i = jnp.clip(b0r, 0, nb - 1)
        b1i = jnp.clip(b0r + 1, 0, nb - 1)
        wv = jnp.where(valid, 1.0, 0.0)
        corners = (
            (a0i * nb + b0i, (1 - fa) * (1 - fb)),
            (a0i * nb + b1i, (1 - fa) * fb),
            (a1i * nb + b0i, fa * (1 - fb)),
            (a1i * nb + b1i, fa * fb),
        )
        # W built by broadcast-iota comparison instead of scatter-add:
        # the (s, p) zero-init + 4p-element scatter dominated the frame
        # time (round-2 measurement: 987 ms/36 frames at the fusion iso
        # shape); the dense one-hot accumulation is pure VPU and keeps
        # the clamped-coincident-corner summation semantics (equal corner
        # indices simply satisfy two comparisons and add, exactly like
        # the scatter's duplicate adds).
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (s, p_total), 0)
        w_mat = jnp.zeros((s, p_total), jnp.float32)
        for idx, w in corners:
            w_mat = w_mat + jnp.where(row_ids == idx.reshape(1, -1),
                                      (w * wv).reshape(1, -1), 0.0)
        out = jnp.dot(src2, w_mat, precision=jax.lax.Precision.HIGHEST)
        frame = jnp.maximum(out.reshape(-1, zo, po).max(axis=1), 0)
        if r_axis == 1:
            frame = frame.T        # (y_out, sx) like rot.max(axis=0)
        return frame
    return jax.lax.map(one, mats)


@partial(jax.jit, static_argnames=("zo", "na", "nb", "po", "chunk",
                                   "r_axis"))
def _factored_tables(mats, zo, na, nb, po, chunk, r_axis):
    """Per-frame 2-tap tables for the factored MIP — (n, zpad/chunk,
    chunk, n_axis, po) per axis. Image-independent: they depend only on
    the grid shape and the rotation matrices, so the batch driver reuses
    them across every timepoint (cache in :func:`mip3d`)."""
    zpad = -(-zo // chunk) * chunk
    zs = jnp.arange(zo, dtype=jnp.float32)[:, None]
    bs = jnp.arange(po, dtype=jnp.float32)[None, :]

    def tap_table(c, n):
        """(zo, n, po) 2-tap interpolation weights for coordinates
        c (zo, po), with the per-axis half of the validity mask."""
        valid = (c >= -0.5) & (c < n - 0.5)
        i0 = jnp.floor(c)
        f = c - i0
        i0r = i0.astype(jnp.int32)
        i0c = jnp.clip(i0r, 0, n - 1)[:, None, :]
        i1c = jnp.clip(i0r + 1, 0, n - 1)[:, None, :]
        wv = jnp.where(valid, 1.0, 0.0)
        w0 = ((1.0 - f) * wv)[:, None, :]
        w1 = (f * wv)[:, None, :]
        ids = jax.lax.broadcasted_iota(jnp.int32, (zo, n, po), 1)
        w = (jnp.where(ids == i0c, w0, 0.0)
             + jnp.where(ids == i1c, w1, 0.0))
        return jnp.pad(w, ((0, zpad - zo), (0, 0), (0, 0)))

    def one(m12):
        m = m12.reshape(3, 4)
        if r_axis == 2:
            cb = m[0, 0] * bs + m[0, 2] * zs + m[0, 3]
            ca = m[2, 0] * bs + m[2, 2] * zs + m[2, 3]
        else:
            cb = m[1, 1] * bs + m[1, 2] * zs + m[1, 3]
            ca = m[2, 1] * bs + m[2, 2] * zs + m[2, 3]
        wa = tap_table(ca, na).reshape(zpad // chunk, chunk, na, po)
        wb = tap_table(cb, nb).reshape(zpad // chunk, chunk, nb, po)
        return wa, wb

    return jax.lax.map(one, mats)


@partial(jax.jit, static_argnames=("r_axis", "prec", "fgroup"))
def _factored_contract(img, was, wbs, r_axis, prec, fgroup=1):
    """Contract the per-frame tap tables against the volume, folding the
    z'-MIP across a lax.scan over z' chunks (intermediate bounded to
    fgroup*rows*na*chunk*po).

    ``fgroup`` frames ride INSIDE each einsum: the scan's sequential op
    count drops by that factor — on the tunneled TPU each sequential
    sizeable op costs ~0.5-1.3 ms of fixed issue time (BASELINE.md
    machine model), which dominates this contraction at batch-class
    shapes — while the MXU work is unchanged."""
    if r_axis == 2:
        src3 = img.transpose(1, 0, 2)       # (r=y, a=z, b=x)
    else:
        src3 = img.transpose(2, 0, 1)       # (r=x, a=z, b=y)
    rows, po = src3.shape[0], was.shape[-1]
    n = was.shape[0]
    gpad = -(-n // fgroup) * fgroup
    if gpad != n:
        was = jnp.pad(was, ((0, gpad - n),) + ((0, 0),) * (was.ndim - 1))
        wbs = jnp.pad(wbs, ((0, gpad - n),) + ((0, 0),) * (wbs.ndim - 1))
    wag = was.reshape((gpad // fgroup, fgroup) + was.shape[1:])
    wbg = wbs.reshape((gpad // fgroup, fgroup) + wbs.shape[1:])

    def group(ws):
        wa, wb = ws                          # (fgroup, zc, chunk, n_ax, po)

        def body(carry, wc):
            wa_c, wb_c = wc                  # (fgroup, chunk, n_ax, po)
            u = jnp.einsum("rab,fcbq->fracq", src3, wb_c, precision=prec)
            out_c = jnp.einsum("fracq,fcaq->frcq", u, wa_c, precision=prec)
            return jnp.maximum(carry, out_c.max(axis=2)), None

        frame0 = jnp.full((fgroup, rows, po), -jnp.inf, jnp.float32)
        frames, _ = jax.lax.scan(body, frame0,
                                 (wa.transpose(1, 0, 2, 3, 4),
                                  wb.transpose(1, 0, 2, 3, 4)))
        frames = jnp.maximum(frames, 0)
        if r_axis == 1:
            frames = frames.transpose(0, 2, 1)
        return frames

    out = jax.lax.map(group, (wag, wbg))
    return out.reshape((gpad,) + out.shape[2:])[:n]


_FACTORED_TABLE_CACHE = {}


def mip3d_factored_plan(shape_zyx, mats, out_shape, r_axis, chunk):
    """Image-independent half of the factored MIP: the per-frame 2-tap
    tables for a fixed (volume shape, rotation stack, chunk). Built
    EAGERLY (jax.ensure_compile_time_eval) and cached, so traced callers
    get concrete device arrays they can pass as jit ARGUMENTS — the batch
    driver's fused timepoint program must not close over them (closure
    capture embeds tens of MB as MLIR literal constants, and the
    embedding host-fetch is what axon's c64 restriction breaks on for
    captured OTFs). ``mats`` must be numpy. Returns (was, wbs)."""
    sz, sy, sx = shape_zyx
    zo = out_shape[0]
    if r_axis == 2:
        po, na, nb = out_shape[2], sz, sx
    else:
        po, na, nb = out_shape[1], sz, sy
    key = (sz, sy, sx, mats.shape[0], r_axis, chunk)
    hit = _FACTORED_TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    with jax.ensure_compile_time_eval():
        was, wbs = _factored_tables(jnp.asarray(mats), zo, na, nb, po,
                                    chunk, r_axis)
    if (env_on("MIL_MIP_TABLE_CACHE", True)
            and not isinstance(was, jax.core.Tracer)):
        from microimagelib_tpu.utils.device import free_memory_mb

        free_mb = free_memory_mb()
        tbytes = (was.size + wbs.size) * 4
        if free_mb < 0 or tbytes <= free_mb * 1048576 * 0.25:
            while len(_FACTORED_TABLE_CACHE) >= 2:
                _FACTORED_TABLE_CACHE.pop(next(iter(_FACTORED_TABLE_CACHE)))
            _FACTORED_TABLE_CACHE[key] = (was, wbs)
    return was, wbs


def _rotate_and_mip_all_factored(img, mats, out_shape, r_axis, chunk, prec,
                                 fgroup=1):
    """Factored Wa(.)Wb form of the matmul MIP for fusion-class shapes,
    where the dense one-hot W would be O(s*p) to build (round-2
    measurement: 987 ms/36 frames at the fusion iso shape, scatter/
    zero-init bound). The joint bilinear weight of output point
    (z', b') factorizes per axis — w[(a,b),(z',b')] = wa[a,(z',b')] *
    wb[b,(z',b')] — and product-of-clamped-tap-sums equals the joint
    scatter's sum-of-products, while the per-axis validity masks multiply
    to the joint +-0.5 validity box, so the result is EXACT vs the
    gather/big-W paths. The two tap tables are (zo, na, po) and
    (zo, nb, po) — ~100x smaller than W.

    The tables are image-independent, so they are cached on device per
    (shape, axis, frame count) and reused across timepoints — the batch
    driver calls this every timepoint with the same geometry
    (MIL_MIP_TABLE_CACHE=0 disables; at most 2 entries, and only when
    the tables fit in a quarter of free HBM)."""
    was, wbs = mip3d_factored_plan(img.shape, mats, out_shape, r_axis,
                                   chunk)
    return _factored_contract(img, was, wbs, r_axis, prec, fgroup)


def mip3d_params(shape_zyx, r_axis, project_num=36, impl=None):
    """Host-side route + parameter selection for the rotating MIP at a
    fixed volume shape: returns a dict with 'impl', 'mats' (numpy),
    'out_shape', and — for the factored route — 'chunk'/'prec'/'fgroup'.
    Shared by :func:`mip3d_frames` and the batch driver's fused
    per-timepoint program (which pre-builds the factored tables from
    these params and passes them as jit arguments)."""
    sz, sy, sx = shape_zyx
    if r_axis == 1:
        sr = sx
        im_rot = int(round(math.hypot(sy, sz)))
        out_shape = (im_rot, im_rot, sr)  # (z, y, x) of the rotated grid
    elif r_axis == 2:
        sr = sy
        im_rot = int(round(math.hypot(sx, sz)))
        out_shape = (im_rot, sr, im_rot)
    else:
        raise ValueError("r_axis must be 1 (X) or 2 (Y)")
    step = math.pi * 2 / project_num  # reference uses 3.14159*2/projectNum
    step = 3.14159 * 2 / project_num
    mats = np.stack([
        rot_to_matrix(step * i, sx, sy, sz, r_axis) for i in range(project_num)
    ]).astype(np.float32)

    # MXU one-hot-matmul path: valid when the rotation axis passes
    # through exactly (rot_to_matrix always satisfies this) and the
    # per-frame weight matrix fits the transient-memory cap
    if r_axis == 2:
        # y passes through AND no y cross-terms feed x/z (the matmul path
        # drops m[0,1]/m[2,1], so they must be zero for it to be exact)
        passthrough = (np.allclose(mats[:, 4:8], [0.0, 1.0, 0.0, 0.0])
                       and np.allclose(mats[:, 1], 0.0)
                       and np.allclose(mats[:, 9], 0.0))
        s, p = sz * sx, out_shape[0] * out_shape[2]
    else:
        passthrough = (np.allclose(mats[:, 0:4], [1.0, 0.0, 0.0, 0.0])
                       and np.allclose(mats[:, 4], 0.0)
                       and np.allclose(mats[:, 8], 0.0))
        s, p = sz * sy, out_shape[0] * out_shape[1]
    env_cap = os.environ.get("MIL_MIP_MATMUL_MAX_BYTES")
    if env_cap is not None:
        cap = int(env_cap)
    else:
        # Budget against PROBED free HBM: besides W itself, the scatter
        # build holds the 4-corner index/weight temporaries (~3x W's
        # column count in flat arrays) and the volume + per-frame output
        # are resident, so near-cap shapes with a fixed byte cap could
        # OOM where the gather path succeeds. Require W + temporaries
        # (~2x W) to fit in 60% of free memory, defaulting to the old
        # 3 GiB cap when the backend exposes no memory stats (CPU).
        from microimagelib_tpu.utils.device import free_memory_mb

        free_mb = free_memory_mb()
        cap = (3 << 30) if free_mb < 0 else int(free_mb * 1048576 * 0.6 / 2)
    if impl is None:
        impl = os.environ.get("MIL_MIP_IMPL", "auto")
    if impl == "auto":
        # speed crossover (measured on v5e): big-W wins at batch-class
        # shapes (W ~0.3 GB, 0.18 s/36 frames); the factored form wins at
        # fusion-class shapes (W ~2.2 GB: 390 vs 457 ms) and is the only
        # matmul option once W exceeds the memory cap
        crossover = int(os.environ.get("MIL_MIP_FACTORED_MIN_W_BYTES",
                                       str(1 << 29)))
        if not passthrough:
            impl = "gather"
        elif s * p * 4 <= min(cap, crossover):
            impl = "matmul"
        else:
            impl = "factored"
    params = {"out_shape": out_shape, "mats": mats}
    if impl == "factored" and passthrough:
        params["impl"] = "factored"
        # chunk sized so the rows*na*chunk*po intermediate stays under
        # ~1/4 of the big-W cap (same budget the matmul path respects)
        po = out_shape[2] if r_axis == 2 else out_shape[1]
        rows = sy if r_axis == 2 else sx
        na = sz
        per_z = rows * na * po * 4
        budget = int(max(cap, 1 << 28) // 4 // max(per_z, 1))
        # sequential-op count scales with 1/(fgroup*chunk) (the per-op
        # issue floor dominates at batch-class shapes); frames batch
        # first, leftover budget widens the z' chunk
        params["fgroup"] = max(1, min(int(mats.shape[0]), budget,
                                      int(os.environ.get("MIL_MIP_FGROUP",
                                                         "36"))))
        params["chunk"] = max(1, min(32, budget // params["fgroup"]))
        # bf16x3 ('high') matmuls: ~3e-6 relative error on the 2-4-term
        # bilinear sums — far below the reference's 8-bit-fraction CUDA
        # texture weights — for ~2x the MXU rate at these class sizes
        params["prec"] = {"high": jax.lax.Precision.HIGH,
                          "highest": jax.lax.Precision.HIGHEST}[
                              os.environ.get("MIL_MIP_PRECISION", "high")]
    elif impl == "matmul" and passthrough:
        params["impl"] = "matmul"
    else:
        params["impl"] = "gather"
    return params


def mip3d_frames(img, r_axis, project_num=36, impl=None):
    """Device-resident :func:`mip3d`: returns the (project_num, H, W)
    frame stack as a jax array with no host fetch, so callers (the batch
    driver's fused per-timepoint program) can chain further device work
    or fetch asynchronously. ``impl`` overrides the MIL_MIP_IMPL route
    (None = env/auto). Traceable under jit for fixed shapes: the route
    selection and factored-table build run at trace time on the host."""
    img = jnp.asarray(img, jnp.float32)
    p = mip3d_params(img.shape, r_axis, project_num, impl)
    mats, out_shape = p["mats"], p["out_shape"]
    if p["impl"] == "factored":
        # mats stays numpy: under an ambient trace jnp.asarray would wrap
        # it in a tracer and defeat the eager table build/cache
        return _rotate_and_mip_all_factored(
            img, mats, out_shape, r_axis, p["chunk"], p["prec"],
            p["fgroup"])
    if p["impl"] == "matmul":
        return _rotate_and_mip_all_matmul(img, jnp.asarray(mats),
                                          out_shape, r_axis)
    return _rotate_and_mip_all(img, jnp.asarray(mats), out_shape)


def mip3d(img, r_axis, project_num=36):
    """Rotating 3D MIP movie about the X (r_axis=1) or Y (r_axis=2) axis
    (``mip3dgpu``, reference:src/apifunc.cpp:576-644).

    img: (z, y, x). Returns a (project_num, H, W) numpy stack:
      r_axis=1 -> H = round(hypot(sy, sz)), W = sx
      r_axis=2 -> H = sr=sy rows? matches reference layout (imRotation, sy)
    """
    return np.asarray(mip3d_frames(img, r_axis, project_num))


def mp3d(img, x_axis=True, y_axis=True, project_num=36):
    """Both-axis rotating MIPs (``mp3dgpu``,
    reference:src/apifunc.cpp:507-574). Returns dict with 'x' and/or 'y'."""
    out = {}
    if x_axis:
        out["x"] = mip3d(img, 1, project_num)
    if y_axis:
        out["y"] = mip3d(img, 2, project_num)
    return out


def mp2d_packed(img, z_proj=True, x_proj=True, y_proj=True):
    """Packed single-buffer variant matching the reference API exactly:
    one flat array of [XY panel | YZ panel | ZX panel] plus the 6-element
    size vector (sx, sy, sy, sz, sz, sx) (``mp2dgpu``,
    reference:src/apifunc.cpp:485-505). Panels not requested stay zero,
    as the reference leaves them unwritten in its zeroed buffer."""
    img = jnp.asarray(img, jnp.float32)
    sz, sy, sx = img.shape
    buf = np.zeros(sx * sy + sy * sz + sz * sx, dtype=np.float32)
    mps = mp2d(img, z_proj, x_proj, y_proj)
    if z_proj:
        buf[: sx * sy] = np.asarray(mps["xy"]).ravel()
    if x_proj:
        buf[sx * sy : sx * sy + sy * sz] = np.asarray(mps["yz"]).ravel()
    if y_proj:
        buf[sx * sy + sy * sz :] = np.asarray(mps["zx"]).ravel()
    size_mp = np.array([sx, sy, sy, sz, sz, sx], dtype=np.uint32)
    return buf, size_mp
