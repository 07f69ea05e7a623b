import numpy as np
import jax.numpy as jnp
import scipy.ndimage as ndi

from microimagelib_tpu.ops.affine import (
    affine_transform_2d,
    affine_transform_3d,
    corr2d_partials,
    corr3d_partials,
    corr3d_partials_batch,
)
from microimagelib_tpu.ops.matrix import (
    compose_affine,
    dof_to_matrix,
    identity_tmx,
    matrix_to_params,
    params_to_matrix,
    rot_to_matrix,
)


def scipy_affine(src, tmx, out_shape):
    """Oracle: scipy affine_transform with matched conventions.

    Our matrix maps output (x,y,z) -> source (x,y,z); scipy's maps output
    index (z,y,x) -> input index (z,y,x), so flip both orders."""
    m = np.asarray(tmx, dtype=np.float64).reshape(3, 4)
    mat_xyz = m[:, :3]
    off_xyz = m[:, 3]
    mat_zyx = mat_xyz[::-1, ::-1]
    off_zyx = off_xyz[::-1]
    return ndi.affine_transform(
        np.asarray(src, dtype=np.float64), mat_zyx, offset=off_zyx,
        output_shape=out_shape, order=1, mode="constant", cval=0.0, prefilter=False,
    )


def test_identity_transform(rng):
    src = rng.random(size=(6, 7, 8)).astype(np.float32)
    out = np.asarray(affine_transform_3d(jnp.asarray(src), identity_tmx(), (6, 7, 8)))
    np.testing.assert_allclose(out, src, atol=1e-6)


def test_pure_translation_integer(rng):
    src = rng.random(size=(8, 8, 8)).astype(np.float32)
    m = identity_tmx()
    m[3], m[7], m[11] = 2, 1, 3  # source coords = out + (2,1,3): shift content by -2,-1,-3
    out = np.asarray(affine_transform_3d(jnp.asarray(src), m, (8, 8, 8)))
    expect = np.zeros_like(src)
    expect[: 8 - 3, : 8 - 1, : 8 - 2] = src[3:, 1:, 2:]
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_matches_scipy_general_affine(rng):
    src = rng.random(size=(12, 13, 14)).astype(np.float32)
    m = dof_to_matrix([0.7, -1.2, 0.4, 5.0, -3.0, 8.0, 1.05, 0.97, 1.02], 9)
    out = np.asarray(affine_transform_3d(jnp.asarray(src), m, (12, 13, 14)))
    ref = scipy_affine(src, m, (12, 13, 14))
    # Compare only where every interpolation neighbor is strictly in-bounds:
    # beyond that, CUDA-texture clamping (ours) and scipy's constant-pad
    # interpolation legitimately differ.
    mm = np.asarray(m, dtype=np.float64).reshape(3, 4)
    zz, yy, xx = np.meshgrid(np.arange(12), np.arange(13), np.arange(14), indexing="ij")
    cx = mm[0, 0] * xx + mm[0, 1] * yy + mm[0, 2] * zz + mm[0, 3]
    cy = mm[1, 0] * xx + mm[1, 1] * yy + mm[1, 2] * zz + mm[1, 3]
    cz = mm[2, 0] * xx + mm[2, 1] * yy + mm[2, 2] * zz + mm[2, 3]
    interior = (
        (cx >= 0) & (cx <= 14 - 1) & (cy >= 0) & (cy <= 13 - 1) & (cz >= 0) & (cz <= 12 - 1)
    )
    assert interior.sum() > 200
    np.testing.assert_allclose(out[interior], ref[interior], atol=1e-4)


def test_zero_outside_bounds(rng):
    src = rng.random(size=(4, 4, 4)).astype(np.float32) + 1.0
    m = identity_tmx()
    m[3] = 10.0  # far outside
    out = np.asarray(affine_transform_3d(jnp.asarray(src), m, (4, 4, 4)))
    assert np.all(out == 0)


def test_corr_partials_identity(rng):
    src = rng.normal(size=(8, 9, 10)).astype(np.float32)
    tgt = rng.normal(size=(8, 9, 10)).astype(np.float32)
    ss, st = corr3d_partials(jnp.asarray(src), jnp.asarray(tgt), identity_tmx())
    # strict lower bound zeroes the first half-texel band? No: coords are
    # integers >= 0, and 0 > -0.5 so all voxels valid under strict -0.5 test.
    np.testing.assert_allclose(float(ss), float((src.astype(np.float64) ** 2).sum()), rtol=1e-5)
    np.testing.assert_allclose(float(st), float((src.astype(np.float64) * tgt).sum()), rtol=1e-4)


def test_corr_batch_matches_single(rng):
    src = rng.normal(size=(6, 6, 6)).astype(np.float32)
    tgt = rng.normal(size=(6, 6, 6)).astype(np.float32)
    mats = np.stack([identity_tmx(), dof_to_matrix([0.5, 0, 0, 0, 0, 0, 1, 1, 1], 9)])
    ss_b, st_b = corr3d_partials_batch(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mats))
    for i in range(2):
        ss, st = corr3d_partials(jnp.asarray(src), jnp.asarray(tgt), mats[i])
        np.testing.assert_allclose(float(ss_b[i]), float(ss), rtol=1e-6)
        np.testing.assert_allclose(float(st_b[i]), float(st), rtol=1e-6)


def test_affine_2d_identity(rng):
    src = rng.random(size=(7, 9)).astype(np.float32)
    m = np.array([1, 0, 0, 0, 1, 0], dtype=np.float32)
    out = np.asarray(affine_transform_2d(jnp.asarray(src), m, (7, 9)))
    # strict lower bound: all integer coords >= 0 are valid (0 > -0.5)
    np.testing.assert_allclose(out, src, atol=1e-6)


def test_corr2d_partials(rng):
    src = rng.normal(size=(7, 9)).astype(np.float32)
    tgt = rng.normal(size=(7, 9)).astype(np.float32)
    m = np.array([1, 0, 0, 0, 1, 0], dtype=np.float32)
    ss, st = corr2d_partials(jnp.asarray(src), jnp.asarray(tgt), m)
    np.testing.assert_allclose(float(ss), float((src.astype(np.float64) ** 2).sum()), rtol=1e-5)
    np.testing.assert_allclose(float(st), float((src.astype(np.float64) * tgt).sum()), rtol=1e-4)


def test_matrix_params_roundtrip():
    m = dof_to_matrix([1.5, -2, 0.5, 10, 5, -3, 1.1, 0.9, 1.0], 9)
    p = matrix_to_params(m)
    m2 = params_to_matrix(p)
    np.testing.assert_allclose(m, m2, atol=1e-7)


def test_compose_affine_vs_numpy(rng):
    a = rng.normal(size=12).astype(np.float32)
    b = rng.normal(size=12).astype(np.float32)
    out = compose_affine(a, b).reshape(3, 4)
    a4 = np.vstack([a.reshape(3, 4), [0, 0, 0, 1]])
    b4 = np.vstack([b.reshape(3, 4), [0, 0, 0, 1]])
    np.testing.assert_allclose(out, (a4 @ b4)[:3], rtol=1e-5, atol=1e-5)


def test_dof_composition_order():
    # pure rotation about Z by 57.3 deg -> alpha = 1 rad
    m = dof_to_matrix([0, 0, 0, 57.3, 0, 0], 6).reshape(3, 4)
    c, s = np.cos(1.0), np.sin(1.0)
    expect = np.array([[c, s, 0, 0], [-s, c, 0, 0], [0, 0, 1, 0]])
    np.testing.assert_allclose(m, expect, atol=1e-6)


def test_rot_to_matrix_axis1_center_maps():
    # With theta=0 the matrix maps rotated-grid center offsets back to source center
    m = rot_to_matrix(0.0, 10, 12, 14, 1).reshape(3, 4)
    s_new = int(round(np.hypot(12, 14)))
    # output coord (x, sNew//2, sNew//2) -> source (x, 12//2, 14//2)
    v = m @ np.array([3, s_new // 2, s_new // 2, 1.0])
    np.testing.assert_allclose(v, [3, 6, 7], atol=1e-5)


def test_affine_transform_streamed_matches_full():
    from microimagelib_tpu.ops.affine import (
        affine_transform_3d,
        affine_transform_3d_streamed,
    )
    from microimagelib_tpu.ops.matrix import dof_to_matrix, identity_tmx
    import numpy as np
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    src = rng.random((16, 24, 32)).astype(np.float32)
    mats = [identity_tmx(),
            dof_to_matrix([1.5, -2.0, 3.5, 4.0, -3.0, 2.0, 1.05, 0.95, 1.1], 9)]
    for m in mats:
        for out_shape in [(16, 24, 32), (24, 24, 32)]:
            ref = np.asarray(affine_transform_3d(jnp.asarray(src), m, out_shape))
            # tiny budget forces multiple blocks + narrow windows
            got = affine_transform_3d_streamed(src, m, out_shape,
                                               budget_bytes=64 * 1024)
            np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_atrans3dgpu_mem_mode2_matches():
    from microimagelib_tpu.models.registration import atrans3dgpu
    from microimagelib_tpu.ops.matrix import identity_tmx
    import numpy as np

    rng = np.random.default_rng(10)
    src = rng.random((12, 16, 16)).astype(np.float32)
    m = identity_tmx(); m[3], m[11] = 1.5, -2.2
    ref = atrans3dgpu(src, m, (12, 16, 16), mem_mode=1)
    got = atrans3dgpu(src, m, (12, 16, 16), mem_mode=2)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_sum_blocked_accuracy_at_scale():
    # VERDICT weak #8: f32 reductions at NCC scale. XLA fuses a flat sum
    # into sequential f32 accumulation (error ~ n*eps); the blocked
    # reduction must stay within ~1e-5 of the f64 oracle at 2M elements.
    import jax
    import jax.numpy as jnp
    import numpy as np
    from microimagelib_tpu.ops.affine import sum_blocked

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(2 ** 21).astype(np.float32))
    ref = float(np.sum(np.asarray(x, np.float64)))
    got = float(jax.jit(sum_blocked)(x))
    assert abs(got - ref) / ref < 1e-5


def test_corr3d_partials_accuracy_128():
    # the jitted NCC partials must match an f64 oracle to <1e-4 at 128^3
    # (2M samples) — the scale where sequential f32 accumulation lost
    # ~1e-3 before the blocked reduction
    import jax.numpy as jnp
    import numpy as np
    from microimagelib_tpu.ops.affine import (
        _out_coords,
        _trilerp_flat,
        corr3d_partials,
    )
    from microimagelib_tpu.ops.matrix import identity_tmx

    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.random((128, 128, 128)).astype(np.float32))
    tgt = jnp.asarray(rng.random((128, 128, 128)).astype(np.float32))
    m = identity_tmx()
    m[3], m[7], m[11] = 1.3, -0.7, 0.4
    cx, cy, cz = _out_coords(tgt.shape, jnp.asarray(m))
    s = np.asarray(_trilerp_flat(src, cx, cy, cz, strict_lo=True),
                   np.float64)
    ss_ref = float((s * s).sum())
    st_ref = float((s * np.asarray(tgt, np.float64)).sum())
    ss, st = corr3d_partials(src, tgt, m)
    np.testing.assert_allclose(float(ss), ss_ref, rtol=1e-4)
    np.testing.assert_allclose(float(st), st_ref, rtol=1e-4)


def test_streamed_odd_z_extent_actually_blocks():
    """Odd output-z extents must still split into bounded blocks (the old
    power-of-two divisibility rule collapsed any odd extent to ONE
    full-volume block, defeating the beyond-HBM tier), and both streamed
    drivers must stay exact with a ceil/overlap or masked tail."""
    from microimagelib_tpu.ops.affine import (
        _stream_blocks,
        affine_transform_3d,
        affine_transform_3d_streamed,
        corr3d_partials,
        corr3d_partials_streamed,
    )

    rng = np.random.default_rng(17)
    shape = (23, 16, 12)  # odd z
    src = rng.random(shape).astype(np.float32)
    tgt = rng.random(shape).astype(np.float32)
    m = np.array([1, 0, 0.05, 1.5, 0, 1, 0, -2.0, 0.02, 0, 1, 0.8],
                 np.float32)

    bz, blocks, width = _stream_blocks(m, 23, 23, 16, 12, 16, 12,
                                       budget_bytes=16 * 12 * 4 * 12,
                                       n_blocks=None, overlap_tail=False)
    assert len(blocks) > 1, "odd extent must still split into blocks"

    ref = np.asarray(affine_transform_3d(jnp.asarray(src), m, shape))
    out = affine_transform_3d_streamed(src, m, shape,
                                       budget_bytes=16 * 12 * 4 * 12)
    np.testing.assert_allclose(out, ref, atol=1e-5)

    ss0, st0 = corr3d_partials(jnp.asarray(src), jnp.asarray(tgt), m)
    ss, st = corr3d_partials_streamed(src, tgt, m,
                                      budget_bytes=16 * 12 * 4 * 12)
    np.testing.assert_allclose(ss, float(ss0), rtol=1e-5)
    np.testing.assert_allclose(st, float(st0), rtol=1e-5)
