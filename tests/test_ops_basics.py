import numpy as np
import jax.numpy as jnp

from microimagelib_tpu.ops.basics import (
    align_size_3d,
    circshift,
    crop_at,
    crop_center,
    flip3,
    imshift,
    max3d_with_coords,
    max_projection,
    pad_psf_to_origin,
    pad_stack_edge,
    rot_by_y_axis,
    snap_fft_size,
    snap_transform_size,
)


def ref_snap(n):
    # independent model of reference:src/api_subfunc.cu:57-87
    n = ((n + 15) // 16) * 16
    p = 1
    while p < n:
        p *= 2
    if p == n:
        return n
    return p if p <= 128 else ((n + 63) // 64) * 64


def test_snap_transform_size_table():
    for n in [1, 7, 16, 17, 30, 64, 65, 100, 128, 129, 200, 255, 256, 300, 500, 512, 700, 1000]:
        assert snap_transform_size(n) == ref_snap(n), n
    # spot values
    assert snap_transform_size(100) == 128
    assert snap_transform_size(129) == 192
    assert snap_transform_size(300) == 320
    assert snap_transform_size(500) == 512


def test_snap_fft_size_prefers_pow2():
    assert snap_fft_size(500) == 512
    assert snap_fft_size(200) == 256
    assert snap_fft_size(320) == 320  # 512 > 320*1.25, keep reference size


def test_flip3(rng):
    a = rng.normal(size=(3, 4, 5)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(flip3(jnp.asarray(a))), a[::-1, ::-1, ::-1])


def test_circshift_matches_definition(rng):
    a = rng.normal(size=(4, 5, 6)).astype(np.float32)
    dx, dy, dz = 2, -1, 3
    out = np.asarray(circshift(jnp.asarray(a), dx, dy, dz))
    sz, sy, sx = a.shape
    for z in range(sz):
        for y in range(sy):
            for x in range(sx):
                assert out[z, y, x] == a[(z - dz) % sz, (y - dy) % sy, (x - dx) % sx]


def test_imshift_zero_fill(rng):
    a = rng.normal(size=(3, 4, 5)).astype(np.float32)
    out = np.asarray(imshift(jnp.asarray(a), 1, 0, -1))
    sz, sy, sx = a.shape
    for z in range(sz):
        for y in range(sy):
            for x in range(sx):
                tz, ty, tx = z + 1, y, x - 1
                if 0 <= tz < sz and 0 <= tx < sx:
                    assert out[z, y, x] == a[tz, ty, tx]
                else:
                    assert out[z, y, x] == 0


def test_pad_psf_to_origin_center_at_zero(rng):
    psf = rng.random(size=(5, 5, 5)).astype(np.float32)
    out = np.asarray(pad_psf_to_origin(jnp.asarray(psf), (8, 8, 8)))
    # center voxel (2,2,2) must land at (0,0,0)
    assert out[0, 0, 0] == psf[2, 2, 2]
    # voxel left of center wraps to the far end
    assert out[7, 7, 7] == psf[1, 1, 1]
    assert out[1, 1, 1] == psf[3, 3, 3]
    assert np.sum(out != 0) == min((out != 0).sum(), 125)
    np.testing.assert_allclose(out.sum(), psf.sum(), rtol=1e-6)


def test_pad_stack_edge_replicates(rng):
    img = rng.random(size=(4, 4, 4)).astype(np.float32)
    out = np.asarray(pad_stack_edge(jnp.asarray(img), (8, 8, 8)))
    so = (8 - 4) // 2
    np.testing.assert_array_equal(out[so : so + 4, so : so + 4, so : so + 4], img)
    assert out[0, 0, 0] == img[0, 0, 0]
    assert out[7, 7, 7] == img[3, 3, 3]
    assert out[0, so + 1, so + 2] == img[0, 1, 2]


def test_crop_center_inverts_pad(rng):
    img = rng.random(size=(4, 6, 5)).astype(np.float32)
    out = np.asarray(crop_center(pad_stack_edge(jnp.asarray(img), (9, 9, 9)), (4, 6, 5)))
    np.testing.assert_array_equal(out, img)


def test_crop_at(rng):
    img = rng.random(size=(6, 6, 6)).astype(np.float32)
    out = np.asarray(crop_at(jnp.asarray(img), (2, 3, 4), (1, 2, 0)))
    np.testing.assert_array_equal(out, img[0:2, 2:5, 1:5])


def test_align_size_3d_pad_and_crop(rng):
    img = rng.random(size=(4, 4, 4)).astype(np.float32)
    big = np.asarray(align_size_3d(jnp.asarray(img), (8, 8, 8)))
    so = 2
    np.testing.assert_array_equal(big[so : so + 4, so : so + 4, so : so + 4], img)
    assert big[0, 0, 0] == 0
    back = np.asarray(align_size_3d(jnp.asarray(big), (4, 4, 4)))
    np.testing.assert_array_equal(back, img)


def test_max_projection_directions(rng):
    a = rng.random(size=(3, 4, 5)).astype(np.float32)
    mp1 = np.asarray(max_projection(jnp.asarray(a), 1))
    assert mp1.shape == (4, 5)
    np.testing.assert_array_equal(mp1, a.max(0))
    mp2 = np.asarray(max_projection(jnp.asarray(a), 2))
    assert mp2.shape == (5, 3)  # (x, z)
    np.testing.assert_array_equal(mp2, a.max(1).T)
    mp3 = np.asarray(max_projection(jnp.asarray(a), 3))
    assert mp3.shape == (3, 4)  # (z, y)
    np.testing.assert_array_equal(mp3, a.max(2))


def test_rot_by_y_axis_roundtrip(rng):
    a = rng.random(size=(3, 4, 5)).astype(np.float32)
    r = np.asarray(rot_by_y_axis(jnp.asarray(a), 1))
    assert r.shape == (5, 4, 3)  # x and z swap
    # definition: out[z', y, x'] = in[x', y, sx-1-z']
    for zp in range(5):
        for y in range(4):
            for xp in range(3):
                assert r[zp, y, xp] == a[xp, y, 5 - 1 - zp]
    back = np.asarray(rot_by_y_axis(jnp.asarray(r), -1))
    np.testing.assert_array_equal(back, a)


def test_max3d_with_coords(rng):
    a = np.zeros((4, 5, 6), dtype=np.float32)
    a[2, 3, 1] = 7.0
    val, (x, y, z) = max3d_with_coords(jnp.asarray(a))
    assert float(val) == 7.0
    assert (int(x), int(y), int(z)) == (1, 3, 2)


def test_mip3d_matmul_matches_gather(monkeypatch):
    """The MXU one-hot-matmul rotating MIP equals the gather path to f32
    rounding on both rotation axes."""
    import jax.numpy as jnp

    from microimagelib_tpu.models import projections as pj

    rng = np.random.default_rng(11)
    vol = jnp.asarray(rng.random((12, 20, 16)).astype(np.float32) * 100)
    for r_axis in (1, 2):
        monkeypatch.setenv("MIL_MIP_MATMUL_MAX_BYTES", str(3 << 30))
        fast = pj.mip3d(vol, r_axis, 8)
        monkeypatch.setenv("MIL_MIP_MATMUL_MAX_BYTES", "0")
        ref = pj.mip3d(vol, r_axis, 8)
        np.testing.assert_allclose(fast, ref, atol=3e-3)
