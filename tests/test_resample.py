"""Separable MXU resampling must match the gather-based affine transform
exactly (same boundary semantics) for diagonal transforms."""

import numpy as np
import jax.numpy as jnp

from microimagelib_tpu.ops.affine import affine_transform_3d
from microimagelib_tpu.ops.matrix import scale_tmx
from microimagelib_tpu.ops.resample import is_diagonal_tmx, resize3d_separable


def test_matches_gather_upsample(rng):
    vol = rng.random((8, 10, 12)).astype(np.float32)
    out_shape = (16, 15, 24)
    m = scale_tmx(12 / 24, 10 / 15, 8 / 16)
    ref = np.asarray(affine_transform_3d(jnp.asarray(vol), m, out_shape))
    out = np.asarray(resize3d_separable(vol, out_shape))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_matches_gather_downsample(rng):
    vol = rng.random((16, 16, 16)).astype(np.float32)
    out_shape = (7, 9, 11)
    m = scale_tmx(16 / 11, 16 / 9, 16 / 7)
    ref = np.asarray(affine_transform_3d(jnp.asarray(vol), m, out_shape))
    out = np.asarray(resize3d_separable(vol, out_shape))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_with_translation(rng):
    vol = rng.random((10, 10, 10)).astype(np.float32)
    m = scale_tmx(1.0, 1.0, 1.0)
    m[3], m[7], m[11] = 1.5, -0.5, 2.0
    ref = np.asarray(affine_transform_3d(jnp.asarray(vol), m, (10, 10, 10)))
    out = np.asarray(resize3d_separable(vol, (10, 10, 10), tmx_diag=m))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_rejects_rotation():
    m = scale_tmx(1, 1, 1)
    m[1] = 0.1
    assert not is_diagonal_tmx(m)
    try:
        resize3d_separable(np.zeros((4, 4, 4), np.float32), (4, 4, 4), tmx_diag=m)
        assert False
    except ValueError:
        pass


def test_identity(rng):
    vol = rng.random((6, 7, 8)).astype(np.float32)
    out = np.asarray(resize3d_separable(vol, (6, 7, 8)))
    np.testing.assert_allclose(out, vol, atol=1e-6)
