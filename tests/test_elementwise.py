import numpy as np
import jax.numpy as jnp

from microimagelib_tpu.ops import elementwise as E


def test_suite(rng):
    a = rng.normal(size=(4, 5, 6)).astype(np.float32)
    b = rng.normal(size=(4, 5, 6)).astype(np.float32) + 2.0
    np.testing.assert_allclose(np.asarray(E.add3d(a, b)), a + b)
    np.testing.assert_allclose(np.asarray(E.sub3d(a, b)), a - b)
    np.testing.assert_allclose(np.asarray(E.multi3d(a, b)), a * b)
    np.testing.assert_allclose(np.asarray(E.div3d(a, b)), a / b, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(E.add_value(a, 1.5)), a + 1.5)
    np.testing.assert_allclose(np.asarray(E.multi_value(a, 2.0)), a * 2)
    np.testing.assert_allclose(np.asarray(E.max_value(a, 0.01)), np.maximum(a, 0.01))
    np.testing.assert_allclose(float(E.sum3d(a)), a.sum(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(E.reduce_z(a)), a.sum(0), rtol=1e-5)
    mz, az = E.max_z(a)
    np.testing.assert_allclose(np.asarray(mz), a.max(0))
    np.testing.assert_array_equal(np.asarray(az), a.argmax(0))


def test_complex_ops(rng):
    a = (rng.normal(size=(3, 4)) + 1j * rng.normal(size=(3, 4))).astype(np.complex64)
    b = (rng.normal(size=(3, 4)) + 1j * rng.normal(size=(3, 4))).astype(np.complex64)
    np.testing.assert_allclose(np.asarray(E.multicomplex(a, b)), a * b, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(E.conj3d(a)), np.conj(a))
    norm = np.asarray(E.multicomplex_norm(a, b))
    expect = (a * b) / np.abs(a * b)
    np.testing.assert_allclose(norm, expect, rtol=1e-4)
    z = np.zeros((2, 2), np.complex64)
    np.testing.assert_array_equal(np.asarray(E.multicomplex_norm(z, z)), z)
