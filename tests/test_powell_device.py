"""On-device Powell: must match the host NR implementation's behavior on
the same cost landscapes and drive registration to the same optima."""

import numpy as np
import jax
import jax.numpy as jnp

from microimagelib_tpu.ops.powell import powell as powell_host
from microimagelib_tpu.ops.powell_device import powell_device
from microimagelib_tpu.models.registration import reg3d_affine, zncc
from microimagelib_tpu.models.registration_device import (
    dof_to_matrix_jnp,
    matrix_to_params_jnp,
    params_to_matrix_jnp,
)
from microimagelib_tpu.ops.matrix import dof_to_matrix, identity_tmx, matrix_to_params
from microimagelib_tpu.ops.affine import affine_transform_3d


def smooth_blobs(shape, n=10, seed=0, sigma=2.0):
    rng = np.random.default_rng(seed)
    vol = np.zeros(shape, dtype=np.float32)
    for _ in range(n):
        z, y, x = (rng.integers(s // 4, 3 * s // 4) for s in shape)
        vol[z, y, x] = rng.uniform(80, 200)
    zz, yy, xx = np.meshgrid(*[np.arange(s) - s // 2 for s in shape], indexing="ij")
    g = np.exp(-(xx**2 + yy**2 + zz**2) / (2 * sigma**2))
    g = np.roll(g / g.sum(), [-s // 2 for s in shape], axis=(0, 1, 2))
    return np.fft.irfftn(np.fft.rfftn(vol) * np.fft.rfftn(g), s=shape, axes=(0, 1, 2)).astype(np.float32)


def test_matrix_builders_match_host():
    dof = np.array([1.5, -2, 0.5, 10, 5, -3, 1.1, 0.9, 1.0], np.float32)
    for n in (3, 6, 7, 9):
        host = dof_to_matrix(dof, n)
        dev = np.asarray(dof_to_matrix_jnp(jnp.asarray(dof), n))
        np.testing.assert_allclose(dev, host, atol=1e-5)
    m = dof_to_matrix(dof, 9)
    np.testing.assert_allclose(np.asarray(params_to_matrix_jnp(jnp.asarray(matrix_to_params(m)))), m, atol=1e-6)
    np.testing.assert_allclose(np.asarray(matrix_to_params_jnp(jnp.asarray(m))), matrix_to_params(m), atol=1e-6)


def test_powell_device_quadratic():
    def cost(x):
        return 0.05 * ((x[0] - 3.0) ** 2 + 2.0 * (x[1] + 1.0) ** 2) - 0.9

    p, f, nev = jax.jit(lambda p0: powell_device(cost, p0, 1e-6, 10000))(jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(p), [3.0, -1.0], atol=2e-2)
    assert float(f) < -0.9 + 1e-3
    assert int(nev) > 0


def test_powell_device_matches_host_on_same_cost():
    def cost_np(x):
        return float(0.05 * ((1 - x[0]) ** 2 + 5.0 * (x[1] - x[0] ** 2) ** 2) - 0.9)

    def cost_jnp(x):
        return 0.05 * ((1 - x[0]) ** 2 + 5.0 * (x[1] - x[0] ** 2) ** 2) - 0.9

    p_h, f_h, _, _ = powell_host(np.array([-1.0, 1.0]), cost_np, 1e-8, 100000)
    p_d, f_d, _ = jax.jit(lambda p0: powell_device(cost_jnp, p0, 1e-8, 100000))(
        jnp.asarray([-1.0, 1.0], jnp.float32))
    np.testing.assert_allclose(np.asarray(p_d), p_h, atol=0.05)
    assert abs(float(f_d) - f_h) < 1e-3


def test_powell_device_cost_abort():
    def cost(x):
        return jnp.float32(5.0) + 0.0 * x[0]

    p, f, nev = jax.jit(lambda p0: powell_device(cost, p0, 1e-4, 1000))(jnp.zeros(1))
    assert float(f) == 5.0
    assert int(nev) == 1


def test_device_registration_matches_host_quality():
    vol = smooth_blobs((24, 24, 24), n=10, seed=4)
    true_m = identity_tmx()
    true_m[3], true_m[7], true_m[11] = 1.7, -1.2, 0.8
    moved = np.asarray(affine_transform_3d(jnp.asarray(vol), true_m, vol.shape))
    reg_h, tmx_h, rec_h = reg3d_affine(vol, moved, aff_method=1, ftol=1e-5,
                                       it_limit=2000, engine="host")
    reg_d, tmx_d, rec_d = reg3d_affine(vol, moved, aff_method=1, ftol=1e-5,
                                       it_limit=2000, engine="device")
    assert rec_d[3] > 0.98
    assert rec_d[3] >= rec_h[3] - 0.01
    np.testing.assert_allclose([tmx_d[3], tmx_d[7], tmx_d[11]],
                               [-1.7, 1.2, -0.8], atol=0.35)


def test_device_ladder_method7():
    vol = smooth_blobs((20, 20, 20), n=10, seed=5)
    true_m = dof_to_matrix([1.0, -0.8, 0.5, 2.0, -1.5, 1.0, 1.02, 0.98, 1.01], 9)
    moved = np.asarray(affine_transform_3d(jnp.asarray(vol), true_m, vol.shape))
    reg, tmx, rec = reg3d_affine(vol, moved, aff_method=7, ftol=1e-4,
                                 it_limit=4000, engine="device")
    assert rec[3] > 0.93
    assert zncc(reg, vol) > 0.93


def test_device_engine_with_input_matrix():
    vol = smooth_blobs((20, 20, 20), n=10, seed=6)
    true_m = identity_tmx()
    true_m[3] = 2.5
    moved = np.asarray(affine_transform_3d(jnp.asarray(vol), true_m, vol.shape))
    near = identity_tmx()
    near[3] = -2.0
    reg, tmx, _ = reg3d_affine(vol, moved, aff_method=1, flag_tmx=True, tmx=near,
                               ftol=1e-5, it_limit=2000, engine="device")
    np.testing.assert_allclose(tmx[3], -2.5, atol=0.2)


def test_hybrid_engine_matches_device_quality():
    vol = smooth_blobs((20, 20, 20), n=10, seed=7)
    true_m = identity_tmx()
    true_m[3], true_m[7], true_m[11] = 2.0, -1.0, 1.5
    moved = np.asarray(affine_transform_3d(jnp.asarray(vol), true_m, vol.shape))
    reg_h, tmx_h, rec_h = reg3d_affine(vol, moved, aff_method=1, ftol=1e-5,
                                       it_limit=2000, engine="hybrid")
    # f32 line minimization converges marginally differently from f64
    assert rec_h[3] > 0.97
    np.testing.assert_allclose([tmx_h[3], tmx_h[7], tmx_h[11]],
                               [-2.0, 1.0, -1.5], atol=0.35)


def test_hybrid_ladder_method7():
    vol = smooth_blobs((20, 20, 20), n=10, seed=8)
    true_m = dof_to_matrix([1.0, -0.8, 0.5, 2.0, -1.5, 1.0, 1.0, 1.0, 1.0], 6)
    moved = np.asarray(affine_transform_3d(jnp.asarray(vol), true_m, vol.shape))
    reg, tmx, rec = reg3d_affine(vol, moved, aff_method=7, ftol=1e-4,
                                 it_limit=4000, engine="hybrid")
    assert rec[3] > 0.93
    assert zncc(reg, vol) > 0.93


def test_pyramid_registration():
    from microimagelib_tpu.models.registration import reg3d_affine_pyramid

    vol = smooth_blobs((32, 32, 32), n=14, seed=9, sigma=2.5)
    true_m = identity_tmx()
    true_m[3], true_m[7], true_m[11] = 3.0, -2.0, 1.5
    moved = np.asarray(affine_transform_3d(jnp.asarray(vol), true_m, vol.shape))
    reg, tmx, rec = reg3d_affine_pyramid(vol, moved, aff_method=1, ftol=1e-5,
                                         it_limit=2000, factor=2)
    assert rec[3] > 0.97
    np.testing.assert_allclose([tmx[3], tmx[7], tmx[11]], [-3.0, 2.0, -1.5], atol=0.4)


def test_pyramid_matrix_scale_conversion():
    from microimagelib_tpu.models.registration import (
        _tmx_coarse_to_full,
        _tmx_full_to_coarse,
    )

    m = dof_to_matrix([3.0, -2.0, 1.0, 5.0, -3.0, 2.0, 1.05, 0.95, 1.02], 9)
    for k in (2, 4):
        back = _tmx_full_to_coarse(_tmx_coarse_to_full(m, k), k)
        np.testing.assert_allclose(back, m, atol=1e-5)
        # a coarse-grid identity maps to a full-grid identity
        ident = identity_tmx()
        np.testing.assert_allclose(_tmx_coarse_to_full(ident, k), ident, atol=1e-6)


def test_pyramid_coordinate_consistency():
    """Pooled-grid sampling through the converted matrix must agree with
    full-grid sampling through the original (on smooth data)."""
    from microimagelib_tpu.models.registration import _mean_pool, _tmx_coarse_to_full

    vol = smooth_blobs((32, 32, 32), n=10, seed=10, sigma=3.0)
    m_c = identity_tmx()
    m_c[3] = 1.25  # x-shift on the coarse grid
    m_f = _tmx_coarse_to_full(m_c, 2)
    assert abs(m_f[3] - 2.5) < 1e-5  # translation doubles for identity A
    coarse = _mean_pool(vol, 2)
    out_c = np.asarray(affine_transform_3d(jnp.asarray(coarse.astype(np.float32)), m_c, coarse.shape))
    out_f = np.asarray(affine_transform_3d(jnp.asarray(vol), m_f, vol.shape))
    pooled_full = _mean_pool(out_f, 2)
    # interior agreement (borders differ by pooling the zero-mask band)
    a = out_c[2:-2, 2:-2, 2:-2]
    b = pooled_full[2:-2, 2:-2, 2:-2]
    ncc = float(((a - a.mean()) * (b - b.mean())).sum()
                / np.sqrt(((a - a.mean()) ** 2).sum() * ((b - b.mean()) ** 2).sum()))
    assert ncc > 0.998


def test_pyramid_anisotropic_factor_conversion():
    from microimagelib_tpu.models.registration import (
        _mean_pool,
        _tmx_coarse_to_full,
        _tmx_full_to_coarse,
    )

    m = dof_to_matrix([3.0, -2.0, 1.0, 5.0, -3.0, 2.0, 1.05, 0.95, 1.02], 9)
    for k in ((2, 2, 1), (4, 2, 1), (2, 4, 2)):
        back = _tmx_full_to_coarse(_tmx_coarse_to_full(m, k), k)
        np.testing.assert_allclose(back, m, atol=1e-5)
        np.testing.assert_allclose(_tmx_coarse_to_full(identity_tmx(), k),
                                   identity_tmx(), atol=1e-6)
    # anisotropic coordinate consistency: pooled sampling through the
    # converted matrix agrees with full sampling
    vol = smooth_blobs((32, 32, 32), n=10, seed=11, sigma=3.0)
    k = (2, 2, 1)
    m_c = identity_tmx()
    m_c[3], m_c[7], m_c[11] = 1.0, 0.75, 0.5
    m_f = _tmx_coarse_to_full(m_c, k)
    coarse = _mean_pool(vol, k)
    out_c = np.asarray(affine_transform_3d(jnp.asarray(coarse.astype(np.float32)), m_c, coarse.shape))
    out_f = np.asarray(affine_transform_3d(jnp.asarray(vol), m_f, vol.shape))
    pooled_full = _mean_pool(out_f, k)
    a = out_c[2:-2, 2:-2, 2:-2]
    b = pooled_full[2:-2, 2:-2, 2:-2]
    ncc = float(((a - a.mean()) * (b - b.mean())).sum()
                / np.sqrt(((a - a.mean()) ** 2).sum() * ((b - b.mean()) ** 2).sum()))
    assert ncc > 0.998


def test_pyramid_anisotropic_registration():
    from microimagelib_tpu.models.registration import reg3d_affine_pyramid

    vol = smooth_blobs((32, 32, 32), n=14, seed=12, sigma=2.5)
    true_m = identity_tmx()
    true_m[3], true_m[7], true_m[11] = 2.0, -1.5, 1.0
    moved = np.asarray(affine_transform_3d(jnp.asarray(vol), true_m, vol.shape))
    reg, tmx, rec = reg3d_affine_pyramid(vol, moved, aff_method=1, ftol=1e-5,
                                         it_limit=2000, factor=(2, 2, 1))
    assert rec[3] > 0.97
    np.testing.assert_allclose([tmx[3], tmx[7], tmx[11]], [-2.0, 1.5, -1.0], atol=0.4)


def test_powell_device_batched_linmin_quality():
    """cost_batch switches the line minimizations to the vectorized
    multi-probe search; the found minimum must match serial
    mnbrak/brent's on a coupled quadratic."""
    a = jnp.asarray(np.diag([1.0, 4.0, 0.25]) + 0.1, jnp.float32)
    b = jnp.asarray([1.0, -2.0, 0.5], jnp.float32)

    def cost(p):
        return 0.5 * p @ a @ p - b @ p - 1.5

    p0 = jnp.zeros(3, jnp.float32)
    p_s, f_s, _ = jax.jit(lambda p: powell_device(cost, p, 1e-6, 3000))(p0)
    p_b, f_b, nev = jax.jit(
        lambda p: powell_device(cost, p, 1e-6, 3000,
                                cost_batch=jax.vmap(cost)))(p0)
    assert abs(float(f_b) - float(f_s)) < 1e-4 * (abs(float(f_s)) + 1.0)
    np.testing.assert_allclose(np.asarray(p_b), np.asarray(p_s), atol=5e-3)
    assert int(nev) > 0


def test_powell_device_batched_linmin_far_minimum():
    """The edge-expansion rounds must reach a minimum far outside the
    initial ladder span (mnbrak's GLIMIT territory)."""
    def cost(p):
        # stays below the 1.001 abort threshold over the whole search
        return 0.0005 * (p[0] - 40.0) ** 2 - 2.0

    p_b, f_b, _ = jax.jit(
        lambda p: powell_device(cost, p, 1e-6, 3000,
                                cost_batch=jax.vmap(cost)))(
        jnp.zeros(1, jnp.float32))
    assert abs(float(p_b[0]) - 40.0) < 1.0
    assert float(f_b) < -2.0 + 1e-2
