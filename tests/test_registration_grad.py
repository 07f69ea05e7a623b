"""Gradient registration engine: analytic-gradient kernel correctness and
ladder quality parity vs the NR-Powell engines."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import ndimage

from microimagelib_tpu.models.registration import reg3d_affine


def _blobs(shape, n=12, seed=0, sigma=2.0):
    """Bead-like structured volume (one dominant registration basin —
    pure smoothed noise makes the NCC surface a local-minimum lottery
    that no local optimizer, Powell included, resolves consistently)."""
    rng = np.random.default_rng(seed)
    vol = np.zeros(shape, dtype=np.float32)
    for _ in range(n):
        z, y, x = (rng.integers(s // 4, 3 * s // 4) for s in shape)
        vol[z, y, x] = rng.uniform(80, 200)
    return ndimage.gaussian_filter(vol, sigma)


def _pair(shape=(16, 24, 20), seed=7, angle=3.0, shift=(1.2, -1.5, 0.8)):
    vol = _blobs(shape, n=14, seed=seed)
    th = np.deg2rad(angle)
    rot = np.array([[np.cos(th), -np.sin(th), 0],
                    [np.sin(th), np.cos(th), 0],
                    [0, 0, 1]])
    moved = ndimage.affine_transform(vol, rot, shift, order=1).astype(np.float32)
    return vol, moved


def test_grad_kernel_matches_xla_autodiff():
    """The Pallas grad kernel's (ss, st, gs, gt) == XLA autodiff through
    the exact gather path (interpret mode on CPU)."""
    from microimagelib_tpu.ops.pallas_corr import (
        corr3d_grad_pallas,
        grad_fallback_xla,
    )

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.random((8, 16, 32)).astype(np.float32))
    tgt = jnp.asarray(rng.random((8, 16, 32)).astype(np.float32))
    for tmx in (
        np.array([1, 0, 0, 0.6, 0, 1, 0, -0.8, 0, 0, 1, 0.3], np.float32),
        np.array([0.99, 0.05, 0, 0.2, -0.05, 0.99, 0, 0.1,
                  0, 0.02, 1.01, -0.4], np.float32),
    ):
        ss_p, st_p, gs_p, gt_p = corr3d_grad_pallas(src, tgt, tmx,
                                                    interpret=True)
        ss_x, st_x, gs_x, gt_x = grad_fallback_xla(src, tgt, tmx)
        np.testing.assert_allclose(float(ss_p), float(ss_x), rtol=1e-5)
        np.testing.assert_allclose(float(st_p), float(st_x), rtol=1e-5)
        scale = max(np.abs(np.asarray(gs_x)).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(gs_p), np.asarray(gs_x),
                                   atol=2e-4 * scale)
        scale = max(np.abs(np.asarray(gt_x)).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(gt_p), np.asarray(gt_x),
                                   atol=2e-4 * scale)


@pytest.mark.parametrize("method", [1, 7])
def test_grad_engine_matches_powell_quality(method):
    """engine='grad' (L-BFGS + Powell finisher) reaches at least the
    Powell engine's NCC (within 1e-3) with far fewer evaluations."""
    vol, moved = _pair()
    _, _, rec_p = reg3d_affine(vol, moved, aff_method=method, ftol=1e-4,
                               it_limit=3000, engine="device")
    _, _, rec_g = reg3d_affine(vol, moved, aff_method=method, ftol=1e-4,
                               it_limit=3000, engine="grad")
    assert rec_g[3] >= rec_p[3] - 1e-3, (rec_g[3], rec_p[3])


def test_grad_engine_env_override(monkeypatch):
    """MIL_REG_ENGINE=grad routes engine='auto' to the gradient ladder."""
    vol, moved = _pair(shape=(16, 24, 20))
    monkeypatch.setenv("MIL_REG_ENGINE", "grad")
    _, tmx, rec = reg3d_affine(vol, moved, aff_method=1, ftol=1e-4,
                               it_limit=500)
    assert rec[3] > 0  # registered something
    assert rec[5] <= 500


def test_lbfgs_solves_quadratic():
    from microimagelib_tpu.ops.lbfgs import lbfgs_minimize

    a = jnp.asarray(np.diag([1.0, 10.0, 100.0]).astype(np.float32))

    def vg(p):
        f = lambda p: 0.5 * p @ a @ p - p.sum()
        return jax.value_and_grad(f)(p)

    p, fmin, nev = lbfgs_minimize(vg, jnp.zeros(3, jnp.float32), 1e-10, 200)
    np.testing.assert_allclose(np.asarray(p), [1.0, 0.1, 0.01], atol=1e-3)
    assert int(nev) < 200


@pytest.mark.parametrize("method", [7])
def test_grad_engine_batched_linesearch_quality(method, monkeypatch):
    """MIL_REG_BATCH_LS=1 runs the finisher's line minimizations as
    8-probe batched cost calls; final NCC must match the serial
    finisher's within 1e-3."""
    vol, moved = _pair()
    _, _, rec_s = reg3d_affine(vol, moved, aff_method=method, ftol=1e-4,
                               it_limit=3000, engine="grad")
    monkeypatch.setenv("MIL_REG_BATCH_LS", "1")
    _, _, rec_b = reg3d_affine(vol, moved, aff_method=method, ftol=1e-4,
                               it_limit=3000, engine="grad")
    assert rec_b[3] >= rec_s[3] - 1e-3, (rec_b[3], rec_s[3])
