"""Matmul-form DFT (ops/fft_matmul.py) vs the XLA/numpy FFTs.

The MXU path must match ``jnp.fft.rfftn``/``irfftn`` to f32 precision on
arbitrary (non-radix-2) extents, and the RL decon built on it must match
the XLA-FFT RL decon within the oracle budget.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microimagelib_tpu.ops.fft_matmul import conv3_mm, irfft3_mm, rfft3_mm

HI = jax.lax.Precision.HIGHEST


@pytest.mark.parametrize("shape", [(16, 20, 24), (8, 12, 15), (6, 9, 10)])
def test_rfft3_matches_numpy(shape):
    rng = np.random.default_rng(0)
    v = rng.standard_normal(shape).astype(np.float32)
    re, im = rfft3_mm(jnp.asarray(v), HI)
    ref = np.fft.rfftn(v)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=2e-5 * scale)


@pytest.mark.parametrize("shape", [(16, 20, 24), (8, 12, 15)])
def test_roundtrip(shape):
    rng = np.random.default_rng(1)
    v = rng.standard_normal(shape).astype(np.float32)
    re, im = rfft3_mm(jnp.asarray(v), HI)
    back = irfft3_mm(re, im, shape[2], HI)
    np.testing.assert_allclose(np.asarray(back), v, atol=2e-5)


@pytest.mark.parametrize("shape", [(256, 8, 8), (8, 256, 8), (128, 128, 8)])
def test_split_algo_matches_numpy(shape):
    """MIL_FFT_MM_ALGO='split' (two-stage Cooley-Tukey) on z- and
    y-splittable extents must match numpy like the dense path does."""
    rng = np.random.default_rng(7)
    v = rng.standard_normal(shape).astype(np.float32)
    re, im = rfft3_mm(jnp.asarray(v), HI, algo="split")
    ref = np.fft.rfftn(v)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=3e-5 * scale)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=3e-5 * scale)
    back = irfft3_mm(re, im, shape[2], HI, algo="split")
    np.testing.assert_allclose(np.asarray(back), v, atol=3e-5)


def test_mm_precision_invalid_raises(monkeypatch):
    from microimagelib_tpu.ops.fft_matmul import mm_precision

    monkeypatch.setenv("MIL_FFT_MM_PRECISION", "hi")
    with pytest.raises(ValueError, match="MIL_FFT_MM_PRECISION"):
        mm_precision()


def test_irfft3_matches_numpy_on_product():
    """Spectrum products (the RL case) invert identically to irfftn."""
    shape = (12, 16, 18)
    rng = np.random.default_rng(2)
    v = rng.standard_normal(shape).astype(np.float32)
    h = rng.standard_normal(shape).astype(np.float32)
    spec = np.fft.rfftn(v) * np.fft.rfftn(h)
    ref = np.fft.irfftn(spec, s=shape, axes=(0, 1, 2))
    out = irfft3_mm(jnp.asarray(spec.real.astype(np.float32)),
                    jnp.asarray(spec.imag.astype(np.float32)), shape[2], HI)
    np.testing.assert_allclose(np.asarray(out), ref,
                               atol=3e-5 * np.abs(ref).max())


def test_conv3_mm_matches_xla_conv():
    shape = (16, 24, 20)
    rng = np.random.default_rng(3)
    v = rng.standard_normal(shape).astype(np.float32) + 4.0
    psf = rng.random(shape).astype(np.float32)
    psf /= psf.sum()
    otf = np.fft.rfftn(psf)
    ref = np.asarray(jnp.fft.irfftn(jnp.fft.rfftn(jnp.asarray(v))
                                    * jnp.asarray(otf), s=shape))
    out = conv3_mm(jnp.asarray(v), jnp.asarray(otf.real.astype(np.float32)),
                   jnp.asarray(otf.imag.astype(np.float32)), HI)
    np.testing.assert_allclose(np.asarray(out), ref,
                               atol=3e-5 * np.abs(ref).max())


def test_rl_decon_mm_matches_xla_path(monkeypatch):
    """Full RL loop on the matmul FFT == RL loop on the XLA FFT."""
    from microimagelib_tpu.models import deconvolution as dc

    shape = (16, 24, 20)
    rng = np.random.default_rng(4)
    img = jnp.asarray((rng.random(shape) * 100 + 1).astype(np.float32))
    psf = np.exp(-np.sum(np.square(np.mgrid[-3:4, -3:4, -3:4]), 0) / 4.0)
    psf = (psf / psf.sum()).astype(np.float32)
    otf = dc.gen_otf(jnp.asarray(psf), shape)
    otf_bp = dc.gen_otf(jnp.asarray(psf[::-1, ::-1, ::-1]), shape)

    monkeypatch.setenv("MIL_FFT_IMPL", "xla")
    ref = np.asarray(dc.rl_decon_single(img, otf, otf_bp, 5))
    monkeypatch.setenv("MIL_FFT_IMPL", "matmul")
    out = np.asarray(dc.rl_decon_single(img, otf, otf_bp, 5))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)

    monkeypatch.setenv("MIL_FFT_IMPL", "xla")
    ref_d = np.asarray(dc.rl_decon_dual(img, img * 1.1, otf, otf, otf_bp,
                                        otf_bp, 4))
    monkeypatch.setenv("MIL_FFT_IMPL", "matmul")
    out_d = np.asarray(dc.rl_decon_dual(img, img * 1.1, otf, otf, otf_bp,
                                        otf_bp, 4))
    np.testing.assert_allclose(out_d, ref_d, rtol=2e-3, atol=2e-3)


def test_fft_impl_policy(monkeypatch):
    """auto: matmul on TPU >= 2^23 voxels, xla below and on other
    backends; explicit env wins."""
    from microimagelib_tpu.models import deconvolution as dc

    monkeypatch.delenv("MIL_FFT_IMPL", raising=False)
    assert dc._fft_impl((512, 512, 512)) == "xla"  # cpu backend here
    monkeypatch.setattr(dc.jax, "default_backend", lambda: "tpu")
    # round 3: large CT-supported shapes take the fused Pallas conv;
    # below the measured ~2^25 crossover the matmul DFT is faster
    assert dc._fft_impl((512, 512, 512)) == "pallas"
    assert dc._fft_impl((128, 512, 512)) == "pallas"  # exactly 2^25
    assert dc._fft_impl((128, 256, 256)) == "matmul"  # 2^23: mm wins
    assert dc._fft_impl((256, 256, 256)) == "matmul"  # 2^24: mm wins
    assert dc._fft_impl((129, 512, 512)) == "matmul"  # not CT-supported
    assert dc._fft_impl((64, 64, 64)) == "xla"
    monkeypatch.setenv("MIL_FFT_IMPL", "xla")
    assert dc._fft_impl((512, 512, 512)) == "xla"
    monkeypatch.setenv("MIL_FFT_IMPL", "matmul")
    assert dc._fft_impl((8, 8, 8)) == "matmul"


def test_phasor_surface_mm_matches_xla():
    from microimagelib_tpu.models.registration import (
        _phasor_surface3,
        _phasor_surface3_mm,
    )

    shape = (16, 24, 20)
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.random(shape).astype(np.float32))
    b = jnp.asarray(np.roll(np.asarray(a), (2, -3, 4), (0, 1, 2)))
    ref = np.asarray(_phasor_surface3(a, b))
    out = np.asarray(_phasor_surface3_mm(a, b))
    np.testing.assert_allclose(out, ref, atol=2e-4 * np.abs(ref).max())
