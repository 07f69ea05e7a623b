"""Fused Pallas CT convolution (ops/fft_pallas.py) vs numpy/f64 and the
existing FFT backends — runs through the Pallas interpreter on the CPU
test mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from microimagelib_tpu.ops.fft_pallas import (
    conv3_ct,
    ct_supported,
    permute_otf,
    permute_otf_jnp,
)


def _make(shape, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(shape).astype(np.float32)
    psf = rng.random(shape).astype(np.float32)
    psf /= psf.sum()
    otf = np.fft.rfftn(psf)
    ref = np.fft.irfftn(np.fft.rfftn(v.astype(np.float64)) * otf, s=shape,
                        axes=(0, 1, 2))
    return v, otf, ref


@pytest.mark.parametrize("shape", [(32, 32, 128), (64, 32, 128), (32, 64, 256)])
def test_conv3_ct_matches_f64(shape):
    v, otf, ref = _make(shape)
    assert ct_supported(shape)
    o_re, o_im = permute_otf(otf.real, otf.imag, shape)
    out = np.asarray(conv3_ct(jnp.asarray(v), o_re, o_im, interpret=True))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-4


def test_permute_otf_jnp_matches_host():
    shape = (32, 32, 128)
    _, otf, _ = _make(shape, 3)
    h_re, h_im = permute_otf(otf.real, otf.imag, shape)
    j_re, j_im = permute_otf_jnp(jnp.asarray(otf.astype(np.complex64)), shape)
    np.testing.assert_allclose(np.asarray(j_re), np.asarray(h_re), atol=1e-6)
    np.testing.assert_allclose(np.asarray(j_im), np.asarray(h_im), atol=1e-6)


def test_ct_supported_policy():
    assert ct_supported((512, 512, 512))
    assert ct_supported((128, 256, 512))
    assert not ct_supported((30, 32, 128))   # nz % 32
    assert not ct_supported((32, 32, 120))   # nx % 128
    assert not ct_supported((32, 20, 128))   # ny % 32


def test_rl_decon_pallas_matches_xla(monkeypatch):
    """RL loop routed through the fused CT conv == the XLA-FFT loop."""
    from microimagelib_tpu.models import deconvolution as dc

    shape = (32, 32, 128)
    rng = np.random.default_rng(4)
    img = jnp.asarray((rng.random(shape) * 100 + 1).astype(np.float32))
    psf = np.exp(-np.sum(np.square(np.mgrid[-3:4, -3:4, -3:4]), 0) / 4.0)
    psf = (psf / psf.sum()).astype(np.float32)
    otf = dc.gen_otf(jnp.asarray(psf), shape)
    otf_bp = dc.gen_otf(jnp.asarray(psf[::-1, ::-1, ::-1]), shape)

    monkeypatch.setenv("MIL_FFT_IMPL", "xla")
    ref = np.asarray(dc.rl_decon_single(img, otf, otf_bp, 5))
    monkeypatch.setenv("MIL_FFT_IMPL", "pallas")
    out = np.asarray(dc.rl_decon_single(img, otf, otf_bp, 5))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)

    monkeypatch.setenv("MIL_FFT_IMPL", "xla")
    ref_d = np.asarray(dc.rl_decon_dual(img, img * 1.1, otf, otf, otf_bp,
                                        otf_bp, 3))
    monkeypatch.setenv("MIL_FFT_IMPL", "pallas")
    out_d = np.asarray(dc.rl_decon_dual(img, img * 1.1, otf, otf, otf_bp,
                                        otf_bp, 3))
    np.testing.assert_allclose(out_d, ref_d, rtol=2e-3, atol=2e-3)


def test_fft_impl_pallas_policy(monkeypatch):
    from microimagelib_tpu.models import deconvolution as dc

    monkeypatch.delenv("MIL_FFT_IMPL", raising=False)
    monkeypatch.setattr(dc.jax, "default_backend", lambda: "tpu")
    assert dc._fft_impl((512, 512, 512)) == "pallas"
    assert dc._fft_impl((512, 512, 500)) == "matmul"  # nx not 128-mult
    assert dc._fft_impl((64, 64, 64)) == "xla"
    monkeypatch.setenv("MIL_FFT_IMPL", "pallas")
    assert dc._fft_impl((32, 32, 128)) == "pallas"
    assert dc._fft_impl((32, 20, 128)) == "matmul"  # unsupported shape
