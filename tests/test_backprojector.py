"""Wiener-Butterworth back projector: accelerated RL must reach in few
iterations what traditional RL needs many for (the Guo 2020 claim)."""

import numpy as np

from microimagelib_tpu.models.backprojector import gen_backprojector
from microimagelib_tpu.models.deconvolution import decon_singleview


def gaussian_psf(shape, sigma):
    zz, yy, xx = np.meshgrid(*[np.arange(s) - s // 2 for s in shape], indexing="ij")
    g = np.exp(-(xx**2 + yy**2 + zz**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def beads(shape, n=10, seed=0):
    rng = np.random.default_rng(seed)
    vol = np.zeros(shape, dtype=np.float32)
    for _ in range(n):
        z, y, x = (rng.integers(5, s - 5) for s in shape)
        vol[z, y, x] = rng.uniform(50, 200)
    return vol


def blur(truth, psf):
    shape = truth.shape
    pad = np.zeros(shape)
    pz, py, px = psf.shape
    pad[:pz, :py, :px] = psf
    pad = np.roll(pad, (-(pz // 2), -(py // 2), -(px // 2)), axis=(0, 1, 2))
    return np.fft.irfftn(np.fft.rfftn(truth) * np.fft.rfftn(pad),
                         s=shape, axes=(0, 1, 2)).astype(np.float32)


def corr(a, b):
    a, b = a.ravel() - a.mean(), b.ravel() - b.mean()
    return float((a @ b) / np.sqrt((a @ a) * (b @ b)))


def test_bp_shapes_and_dc_gain():
    psf = gaussian_psf((9, 9, 9), 1.5)
    for method in ("wiener", "butterworth", "wiener-butterworth"):
        bp = gen_backprojector(psf, method=method)
        assert bp.shape == psf.shape
        np.testing.assert_allclose(bp.sum(), 1.0, atol=0.05)


def test_wb_accelerates_rl():
    shape = (32, 32, 32)
    truth = beads(shape, n=8, seed=1)
    psf = gaussian_psf((11, 11, 11), 1.8)
    img = blur(truth, psf)

    trad1 = decon_singleview(img, psf, n_iters=1)
    trad2 = decon_singleview(img, psf, n_iters=2)
    bp = gen_backprojector(psf, method="wiener-butterworth", alpha=0.05, beta=0.2, n=8)
    wb1 = decon_singleview(img, psf, n_iters=1, psf_bp=bp)
    wb2 = decon_singleview(img, psf, n_iters=2, psf_bp=bp)

    c_t1, c_t2 = corr(trad1, truth), corr(trad2, truth)
    c_wb1, c_wb2 = corr(wb1, truth), corr(wb2, truth)
    # each WB iteration is worth more than a traditional one
    assert c_wb1 > c_t1 + 0.005, (c_wb1, c_t1)
    assert c_wb2 > c_t2 + 0.005, (c_wb2, c_t2)


def test_unknown_method_raises():
    psf = gaussian_psf((5, 5, 5), 1.0)
    try:
        gen_backprojector(psf, method="nope")
        assert False
    except ValueError:
        pass
