import numpy as np
import jax.numpy as jnp

from microimagelib_tpu.models.deconvolution import (
    SMALLVALUE,
    decon_dualview,
    decon_singleview,
    gen_otf,
    rl_decon_dual,
    rl_decon_single,
)


def gaussian_psf(shape, sigma):
    zz, yy, xx = np.meshgrid(*[np.arange(s) - s // 2 for s in shape], indexing="ij")
    g = np.exp(-(xx**2 + yy**2 + zz**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def beads_volume(shape, n=12, seed=0):
    rng = np.random.default_rng(seed)
    vol = np.zeros(shape, dtype=np.float32)
    for _ in range(n):
        z, y, x = (rng.integers(4, s - 4) for s in shape)
        vol[z, y, x] = rng.uniform(50, 200)
    return vol


def np_rl_single(img, psf, n_iters, const_initial=False):
    """NumPy oracle reproducing the reference loop with normalized FFTs
    (reference:src/api_subfunc.cu:3404-3416)."""
    shape = img.shape
    psf = psf / psf.sum()
    # circular pad to origin
    pad = np.zeros(shape, dtype=np.float64)
    pz, py, px = psf.shape
    pad[:pz, :py, :px] = psf
    pad = np.roll(pad, (-(pz // 2), -(py // 2), -(px // 2)), axis=(0, 1, 2))
    otf = np.fft.rfftn(pad)
    bp = psf[::-1, ::-1, ::-1]
    pad2 = np.zeros(shape, dtype=np.float64)
    pad2[:pz, :py, :px] = bp
    pad2 = np.roll(pad2, (-(pz // 2), -(py // 2), -(px // 2)), axis=(0, 1, 2))
    otf_bp = np.fft.rfftn(pad2)
    img = np.maximum(img.astype(np.float64), SMALLVALUE)
    est = np.full(shape, img.sum()) if const_initial else img.copy()
    for _ in range(n_iters):
        fwd = np.fft.irfftn(np.fft.rfftn(est) * otf, s=shape)
        ratio = img / fwd
        upd = np.fft.irfftn(np.fft.rfftn(ratio) * otf_bp, s=shape)
        est = np.maximum(est * upd, SMALLVALUE)
    return est


def test_gen_otf_dc_is_one():
    psf = gaussian_psf((9, 9, 9), 1.5)
    otf = np.asarray(gen_otf(jnp.asarray(psf), (16, 16, 16)))
    np.testing.assert_allclose(otf[0, 0, 0], 1.0, atol=1e-5)


def test_rl_single_matches_numpy_oracle():
    shape = (16, 16, 16)
    truth = beads_volume(shape, n=5)
    psf = gaussian_psf((7, 7, 7), 1.2)
    # blur
    pad = np.zeros(shape)
    pad[:7, :7, :7] = psf
    pad = np.roll(pad, (-3, -3, -3), axis=(0, 1, 2))
    img = np.fft.irfftn(np.fft.rfftn(truth) * np.fft.rfftn(pad), s=shape).astype(np.float32)

    otf = gen_otf(jnp.asarray(psf), shape)
    otf_bp = gen_otf(jnp.asarray(psf[::-1, ::-1, ::-1]), shape)
    est = np.asarray(rl_decon_single(jnp.asarray(img), otf, otf_bp, 8))
    oracle = np_rl_single(img, psf, 8)
    np.testing.assert_allclose(est, oracle, rtol=2e-3, atol=2e-3)


def test_rl_sharpens_monotonically():
    shape = (24, 24, 24)
    truth = beads_volume(shape, n=8)
    psf = gaussian_psf((9, 9, 9), 1.5)
    pad = np.zeros(shape)
    pad[:9, :9, :9] = psf
    pad = np.roll(pad, (-4, -4, -4), axis=(0, 1, 2))
    img = np.fft.irfftn(np.fft.rfftn(truth) * np.fft.rfftn(pad), s=shape).astype(np.float32)

    def corr(a, b):
        a, b = a.ravel() - a.mean(), b.ravel() - b.mean()
        return (a @ b) / np.sqrt((a @ a) * (b @ b))

    prev = corr(img, truth)
    for it in (4, 12):
        out = decon_singleview(img, psf, n_iters=it, tpu_friendly_fft=False)
        c = corr(out, truth)
        assert c > prev, f"iteration {it} did not sharpen: {c} <= {prev}"
        prev = c


def test_decon_singleview_shapes_and_pad():
    img = beads_volume((20, 24, 28), n=6) + 1.0
    psf = gaussian_psf((7, 7, 7), 1.3)
    rec = np.zeros(10)
    out = decon_singleview(img, psf, n_iters=3, records=rec)
    assert out.shape == img.shape
    assert rec[9] > 0


def test_unmatched_bp_equals_matched_when_flipped():
    img = beads_volume((16, 16, 16), n=4) + 1.0
    psf = gaussian_psf((7, 7, 7), 1.2)
    out_matched = decon_singleview(img, psf, n_iters=4)
    out_unmatched = decon_singleview(img, psf, n_iters=4, psf_bp=psf[::-1, ::-1, ::-1])
    np.testing.assert_allclose(out_matched, out_unmatched, rtol=1e-5, atol=1e-4)


def test_dualview_joint_beats_singleview_with_orthogonal_psfs():
    shape = (24, 24, 24)
    truth = beads_volume(shape, n=8, seed=3)
    # anisotropic PSFs: elongated along z for view A, along x for view B
    zz, yy, xx = np.meshgrid(*[np.arange(9) - 4 for _ in range(3)], indexing="ij")
    psf_a = np.exp(-(xx**2 + yy**2) / 2.0 - zz**2 / 18.0).astype(np.float32)
    psf_a /= psf_a.sum()
    psf_b = np.transpose(psf_a, (2, 1, 0)).copy()

    def blur(t, p):
        pad = np.zeros(shape)
        pad[:9, :9, :9] = p
        pad = np.roll(pad, (-4, -4, -4), axis=(0, 1, 2))
        return np.fft.irfftn(np.fft.rfftn(t) * np.fft.rfftn(pad), s=shape).astype(np.float32)

    img_a, img_b = blur(truth, psf_a), blur(truth, psf_b)

    def corr(a, b):
        a, b = a.ravel() - a.mean(), b.ravel() - b.mean()
        return (a @ b) / np.sqrt((a @ a) * (b @ b))

    single = decon_singleview(img_a, psf_a, n_iters=10)
    joint = decon_dualview(img_a, img_b, psf_a, psf_b, n_iters=10)
    assert corr(joint, truth) > corr(single, truth)


def test_dualview_size_mismatch_raises():
    img_a = np.ones((8, 8, 8), np.float32)
    img_b = np.ones((8, 8, 9), np.float32)
    psf = gaussian_psf((5, 5, 5), 1.0)
    try:
        decon_dualview(img_a, img_b, psf, psf, n_iters=1)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_const_initial_runs():
    img = beads_volume((16, 16, 16), n=4) + 1.0
    psf = gaussian_psf((5, 5, 5), 1.0)
    out = decon_singleview(img, psf, n_iters=3, const_initial=True)
    oracle = np_rl_single(np.maximum(img, SMALLVALUE), psf, 3, const_initial=True)
    np.testing.assert_allclose(out, oracle, rtol=5e-3, atol=5e-3)


def np_rl_dual(img_a, img_b, psf_a, psf_b, n_iters):
    """NumPy oracle for the dual-view loop (A then B per iteration,
    reference:src/api_subfunc.cu:3634-3660)."""
    shape = img_a.shape

    def otf_of(p):
        pad = np.zeros(shape, dtype=np.float64)
        pz, py, px = p.shape
        pad[:pz, :py, :px] = p / p.sum()
        pad = np.roll(pad, (-(pz // 2), -(py // 2), -(px // 2)), axis=(0, 1, 2))
        return np.fft.rfftn(pad)

    otf_a, otf_b = otf_of(psf_a), otf_of(psf_b)
    bp_a, bp_b = otf_of(psf_a[::-1, ::-1, ::-1]), otf_of(psf_b[::-1, ::-1, ::-1])
    a = np.maximum(img_a.astype(np.float64), SMALLVALUE)
    b = np.maximum(img_b.astype(np.float64), SMALLVALUE)
    est = (a + b) * 0.5

    def half(est, img, otf, bp):
        fwd = np.fft.irfftn(np.fft.rfftn(est) * otf, s=shape)
        upd = np.fft.irfftn(np.fft.rfftn(img / fwd) * bp, s=shape)
        return np.maximum(est * upd, SMALLVALUE)

    for _ in range(n_iters):
        est = half(est, a, otf_a, bp_a)
        est = half(est, b, otf_b, bp_b)
    return est


def test_rl_dual_matches_numpy_oracle():
    shape = (16, 16, 16)
    truth = beads_volume(shape, n=5, seed=7)
    psf_a = gaussian_psf((7, 7, 7), 1.2)
    psf_b = np.transpose(psf_a, (2, 1, 0)).copy()

    def blur(t, p):
        pad = np.zeros(shape)
        pad[:7, :7, :7] = p
        pad = np.roll(pad, (-3, -3, -3), axis=(0, 1, 2))
        return np.fft.irfftn(np.fft.rfftn(t) * np.fft.rfftn(pad), s=shape, axes=(0, 1, 2)).astype(np.float32)

    img_a, img_b = blur(truth, psf_a), blur(truth, psf_b)
    otf_a = gen_otf(jnp.asarray(psf_a), shape)
    otf_b = gen_otf(jnp.asarray(psf_b), shape)
    bp_a = gen_otf(jnp.asarray(psf_a[::-1, ::-1, ::-1]), shape)
    bp_b = gen_otf(jnp.asarray(psf_b[::-1, ::-1, ::-1]), shape)
    est = np.asarray(rl_decon_dual(jnp.asarray(img_a), jnp.asarray(img_b),
                                   otf_a, otf_b, bp_a, bp_b, 6))
    oracle = np_rl_dual(img_a, img_b, psf_a, psf_b, 6)
    np.testing.assert_allclose(est, oracle, rtol=3e-3, atol=3e-3)


def test_classic_tiff_4gb_guard():
    from microimagelib_tpu.io.tiff import TiffError, _build_classic_tiff_pages

    # fake page list exceeding 4 GB without allocating it
    class FakeBytes:
        def __len__(self):
            return 2**31

    try:
        _build_classic_tiff_pages([FakeBytes(), FakeBytes()], 1, 1, 32, 3)
        assert False, "expected TiffError"
    except TiffError as e:
        assert "4 GB" in str(e)


def test_rl_accel_converges_faster(monkeypatch):
    """MIL_RL_ACCEL=1 (Biggs-Andrews vector extrapolation, a capability
    the reference lacks) reaches a better restoration than plain RL at
    the same iteration count, on both the FFT and separable-conv
    routes."""
    shape = (16, 16, 128)
    truth = beads_volume(shape, n=10, seed=3)
    psf = gaussian_psf((9, 9, 9), 1.6)
    otf = gen_otf(jnp.asarray(psf), shape)
    otf_bp = gen_otf(jnp.asarray(psf[::-1, ::-1, ::-1]), shape)
    img = jnp.asarray(np.fft.irfftn(np.fft.rfftn(truth)
                                    * np.asarray(otf), s=shape)
                      .astype(np.float32) + 0.5)

    plain = np.asarray(rl_decon_single(img, otf, otf_bp, 8))
    monkeypatch.setenv("MIL_RL_ACCEL", "1")
    accel = np.asarray(rl_decon_single(img, otf, otf_bp, 8))
    err_p = np.linalg.norm(plain - truth)
    err_a = np.linalg.norm(accel - truth)
    assert np.isfinite(accel).all() and accel.min() >= SMALLVALUE
    assert err_a < err_p, (err_a, err_p)

    # separable route (forced; interpret off-TPU)
    monkeypatch.setenv("MIL_CONV_SEP", "1")
    accel_sep = np.asarray(rl_decon_single(img, otf, otf_bp, 8, psf=psf))
    np.testing.assert_allclose(accel_sep, accel, rtol=2e-4,
                               atol=2e-4 * accel.max())


def test_gen_otf_cache(monkeypatch):
    """Repeated gen_otf with identical content/grid returns the cached
    device OTF; different content or MIL_OTF_CACHE=0 misses."""
    from microimagelib_tpu.models.deconvolution import _OTF_CACHE

    _OTF_CACHE.clear()
    psf = gaussian_psf((7, 7, 7), 1.3)
    a = gen_otf(jnp.asarray(psf), (16, 16, 128))
    b = gen_otf(jnp.asarray(psf.copy()), (16, 16, 128))
    assert b is a
    c = gen_otf(jnp.asarray(psf * 2.0), (16, 16, 128))   # normalize makes
    np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=1e-6)
    assert c is not a                                     # different bytes
    d = gen_otf(jnp.asarray(psf), (16, 16, 64))
    assert d is not a
    monkeypatch.setenv("MIL_OTF_CACHE", "0")
    e = gen_otf(jnp.asarray(psf), (16, 16, 128))
    assert e is not a
    np.testing.assert_allclose(np.asarray(e), np.asarray(a), atol=0)


def test_rl_auto_stop():
    """stop_tol early-stops once the relative L1 update falls below it:
    the result sits between the 3-iteration and full-count outputs (it
    stopped early) and equals the fixed-count run when tol is tiny."""
    shape = (16, 16, 128)
    truth = beads_volume(shape, n=10, seed=4)
    psf = gaussian_psf((9, 9, 9), 1.4)
    otf = gen_otf(jnp.asarray(psf), shape)
    otf_bp = gen_otf(jnp.asarray(psf[::-1, ::-1, ::-1]), shape)
    img = jnp.asarray(np.fft.irfftn(np.fft.rfftn(truth)
                                    * np.asarray(otf), s=shape)
                      .astype(np.float32) + 0.5)
    full = np.asarray(rl_decon_single(img, otf, otf_bp, 40))
    tiny = np.asarray(rl_decon_single(img, otf, otf_bp, 40, stop_tol=1e-9))
    np.testing.assert_array_equal(tiny, full)     # tol never triggers
    early = np.asarray(rl_decon_single(img, otf, otf_bp, 40, stop_tol=5e-3))
    few = np.asarray(rl_decon_single(img, otf, otf_bp, 3))
    d_early = np.linalg.norm(early - full)
    d_few = np.linalg.norm(few - full)
    assert 0 < d_early < d_few, (d_early, d_few)  # stopped early, past it=3
    # env knob reaches the loop too
    import os
    os.environ["MIL_RL_STOP_TOL"] = "5e-3"
    try:
        via_env = np.asarray(rl_decon_single(img, otf, otf_bp, 40))
        np.testing.assert_array_equal(via_env, early)
    finally:
        del os.environ["MIL_RL_STOP_TOL"]
