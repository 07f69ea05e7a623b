"""Separable compact-PSF convolution (ops/conv_sep.py) vs the FFT conv.

The planned kernel must match irfftn(rfftn(v) * gen_otf(psf)) — the RL
loops' conv semantics (reference:src/api_subfunc.cu:3404-3416) — to
matmul precision, including z wraparound, even-size (asymmetric) PSF
centers, and higher separation ranks; and the RL decon built on it must
match the FFT-path RL decon. On the CPU backend the kernel runs in
pallas interpret mode."""

import jax.numpy as jnp
import numpy as np
import pytest

from microimagelib_tpu.models.deconvolution import (
    gen_otf,
    rl_decon_dual,
    rl_decon_single,
)
from microimagelib_tpu.ops.conv_sep import (
    conv3_sep,
    plan_rl_fused,
    plan_sep,
    plan_sep_pair,
    rl_iter_fused,
)

SHAPE = (16, 16, 128)


def gauss3(p, s):
    z = np.arange(p[0]) - p[0] // 2
    y = np.arange(p[1]) - p[1] // 2
    x = np.arange(p[2]) - p[2] // 2
    k = np.exp(-z[:, None, None] ** 2 / (2 * s[0] ** 2)
               - y[None, :, None] ** 2 / (2 * s[1] ** 2)
               - x[None, None, :] ** 2 / (2 * s[2] ** 2))
    return (k / k.sum()).astype(np.float32)


def fft_conv(v, psf, shape):
    otf = gen_otf(jnp.asarray(psf, jnp.float32), shape)
    return np.asarray(jnp.fft.irfftn(jnp.fft.rfftn(jnp.asarray(v)) * otf,
                                     s=shape))


@pytest.mark.parametrize("psf", [
    gauss3((9, 9, 9), (1.5, 2.0, 1.0)),                      # rank 1, odd
    gauss3((8, 8, 8), (1.2, 1.2, 1.2)),                      # even center
    gauss3((7, 9, 11), (1.0, 1.5, 2.0))
    + 0.3 * gauss3((7, 9, 11), (2.0, 1.0, 0.8)),             # rank >= 2
    gauss3((17, 5, 5), (2.5, 1.0, 1.0)),                     # z-support 8
], ids=["odd-gauss", "even-gauss", "rank2", "long-z"])
def test_conv_matches_fft(rng, psf):
    v = (rng.random(SHAPE) * 100).astype(np.float32)
    plan = plan_sep(psf, SHAPE)
    assert plan is not None
    ref = fft_conv(v, psf, SHAPE)
    out = np.asarray(conv3_sep(jnp.asarray(v), plan))
    np.testing.assert_allclose(out, ref, atol=2e-5 * np.abs(ref).max())


def test_modes_ratio_update(rng):
    v = (rng.random(SHAPE) * 100).astype(np.float32)
    aux = (rng.random(SHAPE) + 0.5).astype(np.float32)
    psf = gauss3((9, 9, 9), (1.5, 1.5, 1.5))
    plan = plan_sep(psf, SHAPE)
    c = fft_conv(v, psf, SHAPE)
    r = np.asarray(conv3_sep(jnp.asarray(v), plan, aux=jnp.asarray(aux),
                             mode="ratio"))
    u = np.asarray(conv3_sep(jnp.asarray(v), plan, aux=jnp.asarray(aux),
                             mode="update", smallvalue=20.0))
    np.testing.assert_allclose(r, aux / c, atol=2e-5 * np.abs(aux / c).max())
    np.testing.assert_allclose(u, np.maximum(aux * c, 20.0),
                               atol=2e-5 * np.abs(aux * c).max())
    with pytest.raises(ValueError):
        conv3_sep(jnp.asarray(v), plan, mode="ratio")


def test_plan_rejections(rng):
    g9 = gauss3((9, 9, 9), (1.5, 1.5, 1.5))
    assert plan_sep(g9, (16, 16, 100)) is None        # nx % 128 != 0
    assert plan_sep(g9, (15, 16, 128)) is None        # nz % zb != 0
    # round 4 removed the a,b <= zb support cap (see test_long_z_support)
    # but a history window that cannot fit the VMEM budget stays refused
    assert plan_sep(gauss3((21, 5, 5), (4.0, 1.0, 1.0)), (32, 16, 128),
                    vmem_budget=1 << 18) is None
    noise = rng.random((9, 9, 9)).astype(np.float32)  # full rank
    assert plan_sep(noise, SHAPE) is None
    assert plan_sep(np.zeros((5, 5, 5), np.float32), SHAPE) is None
    # non-separable-but-low-rank is accepted when rank <= max_rank covers it
    assert plan_sep(g9 + 1e-3 * np.roll(g9, 1, 0), SHAPE) is not None


@pytest.mark.parametrize("shape,psf_shape,zb", [
    ((32, 16, 128), (21, 5, 5), 8),    # la = lb = 2 lookahead
    ((32, 16, 128), (17, 5, 5), 4),    # a = b = 8 at zb 4 (la = lb = 2)
    ((24, 16, 128), (31, 5, 5), 8),    # z reach 15 vs nz 24 (la = lb = 2)
], ids=["z21", "z17-zb4", "z31"])
def test_long_z_support(rng, shape, psf_shape, zb):
    """The generalized history-window pipeline (VERDICT r3 #1b): z
    supports beyond one slab — the class the round-3 kernel refused —
    stay exact vs the FFT oracle, including circular z wrap."""
    psf = gauss3(psf_shape, (psf_shape[0] / 5.0, 1.0, 1.0))
    plan = plan_sep(psf, shape, zb=zb)
    assert plan is not None
    v = (rng.random(shape) * 100).astype(np.float32)
    ref = fft_conv(v, psf, shape)
    out = np.asarray(conv3_sep(jnp.asarray(v), plan))
    np.testing.assert_allclose(out, ref, atol=2e-5 * np.abs(ref).max())


def tilted_gauss(p, sl=4.0, ss=1.2, st=1.2, plane="zx"):
    """Anisotropic Gaussian tilted 45 deg in ``plane`` — the realistic
    light-sheet detection-PSF class the round-3 planner refused
    (VERDICT r3 #1: measured diSPIM PSFs are tilted with z extents well
    beyond one slab)."""
    z = np.arange(p[0]) - p[0] // 2
    y = np.arange(p[1]) - p[1] // 2
    x = np.arange(p[2]) - p[2] // 2
    zz, yy, xx = np.meshgrid(z, y, x, indexing="ij")
    g = xx if plane == "zx" else yy
    t = yy if plane == "zx" else xx
    u, w = (g + zz) / np.sqrt(2.0), (g - zz) / np.sqrt(2.0)
    k = np.exp(-u ** 2 / (2 * sl ** 2) - w ** 2 / (2 * ss ** 2)
               - t ** 2 / (2 * st ** 2))
    return (k / k.sum()).astype(np.float32)


@pytest.mark.parametrize("plane", ["zx", "zy"])
def test_tilted_psf_slab_align_conv(rng, plane):
    """Tilted-PSF planning (VERDICT r3 #1): slab_align recentering +
    per-tap emit rolls plan a 45-deg anisotropic Gaussian with 17-voxel
    z extent at low rank, and the conv stays exact vs the FFT oracle."""
    from microimagelib_tpu.ops.conv_sep import slab_align

    shape = (32, 32, 128) if plane == "zx" else (32, 128, 128)
    psf = tilted_gauss((17, 9, 25) if plane == "zx" else (17, 25, 9),
                       plane=plane)
    _, rz = slab_align(psf)
    assert rz.any()   # the drift really is fitted
    plan = plan_sep(psf, shape, align=True, tol=1e-4)
    assert plan is not None
    assert plan.meta[10] is not None   # per-tap rolls active
    v = (rng.random(shape) * 100).astype(np.float32)
    ref = fft_conv(v, psf, shape)
    out = np.asarray(conv3_sep(jnp.asarray(v), plan))
    np.testing.assert_allclose(out, ref, atol=2e-4 * np.abs(ref).max())


def test_tilted_pair_prefers_aligned_rank(rng):
    """plan_sep_pair tries both raw and slab-aligned candidates and
    keeps the lower-rank one; for a strongly tilted pair that is the
    aligned plan (rolls present), and the banded round-trip contract
    (sigma_bp = -sigma_fwd) still holds."""
    psf = tilted_gauss((17, 9, 25))
    bp = np.ascontiguousarray(psf[::-1, ::-1, ::-1])
    pair = plan_sep_pair(psf, bp, (32, 32, 256), tol=1e-4)
    assert pair is not None
    fwd, bpp = pair
    assert fwd.meta[10] is not None and bpp.meta[10] is not None
    assert (fwd.meta[8], fwd.meta[9]) == (-bpp.meta[8], -bpp.meta[9])
    v = (rng.random((32, 32, 256)) * 100).astype(np.float32)
    ref = fft_conv(v, psf, (32, 32, 256))
    out = np.asarray(conv3_sep(jnp.asarray(v), fwd))
    np.testing.assert_allclose(
        out, np.roll(ref, (fwd.meta[8], fwd.meta[9]), axis=(1, 2)),
        atol=2e-4 * np.abs(ref).max())


def _rl_ref(img, psf, psf_bp, n_iters, dual_b=None, psf_b=None,
            psf_bp_b=None, const_initial=False):
    shape = img.shape
    otf = gen_otf(jnp.asarray(psf), shape)
    otf_bp = gen_otf(jnp.asarray(psf_bp), shape)
    if dual_b is None:
        return np.asarray(rl_decon_single(jnp.asarray(img), otf, otf_bp,
                                          n_iters, const_initial))
    otf_b = gen_otf(jnp.asarray(psf_b), shape)
    otf_bp_b = gen_otf(jnp.asarray(psf_bp_b), shape)
    return np.asarray(rl_decon_dual(jnp.asarray(img), jnp.asarray(dual_b),
                                    otf, otf_b, otf_bp, otf_bp_b, n_iters,
                                    const_initial))


@pytest.mark.parametrize("fused", ["0", "1"])
@pytest.mark.parametrize("const_initial", [False, True])
def test_rl_single_sep_matches_fft(rng, monkeypatch, const_initial, fused):
    img = (rng.random(SHAPE) * 100 + 1).astype(np.float32)
    psf = gauss3((9, 9, 9), (1.5, 1.2, 1.8))
    ref = _rl_ref(img, psf, psf[::-1, ::-1, ::-1], 5,
                  const_initial=const_initial)
    monkeypatch.setenv("MIL_CONV_SEP", "1")  # force off-TPU (interpret)
    monkeypatch.setenv("MIL_CONV_SEP_FUSED", fused)
    out = np.asarray(rl_decon_single(jnp.asarray(img), None, None, 5,
                                     const_initial, psf=psf))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4 * ref.max())


def test_rl_single_sep_tilted_psf(rng, monkeypatch):
    """End-to-end RL decon with a TILTED measured-class PSF takes the
    slab-aligned separable route (no explicit tol/env tuning — the
    default tol cascade accepts it) and matches the FFT-path RL to the
    decon-level tolerance (VERDICT r3 #1: the headline path must apply
    to the reference's realistic PSF class)."""
    shape = (32, 32, 128)
    img = (rng.random(shape) * 100 + 1).astype(np.float32)
    psf = tilted_gauss((17, 9, 25))
    bp = np.ascontiguousarray(psf[::-1, ::-1, ::-1])
    ref = _rl_ref(img, psf, bp, 4)
    monkeypatch.setenv("MIL_CONV_SEP", "1")  # force off-TPU (interpret)
    from microimagelib_tpu.models import deconvolution as dc

    monkeypatch.setattr(dc, "_SEP_PLAN_CACHE", {})
    out = np.asarray(rl_decon_single(jnp.asarray(img), None, None, 4,
                                     psf=psf))
    # the sep route really was taken (cache holds a planned pair)
    route = next(iter(dc._SEP_PLAN_CACHE.values()))[0]
    assert route is not None and route[0] == "pair"
    assert route[1][0].meta[10] is not None
    np.testing.assert_allclose(out, ref, rtol=5e-4, atol=5e-4 * ref.max())


def test_rl_single_sep_unmatched_bp(rng, monkeypatch):
    img = (rng.random(SHAPE) * 100 + 1).astype(np.float32)
    psf = gauss3((9, 9, 9), (1.5, 1.2, 1.8))
    bp = gauss3((7, 7, 7), (1.0, 1.0, 1.0))
    ref = _rl_ref(img, psf, bp, 4)
    monkeypatch.setenv("MIL_CONV_SEP", "1")
    out = np.asarray(rl_decon_single(jnp.asarray(img), None, None, 4,
                                     psf=psf, psf_bp=bp))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4 * ref.max())


@pytest.mark.parametrize("fused", ["0", "1"])
def test_rl_dual_sep_matches_fft(rng, monkeypatch, fused):
    img_a = (rng.random(SHAPE) * 100 + 1).astype(np.float32)
    img_b = (rng.random(SHAPE) * 100 + 1).astype(np.float32)
    psf_a = gauss3((9, 9, 9), (1.5, 1.2, 1.8))
    psf_b = gauss3((9, 9, 9), (1.0, 1.8, 1.2))
    ref = _rl_ref(img_a, psf_a, psf_a[::-1, ::-1, ::-1], 3, dual_b=img_b,
                  psf_b=psf_b, psf_bp_b=psf_b[::-1, ::-1, ::-1])
    monkeypatch.setenv("MIL_CONV_SEP", "1")
    monkeypatch.setenv("MIL_CONV_SEP_FUSED", fused)
    out = np.asarray(rl_decon_dual(jnp.asarray(img_a), jnp.asarray(img_b),
                                   None, None, None, None, 3,
                                   psf_a=psf_a, psf_b=psf_b))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4 * ref.max())


@pytest.mark.parametrize("shape", [(16, 16, 128), (32, 16, 128),
                                   (64, 8, 128)])
def test_rl_iter_fused_matches_two_call(rng, shape):
    """The one-pallas-call RL iteration equals the composed
    ratio/update two-call path — same circulants, same taps; only the
    z-FMA/xy-matmul rounding ORDER differs (the two-call kernel runs
    z-first since round 4) — across grid sizes incl. the g=2 full-wrap
    case."""
    psf = gauss3((9, 9, 9), (1.5, 1.2, 1.8))
    bp = np.ascontiguousarray(psf[::-1, ::-1, ::-1])
    est = jnp.asarray((rng.random(shape) * 100 + 1).astype(np.float32))
    img = jnp.asarray((rng.random(shape) * 100 + 1).astype(np.float32))
    fused = plan_rl_fused(psf, bp, shape)
    assert fused is not None
    pf, pb = plan_sep(psf, shape), plan_sep(bp, shape)
    ratio = conv3_sep(est, pf, aux=img, mode="ratio")
    ref = np.asarray(conv3_sep(ratio, pb, aux=est, mode="update",
                               smallvalue=0.01))
    out = np.asarray(rl_iter_fused(est, img, fused))
    np.testing.assert_allclose(out, ref, atol=2e-5 * np.abs(ref).max())


def test_rl_fused_plan_rejects_when_vmem_tight(rng):
    psf = gauss3((9, 9, 9), (1.5, 1.2, 1.8))
    bp = np.ascontiguousarray(psf[::-1, ::-1, ::-1])
    assert plan_rl_fused(psf, bp, (16, 16, 128),
                         vmem_budget=1 << 18) is None
    # a budget that fits zb=4 but not zb=8 picks the smaller slab (and
    # the result still matches the two-call path)
    tight = plan_rl_fused(psf, bp, (16, 16, 128), vmem_budget=1 << 20)
    assert tight is not None and tight.meta[0] == 4
    est = jnp.asarray((rng.random((16, 16, 128)) * 100 + 1)
                      .astype(np.float32))
    img = jnp.asarray((rng.random((16, 16, 128)) * 100 + 1)
                      .astype(np.float32))
    pf, pb = plan_sep(psf, (16, 16, 128)), plan_sep(bp, (16, 16, 128))
    ratio = conv3_sep(est, pf, aux=img, mode="ratio")
    ref = np.asarray(conv3_sep(ratio, pb, aux=est, mode="update",
                               smallvalue=0.01))
    out = np.asarray(rl_iter_fused(est, img, tight))
    np.testing.assert_allclose(out, ref, atol=2e-5 * np.abs(ref).max())
    # rank-4 pair still fits at this small shape
    r4 = gauss3((7, 9, 11), (1.0, 1.5, 2.0)) \
        + 0.3 * gauss3((7, 9, 11), (2.0, 1.0, 0.8))
    assert plan_rl_fused(r4, np.ascontiguousarray(r4[::-1, ::-1, ::-1]),
                         (16, 16, 128)) is not None


BANDED_SHAPE = (8, 256, 256)


def _asym_psf(rng):
    """Asymmetric even/odd box, rank <= 2 — exercises a != b bands and
    the wrap window tiles on both axes."""
    def r1():
        return np.einsum("i,j,k->ijk", rng.random(5), rng.random(8),
                         rng.random(6))
    p = (r1() + 0.3 * r1()).astype(np.float32)
    return p / p.sum()


def test_banded_pair_plan_layout(rng):
    """plan_sep_pair picks banded xy layouts with opposite frame shifts:
    fwd blocks are causal windows (t0 = -1), bp anticausal (t0 = 0), and
    sigma_bp = -sigma_fwd so one RL iteration returns to frame 0."""
    psf = _asym_psf(rng)
    bp = np.ascontiguousarray(psf[::-1, ::-1, ::-1])
    fwd, bpp = plan_sep_pair(psf, bp, BANDED_SHAPE)
    _, _, _, rank, _, _, bx, by, sy, sx, _ = fwd.meta
    assert (bx, by) == (-1, -1) and sx > 0 and sy > 0
    assert fwd.cxh.shape == (rank, 2, 256, 128)
    assert fwd.cyh.shape == (rank, 2, 128, 256)
    _, _, _, _, _, _, bx2, by2, sy2, sx2, _ = bpp.meta
    assert (bx2, by2) == (0, 0) and (sy2, sx2) == (-sy, -sx)
    # standalone plans stay dense (sigma 0 cannot band a centered PSF)
    solo = plan_sep(psf, BANDED_SHAPE)
    assert solo.meta[6:] == (None, None, 0, 0, None)
    assert solo.cxh.shape == (solo.meta[3], 256, 256)


def test_banded_pair_conv_exact(rng):
    """Each banded stage matches the FFT conv in its planned frame: the
    fwd output is the conv rolled by (sy, sx); the bp stage consumes a
    rolled input and lands back in frame 0."""
    psf = _asym_psf(rng)
    bp = np.ascontiguousarray(psf[::-1, ::-1, ::-1])
    fwd, bpp = plan_sep_pair(psf, bp, BANDED_SHAPE)
    sy, sx = fwd.meta[8:10]
    v = (rng.random(BANDED_SHAPE) * 100).astype(np.float32)
    ref = fft_conv(v, psf, BANDED_SHAPE)
    out = np.asarray(conv3_sep(jnp.asarray(v), fwd))
    np.testing.assert_allclose(out, np.roll(ref, (sy, sx), axis=(1, 2)),
                               atol=2e-5 * np.abs(ref).max())
    ref2 = fft_conv(v, bp, BANDED_SHAPE)
    vin = jnp.roll(jnp.asarray(v), (sy, sx), axis=(1, 2))
    out2 = np.asarray(conv3_sep(vin, bpp))
    np.testing.assert_allclose(out2, ref2, atol=2e-5 * np.abs(ref2).max())


def test_banded_mixed_axis(rng):
    """ny unaligned to 128 keeps y dense while x bands — a pair plan may
    mix layouts per axis and stays exact (sy = 0 on the dense-only-
    because-unaligned axis still allows the x frame shift)."""
    shape = (8, 96, 256)
    psf = _asym_psf(rng)
    bp = np.ascontiguousarray(psf[::-1, ::-1, ::-1])
    fwd, bpp = plan_sep_pair(psf, bp, shape)
    assert fwd.meta[6] == -1 and fwd.meta[7] is None and fwd.meta[8] == 0
    sy, sx = fwd.meta[8:10]
    v = (rng.random(shape) * 100).astype(np.float32)
    ref = fft_conv(v, psf, shape)
    out = np.asarray(conv3_sep(jnp.asarray(v), fwd))
    np.testing.assert_allclose(out, np.roll(ref, sx, axis=2),
                               atol=2e-5 * np.abs(ref).max())
    ref2 = fft_conv(v, bp, shape)
    out2 = np.asarray(conv3_sep(jnp.roll(jnp.asarray(v), sx, axis=2), bpp))
    np.testing.assert_allclose(out2, ref2, atol=2e-5 * np.abs(ref2).max())


@pytest.mark.parametrize("fused", ["0", "1"])
def test_rl_banded_matches_fft(rng, monkeypatch, fused):
    """End-to-end RL on a banded-qualifying grid (the production 512^3
    configuration in miniature) vs the FFT-path oracle."""
    img = (rng.random(BANDED_SHAPE) * 100 + 1).astype(np.float32)
    psf = _asym_psf(rng)
    ref = _rl_ref(img, psf, psf[::-1, ::-1, ::-1], 4)
    monkeypatch.setenv("MIL_CONV_SEP", "1")
    monkeypatch.setenv("MIL_CONV_SEP_FUSED", fused)
    out = np.asarray(rl_decon_single(jnp.asarray(img), None, None, 4,
                                     psf=psf))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4 * ref.max())


def test_sep_auto_threshold(monkeypatch):
    """Auto engages on TPU only above the measured, shape-aware voxel
    floor: 2^24 baseline, grown by (ny+nx)*2^15 for elongated xy grids
    where the dense circulant matmuls cost more per voxel."""
    import microimagelib_tpu.utils.device as dev
    from microimagelib_tpu.models.deconvolution import _sep_plans

    monkeypatch.setattr(dev, "committed_platform", lambda arr=None: "tpu")
    psf = gauss3((9, 9, 9), (1.5, 1.5, 1.5))
    bp = psf[::-1, ::-1, ::-1]
    assert _sep_plans(psf, bp, (256, 256, 256)) is not None
    assert _sep_plans(psf, bp, (128, 256, 256)) is None   # 2^23 < floor
    assert _sep_plans(psf, bp, (128, 256, 512)) is None   # elongated 2^24
    assert _sep_plans(psf, bp, (128, 512, 512)) is not None  # 2^25
    monkeypatch.setenv("MIL_CONV_SEP_MIN_VOXELS", str(2 ** 30))
    assert _sep_plans(psf, bp, (512, 512, 512)) is None
    # env floor lowered: a z-long grid whose (ny+nx) term is already met
    monkeypatch.setenv("MIL_CONV_SEP_MIN_VOXELS", "0")
    assert _sep_plans(psf, bp, (512, 128, 128)) is not None


def test_psf_only_call_without_otfs_falls_back(rng, monkeypatch):
    """psf given, OTFs None, sep plan REFUSED (policy off) -> the entry
    builds the OTFs from the PSF instead of crashing."""
    img = (rng.random((16, 16, 100)) * 10 + 1).astype(np.float32)  # grid unsupported
    psf = gauss3((9, 9, 9), (1.5, 1.5, 1.5))
    monkeypatch.setenv("MIL_CONV_SEP", "1")
    out = np.asarray(rl_decon_single(jnp.asarray(img), None, None, 2, psf=psf))
    ref = _rl_ref(img, psf, psf[::-1, ::-1, ::-1], 2)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5 * ref.max())
    out_d = np.asarray(rl_decon_dual(jnp.asarray(img), jnp.asarray(img),
                                     None, None, None, None, 2,
                                     psf_a=psf, psf_b=psf))
    assert np.isfinite(out_d).all()


def test_sep_policy_gates(rng, monkeypatch):
    """Off by default on CPU (auto requires TPU); MIL_CONV_SEP=0 blocks the
    forced route; non-qualifying PSFs fall back to the FFT loop."""
    from microimagelib_tpu.models.deconvolution import _sep_plans

    psf = gauss3((9, 9, 9), (1.5, 1.5, 1.5))
    bp = psf[::-1, ::-1, ::-1]
    assert _sep_plans(psf, bp, SHAPE) is None            # auto: cpu backend
    monkeypatch.setenv("MIL_CONV_SEP", "0")
    assert _sep_plans(psf, bp, SHAPE) is None
    monkeypatch.setenv("MIL_CONV_SEP", "1")
    assert _sep_plans(psf, bp, SHAPE) is not None
    noise = rng.random((9, 9, 9)).astype(np.float32)
    assert _sep_plans(psf, noise, SHAPE) is None         # bp disqualifies
    # fallback still works end-to-end: psf given but grid unsupported
    img = (rng.random((16, 16, 100)) * 10 + 1).astype(np.float32)
    otf = gen_otf(jnp.asarray(psf), img.shape)
    otf_bp = gen_otf(jnp.asarray(bp), img.shape)
    a = np.asarray(rl_decon_single(jnp.asarray(img), otf, otf_bp, 2, psf=psf))
    b = np.asarray(rl_decon_single(jnp.asarray(img), otf, otf_bp, 2))
    np.testing.assert_allclose(a, b)
