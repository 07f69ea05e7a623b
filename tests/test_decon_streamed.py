"""Beyond-HBM decon tier: the host-staged streamed RL path must match the
HBM-resident jitted loop, and the auto memory probe must select it when
the working set exceeds the (artificially capped) budget."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from microimagelib_tpu.models.deconvolution import (
    decon_dualview,
    decon_singleview,
    gen_otf,
    rl_decon_dual,
    rl_decon_single,
    _resolve_mem_mode,
)
from microimagelib_tpu.models.decon_streamed import (
    _chunk_counts,
    np_gen_otf,
    np_pad_stack_edge,
    rl_decon_dual_streamed,
    rl_decon_single_streamed,
)
from microimagelib_tpu.ops.basics import flip3, pad_stack_edge


def beads(shape, seed=0):
    rng = np.random.default_rng(seed)
    img = np.zeros(shape, np.float32)
    n = 12
    idx = tuple(rng.integers(2, s - 2, n) for s in shape)
    img[idx] = rng.uniform(100, 900, n).astype(np.float32)
    return img


def gauss_psf(r=3, sigma=1.2):
    z, y, x = np.mgrid[-r:r + 1, -r:r + 1, -r:r + 1]
    g = np.exp(-(x * x + y * y + z * z) / (2 * sigma ** 2)).astype(np.float32)
    return g / g.sum()


def test_np_gen_otf_matches_jax():
    psf = gauss_psf()
    for grid in ((16, 16, 16), (16, 32, 16)):
        ref = np.asarray(gen_otf(jnp.asarray(psf), grid))
        got = np_gen_otf(psf, grid)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-7)
    # PSF larger than the grid exercises the alignsize branch
    big = gauss_psf(r=9)
    ref = np.asarray(gen_otf(jnp.asarray(big), (16, 16, 16)))
    got = np_gen_otf(big, (16, 16, 16))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-7)


def test_np_pad_stack_edge_matches_jax():
    img = beads((10, 12, 14), seed=1)
    ref = np.asarray(pad_stack_edge(jnp.asarray(img), (16, 16, 16)))
    np.testing.assert_array_equal(np_pad_stack_edge(img, (16, 16, 16)), ref)


@pytest.mark.parametrize("const_initial", [False, True])
def test_streamed_single_matches_resident(const_initial):
    img = np_pad_stack_edge(beads((16, 16, 16), seed=2), (16, 16, 16))
    psf = gauss_psf()
    otf = np_gen_otf(psf, img.shape)
    otf_bp = np_gen_otf(psf[::-1, ::-1, ::-1], img.shape)
    ref = np.asarray(rl_decon_single(jnp.asarray(img), jnp.asarray(otf),
                                     jnp.asarray(otf_bp), 6, const_initial))
    # tiny budget -> multiple chunks along both axes
    got = rl_decon_single_streamed(img, otf, otf_bp, 6, const_initial,
                                   budget_bytes=64 * 1024)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_streamed_dual_matches_resident():
    shape = (16, 16, 32)
    a = np_pad_stack_edge(beads((16, 16, 32), seed=3), shape)
    b = np_pad_stack_edge(beads((16, 16, 32), seed=4), shape)
    pa, pb = gauss_psf(sigma=1.0), gauss_psf(sigma=1.5)
    otf_a, otf_b = np_gen_otf(pa, shape), np_gen_otf(pb, shape)
    bpa = np_gen_otf(pa[::-1, ::-1, ::-1], shape)
    bpb = np_gen_otf(pb[::-1, ::-1, ::-1], shape)
    ref = np.asarray(rl_decon_dual(jnp.asarray(a), jnp.asarray(b),
                                   jnp.asarray(otf_a), jnp.asarray(otf_b),
                                   jnp.asarray(bpa), jnp.asarray(bpb), 5))
    got = rl_decon_dual_streamed(a, b, otf_a, otf_b, bpa, bpb, 5,
                                 budget_bytes=128 * 1024)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_chunk_counts():
    # unknown budget -> single chunk; tiny budget -> chunked; huge -> 1
    assert _chunk_counts((64, 64, 64), None) == (1, 1)
    nz, ny = _chunk_counts((64, 64, 64), 256 * 1024)
    assert nz > 1 and ny > 1 and 64 % nz == 0 and 64 % ny == 0
    assert _chunk_counts((64, 64, 64), 1 << 40) == (1, 1)
    # budget smaller than one slice still terminates at the axis extent
    assert _chunk_counts((8, 8, 8), 16)[0] == 8


def test_auto_probe_selects_streaming(monkeypatch):
    img = beads((24, 24, 24), seed=5)
    psf = gauss_psf()
    rec1 = np.zeros(10)
    ref = decon_singleview(img, psf, n_iters=5, mem_mode=1, records=rec1)
    assert rec1[0] == 1
    # cap the budget below the ~6x working set of the 24^3->32^3 grid
    monkeypatch.setenv("MIL_HBM_BUDGET_MB", "0.25")
    rec2 = np.zeros(10)
    got = decon_singleview(img, psf, n_iters=5, mem_mode=-1, records=rec2)
    assert rec2[0] == 2
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_auto_probe_selects_streaming_dual(monkeypatch):
    a, b = beads((16, 16, 16), seed=6), beads((16, 16, 16), seed=7)
    pa, pb = gauss_psf(sigma=1.0), gauss_psf(sigma=1.4)
    ref = decon_dualview(a, b, pa, pb, n_iters=4, mem_mode=1)
    monkeypatch.setenv("MIL_HBM_BUDGET_MB", "0.05")
    rec = np.zeros(10)
    got = decon_dualview(a, b, pa, pb, n_iters=4, mem_mode=-1, records=rec)
    assert rec[0] == 2
    # chunked vs fused FFT association differs in f32 rounding, and the RL
    # ratio amplifies it where fwd is tiny: allow ~1% on the worst voxels
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_mem_mode_zero_runs_on_cpu():
    img = beads((16, 16, 16), seed=8)
    psf = gauss_psf()
    rec = np.zeros(10)
    out0 = decon_singleview(img, psf, n_iters=4, mem_mode=0, records=rec)
    assert rec[0] == 0
    out1 = decon_singleview(img, psf, n_iters=4, mem_mode=1)
    np.testing.assert_allclose(out0, out1, rtol=1e-5, atol=1e-4)


def test_resolve_mem_mode_explicit_and_auto(monkeypatch):
    for m in (0, 1, 2):
        assert _resolve_mem_mode(m, (64, 64, 64), False, None) == m
    monkeypatch.setenv("MIL_HBM_BUDGET_MB", "100000")
    assert _resolve_mem_mode(-1, (64, 64, 64), False, None) == 1
    monkeypatch.setenv("MIL_HBM_BUDGET_MB", "1")
    assert _resolve_mem_mode(-1, (64, 64, 64), False, None) == 2


def test_streamed_covers_non_pow2_axes():
    """Ceil-sized chunks with a tail must cover EVERY row: a 48-row z axis
    with a budget forcing 16 chunks previously skipped the tail and
    streamed uninitialized scratch into the z-FFT."""
    import jax.numpy as jnp

    from microimagelib_tpu.models.deconvolution import rl_decon_single
    from microimagelib_tpu.models.decon_streamed import (
        np_gen_otf,
        rl_decon_single_streamed,
    )

    shape = (40, 24, 20)  # 40 % 16 != 0: forces a tail chunk
    rng = np.random.default_rng(7)
    img = (rng.random(shape) * 100 + 1).astype(np.float32)
    psf = np.exp(-np.sum(np.square(np.mgrid[-2:3, -2:3, -2:3]), 0) / 2.0)
    psf = (psf / psf.sum()).astype(np.float32)
    otf = np_gen_otf(psf, shape)
    otf_bp = np_gen_otf(psf[::-1, ::-1, ::-1], shape)
    # budget forces multiple chunks that do NOT divide 48 evenly
    out = rl_decon_single_streamed(img, otf, otf_bp, 3,
                                   budget_bytes=shape[1] * shape[2] * 4 * 40)
    from microimagelib_tpu.models.deconvolution import gen_otf

    ref = np.asarray(rl_decon_single(jnp.asarray(img),
                                     gen_otf(jnp.asarray(psf), shape),
                                     gen_otf(jnp.asarray(psf[::-1, ::-1, ::-1]), shape),
                                     3))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_lowmem_phasor_non_pow2_axes():
    from microimagelib_tpu.models.registration import reg3d_phasor_lowmem

    rng = np.random.default_rng(8)
    vol = np.zeros((24, 20, 28), np.float32)  # non-pow2 y
    for _ in range(30):
        vol[rng.integers(2, 22), rng.integers(2, 18), rng.integers(2, 26)] = \
            rng.uniform(100, 900)
    moved = np.roll(vol, (3, -2, 4), axis=(0, 1, 2))
    found = reg3d_phasor_lowmem(vol, moved, budget_bytes=16 * 1024)
    assert found == [4, -2, 3]
