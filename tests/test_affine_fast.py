"""MXU-path NCC must be numerically identical to the gather path."""

import numpy as np
import jax.numpy as jnp
import pytest

from microimagelib_tpu.ops.affine import corr3d_partials
from microimagelib_tpu.ops.affine_fast import corr3d_partials_mxu
from microimagelib_tpu.ops.matrix import dof_to_matrix, identity_tmx


def vols(shape, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.random(shape).astype(np.float32)),
            jnp.asarray(rng.random(shape).astype(np.float32)))


def check(m, shape=(24, 28, 32), seed=0, rtol=2e-4):
    src, tgt = vols(shape, seed)
    ss_g, st_g = corr3d_partials(src, tgt, m)
    ss_f, st_f = corr3d_partials_mxu(src, tgt, m)
    np.testing.assert_allclose(float(ss_f), float(ss_g), rtol=rtol)
    np.testing.assert_allclose(float(st_f), float(st_g), rtol=rtol)


def test_identity():
    check(identity_tmx())


def test_translation_fractional():
    m = identity_tmx()
    m[3], m[7], m[11] = 1.3, -2.7, 0.4
    check(m)


def test_small_rotation_scale():
    m = dof_to_matrix([1.0, -0.5, 0.8, 3.0, -2.0, 4.0, 1.05, 0.97, 1.02], 9)
    check(m)


def test_negative_translation_boundary():
    m = identity_tmx()
    m[3] = -0.4  # hits the clamp band at the low-x edge
    check(m)


def test_out_of_bounds_regions():
    m = identity_tmx()
    m[3] = 20.0  # much of the volume maps outside
    check(m)


def test_fallback_on_large_rotation():
    # 40-degree rotation: per-row footprint exceeds the box -> gather path
    m = dof_to_matrix([0, 0, 0, 40.0, 0, 0, 1, 1, 1], 6)
    check(m)


def test_anisotropic_shape():
    m = dof_to_matrix([0.5, 1.0, -1.0, 2.0, 1.0, -2.0, 1.0, 1.0, 1.0], 6)
    check(m, shape=(10, 40, 56), seed=3)


def test_pallas_fallback_uses_unpadded_extents():
    # sx=96 forces zero-padding to 128 lanes; the 40-degree rotation's
    # z footprint (~sin40*95 >> kz) forces the gather fallback at the
    # pinned K=8 tier (pinned because the cascade now prunes to an
    # always-fitting K>=max(sy,sz) tier, which would bypass the
    # fallback). The fallback must evaluate over the TRUE extents:
    # padded columns can map back into real data (s nonzero, t == 0) and
    # inflate sum(s^2) by ~50% (round-1 advisor finding).
    from microimagelib_tpu.ops.pallas_corr import corr3d_partials_pallas

    src, tgt = vols((8, 16, 96), seed=7)
    m = dof_to_matrix([2.0, -1.0, 0.5, 40.0, 0, 0, 1, 1, 1], 6)
    ss_g, st_g = corr3d_partials(src, tgt, m)
    ss_p, st_p = corr3d_partials_pallas(src, tgt, m, interpret=True, k_mode=8)
    np.testing.assert_allclose(float(ss_p), float(ss_g), rtol=2e-4)
    np.testing.assert_allclose(float(st_p), float(st_g), rtol=2e-4)


def test_pallas_per_row_footprint_overflow():
    # Shear with |m10|*sx ~ 21: each row's own y footprint is in (K, K+8],
    # so the BLOCK box (K+8 rows) fits but the per-row contraction window
    # (K rows) does not — the kernel must flag no-fit and take the gather
    # fallback instead of silently zero-weighting out-of-window samples
    # (round-1 advisor finding: 27% error without the per-row check).
    # K=16 pinned: at K=16 the block box (K+rows >= sy) fits but the
    # per-row window (16 rows < the ~21-row shear span) does not — the
    # cascade would otherwise prune straight to the always-fitting K=32.
    from microimagelib_tpu.ops.pallas_corr import corr3d_partials_pallas

    src, tgt = vols((8, 32, 32), seed=11)
    m = identity_tmx()
    m[4], m[5], m[7] = 0.65, 0.1, 1.0  # cy = 0.65*x + 0.1*y + 1
    ss_g, st_g = corr3d_partials(src, tgt, m)
    ss_p, st_p = corr3d_partials_pallas(src, tgt, m, interpret=True,
                                        k_mode=16)
    np.testing.assert_allclose(float(ss_p), float(ss_g), rtol=2e-4)
    np.testing.assert_allclose(float(st_p), float(st_g), rtol=2e-4)


def test_pallas_interpret_matches_gather():
    from microimagelib_tpu.ops.pallas_corr import corr3d_partials_pallas

    src, tgt = vols((8, 16, 32), seed=5)
    for m in (identity_tmx(),
              dof_to_matrix([1.5, -0.5, 0.8, 3.0, -2.0, 4.0, 1.05, 0.97, 1.02], 9),
              dof_to_matrix([0, 0, 0, 40.0, 0, 0, 1, 1, 1], 6)):
        ss_g, st_g = corr3d_partials(src, tgt, m)
        ss_p, st_p = corr3d_partials_pallas(src, tgt, m, interpret=True)
        np.testing.assert_allclose(float(ss_p), float(ss_g), rtol=2e-4)
        np.testing.assert_allclose(float(st_p), float(st_g), rtol=2e-4)


def test_pallas_tier_selection_fuzz():
    """The analytic start-tier selection must stay exact across random
    9-DOF matrices (underestimates escalate via the fit check; this
    guards against a bound that silently skips a NEEDED tier)."""
    from microimagelib_tpu.ops.pallas_corr import corr3d_partials_pallas

    rng = np.random.default_rng(3)
    src, tgt = vols((16, 32, 32), seed=13)
    for _ in range(8):
        dof = np.concatenate([rng.uniform(-3, 3, 3),
                              rng.uniform(-30, 30, 3),
                              rng.uniform(0.8, 1.3, 3)])
        m = dof_to_matrix(dof, 9)
        ss_g, st_g = corr3d_partials(src, tgt, m)
        ss_p, st_p = corr3d_partials_pallas(src, tgt, m, interpret=True)
        np.testing.assert_allclose(float(ss_p), float(ss_g), rtol=5e-4)
        np.testing.assert_allclose(float(st_p), float(st_g), rtol=5e-4,
                                   atol=1e-3)


def test_nprobe_batch_matches_gather():
    """The N-probe kernel (one union-footprint box per block shared by
    every probe) must equal per-matrix gather partials — including a
    wild probe whose footprint forces the per-member gather fallback
    inside the batch (K=8 pinned so the 35-degree probe overflows the
    window; the cascade would otherwise prune to an always-fitting
    tier and compile minutes of unreachable branches)."""
    from microimagelib_tpu.ops.pallas_corr import corr3d_partials_nprobe

    src, tgt = vols((16, 16, 32), seed=9)
    base = np.asarray(identity_tmx(), np.float32)
    mats = []
    for t in (-2.0, -0.5, 0.3, 1.0, 2.7):
        m = base.copy()
        m[3] += t
        m[7] += 0.5 * t
        mats.append(m)
    mats.append(np.asarray(
        dof_to_matrix([0, 0, 0, 35.0, 0, 0, 1, 1, 1], 6), np.float32))
    mats = jnp.asarray(np.stack(mats))
    ss_b, st_b = corr3d_partials_nprobe(src, tgt, mats, interpret=True,
                                        k_mode=8)
    for i in range(mats.shape[0]):
        ss_g, st_g = corr3d_partials(src, tgt, mats[i])
        np.testing.assert_allclose(float(ss_b[i]), float(ss_g), rtol=5e-4)
        np.testing.assert_allclose(float(st_b[i]), float(st_g), rtol=5e-4,
                                   atol=1e-3)


@pytest.mark.slow
def test_nprobe_tier_fuzz():
    """Random 9-DOF probe batches: the batch cascade starts at the
    WORST analytic tier over the batch and must stay exact for every
    member (escalation and per-member gather fallback included)."""
    from microimagelib_tpu.ops.pallas_corr import corr3d_partials_nprobe

    rng = np.random.default_rng(11)
    src, tgt = vols((8, 16, 32), seed=21)
    for _ in range(1):
        dofs = np.stack([np.concatenate([rng.uniform(-3, 3, 3),
                                         rng.uniform(-25, 25, 3),
                                         rng.uniform(0.85, 1.2, 3)])
                         for _ in range(3)])
        mats = jnp.asarray(np.stack([np.asarray(dof_to_matrix(d, 9),
                                                np.float32) for d in dofs]))
        ss_b, st_b = corr3d_partials_nprobe(src, tgt, mats, interpret=True)
        for i in range(mats.shape[0]):
            ss_g, st_g = corr3d_partials(src, tgt, mats[i])
            np.testing.assert_allclose(float(ss_b[i]), float(ss_g),
                                       rtol=5e-4)
            np.testing.assert_allclose(float(st_b[i]), float(st_g),
                                       rtol=5e-4, atol=1e-3)


def test_pallas_wide_lane_static_window():
    """sxp > 128 volumes take the STATIC full-height row window (Mosaic
    refuses the dynamic sublane offset at wide lanes — round-5 hardware,
    beyond-HBM pooled ladder at x=512). The static-window contraction
    must stay numerically identical to the gather oracle."""
    from microimagelib_tpu.ops.pallas_corr import corr3d_partials_pallas

    src, tgt = vols((16, 24, 192), seed=11)
    for m in (identity_tmx(),
              dof_to_matrix([0.8, -1.4, 0.6, 2.0, -1.0, 1.5,
                             1.02, 0.98, 1.01], 9)):
        ss_g, st_g = corr3d_partials(src, tgt, m)
        ss_p, st_p = corr3d_partials_pallas(src, tgt, m, interpret=True)
        np.testing.assert_allclose(float(ss_p), float(ss_g), rtol=2e-4)
        np.testing.assert_allclose(float(st_p), float(st_g), rtol=2e-4)
