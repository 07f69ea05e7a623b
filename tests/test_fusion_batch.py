import os

import numpy as np
import pytest

from microimagelib_tpu.io.tiff import readtifstack, writetifstack
from microimagelib_tpu.io.tmx import read_tmx
from microimagelib_tpu.models.batch import BatchConfig, find_color_folders, spim_fusion_batch
from microimagelib_tpu.models.fusion import fusion_dualview, fusion_sizes, imoperation3d, imresize3d
from microimagelib_tpu.models.projections import mip3d, mp2d


def gaussian_psf(shape, sigma):
    zz, yy, xx = np.meshgrid(*[np.arange(s) - s // 2 for s in shape], indexing="ij")
    g = np.exp(-(xx**2 + yy**2 + zz**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def blobs(shape, n=8, seed=0):
    rng = np.random.default_rng(seed)
    vol = np.zeros(shape, dtype=np.float32)
    for _ in range(n):
        z, y, x = (rng.integers(s // 4, 3 * s // 4) for s in shape)
        vol[z, y, x] = rng.uniform(80, 200)
    zz, yy, xx = np.meshgrid(*[np.arange(s) - s // 2 for s in shape], indexing="ij")
    g = np.exp(-(xx**2 + yy**2 + zz**2) / 4.0)
    g = np.roll(g / g.sum(), [-s // 2 for s in shape], axis=(0, 1, 2))
    return np.fft.irfftn(np.fft.rfftn(vol) * np.fft.rfftn(g), s=shape, axes=(0, 1, 2)).astype(np.float32)


def test_fusion_sizes():
    tgt, vb, op = fusion_sizes((128, 128, 50), (128, 128, 50),
                               (0.1625, 0.1625, 1.0), (0.1625, 0.1625, 1.0), -1)
    assert tgt == (128, 128, round(50 / 0.1625))
    # view B: scale then rotate swaps x/z
    assert vb == (round(50 / 0.1625), 128, 128)
    assert op == 2


def test_imresize3d_identity(rng):
    vol = rng.random((8, 9, 10)).astype(np.float32)
    out = imresize3d(vol, (8, 9, 10))
    np.testing.assert_allclose(out, vol, atol=1e-5)


def test_imresize3d_upsample_preserves_profile():
    vol = np.zeros((4, 4, 4), np.float32)
    vol[2, 2, 2] = 10.0
    out = imresize3d(vol, (8, 8, 8))
    assert out.shape == (8, 8, 8)
    assert out.max() > 0
    # peak lands near the scaled position (2 * 2 = 4)
    idx = np.unravel_index(out.argmax(), out.shape)
    assert all(3 <= i <= 5 for i in idx)


def test_imoperation3d_rotation_shapes(rng):
    vol = rng.random((3, 4, 5)).astype(np.float32)
    out = imoperation3d(vol, 1)
    assert out.shape == (5, 4, 3)
    back = imoperation3d(out, 2)
    np.testing.assert_array_equal(back, vol)


def test_mp2d_panels(rng):
    vol = rng.random((4, 5, 6)).astype(np.float32)
    mps = mp2d(vol)
    assert mps["xy"].shape == (5, 6)
    assert mps["yz"].shape == (4, 5)
    assert mps["zx"].shape == (6, 4)


def test_mip3d_shapes_and_first_frame(rng):
    vol = blobs((12, 14, 16), n=6)
    frames = mip3d(vol, 1, project_num=4)
    im_rot = round(np.hypot(14, 12))
    assert frames.shape == (4, im_rot, 16)
    frames_y = mip3d(vol, 2, project_num=4)
    im_rot_y = round(np.hypot(16, 12))
    assert frames_y.shape == (4, 14, im_rot_y)
    # angle-0 frame embeds the plain z-MIP (centered)
    assert frames.max() > 0


def test_mip3d_impls_agree(rng, monkeypatch):
    """gather / big-W matmul / factored Wa(.)Wb paths are numerically
    identical (float32 matmul noise) on both rotation axes — the
    factored path is the fusion-class-shape tier of the same semantics
    (reference:src/apifunc.cpp:576-644)."""
    vol = (blobs((18, 13, 15), n=8, seed=7)
           + rng.normal(0, 0.05, (18, 13, 15))).astype(np.float32)
    for r_axis in (1, 2):
        outs = {}
        for impl in ("gather", "matmul", "factored"):
            monkeypatch.setenv("MIL_MIP_IMPL", impl)
            outs[impl] = mip3d(vol, r_axis, project_num=7)
        # frame grouping that does NOT divide the frame count exercises
        # the padded tail group
        monkeypatch.setenv("MIL_MIP_IMPL", "factored")
        monkeypatch.setenv("MIL_MIP_FGROUP", "5")
        outs["factored5"] = mip3d(vol, r_axis, project_num=7)
        monkeypatch.delenv("MIL_MIP_FGROUP")
        scale = np.abs(outs["gather"]).max()
        np.testing.assert_allclose(outs["matmul"], outs["gather"],
                                   atol=1e-5 * scale)
        np.testing.assert_allclose(outs["factored"], outs["gather"],
                                   atol=1e-5 * scale)
        np.testing.assert_allclose(outs["factored5"], outs["gather"],
                                   atol=1e-5 * scale)


def test_preprocess_views_device_matches_host(rng):
    """as_device=True (the batch driver's fast path) returns the SAME
    isotropized/rotated views as the numpy contract, as jax arrays."""
    import jax

    from microimagelib_tpu.models.fusion import preprocess_views

    a = (rng.random((8, 24, 24)) * 100).astype(np.float32)
    b = (rng.random((8, 24, 24)) * 100).astype(np.float32)
    px = (0.1625, 0.1625, 0.65)
    host = preprocess_views(a, b, px, px, -1)
    dev = preprocess_views(a, b, px, px, -1, as_device=True)
    assert all(isinstance(v, jax.Array) for v in dev)
    for h, d in zip(host, dev):
        np.testing.assert_array_equal(h, np.asarray(d))


def test_fusion_dualview_end_to_end():
    # two identical-pixel views, one slightly shifted
    vol = blobs((20, 20, 20), n=8, seed=2)
    psf = gaussian_psf((5, 5, 5), 1.0)
    shifted = np.roll(vol, 1, axis=2)
    decon, tmx, reg_b, a_iso = fusion_dualview(
        vol, shifted, psf, psf,
        pixel_a=(1.0, 1.0, 1.0), pixel_b=(1.0, 1.0, 1.0),
        im_rotation=0, reg_choice=2, aff_method=1, ftol=1e-4, it_limit=500,
        n_iters=4)
    assert decon.shape == vol.shape
    assert decon.max() > 0
    # registration recovered roughly the +1 x-shift (source coords = out+1)
    assert abs(tmx[3] - 1.0) < 0.5


def _write_batch_inputs(tmp_path, n_t=3):
    psf = gaussian_psf((5, 5, 5), 1.0)
    in1 = tmp_path / "SPIMA"
    in2 = tmp_path / "SPIMB"
    in1.mkdir()
    in2.mkdir()
    for t in range(n_t):
        vol = blobs((16, 16, 16), n=6, seed=10 + t)
        writetifstack(str(in1 / f"SPIMA_{t}.tif"), vol, 32)
        writetifstack(str(in2 / f"SPIMB_{t}.tif"), np.roll(vol, 1, axis=2), 32)
    writetifstack(str(tmp_path / "psf1.tif"), psf, 32)
    writetifstack(str(tmp_path / "psf2.tif"), psf, 32)
    return in1, in2


@pytest.mark.parametrize("reg_mode", [3, 2])
def test_spim_fusion_batch_modes(tmp_path, reg_mode):
    in1, in2 = _write_batch_inputs(tmp_path, n_t=3)
    out = tmp_path / f"out{reg_mode}"
    cfg = BatchConfig(
        out_dir=str(out), in_dir1=str(in1), in_dir2=str(in2),
        name1="SPIMA_", name2="SPIMB_",
        img_start=0, img_end=2, img_interval=1, img_test=0,
        pixel1=(1.0, 1.0, 1.0), pixel2=(1.0, 1.0, 1.0),
        reg_mode=reg_mode, im_rotation=0, flag_initial_tmx=0, tmx_file="",
        ftol=1e-4, it_limit=300, save_reg_a=True, save_reg_b=True,
        psf1_file=str(tmp_path / "psf1.tif"), psf2_file=str(tmp_path / "psf2.tif"),
        it_num_decon=3, save_mp_z=True, save_mp_y=False, save_mp_x=False,
        save_3d_x=False, save_3d_y=True, bit_per_sample=32,
        query_device=False, device_num=0, verbose=False)
    processed = spim_fusion_batch(cfg)
    assert processed == [0, 1, 2]
    for t in range(3):
        assert (out / "Decon" / f"Decon_{t}.tif").exists()
        assert (out / "TMX" / f"Matrix_{t}.tmx").exists()
        assert (out / "RegA" / f"SPIMA_reg_{t}.tif").exists()
        assert (out / "RegB" / f"SPIMB_reg_{t}.tif").exists()
        assert (out / "Decon" / "MP_ZProj" / f"MP_XY_{t}.tif").exists()
        assert (out / "Decon" / "MP_3D_Yaxis" / f"MP_3D_Yaxis_{t}.tif").exists()
    assert (out / "ProcessingLog.txt").exists()
    log = (out / "ProcessingLog.txt").read_text()
    assert "Image time point number: 2" in log
    # the saved matrices are valid and consistent in shape
    m = read_tmx(str(out / "TMX" / "Matrix_1.tmx"))
    assert m.shape == (12,)
    d, _ = readtifstack(str(out / "Decon" / "Decon_1.tif"))
    assert d.shape == (16, 16, 16)


def test_spim_fusion_batch_regmode1(tmp_path):
    in1, in2 = _write_batch_inputs(tmp_path, n_t=2)
    out = tmp_path / "out1"
    cfg = BatchConfig(
        out_dir=str(out), in_dir1=str(in1), in_dir2=str(in2),
        name1="SPIMA_", name2="SPIMB_",
        img_start=0, img_end=1, img_interval=1, img_test=1,
        pixel1=(1.0, 1.0, 1.0), pixel2=(1.0, 1.0, 1.0),
        reg_mode=1, im_rotation=0, flag_initial_tmx=0, tmx_file="",
        ftol=1e-4, it_limit=300, save_reg_a=False, save_reg_b=False,
        psf1_file=str(tmp_path / "psf1.tif"), psf2_file=str(tmp_path / "psf2.tif"),
        it_num_decon=2, save_mp_z=False, save_mp_y=False, save_mp_x=False,
        save_3d_x=False, save_3d_y=False, bit_per_sample=32,
        query_device=False, device_num=0, verbose=False, overlap_io=False)
    processed = spim_fusion_batch(cfg)
    assert processed == [0, 1]
    # all timepoints' matrices equal (one registration applied to all)
    m0 = read_tmx(str(out / "TMX" / "Matrix_0.tmx"))
    m1 = read_tmx(str(out / "TMX" / "Matrix_1.tmx"))
    np.testing.assert_allclose(m0, m1, atol=1e-6)


def test_find_color_folders(tmp_path):
    for c in ("488", "561"):
        os.makedirs(tmp_path / c / "SPIMA")
        os.makedirs(tmp_path / c / "SPIMB")
    os.makedirs(tmp_path / "misc")
    assert find_color_folders(str(tmp_path)) == ["488", "561"]


def test_spim_fusion_batch_on_mesh(tmp_path):
    from microimagelib_tpu.parallel.mesh import make_mesh

    in1, in2 = _write_batch_inputs(tmp_path, n_t=3)
    # single-device reference run
    out_ref = tmp_path / "out_ref"
    cfg = BatchConfig(
        out_dir=str(out_ref), in_dir1=str(in1), in_dir2=str(in2),
        name1="SPIMA_", name2="SPIMB_",
        img_start=0, img_end=2, img_interval=1, img_test=0,
        pixel1=(1.0, 1.0, 1.0), pixel2=(1.0, 1.0, 1.0),
        reg_mode=1, im_rotation=0, flag_initial_tmx=0, tmx_file="",
        ftol=1e-4, it_limit=300, save_reg_a=False, save_reg_b=False,
        psf1_file=str(tmp_path / "psf1.tif"), psf2_file=str(tmp_path / "psf2.tif"),
        it_num_decon=3, save_mp_z=False, save_mp_y=False, save_mp_x=False,
        save_3d_x=False, save_3d_y=False, bit_per_sample=32,
        query_device=False, device_num=0, verbose=False, overlap_io=False)
    spim_fusion_batch(cfg)

    import dataclasses
    out_mesh = tmp_path / "out_mesh"
    cfg2 = dataclasses.replace(cfg, out_dir=str(out_mesh))
    mesh = make_mesh(n_sp=2, n_dp=2)
    done = spim_fusion_batch(cfg2, mesh=mesh)
    assert done == [0, 1, 2]
    for t in range(3):
        ref, _ = readtifstack(str(out_ref / "Decon" / f"Decon_{t}.tif"))
        got, _ = readtifstack(str(out_mesh / "Decon" / f"Decon_{t}.tif"))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-3)


def test_mp2d_packed_layout(rng):
    from microimagelib_tpu.models.projections import mp2d_packed

    vol = rng.random((4, 5, 6)).astype(np.float32)
    buf, size_mp = mp2d_packed(vol)
    sx, sy, sz = 6, 5, 4
    np.testing.assert_array_equal(size_mp, [sx, sy, sy, sz, sz, sx])
    assert buf.shape == (sx * sy + sy * sz + sz * sx,)
    np.testing.assert_allclose(buf[: sx * sy].reshape(sy, sx), np.maximum(vol.max(0), 0))
    np.testing.assert_allclose(buf[sx * sy : sx * sy + sy * sz].reshape(sz, sy),
                               np.maximum(vol.max(2), 0))
    np.testing.assert_allclose(buf[sx * sy + sy * sz :].reshape(sx, sz),
                               np.maximum(vol.max(1).T, 0))
    # unselected panels stay zero
    buf2, _ = mp2d_packed(vol, z_proj=True, x_proj=False, y_proj=False)
    assert np.all(buf2[sx * sy :] == 0)


def test_fusion_records_full_contract():
    """All 22 fusionRecords slots are populated per the reference contract
    (reference:src/api_decon.cpp:1015-1016): [0:11] regRecords, [11:21]
    deconRecords, [21] total time."""
    from microimagelib_tpu.models.fusion import fusion_dualview

    a = blobs((12, 24, 24), n=8, seed=21) + 5
    b = np.roll(a, 1, axis=2) + 0.1
    psf = gaussian_psf((5, 5, 5), 1.0)
    rec = np.zeros(22)
    fusion_dualview(a, b, psf, psf, pixel_a=(1, 1, 1), pixel_b=(1, 1, 1),
                    im_rotation=0, reg_choice=2, aff_method=7, n_iters=2,
                    records=rec)
    # reg records: [0] flag, [1] initial NCC, [2] intermediate NCC (method
    # 7), [3] final NCC, [4] per-eval ms, [5] evals, [6] iter s, [7] total
    # s, [8..10] memory snapshots (-1 when the backend has no stats)
    assert rec[0] == 1
    assert rec[1] != 0 and rec[2] != 0 and rec[3] != 0
    assert rec[4] > 0 and rec[5] > 0 and rec[6] > 0 and rec[7] > 0
    assert rec[8] != 0 and rec[9] != 0 and rec[10] != 0
    # decon records: [11] mode, [12..16] memory snapshots, [17..20] timers
    assert rec[11] in (0, 1, 2)
    assert all(rec[i] != 0 for i in range(12, 17))
    assert rec[20] > 0  # decon total time
    assert rec[21] > 0  # fusion total time


def test_decon_records_memory_snapshots():
    from microimagelib_tpu.models.deconvolution import decon_singleview

    img = blobs((16, 16, 16), n=6, seed=22) + 5
    psf = gaussian_psf((5, 5, 5), 1.0)
    for mode in (1, 2):
        rec = np.zeros(10)
        decon_singleview(img, psf, n_iters=2, mem_mode=mode, records=rec)
        assert rec[0] == mode
        assert all(rec[i] != 0 for i in range(1, 6)), rec  # snapshots [1..5]
        assert rec[9] > 0


def test_batch_log_full_header(tmp_path):
    in1, in2 = _write_batch_inputs(tmp_path, n_t=1)
    out = tmp_path / "out"
    cfg = BatchConfig(
        out_dir=str(out), in_dir1=str(in1), in_dir2=str(in2),
        name1="SPIMA_", name2="SPIMB_",
        img_start=0, img_end=0, img_interval=1, img_test=0,
        pixel1=(1.0, 1.0, 1.0), pixel2=(1.0, 1.0, 1.0),
        reg_mode=0, im_rotation=0, flag_initial_tmx=0, tmx_file="",
        ftol=1e-4, it_limit=300, save_reg_a=False, save_reg_b=False,
        psf1_file=str(tmp_path / "psf1.tif"), psf2_file=str(tmp_path / "psf2.tif"),
        it_num_decon=2, save_mp_z=False, save_mp_y=False, save_mp_x=False,
        save_3d_x=False, save_3d_y=False, bit_per_sample=32,
        query_device=False, device_num=0, verbose=False)
    spim_fusion_batch(cfg)
    log = (out / "ProcessingLog.txt").read_text()
    for needle in ("Image information:", "Input image 1 size",
                   "pixel size", "PSF image size", "Output image size",
                   "Image number from", "No registration",
                   "Registration convergence threshold",
                   "Unmatched back projectors for joint deconvolution",
                   "Iteration number for joint deconvolution",
                   "is used..."):
        assert needle in log, needle


def test_spim_fusion_batch_u16_end_to_end(tmp_path):
    """The reference's default camera data is 16-bit: u16 INPUT stacks
    flow through readtifstack's float widening into the batch driver,
    and bit_per_sample=16 makes every output (decon, MIPs, reg saves)
    a u16 TIFF with the C-cast semantics
    (reference:src/spim_fusion_batch.cpp:651-675 read path,
    reference:src/apifunc.cpp:242-326 write semantics)."""
    from microimagelib_tpu.io.tiff import (
        _float_to_u16_c_cast,
        gettifinfo,
        readtifstack_16to16,
        writetifstack_16to16,
    )

    psf = gaussian_psf((5, 5, 5), 1.0)
    in1 = tmp_path / "SPIMA"
    in2 = tmp_path / "SPIMB"
    in1.mkdir()
    in2.mkdir()
    for t in range(2):
        # integer-valued camera-like data (u16 on disk, exact in f32)
        vol = np.round(blobs((16, 16, 16), n=6, seed=10 + t) * 40
                       + 100).astype(np.uint16)
        writetifstack_16to16(str(in1 / f"SPIMA_{t}.tif"), vol)
        writetifstack_16to16(str(in2 / f"SPIMB_{t}.tif"),
                             np.roll(vol, 1, axis=2))
    writetifstack(str(tmp_path / "psf1.tif"), psf, 32)
    writetifstack(str(tmp_path / "psf2.tif"), psf, 32)
    # u16 input widens losslessly to float through the batch read path
    widened, _ = readtifstack(str(in1 / "SPIMA_0.tif"))
    assert widened.dtype == np.float32
    native = readtifstack_16to16(str(in1 / "SPIMA_0.tif"))[0]
    np.testing.assert_array_equal(widened, native.astype(np.float32))

    def run(sub, bits):
        out = tmp_path / sub
        cfg = BatchConfig(
            out_dir=str(out), in_dir1=str(in1), in_dir2=str(in2),
            name1="SPIMA_", name2="SPIMB_",
            img_start=0, img_end=1, img_interval=1, img_test=0,
            pixel1=(1.0, 1.0, 1.0), pixel2=(1.0, 1.0, 1.0),
            reg_mode=1, im_rotation=0, flag_initial_tmx=0, tmx_file="",
            ftol=1e-4, it_limit=300, save_reg_a=True, save_reg_b=True,
            psf1_file=str(tmp_path / "psf1.tif"),
            psf2_file=str(tmp_path / "psf2.tif"),
            it_num_decon=3, save_mp_z=True, save_mp_y=False, save_mp_x=False,
            save_3d_x=False, save_3d_y=True, bit_per_sample=bits,
            query_device=False, device_num=0, verbose=False)
        assert spim_fusion_batch(cfg) == [0, 1]
        return out

    out16 = run("out16", 16)
    out32 = run("out32", 32)
    for t in range(2):
        rel = [("Decon", f"Decon_{t}.tif"),
               ("RegA", f"SPIMA_reg_{t}.tif"),
               ("RegB", f"SPIMB_reg_{t}.tif"),
               ("Decon/MP_ZProj", f"MP_XY_{t}.tif"),
               ("Decon/MP_3D_Yaxis", f"MP_3D_Yaxis_{t}.tif")]
        for d, name in rel:
            p16 = out16 / d / name
            _, bits = gettifinfo(str(p16))
            assert bits == 16, (d, name)
            # u16 output == C-cast of the float pipeline's output
            u16 = readtifstack_16to16(str(p16))[0]
            f32, _ = readtifstack(str(out32 / d / name))
            np.testing.assert_array_equal(u16, _float_to_u16_c_cast(f32))


def test_batch_fused_tp_matches_unfused(tmp_path, monkeypatch):
    """The fused one-program timepoint path (MIL_BATCH_FUSED, default on
    for apply-only regModes) produces the same decon/reg/MP/MIP outputs
    as the stage-by-stage chain — on the realistic workload where the
    fused program really does resample (anisotropic z), rotate
    (imgRotation=-1) and apply a non-identity matrix."""
    psf = gaussian_psf((5, 5, 5), 1.0)

    def run(sub, fused):
        root = tmp_path / sub
        root.mkdir()
        in1 = root / "SPIMA"
        in2 = root / "SPIMB"
        in1.mkdir()
        in2.mkdir()
        for t in range(3):
            vol = blobs((8, 16, 16), n=6, seed=20 + t)
            writetifstack(str(in1 / f"SPIMA_{t}.tif"), vol, 32)
            writetifstack(str(in2 / f"SPIMB_{t}.tif"),
                          np.transpose(vol, (2, 1, 0)).copy(), 32)
        writetifstack(str(root / "psf.tif"), psf, 32)
        out = root / "out"
        cfg = BatchConfig(
            out_dir=str(out), in_dir1=str(in1), in_dir2=str(in2),
            name1="SPIMA_", name2="SPIMB_",
            img_start=0, img_end=2, img_interval=1, img_test=0,
            pixel1=(1.0, 1.0, 2.0), pixel2=(1.0, 1.0, 2.0),
            reg_mode=1, im_rotation=-1, flag_initial_tmx=0, tmx_file="",
            ftol=1e-3, it_limit=200, save_reg_a=True, save_reg_b=True,
            psf1_file=str(root / "psf.tif"), psf2_file=str(root / "psf.tif"),
            it_num_decon=3, save_mp_z=True, save_mp_y=True, save_mp_x=True,
            save_3d_x=True, save_3d_y=True, bit_per_sample=32,
            query_device=False, device_num=0, verbose=False)
        monkeypatch.setenv("MIL_BATCH_FUSED", fused)
        return out, spim_fusion_batch(cfg)

    out1, done1 = run("fused", "1")
    out0, done0 = run("unfused", "0")
    assert done1 == done0 == [0, 1, 2]
    rel = [("Decon", "Decon_{t}.tif"),
           ("RegA", "SPIMA_reg_{t}.tif"),
           ("RegB", "SPIMB_reg_{t}.tif"),
           ("Decon/MP_ZProj", "MP_XY_{t}.tif"),
           ("Decon/MP_XProj", "MP_YZ_{t}.tif"),
           ("Decon/MP_YProj", "MP_ZX_{t}.tif"),
           ("Decon/MP_3D_Xaxis", "MP_3D_Xaxis_{t}.tif"),
           ("Decon/MP_3D_Yaxis", "MP_3D_Yaxis_{t}.tif")]
    for t in done1:
        for d, name in rel:
            f = name.format(t=t)
            a, _ = readtifstack(str(out1 / d / f))
            b, _ = readtifstack(str(out0 / d / f))
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4), (d, f)


def test_batch_group_single_chip_matches(tmp_path, monkeypatch):
    """MIL_BATCH_GROUP>1 (one vmapped decon dispatch per group) produces
    the same outputs as the per-timepoint path (round-2 verdict #7),
    including a padded final partial group."""
    def run(sub, env):
        root = tmp_path / sub
        root.mkdir()
        in1, in2 = _write_batch_inputs(root, n_t=5)
        out = root / "out"
        cfg = BatchConfig(
            out_dir=str(out), in_dir1=str(in1), in_dir2=str(in2),
            name1="SPIMA_", name2="SPIMB_",
            img_start=0, img_end=4, img_interval=1, img_test=0,
            pixel1=(1.0, 1.0, 1.0), pixel2=(1.0, 1.0, 1.0),
            reg_mode=1, im_rotation=0, flag_initial_tmx=0, tmx_file="",
            ftol=1e-4, it_limit=300, save_reg_a=False, save_reg_b=False,
            psf1_file=str(root / "psf1.tif"), psf2_file=str(root / "psf2.tif"),
            it_num_decon=3, save_mp_z=True, save_mp_y=False, save_mp_x=False,
            save_3d_x=False, save_3d_y=False, bit_per_sample=32,
            query_device=False, device_num=0, verbose=False)
        if env:
            monkeypatch.setenv("MIL_BATCH_GROUP", env)
        else:
            monkeypatch.delenv("MIL_BATCH_GROUP", raising=False)
        return out, spim_fusion_batch(cfg)

    out1, done1 = run("a", None)
    out2, done2 = run("b", "2")
    assert done1 == done2 == [0, 1, 2, 3, 4]
    for t in done1:
        a, _ = readtifstack(str(out1 / "Decon" / f"Decon_{t}.tif"))
        b, _ = readtifstack(str(out2 / "Decon" / f"Decon_{t}.tif"))
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-4)


def _write_drift_inputs(root, n_t=3, psf=None):
    """Anisotropic-z inputs whose view B drifts per timepoint and whose
    b_zyx != tgt_zyx after rotation — the registering-regMode workload."""
    if psf is None:
        psf = gaussian_psf((5, 5, 5), 1.0)
    in1 = root / "SPIMA"
    in2 = root / "SPIMB"
    in1.mkdir()
    in2.mkdir()
    for t in range(n_t):
        vol = blobs((8, 16, 16), n=6, seed=30 + t)
        writetifstack(str(in1 / f"SPIMA_{t}.tif"), vol, 32)
        b = np.transpose(vol, (2, 1, 0)).copy()
        b = np.roll(b, t, axis=1)  # integer temporal drift in y
        writetifstack(str(in2 / f"SPIMB_{t}.tif"), b, 32)
    writetifstack(str(root / "psf.tif"), psf, 32)
    return in1, in2


@pytest.mark.parametrize("reg_mode", [2, 3])
def test_batch_fused_regmodes_match_unfused(tmp_path, monkeypatch, reg_mode):
    """The fused per-timepoint path for the REGISTERING regModes
    (2 dependent / 3 independent): want_reg=False registration + ONE
    align/apply/decon/MIP program must match the stage-by-stage chain —
    on a workload with anisotropic z, imgRotation=-1, per-timepoint
    drift, and b_zyx != tgt_zyx (the centered source-frame alignment is
    genuinely exercised)."""

    def run(sub, fused):
        root = tmp_path / sub
        root.mkdir()
        in1, in2 = _write_drift_inputs(root)
        out = root / "out"
        cfg = BatchConfig(
            out_dir=str(out), in_dir1=str(in1), in_dir2=str(in2),
            name1="SPIMA_", name2="SPIMB_",
            img_start=0, img_end=2, img_interval=1, img_test=0,
            pixel1=(1.0, 1.0, 2.0), pixel2=(1.0, 1.0, 2.0),
            reg_mode=reg_mode, im_rotation=-1, flag_initial_tmx=0,
            tmx_file="", ftol=1e-3, it_limit=200,
            save_reg_a=True, save_reg_b=True,
            psf1_file=str(root / "psf.tif"), psf2_file=str(root / "psf.tif"),
            it_num_decon=3, save_mp_z=True, save_mp_y=False, save_mp_x=False,
            save_3d_x=False, save_3d_y=True, bit_per_sample=32,
            query_device=False, device_num=0, verbose=False)
        monkeypatch.setenv("MIL_BATCH_FUSED", fused)
        return out, spim_fusion_batch(cfg)

    out1, done1 = run("fused", "1")
    out0, done0 = run("unfused", "0")
    assert done1 == done0 == [0, 1, 2]
    for t in done1:
        # identical registration trajectory -> near-identical matrices
        m1 = read_tmx(str(out1 / "TMX" / f"Matrix_{t}.tmx"))
        m0 = read_tmx(str(out0 / "TMX" / f"Matrix_{t}.tmx"))
        np.testing.assert_allclose(m1, m0, atol=1e-5)
        for d, name in (("Decon", f"Decon_{t}.tif"),
                        ("RegA", f"SPIMA_reg_{t}.tif"),
                        ("RegB", f"SPIMB_reg_{t}.tif"),
                        ("Decon/MP_ZProj", f"MP_XY_{t}.tif"),
                        ("Decon/MP_3D_Yaxis", f"MP_3D_Yaxis_{t}.tif")):
            a, _ = readtifstack(str(out1 / d / name))
            b, _ = readtifstack(str(out0 / d / name))
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_batch_apply_matches_reg3d_frame(tmp_path, monkeypatch):
    """regMode 0 with an input matrix: the batch apply (fused AND
    unfused) must place view B in the same frame reg3d choice 0 uses —
    center-aligned to the target grid before the transform
    (reference:src/api_reg.cpp:398-407) — at shapes where
    b_zyx != tgt_zyx. Round-5 fix: both paths previously transformed the
    unaligned view, shifting B by the centering offset."""
    from microimagelib_tpu.io.tmx import write_tmx
    from microimagelib_tpu.models.fusion import preprocess_views
    from microimagelib_tpu.models.registration import reg3d
    from microimagelib_tpu.ops.matrix import dof_to_matrix

    tmx = dof_to_matrix([1.2, -0.8, 0.5, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0], 6)

    def run(sub, fused):
        root = tmp_path / sub
        root.mkdir()
        in1, in2 = _write_drift_inputs(root, n_t=1)
        write_tmx(str(root / "init.tmx"), np.asarray(tmx, np.float32))
        out = root / "out"
        cfg = BatchConfig(
            out_dir=str(out), in_dir1=str(in1), in_dir2=str(in2),
            name1="SPIMA_", name2="SPIMB_",
            img_start=0, img_end=0, img_interval=1, img_test=0,
            pixel1=(1.0, 1.0, 2.0), pixel2=(1.0, 1.0, 2.0),
            reg_mode=0, im_rotation=-1, flag_initial_tmx=1,
            tmx_file=str(root / "init.tmx"), ftol=1e-3, it_limit=100,
            save_reg_a=False, save_reg_b=True,
            psf1_file=str(root / "psf.tif"), psf2_file=str(root / "psf.tif"),
            it_num_decon=2, save_mp_z=False, save_mp_y=False,
            save_mp_x=False, save_3d_x=False, save_3d_y=False,
            bit_per_sample=32, query_device=False, device_num=0,
            verbose=False)
        monkeypatch.setenv("MIL_BATCH_FUSED", fused)
        spim_fusion_batch(cfg)
        return readtifstack(str(out / "RegB" / "SPIMB_reg_0.tif"))[0]

    reg_fused = run("fused", "1")
    reg_unfused = run("unfused", "0")

    # ground truth: reg3d choice 0 on the preprocessed views
    a_raw, _ = readtifstack(str(tmp_path / "fused" / "SPIMA" / "SPIMA_0.tif"))
    b_raw, _ = readtifstack(str(tmp_path / "fused" / "SPIMB" / "SPIMB_0.tif"))
    a_iso, b_iso = preprocess_views(a_raw, b_raw, (1.0, 1.0, 2.0),
                                    (1.0, 1.0, 2.0), -1)
    assert a_iso.shape != b_iso.shape  # the alignment case is exercised
    ref, _, _ = reg3d(a_iso, b_iso, 0, 0, True, tmx)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(reg_fused, ref, atol=1e-5 * scale)
    np.testing.assert_allclose(reg_unfused, ref, atol=1e-5 * scale)
