"""CLI surface tests: drive the apps as a user would, flag-for-flag."""

import numpy as np

from microimagelib_tpu.io.tiff import readtifstack, writetifstack
from microimagelib_tpu.io.tmx import read_tmx, write_tmx


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


def test_reg3d_cli(tmp_path, capsys):
    from microimagelib_tpu.cli.reg3d import main

    vol = blobs((16, 16, 16), n=6, seed=1)
    moved = np.roll(vol, 2, axis=2)
    writetifstack(str(tmp_path / "t.tif"), vol, 32)
    writetifstack(str(tmp_path / "s.tif"), moved, 32)
    rc = main(["-t", str(tmp_path / "t.tif"), "-s", str(tmp_path / "s.tif"),
               "-o", str(tmp_path / "r.tif"), "-regc", "1",
               "-otmx", str(tmp_path / "m.tmx"), "-verbOFF"])
    assert rc == 0
    m = read_tmx(str(tmp_path / "m.tmx"))
    assert m[3] == 2.0  # shift equals the source displacement (+2 roll)
    reg, _ = readtifstack(str(tmp_path / "r.tif"))
    assert reg.shape == (16, 16, 16)


def test_reg3d_cli_help(capsys):
    from microimagelib_tpu.cli.reg3d import main

    assert main(["-h"]) == 0
    out = capsys.readouterr().out
    assert "-regc" in out and "-affm" in out and "phasor" in out


def test_decon_sv_cli(tmp_path):
    from microimagelib_tpu.cli.decon_sv import main

    img = blobs((16, 16, 16), n=5, seed=2) + 1
    psf = gaussian_psf((5, 5, 5), 1.0)
    writetifstack(str(tmp_path / "i.tif"), img, 32)
    writetifstack(str(tmp_path / "p.tif"), psf, 32)
    rc = main(["-i", str(tmp_path / "i.tif"), "-fp", str(tmp_path / "p.tif"),
               "-o", str(tmp_path / "o.tif"), "-it", "3", "-verbOFF"])
    assert rc == 0
    out, size = readtifstack(str(tmp_path / "o.tif"))
    assert out.shape == (16, 16, 16)
    assert out.max() > 0


def test_decon_dv_cli_size_mismatch(tmp_path, capsys):
    from microimagelib_tpu.cli.decon_dv import main

    psf = gaussian_psf((5, 5, 5), 1.0)
    writetifstack(str(tmp_path / "a.tif"), np.ones((8, 8, 8), np.float32), 32)
    writetifstack(str(tmp_path / "b.tif"), np.ones((8, 8, 9), np.float32), 32)
    writetifstack(str(tmp_path / "p.tif"), psf, 32)
    rc = main(["-i1", str(tmp_path / "a.tif"), "-i2", str(tmp_path / "b.tif"),
               "-fp1", str(tmp_path / "p.tif"), "-fp2", str(tmp_path / "p.tif"),
               "-o", str(tmp_path / "o.tif")])
    assert rc == 1
    assert "same image size" in capsys.readouterr().out


def test_decon_dv_cli(tmp_path):
    from microimagelib_tpu.cli.decon_dv import main

    img = blobs((16, 16, 16), n=5, seed=3) + 1
    psf = gaussian_psf((5, 5, 5), 1.0)
    writetifstack(str(tmp_path / "a.tif"), img, 32)
    writetifstack(str(tmp_path / "b.tif"), img, 32)
    writetifstack(str(tmp_path / "p.tif"), psf, 32)
    rc = main(["-i1", str(tmp_path / "a.tif"), "-i2", str(tmp_path / "b.tif"),
               "-fp1", str(tmp_path / "p.tif"), "-fp2", str(tmp_path / "p.tif"),
               "-o", str(tmp_path / "o.tif"), "-it", "2", "-verbOFF", "-bit", "16"])
    assert rc == 0
    from microimagelib_tpu.io.tiff import gettifinfo
    _, bits = gettifinfo(str(tmp_path / "o.tif"))
    assert bits == 16


def test_spim_fusion_cli(tmp_path):
    from microimagelib_tpu.cli.spim_fusion import main

    vol = blobs((14, 14, 14), n=6, seed=4)
    psf = gaussian_psf((5, 5, 5), 1.0)
    writetifstack(str(tmp_path / "a.tif"), vol, 32)
    writetifstack(str(tmp_path / "b.tif"), np.roll(vol, 1, axis=2), 32)
    writetifstack(str(tmp_path / "p.tif"), psf, 32)
    rc = main(["-i1", str(tmp_path / "a.tif"), "-i2", str(tmp_path / "b.tif"),
               "-fp1", str(tmp_path / "p.tif"), "-fp2", str(tmp_path / "p.tif"),
               "-o", str(tmp_path / "f.tif"),
               "-pxx1", "1", "-pxy1", "1", "-pxz1", "1",
               "-pxx2", "1", "-pxy2", "1", "-pxz2", "1",
               "-imgrot", "0", "-regc", "2", "-affm", "1", "-it", "2",
               "-itreg", "200", "-otmx", str(tmp_path / "f.tmx"), "-verbOFF"])
    assert rc == 0
    out, _ = readtifstack(str(tmp_path / "f.tif"))
    assert out.shape == (14, 14, 14)
    assert (tmp_path / "f.tmx").exists()


def test_spim_fusion_batch_cli(tmp_path):
    from microimagelib_tpu.cli.spim_fusion_batch import main

    psf = gaussian_psf((5, 5, 5), 1.0)
    (tmp_path / "A").mkdir()
    (tmp_path / "B").mkdir()
    for t in range(2):
        vol = blobs((12, 12, 12), n=5, seed=20 + t)
        writetifstack(str(tmp_path / "A" / f"a_{t}.tif"), vol, 32)
        writetifstack(str(tmp_path / "B" / f"b_{t}.tif"), np.roll(vol, 1, axis=2), 32)
    writetifstack(str(tmp_path / "p1.tif"), psf, 32)
    writetifstack(str(tmp_path / "p2.tif"), psf, 32)
    args = [
        str(tmp_path / "out"), str(tmp_path / "A"), str(tmp_path / "B"),
        "a_", "b_", "0", "1", "1", "0",
        "1", "1", "1", "1", "1", "1",
        "3", "0", "0", "none", "0.0001", "200",
        "0", "0", str(tmp_path / "p1.tif"), str(tmp_path / "p2.tif"), "2",
        "0", "0", "1", "0", "0", "32", "0", "0",
    ]
    assert len(args) == 34
    rc = main(args)
    assert rc == 0
    assert (tmp_path / "out" / "Decon" / "Decon_0.tif").exists()
    assert (tmp_path / "out" / "Decon" / "Decon_1.tif").exists()
    assert (tmp_path / "out" / "Decon" / "MP_ZProj" / "MP_XY_1.tif").exists()
    assert (tmp_path / "out" / "ProcessingLog.txt").exists()


def test_check_device_cli(capsys):
    from microimagelib_tpu.cli.check_device import main

    assert main([]) == 0
    assert "device" in capsys.readouterr().out.lower()


def test_spim_fusion_batch_cli_multicolor(tmp_path):
    from microimagelib_tpu.cli.spim_fusion_batch import main

    psf = gaussian_psf((5, 5, 5), 1.0)
    main_dir = tmp_path / "colors"
    for c in ("488", "561"):
        (main_dir / c / "SPIMA").mkdir(parents=True)
        (main_dir / c / "SPIMB").mkdir(parents=True)
        for t in range(2):
            vol = blobs((12, 12, 12), n=5, seed=30 + t)
            writetifstack(str(main_dir / c / "SPIMA" / f"a_{t}.tif"), vol, 32)
            writetifstack(str(main_dir / c / "SPIMB" / f"b_{t}.tif"), np.roll(vol, 1, axis=2), 32)
    writetifstack(str(tmp_path / "p.tif"), psf, 32)
    args = [
        str(tmp_path / "out"), "1", str(main_dir),
        "a_", "b_", "0", "1", "1", "0",
        "1", "1", "1", "1", "1", "1",
        "3", "0", "0", "none", "0.0001", "150",
        "0", "0", str(tmp_path / "p.tif"), str(tmp_path / "p.tif"), "2",
        "0", "0", "0", "0", "0", "32", "0", "0",
    ]
    assert main(args) == 0
    for c in ("488", "561"):
        assert (tmp_path / "out" / c / "Decon" / "Decon_0.tif").exists()
        assert (tmp_path / "out" / c / "Decon" / "Decon_1.tif").exists()


def test_u16_input_journey(tmp_path):
    """16-bit input TIFF (the dominant microscopy format) through decon to
    16-bit output, via the CLI surface."""
    from microimagelib_tpu.cli.decon_sv import main
    from microimagelib_tpu.io.tiff import gettifinfo, readtifstack

    img = (blobs((16, 16, 16), n=5, seed=6) * 50 + 100).astype(np.float32)
    psf = gaussian_psf((5, 5, 5), 1.0)
    writetifstack(str(tmp_path / "i16.tif"), img, 16)  # u16 on disk
    _, bits = gettifinfo(str(tmp_path / "i16.tif"))
    assert bits == 16
    writetifstack(str(tmp_path / "p.tif"), psf, 32)
    rc = main(["-i", str(tmp_path / "i16.tif"), "-fp", str(tmp_path / "p.tif"),
               "-o", str(tmp_path / "o16.tif"), "-it", "3", "-verbOFF"])
    assert rc == 0
    # output bit depth defaults to the input's (16)
    _, bits_out = gettifinfo(str(tmp_path / "o16.tif"))
    assert bits_out == 16
    out, _ = readtifstack(str(tmp_path / "o16.tif"))
    assert out.max() > 0


def test_gen_bp_cli(tmp_path):
    from microimagelib_tpu.cli.gen_bp import main
    from microimagelib_tpu.io.tiff import readtifstack

    psf = gaussian_psf((7, 7, 7), 1.3)
    writetifstack(str(tmp_path / "p.tif"), psf, 32)
    rc = main(["-fp", str(tmp_path / "p.tif"), "-o", str(tmp_path / "bp.tif"),
               "-method", "wiener-butterworth", "-alpha", "0.01", "-beta", "0.1", "-n", "8"])
    assert rc == 0
    bp, size = readtifstack(str(tmp_path / "bp.tif"))
    assert bp.shape == psf.shape
    assert abs(bp.sum() - 1.0) < 0.1


def test_spim_fusion_batch_cli_mesh(tmp_path, monkeypatch):
    from microimagelib_tpu.cli.spim_fusion_batch import main

    psf = gaussian_psf((5, 5, 5), 1.0)
    (tmp_path / "A").mkdir()
    (tmp_path / "B").mkdir()
    for t in range(2):
        vol = blobs((16, 16, 16), n=5, seed=40 + t)
        writetifstack(str(tmp_path / "A" / f"a_{t}.tif"), vol, 32)
        writetifstack(str(tmp_path / "B" / f"b_{t}.tif"), np.roll(vol, 1, axis=2), 32)
    writetifstack(str(tmp_path / "p.tif"), psf, 32)
    monkeypatch.setenv("MIL_MESH", "2,2")
    args = [
        str(tmp_path / "out"), str(tmp_path / "A"), str(tmp_path / "B"),
        "a_", "b_", "0", "1", "1", "0",
        "1", "1", "1", "1", "1", "1",
        "3", "0", "0", "none", "0.0001", "150",
        "0", "0", str(tmp_path / "p.tif"), str(tmp_path / "p.tif"), "2",
        "0", "0", "0", "0", "0", "32", "0", "0",
    ]
    assert main(args) == 0
    assert (tmp_path / "out" / "Decon" / "Decon_0.tif").exists()
    assert (tmp_path / "out" / "Decon" / "Decon_1.tif").exists()


def test_reg3d_cli_settings_banner(tmp_path, capsys):
    from microimagelib_tpu.cli.reg3d import main

    vol = blobs((16, 16, 16), n=6, seed=3)
    moved = np.roll(vol, 1, axis=2)
    writetifstack(str(tmp_path / "t.tif"), vol, 32)
    writetifstack(str(tmp_path / "s.tif"), moved, 32)
    rc = main(["-t", str(tmp_path / "t.tif"), "-s", str(tmp_path / "s.tif"),
               "-o", str(tmp_path / "r.tif"), "-regc", "2", "-affm", "1",
               "-verbOFF"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "=== Registration settings ..." in out
    assert "Registration choice: affine registration" in out
    assert "Affine registration method: translation only" in out
    assert "Tolerance or threshold" in out
    assert "Output image bit: 32 bit" in out


def test_reg3d_cli_u16_native_journey(tmp_path):
    from microimagelib_tpu.cli.reg3d import main
    from microimagelib_tpu.io.tiff import gettifinfo, readtifstack_16to16
    from microimagelib_tpu.models.registration import atrans3dgpu_16bit

    vol = (blobs((16, 16, 16), n=6, seed=4) * 50 + 100).astype(np.uint16)
    moved = np.roll(vol, 2, axis=2)
    writetifstack(str(tmp_path / "t.tif"), vol.astype(np.float32), 16)
    writetifstack(str(tmp_path / "s.tif"), moved.astype(np.float32), 16)
    rc = main(["-t", str(tmp_path / "t.tif"), "-s", str(tmp_path / "s.tif"),
               "-o", str(tmp_path / "r.tif"), "-regc", "1",
               "-otmx", str(tmp_path / "m.tmx"), "-verbOFF"])
    assert rc == 0
    # output stays 16-bit and matches the u16 transform path applied to
    # the re-read u16 source (reference:src/api_reg.cpp:87-113 semantics)
    _, bits = gettifinfo(str(tmp_path / "r.tif"))
    assert bits == 16
    out_u16, _ = readtifstack_16to16(str(tmp_path / "r.tif"))
    src_u16, _ = readtifstack_16to16(str(tmp_path / "s.tif"))
    m = read_tmx(str(tmp_path / "m.tmx"))
    expect = atrans3dgpu_16bit(src_u16, m, (16, 16, 16))
    np.testing.assert_array_equal(out_u16, expect)


def test_decon_sv_cli_settings_banner(tmp_path, capsys):
    from microimagelib_tpu.cli.decon_sv import main

    img = blobs((16, 16, 16), n=6, seed=5) + 10
    psf = gaussian_psf((5, 5, 5), 1.0)
    writetifstack(str(tmp_path / "i.tif"), img, 32)
    writetifstack(str(tmp_path / "p.tif"), psf, 32)
    rc = main(["-i", str(tmp_path / "i.tif"), "-fp", str(tmp_path / "p.tif"),
               "-o", str(tmp_path / "d.tif"), "-it", "3", "-verbOFF"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "=== Deconvolution settings ..." in out
    assert "Iteration number of the deconvolution: 3" in out
    assert "Memory mode: -1" in out


def test_spim_fusion_batch_cli_bg_subtraction(tmp_path, monkeypatch):
    """MIL_BATCH_BG1/2 camera-background subtraction (the working version
    of the reference's dead -bg flags, reference:src/spim_fusion.cpp:194-202):
    stacks with a constant +100 camera offset, run with bg1=bg2=100, must
    produce bit-identical outputs to the offset-free stacks run without
    subtraction (the subtracted inputs are numerically identical)."""
    from microimagelib_tpu.cli.spim_fusion_batch import main

    psf = gaussian_psf((5, 5, 5), 1.0)
    writetifstack(str(tmp_path / "p1.tif"), psf, 32)
    writetifstack(str(tmp_path / "p2.tif"), psf, 32)

    def make_inputs(root, offset):
        (root / "A").mkdir(parents=True)
        (root / "B").mkdir(parents=True)
        vol = blobs((12, 12, 12), n=5, seed=77)
        writetifstack(str(root / "A" / "a_0.tif"), vol + offset, 32)
        writetifstack(str(root / "B" / "b_0.tif"),
                      np.roll(vol, 1, axis=2) + offset, 32)

    def run(root, out):
        args = [
            str(out), str(root / "A"), str(root / "B"),
            "a_", "b_", "0", "0", "1", "0",
            "1", "1", "1", "1", "1", "1",
            "3", "0", "0", "none", "0.0001", "200",
            "0", "0", str(tmp_path / "p1.tif"), str(tmp_path / "p2.tif"), "2",
            "0", "0", "1", "0", "0", "32", "0", "0",
        ]
        assert main(args) == 0
        dec, _ = readtifstack(str(out / "Decon" / "Decon_0.tif"))
        return dec

    clean_root = tmp_path / "clean"
    make_inputs(clean_root, 0.0)
    monkeypatch.delenv("MIL_BATCH_BG1", raising=False)
    monkeypatch.delenv("MIL_BATCH_BG2", raising=False)
    ref = run(clean_root, tmp_path / "out_clean")

    offs_root = tmp_path / "offs"
    make_inputs(offs_root, 100.0)
    monkeypatch.setenv("MIL_BATCH_BG1", "100")
    monkeypatch.setenv("MIL_BATCH_BG2", "100")
    got = run(offs_root, tmp_path / "out_bg")
    np.testing.assert_array_equal(got, ref)
