"""Real-data end-to-end surrogate for the diSPIMFusion dataset run
(round-4 verdict #5).

The reference's de-facto E2E test runs spimFusionBatch on the published
diSPIMFusion sample data (reference:sh_spimFusionBatch.sh:1-21,
reference:README.md:56-78) with MEASURED PSF files
(reference:src/decon_sv.cpp:51-54). That dataset is not fetchable here
(zero egress), so this script builds the closest physics surrogate and
drives the batch CLI exactly as a reference user would:

  * u16 camera stacks: Poisson shot noise + Gaussian read noise
    (sigma ~2 e-) + a constant sCMOS baseline offset (100 counts),
    quantized to uint16
  * a CURVED, TILTED, ASYMMETRIC detection PSF with a background floor —
    the measured-PSF class (tilted mean axis, z-dependent lateral
    centroid curvature, anisotropic widths, non-zero pedestal)
  * anisotropic dual views (pixel 0.1625/0.1625/1.0 um, imgRotation=-1)
    with per-timepoint sub-voxel drift, so regMode 2's dependent
    registration genuinely tracks
  * the spimFusionBatch CLI (positional ImageJ protocol) as a
    subprocess, 16-bit outputs

Asserts the full output tree + ProcessingLog contents and prints one
JSON line per metric (mean per-timepoint NCC from the log, total wall,
tp/min) for BASELINE.md.

Usage:  python tools/e2e_surrogate.py [n_timepoints] [--cpu] [--xy N]
        (--xy shrinks the lateral extent for quick plumbing checks; the
        recorded BASELINE.md row uses the default 96 on the TPU)
"""

import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASELINE_OFFSET = 100.0  # sCMOS fixed offset, counts
READ_NOISE = 2.0         # e- rms
PEAK_COUNTS = 2500.0     # brightest-structure photon count (typical sCMOS
                         # light-sheet exposure; peak SNR ~50)


def curved_tilted_psf(p=(19, 11, 27), sl=3.6, ss=1.1, st=1.3,
                      curve=0.045, floor=2e-4):
    """Measured-class detection PSF surrogate: the lateral centroid
    drifts linearly (tilt) AND quadratically (focal curvature) with z,
    widths are anisotropic and asymmetric between the two lateral axes,
    and a constant background pedestal rides on top (real PSF stacks
    are measured off beads and never reach zero)."""
    z = np.arange(p[0]) - p[0] // 2
    y = np.arange(p[1]) - p[1] // 2
    x = np.arange(p[2]) - p[2] // 2
    zz, yy, xx = np.meshgrid(z, y, x, indexing="ij")
    # tilt + curvature: lateral center as a function of z
    xc = 0.9 * zz + curve * zz ** 2
    yc = 0.15 * zz
    u = (xx - xc) / np.sqrt(2.0)
    w = (xx - xc) * 0.0 + zz / np.sqrt(2.0)
    g = np.exp(-(u + w) ** 2 / (2 * sl ** 2)
               - (u - w) ** 2 / (2 * ss ** 2)
               - (yy - yc) ** 2 / (2 * st ** 2)).astype(np.float32)
    g = g + floor * g.max()
    return (g / g.sum()).astype(np.float32)


def _blobs(shape, n=40, seed=0, sigma=2.5):
    rng = np.random.default_rng(seed)
    vol = np.zeros(shape, dtype=np.float32)
    for _ in range(n):
        z, y, x = (rng.integers(s // 4, 3 * s // 4) for s in shape)
        vol[z, y, x] = rng.uniform(80, 200)
    zz, yy, xx = np.meshgrid(*[np.arange(s) - s // 2 for s in shape],
                             indexing="ij")
    g = np.exp(-(xx ** 2 + yy ** 2 + zz ** 2) / (2 * sigma ** 2))
    g = np.roll(g / g.sum(), [-s // 2 for s in shape], axis=(0, 1, 2))
    return np.fft.irfftn(np.fft.rfftn(vol) * np.fft.rfftn(g), s=shape,
                         axes=(0, 1, 2)).astype(np.float32)


def _axial_blur(v, sigma, axis=0):
    n = v.shape[axis]
    k = np.exp(-(np.arange(n) - n // 2) ** 2 / (2.0 * sigma * sigma))
    k /= k.sum()
    kf = np.fft.rfft(np.roll(k, -(n // 2)))
    shape = [1, 1, 1]
    shape[axis] = -1
    return np.fft.irfft(np.fft.rfft(v, axis=axis) * kf.reshape(shape),
                        n=n, axis=axis).astype(np.float32)


def camera(v, rng):
    """Float photon image -> u16 camera frame: Poisson shot noise +
    Gaussian read noise + baseline offset, clipped/quantized. ``v`` must
    already be in photon counts (build_inputs normalizes the clean
    stacks to PEAK_COUNTS)."""
    photons = np.clip(v, 0, None)
    counts = rng.poisson(photons).astype(np.float32)
    counts += rng.normal(0.0, READ_NOISE, counts.shape).astype(np.float32)
    counts += BASELINE_OFFSET
    return np.clip(np.round(counts), 0, 65535).astype(np.uint16)


def build_inputs(root, n_t, xy=96, seed=11):
    import jax

    if os.environ.get("MIL_PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from microimagelib_tpu.io.tiff import writetifstack
    from microimagelib_tpu.ops.affine import affine_transform_3d
    from microimagelib_tpu.ops.basics import rot_by_y_axis
    from microimagelib_tpu.ops.matrix import dof_to_matrix

    rng = np.random.default_rng(seed)
    in1 = os.path.join(root, "SPIMA")
    in2 = os.path.join(root, "SPIMB")
    os.makedirs(in1)
    os.makedirs(in2)
    ratio = 1.0 / 0.1625
    g = _blobs((xy, xy, xy), n=60, seed=seed)
    zsamp = np.round(np.arange(0, xy - 1e-6, ratio)).astype(int)
    a_f = np.ascontiguousarray(_axial_blur(g, ratio / 2.0)[zsamp])
    b_full = np.asarray(rot_by_y_axis(jnp.asarray(g), 1))
    b_f = np.ascontiguousarray(_axial_blur(b_full, ratio / 2.0)[zsamp])
    # one shared photon normalization (keeps A/B relative intensity)
    scale = PEAK_COUNTS / max(a_f.max(), 1e-6)
    a_f = a_f * scale
    b_f = b_f * scale
    b_dev = jnp.asarray(b_f)
    for t in range(n_t):
        writetifstack(os.path.join(in1, f"SPIMA_{t}.tif"),
                      camera(a_f * (1 + 0.01 * t), rng), 16)
        if t > 0:
            m = dof_to_matrix([0.12 * t, -0.08 * t, 0.03 * t,
                               0.0, 0.0, 0.04 * t, 1.0, 1.0, 1.0], 6)
            b_t = np.asarray(affine_transform_3d(b_dev, m, b_f.shape))
        else:
            b_t = b_f
        writetifstack(os.path.join(in2, f"SPIMB_{t}.tif"),
                      camera(b_t * (1 + 0.01 * t), rng), 16)
    psf = curved_tilted_psf()
    writetifstack(os.path.join(root, "psf.tif"), psf, 32)
    return in1, in2


def main():
    n_t = 5
    xy = 96
    args = [a for a in sys.argv[1:]]
    if "--cpu" in args:
        os.environ["MIL_PLATFORM"] = "cpu"
        args.remove("--cpu")
    if "--xy" in args:
        i = args.index("--xy")
        xy = int(args[i + 1])
        del args[i:i + 2]
    if args:
        n_t = int(args[0])
    root = tempfile.mkdtemp(prefix="mil_e2e_")
    try:
        in1, in2 = build_inputs(root, n_t, xy=xy)
        out = os.path.join(root, "out")
        # the ImageJ positional protocol (reference:src/spim_fusion_batch.
        # cpp:67-113): outDir in1 in2 name1 name2 start end interval test
        # px1 py1 pz1 px2 py2 pz2 regMode rotation flagTmx tmxFile ftol
        # itLimit saveRegA saveRegB psf1 psf2 itDecon saveMPx saveMPy
        # saveMPz save3DX save3DY bit query dev
        cmd = [sys.executable, "-m", "microimagelib_tpu.cli.spim_fusion_batch",
               out, in1, in2, "SPIMA_", "SPIMB_", "0", str(n_t - 1), "1", "0",
               "0.1625", "0.1625", "1.0", "0.1625", "0.1625", "1.0",
               "2", "-1", "0", "none", "0.0001", "3000", "0", "0",
               os.path.join(root, "psf.tif"), os.path.join(root, "psf.tif"),
               "10", "0", "0", "1", "0", "1", "16", "0", "0"]
        env = dict(os.environ)
        env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))) + os.pathsep
            + env.get("PYTHONPATH", ""))
        # subtract the known camera baseline (users estimate it from dark
        # frames; the ImageJ side normally pre-subtracts — without it a
        # constant offset wrecks the NCC objective over the zero-filled
        # resample boundary, and the reference's -bg flags are dead code)
        env["MIL_BATCH_BG1"] = str(BASELINE_OFFSET)
        env["MIL_BATCH_BG2"] = str(BASELINE_OFFSET)
        t0 = time.perf_counter()
        proc = subprocess.run(cmd, env=env, capture_output=True, text=True)
        wall = time.perf_counter() - t0
        if proc.returncode != 0:
            print(proc.stdout[-3000:])
            print(proc.stderr[-3000:])
            raise SystemExit(f"batch CLI failed rc={proc.returncode}")
        # --- assertions: full output tree + log contents ---
        from microimagelib_tpu.io.tiff import gettifinfo
        log = open(os.path.join(out, "ProcessingLog.txt")).read()
        assert "dependently" in log, "regMode-2 header missing"
        for t in range(n_t):
            p = os.path.join(out, "Decon", f"Decon_{t}.tif")
            assert os.path.exists(p), p
            _, bits = gettifinfo(p)
            assert bits == 16, f"expected u16 decon output, got {bits}"
            assert os.path.exists(os.path.join(out, "TMX", f"Matrix_{t}.tmx"))
            assert os.path.exists(
                os.path.join(out, "Decon", "MP_ZProj", f"MP_XY_{t}.tif"))
            assert os.path.exists(
                os.path.join(out, "Decon", "MP_3D_Yaxis",
                             f"MP_3D_Yaxis_{t}.tif"))
        nccs = [float(v) for v in
                re.findall(r"final cost function value: ([0-9.eE+-]+)", log)]
        assert len(nccs) == n_t
        mean_ncc = sum(nccs) / len(nccs)
        # the noisy u16 views must still register well — the cascade
        # never fell back to identity on this data
        assert min(nccs) > 0.5, f"registration degraded: {nccs}"
        for metric, value, unit in (
                ("e2e_surrogate_mean_final_ncc", mean_ncc, "ncc"),
                ("e2e_surrogate_min_final_ncc", min(nccs), "ncc"),
                ("e2e_surrogate_wall_s", wall, "s"),
                ("e2e_surrogate_tp_per_min", 60.0 * n_t / wall, "tp/min")):
            print(json.dumps({"metric": metric, "value": round(value, 4),
                              "unit": unit, "vs_baseline": 0.0}), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
