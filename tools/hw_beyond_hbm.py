"""Prove the beyond-HBM tiers on the real device (VERDICT r4 #7).

The streamed RL decon (models/decon_streamed.py) and the lowmem
registration (models/registration.py::_reg3d_affine_lowmem) replace the
reference's host-staged ``gpuMemMode 2`` variants
(``decon_singleview_OTF2`` reference:src/api_subfunc.cu:3468-3516,
``reg3d_affine2`` :2995-3266) — but until round 5 they were CPU-tested
only. This probe runs both at shapes whose mode-1 working sets genuinely
exceed the chip's HBM, on the real TPU, one process:

  1. host<->device transfer bandwidth (the streamed tiers are built on
     it; the axon tunnel's rate decides what polish budget is sane);
  2. streamed single-view RL at (696, 1016, 1016) f32 (mode-1 single
     working set ~6 FFT-grid buffers ~ 18 GB > HBM) — auto mem_mode must
     select the streamed tier (records[0] == 2);
  3. lowmem registration at (768, 1024, 1024) f32 pairs (5-volume ladder
     working set ~16 GB > 0.92 * budget): host-pooled coarse ladder +
     streamed full-res polish + streamed final transform, recovering a
     known integer translation.

The claim is CAPABILITY at beyond-HBM shapes (the VERDICT's words:
"even if slow"); the polish eval budget adapts to the measured
bandwidth so the run stays inside the timeout, and the chosen budget is
recorded. Output: one JSON line per metric.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def emit(metric, value, unit):
    print(json.dumps({"metric": metric, "value": round(float(value), 4),
                      "unit": unit}), flush=True)


def main():
    import jax

    if os.environ.get("MIL_PLATFORM"):  # CPU plumbing smoke
        jax.config.update("jax_platforms", os.environ["MIL_PLATFORM"])
    cache = os.environ.get("MIL_TPU_CACHE",
                           os.path.expanduser("~/.cache/jax_comp_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from microimagelib_tpu.models.deconvolution import hbm_budget_bytes

    budget = hbm_budget_bytes(None)
    emit("hbm_budget_gb", (budget or 0) / 1e9, "GB")

    # --- 1. transfer bandwidth (256 MiB each way, fenced) --------------
    host = np.random.default_rng(0).random((64, 1024, 1024),
                                           dtype=np.float32)  # 256 MiB
    host2 = host * 1.000001             # distinct buffer, pre-built
    dev = jnp.asarray(host)
    _ = float(dev.ravel()[0])          # warm + fence
    t0 = time.perf_counter()
    dev = jnp.asarray(host2)
    _ = float(dev.ravel()[0])
    up = 0.268435456 / (time.perf_counter() - t0)
    # d2h: fetch a DEVICE-COMPUTED buffer (fetching a device_put result
    # returns the backend's cached host copy and measures nothing)
    dev2 = dev * np.float32(1.000001)
    _ = float(dev2.ravel()[0])          # fence the compute
    t0 = time.perf_counter()
    back = np.asarray(dev2)
    down = 0.268435456 / (time.perf_counter() - t0)
    del back, dev, dev2
    emit("h2d_bw", up, "GB/s")
    emit("d2h_bw", down, "GB/s")
    bw = min(up, down)

    # --- 2. streamed single-view RL beyond HBM -------------------------
    if os.environ.get("MIL_BHBM_SKIP_DECON", "0") != "1":
        from microimagelib_tpu.models.deconvolution import decon_singleview

        shp = tuple(int(s) for s in os.environ.get(
            "MIL_BHBM_DECON_SHAPE", "696,1016,1016").split(","))
        vol_gb = np.prod(shp) * 4 / 1e9
        # per iteration ~2 convs x ~6 grid-passes of transfer; pick the
        # iteration count that keeps the estimate under ~25 min
        est_per_iter = 12 * vol_gb * 1.1 / bw
        n_iters = 2 if est_per_iter * 2 < 1500 else 1
        emit("bhbm_decon_est_s_per_iter", est_per_iter, "s")
        rng = np.random.default_rng(1)
        img = (rng.random(shp, dtype=np.float32) * 100 + 1).astype(np.float32)
        zz, yy, xx = np.meshgrid(*[np.arange(9) - 4] * 3, indexing="ij")
        psf = np.exp(-(xx ** 2 + yy ** 2 + zz ** 2) / 4.5).astype(np.float32)
        psf /= psf.sum()
        rec = np.zeros(10)
        t0 = time.perf_counter()
        out = decon_singleview(img, psf, n_iters=n_iters, records=rec,
                               verbose=True)
        dt = time.perf_counter() - t0
        emit("bhbm_decon_mem_mode", rec[0], "mode")
        emit("bhbm_decon_iters", n_iters, "iters")
        emit("bhbm_decon_total_s", dt, "s")
        emit("bhbm_decon_s_per_iter", dt / n_iters, "s")
        assert rec[0] == 2, f"auto mem_mode picked {rec[0]}, not streamed"
        assert out.shape == shp and np.isfinite(out).all()
        emit("bhbm_decon_out_mean", float(out.mean()), "adu")
        del img, out

    # --- 3. lowmem registration beyond HBM -----------------------------
    if os.environ.get("MIL_BHBM_SKIP_REG", "0") != "1":
        from microimagelib_tpu.models.registration import reg3d_affine

        shp = tuple(int(s) for s in os.environ.get(
            "MIL_BHBM_REG_SHAPE", "768,1024,1024").split(","))
        vol_gb = np.prod(shp) * 4 / 1e9
        # each streamed polish eval moves ~2 volumes; budget the polish
        # so its transfer stays under ~10 min at the measured bandwidth
        evals = int(max(4, min(100, 600 * bw / (2 * vol_gb))))
        os.environ["MIL_REG_STREAM_BUDGET"] = str(evals)
        emit("bhbm_reg_polish_budget", evals, "evals")
        rng = np.random.default_rng(2)
        # correlation length must exceed the shift by a margin (an NCC
        # optimizer has no signal beyond the content's autocorrelation
        # support): block period = shp/32 (32 vox at the full scale)
        rep = max(4, shp[2] // 32)
        coarse = rng.random((shp[0] // rep, shp[1] // rep, shp[2] // rep),
                            dtype=np.float32) * 100
        img1 = coarse
        for ax in range(3):
            img1 = np.repeat(img1, rep, axis=ax)
        shift = tuple(int(s) for s in os.environ.get(
            "MIL_BHBM_REG_SHIFT", "5,9,7").split(","))  # (z, y, x) voxels
        img2 = np.roll(img1, shift, axis=(0, 1, 2))
        img2 = img2 + rng.standard_normal(img2.shape).astype(np.float32)
        t0 = time.perf_counter()
        _, tmx, rec = reg3d_affine(img1, img2, aff_method=1, ftol=1e-4,
                                   it_limit=3000, verbose=True,
                                   want_reg=False)
        dt = time.perf_counter() - t0
        emit("bhbm_reg_total_s", dt, "s")
        emit("bhbm_reg_coarse_ncc", rec[2], "ncc")
        emit("bhbm_reg_final_ncc", rec[3], "ncc")
        # tmx is the reference 12-vector 3x4 acting on (x, y, z):
        # translations at [3], [7], [11] should recover the (x, y, z)
        # shift magnitudes
        emit("bhbm_reg_tx", tmx[3], "vox")
        emit("bhbm_reg_ty", tmx[7], "vox")
        emit("bhbm_reg_tz", tmx[11], "vox")
        exp = np.array([shift[2], shift[1], shift[0]], np.float64)
        got = np.abs(np.array([tmx[3], tmx[7], tmx[11]]))
        emit("bhbm_reg_trans_max_err", float(np.abs(got - exp).max()), "vox")
    return 0


if __name__ == "__main__":
    sys.exit(main())
