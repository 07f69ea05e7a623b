"""Stage-level profile of the fusion1tp bench workload on the current
backend, plus finisher/pyramid A/Bs — feeds the session-3 decisions on
MIL_REG_PYRAMID_MID / MIL_REG_GRAD_FINISH defaults.

Usage: python tools/profile_fusion.py [base|nofinish|mid|mid_nofinish]
(no arg = base). Each variant should run in its OWN process (env knobs
are read at trace time and cached engine decisions key on them only
partially; also one TPU process at a time).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    if variant in ("mid", "mid_nofinish"):
        os.environ["MIL_REG_PYRAMID_MID"] = "1"
    if variant in ("nofinish", "mid_nofinish"):
        os.environ["MIL_REG_GRAD_FINISH"] = "0"

    import jax

    cache_dir = os.environ.get(
        "MIL_TPU_CACHE", os.path.expanduser("~/.cache/jax_comp_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import bench_all
    from microimagelib_tpu.models.deconvolution import decon_dualview
    from microimagelib_tpu.models.fusion import preprocess_views
    from microimagelib_tpu.models.registration import checkmatrix, reg3d

    a, b = bench_all._anisotropic_views()
    psf = bench_all._gauss_psf(r=3, sigma=1.2)
    kw = dict(pixel_a=(0.1625, 0.1625, 1.0), pixel_b=(0.1625, 0.1625, 1.0),
              im_rotation=-1)

    def run(label):
        t0 = time.perf_counter()
        ai, bi = preprocess_views(a, b, kw["pixel_a"], kw["pixel_b"],
                                  kw["im_rotation"], as_device=True)
        np.asarray(ai[0, 0, 0])  # fence
        t1 = time.perf_counter()
        reg_b, tmx, rec = reg3d(ai, bi, 2, 7, False, None, 1e-4, 3000)
        np.asarray(reg_b[0, 0, 0])
        t2 = time.perf_counter()
        sz, sy, sx = ai.shape
        ok = checkmatrix(tmx, sx, sy, sz)
        drec = np.zeros(10)
        dec = decon_dualview(ai, reg_b, psf, psf, n_iters=10, records=drec)
        np.asarray(dec[0, 0, 0])
        t3 = time.perf_counter()
        print(f"[{label}] iso_shape={tuple(ai.shape)} total={t3 - t0:.3f}s "
              f"pre={t1 - t0:.3f}s reg={t2 - t1:.3f}s decon={t3 - t2:.3f}s "
              f"ncc={rec[3]:.4f} checkmatrix={ok} "
              f"reg_records[4:8]={np.asarray(rec[4:8]).round(4).tolist()}",
              flush=True)

    run(f"{variant}/cold")
    run(f"{variant}/warm")
    run(f"{variant}/warm2")
    return 0


if __name__ == "__main__":
    sys.exit(main())
