"""Hardware accuracy gate for the banded separable RL conv.

The banded 2-tile-window circulant rewrite (ops/conv_sep.py) was
exactness-tested on CPU via Pallas interpret mode; this script confirms
the Mosaic-COMPILED kernel agrees with the XLA-FFT oracle on the real
TPU, on a grid where XLA's FFT is accurate (2^23 voxels — BASELINE.md:
the 3D-FFT defect starts at 2^24) and where both x and y go banded
(256-multiple axes). Run via tools/hw_measure_s3.sh.

Pass bar: 10-iter RL max relative difference <= 1e-4 (the round-3
measured value for the dense sep path was 2.1e-5).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    cache_dir = os.environ.get(
        "MIL_TPU_CACHE", os.path.expanduser("~/.cache/jax_comp_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from microimagelib_tpu.models.deconvolution import gen_otf, rl_decon_single

    shape = (128, 256, 256)          # 2^23 voxels: XLA FFT accurate here
    rng = np.random.default_rng(7)
    img = rng.uniform(10.0, 200.0, size=shape).astype(np.float32)

    r, sigma = 4, 1.5
    z, y, x = np.mgrid[-r:r + 1, -r:r + 1, -r:r + 1]
    psf = np.exp(-(x * x + y * y + z * z) / (2 * sigma ** 2)).astype(np.float32)
    psf /= psf.sum()
    psf_bp = psf[::-1, ::-1, ::-1]

    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    img_d = jax.device_put(img, dev)
    otf = gen_otf(psf, shape)
    otf_bp = gen_otf(psf_bp, shape, normalize=False)

    os.environ["MIL_CONV_SEP"] = "0"
    os.environ["MIL_FFT_IMPL"] = "xla"
    ref = np.asarray(rl_decon_single(img_d, otf, otf_bp, 10))

    os.environ["MIL_CONV_SEP"] = "1"
    sep = np.asarray(rl_decon_single(img_d, otf, otf_bp, 10, psf=psf,
                                     psf_bp=psf_bp))
    os.environ["MIL_CONV_SEP"] = "auto"
    os.environ["MIL_FFT_IMPL"] = "auto"

    denom = max(abs(ref).max(), 1e-6)
    rel = np.abs(sep - ref).max() / denom
    print(f"10-iter RL sep-vs-XLA-FFT max rel diff: {rel:.3e}", flush=True)
    if not np.isfinite(rel) or rel > 1e-4:
        print("FAIL: banded sep conv disagrees with the FFT oracle on TPU")
        return 1
    print("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
