"""Benchmark: RL-deconvolution iterations/second on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Config (BASELINE.json north star): joint-decon-grade single-view RL at
512^3 in float32 — two circular convs + elementwise per iteration,
dispatched like the library dispatches them (the separable compact-PSF
Pallas kernel for this 9^3 Gaussian PSF; FFT paths for general PSFs).
The first call warms up the exact program (axon device program load
takes minutes; see .claude/skills/verify/SKILL.md); the timed run
reuses it.

vs_baseline: the reference repo publishes no numbers (BASELINE.md), so the
baseline is the documented estimate of the CUDA reference on its own
era's hardware: ~2.0 RL iterations/s at 512^3 (4 x ~60 ms cuFFT R2C/C2R
512^3 on a CUDA-10-class GPU plus elementwise + full-sync launches).

Env overrides: MIL_BENCH_SIZE (default 512), MIL_BENCH_ITERS (default 10).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_ITERS_PER_SEC = 2.0  # documented estimate, see BASELINE.md


def main():
    size = int(os.environ.get("MIL_BENCH_SIZE", "512"))
    n_iters = int(os.environ.get("MIL_BENCH_ITERS", "10"))

    import jax

    cache_dir = os.environ.get("MIL_TPU_CACHE", os.path.expanduser("~/.cache/jax_comp_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    from microimagelib_tpu.models.deconvolution import gen_otf, rl_decon_single

    shape = (size, size, size)
    rng = np.random.default_rng(0)
    # bead-like volume, strictly positive
    img = (rng.random(shape, dtype=np.float32) * 100.0 + 1.0).astype(np.float32)
    zz, yy, xx = np.meshgrid(*[np.arange(9) - 4] * 3, indexing="ij")
    psf = np.exp(-(xx**2 + yy**2 + zz**2) / 4.5).astype(np.float32)
    psf /= psf.sum()

    img_d = jnp.asarray(img)
    otf = gen_otf(jnp.asarray(psf), shape)
    otf_bp = gen_otf(jnp.asarray(psf[::-1, ::-1, ::-1]), shape)
    otf.block_until_ready()

    # Warm up the exact program (compile + device program load) AND the
    # scalar-gather program used to force completion: on the axon backend
    # block_until_ready can return before execution finishes, so timings
    # must be fenced by fetching a value derived from the result.
    out = rl_decon_single(img_d, otf, otf_bp, n_iters,
                          psf=psf, psf_bp=psf[::-1, ::-1, ::-1])
    _ = float(out.ravel()[0])

    n_trials = 3
    t0 = time.perf_counter()
    for _i in range(n_trials):
        out = rl_decon_single(img_d, otf, otf_bp, n_iters,
                              psf=psf, psf_bp=psf[::-1, ::-1, ::-1])
        _ = float(out.ravel()[0])
    dt = (time.perf_counter() - t0) / n_trials

    iters_per_sec = n_iters / dt
    print(json.dumps({
        "metric": f"rl_decon_iters_per_sec_{size}cubed",
        "value": round(iters_per_sec, 4),
        "unit": "iterations/s",
        "vs_baseline": round(iters_per_sec / BASELINE_ITERS_PER_SEC, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
