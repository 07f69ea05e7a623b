"""Re-derive the separable-conv machine model for the round-4 kernel
(VERDICT r4 weak #3): the rolling-window z-FMA-first rework (fa64506)
made bench.py's 512^3 headline land BELOW the round-3 documented
~14 ms/iter "roofline", so that model is stale. This probe measures, on
the real TPU, in one process:

  1. ms/iter of the exact bench.py workload (easy 9^3 Gaussian, rank-1
     banded plan) via the library dispatch, chained + fetch-fenced;
  2. ms/call of each fused stage standalone (ratio / update modes),
     chained so dispatch overhead amortizes;
  3. the HBM bandwidth ceiling OF THIS PIPELINE SHAPE: a pallas kernel
     with the conv's exact BlockSpec structure (one rolling input slab +
     one aux slab in, one slab out, same zb/grid) doing NO math — the
     achievable bytes/s for the conv's DMA pattern, which round-3's
     generic copy probe (177 GB/s) understated;
  4. an XLA elementwise chained pass at 2 GiB for the generic-BW row.

From these it prints the traffic/FLOPs model and what fraction of each
bound the measured kernel reaches. Output: one JSON line per metric.

Traffic model per conv3_sep call at (nz, ny, nx) f32 (see
ops/conv_sep.py::_conv3_sep): v read (g+lag slabs) + aux read (g+lag)
+ out write (g slabs) ~= 3 volume passes; one RL iteration = 2 calls
= ~6 passes = 6*nz*ny*nx*4 bytes. MXU model per call per rank with both
axes banded: bf16x3 (3 matmuls) x 2 passes (x right-mul + y left-mul)
x 2*N*256 MAC-FLOPs per output element, N = nz*ny*nx.
"""

import json
import os
import sys
import time
from functools import partial

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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from microimagelib_tpu.models.deconvolution import gen_otf, rl_decon_single
    from microimagelib_tpu.ops.conv_sep import conv3_sep, plan_sep_pair

    size = int(os.environ.get("MIL_BENCH_SIZE", "512"))
    shape = (size, size, size)
    vox = size ** 3
    vol_gb = vox * 4 / 1e9
    rng = np.random.default_rng(0)
    img = jnp.asarray((rng.random(shape, dtype=np.float32) * 100 + 1)
                      .astype(np.float32))

    zz, yy, xx = np.meshgrid(*[np.arange(9) - 4] * 3, indexing="ij")
    psf = np.exp(-(xx ** 2 + yy ** 2 + zz ** 2) / 4.5).astype(np.float32)
    psf /= psf.sum()
    bp = psf[::-1, ::-1, ::-1]

    # --- 1. bench.py workload: 10-iter RL via the library dispatch -----
    otf = gen_otf(jnp.asarray(psf), shape)
    otf_bp = gen_otf(jnp.asarray(bp), shape)
    out = rl_decon_single(img, otf, otf_bp, 10, psf=psf, psf_bp=bp)
    _ = float(out.ravel()[0])
    best = np.inf
    for _i in range(3):
        t0 = time.perf_counter()
        out = rl_decon_single(img, otf, otf_bp, 10, psf=psf, psf_bp=bp)
        _ = float(out.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    ms_iter = best * 100.0
    emit("rl512_ms_per_iter", ms_iter, "ms")

    # --- 2. standalone fused stages, chained x10 -----------------------
    pair = plan_sep_pair(psf, bp, shape)
    assert pair is not None
    pf, pb = pair
    emit("plan_fwd_rank", pf.meta[3], "rank")
    emit("plan_banded", int(pf.meta[6] is not None and pf.meta[7] is not None),
         "bool")

    def chain_ratio(v, aux, n):
        for _ in range(n):
            v = conv3_sep(v, pf, aux=aux, mode="ratio")
        return v

    def chain_update(v, aux, n):
        for _ in range(n):
            v = conv3_sep(v, pb, aux=aux, mode="update")
        return v

    for name, fn, plan in (("ratio", chain_ratio, pf),
                           ("update", chain_update, pb)):
        r = fn(img, img, 10)
        _ = float(r.ravel()[0])
        best = np.inf
        for _i in range(3):
            t0 = time.perf_counter()
            r = fn(img, img, 10)
            _ = float(r.ravel()[0])
            best = min(best, time.perf_counter() - t0)
        ms = best * 100.0
        emit(f"conv_{name}_ms_per_call", ms, "ms")

    # --- 3. pipeline-shaped DMA ceiling --------------------------------
    # same grid/BlockSpec skeleton as _conv3_sep (rolling input slab with
    # lookahead, aux slab, output slab) but the emit copies aux through.
    zb, g = pf.meta[0], size // pf.meta[0]
    la, lb = -(-pf.meta[1] // zb), -(-pf.meta[2] // zb)
    lag = la + lb

    interp = jax.default_backend() != "tpu"

    def copy_kernel(v_ref, aux_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i >= lag)
        def _():
            o_ref[...] = aux_ref[...] + v_ref[...] * 1e-6

    @partial(jax.jit, static_argnames=())
    def pipe_copy(v, aux):
        in_spec = pl.BlockSpec((zb, size, size),
                               lambda i: ((i + g - la) % g, 0, 0),
                               memory_space=pltpu.VMEM)
        out_map = lambda i: (jnp.maximum(i - lag, 0), 0, 0)  # noqa: E731
        return pl.pallas_call(
            copy_kernel,
            grid=(g + lag,),
            in_specs=[in_spec,
                      pl.BlockSpec((zb, size, size), out_map,
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((zb, size, size), out_map,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interp,
        )(v, aux)

    r = img
    for _ in range(10):
        r = pipe_copy(r, img)
    _ = float(r.ravel()[0])
    best = np.inf
    for _i in range(3):
        t0 = time.perf_counter()
        r = img
        for _ in range(10):
            r = pipe_copy(r, img)
        _ = float(r.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    ms_copy = best * 100.0
    bw_pipe = 3 * vol_gb / (ms_copy / 1e3)
    emit("pipe_copy_ms_per_call", ms_copy, "ms")
    emit("pipe_copy_bw", bw_pipe, "GB/s")

    # --- 4. generic XLA elementwise BW at 2 GiB -------------------------
    nbig = (1 << 29) if size >= 512 else (1 << 24)
    big = jnp.asarray(rng.random((nbig,), dtype=np.float32))  # 2 GiB

    @jax.jit
    def mulc(x):
        return x * np.float32(1.0000001)

    r = big
    for _ in range(6):
        r = mulc(r)
    _ = float(r[0])
    t0 = time.perf_counter()
    r = big
    for _ in range(6):
        r = mulc(r)
    _ = float(r[0])
    dt = (time.perf_counter() - t0) / 6
    emit("xla_elementwise_bw", 2 * nbig * 4 / 1e9 / dt, "GB/s")

    # --- model ----------------------------------------------------------
    # per call: 3 volume passes (+ lookahead refetch lag*zb rows)
    traffic_call = (3 + lag * zb / size) * vol_gb
    rank = pf.meta[3]
    flops_call = rank * 3 * 2 * 2 * 256 * vox  # bf16x3, x+y passes
    emit("model_traffic_per_iter", 2 * traffic_call, "GB")
    emit("model_mxu_tflops_per_iter", 2 * flops_call / 1e12, "TFLOP")
    emit("achieved_bw_vs_model", 2 * traffic_call / (ms_iter / 1e3), "GB/s")
    emit("pct_of_pipe_copy_ceiling",
         100.0 * (2 * traffic_call / (ms_iter / 1e3)) / bw_pipe, "%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
