"""Gradient registration engine: the affMethod DOF ladder driven by
L-BFGS over the ANALYTIC NCC gradient — one jitted program per ladder.

The reference is locked into derivative-free Powell because its cost is
sampled through CUDA texture units (reference:src/api_powell.c:119-360,
reference:include/cukernel.cuh:526-556). The TPU formulation of the same
fused resample+NCC is differentiable, and the Pallas kernel computes
cost AND d(cost)/d(matrix) in one pass (~2x a forward eval), so the same
local optimum is reached in ~100 evaluations instead of ~2000. Ladder
staging (3 -> 6 -> 9 -> 12 DOF with the reference's per-stage ftols),
the shared it_limit cap, and the cost>=1.001 abort are preserved; the
search direction machinery is the TPU-native deviation SURVEY.md §7
step 4 allows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from microimagelib_tpu.models.registration_device import (
    _full_dof,
    _make_cost,
    _make_cost_batch,
    dof_to_matrix_jnp,
    matrix_to_params_jnp,
    params_to_matrix_jnp,
)
from microimagelib_tpu.ops.lbfgs import lbfgs_minimize as _lbfgs_minimize
from microimagelib_tpu.ops.powell_device import powell_device


def _grad_impl(src_ms, tgt_ms, ncc_impl):
    """(ss, st, gs, gt) of a 12-vector matrix through the configured
    implementation: the Pallas grad kernel on TPU, XLA autodiff through
    the one-hot-matmul formulation elsewhere."""
    if ncc_impl == "pallas":
        from microimagelib_tpu.ops.pallas_corr import corr3d_grad_pallas

        def fn(m12):
            return corr3d_grad_pallas(src_ms, tgt_ms, m12)

        return fn

    from microimagelib_tpu.ops.affine import corr3d_partials as corr_gather
    from microimagelib_tpu.ops.affine_fast import corr3d_partials_mxu

    # VJP through the one-hot MXU formulation saves every lax.map
    # chunk's (rows, sx, sx) one-hot residuals — at wide volumes that
    # is catastrophic (200 GB requested at (384, 512, 512), round-5
    # beyond-HBM hardware). The gather formulation's VJP is a lean
    # scatter-add; use it beyond one 128-lane tile.
    base = corr3d_partials_mxu if src_ms.shape[-1] <= 128 else corr_gather

    def fn(m12):
        def f(m):
            ss, st = base(src_ms, tgt_ms, m)
            return jnp.stack([ss, st])

        vals, vjp = jax.vjp(f, m12)
        gs = 0.5 * vjp(jnp.array([1.0, 0.0], jnp.float32))[0]
        gt = vjp(jnp.array([0.0, 1.0], jnp.float32))[0]
        return vals[0], vals[1], gs, gt

    return fn


def _make_cost_grad_m(src_ms, tgt_ms, sd_t, ncc_impl):
    """m12 -> (cost, dcost/dm12) with cost = -(st/sqrt(ss))/sd_t.

    d cost/dm = -(gt/sqrt(ss) - st*gs/ss^1.5)/sd_t   (gs = d(ss/2)/dm)."""
    grad_fn = _grad_impl(src_ms, tgt_ms, ncc_impl)

    def cost_grad(m12):
        ss, st, gs, gt = grad_fn(m12)
        ssf = jnp.sqrt(ss)
        bad = ssf == 0
        safe = jnp.maximum(ssf, 1e-20)
        cost = jnp.where(bad, jnp.float32(2.0), -(st / safe) / sd_t)
        grad = jnp.where(bad, jnp.zeros(12, jnp.float32),
                         -(gt / safe - st * gs / jnp.maximum(ss * safe, 1e-20))
                         / sd_t)
        return cost, grad

    return cost_grad


def _stage_vg(cost_grad_m, to_matrix, scale):
    """Chain rule through a (differentiable) param->matrix map, with the
    search run in a PRECONDITIONED space q = p / scale: a unit move in
    any q component displaces voxels by about one voxel (linear matrix
    entries act through ~extent/2, so raw parameters are ~E/2-times
    stiffer than translations — quasi-Newton recovery from that
    conditioning costs hundreds of evals that the scaling removes)."""

    def vg(q):
        p = q * scale

        def h(pp):
            return to_matrix(pp)

        m, pullback = jax.vjp(h, p)
        c, gm = cost_grad_m(m)
        return c, pullback(gm)[0] * scale

    return vg


@partial(jax.jit, static_argnames=("aff_method", "ncc_impl", "finish",
                                   "batch_ls", "finish_sweeps",
                                   "ls_max_iters", "ls_patience"))
def reg_ladder_grad(src_ms, tgt_ms, sd_t, p_init12, aff_method, ftol,
                    it_limit, ncc_impl=None, finish=True, batch_ls=False,
                    finish_sweeps=None, ls_max_iters=None, ls_patience=None):
    """Gradient twin of registration_device.reg_ladder_device: same
    stages, same return contract (aff 12-vec, fret, stage_costs (4,),
    total evals).

    ``finish``: end with an NR-Powell direction-set pass from the L-BFGS
    point (powell_device, full reference semantics). From a near-optimal
    start it converges in a sweep or two (~100-200 evals), guaranteeing
    the final NCC is at least the Powell-engine local optimum while the
    gradient ladder contributes the ~10x eval-count reduction.

    ``batch_ls``: the finisher's line minimizations probe 8 points per
    batched cost call (powell_device cost_batch) instead of serial
    mnbrak/brent — the N-probe Pallas kernel amortizes the per-call
    floor and the box DMA over the batch.

    ``finish_sweeps``: cap the finisher at N direction-set sweeps
    (None = run to Powell's own ftol convergence). From the L-BFGS
    point, the first sweep captures most of the remaining improvement
    at ~n*15 evals; the run-to-ftol tail costs several times that for
    the last fraction (hardware A/B in BASELINE.md round 4).

    ``ls_max_iters``/``ls_patience``: per-stage L-BFGS step cap and
    ftol-stall patience. STATIC jit args — callers must resolve the
    MIL_LBFGS_* env knobs OUTSIDE the trace (ops.lbfgs.lbfgs_env) so the
    program cache keys on them; None falls back to a trace-time env read
    that later env changes cannot refresh."""
    cost_grad_m = _make_cost_grad_m(src_ms, tgt_ms, sd_t, ncc_impl)
    lbfgs_minimize = partial(_lbfgs_minimize, max_iters=ls_max_iters,
                             patience=ls_patience)
    cost_batch_m = (_make_cost_batch(src_ms, tgt_ms, sd_t, ncc_impl)
                    if (finish and batch_ls) else None)

    # preconditioning scales: translations/degrees ~1 voxel per unit;
    # scale factors and raw linear entries act through ~extent/2
    ext = float(sum(src_ms.shape)) / 3.0
    s_lin = jnp.float32(2.0 / ext)

    def dof_scale(dof_num):
        s = jnp.ones(dof_num, jnp.float32)
        if dof_num >= 7:
            s = s.at[6:dof_num].set(s_lin)
        return s

    p12_scale = jnp.concatenate([jnp.ones(3, jnp.float32),
                                 jnp.full(9, s_lin)])

    def dof_vg(dof_num):
        return _stage_vg(cost_grad_m,
                         lambda sub: dof_to_matrix_jnp(_full_dof(sub, dof_num),
                                                       dof_num),
                         dof_scale(dof_num))

    p12_vg = _stage_vg(cost_grad_m, params_to_matrix_jnp, p12_scale)

    stage_costs = jnp.full(4, jnp.nan, jnp.float32)
    nev = jnp.int32(0)

    cost_m = _make_cost(src_ms, tgt_ms, sd_t, ncc_impl)

    def dof_cost(dof_num):
        def fn(sub):
            return cost_m(dof_to_matrix_jnp(_full_dof(sub, dof_num), dof_num))
        return fn

    def cost12(p):
        return cost_m(params_to_matrix_jnp(p))

    def dof_cost_batch(dof_num):
        if cost_batch_m is None:
            return None

        def fn(subs):
            mats = jax.vmap(
                lambda s: dof_to_matrix_jnp(_full_dof(s, dof_num), dof_num))(
                    subs)
            return cost_batch_m(mats)

        return fn

    if cost_batch_m is None:
        cost12_batch = None
    else:
        def cost12_batch(ps):
            return cost_batch_m(jax.vmap(params_to_matrix_jnp)(ps))

    if aff_method in (1, 2, 3, 4):
        dof_num = {1: 3, 2: 6, 3: 7, 4: 9}[aff_method]
        sub0 = jnp.zeros(dof_num, jnp.float32)
        if dof_num >= 7:
            sub0 = sub0.at[6:dof_num].set(1.0)
        sc = dof_scale(dof_num)
        q, fret, nev = lbfgs_minimize(dof_vg(dof_num), sub0 / sc, ftol,
                                      it_limit)
        sub = q * sc
        if finish:
            sub, fret, nev = powell_device(dof_cost(dof_num), sub, ftol,
                                           it_limit, nev0=nev,
                                           cost_batch=dof_cost_batch(dof_num),
                                           max_sweeps=finish_sweeps)
        aff = dof_to_matrix_jnp(_full_dof(sub, dof_num), dof_num)
        stage_costs = stage_costs.at[0].set(fret)
    elif aff_method == 5:
        q, fret, nev = lbfgs_minimize(p12_vg, p_init12 / p12_scale, ftol,
                                      it_limit)
        p = q * p12_scale
        if finish:
            p, fret, nev = powell_device(cost12, p, ftol, it_limit, nev0=nev,
                                         cost_batch=cost12_batch,
                                         max_sweeps=finish_sweeps)
        aff = params_to_matrix_jnp(p)
        stage_costs = stage_costs.at[0].set(fret)
    elif aff_method == 6:
        q, fret, nev = lbfgs_minimize(dof_vg(6), jnp.zeros(6, jnp.float32),
                                      0.01, it_limit)
        stage_costs = stage_costs.at[0].set(fret)
        p0 = matrix_to_params_jnp(dof_to_matrix_jnp(_full_dof(q * dof_scale(6), 6), 6))
        q, fret, nev = lbfgs_minimize(p12_vg, p0 / p12_scale, ftol, it_limit,
                                      nev0=nev)
        p = q * p12_scale
        if finish:
            p, fret, nev = powell_device(cost12, p, ftol, it_limit, nev0=nev,
                                         cost_batch=cost12_batch,
                                         max_sweeps=finish_sweeps)
        aff = params_to_matrix_jnp(p)
        stage_costs = stage_costs.at[1].set(fret)
    elif aff_method == 7:
        q3, fret, nev = lbfgs_minimize(dof_vg(3), jnp.zeros(3, jnp.float32),
                                       0.01, it_limit)
        stage_costs = stage_costs.at[0].set(fret)
        sub3 = q3 * dof_scale(3)
        sub6_0 = jnp.concatenate([sub3, jnp.zeros(3, jnp.float32)])
        q6, fret, nev = lbfgs_minimize(dof_vg(6), sub6_0 / dof_scale(6), 0.01,
                                       it_limit, nev0=nev)
        stage_costs = stage_costs.at[1].set(fret)
        sub6 = q6 * dof_scale(6)
        sub9_0 = jnp.concatenate([sub6, jnp.ones(3, jnp.float32)])
        q9, fret, nev = lbfgs_minimize(dof_vg(9), sub9_0 / dof_scale(9), 0.005,
                                       it_limit, nev0=nev)
        stage_costs = stage_costs.at[2].set(fret)
        sub9 = q9 * dof_scale(9)
        p0 = matrix_to_params_jnp(dof_to_matrix_jnp(sub9, 9))
        q, fret, nev = lbfgs_minimize(p12_vg, p0 / p12_scale, ftol, it_limit,
                                      nev0=nev)
        p = q * p12_scale
        if finish:
            p, fret, nev = powell_device(cost12, p, ftol, it_limit, nev0=nev,
                                         cost_batch=cost12_batch,
                                         max_sweeps=finish_sweeps)
        aff = params_to_matrix_jnp(p)
        stage_costs = stage_costs.at[3].set(fret)
    else:
        raise ValueError("Wrong affine registration method")

    return aff, fret, stage_costs, nev
