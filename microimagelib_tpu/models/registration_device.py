"""Single-call on-device 3D affine registration: the whole DOF-escalation
ladder (preprocessing already done) runs as one jitted program built from
``powell_device`` and the fused resample+NCC cost — no host round trips
until the final matrix comes back.

This is the TPU-native answer to the reference's hot loop
(reference:src/api_subfunc.cu:2732-2994 + per-eval corrfunc round trips):
identical search semantics, but the optimizer state machine lives on
device in lax control flow.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from microimagelib_tpu.ops.powell_device import powell_device


# ---------------------------------------------------------------------------
# traced matrix builders (jnp twins of ops/matrix.py)
# ---------------------------------------------------------------------------

def _compose(m1, m2):
    a = m1.reshape(3, 4)
    b = m2.reshape(3, 4)
    rot = a[:, :3] @ b[:, :3]
    tr = a[:, :3] @ b[:, 3] + a[:, 3]
    return jnp.concatenate([rot, tr[:, None]], axis=1).reshape(12)


def _rz(alpha):
    c, s = jnp.cos(alpha), jnp.sin(alpha)
    return jnp.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0]], jnp.float32).at[0, 0].set(c)\
        .at[0, 1].set(s).at[1, 0].set(-s).at[1, 1].set(c).reshape(12)


def _rx(beta):
    c, s = jnp.cos(beta), jnp.sin(beta)
    return jnp.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0]], jnp.float32).at[1, 1].set(c)\
        .at[1, 2].set(s).at[2, 1].set(-s).at[2, 2].set(c).reshape(12)


def _ry(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0]], jnp.float32).at[0, 0].set(c)\
        .at[0, 2].set(-s).at[2, 0].set(s).at[2, 2].set(c).reshape(12)


def dof_to_matrix_jnp(dof9, dof_num: int):
    """Traced twin of ops.matrix.dof_to_matrix: (T*S) @ Rz @ Rx @ Ry with
    degrees/57.3 angles. dof_num is static."""
    x, y, z = dof9[0], dof9[1], dof9[2]
    if dof_num == 3:
        alpha = beta = theta = jnp.float32(0.0)
        a = b = c = jnp.float32(1.0)
    elif dof_num == 6:
        alpha, beta, theta = dof9[3] / 57.3, dof9[4] / 57.3, dof9[5] / 57.3
        a = b = c = jnp.float32(1.0)
    elif dof_num == 7:
        alpha, beta, theta = dof9[3] / 57.3, dof9[4] / 57.3, dof9[5] / 57.3
        a = b = c = dof9[6]
    elif dof_num == 9:
        alpha, beta, theta = dof9[3] / 57.3, dof9[4] / 57.3, dof9[5] / 57.3
        a, b, c = dof9[6], dof9[7], dof9[8]
    else:
        raise ValueError(f"Unsupported dofNum {dof_num}")
    ts = jnp.zeros(12, jnp.float32).at[0].set(a).at[5].set(b).at[10].set(c)\
        .at[3].set(x).at[7].set(y).at[11].set(z)
    m = _compose(ts, _rz(alpha))
    m = _compose(m, _rx(beta))
    return _compose(m, _ry(theta))


def params_to_matrix_jnp(p):
    return jnp.stack([p[3], p[4], p[5], p[0],
                      p[6], p[7], p[8], p[1],
                      p[9], p[10], p[11], p[2]])


def matrix_to_params_jnp(m):
    return jnp.stack([m[3], m[7], m[11], m[0], m[1], m[2],
                      m[4], m[5], m[6], m[8], m[9], m[10]])


# ---------------------------------------------------------------------------
# the ladder as one program
# ---------------------------------------------------------------------------

def _make_cost(src_ms, tgt_ms, sd_t, ncc_impl=None):
    """NCC cost of a 12-vector matrix against preprocessed volumes,
    through the configured resample implementation (MXU one-hot matmuls
    by default, per-voxel gathers with MIL_NCC_IMPL=gather). Under jit
    the tracer carries no device, so callers resolve ``ncc_impl``
    eagerly (affine_fast.resolve_ncc_impl) and pass it as a static."""
    from microimagelib_tpu.ops.affine_fast import corr3d_auto

    def cost_m(m12):
        ss, st = corr3d_auto(src_ms, tgt_ms, m12, impl=ncc_impl)
        ssf = jnp.sqrt(ss)
        ncc = jnp.where(ssf == 0, jnp.float32(-2.0), (st / ssf) / sd_t)
        return -ncc

    return cost_m


def _make_cost_batch(src_ms, tgt_ms, sd_t, ncc_impl=None):
    """(P, 12) matrices -> (P,) costs in ONE device call: the Pallas
    N-probe kernel (union-footprint DMA shared by the probe batch) when
    that implementation is selected, else a vmap of the single cost."""
    if ncc_impl == "pallas":
        from microimagelib_tpu.ops.pallas_corr import corr3d_partials_nprobe

        def fn(m12s):
            ss, st = corr3d_partials_nprobe(src_ms, tgt_ms, m12s)
            ssf = jnp.sqrt(ss)
            ncc = jnp.where(ssf == 0, jnp.float32(-2.0), (st / ssf) / sd_t)
            return -ncc

        return fn
    return jax.vmap(_make_cost(src_ms, tgt_ms, sd_t, ncc_impl))


@partial(jax.jit, static_argnames=("aff_method", "ncc_impl", "batch_ls"))
def reg_ladder_device(src_ms, tgt_ms, sd_t, p_init12, aff_method, ftol,
                      it_limit, ncc_impl=None, batch_ls=False):
    """Run the affMethod 1-7 search on device. Inputs are the
    mean-subtracted source/target volumes, the target SD, and the initial
    12-param vector (identity unless affMethod==5 with an input matrix).

    Returns (aff_coef 12-vec, fret, cost_stage records (4,), total_evals).
    Stage records mirror the reference's intermediate NCC telemetry.

    ``batch_ls``: line minimizations run as 8-probe batched cost calls
    (the N-probe Pallas kernel) instead of serial mnbrak/brent."""
    cost_m = _make_cost(src_ms, tgt_ms, sd_t, ncc_impl)
    cost_batch_m = (_make_cost_batch(src_ms, tgt_ms, sd_t, ncc_impl)
                    if batch_ls else None)

    def cost12(p):
        return cost_m(params_to_matrix_jnp(p))

    def cost12_batch(ps):
        return cost_batch_m(jax.vmap(params_to_matrix_jnp)(ps))

    def dof_batch(dof_num):
        if cost_batch_m is None:
            return None

        def fn(subs):
            mats = jax.vmap(
                lambda sb: dof_to_matrix_jnp(_full_dof(sb, dof_num),
                                             dof_num))(subs)
            return cost_batch_m(mats)

        return fn

    c12b = cost12_batch if cost_batch_m is not None else None

    stage_costs = jnp.full(4, jnp.nan, jnp.float32)
    nev = jnp.int32(0)

    if aff_method in (1, 2, 3, 4):
        dof_num = {1: 3, 2: 6, 3: 7, 4: 9}[aff_method]
        sub0 = jnp.zeros(dof_num, jnp.float32)
        if dof_num >= 7:
            sub0 = sub0.at[6:dof_num].set(1.0)
        sub, fret, nev = powell_device(_make_dof_cost(cost_m, dof_num), sub0, ftol, it_limit, cost_batch=dof_batch(dof_num))
        full = _full_dof(sub, dof_num)
        aff = dof_to_matrix_jnp(full, dof_num)
        stage_costs = stage_costs.at[0].set(fret)
    elif aff_method == 5:
        p, fret, nev = powell_device(cost12, p_init12, ftol, it_limit, cost_batch=c12b)
        aff = params_to_matrix_jnp(p)
        stage_costs = stage_costs.at[0].set(fret)
    elif aff_method == 6:
        sub, fret, nev = powell_device(_make_dof_cost(cost_m, 6), jnp.zeros(6, jnp.float32), 0.01, it_limit, cost_batch=dof_batch(6))
        stage_costs = stage_costs.at[0].set(fret)
        p0 = matrix_to_params_jnp(dof_to_matrix_jnp(_full_dof(sub, 6), 6))
        p, fret, nev = powell_device(cost12, p0, ftol, it_limit, nev0=nev, cost_batch=c12b)
        aff = params_to_matrix_jnp(p)
        stage_costs = stage_costs.at[1].set(fret)
    elif aff_method == 7:
        sub3, fret, nev = powell_device(_make_dof_cost(cost_m, 3), jnp.zeros(3, jnp.float32), 0.01, it_limit, cost_batch=dof_batch(3))
        stage_costs = stage_costs.at[0].set(fret)
        sub6_0 = jnp.concatenate([sub3, jnp.zeros(3, jnp.float32)])
        sub6, fret, nev = powell_device(_make_dof_cost(cost_m, 6), sub6_0, 0.01, it_limit, nev0=nev, cost_batch=dof_batch(6))
        stage_costs = stage_costs.at[1].set(fret)
        sub9_0 = jnp.concatenate([sub6, jnp.ones(3, jnp.float32)])
        sub9, fret, nev = powell_device(_make_dof_cost(cost_m, 9), sub9_0, 0.005, it_limit, nev0=nev, cost_batch=dof_batch(9))
        stage_costs = stage_costs.at[2].set(fret)
        p0 = matrix_to_params_jnp(dof_to_matrix_jnp(sub9, 9))
        p, fret, nev = powell_device(cost12, p0, ftol, it_limit, nev0=nev, cost_batch=c12b)
        aff = params_to_matrix_jnp(p)
        stage_costs = stage_costs.at[3].set(fret)
    else:
        raise ValueError("Wrong affine registration method")

    return aff, fret, stage_costs, nev


def _full_dof(sub, dof_num: int):
    full = jnp.zeros(9, jnp.float32).at[6:9].set(1.0)
    return jax.lax.dynamic_update_slice(full, sub, (0,))


def _make_dof_cost(cost_m, dof_num: int):
    def fn(sub):
        return cost_m(dof_to_matrix_jnp(_full_dof(sub, dof_num), dof_num))
    return fn


# ---------------------------------------------------------------------------
# hybrid engine: one jitted device call per LINE MINIMIZATION
# ---------------------------------------------------------------------------
# The full-ladder program above can exceed the device runtime's
# per-execution watchdog on large volumes (observed: the 128^3 ladder
# crashes the axon TPU worker while 64^3 completes in ~28 s). The hybrid
# engine keeps Powell's outer loop on the host but fuses each complete
# mnbrak+brent line search (~30-60 cost evaluations) into one bounded
# device program — ~2 orders of magnitude fewer round trips than the
# reference-style per-eval scheme, with no long-running programs.

from microimagelib_tpu.ops.powell_device import _linmin as _linmin_dev  # noqa: E402

_COST_MODES = ("dof3", "dof6", "dof7", "dof9", "p12")


def _cost_for_mode(src_ms, tgt_ms, sd_t, mode, ncc_impl=None):
    cost_m = _make_cost(src_ms, tgt_ms, sd_t, ncc_impl)
    if mode == "p12":
        return lambda p: cost_m(params_to_matrix_jnp(p))
    dof_num = int(mode[3:])

    def fn(sub):
        return cost_m(dof_to_matrix_jnp(_full_dof(sub, dof_num), dof_num))

    return fn


@partial(jax.jit, static_argnames=("mode", "ncc_impl"))
def linmin_reg_device(src_ms, tgt_ms, sd_t, p, xi, mode, ncc_impl=None):
    """One full line minimization of the registration cost on device.
    Returns (p_new, xi_scaled, f_min, n_evals)."""
    cost = _cost_for_mode(src_ms, tgt_ms, sd_t, mode, ncc_impl)
    return _linmin_dev(cost, jnp.asarray(p, jnp.float32), jnp.asarray(xi, jnp.float32))


@partial(jax.jit, static_argnames=("mode", "ncc_impl"))
def cost_eval_reg_device(src_ms, tgt_ms, sd_t, p, mode, ncc_impl=None):
    """Single cost evaluation (Powell's extrapolation probe)."""
    cost = _cost_for_mode(src_ms, tgt_ms, sd_t, mode, ncc_impl)
    return cost(jnp.asarray(p, jnp.float32))
