"""On-device L-BFGS for the gradient registration engine.

The reference's registration minimizes NCC with a derivative-free NR
Powell direction-set search (reference:src/api_powell.c:119-360) because
CUDA texture sampling has no derivative. On TPU the fused resample+NCC
IS differentiable (ops/pallas_corr.py::corr3d_grad_pallas computes the
exact a.e. gradient in one kernel pass), so the search can be a
quasi-Newton method: ~20x fewer cost evaluations for the same local
optimum. Reference-compatible loop-control semantics are preserved:
the shared ``it_limit`` caps evaluations (each value+grad call counts
as one, like itNumStatic), a cost >= 1.001 aborts (empty-overlap
escape), and convergence uses Powell's relative ftol test.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

COST_ABORT = 1.001
HIST = 8
LS_MAX_BACK = 20
LS_MAX_FWD = 24
ARMIJO_C1 = 1e-4


def lbfgs_env():
    """(max_iters, patience) from MIL_LBFGS_MAX_ITERS / MIL_LBFGS_PATIENCE,
    read PER CALL (setting them after import takes effect, like the other
    MIL_REG_* knobs). Callers that jit around lbfgs_minimize must read
    these OUTSIDE the trace and pass them as static arguments so the jit
    cache keys on them (registration.py does)."""
    return (int(os.environ.get("MIL_LBFGS_MAX_ITERS", "200")),
            int(os.environ.get("MIL_LBFGS_PATIENCE", "3")))


def lbfgs_minimize(value_and_grad, p0, ftol, it_limit, nev0=0,
                   max_iters=None, patience=None):
    """Minimize with L-BFGS (two-loop recursion, history 8, Armijo
    backtracking + expansion line search). ``value_and_grad``:
    (n,) f32 -> (f, g) — each call counts one evaluation.

    ``max_iters``/``patience`` default to the MIL_LBFGS_* env knobs
    (read per call via ``lbfgs_env``).

    Returns (p_min, f_min, total_evals)."""
    if max_iters is None or patience is None:
        env_mi, env_pa = lbfgs_env()
        max_iters = env_mi if max_iters is None else max_iters
        patience = env_pa if patience is None else patience
    p0 = jnp.asarray(p0, jnp.float32)
    n = p0.shape[0]
    ftol = jnp.float32(ftol)
    it_limit = jnp.int32(it_limit)

    f0, g0 = value_and_grad(p0)
    nev = jnp.int32(nev0) + 1

    mem_s = jnp.zeros((HIST, n), jnp.float32)
    mem_y = jnp.zeros((HIST, n), jnp.float32)
    mem_rho = jnp.zeros(HIST, jnp.float32)

    def direction(g, mem_s, mem_y, mem_rho, k):
        """Two-loop recursion; slots >= k (unfilled) have rho == 0 and
        are skipped by masking."""
        q = g

        def bwd(i, carry):
            q, alphas = carry
            idx = (k - 1 - i) % HIST
            valid = (i < jnp.minimum(k, HIST)).astype(jnp.float32)
            rho = mem_rho[idx]
            a = valid * rho * jnp.dot(mem_s[idx], q)
            q = q - a * mem_y[idx]
            return q, alphas.at[i].set(a)

        q, alphas = lax.fori_loop(0, HIST, bwd, (q, jnp.zeros(HIST, jnp.float32)))

        # H0 scaling: gamma = s.y / y.y of the newest pair
        newest = (k - 1) % HIST
        ys = jnp.dot(mem_s[newest], mem_y[newest])
        yy = jnp.dot(mem_y[newest], mem_y[newest])
        gamma = jnp.where((k > 0) & (yy > 0), ys / jnp.maximum(yy, 1e-20), 1.0)
        r = gamma * q

        def fwd(i, r):
            j = HIST - 1 - i
            idx = (k - 1 - j) % HIST
            valid = (j < jnp.minimum(k, HIST)).astype(jnp.float32)
            rho = mem_rho[idx]
            b = valid * rho * jnp.dot(mem_y[idx], r)
            return r + (alphas[j] - b) * mem_s[idx] * valid

        return -lax.fori_loop(0, HIST, fwd, r)

    def linesearch(p, f, g, d, nev):
        """Armijo backtracking from alpha=1 with one-shot expansion while
        improving. Returns (p', f', g', nev, moved)."""
        gd = jnp.dot(g, d)

        def trial(alpha):
            return value_and_grad(p + alpha * d)

        def back_cond(s):
            alpha, fa, ga, it, nev, ok = s
            return (~ok) & (it < LS_MAX_BACK) & (nev < it_limit)

        def back_body(s):
            alpha, fa, ga, it, nev, ok = s
            alpha2 = alpha * 0.5
            f2, g2 = trial(alpha2)
            ok2 = f2 <= f + ARMIJO_C1 * alpha2 * gd
            return alpha2, f2, g2, it + 1, nev + 1, ok2

        f1, g1 = trial(1.0)
        nev = nev + 1
        ok1 = f1 <= f + ARMIJO_C1 * gd
        alpha, fa, ga, _, nev, ok = lax.while_loop(
            back_cond, back_body,
            (jnp.float32(1.0), f1, g1, jnp.int32(0), nev, ok1))

        # expansion: while doubling keeps strictly improving
        def fwd_cond(s):
            alpha, fa, ga, best_a, best_f, best_g, it, nev, go = s
            return go & (it < LS_MAX_FWD) & (nev < it_limit)

        def fwd_body(s):
            alpha, fa, ga, best_a, best_f, best_g, it, nev, go = s
            a2 = alpha * 2.0
            f2, g2 = trial(a2)
            better = f2 < best_f
            return (a2, f2, g2,
                    jnp.where(better, a2, best_a),
                    jnp.where(better, f2, best_f),
                    jnp.where(better, g2, best_g),
                    it + 1, nev + 1, better)

        alpha, fa, ga, best_a, best_f, best_g, _, nev, _ = lax.while_loop(
            fwd_cond, fwd_body,
            (alpha, fa, ga, alpha, fa, ga, jnp.int32(0), nev, ok))

        moved = (best_f < f) & ok
        p2 = jnp.where(moved, p + best_a * d, p)
        f2 = jnp.where(moved, best_f, f)
        g2 = jnp.where(moved, best_g, g)
        return p2, f2, g2, nev, moved

    def cond(state):
        p, f, g, mem_s, mem_y, mem_rho, k, it, nev, stall, done = state
        return (~done) & (it < max_iters)

    def body(state):
        p, f, g, mem_s, mem_y, mem_rho, k, it, nev, stall, done = state
        d = direction(g, mem_s, mem_y, mem_rho, k)
        # steepest-descent steps (no curvature yet, or non-descent
        # direction) are UNIT-normalized: raw NCC gradients are ~1e-3 in
        # voxel units, and an alpha=1 trial must probe a voxel-scale
        # move, not a 1e-3-voxel crawl the expansion cap can't recover
        gd = jnp.dot(g, d)
        gnorm = jnp.sqrt(jnp.sum(g * g))
        sd = -g / jnp.maximum(gnorm, 1e-12)
        d = jnp.where((gd < 0) & (k > 0), d, sd)
        p2, f2, g2, nev2, moved = linesearch(p, f, g, d, nev)

        slot = k % HIST
        s_vec = p2 - p
        y_vec = g2 - g
        ys = jnp.dot(s_vec, y_vec)
        use = moved & (ys > 1e-10)
        mem_s2 = jnp.where(use, mem_s.at[slot].set(s_vec), mem_s)
        mem_y2 = jnp.where(use, mem_y.at[slot].set(y_vec), mem_y)
        mem_rho2 = jnp.where(use, mem_rho.at[slot].set(1.0 / jnp.maximum(ys, 1e-20)),
                             mem_rho)
        # a failed line search with curvature history retries from a
        # fresh steepest-descent state; only a failed PLAIN descent stops
        k2 = jnp.where(use, k + 1, jnp.where(moved, k, 0))
        retry = (~moved) & (k > 0)
        moved = moved | retry

        # Powell's ftol test is per DIRECTION SWEEP (n line minimizations);
        # one L-BFGS step is a single direction, so a per-step test stops
        # far too early on slow-progress plateaus. Require the relative
        # test to hold for PATIENCE consecutive steps instead.
        small = 2.0 * jnp.abs(f - f2) <= ftol * (jnp.abs(f) + jnp.abs(f2))
        stall2 = jnp.where(small, stall + 1, 0)
        done2 = ((stall2 >= patience) | (~moved) | (nev2 >= it_limit)
                 | (f2 >= COST_ABORT))
        return (p2, f2, g2, mem_s2, mem_y2, mem_rho2, k2, it + 1, nev2,
                stall2, done2)

    init_done = (f0 >= COST_ABORT) | (nev >= it_limit)
    state = (p0, f0, g0, mem_s, mem_y, mem_rho, jnp.int32(0), jnp.int32(0),
             nev, jnp.int32(0), init_done)
    p, f, g, *_, nev, stall, done = lax.while_loop(cond, body, state)
    return p, f, nev
