"""Fully on-device Powell registration: the complete NR direction-set
minimizer (mnbrak + brent + linmin + powell + the DOF-escalation ladder)
expressed in ``lax`` control flow so an entire 3D registration is ONE
jitted device program.

Why: the host Powell (ops/powell.py) issues one device round trip per
cost evaluation — the reference does the same over PCIe with ~1 ms
latency (reference:src/api_subfunc.cu:954-988 corrfunc round trip), but on
a remote-attached TPU each trip costs tens of milliseconds and a full
12-DOF ladder makes thousands of them. Moving the optimizer into the
program turns minutes of latency into pure device time.

Semantics mirror the host implementation (and the reference's modified
NR): brent tol=0.01, ITMAX=100, mnbrak GOLD/GLIMIT/TINY, the cost>=1.001
abort, and the shared eval-count cap checked between line minimizations
(reference:src/api_powell.c:119-360). Arithmetic is float32 on device
(the reference is float32 throughout as well).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

GOLD = 1.618034
GLIMIT = 100.0
TINY = 1.0e-20
CGOLD = 0.3819660
ZEPS = 1.0e-10
BRENT_ITMAX = 100
POWELL_ITMAX = 100
LINMIN_TOL = 0.01
COST_ABORT = 1.001
MNBRAK_MAX = 60  # safety bound; NR's loop terminates long before


def _sign_like(mag, s):
    return jnp.where(s >= 0, jnp.abs(mag), -jnp.abs(mag))


def _mnbrak(f, ax, bx):
    """Bracket a minimum. Returns (ax, bx, cx, fa, fb, fc, nev)."""
    fa = f(ax)
    fb = f(bx)
    swap = fb > fa
    ax, bx = jnp.where(swap, bx, ax), jnp.where(swap, ax, bx)
    fa, fb = jnp.where(swap, fb, fa), jnp.where(swap, fa, fb)
    cx = bx + GOLD * (bx - ax)
    fc = f(cx)
    nev = jnp.int32(3)

    def cond(s):
        ax, bx, cx, fa, fb, fc, nev, done = s
        return (fb > fc) & (~done) & (nev < 3 + 3 * MNBRAK_MAX)

    def body(s):
        ax, bx, cx, fa, fb, fc, nev, done = s
        r = (bx - ax) * (fb - fc)
        q = (bx - cx) * (fb - fa)
        dq = q - r
        denom = 2.0 * _sign_like(jnp.maximum(jnp.abs(dq), TINY), dq)
        u0 = bx - ((bx - cx) * q - (bx - ax) * r) / denom
        ulim = bx + GLIMIT * (cx - bx)

        in_bc = (bx - u0) * (u0 - cx) > 0.0
        in_culim = (cx - u0) * (u0 - ulim) > 0.0
        beyond = (u0 - ulim) * (ulim - cx) >= 0.0

        def case_bc(_):
            fu0 = f(u0)
            # fu0 < fc: minimum between b and c -> done with (bx, u0, cx)
            # fu0 > fb: minimum between a and u -> done with (ax, bx, u0)
            # else: discard u0, step u past c
            done1 = fu0 < fc
            done2 = (~done1) & (fu0 > fb)
            resolved = done1 | done2
            u1 = cx + GOLD * (cx - bx)
            # NR evaluates the stepped-past-c point only when the bracket
            # is NOT already resolved; a second unconditional eval would
            # waste a fused-cost call and drain the shared it_limit.
            fu1 = lax.cond(resolved, lambda _: fu0, lambda _: f(u1), None)
            nax = jnp.where(done1, bx, ax)
            nbx = jnp.where(done1, u0, bx)
            ncx = jnp.where(done1, cx, jnp.where(done2, u0, cx))
            nfa = jnp.where(done1, fb, fa)
            nfb = jnp.where(done1, fu0, fb)
            nfc = jnp.where(done2, fu0, fc)
            u = u1
            fu = fu1
            return (nax, nbx, ncx, nfa, nfb, nfc, u, fu, resolved,
                    jnp.where(resolved, jnp.int32(1), jnp.int32(2)))

        def case_culim(_):
            fu0 = f(u0)
            lower = fu0 < fc
            # SHFT(bx,cx,u, cx+GOLD*(cx-bx)) with sequential updates:
            nbx = jnp.where(lower, cx, bx)
            ncx = jnp.where(lower, u0, cx)
            u1 = jnp.where(lower, u0 + GOLD * (u0 - cx), u0)
            fu1_val = lax.cond(lower, lambda _: f(u1), lambda _: fu0, None)
            nfb = jnp.where(lower, fc, fb)
            nfc = jnp.where(lower, fu0, fc)
            return ax, nbx, ncx, fa, nfb, nfc, u1, fu1_val, jnp.zeros((), bool), jnp.where(lower, jnp.int32(2), jnp.int32(1))

        def case_beyond(_):
            u1 = ulim
            fu1 = f(u1)
            return ax, bx, cx, fa, fb, fc, u1, fu1, jnp.zeros((), bool), jnp.int32(1)

        def case_default(_):
            u1 = cx + GOLD * (cx - bx)
            fu1 = f(u1)
            return ax, bx, cx, fa, fb, fc, u1, fu1, jnp.zeros((), bool), jnp.int32(1)

        branch = jnp.where(in_bc, 0, jnp.where(in_culim, 1, jnp.where(beyond, 2, 3)))
        nax, nbx, ncx, nfa, nfb, nfc, u, fu, early, nev_add = lax.switch(
            branch, [case_bc, case_culim, case_beyond, case_default], None)

        # final SHFT(ax,bx,cx,u), SHFT(fa,fb,fc,fu) unless early-done
        fax = jnp.where(early, nax, nbx)
        fbx = jnp.where(early, nbx, ncx)
        fcx = jnp.where(early, ncx, u)
        ffa = jnp.where(early, nfa, nfb)
        ffb = jnp.where(early, nfb, nfc)
        ffc = jnp.where(early, nfc, fu)
        return fax, fbx, fcx, ffa, ffb, ffc, nev + nev_add, early

    init = (ax, bx, cx, fa, fb, fc, nev, jnp.zeros((), bool))
    ax, bx, cx, fa, fb, fc, nev, _ = lax.while_loop(cond, body, init)
    return ax, bx, cx, fa, fb, fc, nev


def _brent(f, ax, bx, cx, tol):
    """Brent line minimization within a bracket. Returns (xmin, fmin, nev)."""
    a = jnp.minimum(ax, cx)
    b = jnp.maximum(ax, cx)
    x = w = v = bx
    fx = f(x)
    fw = fv = fx

    # state: a, b, x, w, v, fx, fw, fv, d, e, it, done
    def cond(s):
        a, b, x, w, v, fx, fw, fv, d, e, it, nev, done = s
        return (~done) & (it < BRENT_ITMAX)

    def body(s):
        a, b, x, w, v, fx, fw, fv, d, e, it, nev, done = s
        xm = 0.5 * (a + b)
        tol1 = tol * jnp.abs(x) + ZEPS
        tol2 = 2.0 * tol1
        converged = jnp.abs(x - xm) <= (tol2 - 0.5 * (b - a))

        # parabolic attempt
        r = (x - w) * (fx - fv)
        q = (x - v) * (fx - fw)
        p = (x - v) * q - (x - w) * r
        q2 = 2.0 * (q - r)
        p = jnp.where(q2 > 0.0, -p, p)
        q2 = jnp.abs(q2)
        etemp = e
        use_golden = (jnp.abs(e) <= tol1) | (jnp.abs(p) >= jnp.abs(0.5 * q2 * etemp)) | \
                     (p <= q2 * (a - x)) | (p >= q2 * (b - x))
        q_zero = (~use_golden) & (q2 == 0.0)  # reference's added escape
        e_g = jnp.where(x >= xm, a - x, b - x)
        d_g = CGOLD * e_g
        d_p = jnp.where(q2 != 0.0, p / q2, 0.0)
        u_p = x + d_p
        d_p = jnp.where((u_p - a < tol2) | (b - u_p < tol2),
                        _sign_like(tol1, xm - x), d_p)
        d_new = jnp.where(use_golden, d_g, d_p)
        e_new = jnp.where(use_golden, e_g, d)  # e = old d in parabolic branch

        u = jnp.where(jnp.abs(d_new) >= tol1, x + d_new, x + _sign_like(tol1, d_new))
        fu = lax.cond(converged | q_zero, lambda _: fx, lambda _: f(u), None)
        nev = nev + jnp.where(converged | q_zero, 0, 1)

        better = fu <= fx
        a_n = jnp.where(better, jnp.where(u >= x, x, a), jnp.where(u < x, u, a))
        b_n = jnp.where(better, jnp.where(u >= x, b, x), jnp.where(u < x, b, u))
        v_n = jnp.where(better, w, jnp.where((fu <= fw) | (w == x), w,
                        jnp.where((fu <= fv) | (v == x) | (v == w), u, v)))
        fv_n = jnp.where(better, fw, jnp.where((fu <= fw) | (w == x), fw,
                         jnp.where((fu <= fv) | (v == x) | (v == w), fu, fv)))
        w_n = jnp.where(better, x, jnp.where((fu <= fw) | (w == x), u, w))
        fw_n = jnp.where(better, fx, jnp.where((fu <= fw) | (w == x), fu, fw))
        x_n = jnp.where(better, u, x)
        fx_n = jnp.where(better, fu, fx)

        stop = converged | q_zero
        return (jnp.where(stop, a, a_n), jnp.where(stop, b, b_n),
                jnp.where(stop, x, x_n), jnp.where(stop, w, w_n),
                jnp.where(stop, v, v_n), jnp.where(stop, fx, fx_n),
                jnp.where(stop, fw, fw_n), jnp.where(stop, fv, fv_n),
                jnp.where(stop, d, d_new), jnp.where(stop, e, e_new),
                it + 1, nev, stop)

    zero = jnp.float32(0.0)
    init = (a, b, x, w, v, fx, fw, fv, zero, zero, jnp.int32(0), jnp.int32(1),
            jnp.zeros((), bool))
    a, b, x, w, v, fx, fw, fv, d, e, it, nev, done = lax.while_loop(cond, body, init)
    return x, fx, nev


def _linmin(cost, p, xi):
    """Minimize cost along direction xi from p. Returns (p', xi', f', nev)."""
    def f1(t):
        return cost(p + t * xi)

    ax, bx, cx, fa, fb, fc, nev1 = _mnbrak(f1, jnp.float32(0.0), jnp.float32(1.0))
    xmin, fmin, nev2 = _brent(f1, ax, bx, cx, LINMIN_TOL)
    xi_new = xi * xmin
    return p + xi_new, xi_new, fmin, nev1 + nev2


LS_LADDER = (-2.618, -1.0, -0.382, 0.382, 1.0, 1.618, 2.618, 4.236)
LS_REFINE_ROUNDS = 3


def _linmin_nprobe(cost_batch, p, xi, fret):
    """Vectorized line minimization: one two-sided golden ladder call
    brackets the minimum around alpha=0, then grid-refine rounds shrink
    the bracket (expanding golden-style instead when the best probe sits
    on an edge) — 1 + LS_REFINE_ROUNDS batched cost calls replace the
    ~20 serial mnbrak/brent evaluations (the multi-probe deviation
    SURVEY.md §7 step 4 allows; NR's serial probes exist because the
    reference's texture cost evaluates one matrix per launch,
    reference:src/api_powell.c:194-301). alpha=0 (the incoming point) is
    always a candidate, so the step never regresses — mirroring brent's
    return-the-start behavior on failed searches."""
    n_probes = len(LS_LADDER)
    alphas = jnp.array(LS_LADDER, jnp.float32)

    def probe(al):
        return cost_batch(p[None, :] + al[:, None] * xi[None, :])

    f1 = probe(alphas)
    all_a = jnp.concatenate([jnp.zeros(1, jnp.float32), alphas])
    all_f = jnp.concatenate([fret[None], f1])
    order = jnp.argsort(all_a)
    a_s = all_a[order]
    f_s = all_f[order]
    b = jnp.argmin(f_s)
    n_all = n_probes + 1
    lo = jnp.where(b > 0, a_s[jnp.maximum(b - 1, 0)],
                   a_s[0] - (a_s[1] - a_s[0]) * GOLD)
    hi = jnp.where(b < n_all - 1, a_s[jnp.minimum(b + 1, n_all - 1)],
                   a_s[-1] + (a_s[-1] - a_s[-2]) * GOLD)
    xb = a_s[b]
    fb = f_s[b]
    nev = jnp.int32(n_probes)

    def round_body(_, st):
        lo, hi, xb, fb, nev = st
        grid = lo + (hi - lo) * (jnp.arange(1, n_probes + 1,
                                            dtype=jnp.float32)
                                 / (n_probes + 1))
        fg = probe(grid)
        gb = jnp.argmin(fg)
        better = fg[gb] < fb
        xb2 = jnp.where(better, grid[gb], xb)
        fb2 = jnp.where(better, fg[gb], fb)
        width = hi - lo
        stepw = width / (n_probes + 1)
        # best on an edge: the minimum may lie outside — expand golden-
        # style past that edge instead of shrinking onto it
        lo2 = jnp.where(better & (gb == 0), lo - width * GOLD, xb2 - stepw)
        hi2 = jnp.where(better & (gb == n_probes - 1), hi + width * GOLD,
                        xb2 + stepw)
        return lo2, hi2, xb2, fb2, nev + n_probes

    lo, hi, xb, fb, nev = lax.fori_loop(0, LS_REFINE_ROUNDS, round_body,
                                        (lo, hi, xb, fb, nev))
    xi_new = xi * xb
    return p + xi_new, xi_new, fb, nev


def powell_device(cost, p0, ftol, it_limit, nev0=0, cost_batch=None,
                  max_sweeps=None):
    """On-device Powell. cost: (n,) f32 -> scalar f32 (pure, traced).
    Returns (p_min, f_min, total_evals). ``it_limit`` caps cost evals the
    way the reference's itNumStatic does; ``nev0`` carries the count
    across ladder stages.

    ``cost_batch``: optional (P, n) -> (P,) batched cost; when given,
    line minimizations run the vectorized multi-probe search
    (:func:`_linmin_nprobe`) instead of serial mnbrak/brent — same
    direction-set semantics, 1.001 abort, and it_limit accounting on the
    accepted sequence.

    ``max_sweeps``: optional cap on outer direction-set sweeps — the
    budgeted-finisher mode (registration_grad): a near-converged start
    gets the bulk of Powell's remaining improvement in the first sweep
    or two, at a fraction of the run-to-ftol eval count. None preserves
    the reference's run-to-convergence semantics."""
    p0 = jnp.asarray(p0, jnp.float32)
    n = p0.shape[0]
    ftol = jnp.float32(ftol)
    it_limit = jnp.int32(it_limit)
    itmax = POWELL_ITMAX if max_sweeps is None else min(POWELL_ITMAX,
                                                        int(max_sweeps))

    fret0 = cost(p0)
    nev_init = jnp.int32(nev0) + 1

    def linmin(p, xit, fcur):
        if cost_batch is None:
            return _linmin(cost, p, xit)
        return _linmin_nprobe(cost_batch, p, xit, fcur)

    # state: p, xi (n,n), fret, pt, it, nev, done
    def outer_cond(s):
        p, xi, fret, pt, it, nev, done = s
        return (~done) & (it < itmax)

    def outer_body(s):
        p, xi, fret, pt, it, nev, done = s
        fp = fret

        def dir_body(i, carry):
            p, xi, fret, delta, ibig, nev, stop = carry

            def do(_):
                xit = lax.dynamic_slice(xi, (0, i), (n, 1)).reshape(n)
                fptt = fret
                p2, xit2, fret2, nev_lm = linmin(p, xit, fret)
                xi2 = lax.dynamic_update_slice(xi, xit2.reshape(n, 1), (0, i))
                improved = jnp.abs(fptt - fret2) > delta
                delta2 = jnp.where(improved, jnp.abs(fptt - fret2), delta)
                ibig2 = jnp.where(improved, i, ibig)
                nev2 = nev + nev_lm
                stop2 = (nev2 >= it_limit) | (fret2 >= COST_ABORT)
                return p2, xi2, fret2, delta2, ibig2, nev2, stop2

            def skip(_):
                return p, xi, fret, delta, ibig, nev, stop

            return lax.cond(stop, skip, do, None)

        p, xi, fret, delta, ibig, nev, stop = lax.fori_loop(
            0, n, dir_body,
            (p, xi, fret, jnp.float32(0.0), jnp.int32(0), nev, done))

        converged = 2.0 * jnp.abs(fp - fret) <= ftol * (jnp.abs(fp) + jnp.abs(fret))

        def extrap(args):
            p, xi, fret, pt, nev = args
            ptt = 2.0 * p - pt
            xit = p - pt
            pt2 = p
            fptt = cost(ptt)
            nev = nev + 1

            def try_new_dir(args2):
                p, xi, fret, nev = args2
                t = (2.0 * (fp - 2.0 * fret + fptt) * (fp - fret - delta) ** 2
                     - delta * (fp - fptt) ** 2)

                def accept(_):
                    p3, xit3, fret3, nev_lm = linmin(p, xit, fret)
                    last = lax.dynamic_slice(xi, (0, n - 1), (n, 1))
                    xi3 = lax.dynamic_update_slice(xi, last, (0, ibig))
                    xi3 = lax.dynamic_update_slice(xi3, xit3.reshape(n, 1), (0, n - 1))
                    return p3, xi3, fret3, nev + nev_lm

                def reject(_):
                    return p, xi, fret, nev

                return lax.cond(t < 0.0, accept, reject, None)

            p, xi, fret, nev = lax.cond(
                fptt < fp, try_new_dir, lambda a: (a[0], a[1], a[2], a[3]),
                (p, xi, fret, nev))
            return p, xi, fret, pt2, nev

        def no_extrap(args):
            p, xi, fret, pt, nev = args
            return p, xi, fret, pt, nev

        do_extrap = (~stop) & (~converged)
        p, xi, fret, pt, nev = lax.cond(do_extrap, extrap, no_extrap,
                                        (p, xi, fret, pt, nev))
        stop2 = stop | converged | (nev >= it_limit) | (fret >= COST_ABORT)
        return p, xi, fret, pt, it + 1, nev, stop2

    init_done = fret0 >= COST_ABORT
    init = (p0, jnp.eye(n, dtype=jnp.float32), fret0, p0,
            jnp.int32(0), nev_init, init_done)
    p, xi, fret, pt, it, nev, done = lax.while_loop(outer_cond, outer_body, init)
    return p, fret, nev
