"""Method of Moving Asymptotes (Svanberg 1987) with a ParOpt-shaped API.

The reference drives topology optimization through the external C++
ParOpt MMA optimizer (examples/topology_optimization/topo.py:176-189).
This module provides an in-repo optimizer with the same user contract:

* ``Problem`` subclasses implement ``getVarsAndBounds``, ``evalObjCon``
  (returns ``fail, obj, con`` with the ParOpt convention con >= 0
  feasible) and ``evalObjConGradient`` (fills ``g`` and ``A[i]``);
* ``MMA(problem, options).optimize()`` runs the loop;
* ``Problem.checkGradients`` finite-differences the user gradients like
  ParOpt's checker (topo.py:187).

The MMA subproblem is solved in dual form.  For one constraint (the
topology-optimization case) the dual is a monotone scalar function of
the multiplier and is solved by bisection; for m > 1 a few sweeps of
coordinate-wise bisection are used.
"""

from __future__ import annotations

import numpy as np

__all__ = ["Problem", "MMA"]


class Problem:
    """Subclass and implement the three callbacks (ParOpt contract)."""

    def __init__(self, nvars: int, ncon: int = 1):
        self.nvars = int(nvars)
        self.ncon = int(ncon)

    def getVarsAndBounds(self, x, lb, ub):  # pragma: no cover - interface
        raise NotImplementedError

    def evalObjCon(self, x):  # pragma: no cover - interface
        raise NotImplementedError

    def evalObjConGradient(self, x, g, A):  # pragma: no cover - interface
        raise NotImplementedError

    def checkGradients(self, dh=1e-6, seed=0):
        """FD-check objective/constraint gradients along a random direction."""
        x = np.zeros(self.nvars)
        lb = np.zeros(self.nvars)
        ub = np.ones(self.nvars)
        self.getVarsAndBounds(x, lb, ub)
        rng = np.random.RandomState(seed)
        pert = rng.uniform(-1.0, 1.0, self.nvars)

        g = np.zeros(self.nvars)
        A = [np.zeros(self.nvars) for _ in range(self.ncon)]
        _, f0, c0 = self.evalObjCon(x)
        self.evalObjConGradient(x, g, A)
        _, f1, c1 = self.evalObjCon(x + dh * pert)

        results = []
        fd = (f1 - f0) / dh
        an = g.dot(pert)
        results.append(("objective", an, fd))
        for i in range(self.ncon):
            fd_c = (c1[i] - c0[i]) / dh
            an_c = A[i].dot(pert)
            results.append((f"con[{i}]", an_c, fd_c))
        for name, an_v, fd_v in results:
            rel = abs(an_v - fd_v) / max(1e-300, abs(fd_v))
            print(f"[checkGradients] {name}: analytic {an_v:+.8e}  "
                  f"fd {fd_v:+.8e}  rel err {rel:.3e}")
        return results


def _solve_dual_x(lam, p0, q0, P, Q, L, U, alpha, beta):
    """Primal minimizer of the separable MMA Lagrangian for multipliers lam."""
    p = p0 + P.T.dot(lam)
    q = q0 + Q.T.dot(lam)
    sp = np.sqrt(np.maximum(p, 0.0))
    sq = np.sqrt(np.maximum(q, 0.0))
    x = (sp * L + sq * U) / np.maximum(sp + sq, 1e-300)
    return np.clip(x, alpha, beta)


def device_update_body(x, xold1, xold2, low, upp, g, dc, ci, lb, ub, k,
                       *, asy_grow=1.2, asy_shrink=0.7, albefa=0.1,
                       move=0.2, psum_axis=None):
    """Traceable single-constraint MMA update (asymptotes + dual
    bisection) — same math as the NumPy path (gated by a test).

    ``psum_axis``: run under ``shard_map`` with block-sharded design
    vectors — the dual bisection's reductions become ``lax.psum`` /
    ``lax.pmax`` over that mesh axis, so every device solves the same
    (global) dual and the update stays identical to the unsharded one.

    The NumPy subproblem dominated topology-optimization iterations on
    the throttled host core (NOTES.md round 1: 8.6 s/iter at 16k dofs
    with the TPU idle); this runs the whole design update as one XLA
    trace — elementwise (n,) arrays plus a scalar bisection, ideal for
    the VPU.  Usable standalone (jitted by :func:`_make_device_update`)
    or inline inside a larger program (opt.topo_device fuses it with
    the state solve + filter into one iteration kernel).

    Returns:
        (x_new, low, upp, lam, step).
    """
    import jax
    import jax.numpy as jnp

    if psum_axis is None:
        gsum, gmax = jnp.sum, jnp.max
    else:
        gsum = lambda a: jax.lax.psum(jnp.sum(a), psum_axis)
        gmax = lambda a: jax.lax.pmax(jnp.max(a), psum_axis)

    def solve_x(lam, p0, q0, P1, Q1, L, U, alpha, beta):
        p = p0 + lam * P1
        q = q0 + lam * Q1
        sp = jnp.sqrt(jnp.maximum(p, 0.0))
        sq = jnp.sqrt(jnp.maximum(q, 0.0))
        x = (sp * L + sq * U) / jnp.maximum(sp + sq, 1e-300)
        return jnp.clip(x, alpha, beta)

    rng = ub - lb
    sign = (x - xold1) * (xold1 - xold2)
    fac = jnp.where(sign > 0, asy_grow,
                    jnp.where(sign < 0, asy_shrink, 1.0))
    low2 = jnp.clip(x - fac * (xold1 - low),
                    x - 10.0 * rng, x - 0.01 * rng)
    upp2 = jnp.clip(x + fac * (upp - xold1),
                    x + 0.01 * rng, x + 10.0 * rng)
    low = jnp.where(k >= 2, low2, low)
    upp = jnp.where(k >= 2, upp2, upp)

    alpha = jnp.maximum(
        jnp.maximum(lb, low + albefa * (x - low)), x - move * rng
    )
    beta = jnp.minimum(
        jnp.minimum(ub, upp - albefa * (upp - x)), x + move * rng
    )

    eps0 = 1e-5
    Umx = upp - x
    xmL = x - low
    p0 = Umx**2 * (jnp.maximum(g, 0.0) + 1e-3 * jnp.abs(g) + eps0 / rng)
    q0 = xmL**2 * (jnp.maximum(-g, 0.0) + 1e-3 * jnp.abs(g) + eps0 / rng)
    P1 = Umx**2 * jnp.maximum(dc, 0.0)
    Q1 = xmL**2 * jnp.maximum(-dc, 0.0)
    ri = ci - gsum(P1 / Umx + Q1 / xmL)

    def con_value(lam):
        xs = solve_x(lam, p0, q0, P1, Q1, low, upp, alpha, beta)
        return ri + gsum(P1 / (upp - xs) + Q1 / (xs - low))

    c0 = con_value(0.0)

    def bracket_cond(hi):
        return (con_value(hi) > 0.0) & (hi < 1e12)

    hi = jax.lax.while_loop(bracket_cond, lambda h: h * 10.0,
                            jnp.asarray(1.0, x.dtype))

    def bisect(_, lohi):
        lo_b, hi_b = lohi
        mid = 0.5 * (lo_b + hi_b)
        gt = con_value(mid) > 0.0
        return (jnp.where(gt, mid, lo_b), jnp.where(gt, hi_b, mid))

    lo_b, hi_b = jax.lax.fori_loop(
        0, 60, bisect, (jnp.asarray(0.0, x.dtype), hi)
    )
    lam = jnp.where(c0 <= 0.0, 0.0, 0.5 * (lo_b + hi_b))
    x_new = solve_x(lam, p0, q0, P1, Q1, low, upp, alpha, beta)
    step = gmax(jnp.abs(x_new - x))
    return x_new, low, upp, lam, step


def device_update_body_multi(x, xold1, xold2, low, upp, g, dC, ci, lb,
                             ub, k, *, asy_grow=1.2, asy_shrink=0.7,
                             albefa=0.1, move=0.2, sweeps=8,
                             psum_axis=None):
    """Traceable m-constraint MMA update (coordinate-sweep dual).

    The dual of the separable MMA subproblem is solved exactly like the
    NumPy path (``MMA.optimize`` m > 1 branch): ``sweeps`` rounds of
    coordinate-wise bracket + 60-step bisection on each multiplier with
    the others held fixed.  ``dC`` is (m, n), ``ci`` is (m,) with the
    internal convention gi(x) = ci <= 0 feasible (callers pass -con).

    ``psum_axis``: as :func:`device_update_body` — block-sharded design
    vectors under ``shard_map``; every device solves the same global
    dual.

    Returns:
        (x_new, low, upp, lam (m,), step).
    """
    import jax
    import jax.numpy as jnp

    if psum_axis is None:
        gsum, gmax = jnp.sum, jnp.max
    else:
        gsum = lambda a: jax.lax.psum(jnp.sum(a), psum_axis)
        gmax = lambda a: jax.lax.pmax(jnp.max(a), psum_axis)

    m = dC.shape[0]

    rng = ub - lb
    sign = (x - xold1) * (xold1 - xold2)
    fac = jnp.where(sign > 0, asy_grow,
                    jnp.where(sign < 0, asy_shrink, 1.0))
    low2 = jnp.clip(x - fac * (xold1 - low),
                    x - 10.0 * rng, x - 0.01 * rng)
    upp2 = jnp.clip(x + fac * (upp - xold1),
                    x + 0.01 * rng, x + 10.0 * rng)
    low = jnp.where(k >= 2, low2, low)
    upp = jnp.where(k >= 2, upp2, upp)

    alpha = jnp.maximum(
        jnp.maximum(lb, low + albefa * (x - low)), x - move * rng
    )
    beta = jnp.minimum(
        jnp.minimum(ub, upp - albefa * (upp - x)), x + move * rng
    )

    eps0 = 1e-5
    Umx = upp - x
    xmL = x - low
    p0 = Umx**2 * (jnp.maximum(g, 0.0) + 1e-3 * jnp.abs(g) + eps0 / rng)
    q0 = xmL**2 * (jnp.maximum(-g, 0.0) + 1e-3 * jnp.abs(g) + eps0 / rng)
    P = Umx[None, :] ** 2 * jnp.maximum(dC, 0.0)
    Q = xmL[None, :] ** 2 * jnp.maximum(-dC, 0.0)
    ri = ci - jax.vmap(lambda Pi, Qi: gsum(Pi / Umx + Qi / xmL))(P, Q)

    def solve_x(lam):
        p = p0 + lam @ P
        q = q0 + lam @ Q
        sp = jnp.sqrt(jnp.maximum(p, 0.0))
        sq = jnp.sqrt(jnp.maximum(q, 0.0))
        xs = (sp * low + sq * upp) / jnp.maximum(sp + sq, 1e-300)
        return jnp.clip(xs, alpha, beta)

    def con_value(lam, i):
        xs = solve_x(lam)
        return ri[i] + gsum(P[i] / (upp - xs) + Q[i] / (xs - low))

    def coord(i, lam):
        lam0 = lam.at[i].set(0.0)
        c0v = con_value(lam0, i)

        def bracket_cond(hi):
            return (con_value(lam.at[i].set(hi), i) > 0.0) & (hi < 1e12)

        hi = jax.lax.while_loop(bracket_cond, lambda h: h * 10.0,
                                jnp.asarray(1.0, x.dtype))

        def bisect(_, lohi):
            lo_b, hi_b = lohi
            mid = 0.5 * (lo_b + hi_b)
            gt = con_value(lam.at[i].set(mid), i) > 0.0
            return (jnp.where(gt, mid, lo_b), jnp.where(gt, hi_b, mid))

        lo_b, hi_b = jax.lax.fori_loop(
            0, 60, bisect, (jnp.asarray(0.0, x.dtype), hi)
        )
        lam_i = jnp.where(c0v <= 0.0, 0.0, 0.5 * (lo_b + hi_b))
        return lam.at[i].set(lam_i)

    def sweep(_, lam):
        return jax.lax.fori_loop(0, m, coord, lam)

    lam = jax.lax.fori_loop(0, sweeps, sweep,
                            jnp.zeros((m,), x.dtype))
    x_new = solve_x(lam)
    step = gmax(jnp.abs(x_new - x))
    return x_new, low, upp, lam, step


def _make_device_update(asy_grow, asy_shrink, albefa, move):
    """Jitted wrapper of :func:`device_update_body`."""
    import functools

    import jax

    return jax.jit(functools.partial(
        device_update_body, asy_grow=asy_grow, asy_shrink=asy_shrink,
        albefa=albefa, move=move,
    ))


class MMA:
    """Method of Moving Asymptotes driver.

    Options (dict): ``max_iterations`` (200), ``move_limit`` (0.5 of the
    var range, asymptote clamp), ``asymptote_init`` (0.5),
    ``asymptote_shrink`` (0.7), ``asymptote_grow`` (1.2), ``tol`` (KKT
    style infinity-norm of the design step, 0 disables early stop),
    ``verbose`` (True), ``callback`` (called with (k, x, obj, con)).
    """

    def __init__(self, problem: Problem, options=None):
        self.problem = problem
        o = dict(options or {})
        self.max_iterations = int(o.get("max_iterations", o.get("mma_max_iterations", 200)))
        self.asy_init = float(o.get("asymptote_init", 0.5))
        self.asy_shrink = float(o.get("asymptote_shrink", 0.7))
        self.asy_grow = float(o.get("asymptote_grow", 1.2))
        self.move = float(o.get("move_limit", 0.2))
        self.albefa = float(o.get("albefa", 0.1))
        self.tol = float(o.get("tol", 0.0))
        self.verbose = bool(o.get("verbose", True))
        self.callback = o.get("callback")
        # device=True/"auto": jitted single-constraint subproblem (keeps
        # the design update on the accelerator); False: NumPy reference
        self.device = o.get("device", "auto")
        self.history = []

    def optimize(self):
        prob = self.problem
        n, m = prob.nvars, prob.ncon
        x = np.zeros(n)
        lb = np.zeros(n)
        ub = np.ones(n)
        prob.getVarsAndBounds(x, lb, ub)
        x = np.clip(x, lb, ub)
        rng = ub - lb
        xold1 = x.copy()
        xold2 = x.copy()
        low = x - self.asy_init * rng
        upp = x + self.asy_init * rng

        g = np.zeros(n)
        A = [np.zeros(n) for _ in range(m)]

        # "auto" keeps the NumPy coordinate-sweep dual as the m > 1
        # default (the oracle path); device=True forces the jitted
        # subproblem for any m (single-constraint dual bisection, or
        # the traced coordinate-sweep dual of device_update_body_multi)
        use_device = self.device is True or (
            m == 1 and self.device == "auto"
        )
        if use_device:
            import functools

            import jax
            import jax.numpy as jnp

            if m == 1:
                upd = _make_device_update(
                    self.asy_grow, self.asy_shrink, self.albefa,
                    self.move,
                )
            else:
                upd = jax.jit(functools.partial(
                    device_update_body_multi, asy_grow=self.asy_grow,
                    asy_shrink=self.asy_shrink, albefa=self.albefa,
                    move=self.move,
                ))
            x = jnp.asarray(x)
            xold1, xold2 = x, x
            low_d, upp_d = jnp.asarray(low), jnp.asarray(upp)
            lb_d, ub_d = jnp.asarray(lb), jnp.asarray(ub)

        for k in range(self.max_iterations):
            fail, f0, con = prob.evalObjCon(x)
            if fail:
                raise RuntimeError(f"evalObjCon failed at iteration {k}")
            fail = prob.evalObjConGradient(x, g, A)
            if fail:
                raise RuntimeError(f"evalObjConGradient failed at iteration {k}")
            con = np.atleast_1d(np.asarray(con, dtype=float))
            # ParOpt convention con >= 0 feasible -> gi = -con <= 0
            ci = -con
            dci = -np.stack([np.asarray(a, dtype=float) for a in A])

            if use_device:
                if m == 1:
                    x_new, low_d, upp_d, lam_d, step_d = upd(
                        x, xold1, xold2, low_d, upp_d,
                        jnp.asarray(g), jnp.asarray(dci[0]),
                        jnp.asarray(ci[0]), lb_d, ub_d, k,
                    )
                else:
                    x_new, low_d, upp_d, lam_d, step_d = upd(
                        x, xold1, xold2, low_d, upp_d,
                        jnp.asarray(g), jnp.asarray(dci),
                        jnp.asarray(ci), lb_d, ub_d, k,
                    )
                lam = np.atleast_1d(np.asarray(lam_d, dtype=float))
                step = float(step_d)
                self.history.append(
                    {"iter": k, "obj": float(f0), "con": con.tolist(),
                     "step": step, "lam": lam.tolist()}
                )
                if self.verbose:
                    print(
                        f"[mma] {k:4d} obj {f0: .8e} con "
                        + " ".join(f"{c: .3e}" for c in con)
                        + f" step {step:.3e}"
                    )
                if self.callback is not None:
                    self.callback(k, x, f0, con)
                xold2, xold1 = xold1, x
                x = x_new
                if self.tol > 0.0 and step < self.tol:
                    break
                continue

            # -- asymptote update (Svanberg's rule) -----------------------
            if k >= 2:
                sign = (x - xold1) * (xold1 - xold2)
                fac = np.ones(n)
                fac[sign > 0] = self.asy_grow
                fac[sign < 0] = self.asy_shrink
                low = x - fac * (xold1 - low)
                upp = x + fac * (upp - xold1)
                low = np.clip(low, x - 10.0 * rng, x - 0.01 * rng)
                upp = np.clip(upp, x + 0.01 * rng, x + 10.0 * rng)

            # Svanberg's bounds: stay inside the asymptotes by albefa and
            # within a move limit of the variable range
            alpha = np.maximum.reduce(
                [lb, low + self.albefa * (x - low), x - self.move * rng]
            )
            beta = np.minimum.reduce(
                [ub, upp - self.albefa * (upp - x), x + self.move * rng]
            )

            # -- separable approximations --------------------------------
            eps0 = 1e-5
            df = np.asarray(g, dtype=float)
            Umx = upp - x
            xmL = x - low
            p0 = Umx**2 * (np.maximum(df, 0.0) + 1e-3 * np.abs(df) + eps0 / rng)
            q0 = xmL**2 * (np.maximum(-df, 0.0) + 1e-3 * np.abs(df) + eps0 / rng)
            P = Umx[None, :] ** 2 * np.maximum(dci, 0.0)
            Q = xmL[None, :] ** 2 * np.maximum(-dci, 0.0)
            # subproblem constraint offsets: gi(x) approximated value at x
            ri = ci - (P / Umx[None, :] + Q / xmL[None, :]).sum(axis=1)

            # -- dual solve ----------------------------------------------
            lam = np.zeros(m)

            def con_value(lam, i):
                xs = _solve_dual_x(lam, p0, q0, P, Q, low, upp, alpha, beta)
                return ri[i] + (P[i] / (upp - xs) + Q[i] / (xs - low)).sum()

            for _ in range(1 if m == 1 else 8):  # coordinate sweeps
                for i in range(m):
                    # bisection on lam[i]: constraint value decreasing? it is
                    # increasing in lam... find bracket
                    lam_i = lam.copy()
                    lam_i[i] = 0.0
                    c0v = con_value(lam_i, i)
                    if c0v <= 0.0:
                        lam[i] = 0.0
                        continue
                    lo_b, hi_b = 0.0, 1.0
                    lam_i[i] = hi_b
                    while con_value(lam_i, i) > 0.0 and hi_b < 1e12:
                        hi_b *= 10.0
                        lam_i[i] = hi_b
                    for _ in range(60):
                        mid = 0.5 * (lo_b + hi_b)
                        lam_i[i] = mid
                        if con_value(lam_i, i) > 0.0:
                            lo_b = mid
                        else:
                            hi_b = mid
                    lam[i] = 0.5 * (lo_b + hi_b)

            x_new = _solve_dual_x(lam, p0, q0, P, Q, low, upp, alpha, beta)

            step = np.abs(x_new - x).max()
            self.history.append(
                {"iter": k, "obj": float(f0), "con": con.tolist(),
                 "step": float(step), "lam": lam.tolist()}
            )
            if self.verbose:
                print(
                    f"[mma] {k:4d} obj {f0: .8e} con "
                    + " ".join(f"{c: .3e}" for c in con)
                    + f" step {step:.3e}"
                )
            if self.callback is not None:
                self.callback(k, x, f0, con)

            xold2, xold1 = xold1, x
            x = x_new
            if self.tol > 0.0 and step < self.tol:
                break

        self.x = x
        return x
