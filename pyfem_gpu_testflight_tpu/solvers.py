"""Linear and nonlinear solvers.

* ``cg``: Jacobi-preconditioned conjugate gradients as a jitted
  ``lax.while_loop`` — the TPU replacement for the reference's
  pyamg-preconditioned ``scipy cg`` (pyfem.py:2402-2423).  Stopping rule
  matches scipy's legacy semantics: ||r||_2 <= max(rtol * ||b||_2, atol).
* ``gmres``: restarted GMRES(m) with the same Jacobi preconditioner
  applied on the right (for the nonsymmetric Newton systems); returns
  iteration count and true residual norm like ``cg``.
* ``direct_solve``: host scipy SuperLU — retained as the float64/complex
  oracle path (reference solver="direct", pyfem.py:2414).
* ``newton``: the reference's Newton contract (pyfem.py:2319-2355):
  relative tol vs the first residual norm, absolute floor, max_iter,
  full reassembly per iteration.

Operator convention: linear operators are passed as ``(apply_fn, data)``
where ``apply_fn(data, x)`` is a pure function and ``data`` is a pytree of
arrays.  Keeping ``apply_fn`` a stable module-level function and threading
``data`` as a traced argument means one XLA compilation per problem
*shape*, not per problem *instance*.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["cg", "gmres", "direct_solve", "newton", "CGResult",
           "GMRESResult"]


class CGResult(NamedTuple):
    x: jax.Array
    iters: jax.Array
    resnorm: jax.Array


class GMRESResult(NamedTuple):
    x: jax.Array
    iters: jax.Array
    resnorm: jax.Array


def cg_loop(matvec, b, inv_diag=None, rtol=1e-8, atol=0.0, maxiter=1000, x0=None):
    """Traced Jacobi-PCG while-loop, embeddable inside larger jits.

    Args:
        matvec: u -> A u (traced closure; operator arrays should be jit
            arguments of the enclosing program, not Python constants).

    Returns:
        (x, iters, resnorm).
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if inv_diag is None:
        inv_diag = jnp.ones_like(b)
    normb = jnp.linalg.norm(b)
    tol2 = jnp.maximum(rtol * normb, atol) ** 2

    r = b - matvec(x0)
    z = inv_diag * r
    p = z
    rz = jnp.vdot(r, z)

    def cond(state):
        _, r, _, _, _, k = state
        return (jnp.vdot(r, r).real > tol2) & (k < maxiter)

    def body(state):
        x, r, z, p, rz, k = state
        Ap = matvec(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = inv_diag * r
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    x, r, _, _, _, k = jax.lax.while_loop(cond, body, (x0, r, z, p, rz, 0))
    return x, k, jnp.sqrt(jnp.vdot(r, r).real)


@functools.partial(jax.jit, static_argnames=("apply_fn", "maxiter"))
def _cg_impl(apply_fn, data, b, x0, inv_diag, rtol, atol, maxiter):
    return cg_loop(
        lambda u: apply_fn(data, u),
        b,
        inv_diag=inv_diag,
        rtol=rtol,
        atol=atol,
        maxiter=maxiter,
        x0=x0,
    )


def cg(
    apply_fn: Callable,
    data,
    b,
    *,
    inv_diag=None,
    x0=None,
    rtol=1e-8,
    atol=0.0,
    maxiter=None,
):
    """Preconditioned conjugate gradients.

    Args:
        apply_fn: ``apply_fn(data, x) -> A x`` (stable, jit-traceable).
        data: operator pytree (element matrices, dof maps, masks, ...).
        b: right-hand side.
        inv_diag: inverse-diagonal (Jacobi) preconditioner; identity if None.
        rtol/atol: stop when ||r|| <= max(rtol*||b||, atol).
        maxiter: default 10 * ndof.

    Returns:
        CGResult(x, iters, resnorm).
    """
    n = b.shape[0]
    if maxiter is None:
        maxiter = 10 * n
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if inv_diag is None:
        inv_diag = jnp.ones_like(b)
    x, k, rn = _cg_impl(
        apply_fn,
        data,
        b,
        x0,
        inv_diag,
        jnp.asarray(rtol, jnp.real(b).dtype),
        jnp.asarray(atol, jnp.real(b).dtype),
        int(maxiter),
    )
    return CGResult(x, k, rn)


def gmres_loop(matvec, b, inv_diag=None, rtol=1e-8, atol=0.0,
               maxiter=1000, restart=30, x0=None, precond=None):
    """Traced restarted GMRES(m), right-preconditioned, Givens-updated.

    Right preconditioning (solve A M^-1 y = b, x = M^-1 y) keeps the
    least-squares residual equal to the *true* residual ||b - A x||, so
    convergence is reported without an extra host-visible recheck
    matvec (the reference reads scipy's info flag, pyfem.py:2421-2422).

    ``precond`` (optional) is a general right preconditioner ``v ->
    M^-1 v`` (e.g. a GMG V-cycle); it must be a *fixed linear* operator
    across the solve.  When given, ``inv_diag`` is ignored.

    Returns:
        (x, iters, resnorm) — iters is the exact number of inner Arnoldi
        steps executed (one ``A M^-1`` matvec each); restart cycles exit
        early once the rotated-residual estimate dips under tolerance,
        so a system converging at inner step 3 pays 3 matvecs, not m.
    """
    n = b.shape[0]
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if precond is not None:
        minv = precond
    else:
        if inv_diag is None:
            inv_diag = jnp.ones_like(b)
        minv = lambda v: inv_diag * v
    m = int(min(restart, n))
    rdt = jnp.real(b).dtype
    normb = jnp.linalg.norm(b)
    tol = jnp.maximum(rtol * normb, atol).astype(rdt)

    def amv(v):
        return matvec(minv(v))

    def cycle(x):
        r = b - matvec(x)
        beta = jnp.linalg.norm(r)
        V = jnp.zeros((m + 1, n), b.dtype).at[0].set(
            r / jnp.where(beta > 0, beta, 1.0)
        )
        H = jnp.zeros((m, m + 1), b.dtype)  # row j = rotated column j
        cs = jnp.ones(m, b.dtype)
        sn = jnp.zeros(m, b.dtype)
        g = jnp.zeros(m + 1, b.dtype).at[0].set(beta.astype(b.dtype))

        def arnoldi(st):
            V, H, cs, sn, g, j = st
            w = amv(V[j])
            # classical Gram-Schmidt, twice (CGS2): unset rows of V are
            # zero, so the full-matrix products project on span(V[:j+1]).
            # Precision pin is load-bearing: TPU dot_general defaults to
            # bf16 mantissas, which destroys the basis orthogonality —
            # measured on v5e: GMRES stagnates at ~1e-3 relative
            # residual (sqrt(eps_bf16)) instead of converging.
            hp = jax.lax.Precision.HIGHEST
            h = jnp.matmul(V.conj(), w, precision=hp)
            w = w - jnp.matmul(h, V, precision=hp)
            h2 = jnp.matmul(V.conj(), w, precision=hp)
            w = w - jnp.matmul(h2, V, precision=hp)
            h = h + h2
            hn = jnp.linalg.norm(w)
            V = V.at[j + 1].set(w / jnp.where(hn > 0, hn, 1.0))
            hcol = h.at[j + 1].add(hn.astype(b.dtype))

            def rot(i, hv):
                t = cs[i].conj() * hv[i] + sn[i].conj() * hv[i + 1]
                hv = hv.at[i + 1].set(-sn[i] * hv[i] + cs[i] * hv[i + 1])
                return hv.at[i].set(t)

            hcol = jax.lax.fori_loop(0, j, rot, hcol)
            hjj, hsub = hcol[j], hcol[j + 1]
            den = jnp.sqrt(jnp.abs(hjj) ** 2 + jnp.abs(hsub) ** 2)
            c_new = jnp.where(den > 0, jnp.abs(hjj) / jnp.where(den > 0, den, 1.0), 1.0)
            phase = jnp.where(
                jnp.abs(hjj) > 0,
                hjj / jnp.where(jnp.abs(hjj) > 0, jnp.abs(hjj), 1.0),
                1.0,
            )
            s_new = jnp.where(
                den > 0, phase * hsub.conj() / jnp.where(den > 0, den, 1.0), 0.0
            )
            cs = cs.at[j].set(c_new.astype(b.dtype))
            sn = sn.at[j].set(s_new)
            hcol = hcol.at[j].set((phase * den).astype(b.dtype))
            hcol = hcol.at[j + 1].set(0.0)
            g = g.at[j + 1].set(-sn[j] * g[j])
            g = g.at[j].set(cs[j].conj() * g[j])
            H = H.at[j].set(hcol)
            return (V, H, cs, sn, g, j + 1)

        def arn_cond(st):
            *_, g, j = st
            # |g[j]| is the current rotated-residual estimate (== the
            # true residual under right preconditioning, up to roundoff)
            return (j < m) & (jnp.abs(g[j]) > tol)

        V, H, cs, sn, g, took = jax.lax.while_loop(
            arn_cond, arnoldi, (V, H, cs, sn, g, 0)
        )

        # back substitution on the rotated (upper-triangular) system;
        # breakdown columns (H[j,j] == 0 after a lucky breakdown) carry
        # zero g and contribute y[j] = 0
        def back(i, y):
            j = m - 1 - i
            s = g[j] - jnp.matmul(
                H[:, j], y, precision=jax.lax.Precision.HIGHEST
            )
            hjj = H[j, j]
            yj = jnp.where(
                jnp.abs(hjj) > 0, s / jnp.where(hjj == 0, 1.0, hjj), 0.0
            )
            return y.at[j].set(yj)

        y = jax.lax.fori_loop(0, m, back, jnp.zeros(m, b.dtype))
        x = x + minv(
            jnp.matmul(y, V[:m], precision=jax.lax.Precision.HIGHEST)
        )
        rvec = b - matvec(x)
        return x, jnp.sqrt(jnp.vdot(rvec, rvec).real), took

    r0 = jnp.linalg.norm(b - matvec(x0))

    def cond(s):
        _, k, rn = s
        return (rn > tol) & (k < maxiter)

    def body(s):
        x, k, _ = s
        x, rn, took = cycle(x)
        return (x, k + took, rn)

    x, k, rn = jax.lax.while_loop(cond, body, (x0, 0, r0.astype(rdt)))
    return x, k, rn


@functools.partial(
    jax.jit, static_argnames=("apply_fn", "maxiter", "restart")
)
def _gmres_impl(apply_fn, data, b, x0, inv_diag, rtol, atol, maxiter,
                restart):
    return gmres_loop(
        lambda u: apply_fn(data, u), b, inv_diag=inv_diag, rtol=rtol,
        atol=atol, maxiter=maxiter, restart=restart, x0=x0,
    )


def gmres(
    apply_fn: Callable,
    data,
    b,
    *,
    inv_diag=None,
    x0=None,
    rtol=1e-8,
    atol=0.0,
    maxiter=None,
    restart=30,
):
    """Jacobi-preconditioned restarted GMRES (for nonsymmetric K).

    Same calling convention as :func:`cg`; the Jacobi preconditioner is
    applied on the right so the reported residual is the true one.

    Returns:
        GMRESResult(x, iters, resnorm).
    """
    n = b.shape[0]
    if maxiter is None:
        maxiter = 10 * n
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if inv_diag is None:
        inv_diag = jnp.ones_like(b)
    x, k, rn = _gmres_impl(
        apply_fn, data, b, x0, inv_diag,
        jnp.asarray(rtol, jnp.real(b).dtype),
        jnp.asarray(atol, jnp.real(b).dtype),
        int(maxiter), int(restart),
    )
    return GMRESResult(x, k, rn)


def direct_solve(K_csr, rhs):
    """Host sparse direct solve (SuperLU) — float64/complex oracle path."""
    from scipy.sparse.linalg import spsolve

    return spsolve(K_csr.tocsr(), np.asarray(rhs))


def newton(
    residual_fn: Callable,
    jacobian_solve_fn: Callable,
    u0,
    *,
    tol=1e-10,
    atol=1e-12,
    max_iter=10,
    verbose=True,
    tag="pyfem-tpu",
):
    """Newton's method with the reference's convergence contract.

    Args:
        residual_fn: u -> residual (BCs applied).
        jacobian_solve_fn: (u, res) -> update solving K(u) du = res.
        u0: initial iterate.

    Returns:
        u: converged solution.
    """
    u = u0
    res_norm_init = None
    for k in range(max_iter):
        res = residual_fn(u)
        res_norm = float(jnp.linalg.norm(res))
        if verbose:
            print(tag, "{0:5d} {1:25.15e}".format(k, res_norm))
        if k == 0:
            res_norm_init = res_norm
        elif res_norm < tol * res_norm_init or res_norm < atol:
            break
        u = u - jacobian_solve_fn(u, res)
    return u
