"""Linear and nonlinear solvers.

* ``cg``: Jacobi-preconditioned conjugate gradients as a jitted
  ``lax.while_loop`` — the TPU replacement for the reference's
  pyamg-preconditioned ``scipy cg`` (pyfem.py:2402-2423).  Stopping rule
  matches scipy's legacy semantics: ||r||_2 <= max(rtol * ||b||_2, atol).
* ``gmres``: ``jax.scipy.sparse.linalg.gmres`` with the same Jacobi
  preconditioner (for the nonsymmetric Newton systems).
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

__all__ = ["cg", "gmres", "direct_solve", "newton", "CGResult"]


class CGResult(NamedTuple):
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
):
    """Jacobi-preconditioned GMRES via jax.scipy (for nonsymmetric K).

    The system is solved in unit-rhs normalization: jax's GMRES has
    absolute epsilon floors in its projection arithmetic, so tiny-norm
    right-hand sides (late Newton steps) stall orders of magnitude above
    the requested *relative* tolerance unless b is rescaled to O(1).
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    M = None
    if inv_diag is not None:
        M = lambda v: inv_diag * v
    normb = jnp.linalg.norm(b)
    scale = jnp.where(normb > 0, normb, 1.0)
    x, _ = jax.scipy.sparse.linalg.gmres(
        lambda v: apply_fn(data, v),
        b / scale,
        x0=x0 / scale,
        tol=rtol,
        atol=atol,
        M=M,
        maxiter=maxiter,
        solve_method="batched",
    )
    return x * scale


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
