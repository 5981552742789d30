"""Nonlinear Poisson: -div( h(x) (1 + u^2) grad u ) = g, Newton-solved.

Reference parity: ``NonlinearPoisson2D`` (pyfem.py:1332-1664) — the same
manufactured source term g (pyfem.py:1427-1448), the same
Bernstein-polynomial design field h(xdv) (pyfem.py:1450-1472), residual
and consistent tangent, and the Newton contract of
``Assembler.solve_nonlinear`` (pyfem.py:2319-2355).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.precision import einsum
from scipy import special

from .. import assembly, solvers
from ..ops import geometry
from .base import FEModel

__all__ = ["NonlinearPoisson", "NonlinearPoisson2D"]


def gfunc(Xq):
    """Manufactured source term (pyfem.py:1427-1448)."""
    x, y = Xq[..., 0], Xq[..., 1]
    return (
        1e4 * x * (1.0 - x) * (1.0 - 2.0 * x) * y * (1.0 - y) * (1.0 - 2.0 * y)
    )


def hfunc(xdv, Xq):
    """Bernstein design field h = 1 + sum_k xdv_k B_k(x) 4y(1-y)."""
    x, y = Xq[..., 0], Xq[..., 1]
    n = xdv.shape[0]
    h = jnp.ones_like(x)
    yarg = 4.0 * y * (1.0 - y)
    for k in range(n):
        coef = float(special.binom(n - 1, k))
        h = h + xdv[k] * (coef * (1.0 - x) ** (n - 1 - k) * x**k) * yarg
    return h


@functools.partial(jax.jit, static_argnames=())
def _residual_elem(Xe, dN, N, wq, conn, xdv, u):
    """Element residual R_e (pyfem.py:1530-1537)."""
    detJ, Ngrad = geometry.shape_gradients(Xe, dN)
    Xq = geometry.interp_to_quads(N, Xe)
    ue = jnp.take(u, conn, axis=0)
    uq = geometry.interp_to_quads(N, ue)
    h = hfunc(xdv, Xq)
    g = gfunc(Xq)
    c = detJ * h * (1.0 + uq**2) * wq[None, :]
    flux = einsum("eq,eqjl,eqkl,ek->ej", c, Ngrad, Ngrad, ue)
    load = einsum("eq,qn->en", detJ * wq[None, :] * g, N)
    return flux - load


@functools.partial(jax.jit, static_argnames=())
def _tangent_elem(Xe, dN, N, wq, conn, xdv, u):
    """Consistent tangent K_e (pyfem.py:1595-1609)."""
    detJ, Ngrad = geometry.shape_gradients(Xe, dN)
    Xq = geometry.interp_to_quads(N, Xe)
    ue = jnp.take(u, conn, axis=0)
    uq = geometry.interp_to_quads(N, ue)
    h = hfunc(xdv, Xq)
    c1 = detJ * h * (1.0 + uq**2) * wq[None, :]
    Ke = einsum("eq,eqjl,eqkl->ejk", c1, Ngrad, Ngrad)
    c2 = 2.0 * detJ * h * uq * wq[None, :]
    bbu = einsum("eqjl,eqkl,ek->eqj", Ngrad, Ngrad, ue)
    Ke = Ke + einsum("eq,eqj,qi->eji", c2, bbu, N)
    return Ke


class NonlinearPoisson(FEModel):
    """Newton-solved nonlinear Poisson problem on a 2D mesh."""

    def __init__(self, etype, X, conn, dof_fixed=(), dof_fixed_vals=None,
                 dtype=jnp.float64):
        super().__init__(
            etype, X, conn, dof_fixed, dof_fixed_vals, ndof_per_node=1,
            dtype=dtype,
        )

    def element_jacobian(self, xdv, u):
        return _tangent_elem(
            self.Xe, self.dN, self.N, self.wq, self.conn,
            jnp.asarray(xdv, self.dtype), jnp.asarray(u, self.dtype),
        )

    def compute_jacobian(self, xdv, u):
        return self.assemble_scipy(self.element_jacobian(xdv, u))

    def compute_rhs(self, xdv, u):
        """Global Newton residual R(u) (pyfem.py:1375-1388)."""
        re = _residual_elem(
            self.Xe, self.dN, self.N, self.wq, self.conn,
            jnp.asarray(xdv, self.dtype), jnp.asarray(u, self.dtype),
        )
        return assembly.assemble_vector(re, self.conn_dof, self.ndof)

    def residual(self, xdv, u):
        """BC-applied residual: fixed dofs zeroed (dof values pinned)."""
        return self.bc.zero_fixed(self.compute_rhs(xdv, u))

    def solve_nonlinear(
        self, method="gmres", xdv=None, u0=None, tol=1e-10, atol=1e-12,
        max_iter=10, verbose=True,
    ):
        """Newton loop with the reference contract (pyfem.py:2319-2355)."""
        assert method in ("direct", "cg", "gmres")
        xdv = jnp.asarray(xdv, self.dtype)
        u = jnp.zeros(self.ndof, self.dtype) if u0 is None else jnp.asarray(u0)

        def jac_solve(u_k, res):
            Ke = self.element_jacobian(xdv, u_k)
            du, _ = self._solve_system(Ke, res, method)
            if verbose and method != "direct":
                st = self.last_solve_stats
                print(
                    f"        [{st['method']}: {st['iters']} iters, "
                    f"||r|| = {st['resnorm']:.3e}]"
                )
            return du

        return solvers.newton(
            lambda u_k: self.residual(xdv, u_k),
            jac_solve,
            u,
            tol=tol,
            atol=atol,
            max_iter=max_iter,
            verbose=verbose,
        )


NonlinearPoisson2D = NonlinearPoisson
