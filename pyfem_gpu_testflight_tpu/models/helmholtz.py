"""Helmholtz PDE filter: -r0^2 Delta rho + rho = x (natural Neumann BC).

Reference parity: ``Helmholtz`` (pyfem.py:2071-2177) — assembles
K = r0^2 * stiffness + mass and R = mass once at construction;
``apply(x) = K^-1 (R x)`` and ``apply_gradient(g) = R^T K^-1 g``.

TPU-first: the reference factorizes K with pyamg Ruge-Stuben once and
solves at tol 1e-8 (pyfem.py:2098-2115).  Here K is SPD and
mass-dominated at typical filter radii, so a jitted Jacobi-PCG at the
same tolerance replaces the AMG hierarchy; both apply() and
apply_gradient() are single fused device solves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import assembly, solvers
from ..ops import stiffness
from .base import FEModel

__all__ = ["Helmholtz"]


@jax.jit
def _filter_matrices(Xe, dN, N, wq, r0):
    Me = stiffness.mass_matrix(Xe, dN, N, wq)
    Ke = stiffness.poisson_stiffness(Xe, dN, wq, jnp.full(Me.shape[:1] + (N.shape[0],), r0**2, Me.dtype))
    return Ke + Me, Me


class Helmholtz(FEModel):
    """PDE density filter for topology optimization.

    Args:
        r0: filter radius.
    """

    def __init__(self, r0, etype, X, conn, dtype=jnp.float64, solver="cg",
                 rtol=1e-8):
        super().__init__(etype, X, conn, (), None, ndof_per_node=1, dtype=dtype)
        self.r0 = float(r0)
        self.solver = solver
        self.rtol = float(rtol)
        self.Ke, self.Re = _filter_matrices(
            self.Xe, self.dN, self.N, self.wq, jnp.asarray(self.r0, self.dtype)
        )
        self._inv_diag = 1.0 / self.diagonal(self.Ke)
        self._lu = None  # lazy host factorization for solver="direct"

    # -- structured fast path ---------------------------------------------

    def attach_structured_grid(self, nnodes_x, nnodes_y, nnodes_z=None):
        """Stencil-operator fast path for structured quad/hex grids.

        apply()/apply_gradient() then run shifted-slice matvecs + jitted
        CG instead of gather/scatter SpMV (~40x faster on TPU).
        """
        from ..ops.stencil import Stencil2D, Stencil3D

        nx, ny = int(nnodes_x), int(nnodes_y)
        if nnodes_z is None:
            assert self.etype.name == "quad4"
            assert nx * ny == self.nnodes
            st = Stencil2D(nx, ny, 1)
            self._st_shape = (ny, nx)
        else:
            assert self.etype.name == "hex8"
            nz = int(nnodes_z)
            assert nx * ny * nz == self.nnodes
            st = Stencil3D(nx, ny, nz, 1)
            self._st_shape = (nz, ny, nx)
        self._st = st
        self._coeffK = st.assemble(self.Ke)
        self._coeffR = st.assemble(self.Re)
        diag = st.diagonal(self._coeffK)
        self._st_inv_diag = 1.0 / jnp.where(diag == 0, 1.0, diag)

        # one jitted program per direction: eager PCG ops pay a dispatch
        # round trip each over a remote-tunneled device; big arrays are
        # jit arguments, never closure constants
        from ..multigrid import pcg

        rtol, maxiter = self.rtol, 10 * self.ndof
        shape = self._st_shape

        def solve_K(coeffK, invd, b_grid):
            x, _, _ = pcg(
                lambda u: st.matvec(coeffK, u), lambda r: invd * r,
                b_grid, rtol=rtol, maxiter=maxiter,
            )
            return x

        def fwd(coeffK, coeffR, invd, x):
            rho = solve_K(coeffK, invd,
                          st.matvec(coeffR, x.reshape((1,) + shape)))
            return rho.reshape(-1)

        def bwd(coeffK, coeffR, invd, g):
            z = solve_K(coeffK, invd, g.reshape((1,) + shape))
            return st.matvec(coeffR, z).reshape(-1)

        self._st_fwd = jax.jit(fwd)
        self._st_bwd = jax.jit(bwd)
        return self

    # -- core ops ------------------------------------------------------------

    def _solve_K(self, b):
        if self.solver == "direct":
            import numpy as np

            if self._lu is None:
                from scipy.sparse.linalg import factorized

                self._lu = factorized(self.assemble_scipy(self.Ke).tocsc())
            return jnp.asarray(self._lu(np.asarray(b)))
        data = (self.Ke, self.conn_dof, self.bc.mask)  # no fixed dofs
        return solvers.cg(
            assembly.bc_elem_matvec, data, b,
            inv_diag=self._inv_diag, rtol=self.rtol,
        ).x

    def _check_size(self, x):
        # jax gathers clamp out-of-bounds indices instead of raising
        # (numpy in the reference raises IndexError), so a wrong-sized
        # design vector would silently filter to garbage
        if x.shape != (self.nnodes,):
            raise ValueError(
                f"Helmholtz expects a nodal field of shape "
                f"({self.nnodes},), got {x.shape}"
            )
        return x

    def apply(self, x):
        """x -> rho = K^-1 R x."""
        x = self._check_size(jnp.asarray(x, dtype=self.dtype))
        if getattr(self, "_st", None) is not None:
            return self._st_fwd(self._coeffK, self._coeffR,
                                self._st_inv_diag, x)
        return self._solve_K(self.matvec(self.Re, x))

    def apply_gradient(self, gradrho):
        """d rho/d x transpose: g -> R^T K^-1 g (R is symmetric here)."""
        g = self._check_size(jnp.asarray(gradrho, dtype=self.dtype))
        if getattr(self, "_st", None) is not None:
            return self._st_bwd(self._coeffK, self._coeffR,
                                self._st_inv_diag, g)
        return self.matvec(self.Re, self._solve_K(g))

    def compute_rhs(self, x):
        return self.matvec(self.Re, jnp.asarray(x, dtype=self.dtype))

    def compute_jacobian(self):
        return self.assemble_scipy(self.Ke)
