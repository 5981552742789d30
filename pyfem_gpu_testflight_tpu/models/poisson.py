"""Linear Poisson model: -k Delta u = g with Dirichlet BCs.

Reference parity: ``LinearPoisson`` (pyfem.py:934-1329) — RAMP-penalized
conductivity for topology optimization, source-term callback ``gfunc``,
compliance/volume objectives with adjoint gradients, complex-step-ready
(complex densities propagate through assembly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.precision import einsum

from .. import assembly
from ..ops import geometry, stiffness
from .base import FEModel, ramp, ramp_deriv

__all__ = ["LinearPoisson"]


@jax.jit
def _element_jacobian(Xe, dN, N, wq, conn, rho, p):
    rho_e = jnp.take(rho, conn, axis=0)
    rho_q = geometry.interp_to_quads(N, rho_e)
    return stiffness.poisson_stiffness(Xe, dN, wq, ramp(rho_q, p))


@jax.jit
def _dv_sens(Xe, dN, N, wq, conn, rho, p, phi, psi):
    rho_e = jnp.take(rho, conn, axis=0)
    rho_q = geometry.interp_to_quads(N, rho_e)
    inner = stiffness.poisson_dv_inner(
        Xe,
        dN,
        N,
        wq,
        ramp_deriv(rho_q, p),
        jnp.take(phi, conn, axis=0),
        jnp.take(psi, conn, axis=0),
    )
    return assembly.assemble_vector(inner, conn, rho.shape[0])


class LinearPoisson(FEModel):
    """Linear (optionally RAMP-penalized) Poisson problem.

    Args:
        etype: element type name or ElementType.
        X, conn: mesh arrays.
        dof_fixed, dof_fixed_vals: Dirichlet data (vals None => zeros).
        gfunc: source term callback Xq -> values, traced under jit
            (pyfem.py:1126-1128).
        kappa0: nominal conductivity (kept for API parity; like the
            reference, the stiffness uses the RAMP factor only).
        p: RAMP penalization parameter.
        kernel: "einsum" (any element/dtype) or "pallas"
            (quad4/hex8/tet10/brick20 + float32 native element kernels —
            the A2DWrapper role, pyfem.py:2180, extended past its
            hex8-only support, pyfem.py:2260-2264).
    """

    def __init__(
        self,
        etype,
        X,
        conn,
        dof_fixed=(),
        dof_fixed_vals=None,
        gfunc=None,
        kappa0=1.0,
        p=0.0,
        dtype=jnp.float64,
        kernel="einsum",
    ):
        super().__init__(
            etype, X, conn, dof_fixed, dof_fixed_vals, ndof_per_node=1, dtype=dtype
        )
        self.gfunc = gfunc
        self.kappa0 = kappa0
        self.p = float(p)
        self._rhs = None
        if kernel == "pallas" and (
            self.etype.name not in ("quad4", "hex8", "tet10", "brick20")
            or self.dtype != jnp.float32
        ):
            raise ValueError(
                "kernel='pallas' requires quad4/hex8/tet10/brick20 "
                "+ float32"
            )
        self.kernel = kernel
        if kernel == "pallas" and self.etype.name in ("tet10", "brick20"):
            import warnings

            # see models/elasticity.py: f32 quadratic elements lose ~2
            # digits on distorted meshes (einsum-f32 equally)
            warnings.warn(
                "kernel='pallas' on quadratic elements runs in float32; "
                "distorted meshes lose ~2 digits vs float64 (use the "
                "default einsum kernel with dtype=float64 for "
                "accuracy-critical work)",
                stacklevel=2,
            )
        if kernel == "pallas":
            if self.etype.ndims == 3:
                from ..ops.pallas_stiffness3d import transpose_xe_3d

                self._XeT = transpose_xe_3d(self.Xe)
            else:
                from ..ops.pallas_stiffness import transpose_xe

                self._XeT = transpose_xe(self.Xe)

    # -- assembly ----------------------------------------------------------

    def element_jacobian(self, rho=1.0):
        """Element stiffness matrices Ke (nelems, nn, nn)."""
        rho = self._as_nodal(rho)
        if self.kernel == "pallas" and not jnp.iscomplexobj(rho):
            rho_q = geometry.interp_to_quads(
                self.N, jnp.take(rho, self.conn, axis=0)
            )
            cqT = jnp.transpose(ramp(rho_q, self.p))
            interp = jax.default_backend() == "cpu"
            if self.etype.ndims == 3:
                from ..ops import pallas_stiffness3d as pk3

                KeT = pk3.poisson_stiffness_3d(
                    self._XeT, cqT, etype=self.etype.name,
                    interpret=interp
                )
            else:
                from ..ops import pallas_stiffness as pk

                KeT = pk.poisson_stiffness_quad4(
                    self._XeT, cqT, interpret=interp
                )
            nn = self.nnodes_per_elem
            return jnp.transpose(KeT).reshape(self.nelems, nn, nn)
        return _element_jacobian(
            self.Xe, self.dN, self.N, self.wq, self.conn, rho, self.p
        )

    def compute_jacobian(self, rho=1.0):
        """Assembled scipy CSR global matrix (host; oracle/direct path)."""
        return self.assemble_scipy(self.element_jacobian(rho))

    def compute_rhs(self):
        """Global load vector: rhs[n] = sum_e sum_q w|J| g(Xq) N_n."""
        if self._rhs is None:
            detJ, _ = geometry.det_and_inv(geometry.jacobian(self.Xe, self.dN))
            Xq = geometry.interp_to_quads(self.N, self.Xe)
            g = self.gfunc(Xq) if self.gfunc is not None else jnp.zeros(detJ.shape)
            g = jnp.broadcast_to(jnp.asarray(g, dtype=self.dtype), detJ.shape)
            fe = einsum("eq,qn->en", detJ * self.wq[None, :] * g, self.N)
            self._rhs = assembly.assemble_vector(fe, self.conn_dof, self.ndof)
        return self._rhs

    # -- solves --------------------------------------------------------------

    def solve(self, method="cg", rho=1.0, rtol=1e-8, maxiter=None):
        """Static solve with Dirichlet BCs (direct | cg | gmres | gmg)."""
        Ke = None if method in ("gmg", "sharded_gmg", "pmg") else self.element_jacobian(rho)
        u, _ = self._solve_system(Ke, self.compute_rhs(), method, rtol,
                                  rho=rho, maxiter=maxiter)
        return u

    # -- optimization functionals -------------------------------------------

    def compliance(self, rho, solver="cg", weighted=True):
        """Thermal compliance c = <rhs_bc, u> (or mean(u)) and state u.

        Mirrors pyfem.py:1032-1073; complex-step requires solver='direct'.
        """
        rho = self._as_nodal(rho)
        Ke = None if solver in ("gmg", "sharded_gmg", "pmg") else self.element_jacobian(rho)
        u, b = self._solve_system(Ke, self.compute_rhs(), solver, rho=rho)
        if weighted:
            return b.dot(u), u
        return jnp.sum(u) / u.shape[0], u

    def compliance_grad(self, rho, u, weighted=True, solver="cg"):
        """Adjoint gradient of compliance w.r.t. nodal rho (pyfem.py:1075).

        Unlike the reference (which hardcodes spsolve for the unweighted
        adjoint, pyfem.py:1098), the extra adjoint solve honors the
        caller's solver so the optimization loop stays on device.
        """
        rho = self._as_nodal(rho)
        if weighted:
            psi = u  # self-adjoint
        else:
            Ke = None if solver in ("gmg", "sharded_gmg", "pmg") else self.element_jacobian(rho)
            rhs = jnp.ones(self.ndof, dtype=self.dtype)
            psi, _ = self._solve_system(Ke, rhs, solver, rho=rho)
            psi = psi / self.ndof
        return -self.k_dv_sens(rho, psi, u)

    def k_dv_sens(self, rho, phi, psi):
        """d(phi^T K psi)/d rho, nodal (pyfem.py:1240-1276)."""
        rho = self._as_nodal(rho)
        if self._use_structured_sens(rho, phi, psi):
            return self._k_dv_sens_structured(rho, phi, psi)
        return _dv_sens(
            self.Xe, self.dN, self.N, self.wq, self.conn, rho, self.p,
            jnp.asarray(phi), jnp.asarray(psi),
        )

    def volume(self, rho):
        return jnp.sum(rho) / self.nnodes

    def volume_grad(self, rho):
        return jnp.ones(self.nnodes, dtype=self.dtype) / self.nnodes
