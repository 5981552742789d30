"""Linear elasticity: plane stress (2D) / isotropic 3D.

Reference parity: ``LinearElasticity`` (pyfem.py:1667-2068) — RAMP
penalization, nodal-force rhs, compliance/volume objectives with adjoint
gradients, complex-step-ready.

TPU-first note: the stiffness is assembled in Lame form (three
Ngrad x Ngrad contractions) rather than via Voigt B matrices — see
``ops.stiffness.elasticity_stiffness``.  The result is algebraically
identical to the reference's B^T C0 B einsum (pyfem.py:2016-2027).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import assembly
from ..ops import geometry, stiffness
from .base import FEModel, ramp, ramp_deriv

__all__ = ["LinearElasticity"]


@jax.jit
def _element_jacobian(Xe, dN, N, wq, conn, rho, p, mu, lam):
    rho_e = jnp.take(rho, conn, axis=0)
    rho_q = geometry.interp_to_quads(N, rho_e)
    return stiffness.elasticity_stiffness(Xe, dN, wq, ramp(rho_q, p), mu, lam)


@jax.jit
def _cq_transposed(N, conn, rho, p):
    rho_q = geometry.interp_to_quads(N, jnp.take(rho, conn, axis=0))
    return jnp.transpose(ramp(rho_q, p))


@jax.jit
def _dv_sens(Xe, dN, N, wq, conn, conn_dof, rho, p, mu, lam, phi, psi):
    nelems, nn = conn.shape
    nd = Xe.shape[-1]
    rho_e = jnp.take(rho, conn, axis=0)
    rho_q = geometry.interp_to_quads(N, rho_e)
    phi_e = jnp.take(phi, conn_dof, axis=0).reshape(nelems, nn, nd)
    psi_e = jnp.take(psi, conn_dof, axis=0).reshape(nelems, nn, nd)
    inner = stiffness.elasticity_dv_inner(
        Xe, dN, N, wq, ramp_deriv(rho_q, p), phi_e, psi_e, mu, lam
    )
    return assembly.assemble_vector(inner, conn, rho.shape[0])


class LinearElasticity(FEModel):
    """Isotropic linear elasticity (plane stress if the mesh is 2D).

    Args:
        nodal_force: dict {node: [fx, fy(, fz)]} applied as the rhs
            (pyfem.py:1760-1768).
        E, nu: Young's modulus / Poisson ratio.
        p: RAMP penalization parameter.
    """

    def __init__(
        self,
        etype,
        X,
        conn,
        dof_fixed=(),
        dof_fixed_vals=None,
        nodal_force=None,
        E=10.0,
        nu=0.3,
        p=0.0,
        dtype=jnp.float64,
        kernel="einsum",
    ):
        """kernel: "einsum" (reference path, any element/dtype) or
        "pallas" (TPU fast path; quad4/hex8/tet10/brick20 + float32 —
        the in-repo analogue of the reference's A2DWrapper native
        kernels, pyfem.py:2180, extended past A2D's hex8-only support,
        pyfem.py:2260-2264)."""
        ndims = np.asarray(X).shape[1]
        super().__init__(
            etype, X, conn, dof_fixed, dof_fixed_vals,
            ndof_per_node=ndims, dtype=dtype,
        )
        self.E = float(E)
        self.nu = float(nu)
        self.p = float(p)
        self.mu, self.lam = stiffness.lame_params(self.E, self.nu, self.ndims)
        self.nodal_force = dict(nodal_force or {})
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

            # measured round 3: f32 quadratic elements lose ~2 digits
            # on distorted meshes to near-degenerate-element
            # cancellation — equally in the einsum-f32 path, so the
            # kernel is not at fault, but accuracy-critical work should
            # use the f64 einsum path
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
        rho = self._as_nodal(rho)
        if self.kernel == "pallas" and not jnp.iscomplexobj(rho):
            interp = jax.default_backend() == "cpu"
            cqT = _cq_transposed(self.N, self.conn, rho, self.p)
            if self.etype.ndims == 3:
                from ..ops import pallas_stiffness3d as pk3

                KeT = pk3.elasticity_stiffness_3d(
                    self._XeT, cqT, self.mu, self.lam,
                    etype=self.etype.name, interpret=interp
                )
            else:
                from ..ops import pallas_stiffness as pk

                KeT = pk.elasticity_stiffness_quad4(
                    self._XeT, cqT, self.mu, self.lam, interpret=interp
                )
            nn = self.nnodes_per_elem * self.ndof_per_node
            return jnp.transpose(KeT).reshape(self.nelems, nn, nn)
        return _element_jacobian(
            self.Xe, self.dN, self.N, self.wq, self.conn, rho, self.p,
            self.mu, self.lam,
        )

    def compute_jacobian(self, rho=1.0):
        return self.assemble_scipy(self.element_jacobian(rho))

    def compute_rhs(self):
        """Nodal point forces scattered into the dof vector."""
        if self._rhs is None:
            rhs = np.zeros(self.ndof)
            for node, force in self.nodal_force.items():
                for a, f in enumerate(force):
                    rhs[self.ndof_per_node * int(node) + a] = f
            self._rhs = jnp.asarray(rhs, dtype=self.dtype)
        return self._rhs

    # -- solves --------------------------------------------------------------

    def solve(self, method="cg", rho=1.0, rtol=1e-8, maxiter=None):
        """Static solve (direct | cg | gmres | gmg)."""
        Ke = None if method in ("gmg", "sharded_gmg", "pmg") else self.element_jacobian(rho)
        u, _ = self._solve_system(Ke, self.compute_rhs(), method, rtol,
                                  rho=rho, maxiter=maxiter)
        return u

    # -- optimization functionals -------------------------------------------

    def compliance(self, rho, solver="cg"):
        """Compliance c = <rhs_bc, u> and state u (pyfem.py:1797-1834)."""
        rho = self._as_nodal(rho)
        Ke = None if solver in ("gmg", "sharded_gmg", "pmg") else self.element_jacobian(rho)
        u, b = self._solve_system(Ke, self.compute_rhs(), solver, rho=rho)
        return b.dot(u), u

    def compliance_grad(self, rho, u):
        """Self-adjoint compliance gradient (pyfem.py:1836-1848)."""
        rho = self._as_nodal(rho)
        return -self.k_dv_sens(rho, u, u)

    def k_dv_sens(self, rho, phi, psi):
        """d(phi^T K psi)/d rho, nodal (pyfem.py:1872-1920)."""
        rho = self._as_nodal(rho)
        if self._use_structured_sens(rho, phi, psi):
            return self._k_dv_sens_structured(rho, phi, psi)
        return _dv_sens(
            self.Xe, self.dN, self.N, self.wq, self.conn, self.conn_dof,
            rho, self.p, self.mu, self.lam,
            jnp.asarray(phi), jnp.asarray(psi),
        )

    def volume(self, rho):
        return jnp.sum(rho) / self.nnodes

    def volume_grad(self, rho):
        return jnp.ones(self.nnodes, dtype=self.dtype) / self.nnodes
