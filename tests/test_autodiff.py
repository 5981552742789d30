"""Hand-derived sensitivities cross-checked against jax.grad.

The adjoint einsums (k_dv_sens) mirror the reference's hand derivations
(pyfem.py:1219-1276, 1872-1920); complex-step tests verify them against
the assembled operator.  This suite adds the third, independent check:
reverse-mode AD through the element-assembly pipeline.
"""

import numpy as np
import jax
import jax.numpy as jnp

import pyfem_gpu_testflight_tpu as fem
from pyfem_gpu_testflight_tpu.models.base import ramp
from pyfem_gpu_testflight_tpu.ops import geometry, stiffness
import pytest

pytestmark = pytest.mark.quick


def test_poisson_dv_sens_matches_jax_grad():
    creator = fem.ProblemCreator(nnodes_x=14, nnodes_y=11)
    conn, X, dof_fixed = creator.create_poisson_problem()
    model = fem.LinearPoisson("quad4", X, conn, dof_fixed, p=4.0)
    rng = np.random.RandomState(0)
    phi = jnp.asarray(rng.rand(model.ndof))
    psi = jnp.asarray(rng.rand(model.ndof))
    rho = jnp.asarray(rng.rand(model.nnodes))

    def f(rho):
        rho_q = geometry.interp_to_quads(
            model.N, jnp.take(rho, model.conn, axis=0)
        )
        Ke = stiffness.poisson_stiffness(
            model.Xe, model.dN, model.wq, ramp(rho_q, model.p)
        )
        phi_e = jnp.take(phi, model.conn_dof, axis=0)
        psi_e = jnp.take(psi, model.conn_dof, axis=0)
        return jnp.einsum("ei,eij,ej->", phi_e, Ke, psi_e)

    g_ad = np.asarray(jax.grad(f)(rho))
    g_hand = np.asarray(model.k_dv_sens(rho, phi, psi))
    np.testing.assert_allclose(g_hand, g_ad, rtol=1e-11, atol=1e-13)


def test_elasticity_dv_sens_matches_jax_grad():
    creator = fem.ProblemCreator(nnodes_x=10, nnodes_y=8)
    conn, X, dof_fixed, nodal_force = creator.create_linear_elasticity_problem()
    model = fem.LinearElasticity(
        "quad4", X, conn, dof_fixed, None, nodal_force, p=4.0
    )
    rng = np.random.RandomState(1)
    phi = jnp.asarray(rng.rand(model.ndof))
    psi = jnp.asarray(rng.rand(model.ndof))
    rho = jnp.asarray(rng.rand(model.nnodes))

    def f(rho):
        rho_q = geometry.interp_to_quads(
            model.N, jnp.take(rho, model.conn, axis=0)
        )
        Ke = stiffness.elasticity_stiffness(
            model.Xe, model.dN, model.wq, ramp(rho_q, model.p),
            model.mu, model.lam,
        )
        phi_e = jnp.take(phi, model.conn_dof, axis=0)
        psi_e = jnp.take(psi, model.conn_dof, axis=0)
        return jnp.einsum("ei,eij,ej->", phi_e, Ke, psi_e)

    g_ad = np.asarray(jax.grad(f)(rho))
    g_hand = np.asarray(model.k_dv_sens(rho, phi, psi))
    np.testing.assert_allclose(g_hand, g_ad, rtol=1e-11, atol=1e-13)


def test_end_to_end_compliance_grad_via_ad():
    """jax.grad through assemble + dense solve equals the adjoint grad."""
    creator = fem.ProblemCreator(nnodes_x=8, nnodes_y=6)
    conn, X, dof_fixed, nodal_force = creator.create_linear_elasticity_problem()
    model = fem.LinearElasticity(
        "quad4", X, conn, dof_fixed, None, nodal_force, p=3.0
    )
    rng = np.random.RandomState(2)
    rho = jnp.asarray(0.3 + 0.6 * rng.rand(model.nnodes))
    rhs = jnp.asarray(model.compute_rhs())
    mask = model.bc.mask

    def compliance(rho):
        Ke = model.element_jacobian(rho)
        # dense BC'd operator (tiny mesh): rows/cols masked, unit diag
        n = model.ndof
        K = jnp.zeros((n, n))
        K = K.at[model.conn_dof[:, :, None], model.conn_dof[:, None, :]].add(
            Ke
        )
        free = ~mask
        K = jnp.where(free[:, None] & free[None, :], K, 0.0)
        K = K + jnp.diag(jnp.where(mask, 1.0, 0.0))
        b = jnp.where(mask, 0.0, rhs)
        u = jnp.linalg.solve(K, b)
        return b @ u

    g_ad = np.asarray(jax.grad(compliance)(rho))
    c, u = model.compliance(rho, solver="direct")
    g_adj = np.asarray(model.compliance_grad(rho, u))
    np.testing.assert_allclose(g_adj, g_ad, rtol=1e-9, atol=1e-11)
