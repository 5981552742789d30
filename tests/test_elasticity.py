"""Linear elasticity verification (mirrors reference tests/test_elasticity.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

import pyfem_gpu_testflight_tpu as fem
from oracles.plane_stress_oracle import solve_plane_stress

pytestmark = pytest.mark.quick


def test_plane_stress_vs_oracle():
    creator = fem.ProblemCreator(nnodes_x=32, nnodes_y=32)
    conn, X, dof_fixed, nodal_force = creator.create_linear_elasticity_problem()
    model = fem.LinearElasticity(
        "quad4", X, conn, dof_fixed, None, nodal_force
    )
    u = np.asarray(model.solve(method="direct"))

    u_ref = solve_plane_stress(conn, X, dof_fixed, nodal_force)

    rng = np.random.RandomState(123)
    p = rng.rand(u.shape[0])
    pTu = p.dot(u)
    pTu_ref = p.dot(u_ref)
    assert abs((pTu - pTu_ref) / pTu) < 1e-10


def _elasticity_model(element_type, n2d=64, n3d=8):
    if element_type in ("quad", "tri"):
        creator = fem.ProblemCreator(nnodes_x=n2d, nnodes_y=n2d, element_type=element_type)
    else:
        creator = fem.ProblemCreator(
            nnodes_x=n3d, nnodes_y=n3d, nnodes_z=n3d, element_type=element_type
        )
    conn, X, dof_fixed, nodal_force = creator.create_linear_elasticity_problem()
    return fem.LinearElasticity(
        element_type, X, conn, dof_fixed, None, nodal_force, p=5.0
    )


@pytest.mark.parametrize("element_type", ["quad", "tri", "block"])
def test_dKdx_complex_step(element_type):
    model = _elasticity_model(element_type)
    rng = np.random.RandomState(0)
    phi = rng.rand(model.ndof)
    psi = rng.rand(model.ndof)
    rho = rng.rand(model.nnodes)
    p = rng.rand(model.nnodes)
    h = 1e-30

    dfdrho = p.dot(np.asarray(model.k_dv_sens(rho, phi, psi)))

    K = model.compute_jacobian(jnp.asarray(rho) + 1j * h * jnp.asarray(p))
    dfdrho_cs = phi.dot(K.dot(psi)).imag / h
    assert abs((dfdrho - dfdrho_cs) / dfdrho) < 1e-12


@pytest.mark.parametrize("element_type", ["quad", "tri", "block"])
def test_compliance_gradient_complex_step(element_type):
    model = _elasticity_model(element_type)
    rng = np.random.RandomState(0)
    rho = rng.rand(model.nnodes)
    p = rng.rand(model.nnodes)
    h = 1e-30

    c, u = model.compliance(jnp.asarray(rho), solver="cg")
    grad = p.dot(np.asarray(model.compliance_grad(rho, u)))

    c_cs, _ = model.compliance(
        jnp.asarray(rho) + 1j * h * jnp.asarray(p), solver="direct"
    )
    grad_cs = np.imag(c_cs) / h
    assert abs((grad - grad_cs) / grad) < 1e-10


def test_lame_form_matches_bmatrix_form():
    """The Lame-form stiffness equals an explicit B^T C B assembly."""
    creator = fem.ProblemCreator(nnodes_x=5, nnodes_y=4)
    conn, X, dof_fixed, nodal_force = creator.create_linear_elasticity_problem()
    model = fem.LinearElasticity("quad4", X, conn, dof_fixed, None, nodal_force)
    Ke = np.asarray(model.element_jacobian())

    # explicit Voigt B-matrix element stiffness (oracle style)
    from oracles.quad4_common import GAUSS_2D, quad4_shape, jacobian_2d

    E, nu = model.E, model.nu
    C = (E / (1 - nu**2)) * np.array(
        [[1.0, nu, 0.0], [nu, 1.0, 0.0], [0.0, 0.0, 0.5 * (1 - nu)]]
    )
    for e in range(conn.shape[0]):
        Xe = X[conn[e]]
        ke = np.zeros((8, 8))
        for xi, eta in GAUSS_2D:
            _, dN = quad4_shape(xi, eta)
            _, detJ, invJ = jacobian_2d(Xe, dN)
            G = dN @ invJ
            B = np.zeros((3, 8))
            for a in range(4):
                B[0, 2 * a] = G[a, 0]
                B[1, 2 * a + 1] = G[a, 1]
                B[2, 2 * a] = G[a, 1]
                B[2, 2 * a + 1] = G[a, 0]
            ke += detJ * (B.T @ C @ B)
        np.testing.assert_allclose(Ke[e], ke, rtol=1e-12, atol=1e-12)
