"""Quadratic element (tet10 / brick20) sensitivity verification.

Mirrors reference tests/test_elements.py: complex-step check of the
d(phi^T K psi)/d rho sensitivity on 9^3-node meshes at delta 1e-12.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import pyfem_gpu_testflight_tpu as fem

pytestmark = pytest.mark.quick


@pytest.mark.parametrize("element_type", ["tet", "brick20"])
def test_dKdx_complex_step(element_type):
    creator = fem.ProblemCreator(
        nnodes_x=9, nnodes_y=9, nnodes_z=9, element_type=element_type
    )
    conn, X, dof_fixed, nodal_force = creator.create_linear_elasticity_problem()
    model = fem.LinearElasticity(
        element_type, X, conn, dof_fixed, None, nodal_force, p=5.0
    )

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


@pytest.mark.parametrize("element_type", ["tet", "brick20"])
def test_solves_3d_poisson(element_type):
    """Quadratic elements solve a smooth Poisson problem consistently:
    direct and CG agree."""
    creator = fem.ProblemCreator(
        nnodes_x=5, nnodes_y=5, nnodes_z=5, element_type=element_type
    )
    conn, X, dof_fixed = creator.create_poisson_problem()
    model = fem.LinearPoisson(
        element_type, X, conn, dof_fixed, gfunc=lambda x: jnp.ones(x.shape[:-1])
    )
    u_d = np.asarray(model.solve(method="direct"))
    u_c = np.asarray(model.solve(method="cg", rtol=1e-12))
    np.testing.assert_allclose(u_c, u_d, rtol=1e-7, atol=1e-10)
    assert np.all(np.isfinite(u_d))
    assert np.abs(u_d).max() > 0
