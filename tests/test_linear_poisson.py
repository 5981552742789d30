"""Linear Poisson verification.

Mirrors the reference test strategy (tests/test_linear_poisson.py of the
reference): (a) random-projection solution cross-check against an
independent loop-based oracle at 1e-10, (b) complex-step verification of
the dK/drho sensitivity at 1e-12 and the adjoint compliance gradient at
1e-10 on quad/tri/hex meshes.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import pyfem_gpu_testflight_tpu as fem
from oracles.poisson_oracle import solve_poisson

pytestmark = pytest.mark.quick


def gfunc(x):
    _x = x[..., 0]
    _y = x[..., 1]
    return _x * (_x - 5.0) * (_x - 10.0) * _y * (_y - 4.0)


def test_linear_poisson_vs_oracle():
    creator = fem.ProblemCreator(nnodes_x=32, nnodes_y=32)
    conn, X, dof_fixed = creator.create_poisson_problem()
    model = fem.LinearPoisson("quad4", X, conn, dof_fixed, gfunc=gfunc)
    u = np.asarray(model.solve(method="direct"))

    u_ref = solve_poisson(conn, X, dof_fixed, gfunc)

    rng = np.random.RandomState(123)
    p = rng.rand(u.shape[0])
    pTu = p.dot(u)
    pTu_ref = p.dot(u_ref)
    assert abs((pTu - pTu_ref) / pTu) < 1e-10


def _poisson_model(element_type):
    if element_type in ("quad", "tri"):
        creator = fem.ProblemCreator(nnodes_x=64, nnodes_y=64, element_type=element_type)
    else:
        creator = fem.ProblemCreator(
            nnodes_x=8, nnodes_y=8, nnodes_z=8, element_type=element_type
        )
    conn, X, dof_fixed = creator.create_poisson_problem()
    return fem.LinearPoisson(element_type, X, conn, dof_fixed, gfunc=gfunc, p=5.0)


@pytest.mark.parametrize("element_type", ["quad", "tri", "block"])
def test_dKdx_complex_step(element_type):
    model = _poisson_model(element_type)
    rng = np.random.RandomState(0)
    nnodes = model.nnodes
    phi = rng.rand(model.ndof)
    psi = rng.rand(model.ndof)
    rho = rng.rand(nnodes)
    p = rng.rand(nnodes)
    h = 1e-30

    dfdrho = p.dot(np.asarray(model.k_dv_sens(rho, phi, psi)))

    K = model.compute_jacobian(jnp.asarray(rho) + 1j * h * jnp.asarray(p))
    dfdrho_cs = phi.dot(K.dot(psi)).imag / h
    assert abs((dfdrho - dfdrho_cs) / dfdrho) < 1e-12


@pytest.mark.parametrize("element_type", ["quad", "tri", "block"])
def test_compliance_gradient_complex_step(element_type):
    model = _poisson_model(element_type)
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
