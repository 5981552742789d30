"""The compat layer reproduces the reference's pyfem API surface."""

import numpy as np

import pyfem_gpu_testflight_tpu.compat as pyfem
from oracles.poisson_oracle import solve_poisson
import pytest

pytestmark = pytest.mark.quick


def gfunc(x):
    _x, _y = x[..., 0], x[..., 1]
    return _x * (_x - 5.0) * (_x - 10.0) * _y * (_y - 4.0)


def test_reference_style_poisson_script():
    """A verbatim reference-style driver runs against the compat layer."""
    creator = pyfem.ProblemCreator(nnodes_x=32, nnodes_y=32)
    conn, X, dof_fixed = creator.create_poisson_problem()
    quadrature = pyfem.QuadratureBilinear2D()
    basis = pyfem.BasisBilinear2D(quadrature)
    model = pyfem.LinearPoisson(X, conn, dof_fixed, None, quadrature, basis,
                                gfunc)
    assembler = pyfem.Assembler(model)
    u = np.asarray(assembler.solve(method="direct"))

    u_ref = solve_poisson(conn, X, dof_fixed, gfunc)
    rng = np.random.RandomState(123)
    p = rng.rand(u.shape[0])
    assert abs((p @ u - p @ u_ref) / (p @ u)) < 1e-10


def test_reference_style_elasticity_and_dv_sens():
    creator = pyfem.ProblemCreator(nnodes_x=16, nnodes_y=16,
                                   element_type="quad")
    conn, X, dof_fixed, nodal_force = creator.create_linear_elasticity_problem()
    quadrature = pyfem.QuadratureBilinear2D()
    basis = pyfem.BasisBilinear2D(quadrature)
    model = pyfem.LinearElasticity(X, conn, dof_fixed, None, nodal_force,
                                   quadrature, basis, p=5.0)
    rng = np.random.RandomState(0)
    phi = rng.rand(model.ndof)
    psi = rng.rand(model.ndof)
    rho = rng.rand(model.nnodes)
    pvec = rng.rand(model.nnodes)
    h = 1e-30
    dfdrho = pvec @ model._compute_K_dv_sens(rho, phi, psi)
    import jax.numpy as jnp

    K = model.compute_jacobian(jnp.asarray(rho) + 1j * h * jnp.asarray(pvec))
    dfdrho_cs = phi.dot(K.dot(psi)).imag / h
    assert abs((dfdrho - dfdrho_cs) / dfdrho) < 1e-12


def test_reference_style_helmholtz_and_quadrature_api():
    creator = pyfem.ProblemCreator(nnodes_x=16, nnodes_y=16,
                                   element_type="quad")
    conn, X, x = creator.create_helmhotz_problem()  # reference spelling
    quadrature = pyfem.QuadratureBilinear2D()
    basis = pyfem.BasisBilinear2D(quadrature)
    model = pyfem.Helmholtz(0.1, X, conn, quadrature, basis)
    rho = np.asarray(model.apply(x))
    assert rho.shape == x.shape
    # quadrature/basis object APIs
    assert quadrature.get_nquads() == 4
    assert quadrature.get_pt().shape == (4, 2)
    assert quadrature.get_weight().shape == (4,)
    assert basis.eval_shape_fun().shape == (4, 4)
    assert basis.eval_shape_fun_deriv().shape == (4, 4, 2)


def test_reference_style_nonlinear():
    creator = pyfem.ProblemCreator(nnodes_x=12, nnodes_y=12)
    conn, X, dof_fixed = creator.create_poisson_problem()
    quadrature = pyfem.QuadratureBilinear2D()
    basis = pyfem.BasisBilinear2D(quadrature)
    model = pyfem.NonlinearPoisson2D(X, conn, dof_fixed, None, quadrature,
                                     basis)
    assembler = pyfem.Assembler(model)
    x = np.ones(10) / 10
    u = np.asarray(assembler.solve_nonlinear(method="gmres", xdv=x))
    assert np.isfinite(u).all() and np.abs(u).max() > 0


def test_utils_surface():
    """Reference utils.py-style out-arg helpers work on numpy arrays."""
    import pyfem_gpu_testflight_tpu as fem

    creator = pyfem.ProblemCreator(nnodes_x=5, nnodes_y=4)
    conn, X, _ = creator.create_poisson_problem()
    et = fem.get_element("quad4")
    nelems, nn = conn.shape
    nq, nd = et.nquads, 2

    Xe = np.zeros((nelems, nn, nd))
    pyfem.scatter_node_to_elem(conn, X, Xe)
    np.testing.assert_array_equal(Xe, X[conn])

    Jq = np.zeros((nelems, nq, nd, nd))
    pyfem.compute_jtrans(Xe, et.shape_grads, Jq)
    detJq = np.zeros((nelems, nq))
    pyfem.compute_jdet(Jq, detJq)
    assert (detJq > 0).all()

    invJq = np.zeros_like(Jq)
    Ngrad = np.zeros((nelems, nq, nn, nd))
    pyfem.compute_basis_grad(Jq, detJq, et.shape_grads, invJq, Ngrad)
    # invJq really inverts Jq
    eye = np.einsum("eqij,eqjk->eqik", Jq, invJq)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(2), eye.shape),
                               atol=1e-12)
    # gradients of a linear field are exact
    u = X @ np.array([2.0, -3.0])
    ue = u[conn]
    gu = np.einsum("eqnl,en->eql", Ngrad, ue)
    np.testing.assert_allclose(gu, np.broadcast_to([2.0, -3.0], gu.shape),
                               atol=1e-12)

    data_q = np.zeros((nelems, nq))
    pyfem.compute_elem_interp(et.shape_vals, ue, data_q)
    assert data_q.shape == (nelems, nq)

    dof, den, cdof = pyfem.create_dof(X.shape[0], nelems, nn, 2, conn)
    assert cdof.shape == (nelems, 2 * nn)
    np.testing.assert_array_equal(cdof[:, 0::2], 2 * conn)
