"""Strain recovery, mass/frequencies, KS aggregation."""

import numpy as np
import jax.numpy as jnp

import pyfem_gpu_testflight_tpu as fem
from pyfem_gpu_testflight_tpu import postprocess as post
import pytest

pytestmark = pytest.mark.quick


def _cantilever(nx=20, ny=10):
    creator = fem.ProblemCreator(nnodes_x=nx, nnodes_y=ny)
    conn, X, dof_fixed, nodal_force = creator.create_linear_elasticity_problem()
    model = fem.LinearElasticity("quad4", X, conn, dof_fixed, None, nodal_force)
    return model


def test_strains_exact_for_linear_field():
    """An affine displacement field has constant, exact strains."""
    model = _cantilever(8, 6)
    X = np.asarray(model.X_host)
    A = np.array([[2e-3, 1e-3], [-5e-4, 3e-3]])  # du_a/dx_l
    u = (X @ A.T).reshape(-1)
    eq = np.asarray(post.quadrature_strains(model, u))
    expected = np.array([A[0, 0], A[1, 1], A[0, 1] + A[1, 0]])
    np.testing.assert_allclose(eq, np.broadcast_to(expected, eq.shape), atol=1e-12)
    en = np.asarray(post.nodal_strains(model, u))
    np.testing.assert_allclose(en, np.broadcast_to(expected, en.shape), atol=1e-12)


def test_stress_strain_consistency():
    """phi^T K u equals the energy integral of stress:strain."""
    model = _cantilever(10, 6)
    rng = np.random.RandomState(0)
    u = rng.standard_normal(model.ndof)
    e = np.asarray(post.quadrature_strains(model, u))
    s = np.asarray(post.quadrature_stresses(model, u))
    from pyfem_gpu_testflight_tpu.ops import geometry

    detJ, _ = geometry.shape_gradients(model.Xe, model.dN)[0], None
    detJ = np.asarray(geometry.det_and_inv(geometry.jacobian(model.Xe, model.dN))[0])
    wq = np.asarray(model.wq)
    # engineering shear: energy = e_n s_n + gamma tau (single count)
    energy = np.einsum("eq,eqk,eqk->", detJ * wq[None, :], e, s)
    K = model.assemble_scipy(model.element_jacobian())
    np.testing.assert_allclose(energy, u @ (K @ u), rtol=1e-10)


def test_mass_matrix_total_mass():
    model = _cantilever(9, 5)
    Me = post.mass_matrix(model, density=2.5)
    M = model.assemble_scipy(Me)
    X = model.X_host
    area = (X[:, 0].max() - X[:, 0].min()) * (X[:, 1].max() - X[:, 1].min())
    ones = np.ones(model.ndof)
    # sum over x-component block = density * area
    ex = np.zeros(model.ndof)
    ex[0::2] = 1.0
    np.testing.assert_allclose(ex @ (M @ ex), 2.5 * area, rtol=1e-10)


def test_natural_frequencies_positive_and_converging():
    model = _cantilever(24, 6)
    w, modes = post.natural_frequencies(model, k=4, density=1.0)
    assert np.all(w > 0)
    assert np.all(np.diff(w) >= -1e-9)  # sorted ascending
    # modes satisfy BCs
    assert np.abs(modes[model.bc.fixed]).max() < 1e-12
    # Rayleigh quotient consistency for the first mode
    K = model.assemble_scipy(model.element_jacobian())
    M = model.assemble_scipy(post.mass_matrix(model))
    v = modes[:, 0]
    rq = (v @ (K @ v)) / (v @ (M @ v))
    np.testing.assert_allclose(np.sqrt(rq), w[0], rtol=1e-5)


def test_ks_aggregate_bounds_max():
    creator = fem.ProblemCreator(nnodes_x=16, nnodes_y=16)
    conn, X, dof_fixed = creator.create_poisson_problem()
    model = fem.LinearPoisson(
        "quad4", X, conn, dof_fixed, gfunc=lambda x: 1.0 + 0 * x[..., 0]
    )
    u = np.asarray(model.solve(method="direct"))
    for pval in (10.0, 50.0):
        ks = float(post.ks_aggregate(model, u, pval))
        assert ks >= u.max() - 1e-12 or abs(ks - u.max()) < 1.0 / pval + 1.0
    # higher p -> closer to max + domain-size correction decays
    ks10 = float(post.ks_aggregate(model, u, 10.0))
    ks100 = float(post.ks_aggregate(model, u, 100.0))
    assert abs(ks100 - u.max()) < abs(ks10 - u.max()) + 1e-12


def test_ks_adjoint_rhs_matches_fd():
    creator = fem.ProblemCreator(nnodes_x=8, nnodes_y=8)
    conn, X, dof_fixed = creator.create_poisson_problem()
    model = fem.LinearPoisson(
        "quad4", X, conn, dof_fixed, gfunc=lambda x: 1.0 + 0 * x[..., 0]
    )
    rng = np.random.RandomState(1)
    u = rng.rand(model.nnodes)
    pval = 5.0
    g = np.asarray(post.ks_adjoint_rhs(model, u, pval))
    h = 1e-7
    for j in [3, 17, 40]:
        du = np.zeros_like(u)
        du[j] = h
        # avoid crossing the max() kink: only perturb non-max entries
        if u[j] == u.max():
            continue
        fd = (
            float(post.ks_aggregate(model, u + du, pval))
            - float(post.ks_aggregate(model, u - du, pval))
        ) / (2 * h)
        np.testing.assert_allclose(g[j], fd, rtol=1e-5, atol=1e-9)


def test_solve_adjoint_consistency():
    """K psi = rhs: adjoint solve matches direct."""
    model = _cantilever(10, 6)
    rng = np.random.RandomState(2)
    rhs = model.bc.zero_fixed(jnp.asarray(rng.standard_normal(model.ndof)))
    psi = np.asarray(post.solve_adjoint(model, rhs, method="direct"))
    psi_cg = np.asarray(post.solve_adjoint(model, rhs, method="cg", rtol=1e-12))
    np.testing.assert_allclose(psi_cg, psi, rtol=1e-7, atol=1e-9)


def test_ks_total_design_gradient_complex_step():
    """Full KS(u(rho)) design gradient: adjoint chain vs complex step.

    Exercises the complete ref_linear_poisson.py KS workflow: aggregate,
    adjoint rhs, adjoint solve, dKdrho chain rule.
    """
    from scipy.sparse.linalg import spsolve

    creator = fem.ProblemCreator(nnodes_x=10, nnodes_y=10)
    conn, X, dof_fixed = creator.create_poisson_problem()
    model = fem.LinearPoisson(
        "quad4", X, conn, dof_fixed, gfunc=lambda x: 1 + 0 * x[..., 0], p=2.0
    )
    rng = np.random.RandomState(0)
    rho = rng.rand(model.nnodes)
    pvec = rng.rand(model.nnodes)
    pval = 10.0

    _, u = model.compliance(jnp.asarray(rho), solver="direct")
    dKs_du = post.ks_adjoint_rhs(model, u, pval)
    psi = post.solve_adjoint(
        model, model.bc.zero_fixed(dKs_du), rho=jnp.asarray(rho),
        method="direct",
    )
    grad = -np.asarray(model.k_dv_sens(rho, psi, u))

    h = 1e-30
    K = model.compute_jacobian(jnp.asarray(rho) + 1j * h * jnp.asarray(pvec))
    rhs = np.asarray(model.compute_rhs())
    Kbc, rhsbc = model.bc.apply_scipy(K, rhs)
    ucs = spsolve(Kbc, rhsbc)
    fd = complex(post.ks_aggregate(model, jnp.asarray(ucs), pval)).imag / h
    assert abs(pvec.dot(grad) - fd) / abs(fd) < 1e-12


def test_natural_frequencies_device_lobpcg():
    """Matrix-free device LOBPCG vs host eigsh on the same lumped mass."""
    from scipy.sparse import linalg as sla, diags
    from pyfem_gpu_testflight_tpu import postprocess as pp

    creator = fem.ProblemCreator(nnodes_x=24, nnodes_y=12)
    conn, X, dof_fixed, force = creator.create_linear_elasticity_problem()
    m = fem.LinearElasticity("quad4", X, conn, dof_fixed, None, force)

    K = m.assemble_scipy(m.element_jacobian())
    ml = np.asarray(pp.lumped_mass(m))
    free = np.setdiff1d(np.arange(m.ndof), np.asarray(m.bc.fixed))
    ref, _ = sla.eigsh(K[free][:, free].tocsc(),
                       M=diags(ml[free]).tocsc(), k=4, sigma=0.0,
                       which="LM")
    ref = np.sqrt(np.maximum(np.sort(ref), 0))

    w, modes = pp.natural_frequencies_device(m, k=4)
    np.testing.assert_allclose(np.asarray(w), ref, rtol=1e-6)
    # modes vanish at fixed dofs
    assert np.abs(np.asarray(modes)[np.asarray(m.bc.fixed)]).max() < 1e-12
