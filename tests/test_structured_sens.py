"""Scatter-free uniform-grid sensitivity == the generic einsum path.

The fused topology-optimization iteration spends its time in
d(phi^T K psi)/drho when computed by the generic
gather -> element einsum -> segment_sum route (measured 86.8 ms of a
157 ms iteration at 1M dof).  On the creator's uniform grids the model
dispatches to multigrid._dv_sens_uniform (shifted-slice planes + one
MXU contraction + padded plane adds); these tests gate it against the
reference-parity einsum path (pyfem.py:1872-1920 / 1240-1276 role) at
f64 machine precision, and pin the complex-step probes to the einsum
oracle path.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import pyfem_gpu_testflight_tpu as fem

pytestmark = pytest.mark.quick


def _rand(rng, *shape):
    return rng.rand(*shape)


def test_elasticity_2d_matches_einsum():
    rng = np.random.RandomState(11)
    nx, ny = 17, 9
    creator = fem.ProblemCreator(nnodes_x=nx, nnodes_y=ny,
                                 element_type="quad")
    conn, X, fixed, force = creator.create_linear_elasticity_problem()
    m = fem.LinearElasticity("quad4", X, conn, fixed, None, force, p=3.0,
                             dtype=jnp.float64)
    rho = _rand(rng, m.nnodes)
    phi, psi = _rand(rng, m.ndof), _rand(rng, m.ndof)
    ref = np.asarray(m.k_dv_sens(rho, phi, psi))
    m.attach_structured_grid(nx, ny)
    fast = np.asarray(m.k_dv_sens(rho, phi, psi))
    assert np.abs(fast - ref).max() <= 1e-13 * np.abs(ref).max()


def test_poisson_2d_matches_einsum():
    rng = np.random.RandomState(12)
    nx, ny = 17, 9
    conn, X, fixed = fem.ProblemCreator(nx, ny).create_poisson_problem()
    m = fem.LinearPoisson("quad4", X, conn, fixed, p=5.0,
                          dtype=jnp.float64)
    rho = _rand(rng, m.nnodes)
    phi, psi = _rand(rng, m.ndof), _rand(rng, m.ndof)
    ref = np.asarray(m.k_dv_sens(rho, phi, psi))
    m.attach_structured_grid(nx, ny)
    fast = np.asarray(m.k_dv_sens(rho, phi, psi))
    assert np.abs(fast - ref).max() <= 1e-13 * np.abs(ref).max()


def test_elasticity_3d_matches_einsum():
    rng = np.random.RandomState(13)
    n = 5
    creator = fem.ProblemCreator(nnodes_x=n, nnodes_y=n, nnodes_z=n,
                                 element_type="block")
    conn, X, fixed, force = creator.create_linear_elasticity_problem()
    m = fem.LinearElasticity("hex8", X, conn, fixed, None, force, p=2.0,
                             dtype=jnp.float64)
    rho = _rand(rng, m.nnodes)
    phi, psi = _rand(rng, m.ndof), _rand(rng, m.ndof)
    ref = np.asarray(m.k_dv_sens(rho, phi, psi))
    m.attach_structured_grid(n, n, n)
    fast = np.asarray(m.k_dv_sens(rho, phi, psi))
    assert np.abs(fast - ref).max() <= 1e-13 * np.abs(ref).max()


def test_complex_step_routes_to_einsum_path():
    """Complex probes must keep the reference einsum path (the
    complex-step oracle) — the structured route is real-only."""
    rng = np.random.RandomState(14)
    nx, ny = 9, 9
    creator = fem.ProblemCreator(nnodes_x=nx, nnodes_y=ny,
                                 element_type="quad")
    conn, X, fixed, force = creator.create_linear_elasticity_problem()
    m = fem.LinearElasticity("quad4", X, conn, fixed, None, force, p=3.0,
                             dtype=jnp.float64)
    m.attach_structured_grid(nx, ny)
    phi, psi = _rand(rng, m.ndof), _rand(rng, m.ndof)
    rho = _rand(rng, m.nnodes)
    h, pvec = 1e-30, _rand(rng, m.nnodes)
    # complex-step of phi^T K psi == p . k_dv_sens
    Ke = m.element_jacobian(rho + 1j * h * pvec)
    K = m.assemble_scipy(Ke)
    cs = float(np.imag(phi @ (K @ psi)) / h)
    grad = np.asarray(m.k_dv_sens(rho, phi, psi))
    assert abs(pvec @ grad - cs) <= 1e-10 * abs(cs)


def test_compliance_grad_uses_fast_path_after_attach():
    """compliance_grad through the structured route stays gated by the
    complex-step identity (end-to-end adjoint consistency)."""
    nx, ny = 17, 9
    creator = fem.ProblemCreator(nnodes_x=nx, nnodes_y=ny,
                                 element_type="quad")
    conn, X, fixed, force = creator.create_linear_elasticity_problem()
    m = fem.LinearElasticity("quad4", X, conn, fixed, None, force, p=3.0,
                             dtype=jnp.float64)
    rng = np.random.RandomState(15)
    rho = 0.3 + 0.5 * rng.rand(m.nnodes)
    ref = np.asarray(m.compliance_grad(rho, m.compliance(rho)[1]))
    m.attach_structured_grid(nx, ny)
    c, u = m.compliance(rho, solver="gmg")
    fast = np.asarray(m.compliance_grad(rho, u))
    assert np.abs(fast - ref).max() <= 1e-6 * np.abs(ref).max()
