"""Nonlinear Poisson verification (mirrors reference tests/test_nonlinear_poisson.py)."""

import numpy as np
import pytest

import pyfem_gpu_testflight_tpu as fem
from oracles.nonlinear_poisson_oracle import NonlinearPoissonOracle

pytestmark = pytest.mark.quick


@pytest.mark.parametrize("method", ["direct", "gmres"])
def test_nonlinear_poisson_vs_oracle(method):
    creator = fem.ProblemCreator(nnodes_x=32, nnodes_y=32)
    conn, X, dof_fixed = creator.create_poisson_problem()

    n_dv = 10
    x = np.ones(n_dv) / n_dv

    oracle = NonlinearPoissonOracle(conn, X, dof_fixed)
    u_ref = oracle.solve(x)

    model = fem.NonlinearPoisson("quad4", X, conn, dof_fixed)
    u = np.asarray(model.solve_nonlinear(method=method, xdv=x, verbose=False))

    rng = np.random.RandomState(123)
    p = rng.rand(u.shape[0])
    pTu = p.dot(u)
    pTu_ref = p.dot(u_ref)
    assert abs((pTu - pTu_ref) / pTu) < 1e-8


def test_tangent_consistency():
    """The assembled tangent matches finite differences of the residual."""
    creator = fem.ProblemCreator(nnodes_x=6, nnodes_y=6)
    conn, X, dof_fixed = creator.create_poisson_problem()
    model = fem.NonlinearPoisson("quad4", X, conn, dof_fixed)
    rng = np.random.RandomState(3)
    xdv = rng.rand(4)
    u = 0.1 * rng.standard_normal(model.ndof)
    K = model.compute_jacobian(xdv, u).toarray()
    h = 1e-7
    for j in [0, 7, 20]:
        du = np.zeros(model.ndof)
        du[j] = h
        rp = np.asarray(model.compute_rhs(xdv, u + du))
        rm = np.asarray(model.compute_rhs(xdv, u - du))
        fd = (rp - rm) / (2 * h)
        np.testing.assert_allclose(K[:, j], fd, rtol=2e-6, atol=2e-6)


def test_fused_newton_matches_host_loop():
    """The one-dispatch lax.while_loop Newton (VERDICT r4 weak #3 /
    SURVEY §7 "Newton under jit") reproduces the host-loop iterates to
    roundoff: same residual contract, same GMRES tangent solves, all
    inside a single jitted program."""
    creator = fem.ProblemCreator(nnodes_x=16, nnodes_y=16)
    conn, X, dof_fixed = creator.create_poisson_problem()
    xdv = np.ones(10) / 10

    model = fem.NonlinearPoisson("quad4", X, conn, dof_fixed)
    u_host = np.asarray(
        model.solve_nonlinear(method="gmres", xdv=xdv, verbose=False)
    )
    u_fused, k, rn = model.solve_nonlinear_fused(
        method="gmres", xdv=xdv, verbose=False
    )
    assert np.abs(np.asarray(u_fused) - u_host).max() < 1e-12
    assert int(k) >= 4  # quadratic convergence needs several steps
    assert float(rn) < 1e-10 * 3.1  # tol * first-residual scale


def test_fused_newton_stalled_tangent_raises():
    """Plain CG on the nonsymmetric Newton tangent stalls; the fused
    loop's in-step guard must freeze and raise like the host path's
    _check_converged (pyfem.py:2421-2422 contract)."""
    creator = fem.ProblemCreator(nnodes_x=16, nnodes_y=16)
    conn, X, dof_fixed = creator.create_poisson_problem()
    model = fem.NonlinearPoisson("quad4", X, conn, dof_fixed)
    with pytest.raises(RuntimeError, match="tangent solve failed"):
        model.solve_nonlinear_fused(
            method="cg", xdv=np.ones(10) / 10, verbose=False
        )


def test_newton_gmg_tangent():
    """GMG-preconditioned Newton tangent solves (host + fused).

    The reference never wires pyamg into its Newton loop (plain scipy
    gmres, pyfem.py:2319-2355); here the tangent's SPD part — a
    variable-coefficient Poisson operator with c = h(x)(1+u^2) — feeds
    a GMG V-cycle that right-preconditions GMRES on the exact
    (nonsymmetric) assembled tangent stencil.  Gates: matches the
    direct-solve Newton at the reference tolerance, fused == host, and
    the tangent solves converge in O(10) Krylov iterations.
    """
    n = 33
    creator = fem.ProblemCreator(nnodes_x=n, nnodes_y=n)
    conn, X, dof_fixed = creator.create_poisson_problem()
    xdv = np.ones(10) / 10

    model = fem.NonlinearPoisson("quad4", X, conn, dof_fixed)
    u_ref = np.asarray(
        model.solve_nonlinear(method="direct", xdv=xdv, verbose=False)
    )
    model.attach_structured_grid(n, n)
    u_host = np.asarray(
        model.solve_nonlinear(method="gmg", xdv=xdv, verbose=False)
    )
    u_fused, k, rn = model.solve_nonlinear_fused(
        method="gmg", xdv=xdv, verbose=False
    )

    rng = np.random.RandomState(123)
    p = rng.rand(u_ref.shape[0])
    assert abs((p @ u_host - p @ u_ref) / (p @ u_ref)) < 1e-10
    assert np.abs(np.asarray(u_fused) - u_host).max() < 1e-10
    assert int(k) >= 4

    # V-cycle preconditioning keeps the Krylov count O(10) on the
    # first Newton step (Jacobi-GMRES needs O(100) at this size and
    # grows with refinement)
    import jax.numpy as jnp

    u0 = jnp.zeros(model.ndof, jnp.float64)
    res0 = model.residual(jnp.asarray(xdv), u0)
    du, li, lr, bnorm = model._gmg_newton_jit(
        jnp.asarray(xdv), u0, res0, 1e-8
    )
    assert 0 < int(li) <= 30
    assert float(lr) <= 1e-8 * float(bnorm) * 10


@pytest.mark.quick
def test_uniform_newton_fast_path_equivalence():
    """The scatter-free raster residual/tangent (the TPU fast path the
    gmg Newton uses on ProblemCreator grids) matches the generic
    einsum + scatter assembly to roundoff."""
    import jax.numpy as jnp
    from pyfem_gpu_testflight_tpu.models.nonlinear_poisson import (
        _tangent_elem,
    )

    n = 17
    creator = fem.ProblemCreator(nnodes_x=n, nnodes_y=n)
    conn, X, dof_fixed = creator.create_poisson_problem()
    m = fem.NonlinearPoisson("quad4", X, conn, dof_fixed)
    m.attach_structured_grid(n, n)
    assert m._unif is not None
    rng = np.random.RandomState(0)
    xdv = jnp.asarray(rng.rand(6))
    u = jnp.asarray(0.3 * rng.standard_normal(m.ndof))

    r_fast = np.asarray(m._uniform_residual(xdv, u))
    r_ref = np.asarray(m.residual(xdv, u))
    assert np.abs(r_fast - r_ref).max() < 1e-13

    st0 = m._gmg_newton.static_levels[0][0]
    cs, cr = m._uniform_tangent_coeffs(xdv, u.reshape(n, n))
    c_ref = st0.assemble(
        _tangent_elem(m.Xe, m.dN, m.N, m.wq, m.conn, xdv, u)
    )
    assert float(jnp.abs((cs + cr) - c_ref).max()) < 1e-13
