"""Native restarted GMRES: convergence info, preconditioning, restarts.

The reference surfaces gmres convergence only through scipy's info flag
(pyfem.py:2421-2422); the TPU solver reports (iters, resnorm) directly
like ``cg`` — gated here on dense nonsymmetric systems.
"""

import numpy as np
import jax.numpy as jnp

from pyfem_gpu_testflight_tpu import solvers


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
