"""Solver failure detection parity.

The reference raises RuntimeError when scipy cg/gmres return a nonzero
code (pyfem.py:1067, 1830-1831, 2421-2422).  The TPU solvers are
residual-checked at the public solve boundary: a stalled iteration must
raise, never silently return garbage into the optimization loop.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import pyfem_gpu_testflight_tpu as fem

pytestmark = pytest.mark.quick


def _well_posed_poisson():
    creator = fem.ProblemCreator(nnodes_x=32, nnodes_y=32,
                                 element_type="quad")
    conn, X, dof_fixed = creator.create_poisson_problem()
    return fem.LinearPoisson(
        "quad4", X, conn, dof_fixed, None,
        gfunc=lambda x: jnp.ones(x.shape[:-1], x.dtype),
    )


def test_cg_failure_raises():
    # a truncated iteration cannot meet the tolerance -> must raise
    model = _well_posed_poisson()
    with pytest.raises(RuntimeError, match="cg failed to converge"):
        model.solve(method="cg", maxiter=3)


def test_gmres_failure_raises():
    model = _well_posed_poisson()
    with pytest.raises(RuntimeError, match="gmres failed to converge"):
        model.solve(method="gmres", maxiter=1)


def test_converged_solve_does_not_raise():
    creator = fem.ProblemCreator(nnodes_x=8, nnodes_y=8, element_type="quad")
    conn, X, dof_fixed = creator.create_poisson_problem()
    model = fem.LinearPoisson(
        "quad4", X, conn, dof_fixed, None,
        gfunc=lambda x: jnp.ones(x.shape[:-1], x.dtype),
    )
    u = model.solve(method="cg")
    assert np.isfinite(np.asarray(u)).all()
