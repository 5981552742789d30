"""tet10/brick20 Poisson solves vs independent loop-based oracles.

Closes the oracle-breadth gap: quadratic-element *solutions* (not just
sensitivities) are gated by a second implementation, at the quad4
oracle tolerance (pTu relative error 1e-10, seed-123 projection —
the reference's comparison convention, tests/test_linear_poisson.py:39).
"""

import numpy as np
import jax.numpy as jnp

import pyfem_gpu_testflight_tpu as fem
from oracles.quadratic_oracle import (
    solve_poisson_brick20,
    solve_poisson_tet10,
)


def _proj_rel_err(u, u_ref):
    rng = np.random.RandomState(123)
    p = rng.rand(u_ref.shape[0])
    return abs((p @ np.asarray(u, np.float64) - p @ u_ref) / (p @ u_ref))


def _g(x):
    return 1.0 + x[..., 0] + 2.0 * x[..., 1] - 0.5 * x[..., 2]


def test_tet10_poisson_vs_oracle():
    creator = fem.ProblemCreator(nnodes_x=7, nnodes_y=7, nnodes_z=7,
                                 element_type="tet")
    conn, X, dof_fixed = creator.create_poisson_problem()
    model = fem.LinearPoisson("tet10", X, conn, dof_fixed, gfunc=_g)
    u = model.solve(method="direct")
    u_ref = solve_poisson_tet10(conn, X, dof_fixed, _g)
    assert _proj_rel_err(u, u_ref) < 1e-10


def test_brick20_poisson_vs_oracle():
    creator = fem.ProblemCreator(nnodes_x=7, nnodes_y=7, nnodes_z=7,
                                 element_type="brick20")
    conn, X, dof_fixed = creator.create_poisson_problem()
    model = fem.LinearPoisson("brick20", X, conn, dof_fixed, gfunc=_g)
    u = model.solve(method="direct")
    u_ref = solve_poisson_brick20(conn, X, dof_fixed, _g)
    assert _proj_rel_err(u, u_ref) < 1e-10
