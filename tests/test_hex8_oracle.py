"""3D (hex8) solution correctness vs an independent loop-based oracle.

Round-1 gated 3D solves only by direct-vs-CG self-consistency; this
module adds the independent truth source (tests/oracles/hex8_oracle.py)
at the reference gate tolerance (1e-10 random-projection relative
error, matching test_linear_poisson.py:39 / test_elasticity.py:50).
"""

import numpy as np
import jax.numpy as jnp

import pyfem_gpu_testflight_tpu as fem
from oracles.hex8_oracle import solve_elasticity_3d, solve_poisson_3d
import pytest

pytestmark = pytest.mark.quick


def _proj_rel_err(u, u_ref):
    np.random.seed(123)
    p = np.random.rand(u.shape[0])
    return abs((p.dot(u) - p.dot(u_ref)) / p.dot(u))


def test_hex8_elasticity_vs_oracle():
    creator = fem.ProblemCreator(nnodes_x=8, nnodes_y=8, nnodes_z=8,
                                 element_type="block")
    conn, X, dof_fixed, nodal_force = (
        creator.create_linear_elasticity_problem()
    )
    model = fem.LinearElasticity("hex8", X, conn, dof_fixed, None,
                                 nodal_force)
    u_direct = np.asarray(model.solve(method="direct"), np.float64)
    u_cg = np.asarray(model.solve(method="cg", rtol=1e-12), np.float64)

    u_ref = solve_elasticity_3d(conn, X, dof_fixed, nodal_force)
    assert _proj_rel_err(u_direct, u_ref) < 1e-10
    assert _proj_rel_err(u_cg, u_ref) < 1e-10


def test_hex8_poisson_vs_oracle():
    creator = fem.ProblemCreator(nnodes_x=8, nnodes_y=8, nnodes_z=8,
                                 element_type="block")
    conn, X, dof_fixed = creator.create_poisson_problem()

    def gfunc(x):
        return x[..., 0] * x[..., 1] + x[..., 2]

    model = fem.LinearPoisson("hex8", X, conn, dof_fixed, None, gfunc=gfunc)
    u_direct = np.asarray(model.solve(method="direct"), np.float64)

    u_ref = solve_poisson_3d(conn, X, dof_fixed,
                             lambda x: x[0] * x[1] + x[2])
    assert _proj_rel_err(u_direct, u_ref) < 1e-10
