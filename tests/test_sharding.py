"""SPMD sharding: multi-device solve matches the single-device path.

Runs on the 8-way virtual CPU mesh configured in conftest.py.
"""

import numpy as np
import jax
import pytest

import pyfem_gpu_testflight_tpu as fem
from pyfem_gpu_testflight_tpu.parallel import (
    ShardedElasticity,
    ShardedPoisson,
    make_mesh,
)

pytestmark = pytest.mark.quick


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest should provide 8 cpu devices"
    return make_mesh(8)


def test_sharded_poisson_matches_reference(mesh8):
    creator = fem.ProblemCreator(nnodes_x=21, nnodes_y=17)
    conn, X, dof_fixed = creator.create_poisson_problem()
    model = fem.LinearPoisson(
        "quad4", X, conn, dof_fixed, gfunc=lambda x: x[..., 0] * x[..., 1]
    )
    u_ref = np.asarray(model.solve(method="direct"))
    rhs = model.compute_rhs()

    sharded = ShardedPoisson(
        mesh8, X, conn, np.asarray(model.bc.mask), fem.get_element("quad4")
    )
    u, iters = sharded.solve(np.ones(model.nnodes), rhs, rtol=1e-12)
    assert int(iters) > 0
    np.testing.assert_allclose(np.asarray(u), u_ref, rtol=1e-8, atol=1e-10)


def test_sharded_elasticity_matches_reference(mesh8):
    creator = fem.ProblemCreator(nnodes_x=14, nnodes_y=10)
    conn, X, dof_fixed, nodal_force = creator.create_linear_elasticity_problem()
    model = fem.LinearElasticity("quad4", X, conn, dof_fixed, None, nodal_force)
    u_ref = np.asarray(model.solve(method="direct"))

    sharded = ShardedElasticity(
        mesh8, X, conn, np.asarray(model.bc.mask), fem.get_element("quad4")
    )
    u, _ = sharded.solve(np.ones(model.nnodes), model.compute_rhs(), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(u), u_ref, rtol=1e-7, atol=1e-9)


def test_element_shards_are_actually_distributed(mesh8):
    creator = fem.ProblemCreator(nnodes_x=21, nnodes_y=17)
    conn, X, dof_fixed = creator.create_poisson_problem()
    model = fem.LinearPoisson("quad4", X, conn, dof_fixed)
    sharded = ShardedPoisson(
        mesh8, X, conn, np.asarray(model.bc.mask), fem.get_element("quad4")
    )
    # the padded element axis must be split 8 ways
    shards = sharded.Xe.addressable_shards
    assert len(shards) == 8
    sizes = {s.data.shape[0] for s in shards}
    assert sizes == {sharded.Xe.shape[0] // 8}
