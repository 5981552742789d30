"""DIA operator: matvec/diagonal identical to the assembled matrix."""

import numpy as np
import jax.numpy as jnp

import pyfem_gpu_testflight_tpu as fem
from pyfem_gpu_testflight_tpu.ops.dia import DiaOperator
import pytest

pytestmark = pytest.mark.quick


def _model():
    creator = fem.ProblemCreator(nnodes_x=13, nnodes_y=9)
    conn, X, dof_fixed, nodal_force = creator.create_linear_elasticity_problem()
    return fem.LinearElasticity("quad4", X, conn, dof_fixed, None, nodal_force)


def test_dia_matvec_matches_csr():
    model = _model()
    Ke = model.element_jacobian()
    K = model.assemble_scipy(Ke)
    op = DiaOperator(model.conn_dof_host, model.ndof)
    assert op.noffs <= 27
    dia = op.assemble(Ke)
    rng = np.random.default_rng(0)
    u = rng.standard_normal(model.ndof)
    y = np.asarray(op.matvec(dia, jnp.asarray(u)))
    np.testing.assert_allclose(y, K @ u, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(op.diagonal(dia)), K.diagonal(), rtol=1e-13, atol=1e-14
    )


def test_dia_bc_matvec_matches_elem_bc_matvec():
    from pyfem_gpu_testflight_tpu import assembly

    model = _model()
    Ke = model.element_jacobian()
    op = DiaOperator(model.conn_dof_host, model.ndof)
    dia = op.assemble(Ke)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal(model.ndof))
    y1 = np.asarray(op.bc_matvec(dia, model.bc.mask, u))
    y2 = np.asarray(
        assembly.bc_elem_matvec((Ke, model.conn_dof, model.bc.mask), u)
    )
    np.testing.assert_allclose(y1, y2, rtol=1e-12, atol=1e-12)


def test_dia_poisson_3d():
    creator = fem.ProblemCreator(nnodes_x=6, nnodes_y=5, nnodes_z=4,
                                 element_type="block")
    conn, X, dof_fixed = creator.create_poisson_problem()
    model = fem.LinearPoisson("hex8", X, conn, dof_fixed)
    Ke = model.element_jacobian()
    K = model.assemble_scipy(Ke)
    op = DiaOperator(model.conn_dof_host, model.ndof)
    dia = op.assemble(Ke)
    rng = np.random.default_rng(2)
    u = rng.standard_normal(model.ndof)
    np.testing.assert_allclose(
        np.asarray(op.matvec(dia, jnp.asarray(u))), K @ u, rtol=1e-12, atol=1e-12
    )
