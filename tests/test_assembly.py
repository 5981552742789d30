"""Assembly / BC / solver building blocks."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import sparse

import pyfem_gpu_testflight_tpu as fem
from pyfem_gpu_testflight_tpu import assembly, solvers

pytestmark = pytest.mark.quick


@pytest.fixture(scope="module")
def small_poisson():
    creator = fem.ProblemCreator(nnodes_x=9, nnodes_y=7)
    conn, X, dof_fixed = creator.create_poisson_problem()
    model = fem.LinearPoisson(
        "quad4", X, conn, dof_fixed, gfunc=lambda x: x[..., 0] + x[..., 1]
    )
    return model


def test_segment_assembly_matches_scipy_coo(small_poisson):
    model = small_poisson
    Ke = np.asarray(model.element_jacobian())
    K = model.assemble_scipy(Ke)
    # brute-force scipy duplicate-summing coo
    ndpe = model.nnodes_per_elem
    cd = model.conn_dof_host
    ii = np.repeat(cd, ndpe, axis=1).ravel()
    jj = np.tile(cd, (1, ndpe)).ravel()
    K_ref = sparse.coo_matrix(
        (Ke.reshape(-1), (ii, jj)), shape=(model.ndof, model.ndof)
    ).tocsr()
    assert abs(K - K_ref).max() < 1e-14


def test_matvec_matches_assembled(small_poisson):
    model = small_poisson
    Ke = model.element_jacobian()
    K = model.assemble_scipy(Ke)
    rng = np.random.default_rng(1)
    u = rng.standard_normal(model.ndof)
    y1 = np.asarray(model.matvec(Ke, jnp.asarray(u)))
    np.testing.assert_allclose(y1, K @ u, rtol=1e-13, atol=1e-13)


def test_diagonal_matches_assembled(small_poisson):
    model = small_poisson
    Ke = model.element_jacobian()
    K = model.assemble_scipy(Ke)
    np.testing.assert_allclose(
        np.asarray(model.diagonal(Ke)), K.diagonal(), rtol=1e-13, atol=1e-14
    )


def test_bc_operator_matches_scipy_bc(small_poisson):
    model = small_poisson
    Ke = model.element_jacobian()
    K = model.assemble_scipy(Ke)
    rhs = np.asarray(model.compute_rhs())
    K_bc, rhs_bc = model.bc.apply_scipy(K, rhs)
    rng = np.random.default_rng(2)
    u = rng.standard_normal(model.ndof)
    data = (Ke, model.conn_dof, model.bc.mask)
    y_op = np.asarray(assembly.bc_elem_matvec(data, jnp.asarray(u)))
    np.testing.assert_allclose(y_op, K_bc @ u, rtol=1e-12, atol=1e-12)
    rhs_op = np.asarray(
        model.bc.constrain_rhs(jnp.asarray(rhs), lambda v: model.matvec(Ke, v))
    )
    np.testing.assert_allclose(rhs_op, rhs_bc, rtol=1e-12, atol=1e-13)


def test_nonzero_fixed_values():
    """Nonzero Dirichlet values: operator path matches scipy direct solve."""
    creator = fem.ProblemCreator(nnodes_x=9, nnodes_y=9)
    conn, X, dof_fixed = creator.create_poisson_problem()
    vals = 0.5 + 0.1 * np.arange(len(dof_fixed))
    model = fem.LinearPoisson(
        "quad4", X, conn, dof_fixed, vals, gfunc=lambda x: x[..., 0]
    )
    u_direct = np.asarray(model.solve(method="direct"))
    u_cg = np.asarray(model.solve(method="cg", rtol=1e-12))
    np.testing.assert_allclose(u_cg, u_direct, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(u_direct[model.bc.fixed], vals, atol=1e-14)


def test_cg_solves_spd_system(small_poisson):
    model = small_poisson
    u_direct = np.asarray(model.solve(method="direct"))
    u_cg = np.asarray(model.solve(method="cg", rtol=1e-12))
    np.testing.assert_allclose(u_cg, u_direct, rtol=1e-8, atol=1e-10)


def test_gmres_solves_system(small_poisson):
    model = small_poisson
    u_direct = np.asarray(model.solve(method="direct"))
    u_g = np.asarray(model.solve(method="gmres", rtol=1e-12))
    np.testing.assert_allclose(u_g, u_direct, rtol=1e-6, atol=1e-8)
