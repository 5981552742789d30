"""Helmholtz filter verification (mirrors reference tests/test_helmholtz.py)."""

import numpy as np

import pyfem_gpu_testflight_tpu as fem
from oracles.helmholtz_oracle import HelmholtzFilterOracle
import pytest

pytestmark = pytest.mark.quick


def test_helmholtz_filter_vs_oracle():
    creator = fem.ProblemCreator(nnodes_x=32, nnodes_y=32, element_type="quad")
    conn, X, x = creator.create_helmholtz_problem()
    r0 = 0.1

    rng = np.random.RandomState(0)
    gradrho = rng.rand(x.shape[0])

    model = fem.Helmholtz(r0, "quad4", X, conn)
    u = np.asarray(model.apply(x))
    gradx = np.asarray(model.apply_gradient(gradrho))

    oracle = HelmholtzFilterOracle(r0, conn, X)
    u_ref = oracle.apply(x)
    gradx_ref = oracle.apply_gradient(gradrho)

    rng = np.random.RandomState(123)
    p = rng.rand(u.shape[0])
    pTu, pTu_ref = p.dot(u), p.dot(u_ref)
    pTg, pTg_ref = p.dot(gradx), p.dot(gradx_ref)
    assert abs((pTu - pTu_ref) / pTu) < 1e-8
    assert abs((pTg - pTg_ref) / pTu) < 1e-8


def test_filter_preserves_integral():
    """The Helmholtz filter conserves the (mass-weighted) field integral
    (examples/helmholtz/helmholtz_filter.py:29-31 of the reference)."""
    creator = fem.ProblemCreator(nnodes_x=24, nnodes_y=24, element_type="quad")
    conn, X, x = creator.create_helmholtz_problem()
    model = fem.Helmholtz(0.05, "quad4", X, conn, rtol=1e-12)
    rho = np.asarray(model.apply(x))
    # integral preservation: 1^T R x == 1^T K rho == 1^T (r0^2 S + R) rho,
    # and 1^T S == 0 (constants are in the stiffness nullspace)
    R = model.assemble_scipy(model.Re)
    before = R.dot(x).sum()
    after = R.dot(rho).sum()
    np.testing.assert_allclose(after, before, rtol=1e-8)


def test_helmholtz_structured_fast_path_matches():
    """attach_structured_grid: stencil filter == gather/scatter filter."""
    nx, ny = 24, 18
    creator = fem.ProblemCreator(nnodes_x=nx, nnodes_y=ny, element_type="quad")
    conn, X, x = creator.create_helmholtz_problem()
    slow = fem.Helmholtz(0.08, "quad4", X, conn, rtol=1e-12)
    fast = fem.Helmholtz(0.08, "quad4", X, conn, rtol=1e-12)
    fast.attach_structured_grid(nx, ny)
    rng = np.random.RandomState(0)
    g = rng.rand(x.shape[0])
    np.testing.assert_allclose(
        np.asarray(fast.apply(x)), np.asarray(slow.apply(x)),
        rtol=1e-8, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(fast.apply_gradient(g)),
        np.asarray(slow.apply_gradient(g)),
        rtol=1e-8, atol=1e-10,
    )
