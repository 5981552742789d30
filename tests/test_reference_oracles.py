"""Gate the compat layer on the reference's own test oracles.

The reference's contract (SURVEY.md §4) is behavioral equivalence to its
independent loop-based implementations `tests/ref_*.py` at the original
unittest tolerances.  This module *imports* those oracle files from the
read-only reference checkout (never copies them) and replays the exact
gates of /root/reference/tests/test_{linear_poisson,elasticity,
helmholtz,nonlinear_poisson}.py through
``pyfem_gpu_testflight_tpu.compat`` — same meshes, same random
projections, same deltas.

Skipped wholesale if the reference tree is not mounted.
"""

import os
import sys
import types

import numpy as np
import pytest

_REF_TESTS = "/root/reference/tests"

if not os.path.isdir(_REF_TESTS):  # pragma: no cover
    pytest.skip("reference checkout not available", allow_module_level=True)

# ref_linear_poisson imports pyamg at module scope but only uses it for
# its optional use_amg path; stub it so the oracle imports in this image.
sys.modules.setdefault("pyamg", types.ModuleType("pyamg"))
sys.path.insert(0, _REF_TESTS)

import pyfem_gpu_testflight_tpu.compat as pyfem  # noqa: E402

pytestmark = pytest.mark.quick


def _projection_rel_err(u, u_ref):
    np.random.seed(123)
    p = np.random.rand(u.shape[0])
    pTu = p.dot(np.asarray(u, np.float64))
    pTu_ref = p.dot(np.asarray(u_ref, np.float64))
    return (pTu - pTu_ref) / pTu


def gfunc(x):
    # the manufactured source of /root/reference/tests/test_linear_poisson.py
    _x = x[..., 0]
    _y = x[..., 1]
    return _x * (_x - 5.0) * (_x - 10.0) * _y * (_y - 4.0)


def test_linear_poisson_vs_reference_oracle():
    from ref_linear_poisson import Poisson
    from ref_linear_poisson import gfunc as gfunc_ref

    creator = pyfem.ProblemCreator(nnodes_x=32, nnodes_y=32)
    conn, X, dof_fixed = creator.create_poisson_problem()
    quadrature = pyfem.QuadratureBilinear2D()
    basis = pyfem.BasisBilinear2D(quadrature)
    model = pyfem.LinearPoisson(X, conn, dof_fixed, None, quadrature, basis,
                                gfunc)
    u = pyfem.Assembler(model).solve(method="direct")

    u_ref = Poisson(conn, X, dof_fixed, gfunc_ref).solve()
    assert abs(_projection_rel_err(u, u_ref)) < 1e-10


def test_plane_stress_vs_reference_oracle():
    from ref_plane_stress import PlaneStress

    creator = pyfem.ProblemCreator(nnodes_x=32, nnodes_y=32)
    conn, X, dof_fixed, nodal_force = (
        creator.create_linear_elasticity_problem()
    )
    quadrature = pyfem.QuadratureBilinear2D()
    basis = pyfem.BasisBilinear2D(quadrature)
    model = pyfem.LinearElasticity(
        X, conn, dof_fixed, None, nodal_force, quadrature, basis
    )
    u = pyfem.Assembler(model).solve(method="direct")

    bcs = {}
    for dof_idx in np.asarray(dof_fixed):
        bcs[int(dof_idx) // 2] = [0, 1]
    u_ref = PlaneStress(conn, X, bcs, nodal_force).solve()
    assert abs(_projection_rel_err(u, u_ref)) < 1e-10


def test_helmholtz_vs_reference_oracle():
    from ref_helmholtz import NodeFilter

    creator = pyfem.ProblemCreator(nnodes_x=32, nnodes_y=32,
                                   element_type="quad")
    conn, X, x = creator.create_helmhotz_problem()
    r0 = 0.1
    np.random.seed(0)
    gradrho = np.random.rand(x.shape[0])

    quadrature = pyfem.QuadratureBilinear2D()
    basis = pyfem.BasisBilinear2D(quadrature)
    model = pyfem.Helmholtz(r0, X, conn, quadrature, basis)
    u = np.asarray(model.apply(x))
    gradx = np.asarray(model.apply_gradient(gradrho))

    filtr = NodeFilter(r0, conn, X)
    u_ref = filtr.apply(x)
    gradx_ref = filtr.applyGradient(gradrho)

    np.random.seed(123)
    p = np.random.rand(u.shape[0])
    pTu, pTu_ref = p.dot(u), p.dot(u_ref)
    pTg, pTg_ref = p.dot(gradx), p.dot(gradx_ref)
    assert abs((pTu - pTu_ref) / pTu) < 1e-8
    assert abs((pTg - pTg_ref) / pTu) < 1e-8


@pytest.mark.parametrize("method", ["direct", "gmres"])
def test_nonlinear_poisson_vs_reference_oracle(method):
    from ref_nonlinear_poisson import NonlinearPoisson, PoissonProblem

    creator = pyfem.ProblemCreator(nnodes_x=32, nnodes_y=32)
    conn, X, dof_fixed = creator.create_poisson_problem()

    problem = PoissonProblem(10)
    poisson = NonlinearPoisson(conn, X, dof_fixed, problem)
    x = np.ones(problem.N) / problem.N
    u_ref = poisson.solve(x)

    quadrature = pyfem.QuadratureBilinear2D()
    basis = pyfem.BasisBilinear2D(quadrature)
    model = pyfem.NonlinearPoisson2D(X, conn, dof_fixed, None, quadrature,
                                     basis)
    u = pyfem.Assembler(model).solve_nonlinear(method=method, xdv=x)
    assert abs(_projection_rel_err(u, u_ref)) < 1e-8
