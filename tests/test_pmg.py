"""p-multigrid for quadratic elements (pmg.py).

The reference's quadratic elements (tet10/brick20) never had a
preconditioned-iterative solve path — its tests stop at 9^3 direct
solves (test_elements.py) and the SciTech sweeps measure assembly only
(performance_test.py:21-143).  Gates:

  * pmg == direct at 1e-8 on tet10 AND brick20 lattices (the brick20
    case exercises the dead-lattice-node masking);
  * iteration counts stay bounded when the mesh refines (the two-level
    p-MG + corner-GMG composition is h-independent);
  * the RAMP-penalized (rho != 1) operator solves through the same
    compiled program.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pyfem_gpu_testflight_tpu as fem

jax.config.update("jax_enable_x64", True)


def _model(et, n, p=0.0):
    creator = fem.ProblemCreator(nnodes_x=n, nnodes_y=n, nnodes_z=n,
                                 element_type=et)
    conn, X, dof_fixed, nodal_force = (
        creator.create_linear_elasticity_problem()
    )
    ename = "tet10" if et == "tet" else "brick20"
    model = fem.LinearElasticity(ename, X, conn, dof_fixed, None,
                                 nodal_force, p=p)
    model.attach_pmg(n, n, n)
    return model


@pytest.mark.quick
@pytest.mark.parametrize("et", ["tet", "brick20"])
def test_pmg_matches_direct(et):
    model = _model(et, 9)
    u = model.solve(method="pmg", rtol=1e-10)
    stats = model.last_solve_stats
    assert stats["method"] == "pmg" and stats["iters"] >= 2, stats
    u_dir = model.solve(method="direct")
    rel = (np.linalg.norm(np.asarray(u) - np.asarray(u_dir))
           / np.linalg.norm(np.asarray(u_dir)))
    assert rel < 1e-8, rel


def test_pmg_iterations_bounded_under_refinement():
    """Two-level p-MG with a corner-grid GMG coarse solve: iteration
    counts must not grow with mesh size (CG + single-level Jacobi would
    roughly double per refinement on 3D elasticity)."""
    ks = {}
    for n in (9, 13):
        model = _model("brick20", n)
        model.solve(method="pmg", rtol=1e-8)
        ks[n] = model.last_solve_stats["iters"]
    assert ks[13] <= ks[9] + 4, ks


def test_pmg_ramp_penalized():
    """rho != 1 (RAMP p=3) reuses the compiled step and still matches
    the direct solve — the topology-optimization configuration."""
    model = _model("tet", 9, p=3.0)
    rng = np.random.RandomState(5)
    rho = jnp.asarray(0.3 + 0.7 * rng.rand(model.nnodes))
    u = model.solve(method="pmg", rho=rho, rtol=1e-10)
    u_dir = model.solve(method="direct", rho=rho)
    rel = (np.linalg.norm(np.asarray(u) - np.asarray(u_dir))
           / np.linalg.norm(np.asarray(u_dir)))
    assert rel < 1e-8, rel


@pytest.mark.quick
@pytest.mark.parametrize("et", ["tet", "brick20"])
def test_lattice_matvec_equals_elem_matvec(et):
    """The scatter-free stride-2 lattice matvec (pmg._lattice_matvec,
    the TPU fast path behind every Chebyshev/residual apply) is the
    same operator as the generic gather/segment_sum element matvec."""
    from pyfem_gpu_testflight_tpu import assembly

    model = _model(et, 9)
    pmg = model._pmg
    assert pmg._lat_off is not None  # creator lattices must match
    rng = np.random.RandomState(5)
    Ke = model.element_jacobian(
        jnp.asarray(0.3 + 0.7 * rng.rand(model.nnodes))
    )
    v = jnp.asarray(rng.standard_normal(model.ndof))
    y_lat = pmg._lattice_matvec(Ke, v)
    y_gen = assembly.elem_matvec(Ke, model.conn_dof, v, model.ndof)
    rel = float(jnp.linalg.norm(y_lat - y_gen) / jnp.linalg.norm(y_gen))
    assert rel < 1e-13, rel
