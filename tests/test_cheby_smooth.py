"""Product-form Chebyshev smoothing (per-sweep omega factors).

The fused Pallas sweep kernels take a tuple of per-sweep damping
factors; ``omega="cheby"`` resolves to reciprocals of Chebyshev nodes
on [cheb_lam/cheb_frac, cheb_lam] (multigrid.smoothing_omegas) — the
same per-sweep cost as damped Jacobi with a near-optimal degree-nu
damping polynomial.  The reference's pyamg setup hardwires stationary
Jacobi relaxation (pyfem.py:2392-2400); this is the TPU solver's
stronger-smoother upgrade, gated here for:

* iteration reduction vs the tuned stationary omega (both paths),
* Pallas kernels == XLA smoother with identical nonstationary factors,
* sharded solver == single-device solver under ``omega="cheby"``.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import pyfem_gpu_testflight_tpu as fem
from pyfem_gpu_testflight_tpu import multigrid
from pyfem_gpu_testflight_tpu.ops.dia import interleave_to_planar

jax.config.update("jax_enable_x64", True)

pytestmark = pytest.mark.quick


def _solve2d(nx, ny, omega, pallas, dtype=jnp.float32, **kw):
    creator = fem.ProblemCreator(nnodes_x=nx, nnodes_y=ny,
                                 element_type="quad")
    conn, X, dof_fixed, nodal_force = (
        creator.create_linear_elasticity_problem()
    )
    model = fem.LinearElasticity("quad4", X, conn, dof_fixed, None,
                                 nodal_force, p=0.0, dtype=dtype)
    L = (float(X[:, 0].max()), float(X[:, 1].max()))
    asm = multigrid.GMGAssembler(nx, ny, *L, "elasticity", p=0.0,
                                 dtype=dtype, omega=omega,
                                 pallas_smooth=pallas, **kw)
    gmg, lv0 = asm.assemble(jnp.ones((model.nnodes,), dtype))
    rhs = jnp.asarray(model.compute_rhs(), dtype)
    b = jnp.where(lv0.mask, 0.0,
                  interleave_to_planar(rhs, 2).reshape(2, ny, nx))
    x, k, rn = multigrid.pcg_gmg(gmg, lv0, b, rtol=1e-6, maxiter=60)
    return np.asarray(x), int(k), float(rn)


def _solve3d(n, omega, pallas, dtype=jnp.float32):
    creator = fem.ProblemCreator(nnodes_x=n, nnodes_y=n, nnodes_z=n,
                                 element_type="block")
    conn, X, dof_fixed, nodal_force = (
        creator.create_linear_elasticity_problem()
    )
    model = fem.LinearElasticity("hex8", X, conn, dof_fixed, None,
                                 nodal_force, p=0.0, dtype=dtype)
    L = [float(X[:, k].max()) for k in range(3)]
    asm = multigrid.GMGAssembler3D(n, n, n, *L, "elasticity", p=0.0,
                                   dtype=dtype, omega=omega,
                                   pallas_smooth=pallas)
    gmg, lv0 = asm.assemble(jnp.ones((model.nnodes,), dtype))
    rhs = jnp.asarray(model.compute_rhs(), dtype)
    b = jnp.where(lv0.mask, 0.0,
                  interleave_to_planar(rhs, 3).reshape(3, n, n, n))
    x, k, rn = multigrid.pcg_gmg(gmg, lv0, b, rtol=1e-6, maxiter=60)
    return np.asarray(x), int(k), float(rn)


def test_smoothing_omegas_nodes():
    oms = multigrid.smoothing_omegas(2, lam_max=3.0, frac=8.0)
    assert len(oms) == 2
    # reciprocals of nodes in [lam/frac, 1.02*lam]
    for w in oms:
        assert 1.0 / (1.02 * 3.0) <= w <= 8.0 / 3.0
    # ordered small-to-large (first node is the largest)
    assert oms[0] < oms[1]
    # stationary degenerate case
    assert multigrid.smoothing_omegas(1, 3.0, 8.0)[0] == pytest.approx(
        1.0 / (0.5 * (3.0 / 8.0 + 1.02 * 3.0)), rel=1e-12
    )


def test_cheby_fewer_iters_2d_both_paths():
    _, k_jac, _ = _solve2d(33, 33, 0.7, pallas=False)
    x_xla, k_xla, _ = _solve2d(33, 33, "cheby", pallas=False)
    x_pal, k_pal, _ = _solve2d(33, 33, "cheby", pallas=True)
    assert k_xla < k_jac, (k_xla, k_jac)
    assert k_pal == k_xla, (k_pal, k_xla)
    rel = np.abs(x_pal - x_xla).max() / np.abs(x_xla).max()
    assert rel < 1e-4, rel


def test_cheby_fewer_iters_3d_both_paths():
    _, k_jac, _ = _solve3d(17, 0.6, pallas=False)
    x_xla, k_xla, _ = _solve3d(17, "cheby", pallas=False)
    x_pal, k_pal, _ = _solve3d(17, "cheby", pallas=True)
    assert k_xla <= k_jac, (k_xla, k_jac)
    assert abs(k_pal - k_xla) <= 1, (k_pal, k_xla)
    rel = np.abs(x_pal - x_xla).max() / np.abs(x_xla).max()
    assert rel < 1e-4, rel


def test_omega_tuple_matches_explicit_sweeps_f64():
    """Tuple-omega GMG == hand-rolled nonstationary sweeps (f64).

    Runs one V-cycle apply through the XLA path with omega=(w1, w2)
    and checks the fine-level pre-smoothing against explicit sweeps.
    """
    nx = ny = 17
    dtype = jnp.float64
    creator = fem.ProblemCreator(nnodes_x=nx, nnodes_y=ny,
                                 element_type="quad")
    conn, X, dof_fixed, nodal_force = (
        creator.create_linear_elasticity_problem()
    )
    model = fem.LinearElasticity("quad4", X, conn, dof_fixed, None,
                                 nodal_force, p=0.0, dtype=dtype)
    L = (float(X[:, 0].max()), float(X[:, 1].max()))
    oms = (0.4, 1.1)
    asm = multigrid.GMGAssembler(nx, ny, *L, "elasticity", p=0.0,
                                 dtype=dtype, omega=oms,
                                 pallas_smooth=False)
    gmg, lv0 = asm.assemble(jnp.ones((model.nnodes,), dtype))
    rhs = jnp.asarray(model.compute_rhs(), dtype)
    b = jnp.where(lv0.mask, 0.0,
                  interleave_to_planar(rhs, 2).reshape(2, ny, nx))
    lv = gmg.levels[0]
    got = gmg._smooth(lv, jnp.zeros_like(b), b, 2, x0_zero=True)
    # explicit: x1 = w1 D^-1 b; x2 = x1 + w2 D^-1 (b - A x1)
    x1 = oms[0] * lv.inv_diag * jnp.where(lv.mask, 0.0, b)
    r = b - lv.matvec_lp(x1)
    want = x1 + oms[1] * lv.inv_diag * jnp.where(lv.mask, 0.0, r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-14)
    # post-smoothing applies the reversed factors (adjoint ordering)
    assert gmg._omegas(2) == oms
    assert gmg._omegas(2, reverse=True) == tuple(reversed(oms))


def test_cheby_sharded_matches_single_device_f64():
    from pyfem_gpu_testflight_tpu.parallel import ShardedGMG2D, make_mesh

    nx, ny = 33, 17
    dtype = jnp.float64
    creator = fem.ProblemCreator(nnodes_x=nx, nnodes_y=ny,
                                 element_type="quad")
    conn, X, dof_fixed, nodal_force = (
        creator.create_linear_elasticity_problem()
    )
    model = fem.LinearElasticity("quad4", X, conn, dof_fixed, None,
                                 nodal_force, p=0.0, dtype=dtype)
    L = (float(X[:, 0].max()), float(X[:, 1].max()))
    rhs = jnp.asarray(model.compute_rhs(), dtype)
    b = jnp.where(
        multigrid.GMGAssembler(
            nx, ny, *L, "elasticity", dtype=dtype, omega="cheby"
        ).assemble(jnp.ones(model.nnodes, dtype))[1].mask,
        0.0, interleave_to_planar(rhs, 2).reshape(2, ny, nx),
    )
    asm = multigrid.GMGAssembler(nx, ny, *L, "elasticity", p=0.0,
                                 dtype=dtype, omega="cheby")
    gmg, lv0 = asm.assemble(jnp.ones((model.nnodes,), dtype))
    x0, k0, _ = multigrid.pcg_gmg(gmg, lv0, b, rtol=1e-8, maxiter=60)

    mesh = make_mesh(8)
    sg = ShardedGMG2D(mesh, nx, ny, *L, "elasticity", dtype=dtype,
                      omega="cheby")
    x1, k1, _ = sg.solve(jnp.ones(model.nnodes, dtype), b, rtol=1e-8,
                         maxiter=60)
    assert int(k1) == int(k0), (int(k0), int(k1))
    # same math, psum-reordered reductions (f64 roundoff accumulation)
    rel = float(jnp.linalg.norm(x1 - x0) / jnp.linalg.norm(x0))
    assert rel < 1e-11, rel
