"""3D structured fast paths: gmg solve via attach_structured_grid and
the Helmholtz Stencil3D filter route."""

import numpy as np

import pyfem_gpu_testflight_tpu as fem


def test_hex8_gmg_solve_matches_direct():
    n = 9
    creator = fem.ProblemCreator(nnodes_x=n, nnodes_y=n, nnodes_z=n,
                                 element_type="block")
    conn, X, dof_fixed, nodal_force = (
        creator.create_linear_elasticity_problem()
    )
    m = fem.LinearElasticity("hex8", X, conn, dof_fixed, None, nodal_force)
    m.attach_structured_grid(n, n, n)
    u_g = np.asarray(m.solve(method="gmg", rtol=1e-11), np.float64)
    u_d = np.asarray(m.solve(method="direct"), np.float64)
    rel = np.linalg.norm(u_g - u_d) / np.linalg.norm(u_d)
    assert rel < 1e-8, rel


def test_hex8_helmholtz_fast_path_matches_slow():
    n = 9
    creator = fem.ProblemCreator(nnodes_x=n, nnodes_y=n, nnodes_z=n,
                                 element_type="block")
    conn, X, _, _ = creator.create_linear_elasticity_problem()
    filt = fem.Helmholtz(0.1, "hex8", X, conn)
    x = np.random.RandomState(0).rand(X.shape[0])
    r_slow = np.asarray(filt.apply(x))
    g_slow = np.asarray(filt.apply_gradient(x))
    filt.attach_structured_grid(n, n, n)
    assert np.abs(np.asarray(filt.apply(x)) - r_slow).max() < 1e-8
    assert np.abs(np.asarray(filt.apply_gradient(x)) - g_slow).max() < 1e-8
