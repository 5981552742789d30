"""Sharded unstructured AMG vs the single-device solver.

The last solver family without an SPMD form (VERDICT r3 missing #4):
the RCM-banded DIA levels are dof-block-sharded with bandwidth halo
slabs; iterates must match unstructured.amg_pcg on the torque-arm mesh
(the reference's .inp workload, pyfem.py:2392-2400 role).
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

import pyfem_gpu_testflight_tpu as fem
from pyfem_gpu_testflight_tpu import unstructured
from pyfem_gpu_testflight_tpu.parallel import (
    ShardedAMGPCG,
    make_mesh,
    sharded_amg_pcg,
)

jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def _arm_system():
    from torque_arm import synthesize_arm_inp

    inp = synthesize_arm_inp("/tmp/arm_synth_samg.inp", nr=12, nt=80)
    parser = fem.InpParser(inp)
    conn_dict, X, groups = parser.parse()
    conn, _ = fem.fix_orientation(conn_dict["CPS3"], X[:, :2])
    X = X[:, :2]
    dof_fixed = []
    for n in groups["fixed"]:
        dof_fixed.extend([2 * int(n), 2 * int(n) + 1])
    nodal_force = {int(n): [0.0, -1.0] for n in groups["load"]}
    model = fem.LinearElasticity("tri3", X, conn, dof_fixed, None,
                                 nodal_force, dtype=jnp.float64)
    K = model.assemble_scipy(model.element_jacobian(1.0))
    K, b = model.bc.apply_scipy(K, np.asarray(model.compute_rhs()))
    return K, b, X


def test_sharded_amg_matches_single_device_torque_arm():
    K, b, X = _arm_system()
    x0, k0, rn0 = unstructured.amg_pcg(K, b, nd=2, coords=X, rtol=1e-10,
                                       dtype=jnp.float64,
                                       precond_dtype=jnp.float64)
    mesh = make_mesh(8)
    solver = ShardedAMGPCG(mesh, K, nd=2, coords=X, dtype=jnp.float64)
    assert solver.fine_sharded
    assert sum(p["sharded"] for p in solver.plan) >= 1
    x1, k1, rn1 = solver.solve(b, rtol=1e-10)
    # same math, psum-reordered reductions: identical iteration counts
    # and solutions to f64 roundoff
    assert abs(int(k1) - int(k0)) <= 1, (int(k0), int(k1))
    rel = float(np.linalg.norm(np.asarray(x1) - np.asarray(x0))
                / np.linalg.norm(np.asarray(x0)))
    assert rel < 1e-9, rel
    # and against the host direct solve
    from scipy.sparse.linalg import spsolve

    xd = spsolve(K.tocsr(), b)
    reld = np.linalg.norm(np.asarray(x1) - xd) / np.linalg.norm(xd)
    assert reld < 1e-8, reld


def test_sharded_amg_oneshot_wrapper():
    K, b, X = _arm_system()
    mesh = make_mesh(8)
    x, k, rn = sharded_amg_pcg(mesh, K, b, nd=2, coords=X, rtol=1e-8,
                               dtype=jnp.float64)
    from scipy.sparse.linalg import spsolve

    xd = spsolve(K.tocsr(), b)
    rel = np.linalg.norm(np.asarray(x) - xd) / np.linalg.norm(xd)
    assert rel < 1e-6, rel
