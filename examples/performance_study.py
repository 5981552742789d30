"""Element-Jacobian assembly timing sweep
(reference examples/SciTech2023/performance/performance_test.py).

Times the batched element-stiffness assembly (einsum path) for
{elasticity, helmholtz, poisson} on hex8 meshes of increasing size and
reports a table; also cross-checks the per-problem profiler timings
collected via utils.profile.saved_times.
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

import pyfem_gpu_testflight_tpu as fem
from pyfem_gpu_testflight_tpu.ops import geometry, stiffness


_MESH_ET = {"hex8": "block", "tet10": "tet", "brick20": "brick20"}


def build(n, problem, dtype, kernel="einsum", etype="hex8"):
    creator = fem.ProblemCreator(nnodes_x=n, nnodes_y=n, nnodes_z=n,
                                 element_type=_MESH_ET[etype])
    conn, X, dof_fixed = creator.create_poisson_problem()
    if problem == "elasticity":
        model = fem.LinearElasticity(etype, X, conn, [], None, {},
                                     dtype=dtype, kernel=kernel)
    elif problem == "helmholtz":
        model = fem.Helmholtz(0.05, etype, X, conn, dtype=dtype)
    else:
        model = fem.LinearPoisson(etype, X, conn, [], dtype=dtype,
                                  kernel=kernel)
    return model


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="+", default=[8, 16, 24, 32])
    p.add_argument("--problems", nargs="+",
                   default=["poisson", "helmholtz", "elasticity"])
    p.add_argument("--dtype", default="float32")
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--kernel", choices=["einsum", "pallas"],
                   default="einsum",
                   help="model-level element kernel (pallas = the 3D "
                        "TPU kernels, the A2DWrapper role extended to "
                        "tet10/brick20)")
    p.add_argument("--etype", choices=["hex8", "tet10", "brick20"],
                   default="hex8",
                   help="element type for the sweep (tet10/brick20 "
                        "need odd node counts)")
    args = p.parse_args()

    dtype = jnp.dtype(args.dtype)
    rows = []
    for problem in args.problems:
        for n in args.sizes:
            kern = args.kernel if problem != "helmholtz" else "einsum"
            model = build(n, problem, dtype, kernel=kern,
                          etype=args.etype)
            rho = jnp.ones((model.nnodes,), dtype=dtype)

            if problem == "helmholtz":
                fn = jax.jit(
                    lambda Xe: stiffness.poisson_stiffness(
                        Xe, model.dN, model.wq,
                        jnp.ones((model.nelems, model.nquads), dtype),
                    )
                    + stiffness.mass_matrix(Xe, model.dN, model.N, model.wq)
                )
                run = lambda: fn(model.Xe)
            else:
                run = lambda: model.element_jacobian(rho)

            out = run()
            jax.block_until_ready(out)
            t0 = time.time()
            for _ in range(args.repeats):
                out = run()
            jax.block_until_ready(out)
            dt = (time.time() - t0) / args.repeats
            ndof = model.ndof
            rows.append(
                {"problem": problem, "kernel": kern,
                 "etype": args.etype, "n": n, "ndof": ndof,
                 "nelems": model.nelems, "t_ke_s": round(dt, 6),
                 "elems_per_s": round(model.nelems / dt, 1)}
            )
            print(json.dumps(rows[-1]))

    print("\nsummary (elements/second):")
    for r in rows:
        print(f"  {r['problem']:>10s} n={r['n']:3d} ndof={r['ndof']:9d} "
              f"{r['elems_per_s']:.3e} elem/s")


if __name__ == "__main__":
    main()
