"""Topology optimization driver
(reference examples/topology_optimization/topo.py + topo_heat.py).

Helmholtz-filtered RAMP compliance minimization with a volume constraint,
driven by the in-repo MMA optimizer.  Supports the elasticity and thermal
problems on quad/tri/block meshes, with design-history VTKs, checkpoints
and a final result.vtk.
"""

import argparse

import jax
import numpy as np

import pyfem_gpu_testflight_tpu as fem
from pyfem_gpu_testflight_tpu.opt import TopoProblem, optimize_topology


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--problem", choices=["elasticity", "thermal"],
                   default="elasticity")
    p.add_argument("--element_type", choices=["quad", "tri", "block"],
                   default="quad")
    p.add_argument("--r0", type=float, default=0.01, help="filter radius")
    p.add_argument("--prefix", default="results")
    p.add_argument("--max_iterations", type=int, default=200)
    p.add_argument("--fixed_volume", type=float, default=0.4)
    p.add_argument("--solver", default="cg",
                   choices=["direct", "cg", "gmres", "gmg"])
    p.add_argument("--timer_threshold", type=float, default=10.0)
    args = p.parse_args()

    fem.timer_set_threshold(args.timer_threshold)

    if args.element_type in ("quad", "tri"):
        creator = fem.ProblemCreator(nnodes_x=128, nnodes_y=64,
                                     element_type=args.element_type)
    else:
        creator = fem.ProblemCreator(nnodes_x=64, nnodes_y=32, nnodes_z=32,
                                     element_type="block")

    if args.problem == "elasticity":
        conn, X, dof_fixed, nodal_force = (
            creator.create_linear_elasticity_problem()
        )
        model = fem.LinearElasticity(
            args.element_type, X, conn, dof_fixed, None, nodal_force, p=5.0
        )
    else:
        conn, X, dof_fixed = creator.create_poisson_problem()
        model = fem.LinearPoisson(
            args.element_type, X, conn, dof_fixed,
            gfunc=lambda x: 1.0 + 0.0 * x[..., 0], p=5.0,
        )

    filtr = fem.Helmholtz(args.r0, args.element_type, X, conn)
    # stencil fast path for the two filter solves per MMA iteration
    if args.element_type == "quad":
        filtr.attach_structured_grid(128, 64)
    elif args.element_type == "block":
        filtr.attach_structured_grid(64, 32, 32)

    if args.solver == "gmg":
        assert args.element_type in ("quad", "block"), (
            "gmg solver requires structured quad/hex grids"
        )
        # fused Pallas V-cycle kernels on real accelerators (interpret
        # mode on CPU is for tests, not for running examples)
        pal = jax.default_backend() != "cpu"
        if args.element_type == "quad":
            model.attach_structured_grid(128, 64, pallas_smooth=pal)
        else:
            model.attach_structured_grid(64, 32, 32, pallas_smooth=pal)

    prob = TopoProblem(model, filtr, fixed_volume=args.fixed_volume,
                       solver=args.solver)
    prob.checkGradients()

    x, rho = optimize_topology(
        model, filtr,
        fixed_volume=args.fixed_volume,
        max_iterations=args.max_iterations,
        prefix=args.prefix,
        solver=args.solver,
        save_history=args.element_type != "block",
    )
    print(f"final volume fraction: {float(model.volume(rho)):.4f}")
    print(f"results in {args.prefix}/result.vtk")


if __name__ == "__main__":
    main()
