"""Heat conduction with uniform source (reference examples/heat_conduction.py)."""

import argparse

import numpy as np

import pyfem_gpu_testflight_tpu as fem


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nx", type=int, default=64)
    p.add_argument("--ny", type=int, default=64)
    p.add_argument("--nz", type=int, default=None)
    p.add_argument("--method", default="cg", choices=["direct", "cg", "gmres"])
    p.add_argument("--vtk", default="heat.vtk")
    args = p.parse_args()

    etype = "quad" if args.nz is None else "block"
    creator = fem.ProblemCreator(
        nnodes_x=args.nx, nnodes_y=args.ny, nnodes_z=args.nz,
        element_type=etype,
    )
    conn, X, dof_fixed = creator.create_poisson_problem()
    model = fem.LinearPoisson(
        etype, X, conn, dof_fixed, gfunc=lambda x: 1.0 + 0.0 * x[..., 0]
    )
    T = np.asarray(model.solve(method=args.method))
    print(f"max T = {T.max():.6e}")
    fem.to_vtk(conn, X, {"T": T}, args.vtk)


if __name__ == "__main__":
    main()
