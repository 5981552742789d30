"""Newton solve of the nonlinear Poisson problem
(reference examples/nonlinear_poisson/nonlinear_poisson_ex.py)."""

import argparse

import numpy as np

import pyfem_gpu_testflight_tpu as fem


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=32)
    p.add_argument("--ndv", type=int, default=10)
    p.add_argument("--method", default="gmres", choices=["direct", "cg", "gmres"])
    args = p.parse_args()

    creator = fem.ProblemCreator(nnodes_x=args.n, nnodes_y=args.n)
    conn, X, dof_fixed = creator.create_poisson_problem()
    model = fem.NonlinearPoisson("quad4", X, conn, dof_fixed)

    xdv = np.ones(args.ndv) / args.ndv
    u = np.asarray(model.solve_nonlinear(method=args.method, xdv=xdv))
    print(f"max |u| = {np.abs(u).max():.6e}")
    fem.to_vtk(conn, X, {"u": u}, "nonlinear_poisson.vtk")


if __name__ == "__main__":
    main()
