"""2D Poisson on quad vs tri meshes (reference examples/triangle/quad_tri.py).

Solves the same Poisson problem on a quad4 and a tri3 mesh and compares
the solutions where they share nodes.
"""

import argparse

import numpy as np

import pyfem_gpu_testflight_tpu as fem


def gfunc(x):
    return x[..., 0] * (x[..., 0] - 5.0) * (x[..., 0] - 10.0) * x[..., 1] * (
        x[..., 1] - 4.0
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=32)
    p.add_argument("--method", default="cg", choices=["direct", "cg", "gmres"])
    args = p.parse_args()

    sols = {}
    for etype in ("quad", "tri"):
        creator = fem.ProblemCreator(nnodes_x=args.n, nnodes_y=args.n,
                                     element_type=etype)
        conn, X, dof_fixed = creator.create_poisson_problem()
        model = fem.LinearPoisson(etype, X, conn, dof_fixed, gfunc=gfunc)
        u = np.asarray(model.solve(method=args.method))
        sols[etype] = u
        fem.to_vtk(conn, X, {"u": u}, f"poisson_{etype}.vtk")
        print(f"{etype}: max |u| = {np.abs(u).max():.6e}")

    # same node grid -> element-type discretization difference only
    diff = np.abs(sols["quad"] - sols["tri"]).max()
    print(f"max |u_quad - u_tri| = {diff:.3e} (discretization difference)")


if __name__ == "__main__":
    main()
