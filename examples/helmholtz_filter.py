"""Helmholtz PDE filtering of a checkerboard density field
(reference examples/helmholtz/helmholtz_filter.py), with the integral
preservation check."""

import argparse

import numpy as np

import pyfem_gpu_testflight_tpu as fem


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--r0", type=float, default=0.05)
    args = p.parse_args()

    creator = fem.ProblemCreator(nnodes_x=args.n, nnodes_y=args.n,
                                 element_type="quad")
    conn, X, x = creator.create_helmholtz_problem()
    filtr = fem.Helmholtz(args.r0, "quad4", X, conn)
    rho = np.asarray(filtr.apply(x))

    R = filtr.assemble_scipy(filtr.Re)
    before, after = R.dot(x).sum(), R.dot(rho).sum()
    print(f"field integral before {before:.8e} after {after:.8e} "
          f"(rel change {abs(after - before) / before:.2e})")
    fem.to_vtk(conn, X, {"x": x, "rho": rho}, "helmholtz.vtk")


if __name__ == "__main__":
    main()
