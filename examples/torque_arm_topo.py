"""Topology optimization ON the unstructured torque-arm mesh.

The reference's two flagship workloads never meet: topology
optimization (examples/topology_optimization/topo.py:176-189) runs only
on structured creator grids, and the torque-arm .inp pipeline
(examples/torque_arm/arm.py) only does a single analysis solve.  This
example combines them — Helmholtz-filtered RAMP compliance minimization
with a volume constraint on the CPS3 arm mesh — which the reference
could not run at all (pyamg + ParOpt would, but no driver exists):

    parse .inp -> LinearElasticity(tri3, RAMP p=3)
               -> cached smoothed-aggregation AMG state solves
                  (unstructured.amg_pcg: RCM + rigid-body-mode SA,
                  device DIA V-cycle PCG; setup cached across the loop)
               -> unstructured Helmholtz filter (element assembly + CG)
               -> MMA (opt.mma) -> design VTK.

Usage:
    python examples/torque_arm_topo.py [--inp mesh.inp] [--iters 30]
        [--vol 0.5] [--r0 0.08] [--nr 12 --nt 80] [--prefix results]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyfem_gpu_testflight_tpu as fem
from pyfem_gpu_testflight_tpu.opt import MMA, TopoProblem
from torque_arm import synthesize_arm_inp


def build_problem(inp_path, r0=0.08, vol=0.5, rtol=1e-8):
    """(TopoProblem, model, filtr, conn, X) for a torque-arm .inp."""
    parser = fem.InpParser(inp_path)
    conn_dict, X, groups = parser.parse()
    conn, _ = fem.fix_orientation(conn_dict["CPS3"], X[:, :2])
    X = X[:, :2]
    dof_fixed = []
    for n in groups["fixed"]:
        dof_fixed.extend([2 * int(n), 2 * int(n) + 1])
    nodal_force = {int(n): [0.0, -1.0] for n in groups["load"]}
    model = fem.LinearElasticity("tri3", X, conn, dof_fixed, None,
                                 nodal_force, p=3.0)
    filtr = fem.Helmholtz(r0, "tri3", X, conn, rtol=1e-8)
    prob = TopoProblem(model, filtr, fixed_volume=vol, solver="amg")
    return prob, model, filtr, conn, X


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inp", default=None,
                    help="Abaqus .inp mesh with CPS3 elements and "
                         "fixed/load NSETs (default: synthesized arm)")
    ap.add_argument("--nr", type=int, default=12)
    ap.add_argument("--nt", type=int, default=80)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--vol", type=float, default=0.5)
    ap.add_argument("--r0", type=float, default=0.08)
    ap.add_argument("--prefix", default="results_arm_topo")
    args = ap.parse_args()

    inp = args.inp or synthesize_arm_inp(
        os.path.join("/tmp", "arm_topo.inp"), nr=args.nr, nt=args.nt
    )
    prob, model, filtr, conn, X = build_problem(
        inp, r0=args.r0, vol=args.vol
    )
    print(f"[arm-topo] {model.nelems} CPS3 elements, "
          f"{model.ndof} dofs, volume bound {args.vol}")
    opt = MMA(prob, {"max_iterations": args.iters, "verbose": True})
    x = opt.optimize()
    rho = np.asarray(filtr.apply(x))
    os.makedirs(args.prefix, exist_ok=True)
    out = os.path.join(args.prefix, "arm_design.vtk")
    fem.to_vtk(conn, X, {"x": np.asarray(x), "rho": rho}, out)
    h0, h1 = opt.history[0], opt.history[-1]
    print(f"[arm-topo] compliance {h0['obj']:.5f} -> {h1['obj']:.5f}, "
          f"volume {args.vol - h1['con'][0]:.4f}, design -> {out}")


if __name__ == "__main__":
    main()
