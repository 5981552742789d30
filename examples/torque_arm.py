"""Abaqus .inp -> plane-stress solve -> VTK pipeline
(reference examples/torque_arm/arm.py).

The reference ships a torque-arm CPS3 mesh asset; this example
*synthesizes* an equivalent .inp (an annular arm-like tri mesh with
``fixed`` and ``load`` node sets), then runs the identical pipeline:
parse -> LinearElasticity on CPS3 -> direct solve -> VTK export.
Point it at a real mesh with --inp.
"""

import argparse
import os

import numpy as np

import pyfem_gpu_testflight_tpu as fem


def synthesize_arm_inp(path, nr=6, nt=40):
    """Write a small annular 'arm' tri mesh in Abaqus .inp format."""
    r0, r1 = 0.4, 1.0
    # polar grid, stretched in x to look arm-like
    rs = np.linspace(r0, r1, nr)
    ts = np.linspace(0, np.pi, nt)
    nodes = []
    for r in rs:
        for t in ts:
            nodes.append((2.0 * r * np.cos(t), r * np.sin(t)))
    nodes = np.array(nodes)
    quads = []
    for i in range(nr - 1):
        for j in range(nt - 1):
            a = i * nt + j
            quads.append((a, a + 1, a + nt + 1, a + nt))
    tris = []
    for (a, b, c, d) in quads:
        tris.append((a, b, c))
        tris.append((c, d, a))
    # enforce positive (counterclockwise) orientation
    from pyfem_gpu_testflight_tpu.mesh import fix_orientation
    tris, _ = fix_orientation(np.array(tris), nodes)
    fixed = list(range(nt))  # inner ring
    load = list(range((nr - 1) * nt, (nr - 1) * nt + 3))  # outer ring end

    with open(path, "w") as fh:
        fh.write("*Heading\n** synthesized torque-arm-like mesh\n")
        fh.write("*NODE\n")
        for i, (x, y) in enumerate(nodes):
            fh.write(f"{i + 1}, {x:.9f}, {y:.9f}, 0.0\n")
        fh.write("*ELEMENT, type=CPS3\n")
        for i, (a, b, c) in enumerate(tris):
            fh.write(f"{i + 1}, {a + 1}, {b + 1}, {c + 1}\n")
        fh.write("*NSET, nset=fixed\n")
        fh.write(", ".join(str(n + 1) for n in fixed) + "\n")
        fh.write("*NSET, nset=load\n")
        fh.write(", ".join(str(n + 1) for n in load) + "\n")
    return path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--inp", default=None, help="path to an Abaqus .inp mesh")
    p.add_argument("--method", default="amg",
                   choices=["direct", "cg", "gmres", "amg"])
    args = p.parse_args()

    inp = args.inp
    if inp is None:
        # prefer the reference's real asset when mounted
        ref_arm = "/root/reference/examples/torque_arm/arm.inp"
        if os.path.exists(ref_arm):
            inp = ref_arm
            print(f"[info] using reference mesh {inp}")
        else:
            inp = synthesize_arm_inp("arm_synth.inp")
            print(f"[info] synthesized mesh at {inp}")

    parser = fem.InpParser(inp)
    conn_dict, X, groups = parser.parse()
    conn = conn_dict["CPS3"]
    X = X[:, :2]
    conn, n_flip = fem.fix_orientation(conn, X)
    if n_flip:
        print(f"[info] fixed orientation of {n_flip} elements")
    print(f"nelems={conn.shape[0]} nnodes={X.shape[0]} "
          f"nsets={list(groups)}")

    dof_fixed = []
    for n in groups["fixed"]:
        dof_fixed.extend([2 * int(n), 2 * int(n) + 1])
    nodal_force = {int(n): [0.0, -1.0] for n in groups["load"]}

    model = fem.LinearElasticity(
        "tri3", X, conn, dof_fixed, None, nodal_force
    )
    u = np.asarray(model.solve(method=args.method))
    ux, uy = u[0::2], u[1::2]
    print(f"max |ux| = {np.abs(ux).max():.6e}, max |uy| = {np.abs(uy).max():.6e}")

    # write next to the cwd (the .inp may live on a read-only mount)
    base = os.path.splitext(os.path.basename(inp))[0]
    out = base + "_result.vtk"
    fem.to_vtk({"CPS3": conn}, X, {"ux": ux, "uy": uy}, out)


if __name__ == "__main__":
    main()
