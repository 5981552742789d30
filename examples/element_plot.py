"""Export single quadratic elements to VTK for inspection
(reference examples/element_plot/c3d10_plot.py and c3d20_plot.py)."""

import numpy as np

import pyfem_gpu_testflight_tpu as fem


def main():
    # one tet10: unit corner tet + mid-edge nodes
    creator = fem.ProblemCreator(nnodes_x=3, nnodes_y=3, nnodes_z=3,
                                 element_type="tet")
    fem.to_vtk({"tet10": creator.conn[:1]}, creator.X, {}, "c3d10.vtk")
    print(f"tet10 mesh: {creator.conn.shape[0]} elements -> c3d10.vtk")

    # one brick20
    creator = fem.ProblemCreator(nnodes_x=3, nnodes_y=3, nnodes_z=3,
                                 element_type="brick20")
    fem.to_vtk({"brick20": creator.conn}, creator.X, {}, "c3d20.vtk")
    print(f"brick20 mesh: {creator.conn.shape[0]} elements -> c3d20.vtk")


if __name__ == "__main__":
    main()
