"""Abaqus .inp parser and VTK writer."""

import numpy as np
import pytest

import pyfem_gpu_testflight_tpu as fem


INP_SAMPLE = """*Heading
** a tiny mixed file with comments
*NODE
1, 0.0, 0.0, 0.0
2, 1.0, 0.0, 0.0
3, 1.0, 1.0, 0.0
4, 0.0, 1.0, 0.0
*ELEMENT, type=T3D2
1, 1, 2
*ELEMENT, type=CPS3
1, 1, 2, 3
2, 3, 4, 1
*NSET, nset=fixed
1, 4
*NSET, nset=load
2, 3
"""


def test_inp_parser_roundtrip(tmp_path):
    path = tmp_path / "tiny.inp"
    path.write_text(INP_SAMPLE)
    parser = fem.InpParser(str(path))
    conn, X, groups = parser.parse()
    # unsupported T3D2 filtered out
    assert list(conn) == ["CPS3"]
    np.testing.assert_array_equal(conn["CPS3"], [[0, 1, 2], [2, 3, 0]])
    assert X.shape == (4, 3)
    np.testing.assert_allclose(X[2], [1.0, 1.0, 0.0])
    np.testing.assert_array_equal(groups["fixed"], [0, 3])
    np.testing.assert_array_equal(groups["load"], [1, 2])
    # vtk convenience
    parser.to_vtk({"z": np.zeros(4)})
    assert (tmp_path / "tiny.vtk").exists()


def test_inp_parser_unsorted_and_gap_checked(tmp_path):
    path = tmp_path / "shuffled.inp"
    path.write_text(
        "*NODE\n2, 1.0, 0.0, 0.0\n1, 0.0, 0.0, 0.0\n3, 0.0, 1.0, 0.0\n"
        "*ELEMENT, type=CPS3\n1, 1, 2, 3\n"
    )
    conn, X, groups = fem.InpParser(str(path)).parse()
    np.testing.assert_allclose(X[:, 0], [0.0, 1.0, 0.0])  # sorted by index

    bad = tmp_path / "gap.inp"
    bad.write_text("*NODE\n1, 0, 0, 0\n3, 1, 0, 0\n")
    with pytest.raises(AssertionError):
        fem.InpParser(str(bad)).parse()


def test_vtk_writer_mixed_and_scalars(tmp_path):
    creator = fem.ProblemCreator(nnodes_x=4, nnodes_y=3)
    path = str(tmp_path / "mesh.vtk")
    fem.to_vtk(creator.conn, creator.X, {"u": np.arange(creator.nnodes)},
               path)
    text = open(path).read()
    assert "DATASET UNSTRUCTURED_GRID" in text
    assert f"POINTS {creator.nnodes} double" in text
    assert f"CELL_TYPES {creator.conn.shape[0]}" in text
    assert "SCALARS u float 1" in text
    # quad cells are vtk type 9
    lines = text.splitlines()
    i = lines.index(f"CELL_TYPES {creator.conn.shape[0]}")
    assert all(
        line == "9" for line in lines[i + 1 : i + 1 + creator.conn.shape[0]]
    )


def test_vtk_brick20_downgraded_to_hex(tmp_path):
    creator = fem.ProblemCreator(nnodes_x=3, nnodes_y=3, nnodes_z=3,
                                 element_type="brick20")
    path = str(tmp_path / "b20.vtk")
    fem.to_vtk(creator.conn, creator.X, {}, path)
    text = open(path).read()
    # reference behavior: brick20 written as linear hex (type 12)
    assert "12" in text.splitlines()
