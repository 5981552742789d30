"""Abaqus .inp parser and VTK writer."""

import numpy as np
import pytest

import pyfem_gpu_testflight_tpu as fem

pytestmark = pytest.mark.quick


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


ARM_INP = "/root/reference/examples/torque_arm/arm.inp"


@pytest.mark.skipif(not __import__("os").path.exists(ARM_INP),
                    reason="reference arm.inp not mounted")
def test_real_torque_arm_inp_parse_solve_vtk(tmp_path):
    """Gate the parser on the reference's shipped mesh asset.

    arm.inp (4,098 lines): *NODE at line 3, unsupported T3D2 line
    elements (must be filtered, parse_inp.py:54-59), CPS3 surface
    elements at line 1586, NSETs ``load``/``fixed`` at lines 4090/4094
    — then solve the plane-stress problem (arm.py:20-61) and export VTK.
    """
    import shutil
    import jax.numpy as jnp

    path = tmp_path / "arm.inp"
    shutil.copy(ARM_INP, path)
    parser = fem.InpParser(str(path))
    conn, X, groups = parser.parse()

    # T3D2 filtered; only the CPS3 surface chunk survives
    assert list(conn) == ["CPS3"]
    assert conn["CPS3"].shape == (2494, 3)
    assert X.shape[0] == 1353  # incl. line-only geometry nodes
    assert set(groups) == {"load", "fixed"}
    assert groups["load"].size == 28 and groups["fixed"].size == 40
    # all node references in-range and 0-based
    assert conn["CPS3"].min() >= 0 and conn["CPS3"].max() < X.shape[0]

    # the reference driver's pipeline: fix group 'fixed', load 'load'
    X2 = X[:, :2]
    tri, n_flipped = fem.fix_orientation(conn["CPS3"], X2)
    dof_fixed = np.concatenate((2 * groups["fixed"], 2 * groups["fixed"] + 1))
    nodal_force = {int(n): [0.0, -1.0] for n in groups["load"]}
    model = fem.LinearElasticity(
        "tri3", X2, tri, dof_fixed, None, nodal_force, dtype=jnp.float64
    )
    u = np.asarray(model.solve(method="direct"))
    assert np.isfinite(u).all()
    # loaded nodes move down, the fixed ring stays put
    assert u[2 * groups["load"] + 1].mean() < 0
    np.testing.assert_array_equal(u[dof_fixed], 0.0)

    parser.to_vtk({"ux": u[0::2], "uy": u[1::2]})
    vtk = tmp_path / "arm.vtk"
    assert vtk.exists() and vtk.stat().st_size > 10000
