"""Sanity checks on the element tables (quadrature + shape functions)."""

import numpy as np
import pytest

from pyfem_gpu_testflight_tpu.elements import ELEMENT_REGISTRY, get_element

pytestmark = pytest.mark.quick


@pytest.mark.parametrize("name", sorted(ELEMENT_REGISTRY))
def test_partition_of_unity(name):
    et = get_element(name)
    np.testing.assert_allclose(et.shape_vals.sum(axis=1), 1.0, atol=1e-13)
    np.testing.assert_allclose(
        et.shape_grads.sum(axis=1), 0.0, atol=1e-12
    )


@pytest.mark.parametrize("name", sorted(ELEMENT_REGISTRY))
def test_nodal_interpolation_of_coordinates(name):
    """sum_n N_n(q) * xi_n == q for isoparametric elements."""
    et = get_element(name)
    if name == "quad4":
        nodes = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], dtype=float)
    elif name == "tri3":
        nodes = np.array([[1, 0], [0, 1], [0, 0]], dtype=float)
    elif name == "hex8":
        from pyfem_gpu_testflight_tpu.elements import _HEX8_SIGNS

        nodes = _HEX8_SIGNS
    elif name == "tet10":
        # corner order in local coords: t = (1-x-y-z, x, y, z) so corners
        # are (0,0,0), (1,0,0), (0,1,0), (0,0,1)
        edges = [(0, 1), (1, 2), (2, 0), (0, 3), (1, 3), (2, 3)]
        corner_xyz = np.array(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=float
        )
        mids = np.array(
            [(corner_xyz[a] + corner_xyz[b]) / 2 for a, b in edges]
        )
        nodes = np.vstack([corner_xyz, mids])
    elif name == "brick20":
        from pyfem_gpu_testflight_tpu.elements import _BRICK20_COORDS

        nodes = _BRICK20_COORDS
    interp = et.shape_vals @ nodes
    np.testing.assert_allclose(interp, et.quad_pts, atol=1e-12)


@pytest.mark.parametrize(
    "name,expected",
    [
        ("quad4", 4.0),  # reference square volume
        ("tri3", 0.5),
        ("hex8", 8.0),
        ("brick20", 8.0),
        ("tet10", 1.0),  # reference-normalized weights: 6x the 1/6 volume
    ],
)
def test_quadrature_weight_sum(name, expected):
    et = get_element(name)
    np.testing.assert_allclose(et.quad_wts.sum(), expected, atol=1e-12)


def test_gradients_match_finite_differences():
    """dN tables agree with central differences of N for each element."""
    h = 1e-6
    for name in ELEMENT_REGISTRY:
        et = get_element(name)
        from pyfem_gpu_testflight_tpu import elements as E

        shape_fn = {
            "quad4": E._quad4_shape,
            "tri3": E._tri3_shape,
            "hex8": E._hex8_shape,
            "tet10": E._tet10_shape,
            "brick20": E._brick20_shape,
        }[name]
        rng = np.random.default_rng(0)
        for _ in range(3):
            pt = rng.uniform(0.1, 0.3, size=et.ndims)
            _, dn = shape_fn(pt)
            for d in range(et.ndims):
                pp = pt.copy()
                pp[d] += h
                pm = pt.copy()
                pm[d] -= h
                np_, _ = shape_fn(pp)
                nm, _ = shape_fn(pm)
                fd = (np.asarray(np_) - np.asarray(nm)) / (2 * h)
                np.testing.assert_allclose(dn[:, d], fd, atol=5e-7)


def test_aliases():
    assert get_element("quad").name == "quad4"
    assert get_element("block").name == "hex8"
    assert get_element("tet").name == "tet10"
    assert get_element("CPS3").name == "tri3"
