"""Shared pieces for the loop-based quad4 oracles.

These oracles are deliberately written in the most pedestrian style
possible — per-element Python loops over 2x2 Gauss points, scipy sparse
assembly, reduced-system solves — so they share no code path with the
framework under test.  They play the role of the reference repo's
independent ``tests/ref_*.py`` implementations.
"""

import numpy as np

GP = np.array([-1.0, 1.0]) / np.sqrt(3.0)
# 2x2 Gauss points, any order (quadrature sums are order-independent)
GAUSS_2D = [(xi, eta) for eta in GP for xi in GP]


def quad4_shape(xi, eta):
    N = 0.25 * np.array(
        [
            (1 - xi) * (1 - eta),
            (1 + xi) * (1 - eta),
            (1 + xi) * (1 + eta),
            (1 - xi) * (1 + eta),
        ]
    )
    dN = 0.25 * np.array(
        [
            [-(1 - eta), -(1 - xi)],
            [(1 - eta), -(1 + xi)],
            [(1 + eta), (1 + xi)],
            [-(1 + eta), (1 - xi)],
        ]
    )
    return N, dN


def jacobian_2d(Xe, dN):
    """J[i, k] = d x_i / d xi_k for one element."""
    J = Xe.T @ dN  # (2, 2)
    detJ = J[0, 0] * J[1, 1] - J[0, 1] * J[1, 0]
    invJ = np.array([[J[1, 1], -J[0, 1]], [-J[1, 0], J[0, 0]]]) / detJ
    return J, detJ, invJ
