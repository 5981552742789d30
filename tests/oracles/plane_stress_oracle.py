"""Loop-based quad4 plane-stress oracle (independent truth source)."""

import numpy as np
from scipy import sparse
from scipy.sparse.linalg import spsolve

from .quad4_common import GAUSS_2D, quad4_shape, jacobian_2d


def solve_plane_stress(conn, X, dof_fixed, nodal_force, E=10.0, nu=0.3):
    """Classic B^T C B assembly with 2 dofs/node interleaved (x0,y0,x1,...)."""
    conn = np.asarray(conn)
    X = np.asarray(X)
    nnodes = X.shape[0]
    nelems = conn.shape[0]
    ndof = 2 * nnodes

    C = (E / (1 - nu**2)) * np.array(
        [[1.0, nu, 0.0], [nu, 1.0, 0.0], [0.0, 0.0, 0.5 * (1 - nu)]]
    )

    rows, cols, vals = [], [], []
    for e in range(nelems):
        nodes = conn[e]
        Xe = X[nodes]
        ke = np.zeros((8, 8))
        for xi, eta in GAUSS_2D:
            _, dN = quad4_shape(xi, eta)
            _, detJ, invJ = jacobian_2d(Xe, dN)
            G = dN @ invJ  # (4, 2)
            B = np.zeros((3, 8))
            for a in range(4):
                B[0, 2 * a] = G[a, 0]
                B[1, 2 * a + 1] = G[a, 1]
                B[2, 2 * a] = G[a, 1]
                B[2, 2 * a + 1] = G[a, 0]
            ke += detJ * (B.T @ C @ B)
        edofs = np.array([2 * n + c for n in nodes for c in range(2)])
        for a in range(8):
            for b in range(8):
                rows.append(edofs[a])
                cols.append(edofs[b])
                vals.append(ke[a, b])

    K = sparse.coo_matrix((vals, (rows, cols)), shape=(ndof, ndof)).tocsr()
    f = np.zeros(ndof)
    for node, force in nodal_force.items():
        f[2 * int(node)] += force[0]
        f[2 * int(node) + 1] += force[1]

    free = np.setdiff1d(np.arange(ndof), np.asarray(dof_fixed))
    u = np.zeros(ndof)
    u[free] = spsolve(K[free][:, free].tocsr(), f[free])
    return u
