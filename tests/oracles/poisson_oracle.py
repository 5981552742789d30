"""Loop-based quad4 linear Poisson oracle (independent truth source)."""

import numpy as np
from scipy import sparse
from scipy.sparse.linalg import spsolve

from .quad4_common import GAUSS_2D, quad4_shape, jacobian_2d


def solve_poisson(conn, X, fixed_nodes, gfunc):
    """Solve -Delta u = g with u = 0 on fixed nodes; returns u."""
    conn = np.asarray(conn)
    X = np.asarray(X)
    nnodes = X.shape[0]
    nelems = conn.shape[0]

    rows, cols, vals = [], [], []
    f = np.zeros(nnodes)
    for e in range(nelems):
        nodes = conn[e]
        Xe = X[nodes]
        ke = np.zeros((4, 4))
        fe = np.zeros(4)
        for xi, eta in GAUSS_2D:
            N, dN = quad4_shape(xi, eta)
            _, detJ, invJ = jacobian_2d(Xe, dN)
            B = dN @ invJ  # (4, 2): dN/dx
            ke += detJ * (B @ B.T)
            xq = N @ Xe
            fe += detJ * gfunc(xq[None, :])[0] * N
        for a in range(4):
            f[nodes[a]] += fe[a]
            for b in range(4):
                rows.append(nodes[a])
                cols.append(nodes[b])
                vals.append(ke[a, b])

    K = sparse.coo_matrix((vals, (rows, cols)), shape=(nnodes, nnodes)).tocsr()
    free = np.setdiff1d(np.arange(nnodes), np.asarray(fixed_nodes))
    u = np.zeros(nnodes)
    u[free] = spsolve(K[free][:, free].tocsr(), f[free])
    return u
