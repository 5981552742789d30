"""Loop-based quad4 Helmholtz-filter oracle (independent truth source)."""

import numpy as np
from scipy import sparse
from scipy.sparse.linalg import factorized

from .quad4_common import GAUSS_2D, quad4_shape, jacobian_2d


class HelmholtzFilterOracle:
    """K = r0^2 * stiffness + mass; R = mass; apply = K^-1 R x."""

    def __init__(self, r0, conn, X):
        conn = np.asarray(conn)
        X = np.asarray(X)
        nnodes = X.shape[0]
        rows, cols, kvals, rvals = [], [], [], []
        for e in range(conn.shape[0]):
            nodes = conn[e]
            Xe = X[nodes]
            ke = np.zeros((4, 4))
            re = np.zeros((4, 4))
            for xi, eta in GAUSS_2D:
                N, dN = quad4_shape(xi, eta)
                _, detJ, invJ = jacobian_2d(Xe, dN)
                B = dN @ invJ
                ke += detJ * (r0**2 * (B @ B.T) + np.outer(N, N))
                re += detJ * np.outer(N, N)
            for a in range(4):
                for b in range(4):
                    rows.append(nodes[a])
                    cols.append(nodes[b])
                    kvals.append(ke[a, b])
                    rvals.append(re[a, b])
        shape = (nnodes, nnodes)
        self.K = sparse.coo_matrix((kvals, (rows, cols)), shape=shape).tocsc()
        self.R = sparse.coo_matrix((rvals, (rows, cols)), shape=shape).tocsr()
        self._solve = factorized(self.K)

    def apply(self, x):
        return self._solve(self.R.dot(np.asarray(x)))

    def apply_gradient(self, gradrho):
        return self.R.T.dot(self._solve(np.asarray(gradrho)))
