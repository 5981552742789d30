"""Loop-based quad4 nonlinear Poisson oracle (independent truth source).

Solves -div( h(x)(1 + u^2) grad u ) = g by Newton on the reduced system,
with the same manufactured g and Bernstein h as the model under test.
"""

import numpy as np
from scipy import sparse
from scipy import special
from scipy.sparse.linalg import spsolve

from .quad4_common import GAUSS_2D, quad4_shape, jacobian_2d


def gfun(x, y):
    return 1e4 * x * (1 - x) * (1 - 2 * x) * y * (1 - y) * (1 - 2 * y)


def hfun(xdv, x, y):
    h = 1.0
    n = len(xdv)
    for k in range(n):
        coef = special.binom(n - 1, k)
        h += xdv[k] * coef * (1 - x) ** (n - 1 - k) * x**k * 4 * y * (1 - y)
    return h


class NonlinearPoissonOracle:
    def __init__(self, conn, X, fixed_nodes):
        self.conn = np.asarray(conn)
        self.X = np.asarray(X)
        self.nnodes = self.X.shape[0]
        self.free = np.setdiff1d(np.arange(self.nnodes), np.asarray(fixed_nodes))

    def _residual_and_jacobian(self, xdv, u, want_jac=True):
        res = np.zeros(self.nnodes)
        rows, cols, vals = [], [], []
        for e in range(self.conn.shape[0]):
            nodes = self.conn[e]
            Xe = self.X[nodes]
            ue = u[nodes]
            for xi, eta in GAUSS_2D:
                N, dN = quad4_shape(xi, eta)
                _, detJ, invJ = jacobian_2d(Xe, dN)
                B = dN @ invJ  # (4, 2)
                xq, yq = N @ Xe
                uq = N @ ue
                gradu = B.T @ ue  # (2,)
                h = hfun(xdv, xq, yq)
                g = gfun(xq, yq)
                coef = h * (1 + uq**2)
                res[nodes] += detJ * (coef * (B @ gradu) - g * N)
                if want_jac:
                    ke = detJ * (
                        coef * (B @ B.T)
                        + 2 * h * uq * np.outer(B @ gradu, N)
                    )
                    for a in range(4):
                        for b in range(4):
                            rows.append(nodes[a])
                            cols.append(nodes[b])
                            vals.append(ke[a, b])
        K = None
        if want_jac:
            K = sparse.coo_matrix(
                (vals, (rows, cols)), shape=(self.nnodes, self.nnodes)
            ).tocsr()
        return res, K

    def solve(self, xdv, tol=1e-10, atol=1e-12, max_iter=10):
        u = np.zeros(self.nnodes)
        res_norm_init = None
        for k in range(max_iter):
            res, K = self._residual_and_jacobian(xdv, u)
            r = res[self.free]
            res_norm = np.linalg.norm(r)
            if k == 0:
                res_norm_init = res_norm
            elif res_norm < tol * res_norm_init or res_norm < atol:
                break
            du = spsolve(K[self.free][:, self.free].tocsr(), r)
            u[self.free] -= du
        return u
