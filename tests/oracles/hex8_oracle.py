"""Loop-based hex8 3D oracles (independent truth sources).

Same pedestrian style as the quad4 oracles: per-element Python loops
over 2x2x2 Gauss points, scipy sparse assembly, reduced-system solve.
The trilinear shape-function sign pattern is derived *from the element
geometry* (node position relative to the centroid), so the oracle makes
no assumption about the framework's local node ordering.
"""

import numpy as np
from scipy import sparse
from scipy.sparse.linalg import spsolve

_GP = np.array([-1.0, 1.0]) / np.sqrt(3.0)
GAUSS_3D = [(xi, eta, zeta) for zeta in _GP for eta in _GP for xi in _GP]


def _hex8_signs(Xe):
    """(8, 3) iso-coordinate signs of each node from the geometry."""
    return np.sign(Xe - Xe.mean(axis=0))


def _hex8_grads(signs, xi, eta, zeta):
    """dN/d(xi,eta,zeta) for the trilinear brick, rows = nodes."""
    s = signs
    dN = 0.125 * np.stack(
        [
            s[:, 0] * (1 + s[:, 1] * eta) * (1 + s[:, 2] * zeta),
            (1 + s[:, 0] * xi) * s[:, 1] * (1 + s[:, 2] * zeta),
            (1 + s[:, 0] * xi) * (1 + s[:, 1] * eta) * s[:, 2],
        ],
        axis=1,
    )
    return dN  # (8, 3)


def _elem_grads(Xe, xi, eta, zeta):
    dN = _hex8_grads(_hex8_signs(Xe), xi, eta, zeta)
    J = Xe.T @ dN  # (3, 3), J[i,k] = dx_i/dxi_k
    detJ = np.linalg.det(J)
    G = dN @ np.linalg.inv(J)  # (8, 3) physical gradients
    return G, detJ


def solve_elasticity_3d(conn, X, dof_fixed, nodal_force, E=10.0, nu=0.3):
    """Isotropic 3D elasticity, 3 dofs/node interleaved (x0,y0,z0,x1,...)."""
    conn = np.asarray(conn)
    X = np.asarray(X, dtype=np.float64)
    nnodes, nelems = X.shape[0], conn.shape[0]
    ndof = 3 * nnodes

    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    mu = E / (2 * (1 + nu))
    C = np.zeros((6, 6))
    C[:3, :3] = lam
    C[np.arange(3), np.arange(3)] += 2 * mu
    C[np.arange(3, 6), np.arange(3, 6)] = mu  # Voigt [xx,yy,zz,yz,xz,xy]

    rows, cols, vals = [], [], []
    for e in range(nelems):
        nodes = conn[e]
        Xe = X[nodes]
        ke = np.zeros((24, 24))
        for xi, eta, zeta in GAUSS_3D:
            G, detJ = _elem_grads(Xe, xi, eta, zeta)
            B = np.zeros((6, 24))
            for a in range(8):
                gx, gy, gz = G[a]
                B[0, 3 * a] = gx
                B[1, 3 * a + 1] = gy
                B[2, 3 * a + 2] = gz
                B[3, 3 * a + 1] = gz
                B[3, 3 * a + 2] = gy
                B[4, 3 * a] = gz
                B[4, 3 * a + 2] = gx
                B[5, 3 * a] = gy
                B[5, 3 * a + 1] = gx
            ke += detJ * (B.T @ C @ B)
        edofs = np.array([3 * n + c for n in nodes for c in range(3)])
        for a in range(24):
            for b in range(24):
                rows.append(edofs[a])
                cols.append(edofs[b])
                vals.append(ke[a, b])

    K = sparse.coo_matrix((vals, (rows, cols)), shape=(ndof, ndof)).tocsr()
    f = np.zeros(ndof)
    for node, force in nodal_force.items():
        for c in range(3):
            f[3 * int(node) + c] += force[c]

    free = np.setdiff1d(np.arange(ndof), np.asarray(dof_fixed))
    u = np.zeros(ndof)
    u[free] = spsolve(K[free][:, free].tocsr(), f[free])
    return u


def solve_poisson_3d(conn, X, dof_fixed, gfunc):
    """-Delta u = g on the hex mesh, 1 dof/node."""
    conn = np.asarray(conn)
    X = np.asarray(X, dtype=np.float64)
    nnodes, nelems = X.shape[0], conn.shape[0]

    rows, cols, vals = [], [], []
    f = np.zeros(nnodes)
    for e in range(nelems):
        nodes = conn[e]
        Xe = X[nodes]
        signs = _hex8_signs(Xe)
        ke = np.zeros((8, 8))
        for xi, eta, zeta in GAUSS_3D:
            G, detJ = _elem_grads(Xe, xi, eta, zeta)
            ke += detJ * (G @ G.T)
            N = 0.125 * (
                (1 + signs[:, 0] * xi)
                * (1 + signs[:, 1] * eta)
                * (1 + signs[:, 2] * zeta)
            )
            xq = N @ Xe
            f[nodes] += detJ * gfunc(xq) * N
        for a in range(8):
            for b in range(8):
                rows.append(nodes[a])
                cols.append(nodes[b])
                vals.append(ke[a, b])

    K = sparse.coo_matrix((vals, (rows, cols)), shape=(nnodes, nnodes)).tocsr()
    free = np.setdiff1d(np.arange(nnodes), np.asarray(dof_fixed))
    u = np.zeros(nnodes)
    u[free] = spsolve(K[free][:, free].tocsr(), f[free])
    return u
