"""Loop-based tet10/brick20 Poisson oracles (independent truth sources).

Pedestrian per-element Python loops + scipy assembly/solve, written
directly from the textbook quadratic shape functions.  Node-role
detection is geometric (corner vs midside by distance to corner-pair
midpoints / by iso-coordinate pattern), so the oracles assume nothing
about the framework's local node ordering.

Quadrature matches the discretization under test (the reference's
5-point tet rule, pyfem.py:115-134, and 3x3x3 Gauss for brick20) —
same-mesh discrete solutions are only comparable at equal quadrature.
"""

import numpy as np
from scipy import sparse
from scipy.sparse.linalg import spsolve

# 5-point tet rule (reference normalization: weights sum to 1/6... the
# reference keeps barycentric weights (-4/5, 9/20 x4) against |J|)
_TET5_PTS = np.array(
    [
        [0.25, 0.25, 0.25],
        [0.5, 1 / 6, 1 / 6],
        [1 / 6, 0.5, 1 / 6],
        [1 / 6, 1 / 6, 0.5],
        [1 / 6, 1 / 6, 1 / 6],
    ]
)
_TET5_WTS = np.array([-4.0 / 5.0, 9.0 / 20.0, 9.0 / 20.0, 9.0 / 20.0,
                      9.0 / 20.0])

_G3 = np.array([-np.sqrt(3.0 / 5.0), 0.0, np.sqrt(3.0 / 5.0)])
_W3 = np.array([5.0 / 9.0, 8.0 / 9.0, 5.0 / 9.0])


def _tet10_roles(Xe):
    """Split nodes into 4 corners + midside->corner-pair map."""
    n = Xe.shape[0]
    # corners: the 4 nodes furthest from the centroid of the 10 nodes
    # are not reliable; instead: a node is a midside iff it is the
    # midpoint of two other nodes
    mids = {}
    corners = []
    for i in range(n):
        found = None
        for a in range(n):
            for b in range(a + 1, n):
                if a == i or b == i:
                    continue
                if np.allclose(Xe[i], 0.5 * (Xe[a] + Xe[b]), atol=1e-12):
                    found = (a, b)
                    break
            if found:
                break
        if found:
            mids[i] = found
        else:
            corners.append(i)
    assert len(corners) == 4, corners
    cidx = {c: k for k, c in enumerate(corners)}
    mid_pairs = {i: (cidx[a], cidx[b]) for i, (a, b) in mids.items()}
    return corners, mid_pairs


def _tet10_dN(Xe, L, corners, mid_pairs, gradL):
    """Physical gradients of the 10 quadratic tet shape functions."""
    dN = np.zeros((10, 3))
    for i in range(10):
        if i in mid_pairs:
            a, b = mid_pairs[i]
            dN[i] = 4.0 * (L[a] * gradL[b] + L[b] * gradL[a])
        else:
            c = corners.index(i)
            dN[i] = (4.0 * L[c] - 1.0) * gradL[c]
    return dN


def _tet10_N(L, corners, mid_pairs):
    N = np.zeros(10)
    for i in range(10):
        if i in mid_pairs:
            a, b = mid_pairs[i]
            N[i] = 4.0 * L[a] * L[b]
        else:
            c = corners.index(i)
            N[i] = L[c] * (2.0 * L[c] - 1.0)
    return N


def solve_poisson_tet10(conn, X, dof_fixed, gfunc):
    """-∆u = g with homogeneous Dirichlet BCs on the fixed dofs."""
    conn = np.asarray(conn)
    X = np.asarray(X, np.float64)
    nnodes = X.shape[0]
    rows, cols, vals = [], [], []
    f = np.zeros(nnodes)
    for e in range(conn.shape[0]):
        nodes = conn[e]
        Xe = X[nodes]
        corners, mid_pairs = _tet10_roles(Xe)
        Xc = Xe[corners]  # (4, 3)
        M = np.vstack([Xc.T, np.ones(4)])  # (4,4): [x;1] = M @ L
        Minv = np.linalg.inv(M)  # L = Minv @ [x;1]
        gradL = Minv[:, :3]  # (4, 3) dL_i/dx
        detJ6 = abs(np.linalg.det(M))  # = 6 * volume
        Ke = np.zeros((10, 10))
        fe = np.zeros(10)
        for (pt, w) in zip(_TET5_PTS, _TET5_WTS):
            L = np.array([pt[0], pt[1], pt[2], 1 - pt.sum()])
            dN = _tet10_dN(Xe, L, corners, mid_pairs, gradL)
            N = _tet10_N(L, corners, mid_pairs)
            x = N @ Xe
            Ke += (w * detJ6 / 6.0) * (dN @ dN.T)
            fe += (w * detJ6 / 6.0) * gfunc(x) * N
        for a in range(10):
            f[nodes[a]] += fe[a]
            for b in range(10):
                rows.append(nodes[a])
                cols.append(nodes[b])
                vals.append(Ke[a, b])
    K = sparse.coo_matrix((vals, (rows, cols)),
                          shape=(nnodes, nnodes)).tocsr()
    free = np.setdiff1d(np.unique(conn), np.asarray(dof_fixed))
    u = np.zeros(nnodes)
    u[free] = spsolve(K[np.ix_(free, free)], f[free])
    return u


def _brick20_iso(Xe):
    """(20, 3) iso coordinates in {-1,0,1} from the (uniform) geometry."""
    c = Xe.mean(axis=0)
    h = (Xe.max(axis=0) - Xe.min(axis=0)) / 2.0
    iso = (Xe - c) / h
    iso_r = np.round(iso)
    assert np.allclose(iso, iso_r, atol=1e-10)
    return iso_r


def _brick20_N_dN(iso, xi):
    """Serendipity shape values + iso-gradients at xi = (x, e, z)."""
    N = np.zeros(20)
    dN = np.zeros((20, 3))
    for i in range(20):
        s = iso[i]
        zero = np.isclose(s, 0.0)
        if not zero.any():  # corner
            t = [1 + s[k] * xi[k] for k in range(3)]
            q = s[0] * xi[0] + s[1] * xi[1] + s[2] * xi[2] - 2.0
            N[i] = 0.125 * t[0] * t[1] * t[2] * q
            for k in range(3):
                o1, o2 = [m for m in range(3) if m != k]
                dN[i, k] = 0.125 * t[o1] * t[o2] * (
                    s[k] * q + t[k] * s[k]
                )
        else:  # midside: exactly one zero coordinate
            z = int(np.flatnonzero(zero)[0])
            o1, o2 = [m for m in range(3) if m != z]
            t1, t2 = 1 + s[o1] * xi[o1], 1 + s[o2] * xi[o2]
            N[i] = 0.25 * (1 - xi[z] ** 2) * t1 * t2
            dN[i, z] = 0.25 * (-2.0 * xi[z]) * t1 * t2
            dN[i, o1] = 0.25 * (1 - xi[z] ** 2) * s[o1] * t2
            dN[i, o2] = 0.25 * (1 - xi[z] ** 2) * t1 * s[o2]
    return N, dN


def solve_poisson_brick20(conn, X, dof_fixed, gfunc):
    """-∆u = g on 20-node serendipity bricks, 3x3x3 Gauss."""
    conn = np.asarray(conn)
    X = np.asarray(X, np.float64)
    nnodes = X.shape[0]
    rows, cols, vals = [], [], []
    f = np.zeros(nnodes)
    for e in range(conn.shape[0]):
        nodes = conn[e]
        Xe = X[nodes]
        iso = _brick20_iso(Xe)
        Ke = np.zeros((20, 20))
        fe = np.zeros(20)
        for iz in range(3):
            for iy in range(3):
                for ix in range(3):
                    xi = np.array([_G3[ix], _G3[iy], _G3[iz]])
                    w = _W3[ix] * _W3[iy] * _W3[iz]
                    N, dNi = _brick20_N_dN(iso, xi)
                    J = Xe.T @ dNi  # (3,3)
                    detJ = np.linalg.det(J)
                    G = dNi @ np.linalg.inv(J)
                    x = N @ Xe
                    Ke += w * detJ * (G @ G.T)
                    fe += w * detJ * gfunc(x) * N
        for a in range(20):
            f[nodes[a]] += fe[a]
            for b in range(20):
                rows.append(nodes[a])
                cols.append(nodes[b])
                vals.append(Ke[a, b])
    K = sparse.coo_matrix((vals, (rows, cols)),
                          shape=(nnodes, nnodes)).tocsr()
    # serendipity meshes leave grid nodes unused: solve on used nodes
    free = np.setdiff1d(np.unique(conn), np.asarray(dof_fixed))
    u = np.zeros(nnodes)
    u[free] = spsolve(K[np.ix_(free, free)], f[free])
    return u
