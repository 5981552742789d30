"""Element stiffness / mass / sensitivity kernels (einsum reference path).

These are the batched contractions at the heart of assembly — the
TPU-native counterpart of the reference's element einsums
(pyfem.py:1176-1186, 2016-2027, 2126-2136) and of the external A2D C++
kernels (pyfem.py:2180-2283).  A Pallas fast path for the hottest cases
lives in ``ops.pallas_stiffness``; this module is the always-correct
fallback and the source of truth for tests.

Design notes:

* Elasticity avoids materializing B matrices entirely.  For isotropic
  material, B^T C B expands into three Ngrad x Ngrad contractions with
  Lame coefficients (plane stress uses the effective lambda); this is
  algebraically identical to the reference's Voigt/B-matrix form
  (pyfem.py:1975-2027) with ~6x less intermediate memory traffic.
* Everything is dtype-polymorphic; complex densities flow through for
  complex-step verification.
"""

from __future__ import annotations

import jax.numpy as jnp

from .precision import einsum

from . import geometry

__all__ = [
    "lame_params",
    "poisson_stiffness",
    "mass_matrix",
    "elasticity_stiffness",
    "poisson_dv_inner",
    "elasticity_dv_inner",
]


def lame_params(E, nu, ndims):
    """(mu, lam) for 3D isotropic or 2D plane stress.

    Plane stress uses the effective lambda = E nu / (1 - nu^2) so that
    2 mu e + lam tr(e) I reproduces the reference's plane-stress C0
    (pyfem.py:1746-1750); 3D matches pyfem.py:1752-1757.
    """
    mu = E / (2.0 * (1.0 + nu))
    if ndims == 2:
        lam = E * nu / (1.0 - nu**2)
    else:
        lam = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
    return mu, lam


def poisson_stiffness(Xe, dN, wq, kappa_q):
    """Ke[e,n,m] = sum_q kappa_q w_q |J_q| grad(N_n) . grad(N_m).

    Args:
        Xe: (nelems, nn, ndims); dN: (nquads, nn, ndims); wq: (nquads,).
        kappa_q: (nelems, nquads) material at quadrature points.
    """
    detJ, Ngrad = geometry.shape_gradients(Xe, dN)
    c = kappa_q * (detJ * wq[None, :])
    return einsum("eq,eqnl,eqml->enm", c, Ngrad, Ngrad)


def mass_matrix(Xe, dN, N, wq):
    """Consistent mass matrix Me[e,n,m] = sum_q w_q |J_q| N_n N_m."""
    J = geometry.jacobian(Xe, dN)
    detJ, _ = geometry.det_and_inv(J)
    return einsum("eq,qn,qm->enm", detJ * wq[None, :], N, N)


def elasticity_stiffness(Xe, dN, wq, Cq, mu, lam):
    """Isotropic (plane-stress / 3D) element stiffness in Lame form.

    Ke[(n,a),(m,b)] = sum_q c_q [ mu (delta_ab grad N_n . grad N_m
                                      + d_b N_n d_a N_m)
                                  + lam d_a N_n d_b N_m ]
    with c_q = Cq w_q |J_q| (Cq is the RAMP factor).

    Returns:
        (nelems, nn*ndims, nn*ndims) with interleaved dofs (node-major).
    """
    detJ, Ngrad = geometry.shape_gradients(Xe, dN)
    nelems, nq, nn, nd = Ngrad.shape
    c = Cq * (detJ * wq[None, :])
    gg = einsum("eq,eqnl,eqml->enm", c, Ngrad, Ngrad)  # grad.grad
    P = einsum("eq,eqna,eqmb->enamb", c, Ngrad, Ngrad)
    eye = jnp.eye(nd, dtype=P.dtype)
    Ke = (
        mu * (gg[:, :, None, :, None] * eye[None, None, :, None, :])
        + mu * jnp.transpose(P, (0, 1, 4, 3, 2))
        + lam * P
    )
    return Ke.reshape(nelems, nn * nd, nn * nd)


def elasticity_stiffness_quad4_unrolled(Xe, cq, mu, lam, dN, wq):
    """quad4 plane-stress stiffness with fully unrolled elementwise ops.

    Same math as :func:`elasticity_stiffness` but expressed as scalar
    coefficients times (nelems,) vectors — no einsums/contractions.  This
    is the float64-safe path on TPU: f64 einsums go through a
    memory-hungry emulation (observed 8x operand blowup), while plain
    elementwise f64 ops lower fine.  Mirrors the Pallas kernel
    (ops/pallas_stiffness.py) structure.

    Args:
        Xe: (nelems, 4, 2); cq: (nelems, 4) material factor.
        dN/wq: quad4 tables (host numpy).

    Returns:
        (nelems, 8, 8).
    """
    dNl = [[[float(dN[q, n, k]) for k in range(2)] for n in range(4)]
           for q in range(4)]
    wql = [float(w) for w in wq]
    # centroid-centered coordinates
    xs = [Xe[:, n, 0] for n in range(4)]
    ys = [Xe[:, n, 1] for n in range(4)]
    xm = 0.25 * (xs[0] + xs[1] + xs[2] + xs[3])
    ym = 0.25 * (ys[0] + ys[1] + ys[2] + ys[3])
    xs = [x - xm for x in xs]
    ys = [y - ym for y in ys]
    acc = [[None] * 8 for _ in range(8)]
    for q in range(4):
        J = [[None, None], [None, None]]
        for k in range(2):
            J[0][k] = sum(dNl[q][n][k] * xs[n] for n in range(4))
            J[1][k] = sum(dNl[q][n][k] * ys[n] for n in range(4))
        detJ = J[0][0] * J[1][1] - J[0][1] * J[1][0]
        inv_det = 1.0 / detJ
        invJ = [
            [J[1][1] * inv_det, -J[0][1] * inv_det],
            [-J[1][0] * inv_det, J[0][0] * inv_det],
        ]
        G = [
            [
                dNl[q][n][0] * invJ[0][l] + dNl[q][n][1] * invJ[1][l]
                for l in range(2)
            ]
            for n in range(4)
        ]
        c = cq[:, q] * (wql[q] * detJ)
        cmu = mu * c
        clam = lam * c
        # symmetric: compute the upper triangle only (r <= s)
        for n in range(4):
            for m in range(4):
                gg = G[n][0] * G[m][0] + G[n][1] * G[m][1]
                for a in range(2):
                    for b in range(2):
                        r, s = 2 * n + a, 2 * m + b
                        if r > s:
                            continue
                        term = cmu * (G[n][b] * G[m][a]) + clam * (
                            G[n][a] * G[m][b]
                        )
                        if a == b:
                            term = term + cmu * gg
                        acc[r][s] = (
                            term if acc[r][s] is None else acc[r][s] + term
                        )
    for r in range(8):
        for s in range(r):
            acc[r][s] = acc[s][r]
    rows = [jnp.stack(acc[r], axis=-1) for r in range(8)]
    return jnp.stack(rows, axis=-2)


def poisson_dv_inner(Xe, dN, N, wq, dramp_q, phi_e, psi_e):
    """Per-(element, node) inner product for d(phi^T K psi)/d rho.

    Avoids materializing the reference's 4-axis Ke_deriv
    (pyfem.py:1219-1276): contracts phi/psi into gradients first.

    Args:
        dramp_q: (nelems, nquads) RAMP derivative at quads.
        phi_e, psi_e: (nelems, nn) gathered vectors.

    Returns:
        inner: (nelems, nn) — scatter over conn to get nodal gradient.
    """
    detJ, Ngrad = geometry.shape_gradients(Xe, dN)
    gphi = einsum("eqnl,en->eql", Ngrad, phi_e)
    gpsi = einsum("eqnl,en->eql", Ngrad, psi_e)
    a = einsum("eql,eql->eq", gphi, gpsi)
    w = dramp_q * (detJ * wq[None, :]) * a
    return einsum("qo,eq->eo", N, w)


def elasticity_dv_inner(Xe, dN, N, wq, dramp_q, phi_e, psi_e, mu, lam):
    """Elasticity analogue of :func:`poisson_dv_inner`.

    phi_e/psi_e: (nelems, nn, ndims) gathered displacement-like vectors.
    Uses (B phi)^T C0 (B psi) = mu (grad phi : grad psi
    + grad phi : grad psi^T) + lam div(phi) div(psi).
    """
    detJ, Ngrad = geometry.shape_gradients(Xe, dN)
    # displacement gradient g[e,q,a,l] = d phi_a / d x_l
    gphi = einsum("eqnl,ena->eqal", Ngrad, phi_e)
    gpsi = einsum("eqnl,ena->eqal", Ngrad, psi_e)
    t1 = einsum("eqal,eqal->eq", gphi, gpsi)
    t2 = einsum("eqal,eqla->eq", gphi, gpsi)
    divphi = jnp.trace(gphi, axis1=2, axis2=3)
    divpsi = jnp.trace(gpsi, axis1=2, axis2=3)
    s = mu * (t1 + t2) + lam * divphi * divpsi
    w = dramp_q * (detJ * wq[None, :]) * s
    return einsum("qo,eq->eo", N, w)
