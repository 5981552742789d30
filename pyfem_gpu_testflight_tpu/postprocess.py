"""Post-processing: strain/stress recovery, mass matrices, natural
frequencies, KS aggregation + adjoints.

Reference parity (stretch items from SURVEY.md §2.11 — capabilities of
the reference's independent implementations, tests/ref_plane_stress.py
and tests/ref_linear_poisson.py, not of its main library):

* quadrature/nodal strain recovery (ref_plane_stress.py:141-226):
  each node takes the strain of the *nearest* quadrature point of every
  incident element, averaged by incidence count;
* consistent mass matrix + shift-invert natural frequencies
  (ref_plane_stress.py:228-340);
* KS (Kreisselmeier-Steinhauser) max-aggregate of the solution field
  and its adjoint right-hand side (ref_linear_poisson.py:200-290).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import assembly
from .ops import geometry, stiffness
from .ops.precision import einsum

__all__ = [
    "quadrature_strains",
    "nodal_strains",
    "quadrature_stresses",
    "mass_matrix",
    "natural_frequencies",
    "ks_aggregate",
    "ks_adjoint_rhs",
    "solve_adjoint",
]


def _displacement_gradients(model, u):
    """g[e,q,a,l] = d u_a / d x_l at quadrature points."""
    _, Ngrad = geometry.shape_gradients(model.Xe, model.dN)
    nd = model.ndof_per_node
    ue = jnp.take(jnp.asarray(u), model.conn_dof, axis=0).reshape(
        model.nelems, model.nnodes_per_elem, nd
    )
    return einsum("eqnl,ena->eqal", Ngrad, ue)


def quadrature_strains(model, u):
    """Voigt strains at quadrature points.

    Returns:
        (nelems, nquads, 3) for 2D [exx, eyy, gxy] or
        (nelems, nquads, 6) for 3D [exx, eyy, ezz, gxy, gyz, gzx]
        (engineering shear; same component order as the reference's
        B matrix, pyfem.py:1988-2011).
    """
    g = _displacement_gradients(model, u)
    if model.ndims == 2:
        return jnp.stack(
            [g[..., 0, 0], g[..., 1, 1], g[..., 0, 1] + g[..., 1, 0]], axis=-1
        )
    return jnp.stack(
        [
            g[..., 0, 0],
            g[..., 1, 1],
            g[..., 2, 2],
            g[..., 0, 1] + g[..., 1, 0],
            g[..., 1, 2] + g[..., 2, 1],
            g[..., 0, 2] + g[..., 2, 0],
        ],
        axis=-1,
    )


def _nearest_quad_per_node(etype):
    """perm[n] = index of the quadrature point closest to local node n."""
    d = np.linalg.norm(
        etype.node_coords[:, None, :] - etype.quad_pts[None, :, :], axis=-1
    )
    return np.argmin(d, axis=1)


def nodal_strains(model, u):
    """Average nearest-quadrature strains to the nodes.

    Mirrors ref_plane_stress.py:202-226: node value = mean over incident
    elements of the closest quadrature point's strain.
    """
    eq = quadrature_strains(model, u)  # (nelems, nquads, nstr)
    perm = _nearest_quad_per_node(model.etype)
    contrib = eq[:, perm, :]  # (nelems, nn, nstr)
    nstr = contrib.shape[-1]
    conn_flat = model.conn.reshape(-1)
    sums = jax.ops.segment_sum(
        contrib.reshape(-1, nstr), conn_flat, num_segments=model.nnodes
    )
    counts = jax.ops.segment_sum(
        jnp.ones_like(conn_flat, dtype=eq.dtype), conn_flat,
        num_segments=model.nnodes,
    )
    return sums / jnp.maximum(counts, 1.0)[:, None]


def quadrature_stresses(model, u, rho=None):
    """Voigt stresses s = C e (RAMP-scaled if rho given)."""
    from .models.base import ramp

    e = quadrature_strains(model, u)
    mu, lam = model.mu, model.lam
    nd = model.ndims
    tr = e[..., :nd].sum(axis=-1)
    s_norm = 2.0 * mu * e[..., :nd] + lam * tr[..., None]
    s_shear = mu * e[..., nd:]
    s = jnp.concatenate([s_norm, s_shear], axis=-1)
    if rho is not None:
        rho_e = jnp.take(jnp.asarray(rho), model.conn, axis=0)
        rho_q = geometry.interp_to_quads(model.N, rho_e)
        s = s * ramp(rho_q, model.p)[..., None]
    return s


def mass_matrix(model, density=1.0):
    """Consistent element mass matrices (nelems, ndpe, ndpe).

    Scalar fields get N N^T; vector fields the block-diagonal expansion
    (ref_plane_stress.py:228-289).
    """
    Me = density * stiffness.mass_matrix(model.Xe, model.dN, model.N, model.wq)
    nd = model.ndof_per_node
    if nd == 1:
        return Me
    nn = model.nnodes_per_elem
    eye = jnp.eye(nd, dtype=Me.dtype)
    Mb = Me[:, :, None, :, None] * eye[None, None, :, None, :]
    return Mb.reshape(model.nelems, nn * nd, nn * nd)


def natural_frequencies(model, k=5, sigma=0.0, density=1.0, rho=None):
    """Lowest natural frequencies via shift-invert Lanczos on the host.

    Mirrors ref_plane_stress.py:320-340: reduce K and M to free dofs,
    ``eigsh(Kr, M=Mr, sigma=sigma, which='LM')``, return
    (omega, modes) with modes zero at fixed dofs.
    """
    from scipy.sparse import linalg as sla

    K = model.assemble_scipy(model.element_jacobian() if rho is None
                             else model.element_jacobian(rho))
    M = model.assemble_scipy(mass_matrix(model, density))
    free = np.setdiff1d(np.arange(model.ndof), model.bc.fixed)
    Kr = K[free][:, free].tocsc()
    Mr = M[free][:, free].tocsc()
    eigs, vr = sla.eigsh(Kr, M=Mr, k=k, sigma=sigma, which="LM", tol=1e-6)
    modes = np.zeros((model.ndof, k))
    modes[free] = vr
    return np.sqrt(np.maximum(eigs, 0.0)), modes


def lumped_mass(model, density=1.0):
    """(ndof,) row-sum (lumped) mass vector from the consistent mass."""
    Me = mass_matrix(model, density)
    ones = jnp.ones(model.ndof, dtype=Me.dtype)
    return model.matvec(Me, ones)


def natural_frequencies_device(model, k=5, density=1.0, rho=None,
                               maxiter=200, tol=1e-9):
    """Lowest natural frequencies fully on device (matrix-free LOBPCG).

    The TPU-native companion to :func:`natural_frequencies` (which keeps
    the reference's host shift-invert eigsh, ref_plane_stress.py:320-340):
    lumps the consistent mass (row sums), symmetrizes to the standard
    problem A = M^-1/2 K M^-1/2, and runs jax's LOBPCG on the flipped
    spectrum c I - A so the *smallest* modes come out — no factorization,
    only the matrix-free element SpMV.

    Lumped mass is a standard (slightly low-pass) approximation of the
    consistent-mass frequencies; verify against the host path when
    consistent-mass accuracy matters.

    Returns:
        (omega, modes): (k,) frequencies and (ndof, k) M-orthonormal
        modes, zero at fixed dofs.
    """
    from jax.experimental.sparse.linalg import lobpcg_standard

    Ke = model.element_jacobian(1.0 if rho is None else rho)
    ml = lumped_mass(model, density)
    mask = model.bc.mask
    inv_sqrt_m = jnp.where(mask | (ml <= 0), 0.0, 1.0 / jnp.sqrt(ml))

    def A_free(V):  # maps the free subspace to itself (zero at mask)
        W = inv_sqrt_m[:, None] * V
        KW = jax.vmap(lambda v: model.matvec(Ke, v), in_axes=1, out_axes=1)(W)
        return inv_sqrt_m[:, None] * KW

    # spectral upper bound of the free block by power iteration
    v = jnp.where(mask[:, None], 0.0,
                  jnp.ones((model.ndof, 1), ml.dtype))
    v = v / jnp.linalg.norm(v)
    for _ in range(15):
        v = A_free(v)
        v = v / jnp.linalg.norm(v)
    c = 1.2 * jnp.vdot(v[:, 0], A_free(v)[:, 0]).real + 1.0

    # fixed dofs get 2c so they sit *below* every free mode on the
    # flipped spectrum c I - A (a 0 or O(1) value would interleave)
    def A(V):
        return A_free(V) + (2.0 * c) * jnp.where(mask[:, None], V, 0.0)

    rng = np.random.RandomState(0)
    X0 = jnp.asarray(rng.standard_normal((model.ndof, k)), ml.dtype)
    X0 = jnp.where(mask[:, None], 0.0, X0)
    theta, U, _ = lobpcg_standard(lambda V: c * V - A(V), X0, m=maxiter)
    lam = c - theta
    order = jnp.argsort(lam)
    lam = lam[order]
    U = U[:, order]
    modes = jnp.where(mask[:, None], 0.0, inv_sqrt_m[:, None] * U)
    return jnp.sqrt(jnp.maximum(lam, 0.0)), modes


def ks_aggregate(model, u, pval):
    """KS max-aggregate of the scalar field u over the domain.

    ks = max(u) + log( sum_{e,q} w_q |J_q| exp(p (u_q - max)) ) / p
    (ref_linear_poisson.py:200-234).
    """
    u = jnp.asarray(u)
    detJ, _ = geometry.det_and_inv(geometry.jacobian(model.Xe, model.dN))
    uq = geometry.interp_to_quads(model.N, jnp.take(u, model.conn, axis=0))
    offset = jnp.max(u)
    expsum = jnp.sum(detJ * model.wq[None, :] * jnp.exp(pval * (uq - offset)))
    return offset + jnp.log(expsum) / pval


def ks_adjoint_rhs(model, u, pval):
    """d ks / d u_n (ref_linear_poisson.py:237-290)."""
    u = jnp.asarray(u)
    detJ, _ = geometry.det_and_inv(geometry.jacobian(model.Xe, model.dN))
    uq = geometry.interp_to_quads(model.N, jnp.take(u, model.conn, axis=0))
    offset = jnp.max(u)
    w = detJ * model.wq[None, :] * jnp.exp(pval * (uq - offset))
    expsum = jnp.sum(w)
    fe = einsum("eq,qn->en", w / expsum, model.N)
    return assembly.assemble_vector(fe, model.conn, model.nnodes)


def solve_adjoint(model, rhs, rho=1.0, method="cg", rtol=1e-10, **kw):
    """Solve K(rho)^T psi = rhs with homogeneous BCs at fixed dofs.

    K is symmetric for the linear models; the Newton tangent is handled
    by passing the model's current element Jacobian via ``Ke``.
    """
    Ke = kw.pop("Ke", None)
    if Ke is None:
        Ke = model.element_jacobian(rho)
    psi, _ = model._solve_system(Ke, jnp.asarray(rhs), method, rtol)
    return psi
