"""Batched isoparametric geometry kernels (pure ``jax.numpy``).

Every function is shaped ``(nelems, ...)`` over the leading element axis
and is jit/vmap/shard_map friendly: static shapes, closed-form 2x2/3x3
inverses (no ``linalg.inv``), dtype-polymorphic (float32/float64/complex).

Reference behavior reproduced: utils.py:154-264 of the reference
(scatter_node_to_elem, compute_jtrans, compute_jdet, compute_elem_interp,
compute_basis_grad), re-expressed as functional einsums.
"""

from __future__ import annotations

import jax.numpy as jnp

from .precision import einsum

__all__ = [
    "gather_to_elements",
    "jacobian",
    "det_and_inv",
    "shape_gradients",
    "interp_to_quads",
    "quad_weights_times_detj",
]


def gather_to_elements(data, conn):
    """Gather nodal data to elements: ``data_e[e, n, ...] = data[conn[e, n], ...]``.

    Args:
        data: (nnodes,) or (nnodes, k) nodal array.
        conn: (nelems, nnodes_per_elem) int connectivity.
    """
    return jnp.take(data, conn, axis=0)


def jacobian(Xe, dN):
    """Isoparametric Jacobian J[e,q,i,k] = dx_i/dxi_k.

    Args:
        Xe: (nelems, nnodes_per_elem, ndims) element nodal coordinates.
        dN: (nquads, nnodes_per_elem, ndims) local shape derivatives.

    Returns:
        J: (nelems, nquads, ndims, ndims).
    """
    # Center on the element centroid: sum_n dN[q,n,k] == 0 makes this a
    # no-op analytically, but it removes the catastrophic cancellation of
    # near-equal coordinates in float32 (element size << domain size).
    Xc = Xe - jnp.mean(Xe, axis=1, keepdims=True)
    return einsum("qnk,eni->eqik", dN, Xc)


def det_and_inv(J):
    """Closed-form determinant and inverse of batched 2x2 / 3x3 matrices.

    Mirrors the adjugate formulas of the reference (utils.py:244-260) so
    that results agree bit-for-bit in float64; avoids ``linalg.inv`` which
    lowers poorly for tiny batched systems on TPU.

    Args:
        J: (..., d, d) with d in {2, 3}.

    Returns:
        (det, inv): (...,) and (..., d, d).
    """
    d = J.shape[-1]
    if d == 2:
        det = J[..., 0, 0] * J[..., 1, 1] - J[..., 0, 1] * J[..., 1, 0]
        inv = jnp.stack(
            [
                jnp.stack([J[..., 1, 1], -J[..., 0, 1]], axis=-1),
                jnp.stack([-J[..., 1, 0], J[..., 0, 0]], axis=-1),
            ],
            axis=-2,
        ) / det[..., None, None]
        return det, inv
    if d == 3:
        a, b, c = J[..., 0, 0], J[..., 0, 1], J[..., 0, 2]
        p, q, r = J[..., 1, 0], J[..., 1, 1], J[..., 1, 2]
        u, v, w = J[..., 2, 0], J[..., 2, 1], J[..., 2, 2]
        c00 = q * w - r * v
        c01 = -(p * w - r * u)
        c02 = p * v - q * u
        det = a * c00 + b * c01 + c * c02
        adj = jnp.stack(
            [
                jnp.stack([c00, -(b * w - c * v), b * r - c * q], axis=-1),
                jnp.stack([c01, a * w - c * u, -(a * r - c * p)], axis=-1),
                jnp.stack([c02, -(a * v - b * u), a * q - b * p], axis=-1),
            ],
            axis=-2,
        )
        return det, adj / det[..., None, None]
    raise ValueError(f"det_and_inv supports 2x2/3x3 only, got {d}x{d}")


def shape_gradients(Xe, dN):
    """Physical-space shape gradients and |J| per quadrature point.

    Returns:
        (detJ, Ngrad): (nelems, nquads) and (nelems, nquads, nn, ndims)
        with Ngrad[e,q,n,i] = dN_n/dx_i.
    """
    J = jacobian(Xe, dN)
    detJ, invJ = det_and_inv(J)
    # dN/dx_i = sum_m dN/dxi_m * dxi_m/dx_i;  invJ[m, i] = dxi_m/dx_i
    Ngrad = einsum("qnm,eqmi->eqni", dN, invJ)
    return detJ, Ngrad


def interp_to_quads(N, data_e):
    """Interpolate element nodal data to quadrature points.

    Args:
        N: (nquads, nnodes_per_elem) shape values.
        data_e: (nelems, nnodes_per_elem) or (nelems, nnodes_per_elem, k).

    Returns:
        (nelems, nquads[, k]).
    """
    if data_e.ndim == 2:
        return einsum("qn,en->eq", N, data_e)
    return einsum("qn,enk->eqk", N, data_e)


def quad_weights_times_detj(detJ, wq):
    """Integration measure w_q |J_q| per (element, quad)."""
    return detJ * wq[None, :]
