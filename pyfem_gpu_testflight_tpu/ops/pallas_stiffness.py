"""Pallas TPU kernels for the element-stiffness hot loop.

This is the in-repo, TPU-native replacement for the reference's external
A2D C++ element-kernel library (pyfem.py:2180-2283): batched quad4
stiffness matrices for Poisson and plane-stress elasticity.

Layout: *elements on lanes*.  Each grid step processes a tile of
``TILE = S * 128`` elements held as (rows, S, 128) vector registers; all
per-element scalars (Jacobian entries, detJ, Ngrad components) are
(S, 128) vectors and the static shape-table coefficients unroll into
scalar-times-vector FMAs on the VPU.  Inputs/outputs are transposed
(field-major, element-minor):

    XeT: (nn * ndims, nelems)   Ke_T: (ndpe * ndpe, nelems)

which also makes downstream structured DIA assembly read contiguous
(ney * nex) planes per (row, col) pair.

The einsum path (ops.stiffness) remains the source of truth; these
kernels are validated against it in tests (interpret mode on CPU, real
on TPU).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..elements import get_element

__all__ = [
    "elasticity_stiffness_quad4",
    "poisson_stiffness_quad4",
    "transpose_xe",
]

_SUBLANES = 8
_LANES = 128


def _quad4_tables():
    et = get_element("quad4")
    # dN[q][n][k], wq[q] as python floats (compile-time constants)
    dN = [[[float(et.shape_grads[q, n, k]) for k in range(2)]
           for n in range(4)] for q in range(4)]
    wq = [float(w) for w in et.quad_wts]
    return dN, wq


def transpose_xe(Xe):
    """(nelems, 4, 2) -> (8, nelems) field-major layout (n*2 + dim rows)."""
    return jnp.transpose(Xe.reshape(Xe.shape[0], 8), (1, 0))


def _center(xe):
    """Subtract the element centroid per coordinate (f32 conditioning —
    same trick as ops.geometry.jacobian; sum_n dN = 0 makes it exact)."""
    out = list(xe)
    for i in range(2):
        mean = 0.25 * (xe[i] + xe[2 + i] + xe[4 + i] + xe[6 + i])
        for n in range(4):
            out[2 * n + i] = xe[2 * n + i] - mean
    return out


def _geometry(xe, q, dN):
    """Per-quad Jacobian/inverse/gradients from the (8, S, 128) tile."""
    # xe rows: n*2 + i (node-major, coordinate-minor)
    J = [[None, None], [None, None]]
    for i in range(2):
        for k in range(2):
            acc = dN[q][0][k] * xe[0 * 2 + i]
            for n in range(1, 4):
                acc = acc + dN[q][n][k] * xe[n * 2 + i]
            J[i][k] = acc
    detJ = J[0][0] * J[1][1] - J[0][1] * J[1][0]
    inv_det = 1.0 / detJ
    # invJ[m][l] = dxi_m/dx_l
    invJ = [
        [J[1][1] * inv_det, -J[0][1] * inv_det],
        [-J[1][0] * inv_det, J[0][0] * inv_det],
    ]
    # Ngrad[n][l] = sum_m dN[q][n][m] invJ[m][l]
    G = [
        [
            dN[q][n][0] * invJ[0][l] + dN[q][n][1] * invJ[1][l]
            for l in range(2)
        ]
        for n in range(4)
    ]
    return detJ, G


def _elasticity_kernel(xe_ref, cq_ref, out_ref, *, dN, wq, mu, lam):
    xe = _center([xe_ref[r] for r in range(8)])  # each (S, 128)
    acc = [[None] * 8 for _ in range(8)]
    for q in range(4):
        detJ, G = _geometry(xe, q, dN)
        c = cq_ref[q] * (wq[q] * detJ)
        cmu = mu * c
        clam = lam * c
        for n in range(4):
            for m in range(4):
                gg = G[n][0] * G[m][0] + G[n][1] * G[m][1]
                for a in range(2):
                    for b in range(2):
                        # mu (delta_ab grad.grad + d_b N_n d_a N_m)
                        #   + lam d_a N_n d_b N_m
                        term = cmu * (G[n][b] * G[m][a]) + clam * (
                            G[n][a] * G[m][b]
                        )
                        if a == b:
                            term = term + cmu * gg
                        r, s = 2 * n + a, 2 * m + b
                        acc[r][s] = (
                            term if acc[r][s] is None else acc[r][s] + term
                        )
    for r in range(8):
        for s in range(8):
            out_ref[8 * r + s] = acc[r][s]


def _poisson_kernel(xe_ref, cq_ref, out_ref, *, dN, wq):
    xe = _center([xe_ref[r] for r in range(8)])
    acc = [[None] * 4 for _ in range(4)]
    for q in range(4):
        detJ, G = _geometry(xe, q, dN)
        c = cq_ref[q] * (wq[q] * detJ)
        for n in range(4):
            for m in range(4):
                term = c * (G[n][0] * G[m][0] + G[n][1] * G[m][1])
                acc[n][m] = term if acc[n][m] is None else acc[n][m] + term
    for n in range(4):
        for m in range(4):
            out_ref[4 * n + m] = acc[n][m]


def _pad_elements_T(arrT, tile, fill_geometry=False):
    """Pad the trailing element axis to a multiple of ``tile``."""
    n = arrT.shape[-1]
    rem = (-n) % tile
    if rem == 0:
        return arrT, n
    if fill_geometry:
        # identity-square ghost elements: nonzero detJ, finite Ke
        ghost = np.zeros((8, rem), dtype=arrT.dtype)
        ghost[0::2] = np.array([[0.0], [1.0], [1.0], [0.0]])  # x coords
        ghost[1::2] = np.array([[0.0], [0.0], [1.0], [1.0]])  # y coords
        pad = jnp.asarray(ghost)
    else:
        pad = jnp.zeros(arrT.shape[:-1] + (rem,), dtype=arrT.dtype)
    return jnp.concatenate([arrT, pad], axis=-1), n


@functools.partial(
    jax.jit, static_argnames=("mu", "lam", "tile", "interpret")
)
def elasticity_stiffness_quad4(XeT, cq, mu, lam, tile=8 * _LANES * _SUBLANES,
                               interpret=False):
    """Plane-stress quad4 element stiffness, Pallas fast path.

    Args:
        XeT: (8, nelems) transposed element coordinates (transpose_xe).
        cq: (4, nelems) material factor (RAMP * rho) at quadrature pts.
        mu/lam: Lame parameters (python floats; plane-stress lambda).

    Returns:
        KeT: (64, nelems) with row r*8+s = Ke[:, r, s].
    """
    dN, wq = _quad4_tables()
    XeT, n = _pad_elements_T(XeT, tile, fill_geometry=True)
    cq, _ = _pad_elements_T(cq, tile)
    npad = XeT.shape[-1]
    S = tile // _LANES
    grid = npad // tile
    kern = functools.partial(_elasticity_kernel, dN=dN, wq=wq,
                             mu=float(mu), lam=float(lam))
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((8, S, _LANES), lambda i: (i * 0, i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, S, _LANES), lambda i: (i * 0, i, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((64, S, _LANES), lambda i: (i * 0, i, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, npad // _LANES, _LANES),
                                       XeT.dtype),
        interpret=interpret,
    )(
        XeT.reshape(8, npad // _LANES, _LANES),
        cq.reshape(4, npad // _LANES, _LANES),
    )
    return out.reshape(64, npad)[:, :n]


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def poisson_stiffness_quad4(XeT, kq, tile=8 * _LANES * _SUBLANES,
                            interpret=False):
    """Poisson quad4 element stiffness, Pallas fast path.

    Returns:
        KeT: (16, nelems) with row n*4+m = Ke[:, n, m].
    """
    dN, wq = _quad4_tables()
    XeT, n = _pad_elements_T(XeT, tile, fill_geometry=True)
    kq, _ = _pad_elements_T(kq, tile)
    npad = XeT.shape[-1]
    S = tile // _LANES
    grid = npad // tile
    kern = functools.partial(_poisson_kernel, dN=dN, wq=wq)
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((8, S, _LANES), lambda i: (i * 0, i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, S, _LANES), lambda i: (i * 0, i, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, S, _LANES), lambda i: (i * 0, i, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, npad // _LANES, _LANES),
                                       XeT.dtype),
        interpret=interpret,
    )(
        XeT.reshape(8, npad // _LANES, _LANES),
        kq.reshape(4, npad // _LANES, _LANES),
    )
    return out.reshape(16, npad)[:, :n]
