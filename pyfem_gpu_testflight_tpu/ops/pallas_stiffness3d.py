"""Pallas TPU kernels for 3D element stiffness (hex8, tet10, brick20).

The reference's native fast path (the external A2D C++ library,
pyfem.py:2180-2283) supported *hex8 only* (pyfem.py:2260-2264); this is
its in-repo TPU equivalent for general (possibly non-uniform) 3D
meshes, extended to the quadratic tet10/brick20 elements the reference
could only assemble in Python einsums.  Uniform structured grids should
use the cheaper unit-matrix route (multigrid.GMGAssembler3D
elem_path="uniform") instead.

Layout matches ops.pallas_stiffness: elements on lanes, field-major
transposed inputs/outputs (nn = nodes/elem, nq = quad points)

    XeT: (3*nn, nelems)  rows n*3 + i      cq: (nq, nelems)
    KeT: ((3*nn)^2, nelems) rows r*(3*nn) + s = Ke[:, r, s]

Each grid step holds a (rows, 8, 128) tile (1024 elements).  The kernel
body is a ``fori_loop`` over the nq quadrature points — the shape-table
scalars live in SMEM and are indexed by the loop counter, keeping the
compiled program ~nq-times smaller than full unrolling (remote TPU
compile time scales with program size).
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
    "elasticity_stiffness_3d",
    "elasticity_stiffness_hex8",
    "poisson_stiffness_3d",
    "poisson_stiffness_hex8",
    "transpose_xe_3d",
    "transpose_xe_hex8",
]

_LANES = 128
_SUBLANES = 8
_TILE = _LANES * _SUBLANES  # 1024 elements per grid step


def transpose_xe_3d(Xe):
    """(nelems, nn, 3) -> (3*nn, nelems) field-major (rows n*3 + i)."""
    n = Xe.shape[1] * Xe.shape[2]
    return jnp.transpose(Xe.reshape(Xe.shape[0], n), (1, 0))


def transpose_xe_hex8(Xe):
    """(nelems, 8, 3) -> (24, nelems) field-major (rows n*3 + i)."""
    return transpose_xe_3d(Xe)


def _elem_table(etype, dtype):
    """(nq, 3*nn + 1) SMEM table: per quad q, dN entries (n*3+k), w_q."""
    et = get_element(etype)
    nn, nq = et.nnodes, et.nquads
    tab = np.zeros((nq, 3 * nn + 1), dtype=np.dtype(dtype))
    tab[:, : 3 * nn] = np.asarray(et.shape_grads).reshape(nq, 3 * nn)
    tab[:, 3 * nn] = np.asarray(et.quad_wts)
    return tab


def _center(xe, nn=8):
    out = list(xe)
    for i in range(3):
        mean = xe[i]
        for n in range(1, nn):
            mean = mean + xe[3 * n + i]
        mean = (1.0 / nn) * mean
        for n in range(nn):
            out[3 * n + i] = xe[3 * n + i] - mean
    return out


def _quad_geometry(tab_ref, q, xe, nn=8):
    """Per-quad (w*detJ, G[n][l]) from SMEM scalars + element vectors."""
    dn = [[tab_ref[q, 3 * n + k] for k in range(3)] for n in range(nn)]
    w = tab_ref[q, 3 * nn]
    J = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for k in range(3):
            acc = dn[0][k] * xe[i]
            for n in range(1, nn):
                acc = acc + dn[n][k] * xe[3 * n + i]
            J[i][k] = acc
    # adjugate / det (J[i][k] = dx_i/dxi_k; invJ[m][l] = dxi_m/dx_l)
    c00 = J[1][1] * J[2][2] - J[1][2] * J[2][1]
    c01 = J[1][2] * J[2][0] - J[1][0] * J[2][2]
    c02 = J[1][0] * J[2][1] - J[1][1] * J[2][0]
    c10 = J[0][2] * J[2][1] - J[0][1] * J[2][2]
    c11 = J[0][0] * J[2][2] - J[0][2] * J[2][0]
    c12 = J[0][1] * J[2][0] - J[0][0] * J[2][1]
    c20 = J[0][1] * J[1][2] - J[0][2] * J[1][1]
    c21 = J[0][2] * J[1][0] - J[0][0] * J[1][2]
    c22 = J[0][0] * J[1][1] - J[0][1] * J[1][0]
    detJ = J[0][0] * c00 + J[0][1] * c01 + J[0][2] * c02
    inv_det = 1.0 / detJ
    invJ = [
        [c00 * inv_det, c10 * inv_det, c20 * inv_det],
        [c01 * inv_det, c11 * inv_det, c21 * inv_det],
        [c02 * inv_det, c12 * inv_det, c22 * inv_det],
    ]
    G = [
        [
            dn[n][0] * invJ[0][l] + dn[n][1] * invJ[1][l]
            + dn[n][2] * invJ[2][l]
            for l in range(3)
        ]
        for n in range(nn)
    ]
    return w * detJ, G


def _elasticity_kernel(tab_ref, xe_ref, cq_ref, out_ref, *, mu, lam,
                       nn=8, nq=8):
    """Grid = (tiles, nn nodes): program (i, n) computes the 9*nn output
    rows Ke[3n+a, :] for its element tile.

    Keeping one node-row block per program holds all 9*nn accumulators
    in registers across the quadrature ``fori_loop`` (carried, no VMEM
    read-modify-writes — the RMW variant serialized on VMEM op issue),
    and the inner grid axis revisits the same input blocks so Mosaic
    fetches xe/cq once per tile.  The row node's gradient is a dynamic
    (program-id) slice of the stacked per-node gradients.
    """
    n_id = pl.program_id(1)
    xe = _center([xe_ref[r] for r in range(3 * nn)], nn)

    def body(q, acc):
        wdet, G = _quad_geometry(tab_ref, q, xe, nn)
        # row node's gradient selected by program id (Mosaic has no
        # dynamic_slice on values: use an nn-way masked sum instead)
        Gn = [
            sum(jnp.where(n_id == n, G[n][l], 0.0) for n in range(nn))
            for l in range(3)
        ]
        c = cq_ref[q] * wdet
        cmu = mu * c
        clam = lam * c
        out = []
        idx = 0
        for a in range(3):
            Gna = Gn[a]
            for m in range(nn):
                gg = (Gn[0] * G[m][0] + Gn[1] * G[m][1] + Gn[2] * G[m][2])
                for b in range(3):
                    term = cmu * (Gn[b] * G[m][a]) + clam * (Gna * G[m][b])
                    if a == b:
                        term = term + cmu * gg
                    out.append(acc[idx] + term)
                    idx += 1
        return out

    acc = [jnp.zeros(xe[0].shape, xe[0].dtype) for _ in range(9 * nn)]
    acc = jax.lax.fori_loop(0, nq, body, acc)
    for r in range(9 * nn):
        out_ref[r] = acc[r]


def _poisson_row_kernel(tab_ref, xe_ref, cq_ref, out_ref, *, nn, nq):
    """Quadratic-element Poisson: program (i, n) computes rows
    Ke[n, :] (nn accumulators) — the nn^2 single-program variant
    would spill registers at nn = 20."""
    n_id = pl.program_id(1)
    xe = _center([xe_ref[r] for r in range(3 * nn)], nn)

    def body(q, acc):
        wdet, G = _quad_geometry(tab_ref, q, xe, nn)
        Gn = [
            sum(jnp.where(n_id == n, G[n][l], 0.0) for n in range(nn))
            for l in range(3)
        ]
        c = cq_ref[q] * wdet
        return [
            acc[m] + c * (Gn[0] * G[m][0] + Gn[1] * G[m][1]
                          + Gn[2] * G[m][2])
            for m in range(nn)
        ]

    acc = [jnp.zeros(xe[0].shape, xe[0].dtype) for _ in range(nn)]
    acc = jax.lax.fori_loop(0, nq, body, acc)
    for r in range(nn):
        out_ref[r] = acc[r]


def _poisson_kernel(tab_ref, xe_ref, cq_ref, out_ref):
    xe = _center([xe_ref[r] for r in range(24)])

    def body(q, acc):
        wdet, G = _quad_geometry(tab_ref, q, xe)
        c = cq_ref[q] * wdet
        out = list(acc)
        for n in range(8):
            for m in range(n, 8):
                term = c * (G[n][0] * G[m][0] + G[n][1] * G[m][1]
                            + G[n][2] * G[m][2])
                out[8 * n + m] = out[8 * n + m] + term
                if n != m:
                    out[8 * m + n] = out[8 * m + n] + term
        return out

    acc = [jnp.zeros(xe[0].shape, xe[0].dtype) for _ in range(64)]
    acc = jax.lax.fori_loop(0, 8, body, acc)
    for r in range(64):
        out_ref[r] = acc[r]


def _pad_T(arrT, etype=None):
    n = arrT.shape[-1]
    rem = (-n) % _TILE
    if rem == 0:
        return arrT, n
    if etype is not None:
        # reference-element ghost coordinates: nonzero detJ, finite Ke
        coords = np.asarray(get_element(etype).node_coords)  # (nn, 3)
        ghost = np.tile(coords.reshape(-1, 1), (1, rem)).astype(arrT.dtype)
        pad = jnp.asarray(ghost)
    else:
        pad = jnp.zeros(arrT.shape[:-1] + (rem,), dtype=arrT.dtype)
    return jnp.concatenate([arrT, pad], axis=-1), n


def _call(kernel, nrows_out, XeT, cq, interpret, row_grid=1,
          etype="hex8"):
    """row_grid > 1 splits the output rows over an inner grid axis
    (blocks of nrows_out // row_grid rows); input blocks are revisited
    across it, so Mosaic fetches them once per element tile."""
    dtype = XeT.dtype
    XeT, n = _pad_T(XeT, etype=etype)
    cq, _ = _pad_T(cq)
    npad = XeT.shape[-1]
    S = _SUBLANES
    grid = npad // _TILE
    rows_blk = nrows_out // row_grid
    tab_np = _elem_table(etype, dtype)
    nq, tcols = tab_np.shape
    nxrows = XeT.shape[0]
    tab = jnp.asarray(tab_np)
    if row_grid == 1:
        gridspec = (grid,)
        imap = lambda i: (i * 0, i, i * 0)
        smap = lambda i: (i * 0, i * 0)
        omap = lambda i: (i * 0, i, i * 0)
    else:
        gridspec = (grid, row_grid)
        imap = lambda i, r: (i * 0, i, i * 0)
        smap = lambda i, r: (i * 0, i * 0)
        omap = lambda i, r: (r, i, i * 0)
    out = pl.pallas_call(
        kernel,
        grid=gridspec,
        in_specs=[
            pl.BlockSpec((nq, tcols), smap, memory_space=pltpu.SMEM),
            pl.BlockSpec((nxrows, S, _LANES), imap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, S, _LANES), imap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rows_blk, S, _LANES), omap, memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nrows_out, npad // _LANES, _LANES),
                                       dtype),
        interpret=interpret,
    )(tab, XeT.reshape(nxrows, npad // _LANES, _LANES),
      cq.reshape(nq, npad // _LANES, _LANES))
    return out.reshape(nrows_out, npad)[:, :n]


@functools.partial(
    jax.jit, static_argnames=("mu", "lam", "etype", "interpret")
)
def elasticity_stiffness_3d(XeT, cq, mu, lam, etype="hex8",
                            interpret=False):
    """3D isotropic element stiffness for hex8 / tet10 / brick20.

    The A2D role (pyfem.py:2260-2264, hex8-only there) extended to the
    quadratic elements the reference assembled in Python einsums only.

    Args:
        XeT: (3*nn, nelems) transposed coordinates (transpose_xe_3d).
        cq: (nq, nelems) RAMP material factor at quadrature points.
        mu/lam: 3D Lame parameters (python floats).
        etype: "hex8" | "tet10" | "brick20".

    Returns:
        KeT: ((3*nn)^2, nelems) with row r*(3*nn) + s = Ke[:, r, s].
    """
    et = get_element(etype)
    nn, nq = et.nnodes, et.nquads
    kern = functools.partial(_elasticity_kernel, mu=float(mu),
                             lam=float(lam), nn=nn, nq=nq)
    return _call(kern, (3 * nn) ** 2, XeT, cq, interpret, row_grid=nn,
                 etype=etype)


def elasticity_stiffness_hex8(XeT, cq, mu, lam, interpret=False):
    """hex8 form of :func:`elasticity_stiffness_3d` (A2D parity role).

    Returns:
        KeT: (576, nelems) with row r*24+s = Ke[:, r, s].
    """
    return elasticity_stiffness_3d(XeT, cq, mu, lam, etype="hex8",
                                   interpret=interpret)


@functools.partial(jax.jit, static_argnames=("etype", "interpret"))
def poisson_stiffness_3d(XeT, kq, etype="hex8", interpret=False):
    """3D Poisson element stiffness for hex8 / tet10 / brick20.

    Returns:
        KeT: (nn*nn, nelems) with row n*nn+m = Ke[:, n, m].
    """
    et = get_element(etype)
    nn, nq = et.nnodes, et.nquads
    if etype == "hex8":
        # single-program symmetric upper-triangle form (64 accumulators)
        return _call(_poisson_kernel, 64, XeT, kq, interpret,
                     etype="hex8")
    kern = functools.partial(_poisson_row_kernel, nn=nn, nq=nq)
    return _call(kern, nn * nn, XeT, kq, interpret, row_grid=nn,
                 etype=etype)


def poisson_stiffness_hex8(XeT, kq, interpret=False):
    """hex8 Poisson element stiffness.

    Returns:
        KeT: (64, nelems) with row n*8+m = Ke[:, n, m].
    """
    return poisson_stiffness_3d(XeT, kq, etype="hex8",
                                interpret=interpret)
