"""Pallas TPU kernels for hex8 (3D) element stiffness.

The reference's native fast path (the external A2D C++ library,
pyfem.py:2180-2283) supported *hex8 only* (pyfem.py:2260-2264); this is
its in-repo TPU equivalent for general (possibly non-uniform) hex
meshes.  Uniform structured grids should use the cheaper unit-matrix
route (multigrid.GMGAssembler3D elem_path="uniform") instead.

Layout matches ops.pallas_stiffness: elements on lanes, field-major
transposed inputs/outputs

    XeT: (24, nelems)  rows n*3 + i      cq: (8, nelems)
    KeT: (576, nelems) rows r*24 + s = Ke[:, r, s]

Each grid step holds a (rows, 8, 128) tile (1024 elements).  The kernel
body is a ``fori_loop`` over the 8 quadrature points — the shape-table
scalars live in SMEM and are indexed by the loop counter, keeping the
compiled program ~8x smaller than full unrolling (remote TPU compile
time scales with program size).  Symmetry: only the upper triangle of
each 3x3 (node, node) block is computed; mirrored entries are extra
VMEM stores, not FLOPs.
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
    "elasticity_stiffness_hex8",
    "poisson_stiffness_hex8",
    "transpose_xe_hex8",
]

_LANES = 128
_SUBLANES = 8
_TILE = _LANES * _SUBLANES  # 1024 elements per grid step


def transpose_xe_hex8(Xe):
    """(nelems, 8, 3) -> (24, nelems) field-major (rows n*3 + i)."""
    return jnp.transpose(Xe.reshape(Xe.shape[0], 24), (1, 0))


def _hex8_table(dtype):
    """(8, 25) SMEM table: per quad q, 24 dN entries (n*3+k) then w_q."""
    et = get_element("hex8")
    tab = np.zeros((8, 25), dtype=np.dtype(dtype))
    tab[:, :24] = np.asarray(et.shape_grads).reshape(8, 24)
    tab[:, 24] = np.asarray(et.quad_wts)
    return tab


def _center(xe):
    out = list(xe)
    for i in range(3):
        mean = xe[i]
        for n in range(1, 8):
            mean = mean + xe[3 * n + i]
        mean = 0.125 * mean
        for n in range(8):
            out[3 * n + i] = xe[3 * n + i] - mean
    return out


def _quad_geometry(tab_ref, q, xe):
    """Per-quad (w*detJ, G[n][l]) from SMEM scalars + element vectors."""
    dn = [[tab_ref[q, 3 * n + k] for k in range(3)] for n in range(8)]
    w = tab_ref[q, 24]
    J = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for k in range(3):
            acc = dn[0][k] * xe[i]
            for n in range(1, 8):
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
        for n in range(8)
    ]
    return w * detJ, G


def _elasticity_kernel(tab_ref, xe_ref, cq_ref, out_ref, *, mu, lam):
    """Grid = (tiles, 8 nodes): program (i, n) computes the 72 output
    rows Ke[3n+a, :] for its element tile.

    Keeping one node-row block per program holds all 72 accumulators in
    registers across the quadrature ``fori_loop`` (carried, no VMEM
    read-modify-writes — the RMW variant serialized on VMEM op issue),
    and the inner grid axis revisits the same input blocks so Mosaic
    fetches xe/cq once per tile.  The row node's gradient is a dynamic
    (program-id) slice of the stacked per-node gradients.
    """
    n_id = pl.program_id(1)
    xe = _center([xe_ref[r] for r in range(24)])

    def body(q, acc):
        wdet, G = _quad_geometry(tab_ref, q, xe)
        # row node's gradient selected by program id (Mosaic has no
        # dynamic_slice on values: use an 8-way masked sum instead)
        Gn = [
            sum(jnp.where(n_id == n, G[n][l], 0.0) for n in range(8))
            for l in range(3)
        ]
        c = cq_ref[q] * wdet
        cmu = mu * c
        clam = lam * c
        out = []
        idx = 0
        for a in range(3):
            Gna = Gn[a]
            for m in range(8):
                gg = (Gn[0] * G[m][0] + Gn[1] * G[m][1] + Gn[2] * G[m][2])
                for b in range(3):
                    term = cmu * (Gn[b] * G[m][a]) + clam * (Gna * G[m][b])
                    if a == b:
                        term = term + cmu * gg
                    out.append(acc[idx] + term)
                    idx += 1
        return out

    acc = [jnp.zeros(xe[0].shape, xe[0].dtype) for _ in range(72)]
    acc = jax.lax.fori_loop(0, 8, body, acc)
    for r in range(72):
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


def _pad_T(arrT, fill_geometry=False):
    n = arrT.shape[-1]
    rem = (-n) % _TILE
    if rem == 0:
        return arrT, n
    if fill_geometry:
        # unit-cube ghost elements: nonzero detJ, finite Ke
        et = get_element("hex8")
        corners = 0.5 * (1.0 + np.sign(np.asarray(et.quad_pts)))  # (8, 3)
        ghost = np.tile(corners.reshape(24, 1), (1, rem)).astype(arrT.dtype)
        pad = jnp.asarray(ghost)
    else:
        pad = jnp.zeros(arrT.shape[:-1] + (rem,), dtype=arrT.dtype)
    return jnp.concatenate([arrT, pad], axis=-1), n


def _call(kernel, nrows_out, XeT, cq, interpret, row_grid=1):
    """row_grid > 1 splits the output rows over an inner grid axis
    (blocks of nrows_out // row_grid rows); input blocks are revisited
    across it, so Mosaic fetches them once per element tile."""
    dtype = XeT.dtype
    XeT, n = _pad_T(XeT, fill_geometry=True)
    cq, _ = _pad_T(cq)
    npad = XeT.shape[-1]
    S = _SUBLANES
    grid = npad // _TILE
    rows_blk = nrows_out // row_grid
    tab = jnp.asarray(_hex8_table(dtype))
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
            pl.BlockSpec((8, 25), smap, memory_space=pltpu.SMEM),
            pl.BlockSpec((24, S, _LANES), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, S, _LANES), imap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rows_blk, S, _LANES), omap, memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nrows_out, npad // _LANES, _LANES),
                                       dtype),
        interpret=interpret,
    )(tab, XeT.reshape(24, npad // _LANES, _LANES),
      cq.reshape(8, npad // _LANES, _LANES))
    return out.reshape(nrows_out, npad)[:, :n]


@functools.partial(jax.jit, static_argnames=("mu", "lam", "interpret"))
def elasticity_stiffness_hex8(XeT, cq, mu, lam, interpret=False):
    """3D isotropic hex8 element stiffness (A2D role, pyfem.py:2260-2264).

    Args:
        XeT: (24, nelems) transposed coordinates (transpose_xe_hex8).
        cq: (8, nelems) RAMP material factor at quadrature points.
        mu/lam: 3D Lame parameters (python floats).

    Returns:
        KeT: (576, nelems) with row r*24+s = Ke[:, r, s].
    """
    kern = functools.partial(_elasticity_kernel, mu=float(mu),
                             lam=float(lam))
    return _call(kern, 576, XeT, cq, interpret, row_grid=8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def poisson_stiffness_hex8(XeT, kq, interpret=False):
    """hex8 Poisson element stiffness.

    Returns:
        KeT: (64, nelems) with row n*8+m = Ke[:, n, m].
    """
    return _call(_poisson_kernel, 64, XeT, kq, interpret)
