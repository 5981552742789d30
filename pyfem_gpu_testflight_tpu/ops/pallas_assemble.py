"""Fused Pallas uniform-geometry assembly for the 2D GMG hierarchy.

One kernel pass turns a nodal density grid directly into the *packed,
BC-eliminated* stencil coefficient planes plus the packed inverse
diagonal consumed by ``ops.pallas_smooth`` — fusing what the XLA route
does in five stages (material interpolation, RAMP, unit-matrix
weighted sums, ``Stencil2D.bc_eliminate``, packing).  The kernel is
output-bound: it writes the 36 coefficient planes once and reads only
the (tiny) density and mask planes, so it runs at the HBM write
roofline instead of the measured ~13 ms XLA assembly at 1M dof.

Mathematics (uniform grids only, the creator's meshes): every element
has identical geometry, so

    Ke[e] = sum_q Cq[e, q] * Kq[q],     Cq = RAMP(N @ rho_nodes)

with Kq the per-quadrature unit element matrices
(``GMGAssembler.unit_matrices``).  Each packed coefficient plane
k = (ca, cb, dy, dx) at node (iy, ix) is then

    coeff[k][iy, ix] = rowm * colm * sum_{ay, ax, q}
        W[k, ay ax, q] * Cq[q][iy - ay, ix - ax]  +  diag-fix

where W folds Kq through the stencil plan (host-precomputed), and
rowm/colm implement the symmetric Dirichlet elimination
(pyfem.py:780-835) with a unit diagonal at fixed dofs.

Layouts: outputs match ``pallas_smooth.pack_coeff2d``/``pack_field2d``
(logical (iy, ix) at physical (iy+8, ix+1), rows = ny_pad + 16);
density/mask inputs use an assembly-specific padding (logical row at
physical +24) so every DMA window stays 8-row aligned and in bounds.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_smooth import _geom, _PADY

__all__ = [
    "pack_assembly_field",
    "assembly_weights",
    "assemble_pack_2d",
]

_TY = 8  # assembly row-tile (output-bound kernel; small tiles are fine)
_APAD = 24  # top padding of assembly-layout inputs


def pack_assembly_field(u, ny_pad, nxp, dtype=None):
    """(ny, nx) nodal grid -> (ny_pad + 48, nxp) assembly layout."""
    ny, nx = u.shape
    out = jnp.zeros((ny_pad + 48, nxp), dtype or u.dtype)
    return out.at[_APAD : _APAD + ny, 1 : 1 + nx].set(u)


def assembly_weights(plan, Kq, nd, nq):
    """Host: fold unit matrices through the stencil plan.

    Returns W (nd*nd*9, 4, nq): W[k, ay*2+ax, q] is the weight of
    Cq[q] at element offset (ay, ax) in plane k.
    """
    from .stencil import _QUAD4_LOCAL

    Kq = np.asarray(Kq, np.float64)
    W = np.zeros((nd * nd * 9, 4, nq))
    for (ca, cb, dy, dx, ay, ax, r, s) in plan:
        k = (ca * nd + cb) * 9 + dy * 3 + dx
        W[k, ay * 2 + ax, :] += Kq[:, r, s]
    return W


def _kernel(rref, mref, cout, dout, r_s, m_s, sems, *, nd, nxp, W36, N,
            p, n_tiles, ney, nex):
    TY = _TY
    i = pl.program_id(0)

    def copies(slot, t):
        return [
            pltpu.make_async_copy(
                rref.at[pl.ds(t * TY + 8, TY + 16), :], r_s.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                mref.at[:, pl.ds(t * TY + 8, TY + 16), :], m_s.at[slot],
                sems.at[slot, 1],
            ),
        ]

    @pl.when(i == 0)
    def _():
        for cp in copies(0, 0):
            cp.start()

    @pl.when(i + 1 < n_tiles)
    def _():
        for cp in copies((i + 1) % 2, i + 1):
            cp.start()

    slot = i % 2
    for cp in copies(slot, i):
        cp.wait()

    nq = N.shape[0]
    XI = nxp - 2
    local = ((0, 0), (0, 1), (1, 1), (1, 0))  # _QUAD4_LOCAL

    # element-validity mask: a boundary-phantom element (row ny-1 /
    # col nx-1) still touches one real node, so its interpolated
    # material is nonzero — zero it explicitly. Window row r is
    # element row ey = i*TY - 9 + r; window col c is ex = c - 1.
    ey = (
        jax.lax.broadcasted_iota(jnp.int32, (TY + 2, nxp - 1), 0)
        + i * TY
        - 9
    )
    ex = jax.lax.broadcasted_iota(jnp.int32, (TY + 2, nxp - 1), 1) - 1
    evalid = (
        (ey >= 0) & (ey < ney) & (ex >= 0) & (ex < nex)
    ).astype(r_s.dtype)

    # material factor at quad points on the (TY+2)-row element window
    Cq = []
    for q in range(nq):
        acc = None
        for n, (ndy, ndx) in enumerate(local):
            t = float(N[q, n]) * r_s[
                slot, 7 + ndy : 7 + ndy + TY + 2, ndx : ndx + nxp - 1
            ]
            acc = t if acc is None else acc + t
        Cq.append(evalid * acc / (1.0 + p * (1.0 - acc)))

    rowm = [m_s[slot, c, 8 : 8 + TY, 1 : 1 + XI] for c in range(nd)]
    diags = [None] * nd
    zrow = jnp.zeros((TY, nxp), r_s.dtype)
    for ca in range(nd):
        for cb in range(nd):
            for dy in range(3):
                colm = m_s[slot, cb, 7 + dy : 7 + dy + TY, :]
                for dx in range(3):
                    k = (ca * nd + cb) * 9 + dy * 3 + dx
                    acc = None
                    for ayax in range(4):
                        ay, ax = divmod(ayax, 2)
                        w = W36[k, ayax]
                        if not np.any(w):
                            continue
                        for q in range(nq):
                            if w[q] == 0.0:
                                continue
                            t = float(w[q]) * Cq[q][
                                1 - ay : 1 - ay + TY,
                                1 - ax : 1 - ax + XI,
                            ]
                            acc = t if acc is None else acc + t
                    if acc is None:
                        plane = jnp.zeros((TY, XI), r_s.dtype)
                    else:
                        plane = acc * rowm[ca] * colm[:, dx : dx + XI]
                    if ca == cb and dy == 1 and dx == 1:
                        plane = plane + (1.0 - rowm[ca])
                        diags[ca] = plane
                    cout[k] = zrow
                    cout[k, :, 1 : 1 + XI] = plane
    for c in range(nd):
        d = diags[c]
        dout[c] = zrow
        dout[c, :, 1 : 1 + XI] = rowm[c] / jnp.where(d == 0.0, 1.0, d)


def assemble_pack_2d(rho_a, maskf_a, W36, N, *, nd, p, ny, nx, ty=32,
                     interpret=False):
    """Density grid -> packed eliminated coefficients + inverse diagonal.

    Traceable (call under the enclosing solve's jit); W36/N are *static*
    host numpy tables baked into the kernel as scalar constants.

    Args:
        rho_a: (ny_pad + 48, nxp) assembly-packed nodal density.
        maskf_a: (nd, ny_pad + 48, nxp) assembly-packed free-dof mask
            (1.0 free / 0.0 fixed or padding).
        W36: host-precomputed ``assembly_weights`` (numpy).
        N: (nq, 4) shape values at quad points (numpy).
        nd, p, ny, nx: physics/grid statics; ty: the *smoother* tile
            (fixes ny_pad so layouts agree).

    Returns:
        (coeff_k, invd_k): (nd*nd*9, ny_pad+16, nxp) and
        (nd, ny_pad+16, nxp), ``pallas_smooth`` layouts.
    """
    W36 = np.asarray(W36)
    N = np.asarray(N)
    ny_pad, nxp = _geom(ny, nx, ty)
    R = ny_pad + 2 * _PADY
    n_tiles = R // _TY
    nk = nd * nd * 9
    dt = rho_a.dtype

    kern = functools.partial(
        _kernel, nd=nd, nxp=nxp, W36=W36, N=N, p=float(p),
        n_tiles=n_tiles, ney=ny - 1, nex=nx - 1,
    )
    blk = lambda d0: pl.BlockSpec(
        (d0, _TY, nxp), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    scratch_bytes = 2 * (1 + nd) * (_TY + 16) * nxp * np.dtype(dt).itemsize
    out_bytes = 2 * (nk + nd) * _TY * nxp * np.dtype(dt).itemsize
    with jax.enable_x64(False):
        coeff_k, invd_k = pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=(blk(nk), blk(nd)),
            out_shape=(
                jax.ShapeDtypeStruct((nk, R, nxp), dt),
                jax.ShapeDtypeStruct((nd, R, nxp), dt),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, _TY + 16, nxp), dt),
                pltpu.VMEM((2, nd, _TY + 16, nxp), dt),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            # generous cap: Mosaic also stacks the unrolled FMA
            # temporaries (Cq windows, per-plane accumulators)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(
                    100 * 1024 * 1024,
                    4 * (scratch_bytes + out_bytes) + (1 << 24),
                )
            ),
            interpret=interpret,
        )(rho_a, maskf_a)
    return coeff_k, invd_k
