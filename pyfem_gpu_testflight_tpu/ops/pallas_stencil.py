"""Pallas TPU kernel for the 2D stencil SpMV (multigrid's inner loop).

The XLA version of ``ops.stencil.Stencil2D.matvec`` issues 36 shifted
2D slice-multiplies whose unaligned lane accesses cap effective
bandwidth.  This kernel tiles the grid by row blocks, DMAs the (TY+2)
-row halo window of the padded field into VMEM once, and accumulates the
9-point x component-pair stencil entirely on-chip; coefficient planes
stream through VMEM blocks at full HBM bandwidth.

Layouts match ops.stencil: u (nd, ny, nx), coeff (nd, nd, 3, 3, ny, nx).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["stencil_matvec_2d"]


def _kernel(up_hbm, coeff_ref, out_ref, *, nd, TY, ny_pad, nx, nxp):
    i = pl.program_id(0)

    def inner(u_vmem, sem):
        # Mosaic requires DMA slices aligned to the (8, 128) tiling: copy
        # a TY+8-row window (8-row halo) starting at the 8-aligned i*TY
        cp = pltpu.make_async_copy(
            up_hbm.at[:, pl.ds(i * TY, TY + 8), :], u_vmem, sem
        )
        cp.start()
        cp.wait()
        for c in range(nd):
            acc = None
            for c2 in range(nd):
                for dy in range(3):
                    for dx in range(3):
                        k = ((c * nd) + c2) * 9 + dy * 3 + dx
                        t = coeff_ref[k] * u_vmem[c2, dy : dy + TY,
                                                  dx : dx + nx]
                        acc = t if acc is None else acc + t
            out_ref[c] = acc

    pl.run_scoped(
        inner,
        pltpu.VMEM((nd, TY + 8, nxp), out_ref.dtype),
        pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnames=("ty", "interpret"))
def stencil_matvec_2d(coeff, u, ty=16, interpret=False):
    """y = A u for a 9-point / nd-component stencil operator.

    Args:
        coeff: (nd, nd, 3, 3, ny, nx) coefficient planes
            (ops.stencil.Stencil2D.assemble layout).
        u: (nd, ny, nx) field.

    Returns:
        (nd, ny, nx) result, identical to Stencil2D.matvec.
    """
    nd, _, _, _, ny, nx = coeff.shape
    ny_pad = ((ny + ty - 1) // ty) * ty
    grid = ny_pad // ty
    # halo-padded field; rows beyond ny stay zero (8-row tail so the
    # last block's aligned DMA window stays in bounds); lane dim padded
    # to a 128 multiple (DMA slices must be lane-tile aligned)
    nxp = ((nx + 2 + 127) // 128) * 128
    up = jnp.zeros((nd, ny_pad + 8, nxp), u.dtype)
    up = up.at[:, 1 : ny + 1, 1 : nx + 1].set(u)
    cflat = coeff.reshape(nd * nd * 9, ny, nx)
    if ny_pad != ny:
        cflat = jnp.pad(cflat, ((0, 0), (0, ny_pad - ny), (0, 0)))

    kern = functools.partial(_kernel, nd=nd, TY=ty, ny_pad=ny_pad,
                             nx=nx, nxp=nxp)
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # whole padded field (HBM)
            pl.BlockSpec(
                (nd * nd * 9, ty, nx),
                lambda i: (i * 0, i, i * 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (nd, ty, nx), lambda i: (i * 0, i, i * 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nd, ny_pad, nx), u.dtype),
        interpret=interpret,
    )(up, cflat)
    return out[:, :ny, :]
