"""Fused Pallas Jacobi-sweep kernels for the GMG V-cycle (2D + 3D).

The XLA V-cycle pays one full read of the 36 stencil coefficient
planes per smoother matvec: at 1M dof the fine level alone moves
~5 x 76 MB of coefficients per cycle (2 pre-sweeps, the residual, 2
post-sweeps).  This kernel performs all sweeps of one smoothing call
*plus the residual* in a single pass over the coefficients: the grid is
tiled by row blocks, each program DMAs a halo window of the coefficient
planes and fields into VMEM (double-buffered across tiles), and runs
the damped-Jacobi recurrence

    x <- x + omega * invD * (b - A x)

``niter`` times with ghost-zone redundant compute (each sweep's result
is valid one row further in than its input; an 8-row halo covers up to
~6 sweeps).  Requires BC-*eliminated* coefficients
(``Stencil2D.bc_eliminate``) so the matvec is select-free; fields must
be zero at constrained dofs (the V-cycle invariant).

Data layout ("packed"): coefficients (nd*nd*9, 8 + ny_pad + 8, nxp)
and fields (nd, 8 + ny_pad + 8, nxp) with logical (iy, ix) at physical
(iy + 8, ix + 1); ny_pad = ceil(ny/ty)*ty, nxp = 128-multiple >= nx+2.
Zero padding everywhere outside the logical region makes boundary
handling implicit (zero coefficients and zero inv-diagonal).

Replaces the role of the reference's pyamg relaxation sweeps
(pyfem.py:2392-2400) at TPU memory-bandwidth limits.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "pack_coeff2d",
    "pack_field2d",
    "unpack_field2d",
    "fused_sweeps_2d",
    "pack_coeff3d",
    "pack_field3d",
    "unpack_field3d",
    "fused_sweep_3d",
    "fused_sweeps3d",
]

_PADY = 8  # top halo rows (also DMA row-alignment unit)


@functools.lru_cache(maxsize=None)
def sym_planes_3d(nd):
    """Kept-plane list for symmetric 3D (27-point) storage.

    The split is chosen so reconstruction needs coefficients only one
    z-plane *ahead* (never behind): keep all dz=0 planes (partner
    dz=2 reconstructs from z+1), drop all dz=2, and keep the 2D-rule
    half of dz=1.  123 of 243 planes for nd=3, 14 of 27 for nd=1.

    Returns (k_full, ca, cb, dz, dy, dx, is_self) in storage order.
    """
    out = []
    for a in range(nd):
        for b in range(nd):
            for dz in range(3):
                for dy in range(3):
                    for dx in range(3):
                        if dz == 2:
                            continue
                        selfp = False
                        if dz == 1:
                            k2 = (a * nd + b) * 9 + dy * 3 + dx
                            p2 = (b * nd + a) * 9 + (2 - dy) * 3 + (2 - dx)
                            if p2 < k2:
                                continue
                            selfp = p2 == k2
                        k = (a * nd + b) * 27 + dz * 9 + dy * 3 + dx
                        out.append((k, a, b, dz, dy, dx, selfp))
    return tuple(out)


@functools.lru_cache(maxsize=None)
def sym_planes_2d(nd):
    """Kept-plane list for symmetric (half-stencil) coefficient storage.

    The BC-eliminated FEM operator is symmetric, so the stencil plane
    at offset -d is the +d plane shifted: coeff[-d][i] = coeff[d][i-d]
    (componentwise, (ca,cb,dy,dx) pairs with (cb,ca,2-dy,2-dx)).
    Storing one plane per pair halves the smoother/matvec coefficient
    HBM traffic — the kernels reconstruct the partner term from a
    shifted read of the same VMEM window.

    Returns a tuple of (k_full, ca, cb, dy, dx, is_self) in storage
    order; 19 of 36 planes for nd=2, 5 of 9 for nd=1.
    """
    out = []
    for a in range(nd):
        for b in range(nd):
            for dy in range(3):
                for dx in range(3):
                    k = (a * nd + b) * 9 + dy * 3 + dx
                    pk = (b * nd + a) * 9 + (2 - dy) * 3 + (2 - dx)
                    if pk < k:
                        continue
                    out.append((k, a, b, dy, dx, pk == k))
    return tuple(out)

# Each fused sweep (and the trailing residual) is valid one halo row
# less than its input: the 8-row halo funds at most 7 halo-consuming
# passes.  The elementwise first sweep from x = 0 consumes none.
SWEEP_BUDGET = _PADY - 1

# Trailing all-zero z-planes emitted past nz_pad by the sym 3D packs
# (pack_coeff3d / assemble_pack_3d): the multi-sweep 3D kernel's
# coefficient window reaches ``consumed`` planes forward (consumed - 1
# ghost planes + the sym partner's +1), so the z budget of
# :func:`fused_sweeps3d` is min(tz, SWEEP3_ZEXT).
SWEEP3_ZEXT = 4


def halo_sweeps_2d(niter, x0_zero, want_resid):
    """Halo rows consumed by a fused_sweeps_2d call."""
    return (niter - (1 if x0_zero else 0)) + (1 if want_resid else 0)


# same consumption rule per z-plane for the fused 3D kernel
halo_sweeps_3d = halo_sweeps_2d


def _geom(ny, nx, ty):
    ny_pad = ((ny + ty - 1) // ty) * ty
    nxp = ((nx + 2 + 127) // 128) * 128
    return ny_pad, nxp


def pack_coeff2d(coeff, ty=32, dtype=None, sym=False):
    """(nd, nd, 3, 3, ny, nx) BC-eliminated planes -> packed kernel layout.

    dtype=bfloat16 halves the smoother's coefficient traffic (the
    kernel converts to the field dtype in registers); requires
    ty % 16 == 0 so DMA windows stay (16, 128)-tile aligned.
    sym=True stores only the :func:`sym_planes_2d` half (requires a
    symmetric operator — always true for the BC-eliminated FEM
    stencils here).
    """
    nd = coeff.shape[0]
    ny, nx = coeff.shape[-2:]
    ny_pad, nxp = _geom(ny, nx, ty)
    dt = dtype or coeff.dtype
    if jnp.dtype(dt).itemsize < 4:
        assert ty % 16 == 0
    planes = coeff.reshape(nd * nd * 9, ny, nx)
    if sym:
        keep = np.asarray([k for (k, *_r) in sym_planes_2d(nd)])
        planes = planes[keep]
    out = jnp.zeros((planes.shape[0], ny_pad + 2 * _PADY, nxp), dt)
    return out.at[:, _PADY : _PADY + ny, 1 : 1 + nx].set(
        planes.astype(dt)
    )


def pack_field2d(u, ty=32):
    """(nd, ny, nx) -> (nd, ny_pad + 16, nxp) zero-padded field."""
    nd, ny, nx = u.shape
    ny_pad, nxp = _geom(ny, nx, ty)
    out = jnp.zeros((nd, ny_pad + 2 * _PADY, nxp), u.dtype)
    return out.at[:, _PADY : _PADY + ny, 1 : 1 + nx].set(u)


def unpack_field2d(uk, ny, nx):
    """Kernel output (nd, ny_pad, nxp) -> (nd, ny, nx)."""
    return uk[:, :ny, 1 : 1 + nx]


def _omega_seq(omega, niter):
    """Per-sweep damping tuple of length ``niter``.

    A scalar replicates (stationary damped Jacobi); a tuple/list gives
    one factor per sweep (nonstationary Richardson — e.g. Chebyshev
    nodes, see multigrid.smoothing_omegas).  Static: folded into the
    kernel like the scalar was.
    """
    if isinstance(omega, (tuple, list)):
        seq = tuple(float(w) for w in omega)
        assert len(seq) >= niter, (len(seq), niter)
        return seq[:niter]
    return (float(omega),) * niter


def _kernel(*refs, nd, TY, W, nxp, niter, x0_zero, b_zero, want_resid,
            neg_resid, omega, n_tiles, sym_list=None):
    # refs: [c, d, (b), (x)] inputs, [x_out?, r_out?] outputs,
    #       [c_s, d_s, (b_s), (x_s), xw, sems] scratch
    idx = 0
    cref = refs[idx]; idx += 1
    dref = refs[idx]; idx += 1
    bref = None
    if not b_zero:
        bref = refs[idx]; idx += 1
    xref = None
    if not x0_zero:
        xref = refs[idx]; idx += 1
    xout = None
    if niter > 0:
        xout = refs[idx]; idx += 1
    rout = None
    if want_resid:
        rout = refs[idx]; idx += 1
    c_s = refs[idx]; idx += 1
    d_s = refs[idx]; idx += 1
    b_s = None
    if not b_zero:
        b_s = refs[idx]; idx += 1
    x_s = None
    if not x0_zero:
        x_s = refs[idx]; idx += 1
    xw = refs[idx]; idx += 1
    sems = refs[idx]; idx += 1

    i = pl.program_id(0)

    def copies(slot, t):
        out = [
            pltpu.make_async_copy(
                cref.at[:, pl.ds(t * TY, W), :], c_s.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                dref.at[:, pl.ds(t * TY, W), :], d_s.at[slot],
                sems.at[slot, 1],
            ),
        ]
        if b_s is not None:
            out.append(
                pltpu.make_async_copy(
                    bref.at[:, pl.ds(t * TY, W), :], b_s.at[slot],
                    sems.at[slot, 2],
                )
            )
        if x_s is not None:
            out.append(
                pltpu.make_async_copy(
                    xref.at[:, pl.ds(t * TY, W), :], x_s.at[slot],
                    sems.at[slot, 3],
                )
            )
        return out

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

    WI, XI = W - 2, nxp - 2  # interior compute extents

    fdt = d_s.dtype

    def matvec(xbuf):
        """A x on interior rows [1, W-1), cols [1, nxp-1)."""
        if sym_list is not None:
            # half-stencil storage: each stored plane (a, b, dy, dx)
            # feeds acc[a] directly and, unless self-paired, feeds
            # acc[b] through the symmetry identity
            # coeff[(b,a,2-dy,2-dx)][i] = coeff[(a,b,dy,dx)][i+d-1]
            # — a shifted read of the same VMEM window, so the
            # transpose term is (cv * x[a]) sliced at (2-dy, 2-dx)
            accs = [None] * nd

            def add(c, t):
                accs[c] = t if accs[c] is None else accs[c] + t

            for si, (k, a, b, dy, dx, selfp) in enumerate(sym_list):
                cv = c_s[slot, si]
                if cv.dtype != fdt:
                    cv = cv.astype(fdt)  # bf16 load, f32 math
                add(a, cv[1 : 1 + WI, 1 : 1 + XI]
                       * xbuf[b, dy : dy + WI, dx : dx + XI])
                if not selfp:
                    p = cv * xbuf[a]
                    add(b, p[2 - dy : 2 - dy + WI, 2 - dx : 2 - dx + XI])
            return accs
        accs = []
        for c in range(nd):
            acc = None
            for c2 in range(nd):
                for dy in range(3):
                    for dx in range(3):
                        k = (c * nd + c2) * 9 + dy * 3 + dx
                        cv = c_s[slot, k, 1 : 1 + WI, 1 : 1 + XI]
                        if cv.dtype != fdt:
                            cv = cv.astype(fdt)  # bf16 load, f32 math
                        t = cv * xbuf[c2, dy : dy + WI, dx : dx + XI]
                        acc = t if acc is None else acc + t
            accs.append(acc)
        return accs

    def bslice(c):
        if b_s is None:
            return None
        return b_s[slot, c, 1 : 1 + WI, 1 : 1 + XI]

    sw0 = 0  # index of the next sweep's damping factor
    sweeps = niter
    if x0_zero:
        xw[:] = jnp.zeros(xw.shape, xw.dtype)
        if niter > 0:
            # first sweep from x = 0: pure elementwise, no matvec
            for c in range(nd):
                xw[c, 1 : 1 + WI, 1 : 1 + XI] = (
                    omega[0]
                    * d_s[slot, c, 1 : 1 + WI, 1 : 1 + XI]
                    * bslice(c)
                )
            sw0 = 1
        sweeps = niter - 1
    else:
        xw[:] = x_s[slot]

    for sw in range(max(sweeps, 0)):
        accs = matvec(xw)
        upds = []
        for c in range(nd):
            r = (bslice(c) - accs[c]) if b_s is not None else -accs[c]
            upds.append(
                omega[sw0 + sw] * d_s[slot, c, 1 : 1 + WI, 1 : 1 + XI] * r
            )
        for c in range(nd):
            xw[c, 1 : 1 + WI, 1 : 1 + XI] = (
                xw[c, 1 : 1 + WI, 1 : 1 + XI] + upds[c]
            )

    if xout is not None:
        for c in range(nd):
            xout[c] = xw[c, _PADY : _PADY + TY, :]
    if rout is not None:
        accs = matvec(xw)
        for c in range(nd):
            # accs rows [1, W-1) -> output rows [PADY, PADY+TY) are
            # acc rows [PADY-1, PADY-1+TY); interior cols [1, nxp-1)
            a = accs[c][_PADY - 1 : _PADY - 1 + TY, :]
            if b_s is not None:
                bv = b_s[slot, c, _PADY : _PADY + TY, 1 : 1 + XI]
                v = (a - bv) if neg_resid else (bv - a)
            else:
                v = a if neg_resid else -a
            rout[c] = jnp.zeros((TY, nxp), v.dtype)
            rout[c, :, 1 : 1 + XI] = v


@functools.partial(
    jax.jit,
    static_argnames=(
        "niter", "want_resid", "neg_resid", "omega", "ty", "interpret",
    ),
)
def fused_sweeps_2d(coeff_k, invd_k, b_k=None, x_k=None, *, niter=2,
                    want_resid=False, neg_resid=False, omega=0.7, ty=32,
                    interpret=False):
    """Fused damped-Jacobi sweeps (+ optional residual) on packed data.

    Args:
        coeff_k: packed BC-eliminated coefficients (pack_coeff2d).
        invd_k: packed inverse diagonal (pack_field2d of 1/diag, zero
            in the padding).
        b_k: packed rhs, or None for b = 0.
        x_k: packed initial iterate, or None for x0 = 0.
        niter: number of Jacobi sweeps (0 = matvec/residual only).
        want_resid: also return sign*(b - A x_final).
        neg_resid: flip the residual sign (A x - b); with b=None and
            niter=0 this makes the call a plain matvec of x_k.
        omega: damping factor (static, folded into the kernel) — a
            scalar, or a tuple of per-sweep factors (len >= niter;
            Chebyshev-node smoothing, multigrid.smoothing_omegas).

    Returns:
        (x_out?, r_out?) as (nd, ny_pad, nxp) arrays in packed column
        layout (use unpack_field2d); present per niter/want_resid.
    """
    nk, rows, nxp = coeff_k.shape
    nd = invd_k.shape[0]
    sym_list = sym_planes_2d(nd)
    if nk == nd * nd * 9:
        sym_list = None  # full storage
    else:
        assert nk == len(sym_list), (nk, nd)
    ny_pad = rows - 2 * _PADY
    n_tiles = ny_pad // ty
    W = ty + 2 * _PADY
    x0_zero = x_k is None
    b_zero = b_k is None
    assert not (x0_zero and niter == 0)
    assert not (b_zero and x0_zero)
    # ghost-zone validity: beyond this the returned iterate/residual is
    # silently wrong near tile seams (callers must fall back to the XLA
    # smoother for larger nu — see GMG._cycle)
    assert halo_sweeps_2d(niter, x0_zero, want_resid) <= SWEEP_BUDGET, (
        f"fused_sweeps_2d: niter={niter} (x0_zero={x0_zero}, "
        f"want_resid={want_resid}) exceeds the {_PADY}-row halo budget"
    )

    inputs = [coeff_k, invd_k]
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 2
    if not b_zero:
        inputs.append(b_k)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    if not x0_zero:
        inputs.append(x_k)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))

    out_shape, out_specs = [], []
    fld = jax.ShapeDtypeStruct((nd, ny_pad, nxp), invd_k.dtype)
    blk = pl.BlockSpec(
        (nd, ty, nxp), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    if niter > 0:
        out_shape.append(fld)
        out_specs.append(blk)
    if want_resid:
        out_shape.append(fld)
        out_specs.append(blk)

    dt = invd_k.dtype
    scratch = [
        pltpu.VMEM((2, nk, W, nxp), coeff_k.dtype),
        pltpu.VMEM((2, nd, W, nxp), dt),
    ]
    if not b_zero:
        scratch.append(pltpu.VMEM((2, nd, W, nxp), dt))
    if not x0_zero:
        scratch.append(pltpu.VMEM((2, nd, W, nxp), dt))
    scratch += [
        pltpu.VMEM((nd, W, nxp), dt),
        pltpu.SemaphoreType.DMA((2, 4)),
    ]

    kern = functools.partial(
        _kernel, nd=nd, TY=ty, W=W, nxp=nxp, niter=niter,
        x0_zero=x0_zero, b_zero=b_zero, want_resid=want_resid,
        neg_resid=neg_resid, omega=_omega_seq(omega, niter),
        n_tiles=n_tiles, sym_list=sym_list,
    )
    # scoped-VMEM budget: the double-buffered coefficient windows alone
    # exceed the compiler's 16 MB default at wide grids; v5e has 128 MB
    # of VMEM, so raise the cap to what the scratch actually allocates
    esize = jnp.dtype(dt).itemsize
    nfield = 1 + (0 if b_zero else 1) + (0 if x0_zero else 1)
    scratch_bytes = (2 * nk + (2 * nfield + 1) * nd) * W * nxp * esize
    out_bytes = 2 * len(out_shape) * nd * ty * nxp * esize
    vmem_cap = min(
        100 * 1024 * 1024,
        int(1.3 * (scratch_bytes + out_bytes)) + (1 << 21),
    )
    # the package enables x64 globally, under which Pallas ref indexing
    # emits i64 indices that Mosaic's memref_slice rejects (and one
    # convert hits an infinitely recursive lowering fallback); the
    # kernel is explicitly float32/int32, so trace it in 32-bit mode
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
            out_shape=tuple(out_shape) if len(out_shape) > 1 else out_shape[0],
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_cap
            ),
            interpret=interpret,
        )(*inputs)
    return out


# ---------------------------------------------------------------------------
# 3D (hex8 / 27-point) fused sweeps — z-tiled, plain BlockSpecs
# ---------------------------------------------------------------------------
#
# The 3D coefficient volumes (nd*nd*27 planes) are too fat for the 2D
# kernel's multi-sweep halo windows, but single-sweep fusion needs no
# coefficient halo at all: a z-tile's outputs read coefficients only at
# their own z.  The field's one-slab z halo comes from three adjacent
# BlockSpec views of a z-padded copy (z is an untiled dim, so the
# slabs carry no alignment constraints), and y/x halos live inside the
# blocks as 1-padded extents.  Everything is auto-pipelined by Pallas.

def _geom3d(ny, nx):
    nyp = ny + 2
    nxp = ((nx + 2 + 127) // 128) * 128
    return nyp, nxp


def _nyp8(ny):
    """Sym-coeff row count: manual DMA windows (the sym kernel's
    (tz+1)-plane copies) need 8-sublane-aligned extents."""
    return ((ny + 2 + 7) // 8) * 8


def _nzpad(nz, tz):
    return ((nz + tz - 1) // tz) * tz


def pack_coeff3d(coeff, tz=1, dtype=None, sym=False):
    """(nd,nd,3,3,3,nz,ny,nx) eliminated -> (nz_pad, nk, ny+2, nxp).

    z-major: the sweep kernels stream z-windows of all nk planes, so a
    window slice must be one contiguous HBM chunk — plane-major storage
    fragments each window DMA into nk strided ~18 KB chunks and caps
    the (DMA-bound) kernels at ~190 GB/s on v5e.
    dtype=bfloat16 halves the smoother's dominant HBM traffic; the
    kernels convert to f32 in registers (FMA stays f32).
    sym=True stores the :func:`sym_planes_3d` half with SWEEP3_ZEXT
    extra (zero) z-planes at the end — the sym kernels' forward z-halo
    windows (+1 for the single-sweep kernel; up to ``consumed`` for
    :func:`fused_sweeps3d`).
    """
    nd = coeff.shape[0]
    nz, ny, nx = coeff.shape[-3:]
    nyp, nxp = _geom3d(ny, nx)
    dt = dtype or coeff.dtype
    planes = coeff.reshape(nd * nd * 27, nz, ny, nx)
    if sym:
        keep = np.asarray([k for (k, *_r) in sym_planes_3d(nd)])
        planes = planes[keep]
        nyp = _nyp8(ny)
    zext = SWEEP3_ZEXT if sym else 0
    out = jnp.zeros(
        (_nzpad(nz, tz) + zext, planes.shape[0], nyp, nxp), dt
    )
    return out.at[:nz, :, 1 : 1 + ny, 1 : 1 + nx].set(
        planes.astype(dt).transpose(1, 0, 2, 3)
    )


def pack_field3d(u, zpad=0, tz=1):
    """(nd, nz, ny, nx) -> (nd, nz_pad + 2*zpad*tz, ny+2, nxp).

    zpad=1 gives the tz-slab halo layout consumed as the x operand
    (logical z at physical z + tz); zpad=0 is the plain layout.
    """
    nd, nz, ny, nx = u.shape
    nyp, nxp = _geom3d(ny, nx)
    h = zpad * tz
    out = jnp.zeros((nd, _nzpad(nz, tz) + 2 * h, nyp, nxp), u.dtype)
    return out.at[:, h : h + nz, 1 : 1 + ny, 1 : 1 + nx].set(u)


def unpack_field3d(uk, nz, ny, nx):
    return uk[:, :nz, 1 : 1 + ny, 1 : 1 + nx]


def _kernel3d(*refs, nd, nyp, nxp, mode, neg_resid, omega, tz):
    # refs: coeff, invd?, b?, x_top, x_mid, x_bot, out
    idx = 0
    cref = refs[idx]; idx += 1
    dref = None
    if mode == "sweep":
        dref = refs[idx]; idx += 1
    bref = None
    if mode != "matvec":
        bref = refs[idx]; idx += 1
    x_t = refs[idx]; idx += 1
    x_m = refs[idx]; idx += 1
    x_b = refs[idx]; idx += 1
    out = refs[idx]

    YI, XI = nyp - 2, nxp - 2
    xcat = jnp.concatenate([x_t[...], x_m[...], x_b[...]], axis=1)
    fdt = xcat.dtype
    for c in range(nd):
        acc = None
        for c2 in range(nd):
            for dz in range(3):
                for dy in range(3):
                    for dx in range(3):
                        k = ((c * nd + c2) * 27 + dz * 9 + dy * 3 + dx)
                        cv = cref[:, k, 1 : 1 + YI, 1 : 1 + XI]
                        if cv.dtype != fdt:
                            cv = cv.astype(fdt)  # bf16 load, f32 math
                        t = cv * xcat[
                            c2, tz + dz - 1 : 2 * tz + dz - 1,
                            dy : dy + YI, dx : dx + XI,
                        ]
                        acc = t if acc is None else acc + t
        if mode == "matvec":
            v = -acc if not neg_resid else acc
        elif mode == "resid":
            bv = bref[c, :, 1 : 1 + YI, 1 : 1 + XI]
            v = (acc - bv) if neg_resid else (bv - acc)
        else:  # sweep: x + omega * invd * (b - A x)
            bv = bref[c, :, 1 : 1 + YI, 1 : 1 + XI]
            v = xcat[c, tz : 2 * tz, 1 : 1 + YI, 1 : 1 + XI] + (
                omega
                * dref[c, :, 1 : 1 + YI, 1 : 1 + XI]
                * (bv - acc)
            )
        out[c] = jnp.zeros((tz, nyp, nxp), v.dtype)
        out[c, :, 1 : 1 + YI, 1 : 1 + XI] = v


def _kernel3d_sym(*refs, nd, nyp, nxp, mode, neg_resid, omega, tz,
                  n_tiles, sym_list):
    """Half-stencil 3D kernel: coeff arrives as a manually DMA'd
    (tz+1)-plane window (double-buffered); the +1 z-halo plane feeds
    the dz=2 partner reconstruction (sym_planes_3d keeps dz<=1, so
    only a *forward* halo is needed).  z-major coeff storage makes
    each window one contiguous HBM chunk (full DMA bandwidth)."""
    idx = 0
    cref = refs[idx]; idx += 1
    dref = None
    if mode == "sweep":
        dref = refs[idx]; idx += 1
    bref = None
    if mode != "matvec":
        bref = refs[idx]; idx += 1
    x_t = refs[idx]; idx += 1
    x_m = refs[idx]; idx += 1
    x_b = refs[idx]; idx += 1
    out = refs[idx]; idx += 1
    c_s = refs[idx]; idx += 1
    sems = refs[idx]

    i = pl.program_id(0)

    def copy(slot, t):
        return pltpu.make_async_copy(
            cref.at[pl.ds(t * tz, tz + 1)], c_s.at[slot],
            sems.at[slot],
        )

    @pl.when(i == 0)
    def _():
        copy(0, 0).start()

    @pl.when(i + 1 < n_tiles)
    def _():
        copy((i + 1) % 2, i + 1).start()

    slot = i % 2
    copy(slot, i).wait()

    YI, XI = nyp - 2, nxp - 2
    xcat = jnp.concatenate([x_t[...], x_m[...], x_b[...]], axis=1)
    fdt = xcat.dtype
    accs = [None] * nd

    def add(c, t):
        accs[c] = t if accs[c] is None else accs[c] + t

    for si, (k, a, b, dz, dy, dx, selfp) in enumerate(sym_list):
        # coeff planes carry 8-aligned rows (_nyp8 >= nyp); slice to
        # the field extent on load
        cv = c_s[slot, :, si, :nyp, :]
        if cv.dtype != fdt:
            cv = cv.astype(fdt)  # bf16 load, f32 math
        add(a, cv[0:tz, 1 : 1 + YI, 1 : 1 + XI] * xcat[
            b, tz + dz - 1 : 2 * tz + dz - 1,
            dy : dy + YI, dx : dx + XI,
        ])
        if not selfp:
            # partner (b, a, 2-dz, 2-dy, 2-dx): coeff and x share the
            # same shift, so slice one aligned elementwise product
            p = cv * xcat[a, tz : 2 * tz + 1]
            add(b, p[1 - dz : 1 - dz + tz,
                     2 - dy : 2 - dy + YI,
                     2 - dx : 2 - dx + XI])

    for c in range(nd):
        acc = accs[c]
        if mode == "matvec":
            v = -acc if not neg_resid else acc
        elif mode == "resid":
            bv = bref[c, :, 1 : 1 + YI, 1 : 1 + XI]
            v = (acc - bv) if neg_resid else (bv - acc)
        else:  # sweep
            bv = bref[c, :, 1 : 1 + YI, 1 : 1 + XI]
            v = xcat[c, tz : 2 * tz, 1 : 1 + YI, 1 : 1 + XI] + (
                omega
                * dref[c, :, 1 : 1 + YI, 1 : 1 + XI]
                * (bv - acc)
            )
        out[c] = jnp.zeros((tz, nyp, nxp), v.dtype)
        out[c, :, 1 : 1 + YI, 1 : 1 + XI] = v


def fused_sweep_3d(coeff_k, invd_k=None, b_k=None, x_k=None, *,
                   mode="sweep", neg_resid=False, omega=0.6, tz=1,
                   interpret=False):
    """One fused 27-point operation per z-tile on packed 3D data.

    mode: "sweep"  -> x + omega * invd * (b - A x)   (needs invd, b, x)
          "resid"  -> +-(b - A x)                    (needs b, x)
          "matvec" -> A x (neg_resid=True) or -A x   (needs x only)

    x_k must be packed with ``pack_field3d(x, zpad=1, tz=tz)``; all
    other operands and the result use the plain (zpad=0) layout with
    the same tz.  coeff_k is z-major, (nz, nk, ny+2, nxp).  Returns
    the packed (nd, nz_pad, ny+2, nxp) result.

    Half-stencil (``sym``) coefficient arrays are detected by plane
    count; their z-extent must be >= nz_pad + 1 (the forward-halo
    plane ``pack_coeff3d(sym=True)`` / the sym assembly emit).
    """
    nzc, nk, nyc, nxp = coeff_k.shape
    nd = x_k.shape[0]
    nyp = x_k.shape[2]
    nzp = x_k.shape[1] - 2 * tz
    sym_list = sym_planes_3d(nd)
    if nk == nd * nd * 27:
        sym_list = None
        assert nzc >= nzp and nyc == nyp
    else:
        assert nk == len(sym_list), (nk, nd)
        assert nzc >= nzp + 1, "sym coeff needs the +1 z-halo plane"
        assert nyc >= nyp and nyc % 8 == 0
    n_tiles = nzp // tz

    blk = lambda d0: pl.BlockSpec(
        (d0, tz, nyp, nxp), lambda i: (0, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    cblk = pl.BlockSpec(
        (tz, nk, nyp, nxp), lambda i: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    xblk = lambda off: pl.BlockSpec(
        (nd, tz, nyp, nxp), lambda i, o=off: (0, i + o, 0, 0),
        memory_space=pltpu.VMEM,
    )
    inputs = [coeff_k]
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY) if sym_list is not None
        else cblk
    ]
    if mode == "sweep":
        inputs.append(invd_k)
        in_specs.append(blk(nd))
    if mode != "matvec":
        inputs.append(b_k)
        in_specs.append(blk(nd))
    inputs += [x_k, x_k, x_k]
    in_specs += [xblk(0), xblk(1), xblk(2)]

    esize = jnp.dtype(coeff_k.dtype).itemsize
    scratch = None
    if sym_list is None:
        buf_bytes = 2 * (nk + 3 * nd + 2 * nd + nd) * tz * nyp * nxp * esize
        kern = functools.partial(
            _kernel3d, nd=nd, nyp=nyp, nxp=nxp, mode=mode,
            neg_resid=neg_resid, omega=float(omega), tz=tz,
        )
    else:
        buf_bytes = (
            2 * nk * (tz + 1) * nyc * nxp * esize
            + 2 * (3 * nd + 2 * nd + nd) * tz * nyp * nxp
            * jnp.dtype(x_k.dtype).itemsize
        )
        kern = functools.partial(
            _kernel3d_sym, nd=nd, nyp=nyp, nxp=nxp, mode=mode,
            neg_resid=neg_resid, omega=float(omega), tz=tz,
            n_tiles=n_tiles, sym_list=sym_list,
        )
        scratch = [
            pltpu.VMEM((2, tz + 1, nk, nyc, nxp), coeff_k.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=blk(nd),
            out_shape=jax.ShapeDtypeStruct(
                (nd, nzp, nyp, nxp), x_k.dtype
            ),
            scratch_shapes=scratch or [],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(
                    110 * 1024 * 1024,
                    int(1.2 * buf_bytes) + (1 << 24),
                )
            ),
            interpret=interpret,
        )(*inputs)
    return out


# ---------------------------------------------------------------------------
# 3D multi-sweep fusion — all sweeps of one smoothing call (+ optional
# residual) in a single pass over the coefficients, like the 2D kernel
# but with z-ghost redundant compute.  Requires sym (half-stencil)
# coefficient storage; the coefficient window per z-tile is
# tz + 2*(consumed-1) + 1 planes, so the amortized coefficient traffic
# is (tz + 2*consumed - 1)/tz of one pass instead of ~consumed passes
# of the single-sweep kernels.
# ---------------------------------------------------------------------------


def _kernel3d_multi(*refs, nd, nyp, nxp, nyc, niter, x0_zero, want_resid,
                    neg_resid, omega, tz, n_tiles, sym_list, consumed):
    # refs: c(ANY), d0,d1,d2, b0,b1,b2, (x0,x1,x2)?, xout, rout?,
    #       xw, c_s, sems
    idx = 0
    cref = refs[idx]; idx += 1
    d3 = refs[idx : idx + 3]; idx += 3
    b3 = refs[idx : idx + 3]; idx += 3
    x3 = None
    if not x0_zero:
        x3 = refs[idx : idx + 3]; idx += 3
    xout = refs[idx]; idx += 1
    rout = None
    if want_resid:
        rout = refs[idx]; idx += 1
    xw = refs[idx]; idx += 1
    c_s = refs[idx]; idx += 1
    sems = refs[idx]

    i = pl.program_id(0)
    hc = consumed - 1          # backward coefficient ghost planes
    WC = tz + 2 * hc + 1       # coefficient window (+1 sym partner)
    OFF = consumed             # xw plane o <-> logical i*tz + o - OFF

    # --- double-buffered coefficient window DMA (z-major: contiguous)
    def start_copy(slot, t):
        if hc > 0:
            @pl.when(t == 0)
            def _():
                pltpu.make_async_copy(
                    cref.at[pl.ds(0, WC - hc)], c_s.at[slot, hc:],
                    sems.at[slot],
                ).start()

            @pl.when(t > 0)
            def _():
                pltpu.make_async_copy(
                    cref.at[pl.ds(t * tz - hc, WC)], c_s.at[slot],
                    sems.at[slot],
                ).start()
        else:
            pltpu.make_async_copy(
                cref.at[pl.ds(t * tz, WC)], c_s.at[slot], sems.at[slot]
            ).start()

    def wait_copy(slot, t):
        if hc > 0:
            @pl.when(t == 0)
            def _():
                pltpu.make_async_copy(
                    cref.at[pl.ds(0, WC - hc)], c_s.at[slot, hc:],
                    sems.at[slot],
                ).wait()

            @pl.when(t > 0)
            def _():
                pltpu.make_async_copy(
                    cref.at[pl.ds(t * tz - hc, WC)], c_s.at[slot],
                    sems.at[slot],
                ).wait()
        else:
            pltpu.make_async_copy(
                cref.at[pl.ds(t * tz, WC)], c_s.at[slot], sems.at[slot]
            ).wait()

    @pl.when(i == 0)
    def _():
        start_copy(0, 0)

    @pl.when(i + 1 < n_tiles)
    def _():
        start_copy((i + 1) % 2, i + 1)

    slot = i % 2
    wait_copy(slot, i)
    if hc > 0:
        # tile 0's window starts at logical plane -hc: zero the lead
        @pl.when(i == 0)
        def _():
            c_s[slot, 0:hc] = jnp.zeros(
                (hc,) + tuple(c_s.shape[2:]), c_s.dtype
            )

    YI, XI = nyp - 2, nxp - 2
    dcat = jnp.concatenate([r[...] for r in d3], axis=1)
    bcat = jnp.concatenate([r[...] for r in b3], axis=1)
    fdt = dcat.dtype

    def fld(cat, c, z0, z1):
        """cat planes for xw range [z0, z1), interior cols/rows."""
        lo = z0 - OFF + tz
        return cat[c, lo : lo + (z1 - z0), 1 : 1 + YI, 1 : 1 + XI]

    def matvec(z0, z1):
        """A xw on xw planes [z0, z1) (interior rows/cols)."""
        n = z1 - z0
        accs = [None] * nd

        def add(c, t):
            accs[c] = t if accs[c] is None else accs[c] + t

        co = z0 - OFF + hc  # coefficient-window plane of xw plane z0
        for si, (k, a, b, dz, dy, dx, selfp) in enumerate(sym_list):
            cv = c_s[slot, co : co + n, si, :nyp, :]
            if cv.dtype != fdt:
                cv = cv.astype(fdt)
            add(a, cv[:, 1 : 1 + YI, 1 : 1 + XI] * xw[
                b, z0 + dz - 1 : z1 + dz - 1, dy : dy + YI, dx : dx + XI,
            ])
            if not selfp:
                cv1 = c_s[slot, co : co + n + 1, si, :nyp, :]
                if cv1.dtype != fdt:
                    cv1 = cv1.astype(fdt)
                p = cv1 * xw[a, z0 : z1 + 1]
                add(b, p[1 - dz : 1 - dz + n,
                         2 - dy : 2 - dy + YI,
                         2 - dx : 2 - dx + XI])
        return accs

    sw0 = 0  # index of the next sweep's damping factor
    sweeps = niter
    if x0_zero:
        # first sweep from x = 0 is elementwise (no coefficient read);
        # its compute range is the widest: the full xw extent
        xw[:] = jnp.zeros(xw.shape, xw.dtype)
        z0, z1 = OFF - consumed, OFF + tz + consumed
        for c in range(nd):
            xw[c, z0:z1, 1 : 1 + YI, 1 : 1 + XI] = (
                omega[0] * fld(dcat, c, z0, z1) * fld(bcat, c, z0, z1)
            )
        sw0 = 1
        sweeps = niter - 1
    else:
        xcat = jnp.concatenate([r[...] for r in x3], axis=1)
        xw[:] = xcat[:, tz - OFF : 2 * tz + OFF]
    # stencil stages shrink: last sweep at ghost (1 if resid else 0),
    # the trailing residual at ghost 0
    g = consumed - 1

    for sw in range(max(sweeps, 0)):
        z0, z1 = OFF - g, OFF + tz + g
        accs = matvec(z0, z1)
        for c in range(nd):
            upd = omega[sw0 + sw] * fld(dcat, c, z0, z1) * (
                fld(bcat, c, z0, z1) - accs[c]
            )
            xw[c, z0:z1, 1 : 1 + YI, 1 : 1 + XI] = (
                xw[c, z0:z1, 1 : 1 + YI, 1 : 1 + XI] + upd
            )
        g -= 1

    for c in range(nd):
        xout[c] = xw[c, OFF : OFF + tz, :, :]
    if rout is not None:
        accs = matvec(OFF, OFF + tz)
        for c in range(nd):
            bv = fld(bcat, c, OFF, OFF + tz)
            v = (accs[c] - bv) if neg_resid else (bv - accs[c])
            rout[c] = jnp.zeros((tz, nyp, nxp), v.dtype)
            rout[c, :, 1 : 1 + YI, 1 : 1 + XI] = v


def fused_sweeps3d(coeff_k, invd_k1, b_k1, x_k1=None, *, niter=2,
                   want_resid=False, neg_resid=False, omega=0.6, tz=4,
                   interpret=False):
    """All damped-Jacobi sweeps of one 3D smoothing call (+ optional
    residual) in a single pass over the sym-packed coefficients.

    The z-grid is tiled by ``tz`` planes; each program DMAs a
    ``tz + 2*(consumed-1) + 1``-plane coefficient window (double-
    buffered) and recomputes the ghost planes redundantly, exactly the
    2D kernel's row-halo scheme rotated into z.  Replaces ``consumed``
    single-sweep kernel launches (each re-reading the coefficients at
    (tz+1)/tz window overhead) with one.

    Args:
        coeff_k: sym z-major packed coefficients with >= consumed
            trailing zero z-planes past nz_pad (``pack_coeff3d(sym=
            True)`` / the sym assembly emit SWEEP3_ZEXT).
        invd_k1, b_k1, x_k1: fields packed with ``pack_field3d(_,
            zpad=1, tz=tz)`` (logical z at physical z + tz); x_k1=None
            for x0 = 0.
        niter: Jacobi sweeps (>= 1).
        want_resid: also return sign*(b - A x_final).

    Returns:
        x_out or (x_out, r_out), plain-layout (nd, nz_pad, nyp, nxp).

    Budget: ``halo_sweeps_3d(niter, x0_zero, want_resid)`` must be
    <= min(tz, SWEEP3_ZEXT); callers fall back to the single-sweep
    kernels otherwise (see GMG._cycle).
    """
    nzc, nk, nyc, nxp = coeff_k.shape
    nd = invd_k1.shape[0]
    nyp = invd_k1.shape[2]
    nzp = invd_k1.shape[1] - 2 * tz
    sym_list = sym_planes_3d(nd)
    assert nk == len(sym_list), (
        "fused_sweeps3d requires sym coefficient storage", nk, nd)
    assert nyc >= nyp and nyc % 8 == 0
    x0_zero = x_k1 is None
    assert niter >= 1
    consumed = halo_sweeps_3d(niter, x0_zero, want_resid)
    assert 1 <= consumed <= min(tz, SWEEP3_ZEXT), (
        f"fused_sweeps3d: niter={niter} (x0_zero={x0_zero}, "
        f"want_resid={want_resid}) exceeds the z budget "
        f"min(tz={tz}, {SWEEP3_ZEXT})"
    )
    assert nzc >= nzp + consumed, (
        "sym coeff needs >= consumed trailing z-halo planes", nzc, nzp)
    n_tiles = nzp // tz

    blk = lambda d0: pl.BlockSpec(
        (d0, tz, nyp, nxp), lambda i: (0, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    xblk = lambda off: pl.BlockSpec(
        (nd, tz, nyp, nxp), lambda i, o=off: (0, i + o, 0, 0),
        memory_space=pltpu.VMEM,
    )
    inputs = [coeff_k, invd_k1, invd_k1, invd_k1, b_k1, b_k1, b_k1]
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    in_specs += [xblk(0), xblk(1), xblk(2)] * 2
    if not x0_zero:
        inputs += [x_k1, x_k1, x_k1]
        in_specs += [xblk(0), xblk(1), xblk(2)]

    dt = invd_k1.dtype
    fld_shape = jax.ShapeDtypeStruct((nd, nzp, nyp, nxp), dt)
    out_shape = [fld_shape]
    out_specs = [blk(nd)]
    if want_resid:
        out_shape.append(fld_shape)
        out_specs.append(blk(nd))

    hc = consumed - 1
    WC = tz + 2 * hc + 1
    WZ = tz + 2 * consumed
    scratch = [
        pltpu.VMEM((nd, WZ, nyp, nxp), dt),           # xw work iterate
        pltpu.VMEM((2, WC, nk, nyc, nxp), coeff_k.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    kern = functools.partial(
        _kernel3d_multi, nd=nd, nyp=nyp, nxp=nxp, nyc=nyc, niter=niter,
        x0_zero=x0_zero, want_resid=want_resid, neg_resid=neg_resid,
        omega=_omega_seq(omega, niter), tz=tz, n_tiles=n_tiles,
        sym_list=sym_list, consumed=consumed,
    )
    esize = jnp.dtype(dt).itemsize
    buf_bytes = (
        2 * WC * nk * nyc * nxp * jnp.dtype(coeff_k.dtype).itemsize
        + nd * WZ * nyp * nxp * esize
        + 2 * (6 + (0 if x0_zero else 3)) * nd * tz * nyp * nxp * esize
        + 2 * len(out_shape) * nd * tz * nyp * nxp * esize
    )
    # Mosaic's scoped-VMEM stack runs ~2x the declared buffers
    # (measured 66 MB actual vs a 36 MB estimate at 65^3, tz=4)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=(
                tuple(out_specs) if len(out_specs) > 1 else out_specs[0]
            ),
            out_shape=(
                tuple(out_shape) if len(out_shape) > 1 else out_shape[0]
            ),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(
                    122 * 1024 * 1024,
                    int(2.6 * buf_bytes) + (1 << 24),
                )
            ),
            interpret=interpret,
        )(*inputs)
    return out
