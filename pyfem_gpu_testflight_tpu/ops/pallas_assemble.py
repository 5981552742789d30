"""Fused Pallas uniform-geometry assembly for the GMG hierarchies (2D + 3D).

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

_TY = 16  # assembly row-tile; 16 keeps bf16 output blocks tile-aligned
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


def _kernel(rref, mref, cout, dout, *rest, nd, nxp, W36, N,
            p, n_tiles, ney, nex, want_lp=False, sym_map=None):
    if want_lp:
        lpout, r_s, m_s, sems = rest
    else:
        r_s, m_s, sems = rest
        lpout = None
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
                    if sym_map is not None and k not in sym_map:
                        continue  # partner plane carries the value
                    ko = k if sym_map is None else sym_map[k]
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
                    cout[ko] = zrow
                    cout[ko, :, 1 : 1 + XI] = plane
                    if lpout is not None:
                        # low-precision smoother copy in the same pass
                        # (a separate cast re-reads the whole array)
                        lpout[ko] = zrow.astype(lpout.dtype)
                        lpout[ko, :, 1 : 1 + XI] = plane.astype(
                            lpout.dtype
                        )
    for c in range(nd):
        d = diags[c]
        dout[c] = zrow
        dout[c, :, 1 : 1 + XI] = rowm[c] / jnp.where(d == 0.0, 1.0, d)


def assemble_pack_2d(rho_a, maskf_a, W36, N, *, nd, p, ny, nx, ty=32,
                     lp_dtype=None, sym=False, interpret=False):
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
        lp_dtype: also emit a low-precision coefficient copy (the
            smoother's) in the same pass — an out-of-kernel cast costs
            a full re-read of the coefficients at the HBM roofline.

    Returns:
        (coeff_k, invd_k[, coeff_lp_k]): (nd*nd*9, ny_pad+16, nxp) and
        (nd, ny_pad+16, nxp), ``pallas_smooth`` layouts.
    """
    W36 = np.asarray(W36)
    N = np.asarray(N)
    ny_pad, nxp = _geom(ny, nx, ty)
    R = ny_pad + 2 * _PADY
    n_tiles = R // _TY
    sym_map = None
    if sym:
        from .pallas_smooth import sym_planes_2d

        sym_map = {k: si for si, (k, *_r) in enumerate(sym_planes_2d(nd))}
    nk = nd * nd * 9 if sym_map is None else len(sym_map)
    dt = rho_a.dtype
    want_lp = lp_dtype is not None

    kern = functools.partial(
        _kernel, nd=nd, nxp=nxp, W36=W36, N=N, p=float(p),
        n_tiles=n_tiles, ney=ny - 1, nex=nx - 1, want_lp=want_lp,
        sym_map=sym_map,
    )
    blk = lambda d0: pl.BlockSpec(
        (d0, _TY, nxp), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    out_specs = [blk(nk), blk(nd)]
    out_shape = [
        jax.ShapeDtypeStruct((nk, R, nxp), dt),
        jax.ShapeDtypeStruct((nd, R, nxp), dt),
    ]
    if want_lp:
        out_specs.append(blk(nk))
        out_shape.append(jax.ShapeDtypeStruct((nk, R, nxp), lp_dtype))
    scratch_bytes = 2 * (1 + nd) * (_TY + 16) * nxp * np.dtype(dt).itemsize
    out_bytes = 2 * (nk + nd) * _TY * nxp * np.dtype(dt).itemsize
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
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
    return outs


# ---------------------------------------------------------------------------
# 3D (hex8) fused uniform assembly — z-slab grid, plain BlockSpecs
# ---------------------------------------------------------------------------

_HEX8_LOCAL = (
    (0, 0, 0), (0, 0, 1), (0, 1, 1), (0, 1, 0),
    (1, 0, 0), (1, 0, 1), (1, 1, 1), (1, 1, 0),
)


def pack_assembly_field3d(u, nyp, nxp, tz=1):
    """(nz, ny, nx) -> (nz_pad + 2, nyp, nxp): logical (z,y,x) at +1."""
    from .pallas_smooth import _nzpad

    nz, ny, nx = u.shape
    out = jnp.zeros((_nzpad(nz, tz) + 2, nyp, nxp), u.dtype)
    return out.at[1 : 1 + nz, 1 : 1 + ny, 1 : 1 + nx].set(u)


def assembly_weights3d(plan, Kq, nd, nq):
    """Host: W (nd*nd*27, 8, nq) from the Stencil3D plan + unit matrices."""
    Kq = np.asarray(Kq, np.float64)
    W = np.zeros((nd * nd * 27, 8, nq))
    for (ca, cb, dz, dy, dx, az, ay, ax, r, s) in plan:
        k = (ca * nd + cb) * 27 + dz * 9 + dy * 3 + dx
        W[k, az * 4 + ay * 2 + ax, :] += Kq[:, r, s]
    return W


def _kernel3d(*refs, nd, nyp, nxp, W, N, p, ney, nex, nez, sym_map=None,
              nyp_c=None):
    # refs: rho_t, rho_m, rho_b, m_t, m_m, m_b, cout, dout
    rho = refs[0:3]
    msk = refs[3:6]
    cout, dout = refs[6], refs[7]
    i = pl.program_id(0)

    nq = N.shape[0]
    YI, XI = nyp - 2, nxp - 2
    ey = jax.lax.broadcasted_iota(jnp.int32, (nyp - 1, nxp - 1), 0) - 1
    ex = jax.lax.broadcasted_iota(jnp.int32, (nyp - 1, nxp - 1), 1) - 1
    inplane = ((ey >= 0) & (ey < ney) & (ex >= 0) & (ex < nex)).astype(
        rho[0].dtype
    )

    # material at quad points for the two element slabs ez = i-1+s
    Cq = [[None] * nq for _ in range(2)]
    for s in range(2):
        ez = i - 1 + s
        zval = ((ez >= 0) & (ez < nez)).astype(rho[0].dtype)
        valid = zval * inplane
        for q in range(nq):
            acc = None
            for n, (nzo, nyo, nxo) in enumerate(_HEX8_LOCAL):
                t = float(N[q, n]) * rho[s + nzo][
                    0, nyo : nyo + nyp - 1, nxo : nxo + nxp - 1
                ]
                acc = t if acc is None else acc + t
            Cq[s][q] = valid * acc / (1.0 + p * (1.0 - acc))

    rowm = [msk[1][c, 0, 1 : 1 + YI, 1 : 1 + XI] for c in range(nd)]
    diags = [None] * nd
    zplane = jnp.zeros((nyp, nxp), rho[0].dtype)
    zplane_c = jnp.zeros((nyp_c or nyp, nxp), rho[0].dtype)
    for ca in range(nd):
        for cb in range(nd):
            for dz in range(3):
                for dy in range(3):
                    colm = msk[dz][cb, 0, dy : dy + YI, :]
                    for dx in range(3):
                        k = (ca * nd + cb) * 27 + dz * 9 + dy * 3 + dx
                        if sym_map is not None and k not in sym_map:
                            continue
                        ko = k if sym_map is None else sym_map[k]
                        acc = None
                        for o in range(8):
                            w = W[k, o]
                            if not np.any(w):
                                continue
                            az, r = divmod(o, 4)
                            ay, ax = divmod(r, 2)
                            for q in range(nq):
                                if w[q] == 0.0:
                                    continue
                                t = float(w[q]) * Cq[1 - az][q][
                                    1 - ay : 1 - ay + YI,
                                    1 - ax : 1 - ax + XI,
                                ]
                                acc = t if acc is None else acc + t
                        if acc is None:
                            plane = jnp.zeros((YI, XI), rho[0].dtype)
                        else:
                            plane = acc * rowm[ca] * colm[:, dx : dx + XI]
                        if ca == cb and dz == dy == dx == 1:
                            plane = plane + (1.0 - rowm[ca])
                            diags[ca] = plane
                        cout[0, ko] = zplane_c
                        cout[0, ko, 1 : 1 + YI, 1 : 1 + XI] = plane
    for c in range(nd):
        d = diags[c]
        dout[c, 0] = zplane
        dout[c, 0, 1 : 1 + YI, 1 : 1 + XI] = rowm[c] / jnp.where(
            d == 0.0, 1.0, d
        )


def _kernel3d_slab(*refs, nd, nyp, nxp, W, N, p, ney, nex, nez, atz,
                   want_lp=False, sym_map=None, nk=None, nyp_c=None):
    """atz output z-planes per program (amortizes per-op VPU overhead).

    refs: rho0, rho1, m0, m1, cout, dout[, lpout] — rho/mask arrive as
    two consecutive atz-blocks covering physical [i*atz, (i+2)*atz),
    i.e. logical z in [i*atz - 1, (i+2)*atz - 1): the one-plane halo
    each side of the output slab (atz >= 2 required).
    """
    if want_lp:
        rho0, rho1, m0, m1, cout, dout, lpout = refs
    else:
        rho0, rho1, m0, m1, cout, dout = refs
        lpout = None
    i = pl.program_id(0)

    nq = N.shape[0]
    YI, XI = nyp - 2, nxp - 2
    rho2 = jnp.concatenate([rho0[...], rho1[...]], axis=0)
    m2 = jnp.concatenate([m0[...], m1[...]], axis=1)
    fdt = rho2.dtype

    # material at quad points for the atz+1 element slabs
    # ez = i*atz - 1 + e_lz touching the output planes
    shp = (atz + 1, nyp - 1, nxp - 1)
    ey = jax.lax.broadcasted_iota(jnp.int32, shp, 1) - 1
    ex = jax.lax.broadcasted_iota(jnp.int32, shp, 2) - 1
    ezi = jax.lax.broadcasted_iota(jnp.int32, shp, 0) + (i * atz - 1)
    valid = (
        (ey >= 0) & (ey < ney) & (ex >= 0) & (ex < nex)
        & (ezi >= 0) & (ezi < nez)
    ).astype(fdt)
    Cq3 = []
    for q in range(nq):
        acc = None
        for n, (nzo, nyo, nxo) in enumerate(_HEX8_LOCAL):
            t = float(N[q, n]) * rho2[
                nzo : nzo + atz + 1,
                nyo : nyo + nyp - 1,
                nxo : nxo + nxp - 1,
            ]
            acc = t if acc is None else acc + t
        Cq3.append(valid * acc / (1.0 + p * (1.0 - acc)))

    rowm = [m2[c, 1 : 1 + atz, 1 : 1 + YI, 1 : 1 + XI] for c in range(nd)]
    diags = [None] * nd
    nk_out = nd * nd * 27 if nk is None else nk
    cout[...] = jnp.zeros((atz, nk_out, nyp_c or nyp, nxp), fdt)
    if lpout is not None:
        lpout[...] = jnp.zeros(
            (atz, nk_out, nyp_c or nyp, nxp), lpout.dtype
        )
    for ca in range(nd):
        for cb in range(nd):
            for dz in range(3):
                colm_z = m2[cb, dz : dz + atz]
                for dy in range(3):
                    colm = colm_z[:, dy : dy + YI, :]
                    for dx in range(3):
                        k = (ca * nd + cb) * 27 + dz * 9 + dy * 3 + dx
                        if sym_map is not None and k not in sym_map:
                            continue
                        ko = k if sym_map is None else sym_map[k]
                        acc = None
                        for o in range(8):
                            w = W[k, o]
                            if not np.any(w):
                                continue
                            az, r = divmod(o, 4)
                            ay, ax = divmod(r, 2)
                            for q in range(nq):
                                if w[q] == 0.0:
                                    continue
                                t = float(w[q]) * Cq3[q][
                                    1 - az : 1 - az + atz,
                                    1 - ay : 1 - ay + YI,
                                    1 - ax : 1 - ax + XI,
                                ]
                                acc = t if acc is None else acc + t
                        if acc is None:
                            continue
                        plane = acc * rowm[ca] * colm[:, :, dx : dx + XI]
                        if ca == cb and dz == dy == dx == 1:
                            plane = plane + (1.0 - rowm[ca])
                            diags[ca] = plane
                        cout[:, ko, 1 : 1 + YI, 1 : 1 + XI] = plane
                        if lpout is not None:
                            lpout[:, ko, 1 : 1 + YI, 1 : 1 + XI] = (
                                plane.astype(lpout.dtype)
                            )
    for c in range(nd):
        d = diags[c]
        dout[c] = jnp.zeros((atz, nyp, nxp), fdt)
        dout[c, :, 1 : 1 + YI, 1 : 1 + XI] = rowm[c] / jnp.where(
            d == 0.0, 1.0, d
        )


def _kernel3d_slab_mxu(*refs, nd, nyp, nxp, N, p, ney, nex, nez,
                       atz, want_lp=False, sym_map=None, nk=None,
                       nyp_c=None):
    """MXU variant of :func:`_kernel3d_slab`.

    The per-plane accumulation ``coeff[k] = sum_{o,q} W[k,o,q] *
    Cq3[q, shifted by o]`` is one ``(nk, 64) @ (64, pixels)`` matmul:
    the 8*nq shifted material volumes are built once per program
    (z/y slices are views; x shifts are lane rolls on full-width
    planes, wraparound killed by the element-validity mask), then the
    systolic array replaces the ~2.5k-term VPU accumulation that made
    the slab kernel compute-bound (~3x its write roofline at 65^3).
    """
    if want_lp:
        rho0, rho1, m0, m1, w2, cout, dout, lpout = refs
    else:
        rho0, rho1, m0, m1, w2, cout, dout = refs
        lpout = None
    i = pl.program_id(0)

    nq = N.shape[0]
    YI, XI = nyp - 2, nxp - 2
    rho2 = jnp.concatenate([rho0[...], rho1[...]], axis=0)
    m2 = jnp.concatenate([m0[...], m1[...]], axis=1)
    fdt = rho2.dtype

    # material at quad points, full lane width (atz+1, nyp-1, nxp)
    shp = (atz + 1, nyp - 1, nxp)
    ey = jax.lax.broadcasted_iota(jnp.int32, shp, 1) - 1
    ex = jax.lax.broadcasted_iota(jnp.int32, shp, 2) - 1
    ezi = jax.lax.broadcasted_iota(jnp.int32, shp, 0) + (i * atz - 1)
    valid = (
        (ey >= 0) & (ey < ney) & (ex >= 0) & (ex < nex)
        & (ezi >= 0) & (ezi < nez)
    ).astype(fdt)
    # x-rolled material volumes: Cro[q][ax][z, y, x] = Cq3[q][z, y,
    # x + 1 - ax] (roll wraparound lands outside the valid element
    # range and at sliced-off output columns)
    Cro = []
    for q in range(nq):
        acc = None
        for n, (nzo, nyo, nxo) in enumerate(_HEX8_LOCAL):
            t = rho2[nzo : nzo + atz + 1, nyo : nyo + nyp - 1, :]
            if nxo:
                # left-rotate by one lane: out[x] = in[x+1] (pltpu.roll
                # takes non-negative shifts; nxp-1 == -1 mod nxp)
                t = pltpu.roll(t, nxp - 1, 2)
            t = float(N[q, n]) * t
            acc = t if acc is None else acc + t
        cq = valid * acc / (1.0 + p * (1.0 - acc))
        Cro.append((pltpu.roll(cq, nxp - 1, 2), cq))  # ax = 0 (x+1), ax = 1
    # B: (8*nq, atz*YI*nxp) shifted-volume matrix (z/y slices = views)
    brows = []
    for o in range(8):
        az, r = divmod(o, 4)
        ay, ax = divmod(r, 2)
        for q in range(nq):
            brows.append(
                Cro[q][ax][1 - az : 1 - az + atz,
                           1 - ay : 1 - ay + YI, :]
            )
    Bm = jnp.stack(brows).reshape(8 * nq, atz * YI * nxp)
    nk_out = nd * nd * 27 if nk is None else nk
    O = jax.lax.dot_general(
        w2[...].astype(fdt), Bm, (((1,), (0,)), ((), ())),
        preferred_element_type=fdt,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(nk_out, atz, YI, nxp)

    rowm = [m2[c, 1 : 1 + atz, 1 : 1 + YI, 1 : 1 + XI] for c in range(nd)]
    diags = [None] * nd
    cout[...] = jnp.zeros((atz, nk_out, nyp_c or nyp, nxp), fdt)
    if lpout is not None:
        lpout[...] = jnp.zeros(
            (atz, nk_out, nyp_c or nyp, nxp), lpout.dtype
        )
    for ca in range(nd):
        for cb in range(nd):
            for dz in range(3):
                colm_z = m2[cb, dz : dz + atz]
                for dy in range(3):
                    colm = colm_z[:, dy : dy + YI, :]
                    for dx in range(3):
                        k = (ca * nd + cb) * 27 + dz * 9 + dy * 3 + dx
                        if sym_map is not None and k not in sym_map:
                            continue
                        ko = k if sym_map is None else sym_map[k]
                        plane = (
                            O[ko, :, :, 0:XI]
                            * rowm[ca]
                            * colm[:, :, dx : dx + XI]
                        )
                        if ca == cb and dz == dy == dx == 1:
                            plane = plane + (1.0 - rowm[ca])
                            diags[ca] = plane
                        cout[:, ko, 1 : 1 + YI, 1 : 1 + XI] = plane
                        if lpout is not None:
                            lpout[:, ko, 1 : 1 + YI, 1 : 1 + XI] = (
                                plane.astype(lpout.dtype)
                            )
    for c in range(nd):
        d = diags[c]
        dout[c] = jnp.zeros((atz, nyp, nxp), fdt)
        dout[c, :, 1 : 1 + YI, 1 : 1 + XI] = rowm[c] / jnp.where(
            d == 0.0, 1.0, d
        )


def assemble_pack_3d(rho_a, maskf_a, W, N, *, nd, p, nz, ny, nx, tz=1,
                     lp_dtype=None, sym=False, interpret=False,
                     mxu=True):
    """3D density grid -> packed eliminated coefficients + inv diagonal.

    Args:
        rho_a: ``pack_assembly_field3d(_, tz=tz)`` density.
        maskf_a: (nd, ...) free-dof mask, same packing.
        W: ``assembly_weights3d`` (numpy, static).
        N: (nq, 8) hex8 shape values (numpy, static).
        tz: z-planes per program (the pallas_smooth slab size).  tz > 1
            cuts the per-op VPU overhead of the 243-plane accumulation
            (each op then works on tz*ny*nx elements).
        lp_dtype: also emit the low-precision smoother copy in-kernel
            (slab path only; the tz=1 path falls back to a cast).

    Returns:
        (coeff_k, invd_k[, coeff_lp_k]): z-major (nz_pad, nk, ny+2, nxp)
        coefficients, (nd, nz_pad, ny+2, nxp) diagonal — the
        ``pallas_smooth`` 3D layouts (z-major keeps the sweep kernels'
        z-window DMAs contiguous).
    """
    from .pallas_smooth import _geom3d, _nyp8, _nzpad, sym_planes_3d

    W = np.asarray(W)
    N = np.asarray(N)
    nyp, nxp = _geom3d(ny, nx)
    nz_pad = _nzpad(nz, tz)
    sym_map = None
    nyp_c = nyp
    if sym:
        sym_map = {
            k: si for si, (k, *_r) in enumerate(sym_planes_3d(nd))
        }
        nyp_c = _nyp8(ny)  # sym consumers DMA 8-aligned row windows
    nk = nd * nd * 27 if sym_map is None else len(sym_map)
    # sym consumers need forward z-halo planes: the single-sweep kernel
    # reads +1, the multi-sweep kernel (fused_sweeps3d) up to
    # SWEEP3_ZEXT.  Emit enough extra (all-zero-mask) z-tiles that the
    # packed array has >= nz_pad + SWEEP3_ZEXT planes without an extra
    # full-array pad-copy (tile count fixed up per-path below).
    from .pallas_smooth import SWEEP3_ZEXT

    zext_planes = SWEEP3_ZEXT if sym else 0
    zext_tiles = zext_planes
    dt = rho_a.dtype

    blk = lambda d0: pl.BlockSpec(
        (d0, 1, nyp, nxp), lambda i: (0, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    rblk = lambda off: pl.BlockSpec(
        (1, nyp, nxp), lambda i, o=off: (i + o, 0, 0),
        memory_space=pltpu.VMEM,
    )
    mblk = lambda off: pl.BlockSpec(
        (nd, 1, nyp, nxp), lambda i, o=off: (0, i + o, 0, 0),
        memory_space=pltpu.VMEM,
    )
    kern = functools.partial(
        _kernel3d, nd=nd, nyp=nyp, nxp=nxp, W=W, N=N, p=float(p),
        ney=ny - 1, nex=nx - 1, nez=nz - 1, sym_map=sym_map,
        nyp_c=nyp_c,
    )
    esize = np.dtype(dt).itemsize
    # double-buffered windows: coeff (+ bf16 lp copy) outputs at nyp_c
    # rows, rho/mask inputs, plus the kernel's Cq3 material volumes.
    # The assembly slab granularity atz is decoupled from the layout
    # tz (the smoother's z-tile): pick the largest divisor of tz whose
    # buffers fit the VMEM budget — the emitted arrays have the same
    # layout either way.
    lp_frac = 0.5 if lp_dtype is not None else 0.0
    slab_bytes = lambda a: (
        2 * a * nxp * esize
        * (int(nk * nyp_c * (1 + lp_frac)) + (3 * nd + 3) * nyp)
        + 8 * (a + 1) * nyp * nxp * esize
    )
    # Mosaic's scoped-VMEM stack runs ~2.5x the window estimate (it
    # stacks unrolled temporaries beyond the declared buffers), so the
    # budget keeps 3x + margin under the 128 MB VMEM.
    atz = max(tz, 2)  # tz=1 layouts still assemble in 2-plane slabs
    while atz >= 2 and slab_bytes(atz) > 36 * 1024 * 1024:
        atz //= 2
    if atz >= 2:
        # slab kernel: atz output planes per program, rho/mask as two
        # consecutive atz-blocks covering the one-plane z-halo.  The
        # output z-extent rounds nz_pad up to the slab grid (padding
        # planes carry zero coefficients; consumers never read past
        # their own z-extent).
        slab_buf = slab_bytes(atz)
        if mxu:
            # B + O matmul operands live alongside the output buffers
            slab_buf += (8 * N.shape[0] + nk + 16) * atz * nyp * nxp * esize
        zext_tiles = -(-zext_planes // atz)
        grid = -(-nz_pad // atz) + zext_tiles
        nz_out = grid * atz
        P = (grid + 1) * atz
        padz = P - int(rho_a.shape[0])
        if padz > 0:
            rho_a = jnp.pad(rho_a, ((0, padz), (0, 0), (0, 0)))
            maskf_a = jnp.pad(
                maskf_a, ((0, 0), (0, padz), (0, 0), (0, 0))
            )
        sblk = lambda d0: pl.BlockSpec(
            (d0, atz, nyp, nxp), lambda i: (0, i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        srblk = lambda off: pl.BlockSpec(
            (atz, nyp, nxp), lambda i, o=off: (i + o, 0, 0),
            memory_space=pltpu.VMEM,
        )
        smblk = lambda off: pl.BlockSpec(
            (nd, atz, nyp, nxp), lambda i, o=off: (0, i + o, 0, 0),
            memory_space=pltpu.VMEM,
        )
        w2_in = None
        if mxu:
            # ko-ordered (nk, 8*nq) weight matrix for the MXU variant,
            # passed as a (tiny, replicated) kernel input
            nq = N.shape[0]
            if sym_map is None:
                korder = range(nd * nd * 27)
            else:
                korder = sorted(sym_map, key=sym_map.get)
            w2_in = jnp.asarray(
                W.reshape(nd * nd * 27, 8 * nq)[list(korder)],
                jnp.float32,
            )
            kern = functools.partial(
                _kernel3d_slab_mxu, nd=nd, nyp=nyp, nxp=nxp,
                N=N, p=float(p), ney=ny - 1, nex=nx - 1, nez=nz - 1,
                atz=atz, want_lp=lp_dtype is not None, sym_map=sym_map,
                nk=nk, nyp_c=nyp_c,
            )
        else:
            kern = functools.partial(
                _kernel3d_slab, nd=nd, nyp=nyp, nxp=nxp, W=W, N=N,
                p=float(p), ney=ny - 1, nex=nx - 1, nez=nz - 1, atz=atz,
                want_lp=lp_dtype is not None, sym_map=sym_map, nk=nk,
                nyp_c=nyp_c,
            )
        scblk = lambda d0: pl.BlockSpec(
            (atz, d0, nyp_c, nxp), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_specs = [scblk(nk), sblk(nd)]
        out_shape = [
            jax.ShapeDtypeStruct((nz_out, nk, nyp_c, nxp), dt),
            jax.ShapeDtypeStruct((nd, nz_out, nyp, nxp), dt),
        ]
        if lp_dtype is not None:
            out_specs.append(scblk(nk))
            out_shape.append(
                jax.ShapeDtypeStruct((nz_out, nk, nyp_c, nxp), lp_dtype)
            )
        in_specs = [srblk(0), srblk(1), smblk(0), smblk(1)]
        ins = [rho_a, rho_a, maskf_a, maskf_a]
        if w2_in is not None:
            in_specs.append(pl.BlockSpec(
                w2_in.shape, lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ))
            ins.append(w2_in)
        with jax.enable_x64(False):
            outs = pl.pallas_call(
                kern,
                grid=(grid,),
                in_specs=in_specs,
                out_specs=tuple(out_specs),
                out_shape=tuple(out_shape),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=min(
                        128 * 1024 * 1024,
                        3 * slab_buf + (1 << 24),
                    )
                ),
                interpret=interpret,
            )(*ins)
        return outs

    buf = 2 * (nk + nd + 3 + 3 * nd) * nyp * nxp * esize
    if zext_tiles:
        # the extra all-zero forward-halo plane shifts the input
        # windows one past the packed extent (tiny arrays — pad-copy)
        rho_a = jnp.pad(rho_a, ((0, zext_tiles), (0, 0), (0, 0)))
        maskf_a = jnp.pad(
            maskf_a, ((0, 0), (0, zext_tiles), (0, 0), (0, 0))
        )
    cblk = lambda d0: pl.BlockSpec(
        (1, d0, nyp_c, nxp), lambda i: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    with jax.enable_x64(False):
        coeff_k, invd_k = pl.pallas_call(
            kern,
            grid=(nz_pad + zext_tiles,),
            in_specs=[rblk(0), rblk(1), rblk(2), mblk(0), mblk(1),
                      mblk(2)],
            out_specs=(cblk(nk), blk(nd)),
            out_shape=(
                jax.ShapeDtypeStruct(
                    (nz_pad + zext_tiles, nk, nyp_c, nxp), dt
                ),
                jax.ShapeDtypeStruct(
                    (nd, nz_pad + zext_tiles, nyp, nxp), dt
                ),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(
                    100 * 1024 * 1024, 2 * buf + (1 << 24)
                )
            ),
            interpret=interpret,
        )(rho_a, rho_a, rho_a, maskf_a, maskf_a, maskf_a)
    if lp_dtype is not None:
        return coeff_k, invd_k, coeff_k.astype(lp_dtype)
    return coeff_k, invd_k
