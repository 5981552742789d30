"""On-the-fly (OTF) 3D GMG kernels: stencil application without
materialized coefficient arrays.

The assembled path (ops.pallas_assemble + ops.pallas_smooth) writes the
~123-plane sym coefficient volume once per solve (~460 MB at 65^3 with
the bf16 copy) and re-reads it on every sweep / residual / matvec — the
dominant HBM traffic of the 3D solve.  On uniform grids the coefficient
at node i factors through the quadrature unit matrices
(``GMGAssembler.unit_matrices``; the reference's einsum kernel role,
pyfem.py:2016-2027):

    coeff[(ca, cb, d)][i] = rowm_ca[i] * colm_cb_d[i] *
                            sum_j W[(ca, cb, d), j] * B_j[i]  (+ diag fix)

with B_j[i] = RAMP(N_q . rho)[element i - o_j], j = (o, q) over the
8 element offsets x nq quadrature points.  With masked fields (the
V-cycle invariant) colm folds into x, and the stencil application
collapses to two small matmuls per component:

    A x [ca] = rowm_ca * sum_j B_j * Z_j^ca + (1 - rowm_ca) * x[ca]
    Z^ca = w3[ca] @ Y,    Y_m[i] = x[cb][i + d - 1]

so one kernel rebuilds the coefficients from the (tiny) density grid on
the MXU per tile instead of streaming them from HBM: per-apply traffic
drops from one coefficient-volume read (~190-380 MB) to the field
vectors (~25 MB).  The identity (and the diagonal's) is gated against
the assembled operator in tests.

Same z-tiling / ghost-zone scheme as ``pallas_smooth.fused_sweeps3d``;
requires masked fields and uniform geometry (the creator's grids — the
same precondition as ``assemble_uniform``).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_smooth import _geom3d, _nzpad, _omega_seq, halo_sweeps_3d
from .stencil import _HEX8_LOCAL

__all__ = ["otf_weights", "otf_apply_3d", "otf_budget_ok"]


def otf_weights(plan, Kq, nd, nq):
    """Host: (w3, wd) OTF weight tables from the Stencil3D plan.

    w3: (nd, 8*nq, nd*27) — Z^ca = w3[ca] @ Y.
    wd: (nd, 8*nq) — diag[ca] = rowm * (wd[ca] . B) + (1 - rowm).
    """
    from .pallas_assemble import assembly_weights3d

    W = assembly_weights3d(plan, Kq, nd, nq)  # (nd*nd*27, 8, nq)
    W2 = W.reshape(nd, nd * 27, 8 * nq)
    w3 = np.ascontiguousarray(np.swapaxes(W2, 1, 2)).astype(np.float32)
    wd = np.stack(
        [W2[ca, ca * 27 + 13] for ca in range(nd)]
    ).astype(np.float32)
    return w3, wd


def otf_budget_ok(niter, x0_zero, want_resid, tz):
    """z-budget rule: the x0=0 elementwise stage needs invd (hence the
    element build) one plane wider than the stencil stages."""
    consumed = max(halo_sweeps_3d(niter, x0_zero, want_resid), 1)
    lim = tz - 1 if (x0_zero and niter > 0) else tz
    return 1 <= consumed <= lim


def _kernel_otf(*refs, nd, nq8, N, nyp, nxp, niter, x0_zero, want_resid,
                neg_resid, omega, p, tz, consumed, nez, ney, nex,
                mxu_bf16):
    # refs: r0..2, m0..2, w3, wd, (b0..2)?, (x0..2)?, [xout?, rout?], xw
    idx = 0
    r3 = refs[idx : idx + 3]; idx += 3
    m3 = refs[idx : idx + 3]; idx += 3
    w3 = refs[idx]; idx += 1
    wd = refs[idx]; idx += 1
    b3 = None
    if niter > 0:
        b3 = refs[idx : idx + 3]; idx += 3
    x3 = None
    if not x0_zero:
        x3 = refs[idx : idx + 3]; idx += 3
    xout = None
    if niter > 0:
        xout = refs[idx]; idx += 1
    rout = None
    if want_resid:
        rout = refs[idx]; idx += 1
    xw = refs[idx]

    i = pl.program_id(0)
    OFF = consumed
    YI, XI = nyp - 2, nxp - 2

    rcat = jnp.concatenate([r[...] for r in r3], axis=0)
    mcat = jnp.concatenate([r[...] for r in m3], axis=1)
    fdt = rcat.dtype
    mdt = jnp.bfloat16 if mxu_bf16 else fdt
    prec = None if mxu_bf16 else jax.lax.Precision.HIGHEST
    bcat = (
        jnp.concatenate([r[...] for r in b3], axis=1)
        if b3 is not None else None
    )

    def rollp(a, s):  # out[i] = a[i + s] (lane axis), any integer s
        return a if s == 0 else pltpu.roll(a, (nxp - s) % nxp, 2)

    # ---- B volumes + inverse diagonal over the widest stage extent --
    # stencil stages reach +-(consumed-1); the x0=0 elementwise stage
    # additionally needs invd at +-consumed
    gB = consumed if (x0_zero and niter > 0) else consumed - 1
    zlo, zhi = OFF - gB, OFF + tz + gB  # node planes (xw coords)
    nB = zhi - zlo
    # elements touching those nodes: xw planes [zlo-1, zhi); rho nodes
    # [zlo-1, zhi+1) -> rcat [zlo-1-OFF+tz, ...): needs consumed <= tz
    # (x0 given) / consumed <= tz-1 (x0 zero) — see otf_budget_ok
    shp = (nB + 1, nyp - 1, nxp)
    eyi = jax.lax.broadcasted_iota(jnp.int32, shp, 1) - 1
    exi = jax.lax.broadcasted_iota(jnp.int32, shp, 2) - 1
    ezi = jax.lax.broadcasted_iota(jnp.int32, shp, 0) + (
        i * tz + zlo - 1 - OFF
    )
    valid = (
        (eyi >= 0) & (eyi < ney) & (exi >= 0) & (exi < nex)
        & (ezi >= 0) & (ezi < nez)
    ).astype(fdt)
    e0 = zlo - 1 - OFF + tz  # rcat plane of C plane 0's low node
    nq = N.shape[0]
    # everything below is phys-x-aligned: array col c is packed col c
    # (logical x = c - 1), so the masks multiply with no lane shift.
    # C volume plane c holds element ez = c-1 (same for y/x), so
    # B_j[i] = C[i - o]: a +o roll backwards on lanes, slices in z/y.
    Cro = []
    for q in range(nq):
        acc = None
        for n, (nzo, nyo, nxo) in enumerate(_HEX8_LOCAL):
            t = rcat[e0 + nzo : e0 + nzo + nB + 1,
                     nyo : nyo + nyp - 1, :]
            t = float(N[q, n]) * rollp(t, nxo)
            acc = t if acc is None else acc + t
        cq = valid * acc / (1.0 + p * (1.0 - acc))
        Cro.append((cq, rollp(cq, -1)))  # index by ax: 1 reads x-1
    brows = []
    for o in range(8):
        az, r = divmod(o, 4)
        ay, ax = divmod(r, 2)
        for q in range(nq):
            brows.append(
                Cro[q][ax][1 - az : 1 - az + nB,
                           1 - ay : 1 - ay + YI, :]
            )
    B = jnp.stack(brows)  # (nq8, nB, YI, nxp)
    Bm = B.astype(mdt).reshape(nq8, nB * YI * nxp)

    rowm_w = [
        mcat[c, tz + zlo - OFF : tz + zhi - OFF, 1 : 1 + YI, :]
        for c in range(nd)
    ]  # (nB, YI, nxp) full width (zero at padding)

    invd = None
    if niter > 0:
        dm = jax.lax.dot_general(
            wd[...].astype(mdt), Bm, (((1,), (0,)), ((), ())),
            preferred_element_type=fdt, precision=prec,
        ).reshape(nd, nB, YI, nxp)
        invd = []
        for c in range(nd):
            d = rowm_w[c] * dm[c] + (1.0 - rowm_w[c])
            invd.append(rowm_w[c] / jnp.where(d == 0.0, 1.0, d))

    def fld(cat, c, z0, z1):
        lo = z0 - OFF + tz
        return cat[c, lo : lo + (z1 - z0), 1 : 1 + YI, :]

    def applyA(z0, z1):
        """A xw on xw planes [z0, z1), full width (cols >= 1+XI junk)."""
        n = z1 - z0
        rows = []
        for cb in range(nd):
            xv = xw[cb, z0 - 1 : z1 + 1]
            for dz in range(3):
                xz = xv[dz : dz + n]
                for dy in range(3):
                    base = xz[:, dy : dy + YI, :]
                    # Y_m[i] = x[phys i + dx - 1]
                    rows.extend(
                        [rollp(base, -1), base, rollp(base, 1)]
                    )
        Y = jnp.stack(rows)  # (nd*27, n, YI, nxp)
        Ym = Y.astype(mdt).reshape(nd * 27, n * YI * nxp)
        co = z0 - zlo
        outs = []
        for ca in range(nd):
            Z = jax.lax.dot_general(
                w3[ca].astype(mdt), Ym, (((1,), (0,)), ((), ())),
                preferred_element_type=fdt, precision=prec,
            ).reshape(nq8, n, YI, nxp)
            acc = None
            for j in range(nq8):
                t = B[j, co : co + n] * Z[j]
                acc = t if acc is None else acc + t
            rm = rowm_w[ca][co : co + n]
            outs.append(
                rm * acc + (1.0 - rm) * xw[ca, z0:z1, 1 : 1 + YI, :]
            )
        return outs

    # ---- stages (same scheme as pallas_smooth._kernel3d_multi) ------
    sw0 = 0
    sweeps = niter
    if x0_zero:
        xw[:] = jnp.zeros(xw.shape, xw.dtype)
        # elementwise first sweep on the full invd extent [zlo, zhi)
        for c in range(nd):
            xw[c, zlo:zhi, 1 : 1 + YI, :] = (
                omega[0] * invd[c] * fld(bcat, c, zlo, zhi)
            )
        sw0 = 1
        sweeps = niter - 1
    else:
        xcat = jnp.concatenate([r[...] for r in x3], axis=1)
        xw[:] = xcat[:, tz - OFF : 2 * tz + OFF]

    g = consumed - 1
    for sw in range(max(sweeps, 0)):
        z0, z1 = OFF - g, OFF + tz + g
        accs = applyA(z0, z1)
        co = z0 - zlo
        for c in range(nd):
            upd = omega[sw0 + sw] * invd[c][co : co + (z1 - z0)] * (
                fld(bcat, c, z0, z1) - accs[c]
            )
            xw[c, z0:z1, 1 : 1 + YI, :] = (
                xw[c, z0:z1, 1 : 1 + YI, :] + upd
            )
        g -= 1

    if xout is not None:
        # xw's padding rows/cols stayed zero (invd is zero there), so
        # the output tile is a plain copy
        for c in range(nd):
            xout[c] = xw[c, OFF : OFF + tz]
    if rout is not None:
        # accs are clean at padding (rowm zero there, xw zero), so the
        # residual rows write full width
        accs = applyA(OFF, OFF + tz)
        for c in range(nd):
            a = accs[c]
            if bcat is not None:
                bv = fld(bcat, c, OFF, OFF + tz)
                v = (a - bv) if neg_resid else (bv - a)
            else:
                v = a if neg_resid else -a
            rout[c] = jnp.zeros((tz, nyp, nxp), fdt)
            rout[c, :, 1 : 1 + YI, :] = v


def otf_apply_3d(rho_k1, maskf_k1, w3, wd, b_k1=None, x_k1=None, *,
                 niter=0, want_resid=True, neg_resid=False, omega=0.6,
                 p=0.0, tz=4, shape=None, nd=3, mxu_bf16=False,
                 interpret=False):
    """OTF stencil application / fused sweeps on zpad=1 packed fields.

    niter=0, want_resid=True, x_k1 given, b_k1=None, neg_resid=True is
    the plain matvec ``A x``; niter>0 runs damped-Jacobi sweeps with
    the coefficient rebuild on the MXU (mxu_bf16=True is for
    preconditioner-internal calls under flexible PCG — the bf16
    single-pass matmul replaces the bf16 coefficient copy of the
    assembled path).

    Args:
        rho_k1: (nz_pad + 2tz, nyp, nxp) packed density
            (``pack_field3d(rho[None], zpad=1, tz)[0]``).
        maskf_k1: (nd, nz_pad + 2tz, nyp, nxp) packed free-dof mask
            (1.0 free / 0.0 fixed-or-padding).
        w3, wd: ``otf_weights`` tables (jnp arrays).
        b_k1, x_k1: packed rhs / initial iterate (zpad=1); fields must
            be zero at constrained dofs.
        shape: (nz, ny, nx) logical grid (element-validity bounds).

    Returns: x_out and/or r_out, plain layout (nd, nz_pad, nyp, nxp).
    """
    from ..elements import get_element

    nz, ny, nx = shape
    nyp, nxp = _geom3d(ny, nx)
    nzp = _nzpad(nz, tz)
    x0_zero = x_k1 is None
    assert not (x0_zero and niter == 0)
    assert otf_budget_ok(niter, x0_zero, want_resid, tz), (
        f"otf_apply_3d: niter={niter} (x0_zero={x0_zero}, "
        f"want_resid={want_resid}) exceeds the tz={tz} z budget"
    )
    consumed = max(halo_sweeps_3d(niter, x0_zero, want_resid), 1)
    n_tiles = nzp // tz
    nq8 = int(w3.shape[1])
    N = np.asarray(get_element("hex8").shape_vals, np.float64)

    xblk = lambda off, d0: pl.BlockSpec(
        (d0, tz, nyp, nxp), lambda i, o=off: (0, i + o, 0, 0),
        memory_space=pltpu.VMEM,
    )
    rblk = lambda off: pl.BlockSpec(
        (tz, nyp, nxp), lambda i, o=off: (i + o, 0, 0),
        memory_space=pltpu.VMEM,
    )
    wblk = lambda a: pl.BlockSpec(
        a.shape, lambda i, nd_=a.ndim: (0,) * nd_,
        memory_space=pltpu.VMEM,
    )
    inputs = [rho_k1] * 3 + [maskf_k1] * 3 + [w3, wd]
    in_specs = [rblk(0), rblk(1), rblk(2),
                xblk(0, nd), xblk(1, nd), xblk(2, nd),
                wblk(w3), wblk(wd)]
    if niter > 0:
        assert b_k1 is not None
        inputs += [b_k1] * 3
        in_specs += [xblk(0, nd), xblk(1, nd), xblk(2, nd)]
    if not x0_zero:
        inputs += [x_k1] * 3
        in_specs += [xblk(0, nd), xblk(1, nd), xblk(2, nd)]

    dt = rho_k1.dtype
    fld_shape = jax.ShapeDtypeStruct((nd, nzp, nyp, nxp), dt)
    oblk = pl.BlockSpec(
        (nd, tz, nyp, nxp), lambda i: (0, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape, out_specs = [], []
    if niter > 0:
        out_shape.append(fld_shape)
        out_specs.append(oblk)
    if want_resid:
        out_shape.append(fld_shape)
        out_specs.append(oblk)

    WZ = tz + 2 * consumed
    scratch = [pltpu.VMEM((nd, WZ, nyp, nxp), dt)]

    kern = functools.partial(
        _kernel_otf, nd=nd, nq8=nq8, N=N, nyp=nyp, nxp=nxp,
        niter=niter, x0_zero=x0_zero, want_resid=want_resid,
        neg_resid=neg_resid, omega=_omega_seq(omega, niter),
        p=float(p), tz=tz,
        consumed=consumed, nez=nz - 1, ney=ny - 1, nex=nx - 1,
        mxu_bf16=bool(mxu_bf16),
    )
    # the matmul operands (B, Y, Z) dominate VMEM; they are values
    # (Mosaic stack), so the limit is sized from their footprint
    nB = tz + 2 * (consumed if (x0_zero and niter > 0)
                   else consumed - 1)
    vals = (
        (2 * nq8 + nd * 27 + 2 * N.shape[0]) * (nB + 2) * nyp * nxp * 4
        + nd * WZ * nyp * nxp * 4 * 2
    )
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
                    120 * 1024 * 1024, int(1.7 * vals) + (1 << 25)
                )
            ),
            interpret=interpret,
        )(*inputs)
    return out
