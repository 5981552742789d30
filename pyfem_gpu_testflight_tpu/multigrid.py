"""Geometric multigrid preconditioning on structured grids.

The reference leans on pyamg's algebraic multigrid (pyfem.py:1060, 2098,
2397) — a host C++ dependency with no TPU analogue.  On the structured
meshes the framework (and the reference's own benchmarks) actually use,
*geometric* multigrid is the TPU-natural replacement:

* every level's operator is a DIA (stencil) matrix -> SpMV is shifted
  contiguous multiply-adds (``ops.dia``);
* prolongation is bilinear interpolation on the (ny, nx[, nz]) node
  grid (reshape/interleave form by default — see restrict2d_il);
  restriction is its exact transpose (the FEM Galerkin convention —
  nested coarse bases) so the V-cycle is a symmetric (SPD)
  preconditioner for CG;
* smoothing is damped Jacobi (symmetric pre+post), fused Pallas
  kernels when ``pallas_smooth`` is on (optionally with bfloat16
  coefficient copies); the coarsest level is solved by dense Cholesky
  or smoothed to death;
* coarse operators are *rediscretized* on the coarse ProblemCreator
  grids (cheap — the whole assembly pipeline is a few einsums), with
  nodal densities restricted by injection.

All of it is jit-traceable; one V-cycle-preconditioned CG solve is a
single XLA program.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .ops.stencil import Stencil2D, Stencil3D

__all__ = [
    "Level",
    "GMG",
    "GMGAssembler",
    "GMGAssembler3D",
    "prolong2d",
    "restrict2d",
    "prolong2d_il",
    "restrict2d_il",
    "prolong3d_il",
    "restrict3d_il",
    "prolong3d",
    "restrict3d",
    "build_elasticity_gmg",
    "build_poisson_gmg",
    "pcg",
]


# ---------------------------------------------------------------------------
# Grid transfer operators (2D bilinear P and R = P^T / 4)
# ---------------------------------------------------------------------------


def prolong2d(c, fine_shape):
    """Bilinear prolongation (d, nyc, nxc) -> (d, nyf, nxf).

    Component-leading (planar) layout keeps the x axis on the 128 lanes.
    Requires nyf = 2*nyc - 1, nxf = 2*nxc - 1.
    """
    nyf, nxf = fine_shape
    d = c.shape[0]
    f = jnp.zeros((d, nyf, nxf), dtype=c.dtype)
    f = f.at[:, 0::2, 0::2].set(c)
    f = f.at[:, 1::2, 0::2].set(0.5 * (c[:, :-1] + c[:, 1:]))
    f = f.at[:, 0::2, 1::2].set(0.5 * (c[:, :, :-1] + c[:, :, 1:]))
    f = f.at[:, 1::2, 1::2].set(
        0.25 * (c[:, :-1, :-1] + c[:, 1:, :-1] + c[:, :-1, 1:]
                + c[:, 1:, 1:])
    )
    return f


def restrict2d(f, coarse_shape):
    """Restriction R = prolong2d^T exactly.

    FEM Galerkin convention: nested bilinear coarse basis functions are
    combinations of fine ones, so A_c = P^T A_f P with *no* extra
    scaling (the 1/4 "full weighting" factor is a finite-difference
    convention and breaks the coarse correction here).
    """
    nyc, nxc = coarse_shape
    d = f.shape[0]
    c = jnp.zeros((d, nyc, nxc), dtype=f.dtype)
    c = c + f[:, 0::2, 0::2]
    e = f[:, 1::2, 0::2]  # (d, nyc-1, nxc)
    c = c.at[:, :-1].add(0.5 * e)
    c = c.at[:, 1:].add(0.5 * e)
    e = f[:, 0::2, 1::2]  # (d, nyc, nxc-1)
    c = c.at[:, :, :-1].add(0.5 * e)
    c = c.at[:, :, 1:].add(0.5 * e)
    e = f[:, 1::2, 1::2]  # (d, nyc-1, nxc-1)
    c = c.at[:, :-1, :-1].add(0.25 * e)
    c = c.at[:, 1:, :-1].add(0.25 * e)
    c = c.at[:, :-1, 1:].add(0.25 * e)
    c = c.at[:, 1:, 1:].add(0.25 * e)
    return c


def _deinterleave2(a, axis):
    """Split even/odd elements along axis (input padded to even length)."""
    n = a.shape[axis]
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, n % 2)
    a = jnp.pad(a, pad)
    shape = list(a.shape)
    shape[axis] = shape[axis] // 2
    shape.insert(axis + 1, 2)
    a = a.reshape(shape)
    idx_e = [slice(None)] * a.ndim
    idx_o = [slice(None)] * a.ndim
    idx_e[axis + 1] = 0
    idx_o[axis + 1] = 1
    return a[tuple(idx_e)], a[tuple(idx_o)]


def _interleave2(e, o, axis, out_len):
    """Interleave e/o along axis and trim to out_len."""
    st = jnp.stack([e, o], axis=axis + 1)
    shape = list(e.shape)
    shape[axis] = 2 * shape[axis]
    out = st.reshape(shape)
    idx = [slice(None)] * out.ndim
    idx[axis] = slice(0, out_len)
    return out[tuple(idx)]


def _shift_pad(a, axis, before):
    """Shift by one along axis, zero-filling (before=True shifts down)."""
    pad = [(0, 0)] * a.ndim
    idx = [slice(None)] * a.ndim
    if before:
        pad[axis] = (1, 0)
        idx[axis] = slice(0, a.shape[axis])
    else:
        pad[axis] = (0, 1)
        idx[axis] = slice(1, a.shape[axis] + 1)
    return jnp.pad(a, pad)[tuple(idx)]


def restrict2d_il(f, coarse_shape):
    """Reshape/interleave-based restriction, identical to restrict2d.

    No convolutions and no strided slice assignments: mixing either
    with Pallas custom calls in one program was measured pathologically
    slow (per-iteration relayouts) or faulted the TPU runtime.
    """
    nyc, nxc = coarse_shape
    rows_e, rows_o = _deinterleave2(f, 1)      # even/odd rows
    F00, F01 = _deinterleave2(rows_e[:, :nyc], 2)
    F10, F11 = _deinterleave2(rows_o, 2)
    F00, F01 = F00[:, :, :nxc], F01[:, :, : nxc - 1]
    F10 = F10[:, : nyc - 1, :nxc]
    F11 = F11[:, : nyc - 1, : nxc - 1]
    c = F00
    c = c + 0.5 * (
        jnp.pad(F10, ((0, 0), (1, 0), (0, 0)))
        + jnp.pad(F10, ((0, 0), (0, 1), (0, 0)))
    )
    c = c + 0.5 * (
        jnp.pad(F01, ((0, 0), (0, 0), (1, 0)))
        + jnp.pad(F01, ((0, 0), (0, 0), (0, 1)))
    )
    q = jnp.pad(F11, ((0, 0), (0, 1), (0, 1)))
    c = c + 0.25 * (
        q
        + _shift_pad(q, 1, True)
        + _shift_pad(q, 2, True)
        + _shift_pad(_shift_pad(q, 1, True), 2, True)
    )
    return c


def prolong2d_il(c, fine_shape):
    """Reshape/interleave-based prolongation, identical to prolong2d."""
    nyf, nxf = fine_shape
    colavg = 0.5 * (c[:, :, :-1] + c[:, :, 1:])
    colavg = jnp.pad(colavg, ((0, 0), (0, 0), (0, 1)))
    ce = _interleave2(c, colavg, 2, nxf)       # even rows, full width
    rowavg = 0.5 * (ce[:, :-1] + ce[:, 1:])
    rowavg = jnp.pad(rowavg, ((0, 0), (0, 1), (0, 0)))
    return _interleave2(ce, rowavg, 1, nyf)


def restrict_axis_il(f, axis, nc):
    """One separable tent-restriction step along ``axis`` (global pads)."""
    e, o = _deinterleave2(f, axis)
    idx = [slice(None)] * e.ndim
    idx[axis] = slice(0, nc)
    e = e[tuple(idx)]
    idx[axis] = slice(0, nc - 1)
    o = o[tuple(idx)]
    pb = [(0, 0)] * f.ndim
    pa = [(0, 0)] * f.ndim
    pb[axis] = (1, 0)
    pa[axis] = (0, 1)
    return e + 0.5 * (jnp.pad(o, pb) + jnp.pad(o, pa))


def prolong_axis_il(c, axis, nf):
    """One separable tent-prolongation step along ``axis``."""
    lo = [slice(None)] * c.ndim
    hi = [slice(None)] * c.ndim
    lo[axis] = slice(0, c.shape[axis] - 1)
    hi[axis] = slice(1, c.shape[axis])
    avg = 0.5 * (c[tuple(lo)] + c[tuple(hi)])
    pa = [(0, 0)] * c.ndim
    pa[axis] = (0, 1)
    avg = jnp.pad(avg, pa)
    return _interleave2(c, avg, axis, nf)


def restrict3d_il(f, coarse_shape):
    """3D reshape/interleave restriction, identical to restrict3d.

    Separable tent: deinterleave the three spatial axes into the eight
    parity blocks, then accumulate each block at its 2^k shifted
    positions with weight 2^-k — pads and adds only.
    """
    parts = [(f, ())]
    for i, nc in enumerate(coarse_shape):
        axis = 1 + i
        new = []
        for a, par in parts:
            e, o = _deinterleave2(a, axis)
            idx = [slice(None)] * e.ndim
            idx[axis] = slice(0, nc)
            e = e[tuple(idx)]
            idx[axis] = slice(0, nc - 1)
            o = o[tuple(idx)]
            new += [(e, par + (0,)), (o, par + (1,))]
        parts = new
    c = None
    for a, par in parts:
        terms = [a]
        for i, p in enumerate(par):
            if not p:
                continue
            axis = 1 + i
            nxt = []
            for t in terms:
                pb = [(0, 0)] * t.ndim
                pa = [(0, 0)] * t.ndim
                pb[axis] = (1, 0)
                pa[axis] = (0, 1)
                nxt += [jnp.pad(t, pb), jnp.pad(t, pa)]
            terms = nxt
        w = 2.0 ** -sum(par)
        s = terms[0]
        for t in terms[1:]:
            s = s + t
        c = w * s if c is None else c + w * s
    return c


def prolong3d_il(c, fine_shape):
    """3D reshape/interleave prolongation, identical to prolong3d."""
    out = c
    for i, nf in enumerate(fine_shape):
        axis = 1 + i
        lo = [slice(None)] * out.ndim
        hi = [slice(None)] * out.ndim
        lo[axis] = slice(0, out.shape[axis] - 1)
        hi[axis] = slice(1, out.shape[axis])
        avg = 0.5 * (out[tuple(lo)] + out[tuple(hi)])
        pa = [(0, 0)] * out.ndim
        pa[axis] = (0, 1)
        avg = jnp.pad(avg, pa)
        out = _interleave2(out, avg, axis, nf)
    return out


# Tent (bilinear/trilinear) kernels: restriction is a stride-2 conv,
# prolongation its exact transpose (conv_transpose) — XLA's conv path is
# far faster on TPU than the equivalent strided slice assignments.
_TENT = np.array([0.5, 1.0, 0.5])


def _tent_kernel(ndim, dtype):
    k = _TENT
    for _ in range(ndim - 1):
        k = np.multiply.outer(k, _TENT)
    return jnp.asarray(k[None, None], dtype)  # (O=1, I=1, *spatial)


def restrict2d_conv(f, coarse_shape):
    """conv-based restriction, identical to :func:`restrict2d`."""
    d = f.shape[0]
    out = jax.lax.conv_general_dilated(
        f[:, None],  # (d, 1, ny, nx)
        _tent_kernel(2, f.dtype),
        window_strides=(2, 2),
        padding=((1, 1), (1, 1)),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape((d,) + tuple(coarse_shape))


def prolong2d_conv(c, fine_shape):
    """conv_transpose-based prolongation, identical to :func:`prolong2d`."""
    d = c.shape[0]
    out = jax.lax.conv_transpose(
        c[:, None],
        jnp.transpose(_tent_kernel(2, c.dtype), (2, 3, 0, 1)),  # HWIO
        strides=(2, 2),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape((d,) + tuple(fine_shape))


def restrict3d_conv(f, coarse_shape):
    d = f.shape[0]
    out = jax.lax.conv_general_dilated(
        f[:, None],
        _tent_kernel(3, f.dtype),
        window_strides=(2, 2, 2),
        padding=((1, 1), (1, 1), (1, 1)),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape((d,) + tuple(coarse_shape))


def prolong3d_conv(c, fine_shape):
    d = c.shape[0]
    out = jax.lax.conv_transpose(
        c[:, None],
        jnp.transpose(_tent_kernel(3, c.dtype), (2, 3, 4, 0, 1)),  # DHWIO
        strides=(2, 2, 2),
        padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NCDHW", "DHWIO", "NCDHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape((d,) + tuple(fine_shape))


def prolong3d(c, fine_shape):
    """Trilinear prolongation (d, nzc, nyc, nxc) -> (d, nzf, nyf, nxf)."""
    nzf, nyf, nxf = fine_shape
    d = c.shape[0]
    f = jnp.zeros((d, nzf, nyf, nxf), dtype=c.dtype)

    def avg(*terms):
        s = terms[0]
        for t in terms[1:]:
            s = s + t
        return s / len(terms)

    # enumerate the 8 parity cases; each is the average of the coarse
    # nodes of the containing cell face/edge/center
    f = f.at[:, 0::2, 0::2, 0::2].set(c)
    f = f.at[:, 1::2, 0::2, 0::2].set(avg(c[:, :-1], c[:, 1:]))
    f = f.at[:, 0::2, 1::2, 0::2].set(avg(c[:, :, :-1], c[:, :, 1:]))
    f = f.at[:, 0::2, 0::2, 1::2].set(avg(c[:, :, :, :-1], c[:, :, :, 1:]))
    f = f.at[:, 1::2, 1::2, 0::2].set(
        avg(c[:, :-1, :-1], c[:, 1:, :-1], c[:, :-1, 1:], c[:, 1:, 1:])
    )
    f = f.at[:, 1::2, 0::2, 1::2].set(
        avg(c[:, :-1, :, :-1], c[:, 1:, :, :-1], c[:, :-1, :, 1:],
            c[:, 1:, :, 1:])
    )
    f = f.at[:, 0::2, 1::2, 1::2].set(
        avg(c[:, :, :-1, :-1], c[:, :, 1:, :-1], c[:, :, :-1, 1:],
            c[:, :, 1:, 1:])
    )
    f = f.at[:, 1::2, 1::2, 1::2].set(
        avg(
            c[:, :-1, :-1, :-1], c[:, 1:, :-1, :-1], c[:, :-1, 1:, :-1],
            c[:, :-1, :-1, 1:], c[:, 1:, 1:, :-1], c[:, 1:, :-1, 1:],
            c[:, :-1, 1:, 1:], c[:, 1:, 1:, 1:],
        )
    )
    return f


def restrict3d(f, coarse_shape):
    """Restriction R = prolong3d^T exactly (FEM Galerkin convention)."""
    nzc, nyc, nxc = coarse_shape
    d = f.shape[0]
    c = jnp.zeros((d, nzc, nyc, nxc), dtype=f.dtype)
    c = c + f[:, 0::2, 0::2, 0::2]
    e = f[:, 1::2, 0::2, 0::2]
    c = c.at[:, :-1].add(0.5 * e)
    c = c.at[:, 1:].add(0.5 * e)
    e = f[:, 0::2, 1::2, 0::2]
    c = c.at[:, :, :-1].add(0.5 * e)
    c = c.at[:, :, 1:].add(0.5 * e)
    e = f[:, 0::2, 0::2, 1::2]
    c = c.at[:, :, :, :-1].add(0.5 * e)
    c = c.at[:, :, :, 1:].add(0.5 * e)
    e = f[:, 1::2, 1::2, 0::2]
    for sz in (slice(None, -1), slice(1, None)):
        for sy in (slice(None, -1), slice(1, None)):
            c = c.at[:, sz, sy].add(0.25 * e)
    e = f[:, 1::2, 0::2, 1::2]
    for sz in (slice(None, -1), slice(1, None)):
        for sx in (slice(None, -1), slice(1, None)):
            c = c.at[:, sz, :, sx].add(0.25 * e)
    e = f[:, 0::2, 1::2, 1::2]
    for sy in (slice(None, -1), slice(1, None)):
        for sx in (slice(None, -1), slice(1, None)):
            c = c.at[:, :, sy, sx].add(0.25 * e)
    e = f[:, 1::2, 1::2, 1::2]
    for sz in (slice(None, -1), slice(1, None)):
        for sy in (slice(None, -1), slice(1, None)):
            for sx in (slice(None, -1), slice(1, None)):
                c = c.at[:, sz, sy, sx].add(0.125 * e)
    return c


# ---------------------------------------------------------------------------
# Levels and the V-cycle
# ---------------------------------------------------------------------------


class Level:
    """One grid level: stencil operator + BC mask + smoother data.

    State fields are (nd, ny, nx) component planes throughout.

    Attributes:
        op: Stencil2D (plan + matvec).
        coeff: (nd, nd, 3, 3, ny, nx) assembled stencil coefficients.
        mask: (nd, ny, nx) bool, True at constrained dofs.
        inv_diag: (nd, ny, nx) Jacobi inverse diagonal.
        shape: (ny, nx) node grid.
        nd: dofs per node.
    """

    def __init__(self, op: Stencil2D, coeff, mask, shape, nd, chol=None,
                 smoother_dtype=None, pallas_ty=None,
                 pallas_interpret=False, pallas_sym=False):
        self.op = op
        self.coeff = coeff
        self.mask = mask
        self.shape = tuple(int(s) for s in shape)
        self.nd = int(nd)
        # fold the Dirichlet elimination into the coefficients once:
        # matvec/smoother paths become select-free (and Pallas-ready)
        self.coeff_e = op.bc_eliminate(coeff, mask)
        diag = op.diagonal(self.coeff_e)
        self.inv_diag = 1.0 / jnp.where(diag == 0, 1.0, diag)
        self.chol = chol  # dense Cholesky factor for exact coarse solves
        self.dense_inv = None  # explicit inverse (see dense_factor)
        # optional low-precision (bf16) coefficient copy: halves the
        # smoother's HBM traffic; requires flexible PCG outside
        self.coeff_lp = (
            self.coeff_e.astype(smoother_dtype) if smoother_dtype else None
        )
        # fused Pallas smoother: packed kernel-layout copies
        self.pallas = pallas_ty is not None and len(self.shape) == 2
        self.pallas3 = pallas_ty is not None and len(self.shape) == 3
        self.pallas_interpret = pallas_interpret
        if self.pallas:
            from .ops import pallas_smooth as ps

            self.ty = int(pallas_ty)
            self.coeff_k = ps.pack_coeff2d(self.coeff_e, self.ty,
                                           sym=pallas_sym)
            self.invd_k = ps.pack_field2d(self.inv_diag, self.ty)
            self.coeff_lp_k = (
                ps.pack_coeff2d(self.coeff_e, self.ty,
                                dtype=smoother_dtype, sym=pallas_sym)
                if smoother_dtype else None
            )
        elif self.pallas3:
            from .ops import pallas_smooth as ps

            self.tz = int(pallas_ty)
            self.coeff_k = ps.pack_coeff3d(self.coeff_e, self.tz,
                                           sym=pallas_sym)
            self.invd_k = ps.pack_field3d(self.inv_diag, tz=self.tz)
            # optional low-precision coeff copy for the smoother only
            # (matvec — the PCG operator — stays f32); needs flexible
            # PCG outside
            self.coeff_lp_k = (
                self.coeff_k.astype(smoother_dtype)
                if smoother_dtype else None
            )

    @classmethod
    def from_packed3d(cls, op, coeff_k, invd_k, mask, shape, nd, tz=1,
                      smoother_dtype=None, coeff_lp_k=None,
                      interpret=False):
        """3D level straight from packed kernel-layout data."""
        from .ops import pallas_smooth as ps

        lv = cls.__new__(cls)
        lv.op = op
        lv.coeff = None
        lv.coeff_e = None
        lv.coeff_lp = None
        lv.mask = mask
        lv.shape = tuple(int(s) for s in shape)
        lv.nd = int(nd)
        lv.chol = None
        lv.dense_inv = None
        lv.pallas = False
        lv.pallas3 = True
        lv.pallas_interpret = interpret
        lv.tz = int(tz)
        lv.coeff_k = coeff_k
        lv.invd_k = invd_k
        if coeff_lp_k is not None:
            lv.coeff_lp_k = coeff_lp_k
        else:
            lv.coeff_lp_k = (
                coeff_k.astype(smoother_dtype) if smoother_dtype else None
            )
        lv.inv_diag = ps.unpack_field3d(invd_k, *lv.shape)
        return lv

    @classmethod
    def from_packed(cls, op, coeff_k, invd_k, mask, shape, nd, ty,
                    smoother_dtype=None, coeff_lp_k=None,
                    interpret=False):
        """Level straight from packed kernel-layout data.

        Built by the fused Pallas assembly (``ops.pallas_assemble``); no
        unpacked coefficient planes exist, so matvec also runs through
        the Pallas kernel (niter=0 residual variant).
        """
        from .ops import pallas_smooth as ps

        lv = cls.__new__(cls)
        lv.op = op
        lv.coeff = None
        lv.coeff_e = None
        lv.coeff_lp = None
        lv.mask = mask
        lv.shape = tuple(int(s) for s in shape)
        lv.nd = int(nd)
        lv.chol = None
        lv.dense_inv = None
        lv.pallas = True
        lv.pallas3 = False
        lv.pallas_interpret = interpret
        lv.ty = int(ty)
        if smoother_dtype and jnp.dtype(smoother_dtype).itemsize < 4:
            # same (16, 128)-tile DMA-window constraint pack_coeff2d
            # enforces; packed inputs bypass it otherwise
            assert lv.ty % 16 == 0, (
                "sub-4-byte smoother_dtype requires ty % 16 == 0"
            )
        lv.coeff_k = coeff_k
        lv.invd_k = invd_k
        if coeff_lp_k is not None:
            lv.coeff_lp_k = coeff_lp_k
        else:
            lv.coeff_lp_k = (
                coeff_k.astype(smoother_dtype) if smoother_dtype else None
            )
        # invd_k is in the kernel *input* layout (logical row iy at
        # physical iy + _PADY, col ix at ix + 1) — not the output
        # layout unpack_field2d strips
        lv.inv_diag = invd_k[
            :, ps._PADY : ps._PADY + lv.shape[0], 1 : 1 + lv.shape[1]
        ]
        return lv

    def matvec(self, u):
        if self.pallas3:
            from .ops import pallas_smooth as ps

            nz, ny, nx = self.shape
            out = ps.fused_sweep_3d(
                self.coeff_k, None, None,
                ps.pack_field3d(u, zpad=1, tz=self.tz),
                mode="matvec", neg_resid=True, tz=self.tz,
                interpret=self.pallas_interpret,
            )
            return ps.unpack_field3d(out, nz, ny, nx)
        if self.coeff_e is None:
            from .ops import pallas_smooth as ps

            ny, nx = self.shape
            yk = ps.fused_sweeps_2d(
                self.coeff_k, self.invd_k, None, ps.pack_field2d(u, self.ty),
                niter=0, want_resid=True, neg_resid=True, omega=1.0,
                ty=self.ty, interpret=self.pallas_interpret,
            )
            return ps.unpack_field2d(yk, ny, nx)
        return self.op.matvec(self.coeff_e, u)

    def matvec_lp(self, u):
        """Preconditioner-internal matvec (low-precision coeff if set)."""
        if self.coeff_e is None:
            return self.matvec(u)
        c = self.coeff_lp if self.coeff_lp is not None else self.coeff_e
        return self.op.matvec(c, u)

    def presmooth_resid(self, b, niter, omega):
        """Fused Jacobi sweeps from x0 = 0 plus the residual (Pallas).

        Returns (x, r = b - A x), both (nd, ny, nx).
        """
        from .ops import pallas_smooth as ps

        ny, nx = self.shape
        bk = ps.pack_field2d(b, self.ty)
        ck = self.coeff_lp_k if getattr(
            self, "coeff_lp_k", None
        ) is not None else self.coeff_k
        xk, rk = ps.fused_sweeps_2d(
            ck, self.invd_k, bk, None, niter=niter,
            want_resid=True, omega=omega, ty=self.ty,
            interpret=self.pallas_interpret,
        )
        return ps.unpack_field2d(xk, ny, nx), ps.unpack_field2d(rk, ny, nx)

    def postsmooth(self, b, x0, niter, omega):
        """Fused Jacobi sweeps from a given iterate (Pallas)."""
        from .ops import pallas_smooth as ps

        ny, nx = self.shape
        bk = ps.pack_field2d(b, self.ty)
        x0k = ps.pack_field2d(x0, self.ty)
        ck = self.coeff_lp_k if getattr(
            self, "coeff_lp_k", None
        ) is not None else self.coeff_k
        xk = ps.fused_sweeps_2d(
            ck, self.invd_k, bk, x0k, niter=niter,
            want_resid=False, omega=omega, ty=self.ty,
            interpret=self.pallas_interpret,
        )
        return ps.unpack_field2d(xk, ny, nx)

    def postsmooth_resid(self, b, x0, niter, omega):
        """Fused post-sweeps plus the residual: (x, b - A x).

        Runs on the full-precision coefficients (not the bf16 smoother
        copy): the trailing residual defines ``A z = b - r`` for the
        PCG matvec-by-recurrence (:func:`pcg_gmg`), so it must be the
        PCG operator.  One extra in-VMEM pass instead of a separate
        matvec kernel launch (and its coefficient re-read).
        """
        from .ops import pallas_smooth as ps

        ny, nx = self.shape
        bk = ps.pack_field2d(b, self.ty)
        x0k = ps.pack_field2d(x0, self.ty)
        xk, rk = ps.fused_sweeps_2d(
            self.coeff_k, self.invd_k, bk, x0k, niter=niter,
            want_resid=True, omega=omega, ty=self.ty,
            interpret=self.pallas_interpret,
        )
        return ps.unpack_field2d(xk, ny, nx), ps.unpack_field2d(rk, ny, nx)

    # -- 3D multi-sweep fusion (one kernel per smoothing call) ------------

    def can_fuse3d(self, niter, x0_zero, want_resid):
        """True when fused_sweeps3d covers this call (sym storage +
        z budget; see ops.pallas_smooth.SWEEP3_ZEXT)."""
        from .ops import pallas_smooth as ps

        if not getattr(self, "pallas3", False):
            return False
        nk = self.coeff_k.shape[1]
        if nk != len(ps.sym_planes_3d(self.nd)):
            return False
        consumed = ps.halo_sweeps_3d(niter, x0_zero, want_resid)
        if not 1 <= consumed <= min(self.tz, ps.SWEEP3_ZEXT):
            return False
        # VMEM guard: the double-buffered coefficient window must leave
        # room for Mosaic's ~2x scoped stack under the 128 MB budget
        ck = self.coeff_lp_k if self.coeff_lp_k is not None else self.coeff_k
        wc = self.tz + 2 * (consumed - 1) + 1
        win = 2 * wc * nk * ck.shape[2] * ck.shape[3] * ck.dtype.itemsize
        return win <= 48 * 1024 * 1024

    def _invd_zpad1(self):
        """invd in the zpad=1 field layout (cached per assembled level)."""
        if getattr(self, "_invd_k1", None) is None:
            from .ops.pallas_smooth import _nzpad

            nzp = _nzpad(self.shape[0], self.tz)
            self._invd_k1 = jnp.pad(
                self.invd_k[:, :nzp],
                ((0, 0), (self.tz, self.tz), (0, 0), (0, 0)),
            )
        return self._invd_k1

    def presmooth_resid3d(self, b, niter, omega):
        """Fused 3D sweeps from x0 = 0 plus the residual: one pass.

        Preconditioner-internal (bf16 coefficient copy when present —
        flexible PCG absorbs it, as with the per-sweep path).
        Returns (x, r = b - A x), both (nd, nz, ny, nx).
        """
        from .ops import pallas_smooth as ps

        nz, ny, nx = self.shape
        bk1 = ps.pack_field3d(b, zpad=1, tz=self.tz)
        ck = self.coeff_lp_k if self.coeff_lp_k is not None else self.coeff_k
        xk, rk = ps.fused_sweeps3d(
            ck, self._invd_zpad1(), bk1, None, niter=niter,
            want_resid=True, omega=omega, tz=self.tz,
            interpret=self.pallas_interpret,
        )
        return (ps.unpack_field3d(xk, nz, ny, nx),
                ps.unpack_field3d(rk, nz, ny, nx))

    def postsmooth3d(self, b, x0, niter, omega):
        """Fused 3D sweeps from a given iterate: one coefficient pass."""
        from .ops import pallas_smooth as ps

        nz, ny, nx = self.shape
        bk1 = ps.pack_field3d(b, zpad=1, tz=self.tz)
        xk1 = ps.pack_field3d(x0, zpad=1, tz=self.tz)
        ck = self.coeff_lp_k if self.coeff_lp_k is not None else self.coeff_k
        xk = ps.fused_sweeps3d(
            ck, self._invd_zpad1(), bk1, xk1, niter=niter,
            want_resid=False, omega=omega, tz=self.tz,
            interpret=self.pallas_interpret,
        )
        return ps.unpack_field3d(xk, nz, ny, nx)

    # -- 3D fused ops (one z-tiled kernel call per sweep) -----------------

    def sweep3d(self, bk, x, omega):
        """x + omega * invD * (b - A x); bk pre-packed, x unpacked."""
        from .ops import pallas_smooth as ps

        nz, ny, nx = self.shape
        xk = ps.pack_field3d(x, zpad=1, tz=self.tz)
        ck = self.coeff_lp_k if self.coeff_lp_k is not None else self.coeff_k
        out = ps.fused_sweep_3d(
            ck, self.invd_k, bk, xk, mode="sweep",
            omega=omega, tz=self.tz, interpret=self.pallas_interpret,
        )
        return ps.unpack_field3d(out, nz, ny, nx)

    def resid3d(self, bk, x):
        """b - A x (zero at constrained dofs by construction)."""
        from .ops import pallas_smooth as ps

        nz, ny, nx = self.shape
        xk = ps.pack_field3d(x, zpad=1, tz=self.tz)
        ck = self.coeff_lp_k if self.coeff_lp_k is not None else self.coeff_k
        out = ps.fused_sweep_3d(
            ck, None, bk, xk, mode="resid", tz=self.tz,
            interpret=self.pallas_interpret,
        )
        return ps.unpack_field3d(out, nz, ny, nx)

    # ------------------------------------------------------------------

    def dense_factor(self, inverse=True):
        """Dense exact solve data for the coarsest level.

        vmaps the stencil matvec over the identity — traceable, used
        inside the jitted hierarchy assembly.

        ``inverse=True`` (default) stores the explicit inverse: the
        per-V-cycle coarse solve becomes one MXU matvec instead of two
        triangular solves (TRSMs are latency-bound on TPU — blocked
        sequential substitution).  The inverse of the BC-eliminated
        operator is computed once per hierarchy assembly; it is a
        preconditioner component, so the inverse's (bounded) loss of
        backward stability vs ``cho_solve`` is immaterial.
        """
        n = int(np.prod(self.shape)) * self.nd
        eye = jnp.eye(n, dtype=self.coeff.dtype)
        # always the XLA matvec here: vmapping a Pallas call is not
        # worth exercising for a once-per-solve tiny factorization
        cols = jax.vmap(
            lambda e: self.op.matvec(
                self.coeff_e, e.reshape((self.nd,) + self.shape)
            ).reshape(-1)
        )(eye)
        A = jnp.transpose(cols)
        chol = jax.scipy.linalg.cho_factor(A)
        if inverse:
            self.dense_inv = jax.scipy.linalg.cho_solve(chol, eye)
            self.chol = None
        else:
            self.chol = chol
        return self


class OTFLevel:
    """3D grid level applying the operator on the fly (no coefficients).

    Holds the packed density + free-dof mask and the OTF weight tables
    (``ops.pallas_otf3d``); every matvec/sweep rebuilds the stencil
    coefficients from the density on the MXU inside the kernel, so no
    coefficient arrays are ever written to or read from HBM — the 3D
    solve's dominant traffic on the assembled path.  Exposes the same
    surface GMG._cycle uses on packed 3D levels.
    """

    def __init__(self, op, rho_grid, maskf_k1, mask, w3, wd, shape, nd,
                 p, tz, smoother_bf16=False, interpret=False):
        from .ops import pallas_smooth as ps

        self.op = op
        self.coeff = None
        self.coeff_e = None
        self.coeff_lp = None
        self.chol = None
        self.dense_inv = None
        self.mask = mask
        self.shape = tuple(int(s) for s in shape)
        self.nd = int(nd)
        self.p = float(p)
        self.tz = int(tz)
        self.pallas = False
        self.pallas3 = True
        self.pallas_interpret = interpret
        self.smoother_bf16 = bool(smoother_bf16)
        self.maskf_k1 = maskf_k1
        self.w3 = w3
        self.wd = wd
        self.rho_k1 = ps.pack_field3d(
            rho_grid[None], zpad=1, tz=self.tz
        )[0]

    def _call(self, b, x, **kw):
        from .ops import pallas_smooth as ps
        from .ops.pallas_otf3d import otf_apply_3d

        nz, ny, nx = self.shape
        bk = (
            ps.pack_field3d(b, zpad=1, tz=self.tz)
            if b is not None else None
        )
        xk = (
            ps.pack_field3d(x, zpad=1, tz=self.tz)
            if x is not None else None
        )
        return otf_apply_3d(
            self.rho_k1, self.maskf_k1, self.w3, self.wd, bk, xk,
            p=self.p, tz=self.tz, shape=self.shape, nd=self.nd,
            interpret=self.pallas_interpret, **kw,
        )

    def matvec(self, u):
        """A u — the PCG operator: f32 HIGHEST matmuls, deterministic."""
        from .ops import pallas_smooth as ps

        out = self._call(None, u, niter=0, want_resid=True,
                         neg_resid=True, mxu_bf16=False)
        return ps.unpack_field3d(out, *self.shape)

    # preconditioner-internal matvec: same operator (OTF has no
    # low-precision coefficient copy; bf16 enters via the sweep matmuls)
    matvec_lp = matvec

    def can_fuse3d(self, niter, x0_zero, want_resid):
        from .ops.pallas_otf3d import otf_budget_ok

        return otf_budget_ok(niter, x0_zero, want_resid, self.tz)

    def presmooth_resid3d(self, b, niter, omega):
        from .ops import pallas_smooth as ps

        xk, rk = self._call(b, None, niter=niter, want_resid=True,
                            omega=omega, mxu_bf16=self.smoother_bf16)
        return (ps.unpack_field3d(xk, *self.shape),
                ps.unpack_field3d(rk, *self.shape))

    def postsmooth3d(self, b, x0, niter, omega):
        from .ops import pallas_smooth as ps

        xk = self._call(b, x0, niter=niter, want_resid=False,
                        omega=omega, mxu_bf16=self.smoother_bf16)
        return ps.unpack_field3d(xk, *self.shape)

    # per-sweep fallbacks (GMG._cycle when nu exceeds the fused budget)
    def sweep3d(self, bk, x, omega):
        from .ops import pallas_smooth as ps

        # bk arrives in the zpad=0 layout from _cycle's fallback; the
        # OTF kernels consume raw fields, so unpack first
        b = ps.unpack_field3d(bk, *self.shape)
        return self.postsmooth3d(b, x, 1, omega)

    def resid3d(self, bk, x):
        from .ops import pallas_smooth as ps

        b = ps.unpack_field3d(bk, *self.shape)
        return b - self.matvec(x)


def smoothing_omegas(nu, lam_max=3.0, frac=8.0):
    """Per-sweep damping factors for product-form Chebyshev smoothing.

    Reciprocals of the ``nu`` Chebyshev nodes on
    ``[lam_max/frac, lam_max]``: the sweep product
    ``prod_k (I - omega_k D^-1 A)`` is the minimax degree-``nu``
    polynomial over that interval, so the same per-sweep cost as damped
    Jacobi damps the upper spectrum near-optimally.  ``lam_max`` bounds
    the spectral radius of ``D^-1 A`` (~2.96 measured on uniform hex8
    elasticity grids; quad4 is lower — overestimates are safe,
    underestimates diverge).  Measured at 65^3 hex8 f32 rtol 1e-6:
    GMG(2,2)-PCG 9 -> 7 iterations vs omega=0.6; 25 -> 19 on a
    high-contrast RAMP density field.
    """
    nu = int(nu)
    lo, hi = lam_max / frac, 1.02 * lam_max
    th, de = 0.5 * (hi + lo), 0.5 * (hi - lo)
    ks = np.arange(1, nu + 1)
    t = th + de * np.cos(np.pi * (2 * ks - 1) / (2 * nu))
    return tuple(float(w) for w in 1.0 / t)


class GMG:
    """V-cycle preconditioner over a list of Levels (fine -> coarse)."""

    def __init__(self, levels, nu_pre=2, nu_post=2, omega=0.7,
                 coarse_iters=24, restrict_fn=None, prolong_fn=None,
                 smoother="jacobi", cheb_lam=2.2, cheb_frac=8.0):
        """omega: a damping factor, a tuple of per-sweep factors, or
        the string ``"cheby"`` — per-sweep reciprocals of Chebyshev
        nodes on [cheb_lam/cheb_frac, cheb_lam] (product-form
        Chebyshev smoothing: same cost per sweep as damped Jacobi but
        a near-optimal degree-nu damping polynomial; runs through the
        fused Pallas sweep kernels, unlike smoother="chebyshev" whose
        momentum recurrence needs the XLA path).  Post-smoothing
        applies the factors in reverse so the V-cycle stays symmetric
        (each Jacobi sweep is self-adjoint in the D-inner product, so
        the adjoint of the pre-sweep product is the reversed product).
        """
        self.levels = list(levels)
        self.nu_pre = int(nu_pre)
        self.nu_post = int(nu_post)
        if isinstance(omega, (tuple, list)):
            self.omega = tuple(float(w) for w in omega)
        elif isinstance(omega, str):
            assert omega == "cheby", omega
            self.omega = omega
        else:
            self.omega = float(omega)
        self.coarse_iters = int(coarse_iters)
        self.smoother = smoother
        self.cheb_lam = float(cheb_lam)
        self.cheb_frac = float(cheb_frac)
        dim = len(self.levels[0].shape)
        # 2D default: interleave-based transfers.  Measured on v5e, the
        # conv transfers cost the XLA V-cycle 3.44 -> 1.44 ms/iter at
        # 1M dof, and next to Mosaic custom calls they blow up to ~29
        # ms/iter (per-iteration relayouts); the strided
        # slice-assignment transfers fault the runtime with Pallas in
        # the program.
        if dim == 2:
            default_r, default_p = restrict2d_il, prolong2d_il
        else:
            default_r, default_p = restrict3d_il, prolong3d_il
        self.restrict_fn = restrict_fn or default_r
        self.prolong_fn = prolong_fn or default_p

    def _omegas(self, niter, reverse=False):
        """Per-sweep damping tuple of length ``niter``.

        ``reverse=True`` for post-smoothing: the adjoint ordering that
        keeps the V-cycle preconditioner symmetric with nonstationary
        factors.
        """
        om = self.omega
        if om == "cheby":
            seq = smoothing_omegas(niter, self.cheb_lam, self.cheb_frac)
        elif isinstance(om, tuple):
            assert len(om) >= niter, (len(om), niter)
            seq = om[:niter]
        else:
            seq = (om,) * niter
        return tuple(reversed(seq)) if reverse else seq

    def _smooth(self, lv: Level, x, b, niter, x0_zero=False,
                reverse=False):
        if self.smoother == "chebyshev":
            return self._cheb_smooth(lv, x, b, niter)
        oms = self._omegas(niter, reverse=reverse)

        if x0_zero and niter > 0:
            # first sweep from x = 0 is pure elementwise — skip the
            # matvec's full read of the coefficient planes
            x = oms[0] * lv.inv_diag * jnp.where(lv.mask, 0.0, b)
            oms = oms[1:]

        if len(set(oms)) > 1:
            # nonstationary factors: unroll (niter is small)
            for om in oms:
                r = b - lv.matvec_lp(x)
                x = x + om * lv.inv_diag * jnp.where(lv.mask, 0.0, r)
            return x

        # fori_loop keeps the compiled program small (one smoother body
        # per level instead of niter unrolled 21-slice matvecs — remote
        # compile time scales with program size)
        omega = oms[0] if oms else 0.0

        def body(_, x):
            r = b - lv.matvec_lp(x)
            return x + omega * lv.inv_diag * jnp.where(lv.mask, 0.0, r)

        return jax.lax.fori_loop(0, len(oms), body, x)

    def _cheb_smooth(self, lv: Level, x, b, degree):
        """Chebyshev smoothing on D^-1 A over [lam/30, 1.1 lam].

        One matvec per degree; ``cheb_lam`` is a spectral-radius bound
        of D^-1 A (mesh-independent ~2.2 on uniform quad4/hex8 grids —
        Chebyshev tolerates modest overestimates).
        """
        hi = 1.1 * self.cheb_lam
        lo = self.cheb_lam / 30.0
        theta = 0.5 * (hi + lo)
        delta = 0.5 * (hi - lo)
        sigma = theta / delta

        def resid(x):
            r = b - lv.matvec_lp(x)
            return lv.inv_diag * jnp.where(lv.mask, 0.0, r)

        d = resid(x) / theta
        x = x + d
        rho_old = 1.0 / sigma
        for _ in range(int(degree) - 1):
            rho = 1.0 / (2.0 * sigma - rho_old)
            d = rho * rho_old * d + (2.0 * rho / delta) * resid(x)
            x = x + d
            rho_old = rho
        return x

    def _cycle(self, k, b):
        from .ops.pallas_smooth import SWEEP_BUDGET

        lv = self.levels[k]
        jac = self.smoother == "jacobi"
        # fused 2D sweeps are valid only within the 8-row ghost zone
        # (presmooth consumes nu_pre halo rows, postsmooth nu_post) and
        # the kernels have no nu=0 form — fall back to the XLA smoother
        # otherwise (packed-only levels still matvec through Pallas)
        nu_ok = (
            1 <= self.nu_pre <= SWEEP_BUDGET
            and 1 <= self.nu_post <= SWEEP_BUDGET
        )
        use_pallas = getattr(lv, "pallas", False) and jac and nu_ok
        use_pallas3 = (
            getattr(lv, "pallas3", False) and jac and self.nu_pre >= 1
        )
        if k == len(self.levels) - 1:
            if getattr(lv, "dense_inv", None) is not None:
                x = lv.dense_inv @ b.reshape(-1)
                return x.reshape(b.shape)
            if lv.chol is not None:
                x = jax.scipy.linalg.cho_solve(lv.chol, b.reshape(-1))
                return x.reshape(b.shape)
            return self._smooth(lv, jnp.zeros_like(b), b,
                                self.coarse_iters, x0_zero=True)
        if use_pallas:
            # fused sweeps + residual: one pass over the coefficients
            # (BC-eliminated operator keeps masked entries at zero)
            x, r = lv.presmooth_resid(b, self.nu_pre,
                                      self._omegas(self.nu_pre))
        elif use_pallas3 and lv.can_fuse3d(self.nu_pre, True, True):
            # all pre-sweeps + the residual in one coefficient pass
            x, r = lv.presmooth_resid3d(b, self.nu_pre,
                                        self._omegas(self.nu_pre))
        elif use_pallas3:
            from .ops import pallas_smooth as ps

            oms = self._omegas(self.nu_pre)
            bk = ps.pack_field3d(b, tz=lv.tz)
            x = oms[0] * lv.inv_diag * jnp.where(lv.mask, 0.0, b)
            for om in oms[1:]:
                x = lv.sweep3d(bk, x, om)
            r = lv.resid3d(bk, x)
        else:
            x = self._smooth(lv, jnp.zeros_like(b), b, self.nu_pre,
                             x0_zero=True)
            r = b - lv.matvec_lp(x)
            r = jnp.where(lv.mask, 0.0, r)
        coarse = self.levels[k + 1]
        bc = self.restrict_fn(r, coarse.shape)
        bc = jnp.where(coarse.mask, 0.0, bc)
        xc = self._cycle(k + 1, bc)
        corr = self.prolong_fn(xc, lv.shape)
        x = x + jnp.where(lv.mask, 0.0, corr)
        om_post = self._omegas(self.nu_post, reverse=True)
        if use_pallas:
            return lv.postsmooth(b, x, self.nu_post, om_post)
        if use_pallas3:
            if lv.can_fuse3d(self.nu_post, False, False):
                return lv.postsmooth3d(b, x, self.nu_post, om_post)
            from .ops import pallas_smooth as ps

            bk = ps.pack_field3d(b, tz=lv.tz)
            for om in om_post:
                x = lv.sweep3d(bk, x, om)
            return x
        return self._smooth(lv, x, b, self.nu_post, reverse=True)

    def apply(self, r):
        """Preconditioner action z = M^-1 r (zero at constrained dofs)."""
        return self._cycle(0, jnp.where(self.levels[0].mask, 0.0, r))

    @property
    def supports_apply_resid(self):
        """True when the fine level can fuse the trailing residual."""
        from .ops.pallas_smooth import SWEEP_BUDGET, halo_sweeps_2d

        lv = self.levels[0]
        return (
            getattr(lv, "pallas", False)
            and self.smoother == "jacobi"
            and len(self.levels) > 1
            and 1 <= self.nu_pre <= SWEEP_BUDGET
            and 1 <= self.nu_post
            and halo_sweeps_2d(self.nu_post, False, True) <= SWEEP_BUDGET
        )

    def apply_resid(self, r):
        """One V-cycle returning (z, A z) with A z riding the postsmooth.

        The fine level's fused postsmooth emits its final residual
        ``r - A z`` in the same kernel pass (f32 coefficients), so the
        PCG matvec comes out free: ``A z = r - r_out``.  Only valid when
        :attr:`supports_apply_resid`; callers fall back to
        ``(apply(r), matvec)`` otherwise.
        """
        lv = self.levels[0]
        b = jnp.where(lv.mask, 0.0, r)
        x, rr = lv.presmooth_resid(b, self.nu_pre,
                                   self._omegas(self.nu_pre))
        coarse = self.levels[1]
        bc = self.restrict_fn(rr, coarse.shape)
        bc = jnp.where(coarse.mask, 0.0, bc)
        xc = self._cycle(1, bc)
        corr = self.prolong_fn(xc, lv.shape)
        x = x + jnp.where(lv.mask, 0.0, corr)
        z, rout = lv.postsmooth_resid(
            b, x, self.nu_post, self._omegas(self.nu_post, reverse=True)
        )
        return z, b - rout


# ---------------------------------------------------------------------------
# Hierarchy builders (rediscretized coarse operators)
# ---------------------------------------------------------------------------


def _grid_sizes(nx, ny, min_n=5):
    """Sequence of (nx, ny) halving the cell count per axis while 2|n-1."""
    sizes = [(nx, ny)]
    while True:
        nx2 = (nx - 1) // 2 + 1 if (nx - 1) % 2 == 0 else None
        ny2 = (ny - 1) // 2 + 1 if (ny - 1) % 2 == 0 else None
        if not nx2 or not ny2 or nx2 < min_n or ny2 < min_n:
            break
        nx, ny = nx2, ny2
        sizes.append((nx, ny))
    return sizes


def _restrict_nodal(rho_grid):
    """Injection restriction of a nodal field (even entries per axis).

    Implemented as reshape-based de-interleaving, NOT ``[0::2, 0::2]``:
    a stride-2 lane slice feeding the Pallas assembly pack relayouts
    pathologically (measured 1.4 ms for a quarter-size level whose
    assembly kernel alone is 0.1 ms — 5x the entire 8-level hierarchy
    assembly; same family as the conv-transfer relayouts in the
    V-cycle, see restrict2d_il)."""
    for ax in range(rho_grid.ndim):
        rho_grid = _deinterleave2(rho_grid, ax)[0]
    return rho_grid


def _dv_sens_uniform(Kq, N, p, offsets, rho_grid, phi, psi,
                     elem_valid=None):
    """Nodal d(phi^T K(rho) psi)/drho on a uniform grid, scatter-free.

    Uniform-geometry counterpart of the models' generic ``_dv_sens``
    (gather -> per-element geometry chain -> segment_sum; reference
    sensitivity einsums pyfem.py:1872-1920): with
    ``Ke = sum_q ramp(rho_q) Kq`` (``assemble_uniform``) the gradient is

        dc[m] = sum_{e ni m} sum_q ramp'(rho_q[e]) N[q, m_e]
                                   (phi_e^T Kq psi_e)[e]

    where phi_e/psi_e are shifted slices of the (nd, *grid) component
    planes, the quadratic forms batch onto the MXU as one
    ``(nq*ndpe, ndpe) @ (ndpe, nelems)`` contraction, and the
    element -> node scatter is ``nnodes_per_elem`` zero-padded plane
    adds.  Measured 86.8 ms -> sub-ms at 1M dof (the generic path's
    segment_sum dominated the fused topology-optimization iteration).

    Args:
        Kq: (nq, ndpe, ndpe) unit element matrices (rows node*nd+comp,
            nodes in ``offsets`` order).
        N: (nq, nnodes_per_elem) shape values at quadrature points.
        p: RAMP penalization parameter.
        offsets: per-local-node grid offsets (_QUAD4_LOCAL/_HEX8_LOCAL).
        rho_grid: nodal density, (ny, nx) or (nz, ny, nx).
        phi, psi: (nd, *grid) dof component planes.
        elem_valid: optional element-grid multiplier zeroing phantom
            elements (sharded local blocks assemble on a halo-extended
            grid whose boundary element rows do not exist globally).

    Returns:
        (*grid,) nodal gradient (flatten for the dof-vector form).
    """
    from .models.base import ramp_deriv
    from .ops.precision import einsum as p_einsum

    nd = phi.shape[0]
    esh = tuple(s - 1 for s in rho_grid.shape)

    def sl(off, a):
        return a[tuple(slice(o, o + e) for o, e in zip(off, esh))]

    rho_e = [sl(off, rho_grid) for off in offsets]
    nq = N.shape[0]
    rho_q = jnp.stack(
        [
            sum(N[q, n] * rho_e[n] for n in range(1, len(offsets)))
            + N[q, 0] * rho_e[0]
            for q in range(nq)
        ]
    )
    w = ramp_deriv(rho_q, p)  # (nq,) + esh
    if elem_valid is not None:
        w = w * elem_valid
    # element dof planes, row r = local_node * nd + comp
    P = jnp.stack([sl(off, phi[a]) for off in offsets for a in range(nd)])
    Q = jnp.stack([sl(off, psi[a]) for off in offsets for a in range(nd)])
    Pf = P.reshape(P.shape[0], -1)
    Qf = Q.reshape(Q.shape[0], -1)
    Kqa = jnp.asarray(Kq, phi.dtype)
    # s_q[e] = phi_e^T Kq psi_e for all q at once (MXU contraction)
    Y = p_einsum("qrs,se->qre", Kqa, Qf)
    s = p_einsum("re,qre->qe", Pf, Y).reshape((nq,) + esh)
    ws = w * s
    out = None
    for n, off in enumerate(offsets):
        contrib = sum(N[q, n] * ws[q] for q in range(1, nq)) + N[0, n] * ws[0]
        pad = [(o, g - e - o) for o, g, e in zip(off, rho_grid.shape, esh)]
        padded = jnp.pad(contrib, pad)
        out = padded if out is None else out + padded
    return out


def _left_edge_mask(nx, ny, nd, extra_fixed=None):
    """(nd, ny, nx) mask: all components of the x=0 node column."""
    mask = np.zeros((nd, ny, nx), dtype=bool)
    mask[:, :, 0] = True
    return mask


class GMGAssembler:
    """Static per-level data + a *traceable* hierarchy assembly.

    Setup (host, once): coarse ProblemCreator grids, DIA patterns, BC
    masks, element tables.  ``assemble(rho)`` then builds all level
    operators from a fine-grid nodal density entirely inside jit —
    mirroring the reference's per-solve pyamg setup (pyfem.py:2392-2400)
    but on device.

    Args:
        physics: "elasticity" (plane stress) or "poisson".
    """

    def __init__(self, nx, ny, Lx, Ly, physics="elasticity", E=10.0, nu=0.3,
                 p=0.0, dtype=jnp.float32, nu_pre=2, nu_post=2, omega=0.7,
                 min_n=5, fine_mask=None, coarse_dense=True,
                 coarse_dense_max=4096, elem_path="uniform",
                 smoother_dtype=None,
                 smoother="jacobi", cheb_lam=None, cheb_frac=8.0,
                 pallas_smooth=False,
                 pallas_ty=32, pallas_asm_min=8192, pallas_min=0,
                 pallas_sym=False):
        """fine_mask: optional (nd, ny, nx) bool Dirichlet mask; coarse
        masks are derived by injection (default: clamp the x=0 column,
        matching ProblemCreator's problem factories).

        omega: smoother damping — a float (stationary Jacobi), a tuple
        of per-sweep factors, or ``"cheby"`` for Chebyshev-node
        factors on [cheb_lam/cheb_frac, cheb_lam] (same per-sweep cost,
        measured ~25% fewer PCG iterations; see
        :func:`smoothing_omegas`).

        pallas_sym: store only the symmetric half of the stencil
        coefficient planes on Pallas levels (19 of 36 for nd=2) — the
        kernels reconstruct the partner terms from shifted reads,
        halving the coefficient HBM traffic.  Off by default in 2D:
        measured on v5e at 1M dof the 2D kernels are vector-op bound,
        and the extra shifted reads cost more than the DMA saved
        (V-cycle 1.2 -> 1.7 ms); the option wins only where the
        coefficient planes dominate bandwidth (see the 3D assembler).

        elem_path: element-matrix route inside ``assemble``:
            * "uniform" (default): uniform-geometry unit matrices —
              Ke[e] = sum_q Cq[e,q] Kq[q], exact on the creator's uniform
              grids, never materializes Ke;
            * "pallas": ops.pallas_stiffness elements-on-lanes kernel
              (general geometry, f32, TPU);
            * "einsum": the general einsum path (always-correct
              fallback, any dtype).
        """
        from .mesh import ProblemCreator
        from .assembly import make_conn_dof
        from .elements import get_element
        from .ops import stiffness

        self.physics = physics
        self.p = float(p)
        self.dtype = dtype
        self.nu_pre, self.nu_post, self.omega = nu_pre, nu_post, omega
        self.coarse_dense = bool(coarse_dense)
        self.coarse_dense_max = int(coarse_dense_max)
        self.elem_path = elem_path
        self.smoother_dtype = smoother_dtype
        self.smoother = smoother
        # spectral-radius bound of D^-1 A for Chebyshev-node
        # smoothing (power-iteration measured on uniform grids:
        # quad4 elasticity 2.20, hex8 elasticity 2.96, poisson
        # 1.49 in 2D and 3D; overestimates are safe)
        if cheb_lam is None:
            cheb_lam = 2.3 if physics == "elasticity" else 1.6
        self.cheb_lam = float(cheb_lam)
        self.cheb_frac = float(cheb_frac)
        self.pallas_smooth = bool(pallas_smooth)
        self.pallas_ty = int(pallas_ty)
        self.pallas_asm_min = int(pallas_asm_min)
        # smallest node count (ny*nx) that still uses the fused Pallas
        # smoother; smaller levels fall back to the XLA smoother
        self.pallas_min = int(pallas_min)
        self.pallas_sym = bool(pallas_sym)
        nd = 2 if physics == "elasticity" else 1
        self.nd = nd
        if physics == "elasticity":
            self.mu, self.lam = stiffness.lame_params(E, nu, 2)

        et = get_element("quad4")
        self.N = jnp.asarray(et.shape_vals, dtype)
        self.dN = jnp.asarray(et.shape_grads, dtype)
        self.wq = jnp.asarray(et.quad_wts, dtype)

        self.sizes = _grid_sizes(nx, ny, min_n=min_n)
        self.static_levels = []
        cur_mask = None
        if fine_mask is not None:
            cur_mask = np.asarray(fine_mask).reshape(nd, ny, nx)
        for li, (lnx, lny) in enumerate(self.sizes):
            creator = ProblemCreator(nnodes_x=lnx, nnodes_y=lny, Lx=Lx,
                                     Ly=Ly, element_type="quad")
            conn32 = jnp.asarray(creator.conn.astype(np.int32))
            # stencil operator: analytic plan, scatter-free assembly,
            # static-slice matvec on (nd, ny, nx) planes
            op = Stencil2D(lnx, lny, nd)
            # gather on host: an eager device gather compiles a fresh
            # program per level shape (minutes each over a remote chip)
            Xe = jnp.asarray(creator.X[creator.conn], dtype)
            if cur_mask is not None:
                mask_np = cur_mask.copy()
                cur_mask = cur_mask[:, ::2, ::2]
            else:
                mask_np = _left_edge_mask(lnx, lny, nd)
            mask = jnp.asarray(mask_np)
            Kq = self.unit_matrices(creator.X[np.asarray(creator.conn[0])])
            # fused Pallas assembly (packed output) for the large levels
            # when the Pallas smoother is on; the coarsest level stays
            # on the XLA path (dense coarse factorization needs matvec
            # columns, and tiny grids don't pay assembly cost anyway)
            pal = None
            if (
                self.pallas_smooth
                and elem_path == "uniform"
                and li < len(self.sizes) - 1
                and lny * lnx >= max(self.pallas_asm_min, self.pallas_min)
            ):
                from .ops import pallas_assemble as pa
                from .ops.pallas_smooth import _geom

                W36 = pa.assembly_weights(
                    op.plan, np.asarray(Kq), nd, int(self.N.shape[0])
                )
                ny_pad, nxp = _geom(lny, lnx, self.pallas_ty)
                maskf = (~mask_np).astype(np.float32)
                # pack on host (same layout as pa.pack_assembly_field)
                pk = np.zeros((nd, ny_pad + 48, nxp), np.float32)
                pk[:, pa._APAD : pa._APAD + lny, 1 : 1 + lnx] = maskf
                maskf_a = jnp.asarray(pk, dtype)
                pal = (W36, maskf_a)
            self.static_levels.append(
                (op, Xe, conn32, mask, (lny, lnx), Kq, pal)
            )

    def unit_matrices(self, Xe1, dtype=None):
        """(nquads, ndpe, ndpe) per-quadrature unit element matrices.

        Kq[q] = w_q |J_q| B_q^T C B_q of the level's (uniform) element —
        computed once at setup in float64, so ``sum_q Cq[e,q] Kq[q]``
        reproduces the general assembly exactly on uniform grids.

        Pure NumPy (mirrors ops.geometry.jacobian/det_and_inv and the
        ops.stiffness Lame form): a JAX computation here — even on the
        CPU backend — pays a multi-minute first-jit when a remote TPU
        platform is active, once per hierarchy level shape.
        """
        # match the in-jit assembly's tables: dtype-rounded, upcast
        dN = np.asarray(self.dN).astype(np.float64)
        wq = np.asarray(self.wq).astype(np.float64)
        Xe = np.asarray(Xe1, np.float64)
        Xc = Xe - Xe.mean(axis=0, keepdims=True)
        J = np.einsum("qnk,ni->qik", dN, Xc)  # (nq, d, d)
        d = J.shape[-1]
        if d == 2:
            det = J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0]
            inv = np.empty_like(J)
            inv[:, 0, 0] = J[:, 1, 1]
            inv[:, 0, 1] = -J[:, 0, 1]
            inv[:, 1, 0] = -J[:, 1, 0]
            inv[:, 1, 1] = J[:, 0, 0]
            inv /= det[:, None, None]
        else:
            a, b, c = J[:, 0, 0], J[:, 0, 1], J[:, 0, 2]
            p_, q_, r_ = J[:, 1, 0], J[:, 1, 1], J[:, 1, 2]
            u, v, w = J[:, 2, 0], J[:, 2, 1], J[:, 2, 2]
            c00 = q_ * w - r_ * v
            c01 = -(p_ * w - r_ * u)
            c02 = p_ * v - q_ * u
            det = a * c00 + b * c01 + c * c02
            adj = np.stack(
                [
                    np.stack([c00, -(b * w - c * v), b * r_ - c * q_], -1),
                    np.stack([c01, a * w - c * u, -(a * r_ - c * p_)], -1),
                    np.stack([c02, -(a * v - b * u), a * q_ - b * p_], -1),
                ],
                axis=-2,
            )
            inv = adj / det[:, None, None]
        Ngrad = np.einsum("qnm,qmi->qni", dN, inv)  # (nq, nn, d)
        cq = wq * det
        nq, nn, _ = Ngrad.shape
        if self.physics == "elasticity":
            gg = np.einsum("q,qnl,qml->qnm", cq, Ngrad, Ngrad)
            P = np.einsum("q,qna,qmb->qnamb", cq, Ngrad, Ngrad)
            eye = np.eye(d)
            Kq = (
                self.mu
                * (gg[:, :, None, :, None] * eye[None, None, :, None, :])
                + self.mu * np.transpose(P, (0, 1, 4, 3, 2))
                + self.lam * P
            ).reshape(nq, nn * d, nn * d)
        else:
            Kq = np.einsum("q,qnl,qml->qnm", cq, Ngrad, Ngrad)
        return jnp.asarray(Kq, dtype or self.dtype)

    def material_planes(self, rho_grid):
        """RAMP material at quad points as (nquads, ney, nex) planes.

        Gather-free: the quad4 nodal gather is four shifted slices of
        the (ny, nx) density grid.
        """
        from .models.base import ramp
        from .ops.stencil import _QUAD4_LOCAL

        ny, nx = rho_grid.shape
        ney, nex = ny - 1, nx - 1
        rho_e = [
            rho_grid[ay : ay + ney, ax : ax + nex]
            for (ay, ax) in _QUAD4_LOCAL
        ]
        planes = []
        for q in range(self.N.shape[0]):
            acc = self.N[q, 0] * rho_e[0]
            for n in range(1, len(rho_e)):
                acc = acc + self.N[q, n] * rho_e[n]
            planes.append(acc)
        return ramp(jnp.stack(planes), self.p)

    def dv_sens(self, rho_grid, phi, psi):
        """Scatter-free d(phi^T K psi)/drho (see _dv_sens_uniform).

        rho_grid: (ny, nx); phi/psi: (nd, ny, nx).  Returns (ny, nx).
        """
        from .ops.stencil import _QUAD4_LOCAL

        return _dv_sens_uniform(
            self.static_levels[0][5], self.N, self.p, _QUAD4_LOCAL,
            rho_grid, phi, psi,
        )

    def _elem_matrices(self, Xe, conn32, rho_flat):
        from .models.base import ramp
        from .ops import geometry, stiffness

        rho_q = geometry.interp_to_quads(
            self.N, jnp.take(rho_flat, conn32, axis=0)
        )
        Cq = ramp(rho_q, self.p)
        if self.physics == "elasticity":
            return stiffness.elasticity_stiffness(
                Xe, self.dN, self.wq, Cq, self.mu, self.lam
            )
        return stiffness.poisson_stiffness(Xe, self.dN, self.wq, Cq)

    def _level_coeff(self, op, Xe, conn32, Kq, rho_grid):
        """Element matrices + stencil assembly for one level."""
        if self.elem_path == "uniform":
            return op.assemble_uniform(self.material_planes(rho_grid), Kq)
        if self.elem_path == "pallas":
            from .models.base import ramp
            from .ops import pallas_stiffness

            Cq = self.material_planes(rho_grid)
            nq = Cq.shape[0]
            cqT = Cq.reshape(nq, -1)
            XeT = pallas_stiffness.transpose_xe(Xe)
            interp = jax.default_backend() == "cpu"
            if self.physics == "elasticity":
                KeT = pallas_stiffness.elasticity_stiffness_quad4(
                    XeT, cqT, float(self.mu), float(self.lam),
                    interpret=interp,
                )
            else:
                KeT = pallas_stiffness.poisson_stiffness_quad4(
                    XeT, cqT, interpret=interp
                )
            return op.assemble_transposed(KeT)
        Ke = self._elem_matrices(Xe, conn32, rho_grid.reshape(-1))
        return op.assemble(Ke)

    def assemble(self, rho):
        """Traceable: fine nodal rho -> (gmg, fine_level)."""
        ny, nx = self.static_levels[0][4]
        rho_grid = jnp.asarray(rho, self.dtype).reshape(ny, nx)
        levels = []
        pal_interp = jax.default_backend() == "cpu"
        for (op, Xe, conn32, mask, shape, Kq, pal) in self.static_levels:
            pal_ty = (
                self.pallas_ty
                if self.pallas_smooth
                and shape[0] * shape[1] >= self.pallas_min
                else None
            )
            if pal is not None:
                from .ops import pallas_assemble as pa
                from .ops.pallas_smooth import _geom

                W36, maskf_a = pal
                lny, lnx = shape
                ny_pad, nxp = _geom(lny, lnx, self.pallas_ty)
                rho_a = pa.pack_assembly_field(rho_grid, ny_pad, nxp)
                outs = pa.assemble_pack_2d(
                    rho_a, maskf_a, W36, np.asarray(self.N),
                    nd=self.nd, p=self.p, ny=lny, nx=lnx,
                    ty=self.pallas_ty, lp_dtype=self.smoother_dtype,
                    sym=self.pallas_sym, interpret=pal_interp,
                )
                ck, dk = outs[0], outs[1]
                lpk = outs[2] if len(outs) > 2 else None
                levels.append(Level.from_packed(
                    op, ck, dk, mask, shape, self.nd, self.pallas_ty,
                    smoother_dtype=self.smoother_dtype,
                    coeff_lp_k=lpk, interpret=pal_interp,
                ))
            else:
                coeff = self._level_coeff(op, Xe, conn32, Kq, rho_grid)
                levels.append(Level(op, coeff, mask, shape, self.nd,
                                    smoother_dtype=self.smoother_dtype,
                                    pallas_ty=pal_ty,
                                    pallas_interpret=pal_interp,
                                    pallas_sym=self.pallas_sym))
            rho_grid = _restrict_nodal(rho_grid)
        if self.coarse_dense and (
            int(np.prod(levels[-1].shape)) * self.nd
            <= self.coarse_dense_max
        ):
            levels[-1].dense_factor()
        gmg = GMG(levels, nu_pre=self.nu_pre, nu_post=self.nu_post,
                  omega=self.omega, smoother=self.smoother,
                  cheb_lam=self.cheb_lam, cheb_frac=self.cheb_frac)
        return gmg, levels[0]


def build_elasticity_gmg(nx, ny, Lx, Ly, E=10.0, nu=0.3, p=0.0, rho=None,
                         dtype=jnp.float32, nu_pre=2, nu_post=2, omega=0.7,
                         min_n=5):
    """GMG hierarchy for the left-edge-clamped plane-stress problem.

    Returns:
        (gmg, fine_level): use ``fine_level.matvec`` as the operator and
        ``gmg.apply`` as the preconditioner.
    """
    asm = GMGAssembler(nx, ny, Lx, Ly, "elasticity", E=E, nu=nu, p=p,
                       dtype=dtype, nu_pre=nu_pre, nu_post=nu_post,
                       omega=omega, min_n=min_n)
    if rho is None:
        rho = jnp.ones(ny * nx, dtype)
    return asm.assemble(rho)


def build_poisson_gmg(nx, ny, Lx, Ly, p=0.0, rho=None, dtype=jnp.float32,
                      nu_pre=2, nu_post=2, omega=0.8, min_n=5):
    """GMG hierarchy for the left-edge-fixed Poisson problem."""
    asm = GMGAssembler(nx, ny, Lx, Ly, "poisson", p=p, dtype=dtype,
                       nu_pre=nu_pre, nu_post=nu_post, omega=omega,
                       min_n=min_n)
    if rho is None:
        rho = jnp.ones(ny * nx, dtype)
    return asm.assemble(rho)


def pcg(matvec, precond, b, rtol=1e-6, maxiter=500, x0=None,
        flexible=False):
    """Preconditioned CG with an arbitrary SPD preconditioner (traced).

    flexible=True uses the Polak-Ribiere beta
    (z_new . (r_new - r_old) / rz_old), which tolerates a preconditioner
    that varies between applications — required when the V-cycle smooths
    in bfloat16 (rounding makes M change slightly per apply; plain PCG
    then stalls, measured round 1).
    """
    tol2 = (rtol * jnp.linalg.norm(b)) ** 2

    if x0 is None:
        # r = b - A*0: skip the setup matvec (a full coefficient read)
        x0 = jnp.zeros_like(b)
        r = b
    else:
        r = b - matvec(x0)
    z = precond(r)
    pvec = z
    rz = jnp.vdot(r, z)

    def cond(s):
        _, r, _, _, _, k = s
        return (jnp.vdot(r, r).real > tol2) & (k < maxiter)

    def body(s):
        x, r, z, pv, rz, k = s
        Ap = matvec(pv)
        alpha = rz / jnp.vdot(pv, Ap)
        x = x + alpha * pv
        r_new = r - alpha * Ap
        z_new = precond(r_new)
        if flexible:
            beta = jnp.vdot(r_new - r, z_new) / rz
        else:
            beta = jnp.vdot(r_new, z_new) / rz
        rz2 = jnp.vdot(r_new, z_new)
        pv = z_new + beta * pv
        return (x, r_new, z_new, pv, rz2, k + 1)

    x, r, *_, k = jax.lax.while_loop(cond, body, (x0, r, z, pvec, rz, 0))
    return x, k, jnp.sqrt(jnp.vdot(r, r).real)


def pcg_gmg(gmg, lv0, b, rtol=1e-6, maxiter=500, x0=None, flexible=False):
    """PCG with the V-cycle preconditioner, fusing the matvec when possible.

    When the fine level runs the fused Pallas smoother,
    ``gmg.apply_resid`` returns ``A z`` alongside ``z`` (the trailing
    residual of the postsmooth kernel), and ``A p`` is maintained by the
    recurrence ``A p = A z + beta A p`` — the per-iteration operator
    matvec (a full coefficient re-read plus a kernel launch) disappears.
    Falls back to :func:`pcg` otherwise.  Same return contract.
    """
    if not gmg.supports_apply_resid:
        return pcg(lv0.matvec, gmg.apply, b, rtol=rtol, maxiter=maxiter,
                   x0=x0, flexible=flexible)

    tol2 = (rtol * jnp.linalg.norm(b)) ** 2
    if x0 is None:
        x0 = jnp.zeros_like(b)
        r = b
    else:
        r = b - lv0.matvec(x0)
    z, Az = gmg.apply_resid(r)
    rz = jnp.vdot(r, z)

    def cond(s):
        _, r, _, _, _, _, k = s
        return (jnp.vdot(r, r).real > tol2) & (k < maxiter)

    def body(s):
        x, r, z, pv, Ap, rz, k = s
        alpha = rz / jnp.vdot(pv, Ap)
        x = x + alpha * pv
        r_new = r - alpha * Ap
        z_new, Az_new = gmg.apply_resid(r_new)
        if flexible:
            beta = jnp.vdot(r_new - r, z_new) / rz
        else:
            beta = jnp.vdot(r_new, z_new) / rz
        rz2 = jnp.vdot(r_new, z_new)
        pv = z_new + beta * pv
        Ap = Az_new + beta * Ap
        return (x, r_new, z_new, pv, Ap, rz2, k + 1)

    x, r, *_, k = jax.lax.while_loop(
        cond, body, (x0, r, z, z, Az, rz, 0)
    )
    return x, k, jnp.sqrt(jnp.vdot(r, r).real)


# ---------------------------------------------------------------------------
# 3D (hex8) hierarchy
# ---------------------------------------------------------------------------


def _grid_sizes_3d(nx, ny, nz, min_n=3):
    sizes = [(nx, ny, nz)]
    while True:
        nxt = []
        for n in (nx, ny, nz):
            nxt.append((n - 1) // 2 + 1 if (n - 1) % 2 == 0 else None)
        if any(v is None or v < min_n for v in nxt):
            break
        nx, ny, nz = nxt
        sizes.append((nx, ny, nz))
    return sizes


def _left_face_mask(nx, ny, nz, nd):
    """(nd, nz, ny, nx) mask: all components of the x=0 node face."""
    mask = np.zeros((nd, nz, ny, nx), dtype=bool)
    mask[:, :, :, 0] = True
    return mask


class GMGAssembler3D:
    """3D (hex8) analogue of :class:`GMGAssembler`.

    physics: "elasticity" (3D isotropic, nd=3) or "poisson" (nd=1);
    BCs clamp the x=0 face (the create_*_problem factories' layout).
    """

    def __init__(self, nx, ny, nz, Lx, Ly, Lz, physics="elasticity",
                 E=10.0, nu=0.3, p=0.0, dtype=jnp.float32, nu_pre=2,
                 nu_post=2, omega=0.6, min_n=3, coarse_dense=True,
                 coarse_dense_max=4096,
                 elem_path="uniform", smoother_dtype=None,
                 smoother="jacobi", cheb_lam=None, cheb_frac=8.0,
                 pallas_smooth=False,
                 pallas_min=0, pallas_asm_min=8192, pallas_tz=1,
                 pallas_sym=True, fine_mask=None):
        """fine_mask: optional (nd, nz, ny, nx) bool Dirichlet mask;
        coarse masks by injection (default: clamp the x=0 face, the
        create_*_problem factories' layout — general ``dof_fixed`` of
        pyfem.py:639-657 comes through the model's mask).

        omega: a float, a per-sweep tuple, or ``"cheby"`` (see
        :func:`smoothing_omegas`; 65^3 hex8 f32: 8 -> 6 PCG
        iterations at the same per-sweep cost)."""
        from .mesh import ProblemCreator
        from .elements import get_element
        from .ops import stiffness

        self.physics = physics
        self.p = float(p)
        self.dtype = dtype
        self.nu_pre, self.nu_post, self.omega = nu_pre, nu_post, omega
        self.coarse_dense = bool(coarse_dense)
        self.coarse_dense_max = int(coarse_dense_max)
        self.elem_path = elem_path
        self.smoother_dtype = smoother_dtype
        self.smoother = smoother
        # spectral-radius bound of D^-1 A for Chebyshev-node
        # smoothing (power-iteration measured on uniform grids:
        # quad4 elasticity 2.20, hex8 elasticity 2.96, poisson
        # 1.49 in 2D and 3D; overestimates are safe)
        if cheb_lam is None:
            cheb_lam = 3.0 if physics == "elasticity" else 1.6
        self.cheb_lam = float(cheb_lam)
        self.cheb_frac = float(cheb_frac)
        self.pallas_smooth = bool(pallas_smooth)
        self.pallas_min = int(pallas_min)
        self.pallas_asm_min = int(pallas_asm_min)
        self.pallas_tz = int(pallas_tz)
        self.pallas_sym = bool(pallas_sym)
        nd = 3 if physics == "elasticity" else 1
        self.nd = nd
        if physics == "elasticity":
            self.mu, self.lam = stiffness.lame_params(E, nu, 3)

        et = get_element("hex8")
        self.N = jnp.asarray(et.shape_vals, dtype)
        self.dN = jnp.asarray(et.shape_grads, dtype)
        self.wq = jnp.asarray(et.quad_wts, dtype)

        self.sizes = _grid_sizes_3d(nx, ny, nz, min_n=min_n)
        self.static_levels = []
        cur_mask = None
        if fine_mask is not None:
            cur_mask = np.asarray(fine_mask).reshape(nd, nz, ny, nx)
        for li, (lnx, lny, lnz) in enumerate(self.sizes):
            creator = ProblemCreator(
                nnodes_x=lnx, nnodes_y=lny, nnodes_z=lnz, Lx=Lx, Ly=Ly,
                Lz=Lz, element_type="block",
            )
            conn32 = jnp.asarray(creator.conn.astype(np.int32))
            op = Stencil3D(lnx, lny, lnz, nd)
            Xe = jnp.asarray(creator.X[creator.conn], dtype)
            if cur_mask is not None:
                mask_np = cur_mask.copy()
                cur_mask = cur_mask[:, ::2, ::2, ::2]
            else:
                mask_np = _left_face_mask(lnx, lny, lnz, nd)
            mask = jnp.asarray(mask_np)
            Kq = GMGAssembler.unit_matrices(
                self, creator.X[np.asarray(creator.conn[0])]
            )
            # on-the-fly operator data (no coefficient arrays at all)
            otf = None
            if (
                elem_path == "otf"
                and li < len(self.sizes) - 1
                and self._otf_budget_ok()
            ):
                from .ops import pallas_smooth as ps
                from .ops.pallas_otf3d import otf_weights

                w3, wd = otf_weights(op.plan, np.asarray(Kq), nd, 8)
                maskf = jnp.asarray((~mask_np).astype(np.float32))
                maskf_k1 = ps.pack_field3d(
                    maskf, zpad=1, tz=self.pallas_tz
                )
                otf = (jnp.asarray(w3), jnp.asarray(wd), maskf_k1)
            # fused Pallas assembly (packed output) for large levels
            pal = None
            if (
                self.pallas_smooth
                and otf is None
                and elem_path in ("uniform", "otf")
                and li < len(self.sizes) - 1
                and lnz * lny * lnx >= self.pallas_asm_min
            ):
                from .ops import pallas_assemble as pa
                from .ops.pallas_smooth import _geom3d

                from .ops.pallas_smooth import _nzpad

                W3 = pa.assembly_weights3d(op.plan, np.asarray(Kq), nd, 8)
                nyp, nxp = _geom3d(lny, lnx)
                maskf = (~mask_np).astype(np.float32)
                # pack on host (same layout as pa.pack_assembly_field3d)
                pk = np.zeros(
                    (nd, _nzpad(lnz, self.pallas_tz) + 2, nyp, nxp),
                    np.float32,
                )
                pk[:, 1 : 1 + lnz, 1 : 1 + lny, 1 : 1 + lnx] = maskf
                maskf_a = jnp.asarray(pk, dtype)
                pal = (W3, maskf_a)
            self.static_levels.append(
                (op, Xe, conn32, mask, (lnz, lny, lnx), Kq, pal, otf)
            )

    def _otf_budget_ok(self):
        """True when the OTF kernels cover this (nu_pre, nu_post, tz)."""
        from .ops.pallas_otf3d import otf_budget_ok

        return (
            self.smoother == "jacobi"
            and otf_budget_ok(self.nu_pre, True, True, self.pallas_tz)
            and otf_budget_ok(self.nu_post, False, False, self.pallas_tz)
        )

    def material_planes(self, rho_grid):
        """RAMP material at quads as (nquads, nez, ney, nex) volumes."""
        from .models.base import ramp
        from .ops.stencil import _HEX8_LOCAL

        nz, ny, nx = rho_grid.shape
        nez, ney, nex = nz - 1, ny - 1, nx - 1
        rho_e = [
            rho_grid[az : az + nez, ay : ay + ney, ax : ax + nex]
            for (az, ay, ax) in _HEX8_LOCAL
        ]
        planes = []
        for q in range(self.N.shape[0]):
            acc = self.N[q, 0] * rho_e[0]
            for n in range(1, len(rho_e)):
                acc = acc + self.N[q, n] * rho_e[n]
            planes.append(acc)
        return ramp(jnp.stack(planes), self.p)

    def dv_sens(self, rho_grid, phi, psi):
        """Scatter-free d(phi^T K psi)/drho (see _dv_sens_uniform).

        rho_grid: (nz, ny, nx); phi/psi: (nd, nz, ny, nx) planes.
        """
        from .ops.stencil import _HEX8_LOCAL

        return _dv_sens_uniform(
            self.static_levels[0][5], self.N, self.p, _HEX8_LOCAL,
            rho_grid, phi, psi,
        )

    def _elem_matrices(self, Xe, conn32, rho_flat):
        from .models.base import ramp
        from .ops import geometry, stiffness

        rho_q = geometry.interp_to_quads(
            self.N, jnp.take(rho_flat, conn32, axis=0)
        )
        Cq = ramp(rho_q, self.p)
        if self.physics == "elasticity":
            return stiffness.elasticity_stiffness(
                Xe, self.dN, self.wq, Cq, self.mu, self.lam
            )
        return stiffness.poisson_stiffness(Xe, self.dN, self.wq, Cq)

    def assemble(self, rho):
        """Traceable: fine nodal rho -> (gmg, fine_level)."""
        nz, ny, nx = self.static_levels[0][4]
        rho_grid = jnp.asarray(rho, self.dtype).reshape(nz, ny, nx)
        levels = []
        pal_interp = jax.default_backend() == "cpu"
        for (op, Xe, conn32, mask, shape, Kq, pal,
             otf) in self.static_levels:
            if otf is not None:
                w3, wd, maskf_k1 = otf
                levels.append(OTFLevel(
                    op, rho_grid, maskf_k1, mask, w3, wd, shape,
                    self.nd, self.p, self.pallas_tz,
                    smoother_bf16=self.smoother_dtype is not None,
                    interpret=pal_interp,
                ))
                rho_grid = _restrict_nodal(rho_grid)
                continue
            if pal is not None:
                from .ops import pallas_assemble as pa
                from .ops.pallas_smooth import _geom3d

                W3, maskf_a = pal
                lnz, lny, lnx = shape
                nyp, nxp = _geom3d(lny, lnx)
                rho_a = pa.pack_assembly_field3d(
                    rho_grid, nyp, nxp, tz=self.pallas_tz
                )
                outs = pa.assemble_pack_3d(
                    rho_a, maskf_a, W3, np.asarray(self.N),
                    nd=self.nd, p=self.p, nz=lnz, ny=lny, nx=lnx,
                    tz=self.pallas_tz, lp_dtype=self.smoother_dtype,
                    sym=self.pallas_sym, interpret=pal_interp,
                )
                ck, dk = outs[0], outs[1]
                lpk = outs[2] if len(outs) > 2 else None
                levels.append(Level.from_packed3d(
                    op, ck, dk, mask, shape, self.nd, tz=self.pallas_tz,
                    smoother_dtype=self.smoother_dtype,
                    coeff_lp_k=lpk, interpret=pal_interp,
                ))
                rho_grid = _restrict_nodal(rho_grid)
                continue
            if self.elem_path in ("uniform", "otf"):
                coeff = op.assemble_uniform(self.material_planes(rho_grid), Kq)
            else:
                Ke = self._elem_matrices(Xe, conn32, rho_grid.reshape(-1))
                coeff = op.assemble(Ke)
            pal_ty = (
                self.pallas_tz  # z-slabs per program for the 3D kernels
                if self.pallas_smooth
                and int(np.prod(shape)) >= self.pallas_min
                else None
            )
            levels.append(Level(op, coeff, mask, shape, self.nd,
                                smoother_dtype=self.smoother_dtype,
                                pallas_ty=pal_ty,
                                pallas_interpret=pal_interp,
                                pallas_sym=self.pallas_sym))
            rho_grid = _restrict_nodal(rho_grid)
        if self.coarse_dense and (
            int(np.prod(levels[-1].shape)) * self.nd
            <= self.coarse_dense_max
        ):
            levels[-1].dense_factor()
        gmg = GMG(levels, nu_pre=self.nu_pre, nu_post=self.nu_post,
                  omega=self.omega, smoother=self.smoother,
                  cheb_lam=self.cheb_lam, cheb_frac=self.cheb_frac)
        return gmg, levels[0]
