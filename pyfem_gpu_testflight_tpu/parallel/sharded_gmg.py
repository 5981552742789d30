"""Sharded geometric multigrid: node planes block-partitioned along y.

Round-1 multi-chip solving was the slow Jacobi path with replicated dof
vectors.  This module shards the *flagship* GMG-PCG solver itself (the
TPU replacement for the reference's pyamg-preconditioned CG,
pyfem.py:2392-2422) over a 1D ``jax.sharding.Mesh``:

* every vector/coefficient plane of the fine levels is block-partitioned
  along the y (rows) axis — memory and smoothing FLOPs scale with the
  device count, the x axis stays on the 128 lanes;
* the 3x3 stencil matvec needs one halo row per side, exchanged with
  ``jax.lax.ppermute`` (XLA lowers it to ICI neighbor transfers on real
  hardware; devices at the global boundary receive zeros, matching the
  zero-padded global matvec);
* grid transfers are the same stride-2 tent convs as the single-chip
  path (multigrid.restrict2d_conv / prolong2d_conv), evaluated on haloed
  local blocks — bitwise the same math as the global convs;
* coarse levels below the sharded prefix are *replicated*: one
  ``all_gather`` of the (tiny) residual, then every device redundantly
  runs the remaining V-cycle including the dense-Cholesky coarsest
  solve.  Redundant compute on sub-128-lane grids is free; it avoids
  sharding constraints on odd coarse sizes;
* dot products in PCG are local vdots + ``psum``.

Padding scheme: a level with ny real rows is padded to D*nyl rows
(nyl = m * 2^(S-1-l), m = ceil((ny0-1+2^(S-1)) / (D*2^(S-1)))), so every
sharded level's local row count halves exactly between levels and the
stride-2 transfers never straddle a shard boundary by more than the one
halo row.  Padded rows carry zero coefficients and a True Dirichlet
mask; all vectors are zero there throughout, so the iteration on the
real sub-grid is *identical* to the unsharded solver (the round-2 test
asserts this to solver tolerance).

Everything — assembly of the hierarchy, padding/sharding constraints,
the shard_mapped PCG — is one jitted SPMD program.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import shard_map
from .. import multigrid
from ..multigrid import GMGAssembler, restrict2d_conv, prolong2d_conv, _tent_kernel

__all__ = ["ShardedGMG2D", "dryrun"]


class ShardedGMG2D:
    """Element-assembled, y-sharded GMG-PCG plane-stress/Poisson solver.

    Args:
        mesh: 1D device mesh; its single axis shards the y (rows) axis.
        nx, ny: fine node grid (same conventions as GMGAssembler).
        n_sharded: how many fine levels to shard (default: all but the
            coarsest; the rest run replicated).
    """

    def __init__(self, mesh: Mesh, nx, ny, Lx, Ly, physics="elasticity",
                 E=10.0, nu=0.3, p=0.0, dtype=jnp.float32, nu_pre=2,
                 nu_post=2, omega=0.7, min_n=5, n_sharded=None,
                 fine_mask=None):
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.D = int(mesh.devices.size)
        self.dtype = dtype
        self.asm = GMGAssembler(
            nx, ny, Lx, Ly, physics, E=E, nu=nu, p=p, dtype=dtype,
            nu_pre=nu_pre, nu_post=nu_post, omega=omega, min_n=min_n,
            fine_mask=fine_mask,
        )
        self.nd = self.asm.nd
        nlev = len(self.asm.sizes)
        max_s = max(1, nlev - 1)  # keep >= 1 replicated (coarse-solve) level
        S = max_s if n_sharded is None else max(1, min(int(n_sharded), max_s))
        self.S = S
        # local rows per sharded level: halve exactly between levels
        m = math.ceil((ny - 1 + (1 << (S - 1))) / (self.D * (1 << (S - 1))))
        self.nyl = [m * (1 << (S - 1 - l)) for l in range(S)]
        # (ny, nx) real shapes per level, fine -> coarse
        self.shapes = [sl[4] for sl in self.asm.static_levels]
        self._jit_step = None

    # -- the shard_mapped solve -------------------------------------------

    def _local_solve(self, sh_coeff, sh_mask, sh_invd, rep, b0, rtol,
                     maxiter):
        """Per-device PCG + V-cycle on local y-blocks (runs under shard_map)."""
        axis, D, S, nd = self.axis, self.D, self.S, self.nd
        nu_pre, nu_post = self.asm.nu_pre, self.asm.nu_post
        omega = self.asm.omega
        rep_coeff, rep_mask, rep_invd, chol = rep
        fwd = [(i, i + 1) for i in range(D - 1)]
        bwd = [(i + 1, i) for i in range(D - 1)]

        def halo(u):
            lo = jax.lax.ppermute(u[:, -1:], axis, fwd)
            hi = jax.lax.ppermute(u[:, :1], axis, bwd)
            return jnp.concatenate([lo, u, hi], axis=1)

        def matvec(l, u):
            coeff, mask = sh_coeff[l], sh_mask[l]
            nyl, nx = u.shape[1], u.shape[2]
            uh = halo(jnp.where(mask, 0.0, u))
            up = jnp.pad(uh, ((0, 0), (0, 0), (1, 1)))
            ys = []
            for c in range(nd):
                acc = None
                for cp in range(nd):
                    for dy in range(3):
                        for dx in range(3):
                            t = coeff[c, cp, dy, dx] * up[
                                cp, dy : dy + nyl, dx : dx + nx
                            ]
                            acc = t if acc is None else acc + t
                ys.append(acc)
            return jnp.where(mask, u, jnp.stack(ys))

        def smooth(l, x, b, niter):
            mask, invd = sh_mask[l], sh_invd[l]

            def body(_, x):
                r = b - matvec(l, x)
                return x + omega * invd * jnp.where(mask, 0.0, r)

            return jax.lax.fori_loop(0, niter, body, x)

        tent = _tent_kernel(2, b0.dtype)

        def restrict_loc(f):
            """Haloed stride-2 tent conv: local fine block -> local coarse."""
            fh = halo(f)
            out = jax.lax.conv_general_dilated(
                fh[:, None], tent, window_strides=(2, 2),
                padding=((0, 0), (1, 1)),
                precision=jax.lax.Precision.HIGHEST,
            )
            return out[:, 0]

        def prolong_loc(c):
            """Right-haloed conv_transpose: local coarse -> local fine."""
            hi = jax.lax.ppermute(c[:, :1], axis, bwd)
            ch = jnp.concatenate([c, hi], axis=1)
            out = jax.lax.conv_transpose(
                ch[:, None],
                jnp.transpose(tent, (2, 3, 0, 1)),  # HWIO
                strides=(2, 2), padding=((1, 0), (1, 1)),
                dimension_numbers=("NCHW", "HWIO", "NCHW"),
                precision=jax.lax.Precision.HIGHEST,
            )
            return out[:, 0]

        # replicated tail: plain Stencil2D matvecs on full (small) grids
        rep_ops = [sl[0] for sl in self.asm.static_levels[S:]]
        rep_shapes = self.shapes[S:]

        def rep_matvec(i, u):
            return rep_ops[i].bc_matvec(rep_coeff[i], rep_mask[i], u)

        def rep_smooth(i, x, b, niter):
            mask, invd = rep_mask[i], rep_invd[i]

            def body(_, x):
                r = b - rep_matvec(i, x)
                return x + omega * invd * jnp.where(mask, 0.0, r)

            return jax.lax.fori_loop(0, niter, body, x)

        def rep_cycle(i, b):
            if i == len(rep_ops) - 1:
                if chol is not None:
                    x = jax.scipy.linalg.cho_solve((chol, False), b.reshape(-1))
                    return x.reshape(b.shape)
                return rep_smooth(i, jnp.zeros_like(b), b, 24)
            x = rep_smooth(i, jnp.zeros_like(b), b, nu_pre)
            r = jnp.where(rep_mask[i], 0.0, b - rep_matvec(i, x))
            bc = restrict2d_conv(r, rep_shapes[i + 1])
            bc = jnp.where(rep_mask[i + 1], 0.0, bc)
            corr = prolong2d_conv(rep_cycle(i + 1, bc), rep_shapes[i])
            x = x + jnp.where(rep_mask[i], 0.0, corr)
            return rep_smooth(i, x, b, nu_post)

        ny_last, nx_last = self.shapes[S - 1]
        nyl_last = self.nyl[S - 1]

        def vcycle(b):
            bs, xs = [b], []
            for l in range(S):
                x = smooth(l, jnp.zeros_like(bs[l]), bs[l], nu_pre)
                xs.append(x)
                r = jnp.where(sh_mask[l], 0.0, bs[l] - matvec(l, x))
                if l + 1 < S:
                    bc = jnp.where(sh_mask[l + 1], 0.0, restrict_loc(r))
                    bs.append(bc)
                else:
                    # gather the coarsest-sharded residual, run the
                    # replicated tail redundantly on every device
                    r_full = jax.lax.all_gather(r, axis, axis=1, tiled=True)
                    r_full = r_full[:, :ny_last]
                    if rep_ops:
                        bc = restrict2d_conv(r_full, rep_shapes[0])
                        bc = jnp.where(rep_mask[0], 0.0, bc)
                        xc = rep_cycle(0, bc)
                        corr_full = prolong2d_conv(xc, (ny_last, nx_last))
                    else:
                        corr_full = jnp.zeros_like(r_full)
                    pad = D * nyl_last - ny_last
                    corr_full = jnp.pad(corr_full, ((0, 0), (0, pad), (0, 0)))
                    d = jax.lax.axis_index(axis)
                    corr = jax.lax.dynamic_slice_in_dim(
                        corr_full, d * nyl_last, nyl_last, axis=1
                    )
            for l in reversed(range(S)):
                x = xs[l] + jnp.where(sh_mask[l], 0.0, corr)
                x = smooth(l, x, bs[l], nu_post)
                if l > 0:
                    corr = prolong_loc(x)
            return x

        def vdot_g(a, b):
            return jax.lax.psum(jnp.vdot(a, b), axis)

        b = jnp.where(sh_mask[0], 0.0, b0)
        tol2 = (rtol ** 2) * vdot_g(b, b)
        r = b - matvec(0, jnp.zeros_like(b))
        z = vcycle(jnp.where(sh_mask[0], 0.0, r))
        pvec = z
        rz = vdot_g(r, z)

        def cond(s):
            _, r, _, _, _, k, rr = s
            return (rr > tol2) & (k < maxiter)

        def body(s):
            x, r, z, pv, rz, k, _ = s
            Ap = matvec(0, pv)
            alpha = rz / vdot_g(pv, Ap)
            x = x + alpha * pv
            r = r - alpha * Ap
            z = vcycle(jnp.where(sh_mask[0], 0.0, r))
            rz2 = vdot_g(r, z)
            pv = z + (rz2 / rz) * pv
            return (x, r, z, pv, rz2, k + 1, vdot_g(r, r).real)

        state = (jnp.zeros_like(b), r, z, pvec, rz, 0, vdot_g(r, r).real)
        x, r, *_, k, rr = jax.lax.while_loop(cond, body, state)
        return x, k, jnp.sqrt(rr)

    def _step(self, rho, b_planar, rtol, maxiter):
        """Traceable: assemble hierarchy -> pad/shard -> shard_mapped PCG."""
        mesh, axis, D, S = self.mesh, self.axis, self.D, self.S
        gmg, _ = self.asm.assemble(rho)
        levels = gmg.levels

        cspec = P(None, None, None, None, axis, None)
        vspec = P(None, axis, None)
        csh = NamedSharding(mesh, cspec)
        vsh = NamedSharding(mesh, vspec)
        rep_sh = NamedSharding(mesh, P())

        sh_coeff, sh_mask, sh_invd = [], [], []
        for l in range(S):
            lv = levels[l]
            ny_l, _ = lv.shape
            pad = D * self.nyl[l] - ny_l
            coeff = jnp.pad(lv.coeff, ((0, 0),) * 4 + ((0, pad), (0, 0)))
            mask = jnp.pad(lv.mask, ((0, 0), (0, pad), (0, 0)),
                           constant_values=True)
            invd = jnp.pad(lv.inv_diag, ((0, 0), (0, pad), (0, 0)),
                           constant_values=1.0)
            sh_coeff.append(jax.lax.with_sharding_constraint(coeff, csh))
            sh_mask.append(jax.lax.with_sharding_constraint(mask, vsh))
            sh_invd.append(jax.lax.with_sharding_constraint(invd, vsh))

        rep_coeff, rep_mask, rep_invd = [], [], []
        for lv in levels[S:]:
            rep_coeff.append(jax.lax.with_sharding_constraint(lv.coeff, rep_sh))
            rep_mask.append(jax.lax.with_sharding_constraint(lv.mask, rep_sh))
            rep_invd.append(jax.lax.with_sharding_constraint(lv.inv_diag, rep_sh))
        chol = levels[-1].chol[0] if levels[-1].chol is not None else None

        ny0, _ = self.shapes[0]
        pad0 = D * self.nyl[0] - ny0
        b = jnp.pad(b_planar, ((0, 0), (0, pad0), (0, 0)))
        b = jax.lax.with_sharding_constraint(b, vsh)

        solve = shard_map(
            self._local_solve,
            mesh=mesh,
            in_specs=(
                [cspec] * S, [vspec] * S, [vspec] * S,
                ([P()] * len(rep_coeff), [P()] * len(rep_mask),
                 [P()] * len(rep_invd), None if chol is None else P()),
                vspec, P(), P(),
            ),
            out_specs=(vspec, P(), P()),
        )
        x, k, rn = solve(
            sh_coeff, sh_mask, sh_invd,
            (rep_coeff, rep_mask, rep_invd, chol),
            b, jnp.asarray(rtol, b.dtype), jnp.asarray(maxiter, jnp.int32),
        )
        return x[:, :ny0], k, rn

    def solve(self, rho, b_planar, rtol=1e-6, maxiter=200):
        """Assemble + sharded GMG-PCG; one jitted SPMD program.

        Args:
            rho: fine nodal density, (ny*nx,) or (ny, nx).
            b_planar: rhs as (nd, ny, nx) component planes (BCs by mask).

        Returns:
            (x, iters, resnorm) with x as (nd, ny, nx) planes.
        """
        if self._jit_step is None:
            self._jit_step = jax.jit(self._step)
        rho = jnp.asarray(rho, self.dtype).reshape(-1)
        b = jnp.asarray(b_planar, self.dtype)
        return self._jit_step(rho, b, rtol, maxiter)


def dryrun(mesh, dtype=jnp.float32):
    """Small sharded GMG-PCG elasticity solve for the driver's dry run."""
    from ..ops.dia import interleave_to_planar
    import pyfem_gpu_testflight_tpu as fem

    nx, ny = 33, 17
    creator = fem.ProblemCreator(nnodes_x=nx, nnodes_y=ny, element_type="quad")
    conn, X, dof_fixed, nodal_force = creator.create_linear_elasticity_problem()
    model = fem.LinearElasticity(
        "quad4", X, conn, dof_fixed, None, nodal_force, p=0.0, dtype=dtype
    )
    Lx, Ly = float(X[:, 0].max()), float(X[:, 1].max())
    sgmg = ShardedGMG2D(mesh, nx, ny, Lx, Ly, "elasticity", dtype=dtype)
    rho = jnp.ones((model.nnodes,), dtype)
    rhs = jnp.asarray(model.compute_rhs(), dtype)
    b = interleave_to_planar(rhs, 2).reshape(2, ny, nx)
    x, k, rn = sgmg.solve(rho, b, rtol=1e-6, maxiter=100)
    x.block_until_ready()
    assert np.isfinite(np.asarray(x)).all()
    return {"ndof": model.ndof, "iters": int(k), "resnorm": float(rn),
            "n_sharded_levels": sgmg.S, "levels": sgmg.asm.sizes}
