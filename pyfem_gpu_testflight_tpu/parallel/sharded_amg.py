"""Sharded smoothed-aggregation AMG for unstructured (.inp) meshes.

Multi-device form of :mod:`unstructured` — the last solver family
without an SPMD path (the reference's pyamg role, pyfem.py:2392-2400).
The RCM band reordering that makes every level's operator DIA-formed
also makes it *shardable*: a contiguous dof block only couples to dofs
within the matrix bandwidth, so the sharded DIA matvec needs one
``ppermute`` halo slab of ``bandwidth`` entries per side — the
unstructured analogue of the structured solver's one-slab stencil halo.

Sharding scheme (1D device mesh, dof axis):

* every level with ``bandwidth <= local_rows`` and ``n >= min_sharded``
  is block-partitioned: values, diagonal, smoothing, and the DIA matvec
  run per device;
* inter-level transfers pass through a *replicated* coarse vector:
  restriction is a device-local ``segment_sum`` of the tentative rows
  into global aggregates followed by a ``psum`` (the smoothed-
  prolongator correction applies the level's own sharded matvec);
  prolongation gathers from the replicated coarse vector with local
  row indices — no communication at all;
* levels below the threshold (and the dense coarsest solve) run
  replicated on every device — redundant compute on tiny levels is
  free and avoids sharding arbitrary aggregate graphs;
* the outer CG runs on the sharded fine level with ``psum`` dots.

Iterates match the single-device :func:`unstructured.amg_pcg` exactly
(same math, reordered reductions) — gated by tests/test_sharded_amg.py
on the torque-arm mesh.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .sharding import shard_map
from ..unstructured import AMGPreconditioner, csr_to_dia

__all__ = ["ShardedAMGPCG", "sharded_amg_pcg"]


class ShardedAMGPCG:
    """Sharded AMG-preconditioned CG for a host-assembled CSR system.

    Args:
        mesh: 1D ``jax.sharding.Mesh``.
        K_csr: BC-applied symmetric host CSR matrix.
        nd, coords, dtype, nu, smoother, ...: see
            :class:`unstructured.AMGPreconditioner`.
        min_sharded: smallest level size kept sharded (smaller levels
            replicate; redundant compute there is cheaper than the
            collective choreography).
    """

    def __init__(self, mesh, K_csr, nd=1, coords=None,
                 dtype=jnp.float32, min_sharded=256, **amg_kw):
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.D = int(mesh.devices.size)
        self.dtype = jnp.dtype(dtype)
        self.amg = AMGPreconditioner(K_csr, nd=nd, coords=coords,
                                     dtype=self.dtype, **amg_kw)
        perm = np.asarray(self.amg.perm)
        op0, vals0, offs0 = csr_to_dia(
            K_csr[perm][:, perm].tocsr(), self.dtype,
            max_offsets=amg_kw.get("max_offsets", 2048),
        )
        self.op0, self.vals0 = op0, vals0

        # per-level sharding plan
        self.plan = []
        for k, lv in enumerate(self.amg.levels):
            n = lv["n"]
            offs = np.asarray(
                self.amg.structure["levels"][k]["offsets"]
            )
            bw = int(np.abs(offs).max()) if offs.size else 0
            nl = math.ceil(n / self.D)
            # the coarsest level stays replicated (exact dense solve /
            # smooth-to-death run redundantly, matching single-device)
            sharded = (
                (bw <= nl) and (n >= int(min_sharded))
                and k < len(self.amg.levels) - 1
            )
            self.plan.append({
                "sharded": bool(sharded), "n": n, "nl": nl, "bw": bw,
                "offsets": offs,
            })
        # fine level must be shardable for the outer CG partitioning;
        # fall back to fully replicated solve otherwise
        self.fine_sharded = self.plan[0]["sharded"]
        self._run = None

    # -- local (per-device) pieces ------------------------------------------

    def _local_matvec(self, k, vals_loc, u_loc):
        """Sharded DIA matvec: one bandwidth halo slab per side.

        ``vals_loc`` is the (local_rows, noffs) block: vals_loc[i, j]
        is row (d*nl + i)'s coefficient on column (row + offsets[j]).
        """
        pl = self.plan[k]
        bw, nl = pl["bw"], pl["nl"]
        axis, D = self.axis, self.D
        fwd = [(i, i + 1) for i in range(D - 1)]
        bwd = [(i + 1, i) for i in range(D - 1)]
        if bw > 0 and D > 1:
            lo = jax.lax.ppermute(u_loc[-bw:], axis, fwd)
            hi = jax.lax.ppermute(u_loc[:bw], axis, bwd)
            uh = jnp.concatenate([lo, u_loc, hi])
        else:
            uh = jnp.pad(u_loc, (bw, bw))
        acc = None
        for j, o in enumerate(pl["offsets"]):
            t = vals_loc[:, j] * jax.lax.dynamic_slice_in_dim(
                uh, bw + int(o), nl
            )
            acc = t if acc is None else acc + t
        return acc

    def _pad(self, a, k, value=0.0):
        pl = self.plan[k]
        return jnp.pad(a, [(0, self.D * pl["nl"] - pl["n"])]
                       + [(0, 0)] * (a.ndim - 1), constant_values=value)

    def _local_params(self):
        """Per-level (vals, inv_diag, J_dof, Tv, dense, lam, w_sm, w_jac)
        with sharded levels' row-indexed arrays padded to D*nl."""
        out = []
        for k, p in enumerate(self.amg._params()):
            vals, inv_diag, J_dof, Tv, dense, lam, w_sm, w_jac = p
            if self.plan[k]["sharded"]:
                vals = self._pad(jnp.transpose(vals), k)  # (D*nl, noffs)
                inv_diag = self._pad(inv_diag, k, value=1.0)
                if J_dof is not None:
                    J_dof = self._pad(J_dof, k)
                    Tv = self._pad(Tv, k)
            out.append((vals, inv_diag, J_dof, Tv, dense, lam, w_sm,
                        w_jac))
        return out

    def _in_specs(self):
        ax = self.axis
        specs = []
        for k in range(len(self.amg.levels)):
            sh = self.plan[k]["sharded"]
            row = P(ax) if sh else P()
            rowv = P(ax, None) if sh else P()
            lv = self.amg.levels[k]
            specs.append((
                rowv if sh else P(),        # vals: (rows, noffs) / (noffs, n)
                row,                        # inv_diag
                None if lv.get("J_dof") is None else row,   # J_dof
                None if lv.get("Tv") is None else rowv,     # Tv
                None if lv.get("dense") is None else P(),   # dense
                P(), P(), P(),              # lam, w_sm, w_jac
            ))
        return specs

    # -- the shard_mapped cycle ----------------------------------------------

    def _matvec_at(self, k, params, u):
        if self.plan[k]["sharded"]:
            return self._local_matvec(k, params[k][0], u)
        return self.amg._matvec(params, k, u)

    def _smooth_at(self, k, params, x, b, x0_zero=False):
        amg = self.amg
        inv_diag = params[k][1]
        if amg.smoother == "chebyshev":
            lam = params[k][5]
            hi = 1.1 * lam
            lo = lam / 30.0
            theta = 0.5 * (hi + lo)
            delta = 0.5 * (hi - lo)
            sigma = theta / delta
            r = inv_diag * (b - self._matvec_at(k, params, x))
            d = r / theta
            x = x + d
            rho_old = 1.0 / sigma
            for _ in range(amg.cheb_degree - 1):
                r = inv_diag * (b - self._matvec_at(k, params, x))
                rho = 1.0 / (2.0 * sigma - rho_old)
                d = rho * rho_old * d + (2.0 * rho / delta) * r
                x = x + d
                rho_old = rho
            return x
        w = params[k][7]
        niter = amg.nu
        if x0_zero and niter > 0:
            x = w * inv_diag * b
            niter -= 1
        for _ in range(niter):
            x = x + w * inv_diag * (b - self._matvec_at(k, params, x))
        return x

    def _restrict(self, k, params, r):
        """P^T r -> *replicated* coarse vector."""
        axis = self.axis
        lv = self.amg.levels[k]
        s = r - params[k][6] * self._matvec_at(k, params,
                                               params[k][1] * r)
        if self.plan[k]["sharded"]:
            contrib = params[k][3] * s[:, None]
            out = jax.ops.segment_sum(contrib, params[k][2],
                                      num_segments=lv["n_agg"])
            return jax.lax.psum(out.reshape(-1), axis)
        return self.amg._TT(params, k, s)

    def _prolong(self, k, params, xc_rep):
        """P xc from a replicated coarse vector (gather is local)."""
        lv = self.amg.levels[k]
        Xc = xc_rep.reshape(lv["n_agg"], lv["m"])
        t = jnp.sum(params[k][3] * jnp.take(Xc, params[k][2], axis=0),
                    axis=1)
        return t - params[k][6] * (
            params[k][1] * self._matvec_at(k, params, t)
        )

    def _slice_local(self, k, rep):
        """Replicated level-k vector -> this device's padded block."""
        pl = self.plan[k]
        d = jax.lax.axis_index(self.axis)
        padded = jnp.pad(rep, (0, self.D * pl["nl"] - pl["n"]))
        return jax.lax.dynamic_slice_in_dim(padded, d * pl["nl"],
                                            pl["nl"])

    def _gather_full(self, k, loc):
        """This level's padded local blocks -> replicated real vector."""
        full = jax.lax.all_gather(loc, self.axis, axis=0, tiled=True)
        return full[: self.plan[k]["n"]]

    def _cycle(self, k, params, b):
        amg = self.amg
        if k == len(amg.levels) - 1:
            dense = params[k][4]
            if dense is None:
                w = params[k][7]
                x = jnp.zeros_like(b)
                for _ in range(24):
                    x = x + w * params[k][1] * (
                        b - self._matvec_at(k, params, x)
                    )
                return x
            return jax.scipy.linalg.solve(dense, b, assume_a="pos")
        x = self._smooth_at(k, params, jnp.zeros_like(b), b, x0_zero=True)
        r = b - self._matvec_at(k, params, x)
        bc_rep = self._restrict(k, params, r)  # replicated coarse
        if self.plan[k + 1]["sharded"]:
            xc_loc = self._cycle(k + 1, params,
                                 self._slice_local(k + 1, bc_rep))
            xc_rep = self._gather_full(k + 1, xc_loc)
        else:
            xc_rep = self._cycle(k + 1, params, bc_rep)
        x = x + self._prolong(k, params, xc_rep)
        return self._smooth_at(k, params, x, b)

    def _local_solve(self, vals0_loc, params, b_loc, rtol, atol, maxiter):
        axis = self.axis
        pdt = self.amg.dtype

        def vdot_g(a, c):
            return jax.lax.psum(jnp.vdot(a, c), axis)

        def matvec(u):
            return self._local_matvec(0, vals0_loc, u)

        def precond(r):
            return self._cycle(0, params, r.astype(pdt)).astype(
                b_loc.dtype
            )

        tol2 = jnp.maximum(
            rtol * jnp.sqrt(vdot_g(b_loc, b_loc).real), atol
        ) ** 2
        r = b_loc
        z = precond(r)
        p = z
        rz = vdot_g(r, z)

        def cond(s):
            _, r, _, _, _, k, rr = s
            return (rr > tol2) & (k < maxiter)

        def body(s):
            x, r, z, p, rz, k, _ = s
            Ap = matvec(p)
            alpha = rz / vdot_g(p, Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            z = precond(r)
            rz2 = vdot_g(r, z)
            p = z + (rz2 / rz) * p
            return (x, r, z, p, rz2, k + 1, vdot_g(r, r).real)

        state = (jnp.zeros_like(b_loc), r, z, p, rz, 0,
                 vdot_g(r, r).real)
        x, _, _, _, _, k, rr = jax.lax.while_loop(cond, body, state)
        return x, k, jnp.sqrt(rr)

    def solve(self, b, rtol=1e-8, atol=0.0, maxiter=1000):
        """AMG-PCG in the original (unpermuted) dof ordering.

        Returns:
            (x, iters, resnorm).
        """
        assert self.fine_sharded, (
            "fine level not shardable (bandwidth > local rows); use "
            "unstructured.amg_pcg"
        )
        ax = self.axis
        if self._run is None:
            vals0_rows = self._pad(jnp.transpose(self.vals0), 0)
            params = self._local_params()
            in_specs = (P(ax, None), self._in_specs(), P(ax), P(), P(),
                        P())
            fn = shard_map(
                self._local_solve,
                mesh=self.mesh,
                in_specs=in_specs,
                out_specs=(P(ax), P(), P()),
            )
            self._vals0_rows, self._params_dev = vals0_rows, params
            self._run = jax.jit(
                lambda bp, rtol, atol, mi: fn(
                    self._vals0_rows, self._params_dev, bp, rtol, atol,
                    mi
                ),
                static_argnames=("mi",),
            )
        bp = jnp.take(jnp.asarray(b, self.dtype), self.amg.perm, axis=0)
        bp = self._pad(bp, 0)
        x, k, rn = self._run(
            bp, jnp.asarray(rtol, self.dtype),
            jnp.asarray(atol, self.dtype), int(maxiter),
        )
        x = x[: self.plan[0]["n"]]
        return jnp.take(x, self.amg.iperm, axis=0), k, rn


def sharded_amg_pcg(mesh, K_csr, b, nd=1, coords=None, dtype=None,
                    rtol=1e-8, atol=0.0, maxiter=1000, **amg_kw):
    """One-shot sharded AMG-PCG (multi-device :func:`unstructured.amg_pcg`)."""
    dtype = jnp.dtype(dtype or np.asarray(b).dtype)
    solver = ShardedAMGPCG(mesh, K_csr, nd=nd, coords=coords,
                           dtype=dtype, **amg_kw)
    return solver.solve(b, rtol=rtol, atol=atol, maxiter=maxiter)
