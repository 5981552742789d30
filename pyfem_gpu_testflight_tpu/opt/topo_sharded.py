"""Sharded fully-fused on-device topology optimization.

Multi-chip form of :class:`opt.topo_device.DeviceTopo` — the
reference's flagship workload (200 ParOpt-MMA iterations of
Helmholtz-filtered RAMP compliance,
examples/topology_optimization/topo.py:176-189) as ONE SPMD dispatch
per MMA iteration.  Everything runs inside a single ``shard_map`` over
the solver's 1D device mesh, on lead-axis block-partitioned grids:

    filter fwd   — Jacobi-PCG on the (statically padded + sharded)
                   Helmholtz stencil, halo matvecs + psum dots;
    assembly     — per-device GMG hierarchy assembly
                   (ShardedGMG._local_hierarchy: one rho halo slab per
                   level, local uniform assembly + BC elimination);
    state solve  — the sharded V-cycle-PCG, warm-started from the
                   previous design's state;
    adjoint      — block-local scatter-free sensitivity
                   (multigrid._dv_sens_uniform on the halo-extended
                   block with phantom-element masking);
    filter bwd   — transpose filter, same halo PCG;
    MMA update   — device_update_body with psum'd dual reductions
                   (identical update on every device).

Host syncs only at logging points (the DeviceTopo drain contract).
Iterate-for-iterate equivalent to single-device DeviceTopo (gated by
tests/test_sharded_topo.py); padded lead rows carry zero design/state
throughout.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .mma import device_update_body
from .topo_device import DeviceTopo

__all__ = ["ShardedDeviceTopo"]


class ShardedDeviceTopo(DeviceTopo):
    """One-SPMD-dispatch-per-iteration MMA topology optimization.

    Args:
        model: LinearElasticity/LinearPoisson with
            ``attach_sharded_grid`` already called (per-device hierarchy
            assembly must be available, i.e. the uniform element path).
        filtr: Helmholtz filter with ``attach_structured_grid`` already
            called (its global stencil coefficients are padded + sharded
            here once; they are design-independent).
        Other args as :class:`DeviceTopo`.
    """

    def __init__(self, model, filtr, fixed_volume=0.4, x_init=0.95,
                 lb=1e-3, ub=1.0, rtol=1e-6, maxiter=200,
                 mma_options=None, rho_floor=None):
        sg = getattr(model, "_sgmg", None)
        assert sg is not None, "call model.attach_sharded_grid(...) first"
        assert sg.local_assembly, (
            "sharded DeviceTopo needs per-device assembly "
            "(uniform element path)"
        )
        assert getattr(filtr, "_st", None) is not None, (
            "call filtr.attach_structured_grid(...) first"
        )
        from ..parallel.sharded_gmg import halo_stencil_matvec, local_pcg
        from ..parallel.sharding import shard_map
        from ..multigrid import _dv_sens_uniform
        from ..ops.dia import interleave_to_planar
        from ..ops.stencil import _HEX8_LOCAL, _QUAD4_LOCAL

        self.model = model
        self.filtr = filtr
        self.fixed_volume = float(fixed_volume)
        self.dtype = model.dtype
        self.history = []
        o = dict(mma_options or {})
        upd_kw = dict(
            asy_grow=float(o.get("asymptote_grow", 1.2)),
            asy_shrink=float(o.get("asymptote_shrink", 0.7)),
            albefa=float(o.get("albefa", 0.1)),
            move=float(o.get("move_limit", 0.2)),
        )
        self.asy_init = float(o.get("asymptote_init", 0.5))
        self.x_init, self.lb, self.ub = x_init, float(lb), float(ub)
        self._rtol = float(rtol)
        rho_floor = float(lb if rho_floor is None else rho_floor)

        mesh, axis, D = sg.mesh, sg.axis, sg.D
        dim, nd = sg.dim, sg.nd
        asm = sg.asm
        shape0 = tuple(sg.shapes[0])
        n0 = shape0[0]
        N0 = D * sg.nl[0]
        pshape = (N0,) + shape0[1:]
        nnodes = model.nnodes
        dt = self.dtype
        S = sg.S
        frtol, fmax = filtr.rtol, 10 * filtr.ndof
        offsets = _QUAD4_LOCAL if dim == 2 else _HEX8_LOCAL
        Kq0 = asm.static_levels[0][5]
        lead_pad = ((0, N0 - n0),) + ((0, 0),) * (dim - 1)

        # -- statics: padded + (constraint-)sharded arrays ----------------
        def pad_lead(a, axis_idx, value=0.0):
            pads = [(0, 0)] * a.ndim
            pads[axis_idx] = (0, N0 - n0)
            return jnp.pad(a, pads, constant_values=value)

        # filter stencil: global coefficients padded with ZERO rows
        # (padded dofs fully decoupled — no global element touches them,
        # so real boundary rows have no coupling into the pad)
        fK = pad_lead(filtr._coeffK, filtr._coeffK.ndim - dim)
        fR = pad_lead(filtr._coeffR, filtr._coeffR.ndim - dim)
        finvd = pad_lead(filtr._st_inv_diag, 1, value=1.0)
        # padded-lead-row marker (design entries pinned to zero there)
        xpad_np = np.zeros(pshape, bool)
        xpad_np[n0:] = True
        xpad = jnp.asarray(xpad_np)
        # volume-gradient chain (design-independent): filter^T(dvol)
        dci_flat = filtr.apply_gradient(
            jnp.full((nnodes,), 1.0 / nnodes, dt)
        )
        dci = pad_lead(jnp.asarray(dci_flat, dt).reshape(shape0), 0)
        b0 = pad_lead(
            interleave_to_planar(
                jnp.asarray(model.compute_rhs(), dt), nd
            ).reshape((nd,) + shape0),
            1,
        )
        rep_masks = [sl[3] for sl in asm.static_levels[S:]]
        masks_h = sg.masks_h
        flexible = sg.smoother_dtype is not None

        self._pshape, self._n0, self._nd = pshape, n0, nd
        self._mesh, self._axis, self._dim = mesh, axis, dim

        def fmatvec(coeff, u):
            return halo_stencil_matvec(coeff, u, axis, D, 1, dim)

        def halo1(a):
            """One-slab lead halo on a (rows, *trail) scalar block."""
            fwd = [(i, i + 1) for i in range(D - 1)]
            bwd = [(i + 1, i) for i in range(D - 1)]
            lo = jax.lax.ppermute(a[-1:], axis, fwd)
            hi = jax.lax.ppermute(a[:1], axis, bwd)
            return jnp.concatenate([lo, a, hi], axis=0)

        def dv_sens_local(rho_loc, u_loc):
            """Block-local d(u^T K u)/drho with phantom-element masking."""
            nl0 = rho_loc.shape[0]
            rho_h = halo1(rho_loc)
            u_h = jnp.stack([halo1(u_loc[c]) for c in range(nd)])
            d_idx = jax.lax.axis_index(axis)
            e_glob = jnp.arange(nl0 + 1) + d_idx * nl0 - 1
            ev = ((e_glob >= 0) & (e_glob < n0 - 1)).astype(rho_h.dtype)
            out_h = _dv_sens_uniform(
                Kq0, asm.N, asm.p, offsets, rho_h, u_h, u_h,
                elem_valid=ev.reshape((1, nl0 + 1) + (1,) * (dim - 1)),
            )
            return out_h[1 : nl0 + 1]

        def local_step(x, xold1, xold2, low, upp, u_prev, k, lb_v, ub_v,
                       b0_l, fK_l, fR_l, finvd_l, dci_l, xpad_l,
                       mh_l, rm_l):
            mh_l = [m[0] for m in mh_l]
            # -- filter fwd (stencil PCG on local blocks) ---------------
            bf = fmatvec(fR_l, x[None])
            rho_raw = local_pcg(
                lambda u: fmatvec(fK_l, u), finvd_l, bf, axis,
                frtol, fmax,
            )[0]
            rho = jnp.maximum(rho_raw, rho_floor)
            # -- per-device hierarchy assembly + warm-started solve -----
            sh_coeff, sh_mask, sh_invd, rep, _ = sg._local_hierarchy(
                rho, mh_l, rm_l
            )
            mask0 = sh_mask[0]
            bz = jnp.where(mask0, 0.0, b0_l)
            u, it, rn = sg._local_solve(
                sh_coeff, sh_mask, sh_invd, rep, bz,
                jnp.asarray(self._rtol, bz.dtype),
                jnp.asarray(maxiter, jnp.int32),
                x0=jnp.where(mask0, 0.0, u_prev),
            )
            obj = jax.lax.psum(jnp.vdot(bz, u), axis)
            # -- adjoint sensitivity + filter bwd -----------------------
            dc = -dv_sens_local(rho, u)
            dc = jnp.where(rho_raw > rho_floor, dc, 0.0)
            dc = jnp.where(xpad_l, 0.0, dc)
            z2 = local_pcg(
                lambda v: fmatvec(fK_l, v), finvd_l, dc[None], axis,
                frtol, fmax,
            )
            g = jnp.where(xpad_l, 0.0, fmatvec(fR_l, z2)[0])
            # -- volume constraint + MMA update -------------------------
            vol = jax.lax.psum(jnp.sum(rho_raw), axis) / nnodes
            con = self.fixed_volume - vol
            x_new, low_n, upp_n, lam, step_sz = device_update_body(
                x, xold1, xold2, low, upp, g, dci_l, -con, lb_v, ub_v,
                k, psum_axis=axis, **upd_kw,
            )
            x_new = jnp.where(xpad_l, 0.0, x_new)
            # in-step convergence guard (DeviceTopo semantics: frozen
            # here <=> the drain's _check_converged raises)
            bnorm = jnp.sqrt(jax.lax.psum(jnp.vdot(bz, bz), axis).real)
            bad = ~(rn <= 10.0 * self._rtol * bnorm)
            x_new = jnp.where(bad, x, x_new)
            xo1 = jnp.where(bad, xold1, x)
            xo2 = jnp.where(bad, xold2, xold1)
            low = jnp.where(bad, low, low_n)
            upp = jnp.where(bad, upp, upp_n)
            u = jnp.where(bad, u_prev, u)
            sdt = obj.dtype
            step_sz = jnp.where(bad, 0.0, step_sz)
            stats = jnp.stack([
                obj, con.astype(sdt), it.astype(sdt), rn.astype(sdt),
                bnorm.astype(sdt), step_sz.astype(sdt),
            ])
            return (x_new, xo1, xo2, low, upp, u, stats)

        rspec = P(*((axis,) + (None,) * (dim - 1)))
        vspec = P(*((None, axis) + (None,) * (dim - 1)))
        cspec = P(*((None,) * (2 + dim) + (axis,) + (None,) * (dim - 1)))
        mspec = P(*((axis,) + (None,) * (dim + 1)))
        kw = {"check_vma": False} if sg.pallas else {}
        sharded_step = shard_map(
            local_step,
            mesh=mesh,
            in_specs=(rspec, rspec, rspec, rspec, rspec, vspec, P(),
                      rspec, rspec, vspec, cspec, cspec,
                      vspec, rspec, rspec,
                      [mspec] * S, [P()] * len(rep_masks)),
            out_specs=(rspec, rspec, rspec, rspec, rspec, vspec, P()),
            **kw,
        )

        def step(x, xold1, xold2, low, upp, u_prev, k, lb_v, ub_v,
                 rhs, coeffK, coeffR, finvd_a, dci_vec):
            con = lambda a, sp: jax.lax.with_sharding_constraint(
                a, NamedSharding(mesh, sp)
            )
            return sharded_step(
                con(x, rspec), con(xold1, rspec), con(xold2, rspec),
                con(low, rspec), con(upp, rspec), con(u_prev, vspec),
                k, con(lb_v, rspec), con(ub_v, rspec), con(rhs, vspec),
                coeffK, coeffR, finvd_a, con(dci_vec, rspec),
                con(xpad, rspec), masks_h, rep_masks,
            )

        self._step = jax.jit(step)
        self._rhs_il = b0  # padded planar rhs (name kept for optimize())
        self._fargs = (fK, fR, finvd)
        self._dci = dci
        self._xpad_np = xpad_np

    # -- DeviceTopo hooks ---------------------------------------------------

    def _init_state(self):
        dt = self.dtype
        lb_v = jnp.full(self._pshape, self.lb, dt)
        ub_v = jnp.full(self._pshape, self.ub, dt)
        x = jnp.clip(jnp.full(self._pshape, self.x_init, dt), lb_v, ub_v)
        x = jnp.where(jnp.asarray(self._xpad_np), 0.0, x)
        u_prev = jnp.zeros((self._nd,) + self._pshape, dt)
        return x, lb_v, ub_v, u_prev

    def _finalize_x(self, x):
        """Crop padding, return the model's flat nodal design vector."""
        return x[: self._n0].reshape(-1)

    def _filter_apply(self, x):
        return self.filtr.apply(x)
