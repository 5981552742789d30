"""Nonlinear Poisson: -div( h(x) (1 + u^2) grad u ) = g, Newton-solved.

Reference parity: ``NonlinearPoisson2D`` (pyfem.py:1332-1664) — the same
manufactured source term g (pyfem.py:1427-1448), the same
Bernstein-polynomial design field h(xdv) (pyfem.py:1450-1472), residual
and consistent tangent, and the Newton contract of
``Assembler.solve_nonlinear`` (pyfem.py:2319-2355).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.precision import einsum
from scipy import special

from .. import assembly, solvers
from ..ops import geometry
from .base import FEModel

__all__ = ["NonlinearPoisson", "NonlinearPoisson2D"]


def gfunc(Xq):
    """Manufactured source term (pyfem.py:1427-1448)."""
    x, y = Xq[..., 0], Xq[..., 1]
    return (
        1e4 * x * (1.0 - x) * (1.0 - 2.0 * x) * y * (1.0 - y) * (1.0 - 2.0 * y)
    )


def hfunc(xdv, Xq):
    """Bernstein design field h = 1 + sum_k xdv_k B_k(x) 4y(1-y)."""
    x, y = Xq[..., 0], Xq[..., 1]
    n = xdv.shape[0]
    h = jnp.ones_like(x)
    yarg = 4.0 * y * (1.0 - y)
    for k in range(n):
        coef = float(special.binom(n - 1, k))
        h = h + xdv[k] * (coef * (1.0 - x) ** (n - 1 - k) * x**k) * yarg
    return h


@functools.partial(jax.jit, static_argnames=())
def _residual_elem(Xe, dN, N, wq, conn, xdv, u):
    """Element residual R_e (pyfem.py:1530-1537)."""
    detJ, Ngrad = geometry.shape_gradients(Xe, dN)
    Xq = geometry.interp_to_quads(N, Xe)
    ue = jnp.take(u, conn, axis=0)
    uq = geometry.interp_to_quads(N, ue)
    h = hfunc(xdv, Xq)
    g = gfunc(Xq)
    c = detJ * h * (1.0 + uq**2) * wq[None, :]
    flux = einsum("eq,eqjl,eqkl,ek->ej", c, Ngrad, Ngrad, ue)
    load = einsum("eq,qn->en", detJ * wq[None, :] * g, N)
    return flux - load


@functools.partial(jax.jit, static_argnames=())
def _tangent_elem(Xe, dN, N, wq, conn, xdv, u):
    """Consistent tangent K_e (pyfem.py:1595-1609)."""
    detJ, Ngrad = geometry.shape_gradients(Xe, dN)
    Xq = geometry.interp_to_quads(N, Xe)
    ue = jnp.take(u, conn, axis=0)
    uq = geometry.interp_to_quads(N, ue)
    h = hfunc(xdv, Xq)
    c1 = detJ * h * (1.0 + uq**2) * wq[None, :]
    Ke = einsum("eq,eqjl,eqkl->ejk", c1, Ngrad, Ngrad)
    c2 = 2.0 * detJ * h * uq * wq[None, :]
    bbu = einsum("eqjl,eqkl,ek->eqj", Ngrad, Ngrad, ue)
    Ke = Ke + einsum("eq,eqj,qi->eji", c2, bbu, N)
    return Ke


class NonlinearPoisson(FEModel):
    """Newton-solved nonlinear Poisson problem on a 2D mesh."""

    def __init__(self, etype, X, conn, dof_fixed=(), dof_fixed_vals=None,
                 dtype=jnp.float64):
        super().__init__(
            etype, X, conn, dof_fixed, dof_fixed_vals, ndof_per_node=1,
            dtype=dtype,
        )

    def element_jacobian(self, xdv, u):
        return _tangent_elem(
            self.Xe, self.dN, self.N, self.wq, self.conn,
            jnp.asarray(xdv, self.dtype), jnp.asarray(u, self.dtype),
        )

    def compute_jacobian(self, xdv, u):
        return self.assemble_scipy(self.element_jacobian(xdv, u))

    def compute_rhs(self, xdv, u):
        """Global Newton residual R(u) (pyfem.py:1375-1388)."""
        re = _residual_elem(
            self.Xe, self.dN, self.N, self.wq, self.conn,
            jnp.asarray(xdv, self.dtype), jnp.asarray(u, self.dtype),
        )
        return assembly.assemble_vector(re, self.conn_dof, self.ndof)

    def residual(self, xdv, u):
        """BC-applied residual: fixed dofs zeroed (dof values pinned)."""
        return self.bc.zero_fixed(self.compute_rhs(xdv, u))

    def attach_structured_grid(self, nnodes_x, nnodes_y, **gmg_options):
        """Enable GMG preconditioning of the Newton tangent solves.

        The tangent (pyfem.py:1595-1609) splits into a dominant SPD
        variable-coefficient Poisson part — coefficient
        ``c(x, u) = h(x) (1 + u^2)`` — plus a low-order nonsymmetric
        term ``2 h u_q (B u_e) N^T``.  On a structured quad grid the
        SPD part is exactly what :class:`multigrid.GMGAssembler` builds
        for ``physics="poisson"`` with ``p=0`` (RAMP at p=0 is the
        identity material map), fed the *nodal* coefficient field as
        "density".  ``solve_nonlinear(method="gmg")`` /
        ``solve_nonlinear_fused(method="gmg")`` then run
        V-cycle-right-preconditioned GMRES on the exact assembled
        tangent stencil — mesh-independent linear iteration counts
        where Jacobi-GMRES grows with the grid.

        The reference has no scalable path for its nonlinear model
        (pyamg is never wired into the Newton loop; solve_nonlinear
        uses plain scipy gmres, pyfem.py:2319-2355).
        """
        from ..multigrid import GMGAssembler

        assert self.etype.name == "quad4", "gmg Newton requires quad4 grids"
        assert not self.bc._has_vals, (
            "gmg Newton tangent path supports zero Dirichlet values only"
        )
        nx, ny = int(nnodes_x), int(nnodes_y)
        assert nx * ny == self.nnodes
        X = self.X_host
        fine_mask = np.asarray(self.bc.mask).reshape(1, ny, nx)
        kw = dict(physics="poisson", p=0.0, dtype=self.dtype,
                  fine_mask=fine_mask)
        kw.update(gmg_options)
        self._gmg_newton = GMGAssembler(
            nx, ny, float(X[:, 0].max()), float(X[:, 1].max()), **kw
        )
        self._gmg_newton_shape = (ny, nx)
        self._gmg_newton_jit = None
        self._unif = self._uniform_newton_statics(nx, ny)
        return self

    def _uniform_newton_statics(self, nx, ny):
        """Static tables for the scatter-free uniform-grid Newton path.

        On the ProblemCreator raster (conn row-major with x fastest,
        local order == ops.stencil._QUAD4_LOCAL, congruent elements)
        the element einsum paths collapse: the flux IS the
        variable-coefficient stencil times u (element residual
        pyfem.py:1530-1537 with u_e factored out), and the tangent's
        quadrature coefficients are shifted-slice interpolations of
        the node grid — no per-element gather, no (nelems, 4, 4)
        materialization for the SPD part.  Returns None (generic path)
        when the mesh is not the creator raster.
        """
        from ..ops.stencil import _QUAD4_LOCAL

        conn = np.asarray(self.conn_host)
        nodes = np.arange(ny * nx).reshape(ny, nx)
        cols = [
            nodes[ay : ay + ny - 1 or None, ax : ax + nx - 1 or None][
                : ny - 1, : nx - 1
            ].ravel()
            for (ay, ax) in _QUAD4_LOCAL
        ]
        expected = np.stack(cols, axis=-1)
        if conn.shape != expected.shape or not np.array_equal(
            conn, expected
        ):
            return None
        X = self.X_host
        xg = X[:, 0].reshape(ny, nx)
        yg = X[:, 1].reshape(ny, nx)
        hx = np.diff(xg, axis=1)
        hy = np.diff(yg, axis=0)
        if not (
            np.allclose(hx, hx.flat[0], rtol=0, atol=1e-12)
            and np.allclose(hy, hy.flat[0], rtol=0, atol=1e-12)
            and np.allclose(np.diff(xg, axis=0), 0.0, atol=1e-12)
            and np.allclose(np.diff(yg, axis=1), 0.0, atol=1e-12)
        ):
            return None

        N = np.asarray(self.N, np.float64)          # (nq, 4)
        dN = np.asarray(self.dN, np.float64)        # (nq, 4, 2)
        wq = np.asarray(self.wq, np.float64)
        xe0 = np.asarray(X[conn[0]], np.float64)    # (4, 2)
        Xc = xe0 - xe0.mean(axis=0, keepdims=True)
        J = np.einsum("qnk,ni->qik", dN, Xc)        # (nq, 2, 2)
        detJ = J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0]
        inv = np.empty_like(J)
        inv[:, 0, 0] = J[:, 1, 1]
        inv[:, 1, 1] = J[:, 0, 0]
        inv[:, 0, 1] = -J[:, 0, 1]
        inv[:, 1, 0] = -J[:, 1, 0]
        inv /= detJ[:, None, None]
        G = np.einsum("qnk,qki->qni", dN, inv)      # (nq, 4, 2) Ngrad
        # per-quad physical coordinates of every element, as planes
        offs = np.einsum("qn,ni->qi", N, xe0 - xe0[0])  # (nq, 2)
        x0 = xg[: ny - 1, : nx - 1]
        y0 = yg[: ny - 1, : nx - 1]
        Xq_grid = np.stack(
            [
                np.stack([x0 + offs[q, 0], y0 + offs[q, 1]], axis=-1)
                for q in range(N.shape[0])
            ]
        )  # (nq, ney, nex, 2)

        # static load vector (g has no xdv dependence), assembled once
        # on host
        with jax.default_device(jax.devices("cpu")[0]):
            gq = np.asarray(gfunc(jnp.asarray(Xq_grid)))
            le = np.einsum("q,qyx,qn->yxn", detJ * wq, gq, N)
            load = np.zeros(ny * nx)
            np.add.at(load, conn.reshape(-1),
                      le.reshape(-1, N.shape[0]).reshape(-1))
        dt = self.dtype
        lhi = load.astype(np.float32)
        llo = (load - lhi.astype(np.float64)).astype(np.float32)
        return dict(
            N=jnp.asarray(N, dt), G=jnp.asarray(G, dt),
            detJw=jnp.asarray(detJ * wq, dt),
            Xq=jnp.asarray(Xq_grid, dt),
            load=jnp.asarray(load, dt),
            load_hi=jnp.asarray(lhi.reshape(1, ny, nx)),
            load_lo=jnp.asarray(llo.reshape(1, ny, nx)),
        )

    def _uniform_tangent_coeffs(self, xdv, u_grid):
        """Scatter-free tangent stencil coefficients on the raster.

        Returns (coeff_spd_raw, coeff_rank): the variable-coefficient
        Poisson part assembled via unit matrices (also the exact flux
        operator: flux = coeff_spd_raw . u), and the low-order
        nonsymmetric ``2 h u_q (B u_e) N^T`` term's stencil.
        """
        st0 = self._gmg_newton.static_levels[0][0]
        Kq = self._gmg_newton.static_levels[0][5]
        un = self._unif
        N, G, detJw, Xq = un["N"], un["G"], un["detJw"], un["Xq"]
        ny, nx = self._gmg_newton_shape
        ney, nex = ny - 1, nx - 1
        from ..ops.stencil import _QUAD4_LOCAL

        us = [
            u_grid[ay : ay + ney, ax : ax + nex]
            for (ay, ax) in _QUAD4_LOCAL
        ]
        nq = N.shape[0]
        h_q = hfunc(xdv, Xq)                       # (nq, ney, nex)
        uq = jnp.stack(
            [sum(N[q, n] * us[n] for n in range(4)) for q in range(nq)]
        )
        # Kq already carries w_q |J_q| (unit_matrices); the material
        # factor is just h (1 + u_q^2)
        c1 = h_q * (1.0 + uq * uq)
        coeff_spd = st0.assemble_uniform(c1, Kq)

        gradu = [
            [sum(G[q, n, l] * us[n] for n in range(4)) for l in range(2)]
            for q in range(nq)
        ]
        c2 = 2.0 * detJw[:, None, None] * h_q * uq  # (nq, ney, nex)
        # Ke2[e, j, i] = sum_q c2[q] bbu[q, j] N[q, i]
        bbu = [
            [
                sum(G[q, j, l] * gradu[q][l] for l in range(2))
                for j in range(4)
            ]
            for q in range(nq)
        ]
        Ke2 = jnp.stack(
            [
                jnp.stack(
                    [
                        sum(c2[q] * bbu[q][j] * N[q, i]
                            for q in range(nq))
                        for i in range(4)
                    ],
                    axis=-1,
                )
                for j in range(4)
            ],
            axis=-2,
        )  # (ney, nex, 4, 4)
        coeff_rank = st0.assemble(Ke2.reshape(-1, 4, 4))
        return coeff_spd, coeff_rank

    def _uniform_residual(self, xdv, u):
        """R(u) = K_c(u) u - load on the raster (scatter-free)."""
        st0 = self._gmg_newton.static_levels[0][0]
        ny, nx = self._gmg_newton_shape
        u_grid = u.reshape(ny, nx)
        coeff_spd, _ = self._uniform_tangent_coeffs(
            xdv, u_grid
        )
        flux = st0.matvec(coeff_spd, u_grid[None]).reshape(-1)
        return self.bc.zero_fixed(flux - self._unif["load"])

    def _uniform_residual_df(self, xdv, u):
        """(r_f32, ||r||) with the flux in double-float arithmetic.

        The f32 Newton residual floor is cancellation in
        ``flux - load`` (measured ~1.5e-2 relative at 1025^2); the
        ops.df64 compensated matvec computes the flux of the
        f32-coefficient operator to ~1e-13 relative, so the residual
        — and the convergence test — see the TRUE residual of the
        (f32-coefficient) problem instead of assembly noise.  Costs
        one compensated 9-tap matvec (~1 ms class at 1M dof).
        """
        from ..ops import df64

        st0 = self._gmg_newton.static_levels[0][0]
        mask0 = self._gmg_newton.static_levels[0][3]
        ny, nx = self._gmg_newton_shape
        u_grid = u.reshape(1, ny, nx)
        coeff_spd, _ = self._uniform_tangent_coeffs(
            xdv, u_grid[0]
        )
        zero_c = jnp.zeros_like(coeff_spd)
        yhi, ylo = df64.stencil_matvec_df(
            st0, coeff_spd, zero_c, u_grid, jnp.zeros_like(u_grid)
        )
        lhi, llo = self._unif["load_hi"], self._unif["load_lo"]
        rhi, rlo = df64.df_add(yhi, ylo, -lhi, -llo)
        rhi = jnp.where(mask0, 0.0, rhi)
        rlo = jnp.where(mask0, 0.0, rlo)
        rn = jnp.sqrt(df64.df_dot(rhi, rlo, rhi, rlo))
        r32 = (rhi + rlo).reshape(-1)
        return r32, rn.astype(u.dtype)

    def _gmg_tangent_solve_fn(self, maxiter=400):
        """Pure ``(xdv, u, res, rtol) -> (du, iters, resnorm, |b|)``.

        One tangent solve: assemble the exact (nonsymmetric) tangent
        into stencil coefficient planes (ops.stencil scatter-free
        assembly + symmetric BC elimination), assemble the SPD-part GMG
        hierarchy from the nodal coefficient field, and run
        right-preconditioned GMRES.  Traceable — used inside the fused
        Newton while_loop and (jitted standalone) by the host loop.
        """
        asm = self._gmg_newton
        st0 = asm.static_levels[0][0]
        mask0 = asm.static_levels[0][3]
        ny, nx = self._gmg_newton_shape
        Xe, dN, N, wq, conn = self.Xe, self.dN, self.N, self.wq, self.conn
        Xn = jnp.asarray(self.X_host, self.dtype)

        unif = getattr(self, "_unif", None)

        def solve(xdv, u, res, rtol):
            if unif is not None:
                cs, cr = self._uniform_tangent_coeffs(
                    xdv, u.reshape(ny, nx)
                )
                ce = st0.bc_eliminate(cs + cr, mask0)
            else:
                Ke = _tangent_elem(Xe, dN, N, wq, conn, xdv, u)
                ce = st0.bc_eliminate(st0.assemble(Ke), mask0)
            c_nodal = hfunc(xdv, Xn) * (1.0 + u * u)
            gmg, _ = asm.assemble(c_nodal)
            b = jnp.where(mask0, 0.0, res.reshape(1, ny, nx)).reshape(-1)
            mv = lambda v: st0.matvec(
                ce, v.reshape(1, ny, nx)
            ).reshape(-1)
            pre = lambda r: gmg.apply(
                jnp.where(mask0, 0.0, r.reshape(1, ny, nx))
            ).reshape(-1)
            du, li, lr = solvers.gmres_loop(
                mv, b, precond=pre, rtol=rtol, maxiter=maxiter
            )
            return du, li, lr, jnp.linalg.norm(b)

        return solve

    def solve_nonlinear(
        self, method="gmres", xdv=None, u0=None, tol=1e-10, atol=1e-12,
        max_iter=10, verbose=True,
    ):
        """Newton loop with the reference contract (pyfem.py:2319-2355).

        ``method="gmg"`` (after :meth:`attach_structured_grid`) solves
        each tangent system by V-cycle-preconditioned GMRES on device.
        """
        assert method in ("direct", "cg", "gmres", "gmg")
        if method == "gmg":
            from .base import _check_converged

            assert getattr(self, "_gmg_newton", None) is not None, (
                "call attach_structured_grid(nx, ny) before method='gmg'"
            )
            if self._gmg_newton_jit is None:
                self._gmg_newton_jit = jax.jit(self._gmg_tangent_solve_fn())
            xdv = jnp.asarray(xdv, self.dtype)
            u = (jnp.zeros(self.ndof, self.dtype) if u0 is None
                 else jnp.asarray(u0))
            lin_rtol = 1e-8

            def jac_solve(u_k, res):
                du, li, lr, bnorm = self._gmg_newton_jit(
                    xdv, u_k, res, lin_rtol
                )
                _check_converged("gmg-gmres", float(lr),
                                 lin_rtol * float(bnorm), iters=int(li))
                if verbose:
                    print(
                        f"        [gmg-gmres: {int(li)} iters, "
                        f"||r|| = {float(lr):.3e}]"
                    )
                return du

            return solvers.newton(
                lambda u_k: self.residual(xdv, u_k),
                jac_solve, u, tol=tol, atol=atol, max_iter=max_iter,
                verbose=verbose,
            )
        xdv = jnp.asarray(xdv, self.dtype)
        u = jnp.zeros(self.ndof, self.dtype) if u0 is None else jnp.asarray(u0)

        def jac_solve(u_k, res):
            Ke = self.element_jacobian(xdv, u_k)
            du, _ = self._solve_system(Ke, res, method)
            if verbose and method != "direct":
                st = self.last_solve_stats
                print(
                    f"        [{st['method']}: {st['iters']} iters, "
                    f"||r|| = {st['resnorm']:.3e}]"
                )
            return du

        return solvers.newton(
            lambda u_k: self.residual(xdv, u_k),
            jac_solve,
            u,
            tol=tol,
            atol=atol,
            max_iter=max_iter,
            verbose=verbose,
        )

    def solve_nonlinear_fused(
        self, method="gmres", xdv=None, u0=None, tol=1e-10, atol=1e-12,
        max_iter=10, verbose=True, lin_rtol=1e-8, lin_maxiter=None,
    ):
        """TPU-native Newton: the whole solve as ONE jitted dispatch.

        The host loop above keeps the reference contract
        (pyfem.py:2319-2355) with a device sync per iteration; this form
        runs the same iteration — residual assembly, consistent-tangent
        assembly, Jacobi-preconditioned CG/GMRES, update — inside a
        single ``lax.while_loop``, so an entire Newton solve is one
        dispatch (SURVEY §7 "Newton loop as lax.while_loop").  The
        residual table streams through ``jax.debug.print``.  Iterates
        match the host loop to roundoff (gated by
        tests/test_nonlinear_poisson.py).

        Returns:
            (u, newton_iters, resnorm): converged solution, number of
            Newton iterations (residual evaluations), final residual
            norm.  Raises RuntimeError if a tangent solve stalls (the
            in-loop guard freezes the iterate; one host sync checks the
            flag at this public boundary — §5 failure detection).

        ``method="gmg"`` (after :meth:`attach_structured_grid`)
        replaces the Jacobi tangent solver with
        V-cycle-right-preconditioned GMRES — in-jit stencil assembly of
        the exact tangent + a per-Newton-iteration GMG hierarchy from
        the nodal coefficient field, still one dispatch for the whole
        Newton solve.
        """
        assert method in ("cg", "gmres", "gmg")
        if method == "gmg":
            assert getattr(self, "_gmg_newton", None) is not None, (
                "call attach_structured_grid(nx, ny) before method='gmg'"
            )
        import jax

        xdv = jnp.asarray(xdv, self.dtype)
        u0 = (jnp.zeros(self.ndof, self.dtype) if u0 is None
              else jnp.asarray(u0, self.dtype))
        key = (method, int(max_iter), bool(verbose),
               None if lin_maxiter is None else int(lin_maxiter))
        if getattr(self, "_fused_newton_cache", None) is None:
            self._fused_newton_cache = {}
        if key not in self._fused_newton_cache:
            mask = self.bc.mask
            conn_dof = self.conn_dof
            ndof = self.ndof
            maxlin = (10 * ndof if lin_maxiter is None
                      else int(lin_maxiter))
            Xe, dN, N, wq, conn = (
                self.Xe, self.dN, self.N, self.wq, self.conn
            )
            bc = self.bc

            gmg_solve = (
                self._gmg_tangent_solve_fn(maxiter=maxlin)
                if method == "gmg" else None
            )

            use_unif = (
                method == "gmg" and getattr(self, "_unif", None)
                is not None
            )
            unif_df = use_unif and self.dtype == jnp.float32

            def program(xdv_v, u_init, tol_v, atol_v, lin_rtol_v):
                def residual(u):
                    if use_unif:
                        # scatter-free raster residual: the flux IS
                        # the coefficient stencil times u
                        return self._uniform_residual(xdv_v, u)
                    re = _residual_elem(Xe, dN, N, wq, conn, xdv_v, u)
                    return bc.zero_fixed(
                        assembly.assemble_vector(re, conn_dof, ndof)
                    )

                def residual_rn(u):
                    if unif_df:
                        # double-float flux: the convergence test sees
                        # the true residual of the f32-coefficient
                        # operator, not f32 flux-load cancellation
                        return self._uniform_residual_df(xdv_v, u)
                    r = residual(u)
                    return r, jnp.linalg.norm(r)

                def lin_solve(u, res):
                    if method == "gmg":
                        return gmg_solve(xdv_v, u, res, lin_rtol_v)
                    Ke = _tangent_elem(Xe, dN, N, wq, conn, xdv_v, u)
                    b = bc.constrain_rhs(
                        res,
                        lambda v: assembly.elem_matvec(
                            Ke, conn_dof, v, ndof
                        ),
                    )
                    diag = assembly.elem_diagonal(Ke, conn_dof, ndof)
                    inv_diag = 1.0 / jnp.where(
                        mask | (diag == 0), 1.0, diag
                    )
                    mv = lambda v: assembly.bc_elem_matvec(
                        (Ke, conn_dof, mask), v
                    )
                    loop = (solvers.cg_loop if method == "cg"
                            else solvers.gmres_loop)
                    du, li, lr = loop(mv, b, inv_diag=inv_diag,
                                      rtol=lin_rtol_v, maxiter=maxlin)
                    return du, li, lr, jnp.linalg.norm(b)

                def cond(c):
                    _, k, _, _, done, fail = c
                    return (~done) & (~fail) & (k < max_iter)

                def body(c):
                    u, k, rn0, _, _, _ = c
                    res, rn = residual_rn(u)
                    rn0 = jnp.where(k == 0, rn, rn0)
                    conv = (k > 0) & ((rn < tol_v * rn0)
                                      | (rn < atol_v))
                    if verbose:
                        jax.debug.print(
                            "pyfem-tpu-fused {k}  {rn}", k=k, rn=rn
                        )

                    def take_step(_):
                        du, li, lr, bnorm = lin_solve(u, res)
                        if verbose:
                            jax.debug.print(
                                "        [" + method
                                + ": {li} iters, ||r|| = {lr}]",
                                li=li, lr=lr,
                            )
                        # stalled-tangent-solve guard (§5 failure
                        # detection — the host loop's _check_converged
                        # raises at the same slack): freeze u and stop
                        bad = ~(lr <= 10.0 * lin_rtol_v * bnorm)
                        return jnp.where(bad, u, u - du), bad

                    u_new, fail = jax.lax.cond(
                        conv,
                        lambda _: (u, jnp.asarray(False)),
                        take_step, None,
                    )
                    return (u_new, k + 1, rn0, rn, conv, fail)

                zero = jnp.zeros((), jnp.zeros((), self.dtype).real.dtype)
                u, k, rn0, rn, _, fail = jax.lax.while_loop(
                    cond, body,
                    (u_init, jnp.asarray(0, jnp.int32), zero, zero,
                     jnp.asarray(False), jnp.asarray(False)),
                )
                return u, k, rn, fail

            self._fused_newton_cache[key] = jax.jit(program)

        rdt = jnp.zeros((), self.dtype).real.dtype
        u, k, rn, fail = self._fused_newton_cache[key](
            xdv, u0, jnp.asarray(tol, rdt), jnp.asarray(atol, rdt),
            jnp.asarray(lin_rtol, rdt),
        )
        if bool(fail):  # one host sync at the public solve boundary
            raise RuntimeError(
                f"fused Newton: {method} tangent solve failed to "
                f"converge at Newton iteration {int(k) - 1}"
            )
        return u, k, rn


NonlinearPoisson2D = NonlinearPoisson
