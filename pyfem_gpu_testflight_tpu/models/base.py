"""Shared model infrastructure.

A model bundles: an element type (static tables), mesh arrays on device,
dof maps, Dirichlet BCs, and a lazily-built host sparsity pattern for the
direct/oracle path.  All compute methods are pure jitted functions taking
the model's array pytree — one compilation per problem *shape*.

Reference parity: ModelBase (pyfem.py:634-931) — constructor signature
(ndof_per_node, X, conn, dof_fixed, dof_fixed_vals, element tables), rhs
and Jacobian assembly plumbing, and the RAMP material helpers shared by
LinearPoisson / LinearElasticity (pyfem.py:1278-1329, 1922-1973).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import assembly
from ..bcs import DirichletBC
from ..elements import get_element
from ..ops import geometry

__all__ = ["FEModel", "ramp", "ramp_deriv"]


def _check_converged(method, resnorm, tol, iters=None, slack=10.0):
    """Raise on a stalled iterative solve (pyfem.py:1067, 2421-2422).

    The reference raises RuntimeError when scipy cg/gmres return a
    nonzero code, i.e. when the tolerance was not met within maxiter.
    Here the residual norm is checked directly (one host sync at the
    public solve boundary).  ``slack`` tolerates the last-iteration
    rounding between the loop's squared-norm test and this recheck —
    gmres in particular reports through a final matvec.
    """
    rn = float(resnorm)
    t = float(tol)
    if not np.isfinite(rn) or rn > slack * max(t, 1e-300):
        it = "" if iters is None else f" after {int(iters)} iterations"
        raise RuntimeError(
            f"{method} failed to converge{it}: ||r|| = {rn:.3e} > "
            f"tolerance {t:.3e}"
        )


def ramp(rho_q, p):
    """RAMP penalization factor rho / (1 + p (1 - rho)) (pyfem.py:1300)."""
    return rho_q / (1.0 + p * (1.0 - rho_q))


def ramp_deriv(rho_q, p):
    """d RAMP / d rho = (1 + p) / (1 + p (1 - rho))^2 (pyfem.py:1325)."""
    return (1.0 + p) / (1.0 + p * (1.0 - rho_q)) ** 2


class FEModel:
    """Base class holding mesh/element/BC state for a physics model."""

    def __init__(
        self,
        etype,
        X,
        conn,
        dof_fixed=(),
        dof_fixed_vals=None,
        *,
        ndof_per_node: int,
        dtype=jnp.float64,
    ):
        self.etype = get_element(etype)
        X_host = np.asarray(X, dtype=np.float64)
        conn_host = np.asarray(conn, dtype=np.int64)
        assert X_host.shape[1] == self.etype.ndims, (
            f"mesh is {X_host.shape[1]}D but element {self.etype.name} is "
            f"{self.etype.ndims}D"
        )
        assert conn_host.shape[1] == self.etype.nnodes

        self.dtype = jnp.dtype(dtype)
        self.ndof_per_node = int(ndof_per_node)
        self.nelems = int(conn_host.shape[0])
        self.nnodes = int(X_host.shape[0])
        self.ndims = int(X_host.shape[1])
        self.nnodes_per_elem = self.etype.nnodes
        self.nquads = self.etype.nquads
        self.ndof = self.nnodes * self.ndof_per_node

        # Host copies (mesh setup, io, direct path)
        self.X_host = X_host
        self.conn_host = conn_host
        self.conn_dof_host = assembly.make_conn_dof(conn_host, self.ndof_per_node)

        # Device arrays
        self.X = jnp.asarray(X_host, dtype=self.dtype)
        self.conn = jnp.asarray(conn_host.astype(np.int32))
        self.conn_dof = jnp.asarray(self.conn_dof_host)

        # Element tables on device (real dtype)
        self.N = jnp.asarray(self.etype.shape_vals, dtype=self.dtype)
        self.dN = jnp.asarray(self.etype.shape_grads, dtype=self.dtype)
        self.wq = jnp.asarray(self.etype.quad_wts, dtype=self.dtype)

        # Element nodal coordinates (gathered once; X is static)
        self.Xe = geometry.gather_to_elements(self.X, self.conn)

        # Constrain dofs of unreferenced grid nodes (e.g. brick20 meshes
        # skip super-cell centers, pyfem.py:683) so systems stay regular.
        used = np.zeros(self.nnodes, dtype=bool)
        used[conn_host.ravel()] = True
        unused = np.where(~used)[0]
        dof_fixed = np.asarray(dof_fixed, dtype=np.int64).ravel()
        if unused.size:
            extra = (
                self.ndof_per_node * unused[:, None]
                + np.arange(self.ndof_per_node)
            ).ravel()
            dof_fixed = np.concatenate([dof_fixed, extra])
            if dof_fixed_vals is not None:
                dof_fixed_vals = np.concatenate(
                    [np.asarray(dof_fixed_vals, dtype=float), np.zeros(extra.size)]
                )
        self.bc = DirichletBC(dof_fixed, dof_fixed_vals, self.ndof)

        self._pattern = None

    # -- pattern / global matrix (lazy; host) -----------------------------

    @property
    def pattern(self) -> assembly.SparsityPattern:
        if self._pattern is None:
            self._pattern = assembly.SparsityPattern(self.conn_dof_host, self.ndof)
        return self._pattern

    def assemble_scipy(self, Ke, apply_bcs=False, enforce_symmetric_K=True, rhs=None):
        """Assemble element matrices into a host scipy CSR matrix."""
        values = assembly.assemble_values(jnp.asarray(Ke), self.pattern)
        K = assembly.scipy_csr(values, self.pattern)
        if not apply_bcs:
            return K
        if rhs is None:
            rhs = np.zeros(self.ndof)
        return self.bc.apply_scipy(K, np.asarray(rhs), enforce_symmetric_K)

    # -- operator helpers --------------------------------------------------

    def matvec(self, Ke, u):
        """Unconstrained matrix-free SpMV."""
        return assembly.elem_matvec(Ke, self.conn_dof, u, self.ndof)

    def diagonal(self, Ke):
        return assembly.elem_diagonal(Ke, self.conn_dof, self.ndof)

    def attach_structured_grid(self, nnodes_x, nnodes_y, nnodes_z=None,
                               **gmg_options):
        """Enable the geometric-multigrid fast path (structured quad/hex).

        Builds a GMG hierarchy (multigrid.GMGAssembler[3D]) using this
        model's physics and Dirichlet mask; afterwards
        ``solve(method="gmg")`` / ``compliance(solver="gmg")`` run
        V-cycle-preconditioned CG entirely on device.
        """
        from ..multigrid import GMGAssembler, GMGAssembler3D

        nd = self.ndof_per_node
        X = self.X_host
        if nnodes_z is None:
            assert self.etype.name == "quad4", "2D gmg requires quad4 grids"
            nx, ny = int(nnodes_x), int(nnodes_y)
            assert nx * ny == self.nnodes
            # interleaved (node, comp) mask -> planar (comp, ny, nx)
            fine_mask = (
                np.asarray(self.bc.mask)
                .reshape(ny * nx, nd).T.reshape(nd, ny, nx)
            )
            physics = "elasticity" if nd == 2 else "poisson"
            kw = dict(p=self.p, dtype=self.dtype, fine_mask=fine_mask)
            if physics == "elasticity":
                kw.update(E=self.E, nu=self.nu)
            kw.update(gmg_options)
            self._gmg_asm = GMGAssembler(
                nx, ny, float(X[:, 0].max()), float(X[:, 1].max()),
                physics, **kw
            )
            self._gmg_shape = (ny, nx)
            return self
        assert self.etype.name == "hex8", "3D gmg requires hex8 grids"
        nx, ny, nz = int(nnodes_x), int(nnodes_y), int(nnodes_z)
        assert nx * ny * nz == self.nnodes
        # interleaved (node, comp) mask -> planar (comp, nz, ny, nx),
        # injection-coarsened inside the assembler (general dof_fixed
        # layouts, pyfem.py:639-657)
        fine_mask = (
            np.asarray(self.bc.mask)
            .reshape(nz * ny * nx, nd).T.reshape(nd, nz, ny, nx)
        )
        physics = "elasticity" if nd == 3 else "poisson"
        kw = dict(p=self.p, dtype=self.dtype, fine_mask=fine_mask)
        if physics == "elasticity":
            kw.update(E=self.E, nu=self.nu)
        kw.update(gmg_options)
        self._gmg_asm = GMGAssembler3D(
            nx, ny, nz, float(X[:, 0].max()), float(X[:, 1].max()),
            float(X[:, 2].max()), physics, **kw
        )
        self._gmg_shape = (nz, ny, nx)
        return self

    def _k_dv_sens_structured(self, rho, phi, psi):
        """Uniform-grid scatter-free d(phi^T K psi)/drho.

        Valid when ``attach_structured_grid`` has been called (the GMG
        assembler shares this model's physics and uniform geometry);
        dispatched from the models' ``k_dv_sens``.  Same contract as the
        generic einsum+segment_sum path but without the per-element
        gather/scatter (86.8 ms -> sub-ms at 1M dof — it dominated the
        fused topology-optimization iteration).
        """
        from ..ops.dia import interleave_to_planar

        nd = self.ndof_per_node
        shape = self._gmg_shape
        to_planes = lambda v: interleave_to_planar(
            jnp.asarray(v, self.dtype), nd
        ).reshape((nd,) + shape)
        out = self._gmg_asm.dv_sens(
            jnp.asarray(rho, self.dtype).reshape(shape),
            to_planes(phi), to_planes(psi),
        )
        return out.reshape(-1)

    def _use_structured_sens(self, rho, phi, psi):
        """True when the scatter-free uniform-grid sensitivity applies."""
        asm = getattr(self, "_gmg_asm", None)
        if asm is None or getattr(asm, "elem_path", None) != "uniform":
            return False
        # complex-step probes promote to complex: keep the reference
        # einsum path (the oracle) for those
        return not any(
            jnp.iscomplexobj(v) for v in (rho, phi, psi)
        )

    def attach_pmg(self, nnodes_x, nnodes_y, nnodes_z, **pmg_options):
        """Enable the p-multigrid fast path for structured quadratic
        meshes (tet10/brick20 node lattices from ProblemCreator).

        Matrix-free Chebyshev smoothing on the quadratic operator + a
        hex8 GMG V-cycle on the linear corner sub-grid (see pmg.py);
        afterwards ``solve(method="pmg")`` runs one compiled PCG
        program per solve.  This is the scale path the reference never
        had for its quadratic elements (its tests stop at 9^3 direct
        solves, test_elements.py).
        """
        from ..pmg import PMG

        self._pmg = PMG(self, nnodes_x, nnodes_y, nnodes_z, **pmg_options)
        return self

    def attach_sharded_grid(self, mesh, nnodes_x, nnodes_y, nnodes_z=None,
                            **gmg_options):
        """Enable the multi-device sharded GMG solve path (2D quad4 or
        3D hex8 structured grids).

        Shards the flagship GMG-PCG solver over ``mesh`` (node planes
        block-partitioned along the leading axis, halo exchange via
        ppermute — see parallel.sharded_gmg); afterwards
        ``solve(method="sharded_gmg")`` /
        ``compliance(solver="sharded_gmg")`` run the SPMD program.
        Nonzero Dirichlet values are applied through a rhs lift; pass
        ``pallas_smooth=True`` (with optional ``smoother_dtype``) to run
        the fused Pallas sweep kernels on the per-device blocks.
        """
        from ..parallel.sharded_gmg import ShardedGMG2D, ShardedGMG3D

        nd = self.ndof_per_node
        X = self.X_host
        if nnodes_z is None:
            assert self.etype.name == "quad4", (
                "2D sharded gmg requires quad4 grids"
            )
            nx, ny = int(nnodes_x), int(nnodes_y)
            assert nx * ny == self.nnodes
            fine_mask = (
                np.asarray(self.bc.mask)
                .reshape(ny * nx, nd).T.reshape(nd, ny, nx)
            )
            physics = "elasticity" if nd == 2 else "poisson"
            kw = dict(p=self.p, dtype=self.dtype, fine_mask=fine_mask)
            if physics == "elasticity":
                kw.update(E=self.E, nu=self.nu)
            kw.update(gmg_options)
            self._sgmg = ShardedGMG2D(
                mesh, nx, ny, float(X[:, 0].max()), float(X[:, 1].max()),
                physics, **kw
            )
            self._sgmg_shape = (ny, nx)
            return self
        assert self.etype.name == "hex8", "3D sharded gmg requires hex8"
        nx, ny, nz = int(nnodes_x), int(nnodes_y), int(nnodes_z)
        assert nx * ny * nz == self.nnodes
        fine_mask = (
            np.asarray(self.bc.mask)
            .reshape(nz * ny * nx, nd).T.reshape(nd, nz, ny, nx)
        )
        physics = "elasticity" if nd == 3 else "poisson"
        kw = dict(p=self.p, dtype=self.dtype, fine_mask=fine_mask)
        if physics == "elasticity":
            kw.update(E=self.E, nu=self.nu)
        kw.update(gmg_options)
        self._sgmg = ShardedGMG3D(
            mesh, nx, ny, nz, float(X[:, 0].max()), float(X[:, 1].max()),
            float(X[:, 2].max()), physics, **kw
        )
        self._sgmg_shape = (nz, ny, nx)
        return self

    def _solve_sharded_gmg(self, rho, rhs, rtol=1e-8, maxiter=400):
        from ..ops.dia import interleave_to_planar, planar_to_interleave

        nd = self.ndof_per_node
        shape = self._sgmg_shape
        b = interleave_to_planar(
            jnp.asarray(rhs, self.dtype), nd
        ).reshape((nd,) + shape)
        vals = None
        if bool(np.any(np.asarray(self.bc.values))):
            vals = interleave_to_planar(
                self.bc.values.astype(self.dtype), nd
            ).reshape((nd,) + shape)
        x, k, rn, b_out = self._sgmg.solve(
            self._as_nodal(rho), b, rtol=rtol, maxiter=maxiter,
            vals=vals, return_rhs=True,
        )
        _check_converged("sharded-gmg-pcg", rn,
                         rtol * float(jnp.linalg.norm(
                             jnp.where(jnp.asarray(
                                 self._sgmg.asm.static_levels[0][3]
                             ), 0.0, b_out)
                         )), k)
        return (planar_to_interleave(x.reshape(-1), nd),
                planar_to_interleave(b_out.reshape(-1), nd))

    def _solve_gmg(self, rho, rhs, rtol=1e-8, maxiter=400):
        # cached jits per model (eager multigrid ops pay a dispatch
        # round trip each — ruinous over a remote-tunneled device),
        # keyed on whether the BC data is nonzero *at this call*: the
        # rhs-lift branch is trace-time, so baking it in at first call
        # would silently skip the lift if bc.values changed later
        has_vals = bool(np.any(np.asarray(self.bc.values)))
        if getattr(self, "_gmg_jit_cache", None) is None:
            self._gmg_jit_cache = {}
        if self._gmg_jit_cache.get(has_vals) is None:
            from .. import multigrid
            from ..ops.dia import interleave_to_planar, planar_to_interleave

            shape = self._gmg_shape
            nd = self.ndof_per_node

            def step(rho_n, rhs_v, vals_v, rtol_v, maxiter):
                gmg, lv0 = self._gmg_asm.assemble(rho_n)
                rhs_g = interleave_to_planar(rhs_v, nd).reshape(
                    (nd,) + shape
                )
                vals_g = interleave_to_planar(vals_v, nd).reshape(
                    (nd,) + shape
                )
                if has_vals:
                    assert lv0.coeff is not None, (
                        "nonzero Dirichlet values need the XLA assembly "
                        "path (pallas_smooth packed levels are "
                        "eliminated-only)"
                    )
                    lift = lv0.op.matvec(
                        lv0.coeff, jnp.where(lv0.mask, vals_g, 0.0)
                    )
                    b = jnp.where(lv0.mask, vals_g, rhs_g - lift)
                else:
                    b = jnp.where(lv0.mask, vals_g, rhs_g)
                x0 = jnp.where(lv0.mask, vals_g, 0.0)
                x, k, rn = multigrid.pcg_gmg(
                    gmg, lv0, b, rtol=rtol_v, maxiter=maxiter, x0=x0,
                )
                u = planar_to_interleave(x.reshape(-1), nd)
                return (u, planar_to_interleave(b.reshape(-1), nd), k, rn,
                        jnp.linalg.norm(b))

            import jax

            self._gmg_jit_cache[has_vals] = jax.jit(
                step, static_argnames=("maxiter",)
            )
        u, b, k, rn, bnorm = self._gmg_jit_cache[has_vals](
            self._as_nodal(rho).astype(self.dtype),
            jnp.asarray(rhs, self.dtype),
            self.bc.values.astype(self.dtype),
            jnp.asarray(rtol, jnp.zeros((), self.dtype).real.dtype),
            int(maxiter),
        )
        _check_converged("gmg-pcg", rn, rtol * float(bnorm), k)
        return u, b

    def _solve_system(self, Ke, rhs, method="cg", rtol=1e-8, rho=None,
                      maxiter=None):
        """Apply BCs and solve K u = rhs.

        Returns:
            (u, b): solution and the BC-applied rhs (used by compliance).
        """
        assert method in ("direct", "cg", "gmres", "gmg", "sharded_gmg",
                          "amg", "pmg")
        if method == "pmg":
            assert getattr(self, "_pmg", None) is not None, (
                "call attach_pmg(nx, ny, nz) before method='pmg'"
            )
            x, b, k, rn = self._pmg.solve(
                rho=rho if rho is not None else 1.0, rhs=rhs, rtol=rtol,
                maxiter=maxiter or 400,
            )
            _check_converged("pmg-pcg", rn, rtol * jnp.linalg.norm(b), k)
            self.last_solve_stats = {
                "method": "pmg", "iters": int(k), "resnorm": float(rn),
            }
            return x, b
        if method == "gmg":
            assert getattr(self, "_gmg_asm", None) is not None, (
                "call attach_structured_grid(nx, ny) before method='gmg'"
            )
            return self._solve_gmg(rho if rho is not None else 1.0, rhs,
                                   rtol=rtol)
        if method == "sharded_gmg":
            assert getattr(self, "_sgmg", None) is not None, (
                "call attach_sharded_grid(mesh, nx, ny) before "
                "method='sharded_gmg'"
            )
            return self._solve_sharded_gmg(
                rho if rho is not None else 1.0, rhs, rtol=rtol
            )
        if method == "amg":
            # unstructured fast path: host smoothed-aggregation setup,
            # device DIA V-cycle PCG (pyamg's role, pyfem.py:2392-2400);
            # the structural setup + compiled program are cached on the
            # model — repeat solves (topology loops) pay only the value
            # update
            from .. import unstructured

            if getattr(self, "_amg_cache", None) is None:
                self._amg_cache = {}
            K = self.assemble_scipy(Ke)
            K, b_np = self.bc.apply_scipy(K, np.asarray(rhs))
            x, k, rn = unstructured.amg_pcg(
                K, jnp.asarray(b_np, self.dtype), nd=self.ndof_per_node,
                coords=self.X_host, rtol=rtol,
                maxiter=maxiter or 10 * self.ndof,
                cache=self._amg_cache,
                # per-model AMG tuning (e.g. 3D quadratic meshes need a
                # larger DIA offset budget: set model.amg_options =
                # {"max_offsets": 4096})
                **getattr(self, "amg_options", {}),
            )
            _check_converged("amg-pcg", rn,
                             rtol * np.linalg.norm(b_np), k)
            self.last_solve_stats = {
                "method": "amg", "iters": int(k), "resnorm": float(rn),
            }
            return x, jnp.asarray(b_np, self.dtype)
        if method == "direct":
            K = self.assemble_scipy(Ke)
            K, b = self.bc.apply_scipy(K, np.asarray(rhs))
            from .. import solvers

            return jnp.asarray(solvers.direct_solve(K, b)), jnp.asarray(b)
        from .. import solvers

        b = self.bc.constrain_rhs(rhs, lambda v: self.matvec(Ke, v))
        data = (Ke, self.conn_dof, self.bc.mask)
        diag = self.diagonal(Ke)
        # unit entries at fixed dofs; guard unreferenced dofs (zero rows)
        inv_diag = 1.0 / jnp.where(self.bc.mask | (diag == 0), 1.0, diag)
        if method == "cg":
            res = solvers.cg(
                assembly.bc_elem_matvec, data, b, inv_diag=inv_diag,
                rtol=rtol, maxiter=maxiter,
            )
        else:
            res = solvers.gmres(
                assembly.bc_elem_matvec, data, b, inv_diag=inv_diag,
                rtol=rtol, maxiter=maxiter,
            )
        _check_converged(
            method, res.resnorm, rtol * jnp.linalg.norm(b), res.iters
        )
        # observable convergence info (Newton logs these per step)
        self.last_solve_stats = {
            "method": method,
            "iters": int(res.iters),
            "resnorm": float(res.resnorm),
        }
        return res.x, b

    def _as_nodal(self, rho):
        """Broadcast scalar density to a nodal field (pyfem.py:1015-1016)."""
        if rho is None:
            rho = 1.0
        if np.ndim(rho) == 0:
            rho = jnp.full((self.nnodes,), rho, dtype=self.dtype)
        return jnp.asarray(rho)
