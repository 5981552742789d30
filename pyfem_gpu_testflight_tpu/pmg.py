"""Two-level p-multigrid for structured quadratic meshes (tet10/brick20).

The reference has no solver path that scales its quadratic elements —
its tests push 9^3 meshes through direct solves (test_elements.py) and
the SciTech study measures assembly only (performance_test.py:21-143).
On TPU the natural design is matrix-free: the quadratic operator is
applied element-wise (gather -> batched Ke matvec on the MXU ->
deterministic segment_sum), smoothed by Chebyshev polynomials in
D^-1 A, and corrected on the linear corner sub-grid, where the existing
geometric multigrid (multigrid.py) does the heavy lifting.

Why this works: the corner lattice of a ProblemCreator tet10/brick20
mesh (mesh.py:121-157, nodes at even (i, j, k)) IS a 2:1 coarsening of
the full node lattice, so the quadratic->linear transfer is exactly the
tent prolongation/restriction pair (multigrid.prolong3d_il /
restrict3d_il), and the coarse preconditioner can be a hex8 GMG
hierarchy on the corner grid — spectrally equivalent to the
tet10/brick20 operators discretizing the same physics on the same
nodes.  One outer preconditioner application is:

    pre-smooth (Chebyshev-nu, matrix-free quadratic operator)
    -> residual -> restrict to corners -> one GMG V-cycle -> prolong
    -> post-smooth

driving a flexible PCG on the BC-eliminated matrix-free operator.

brick20 lattices leave nodes with >= 2 odd coordinates unused
(mesh.py _BRICK20_OFFSETS has edge midpoints only); their zero rows are
masked like Dirichlet dofs throughout.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import assembly


class PMG:
    """p-multigrid preconditioned CG for a structured quadratic model.

    Args:
        model: ``LinearElasticity``/``LinearPoisson`` on a
            ``ProblemCreator`` tet10 or brick20 grid (zero Dirichlet
            values only).
        nnodes_x/y/z: node-lattice extents (odd, ``nx*ny*nz == nnodes``).
        nu: Chebyshev smoothing degree per pre/post leg.
        cheb_lam: spectral bound of D^-1 A; measured by one jitted
            power iteration at attach when None.
        cheb_frac: smoothing interval is [cheb_lam/cheb_frac, cheb_lam].
        gmg_options: forwarded to the corner-grid ``GMGAssembler3D``
            (e.g. pallas_smooth, smoother_dtype, omega).
    """

    def __init__(self, model, nnodes_x, nnodes_y, nnodes_z, nu=3,
                 cheb_lam=None, cheb_frac=30.0, gmg_options=None):
        from .multigrid import GMGAssembler3D

        nx, ny, nz = int(nnodes_x), int(nnodes_y), int(nnodes_z)
        assert model.etype.name in ("tet10", "brick20"), model.etype.name
        assert nx * ny * nz == model.nnodes, (nx * ny * nz, model.nnodes)
        assert nx % 2 and ny % 2 and nz % 2, "corner lattice needs odd n"
        assert not np.any(np.asarray(model.bc.values)), (
            "pmg supports zero Dirichlet values only"
        )
        self.model = model
        self.nd = model.ndof_per_node
        self.shape = (nz, ny, nx)
        self.cshape = ((nz + 1) // 2, (ny + 1) // 2, (nx + 1) // 2)
        self.nu = int(nu)
        self.cheb_frac = float(cheb_frac)
        self._cheb_lam = cheb_lam
        self._jit_cache = {}

        # dead lattice dofs (brick20: nodes with >= 2 odd coords are
        # unreferenced) fold into the Dirichlet mask
        conn_nodes = np.unique(np.asarray(model.conn))
        used = np.zeros(model.nnodes, bool)
        used[conn_nodes] = True
        dead = np.repeat(~used, self.nd)
        self.mask_all = jnp.asarray(np.asarray(model.bc.mask) | dead)

        nd = self.nd
        mask_q = (
            np.asarray(self.mask_all)
            .reshape(nz * ny * nx, nd).T.reshape(nd, nz, ny, nx)
        )
        corner_mask = mask_q[:, ::2, ::2, ::2]
        physics = "elasticity" if nd == 3 else "poisson"
        kw = dict(p=model.p, dtype=model.dtype, fine_mask=corner_mask)
        if physics == "elasticity":
            kw.update(E=model.E, nu=model.nu)
        kw.update(gmg_options or {})
        X = model.X_host
        self.asm = GMGAssembler3D(
            *self.cshape[::-1], float(X[:, 0].max()),
            float(X[:, 1].max()), float(X[:, 2].max()), physics, **kw
        )
        # scatter-free lattice matvec when conn matches the creator
        # stride-2 pattern (None -> generic gather/segment_sum path)
        self._lat_off = self._lattice_offsets()

    # -- operator pieces (traced) -----------------------------------------

    def _lattice_offsets(self):
        """(ncls, nnpe, 3) static lattice offsets when the model's conn
        IS the ProblemCreator stride-2 lattice pattern, else None.

        On that pattern the per-element gather/scatter of
        ``assembly.elem_matvec`` (TPU-hostile: measured ~30-60 ms per
        apply at 0.8M lattice dof, and the Chebyshev + residual legs
        apply the operator ~8x per PCG iteration) collapses into
        static stride-2 slices around one MXU-batched ``Ke @ ue``.
        """
        from . import mesh as meshmod

        et = self.model.etype.name
        off = (
            meshmod._BRICK20_OFFSETS[None]
            if et == "brick20"
            else meshmod._tet10_offsets()
        )
        nz, ny, nx = self.shape
        scz, scy, scx = (nz - 1) // 2, (ny - 1) // 2, (nx - 1) // 2
        k0, j0, i0 = np.meshgrid(
            2 * np.arange(scz), 2 * np.arange(scy), 2 * np.arange(scx),
            indexing="ij",
        )
        base = np.stack([i0.ravel(), j0.ravel(), k0.ravel()], axis=-1)
        if et == "brick20":
            pos = base[:, None, :] + off[0][None, :, :]
            ids = (pos[..., 0] + pos[..., 1] * nx
                   + pos[..., 2] * nx * ny).reshape(-1, off.shape[1])
        else:
            pos = base[:, None, None, :] + off[None, :, :, :]
            ids = (pos[..., 0] + pos[..., 1] * nx
                   + pos[..., 2] * nx * ny).reshape(-1, off.shape[1])
        if not np.array_equal(np.asarray(self.model.conn_host), ids):
            return None
        return np.asarray(off)

    def _lattice_matvec(self, Ke, v):
        """Scatter-free element matvec on the structured lattice.

        Gathers/scatters go through a PARITY SPLIT of the node grid
        (reshape-based even/odd deinterleave per axis — the same trick
        as multigrid's interleave transfers): a local-node offset
        o in {0,1,2}^3 becomes a CONTIGUOUS slice of the parity block
        (o mod 2) at base (o div 2).  Direct stride-2 slices instead
        measured 33 ms/apply on v5e — lane-strided reads/writes cost as
        much as the gather/segment_sum path they replace (30.8 ms);
        the MXU-batched ``Ke @ ue`` itself is 1.5 ms.
        """
        from .multigrid import _deinterleave2, _interleave2
        from .ops.dia import interleave_to_planar, planar_to_interleave
        from .ops.precision import einsum

        nd = self.nd
        nz, ny, nx = self.shape
        scz, scy, scx = (nz - 1) // 2, (ny - 1) // 2, (nx - 1) // 2
        S = scz * scy * scx
        off = self._lat_off
        ncls, nnpe, _ = off.shape
        up = interleave_to_planar(v, nd).reshape(nd, nz, ny, nx)
        # blocks[pz][py][px]: (nd, (nz+1)//2, (ny+1)//2, (nx+1)//2),
        # odd-parity blocks zero-padded at the top end
        bz = _deinterleave2(up, 1)
        blocks = [
            [_deinterleave2(byy, 3) for byy in _deinterleave2(bzz, 2)]
            for bzz in bz
        ]
        Kec = Ke.reshape(S, ncls, nnpe * nd, nnpe * nd)
        acc = [[[jnp.zeros_like(blocks[0][0][0]) for _ in range(2)]
                for _ in range(2)] for _ in range(2)]
        for t in range(ncls):
            cols = []
            for n in range(nnpe):
                ox, oy, oz = (int(w) for w in off[t, n])
                blk = blocks[oz % 2][oy % 2][ox % 2]
                sl = blk[:, oz // 2 : oz // 2 + scz,
                         oy // 2 : oy // 2 + scy,
                         ox // 2 : ox // 2 + scx]
                cols.append(sl.reshape(nd, S).T)
            ue = jnp.stack(cols, axis=1).reshape(S, nnpe * nd)
            ye = einsum("sjk,sk->sj", Kec[:, t], ue)
            for n in range(nnpe):
                ox, oy, oz = (int(w) for w in off[t, n])
                blk = ye[:, n * nd : (n + 1) * nd].T.reshape(
                    nd, scz, scy, scx
                )
                acc[oz % 2][oy % 2][ox % 2] = (
                    acc[oz % 2][oy % 2][ox % 2]
                    .at[:, oz // 2 : oz // 2 + scz,
                        oy // 2 : oy // 2 + scy,
                        ox // 2 : ox // 2 + scx].add(blk)
                )
        rows = [
            [_interleave2(a0, a1, 3, nx) for a0, a1 in accy]
            for accy in acc
        ]
        planes = [_interleave2(r0, r1, 2, ny) for r0, r1 in rows]
        y = _interleave2(planes[0], planes[1], 1, nz)
        return planar_to_interleave(y.reshape(-1), nd)

    def _afree(self, Ke, v):
        """Free-dof operator: rows/cols of masked dofs dropped."""
        vz = jnp.where(self.mask_all, 0.0, v)
        if self._lat_off is not None:
            y = self._lattice_matvec(Ke, vz)
        else:
            y = assembly.elem_matvec(Ke, self.model.conn_dof, vz,
                                     self.model.ndof)
        return jnp.where(self.mask_all, 0.0, y)

    def _inv_diag(self, Ke):
        diag = assembly.elem_diagonal(Ke, self.model.conn_dof,
                                      self.model.ndof)
        return 1.0 / jnp.where(self.mask_all | (diag == 0), 1.0, diag)

    def _power_lam(self, Ke, inv_diag, iters=20):
        """lam_max(D^-1 A) by power iteration (traced, one program)."""
        v0 = jnp.where(
            self.mask_all, 0.0,
            jnp.sin(1.7 * jnp.arange(self.model.ndof, dtype=Ke.dtype))
            + 1.1,
        )

        def body(_, v):
            w = inv_diag * self._afree(Ke, v)
            return w / jnp.linalg.norm(w)

        v = jax.lax.fori_loop(0, iters, body, v0 / jnp.linalg.norm(v0))
        w = inv_diag * self._afree(Ke, v)
        return jnp.vdot(v, w).real / jnp.vdot(v, v).real

    def _cheb(self, Ke, inv_diag, lam, z, r, degree):
        """Chebyshev smoothing for A z ~= r from initial z."""
        hi = 1.1 * lam
        lo = lam / self.cheb_frac
        theta = 0.5 * (hi + lo)
        delta = 0.5 * (hi - lo)
        sigma = theta / delta

        def resid(z):
            return inv_diag * jnp.where(
                self.mask_all, 0.0, r - self._afree(Ke, z)
            )

        d = resid(z) / theta
        z = z + d
        rho_old = 1.0 / sigma
        for _ in range(int(degree) - 1):
            rho = 1.0 / (2.0 * sigma - rho_old)
            d = rho * rho_old * d + (2.0 * rho / delta) * resid(z)
            z = z + d
            rho_old = rho
        return z

    # -- solve --------------------------------------------------------------

    def _step(self, rho_n, rhs_v, lam, rtol, maxiter):
        """One jitted PCG solve (traced; rho_n nodal, rhs_v interleaved)."""
        from . import multigrid
        from .ops.dia import interleave_to_planar, planar_to_interleave

        model, nd = self.model, self.nd
        nz, ny, nx = self.shape
        Ke = model.element_jacobian(rho_n)
        inv_diag = self._inv_diag(Ke)
        mask = self.mask_all
        b = jnp.where(mask, 0.0, rhs_v)

        rho_c = rho_n.reshape(self.shape)[::2, ::2, ::2].reshape(-1)
        gmg, clv0 = self.asm.assemble(rho_c.astype(model.dtype))

        def precond(r):
            z = self._cheb(Ke, inv_diag, lam, jnp.zeros_like(r), r,
                           self.nu)
            rr = jnp.where(mask, 0.0, r - self._afree(Ke, z))
            rg = interleave_to_planar(rr, nd).reshape((nd,) + self.shape)
            bc = multigrid.restrict3d_il(rg, self.cshape)
            bc = jnp.where(clv0.mask, 0.0, bc)
            zc = gmg.apply(bc)
            corr = multigrid.prolong3d_il(zc, self.shape)
            corr_v = planar_to_interleave(corr.reshape(-1), nd)
            z = z + jnp.where(mask, 0.0, corr_v)
            return self._cheb(Ke, inv_diag, lam, z, r, self.nu)

        matvec = partial(self._afree, Ke)
        x, k, rn = multigrid.pcg(matvec, precond, b, rtol=rtol,
                                 maxiter=maxiter, flexible=True)
        return x, k, rn, b

    def solve(self, rho=None, rhs=None, rtol=1e-8, maxiter=400):
        """(u, b, iters, resnorm) for K(rho) u = rhs with zero-Dirichlet
        elimination; one compiled program per (dtype, shape) signature."""
        model = self.model
        rho_n = model._as_nodal(1.0 if rho is None else rho)
        if rhs is None:
            rhs = model.compute_rhs()
        rhs = jnp.asarray(rhs, model.dtype)

        if self._cheb_lam is None:
            lam_fn = self._jit_cache.get("lam")
            if lam_fn is None:
                lam_fn = jax.jit(
                    lambda r: self._power_lam(
                        model.element_jacobian(r),
                        self._inv_diag(model.element_jacobian(r)),
                    )
                )
                self._jit_cache["lam"] = lam_fn
            self._cheb_lam = float(lam_fn(rho_n))
        lam = self._cheb_lam

        step = self._jit_cache.get("step")
        if step is None:
            step = jax.jit(self._step, static_argnames=("maxiter",))
            self._jit_cache["step"] = step
        x, k, rn, b = step(rho_n, rhs, jnp.asarray(lam, model.dtype),
                           jnp.asarray(rtol, model.dtype), maxiter)
        return x, b, k, rn
