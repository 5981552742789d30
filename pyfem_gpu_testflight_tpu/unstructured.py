"""Accelerated solves on unstructured (.inp) meshes.

The reference's pyamg smoothed-aggregation preconditioner works on any
mesh (pyfem.py:2392-2400); round 1 gave unstructured meshes only the
host direct solver or plain Jacobi-CG on the ~3 GB/s gather/scatter
SpMV.  This module closes the gap TPU-style:

* **RCM band reordering** (scipy reverse_cuthill_mckee on the node
  graph, expanded to dofs so components stay interleaved) makes every
  level's operator banded, so it fits the DIA form (ops.dia) — SpMV as
  shifted contiguous multiply-adds at HBM bandwidth instead of scalar
  gathers;
* **smoothed aggregation** (Vanek/Mandel/Brezina): greedy node
  aggregation, tentative prolongator from a per-aggregate QR of the
  near-nullspace (rigid-body modes — translations + rotations — when
  node coordinates are given), prolongator smoothing
  P = (I - (4/3 / lambda_max) D^-1 A) T.  Hierarchy setup runs on host
  scipy/numpy once per matrix — the same role/cost slot as the
  reference's per-solve pyamg setup;
* the **V-cycle runs on device**: DIA matvecs, damped-Jacobi smoothing,
  T as one gather + small dense contraction per level, T^T as one
  segment_sum, dense Cholesky at the coarsest level;
* **AMG-preconditioned CG** as one jitted program.

P is never applied as a general SpMV on device: P x = t - w D^-1 (A t)
with t = T x reuses the level's DIA matvec (and P^T r symmetrically).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .ops.dia import DiaOperator

__all__ = ["AMGPreconditioner", "amg_pcg", "rcm_permutation", "csr_to_dia",
           "rigid_body_modes"]


def rcm_permutation(A_csr):
    """Reverse Cuthill-McKee ordering of a symmetric sparsity graph."""
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    return np.asarray(reverse_cuthill_mckee(A_csr, symmetric_mode=True))


def csr_to_dia(A_csr, dtype, max_offsets=2048, offsets=None):
    """(DiaOperator, values (noffs, n), offsets) from a host CSR matrix.

    Pass ``offsets`` from a previous call to reuse the (sparsity-
    determined) diagonal pattern — the values of a same-pattern matrix
    are then mapped without re-deriving the offsets.
    """
    A = A_csr.tocoo()
    n = A.shape[0]
    offs = A.col - A.row
    if offsets is None:
        offsets = np.unique(offs)
    else:
        offsets = np.asarray(offsets)
        assert np.isin(offs, offsets).all(), (
            "matrix pattern changed: new diagonals not in the cached "
            "offset set"
        )
    if offsets.size > max_offsets:
        raise ValueError(
            f"matrix has {offsets.size} diagonals (> {max_offsets}); "
            "reorder (RCM) first or raise max_offsets"
        )
    op = DiaOperator.from_offsets(offsets, n, max_offsets=max_offsets)
    vals = np.zeros((offsets.size, n), dtype=np.dtype(dtype))
    off_idx = np.searchsorted(offsets, offs)
    np.add.at(vals, (off_idx, A.row), A.data)
    return op, jnp.asarray(vals), offsets


def rigid_body_modes(coords, nd):
    """Near-nullspace basis B (ndof, m): translations + rotations.

    2D (nd=2): [e_x, e_y, (-y, x)] -> m=3; 3D (nd=3): 3 translations +
    3 rotations -> m=6; scalar problems: the constant -> m=1.
    """
    coords = np.asarray(coords, dtype=np.float64)
    n = coords.shape[0]
    if nd == 1:
        return np.ones((n, 1))
    c = coords - coords.mean(axis=0)
    if nd == 2:
        B = np.zeros((n, 2, 3))
        B[:, 0, 0] = 1.0
        B[:, 1, 1] = 1.0
        B[:, 0, 2] = -c[:, 1]
        B[:, 1, 2] = c[:, 0]
        return B.reshape(2 * n, 3)
    B = np.zeros((n, 3, 6))
    for k in range(3):
        B[:, k, k] = 1.0
    B[:, 0, 3], B[:, 1, 3] = -c[:, 1], c[:, 0]   # rot z
    B[:, 1, 4], B[:, 2, 4] = -c[:, 2], c[:, 1]   # rot x
    B[:, 0, 5], B[:, 2, 5] = c[:, 2], -c[:, 0]   # rot y
    return B.reshape(3 * n, 6)


def _greedy_aggregate(A_csr):
    """Greedy BFS aggregation on the matrix graph -> agg id per node.

    Uses the native C++ pass (native/fastsetup.cpp) when available —
    the Python loop is O(n) but slow on a throttled host core at
    100k+ nodes; results are identical.
    """
    n = A_csr.shape[0]
    indptr, indices = A_csr.indptr, A_csr.indices
    from .native import greedy_aggregate

    native = greedy_aggregate(indptr, indices, n)
    if native is not None:
        return native
    agg = np.full(n, -1, dtype=np.int64)
    next_id = 0
    for i in range(n):  # pass 1: roots with unaggregated neighborhoods
        if agg[i] >= 0:
            continue
        nbrs = indices[indptr[i]:indptr[i + 1]]
        if (agg[nbrs] >= 0).any():
            continue
        agg[i] = next_id
        agg[nbrs] = next_id
        next_id += 1
    for i in range(n):  # pass 2: attach leftovers
        if agg[i] >= 0:
            continue
        nbrs = indices[indptr[i]:indptr[i + 1]]
        done = nbrs[agg[nbrs] >= 0]
        if done.size:
            agg[i] = agg[done[0]]
        else:
            agg[i] = next_id
            next_id += 1
    return agg, next_id


def _tentative(agg_node, nd, B, n):
    """Per-aggregate QR tentative prolongator.

    Args:
        agg_node: (nnodes,) aggregate id per node.
        nd: dofs per node; B: (n, m) near-nullspace on the dofs.

    Returns:
        (J_dof, Tv, B_c): J_dof (n,) aggregate id per dof, Tv (n, m)
        row coefficients (T[i, J_dof[i]*m + c] = Tv[i, c]), and the
        coarse nullspace B_c (n_agg*m, m).
    """
    m = B.shape[1]
    n_agg = int(agg_node.max()) + 1
    J_dof = np.repeat(agg_node, nd)
    Tv = np.zeros((n, m))
    B_c = np.zeros((n_agg * m, m))
    order = np.argsort(J_dof, kind="stable")
    bounds = np.searchsorted(J_dof[order], np.arange(n_agg + 1))
    for J in range(n_agg):
        rows = order[bounds[J]:bounds[J + 1]]
        Q, R = np.linalg.qr(B[rows])  # (k, kk), (kk, m) reduced
        kk = Q.shape[1]
        # rank-deficient aggregates (e.g. BC-isolated single nodes with
        # fewer dofs than modes): unused coarse dofs get zero T columns
        # and are regularized to identity in the Galerkin product
        Tv[rows, :kk] = Q
        B_c[J * m:J * m + kk] = R
    return J_dof, Tv, B_c


class AMGPreconditioner:
    """Smoothed-aggregation AMG V-cycle: host setup + device apply.

    Args:
        K_csr: BC-applied symmetric host CSR matrix.
        nd: dofs per node of the *fine* problem (components stay
            interleaved through RCM and aggregation).
        coords: optional (nnodes, dim) node coordinates — enables
            rigid-body-mode tentative prolongators (recommended for
            elasticity; scalar problems use the constant).
        dtype: device dtype of the cycle (f32 preconditioning works
            under a f64 outer CG).
        nu: damped-Jacobi smoothing sweeps (pre and post).
        coarse_n: stop coarsening below this size (dense Cholesky).
        structure: a previous instance's ``.structure`` — reuses every
            rho-independent piece of the setup (RCM permutations,
            aggregations, tentative-prolongator QRs, DIA offset
            patterns); only the value-dependent work (Galerkin
            products, smoothing weights, coarse factor) reruns.  In a
            topology loop the sparsity pattern and geometry are fixed,
            so this drops the per-iteration host setup to O(nnz) numpy.
    """

    #: fresh structural setups performed (test/diagnostic observability)
    n_structure_setups = 0

    def __init__(self, K_csr, nd=1, coords=None, dtype=jnp.float32, nu=2,
                 coarse_n=800, max_levels=12, max_offsets=2048,
                 smoother="chebyshev", cheb_degree=3, structure=None):
        from scipy import sparse

        self.dtype = jnp.dtype(dtype)
        self.nu = int(nu)
        self.smoother = smoother
        self.cheb_degree = int(cheb_degree)
        self.w_sm = []
        self.w_jac = []
        self.lam = []  # per-level rho(D^-1 A) estimate
        fresh = structure is None
        if fresh:
            structure = {"levels": []}
            AMGPreconditioner.n_structure_setups += 1
        self.structure = structure

        def slevel(li):
            if fresh:
                structure["levels"].append({})
            return structure["levels"][li]

        def node_graph(A, nd):
            if nd == 1:
                return A.tocsr()
            C = A.tocoo()
            return sparse.csr_matrix(
                (np.ones(C.nnz), (C.row // nd, C.col // nd)),
                shape=(A.shape[0] // nd,) * 2,
            )

        def expand_perm(perm_node, nd):
            return (nd * perm_node[:, None] + np.arange(nd)).ravel()

        def lam_max(A, inv_diag, iters=12):
            rng = np.random.RandomState(0)
            v = rng.rand(A.shape[0])
            lam = 2.0
            for _ in range(iters):
                v = inv_diag * (A @ v)
                nv = np.linalg.norm(v)
                if nv == 0:
                    break
                lam, v = nv, v / nv
            return max(lam, 1e-12)

        A = K_csr.tocsr()
        if fresh:
            if coords is not None:
                B = rigid_body_modes(coords, nd)
            else:
                B = np.tile(np.eye(nd), (A.shape[0] // nd, 1))
            perm0 = expand_perm(rcm_permutation(node_graph(A, nd)), nd)
            structure["perm0"] = perm0
            structure["B0"] = B
        else:
            perm0 = structure["perm0"]
            B = structure["B0"]
        A = A[perm0][:, perm0].tocsr()
        B = B[perm0]
        self.perm = jnp.asarray(perm0.astype(np.int32))
        iperm0 = np.empty_like(perm0)
        iperm0[perm0] = np.arange(perm0.size)
        self.iperm = jnp.asarray(iperm0.astype(np.int32))

        levels = []
        while True:
            n = A.shape[0]
            sl = slevel(len(levels))
            op, vals, offs = csr_to_dia(
                A, self.dtype, max_offsets, offsets=sl.get("offsets")
            )
            sl["offsets"] = offs
            diag = np.asarray(A.diagonal())
            inv_diag = 1.0 / np.where(diag == 0, 1.0, diag)
            lam = lam_max(A, inv_diag)
            self.lam.append(float(lam))
            self.w_sm.append(float((4.0 / 3.0) / lam))
            self.w_jac.append(float((4.0 / 3.0) / lam))
            level = {
                "op": op, "vals": vals, "n": n,
                "inv_diag": jnp.asarray(inv_diag.astype(self.dtype)),
            }
            if n <= coarse_n or len(levels) >= max_levels - 1:
                level["dense"] = jnp.asarray(A.toarray().astype(self.dtype))
                levels.append(level)
                break
            m = B.shape[1]
            if fresh:
                sl["agg"] = _greedy_aggregate(node_graph(A, nd))
            agg_node, n_agg = sl["agg"]
            nc = n_agg * m
            if nc >= n:
                level["dense"] = (
                    jnp.asarray(A.toarray().astype(self.dtype))
                    if n <= 4096 else None
                )
                levels.append(level)
                break
            if fresh:
                J_dof, Tv, B_c = _tentative(agg_node, nd, B, n)
                T = sparse.csr_matrix(
                    (
                        Tv.ravel(),
                        (
                            np.repeat(np.arange(n), m),
                            (m * J_dof[:, None] + np.arange(m)).ravel(),
                        ),
                    ),
                    shape=(n, nc),
                )
                sl["tent"] = (J_dof, Tv, B_c, T)
            J_dof, Tv, B_c, T = sl["tent"]
            D_inv = sparse.diags(inv_diag)
            P = (T - self.w_sm[-1] * (D_inv @ (A @ T))).tocsr()
            Ac = (P.T @ A @ P).tolil()
            dz = np.where(np.asarray(Ac.diagonal()) == 0.0)[0]
            if dz.size:  # decoupled coarse dofs from zero T columns
                Ac[dz, dz] = 1.0
            Ac = Ac.tocsr()
            # re-band the coarse level (aggregates = coarse "nodes" with
            # m dofs each); compose the permutation into the maps
            if fresh:
                sl["permc"] = expand_perm(
                    rcm_permutation(node_graph(Ac, m)), m
                )
            permc = sl["permc"]
            agg_perm = np.empty(n_agg, dtype=np.int64)
            agg_perm[permc[::m] // m] = np.arange(n_agg)
            level["J_dof"] = jnp.asarray(agg_perm[J_dof].astype(np.int32))
            level["Tv"] = jnp.asarray(Tv.astype(self.dtype))
            level["n_agg"], level["m"] = n_agg, m
            levels.append(level)
            A = Ac[permc][:, permc].tocsr()
            B = B_c[permc]
            nd = m  # coarse levels have m dofs per aggregate

        self.levels = levels

    # -- traced pieces ------------------------------------------------------

    def _params(self):
        """Device arrays threaded as jit arguments (never constants).

        The spectral estimates (lam, w_sm, w_jac) ride along as traced
        scalars so a value-only rebuild (topology loop) reuses the
        compiled program instead of retracing per iteration.
        """
        return tuple(
            (lv["vals"], lv["inv_diag"], lv.get("J_dof"), lv.get("Tv"),
             lv.get("dense"),
             jnp.asarray(self.lam[k], self.dtype),
             jnp.asarray(self.w_sm[k], self.dtype),
             jnp.asarray(self.w_jac[k], self.dtype))
            for k, lv in enumerate(self.levels)
        )

    def apply(self, params, r):
        """V-cycle z = M^-1 r (traced; r in level-0 RCM ordering)."""
        return self._cycle(params, 0, r)

    def _matvec(self, params, k, u):
        return self.levels[k]["op"].matvec(params[k][0], u)

    def _smooth(self, params, k, x, b, niter, x0_zero=False):
        if self.smoother == "chebyshev":
            return self._cheb_smooth(params, k, x, b)
        inv_diag = params[k][1]
        w = params[k][7]

        if x0_zero and niter > 0:
            # first sweep from x = 0 is pure elementwise (skips one
            # full read of the operator)
            x = w * inv_diag * b
            niter -= 1

        def body(_, x):
            return x + w * inv_diag * (b - self._matvec(params, k, x))

        return jax.lax.fori_loop(0, niter, body, x)

    def _cheb_smooth(self, params, k, x, b):
        """Chebyshev polynomial smoothing on D^-1 A (pyamg convention:
        target interval [rho/30, 1.1 rho]); one matvec per degree —
        much stronger high-frequency damping than Jacobi per matvec."""
        inv_diag = params[k][1]
        hi = 1.1 * params[k][5]
        lo = params[k][5] / 30.0
        theta = 0.5 * (hi + lo)
        delta = 0.5 * (hi - lo)
        sigma = theta / delta
        r = inv_diag * (b - self._matvec(params, k, x))
        d = r / theta
        x = x + d
        rho_old = 1.0 / sigma
        for _ in range(self.cheb_degree - 1):
            r = inv_diag * (b - self._matvec(params, k, x))
            rho = 1.0 / (2.0 * sigma - rho_old)
            d = rho * rho_old * d + (2.0 * rho / delta) * r
            x = x + d
            rho_old = rho
        return x

    def _T(self, params, k, xc):
        """Tentative prolongation: one gather + a row-wise contraction."""
        lv = self.levels[k]
        Xc = xc.reshape(lv["n_agg"], lv["m"])
        return jnp.sum(params[k][3] * jnp.take(Xc, params[k][2], axis=0),
                       axis=1)

    def _TT(self, params, k, s):
        lv = self.levels[k]
        contrib = params[k][3] * s[:, None]
        out = jax.ops.segment_sum(contrib, params[k][2],
                                  num_segments=lv["n_agg"])
        return out.reshape(-1)

    def _P(self, params, k, xc):
        """Smoothed prolongation: (I - w D^-1 A) T xc."""
        t = self._T(params, k, xc)
        return t - params[k][6] * (params[k][1] * self._matvec(params, k, t))

    def _PT(self, params, k, r):
        """P^T r = T^T (r - w A D^-1 r)."""
        s = r - params[k][6] * self._matvec(params, k, params[k][1] * r)
        return self._TT(params, k, s)

    def _cycle(self, params, k, b):
        if k == len(self.levels) - 1:
            dense = params[k][4]
            if dense is None:
                # smooth-to-death fallback: damped Jacobi, many sweeps
                inv_diag = params[k][1]
                w = params[k][7]
                return jax.lax.fori_loop(
                    0, 24,
                    lambda _, x: x + w * inv_diag * (
                        b - self._matvec(params, k, x)
                    ),
                    jnp.zeros_like(b),
                )
            return jax.scipy.linalg.solve(dense, b, assume_a="pos")
        x = self._smooth(params, k, jnp.zeros_like(b), b, self.nu,
                         x0_zero=True)
        r = b - self._matvec(params, k, x)
        xc = self._cycle(params, k + 1, self._PT(params, k, r))
        x = x + self._P(params, k, xc)
        return self._smooth(params, k, x, b, self.nu)


def amg_pcg(K_csr, b, nd=1, coords=None, dtype=None, rtol=1e-8, atol=0.0,
            maxiter=1000, precond_dtype=None, cache=None, **amg_kw):
    """AMG-preconditioned CG on device for a host-assembled CSR system.

    The pyamg-CG replacement for unstructured meshes
    (pyfem.py:2402-2422): host hierarchy setup, device iterations.

    Args:
        cache: optional mutable dict reused across solves on the same
            mesh/pattern; holds the structural setup (RCM, aggregates,
            tentative QRs, DIA offsets) *and* the compiled CG program,
            so repeated solves (topology loops) pay only the O(nnz)
            value update — the reference pays the full pyamg setup per
            solve (pyfem.py:2392-2400).

    Returns:
        (x, iters, resnorm) in the original (unpermuted) ordering.
    """
    dtype = jnp.dtype(dtype or np.asarray(b).dtype)
    precond_dtype = precond_dtype or dtype
    structure = cache.get("structure") if cache is not None else None
    amg = AMGPreconditioner(K_csr, nd=nd, coords=coords,
                            dtype=precond_dtype, structure=structure,
                            **amg_kw)
    if cache is not None:
        cache["structure"] = amg.structure
    op0, vals0, offs0 = csr_to_dia(
        K_csr[np.asarray(amg.perm)][:, np.asarray(amg.perm)].tocsr(),
        dtype,
        max_offsets=amg_kw.get("max_offsets", 2048),
        offsets=cache.get("offsets0") if cache is not None else None,
    )
    if cache is not None:
        cache["offsets0"] = offs0
    params = amg._params()
    rdtype = jnp.float64 if dtype == jnp.float64 else dtype

    run_key = (int(maxiter), str(dtype), str(precond_dtype))
    if cache is not None and cache.get("run_key") == run_key:
        run = cache["run"]
        bp = jnp.take(jnp.asarray(b, dtype), amg.perm, axis=0)
        x, k, rn = run(vals0, params, bp, jnp.asarray(rtol, rdtype),
                       jnp.asarray(atol, rdtype))
        return jnp.take(x, amg.iperm, axis=0), k, rn

    @jax.jit
    def run(vals0, params, bp, rtol, atol):
        normb = jnp.linalg.norm(bp)
        tol2 = jnp.maximum(rtol * normb, atol) ** 2
        matvec = lambda u: op0.matvec(vals0, u)
        precond = lambda r: amg.apply(
            params, r.astype(amg.dtype)
        ).astype(dtype)
        x0 = jnp.zeros_like(bp)
        r = bp - matvec(x0)
        z = precond(r)
        p = z
        rz = jnp.vdot(r, z)

        def cond(s):
            _, r, _, _, _, k = s
            return (jnp.vdot(r, r).real > tol2) & (k < maxiter)

        def body(s):
            x, r, z, p, rz, k = s
            Ap = matvec(p)
            alpha = rz / jnp.vdot(p, Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            z = precond(r)
            rz2 = jnp.vdot(r, z)
            p = z + (rz2 / rz) * p
            return (x, r, z, p, rz2, k + 1)

        x, r, *_, k = jax.lax.while_loop(cond, body, (x0, r, z, p, rz, 0))
        return x, k, jnp.sqrt(jnp.vdot(r, r).real)

    if cache is not None:
        cache["run"], cache["run_key"] = run, run_key
    bp = jnp.take(jnp.asarray(b, dtype), amg.perm, axis=0)
    x, k, rn = run(vals0, params, bp, jnp.asarray(rtol, rdtype),
                   jnp.asarray(atol, rdtype))
    return jnp.take(x, amg.iperm, axis=0), k, rn
