"""2D stencil operator for structured quad grids — the multigrid workhorse.

The assembled matrix of a quad4 discretization couples each node only to
its 3x3 grid neighborhood, so the operator is fully described by
coefficient *planes* ``coeff[c, c', dy, dx][ny, nx]`` (c/c' = dof
components, dy/dx in {0,1,2} indexing the neighbor offset - 1).  The
matvec is then

    y[c] = sum_{c', dy, dx} coeff[c, c', dy, dx] * shift(u[c'], dy, dx)

— static 2D slices of a once-padded field, lanes = the x axis, no
dynamic slicing, no scatter anywhere.  Assembly from element matrices is
ndpe^2 strided slice-adds (same plan as ops.dia.StructuredDia2D).

State vectors live as (nd, ny, nx) component planes throughout.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["Stencil2D", "Stencil3D"]

# local node (dy, dx) offsets in the structured quad element ordering
_QUAD4_LOCAL = ((0, 0), (0, 1), (1, 1), (1, 0))


class Stencil2D:
    """Stencil form of a quad4-assembled operator on an (ny, nx) grid.

    coeff layout: (nd, nd, 3, 3, ny, nx) — indexed [c_row, c_col,
    dy+1, dx+1, iy, ix].
    """

    def __init__(self, nx: int, ny: int, nd: int):
        self.nx, self.ny, self.nd = int(nx), int(ny), int(nd)
        ndpe = 4 * nd
        plan = []
        for r in range(ndpe):
            a, ca = divmod(r, nd)
            ay, ax = _QUAD4_LOCAL[a]
            for s in range(ndpe):
                b, cb = divmod(s, nd)
                by, bx = _QUAD4_LOCAL[b]
                dy, dx = by - ay + 1, bx - ax + 1
                plan.append((ca, cb, dy, dx, ay, ax, r, s))
        self.plan = tuple(plan)

    # -- assembly ---------------------------------------------------------

    def assemble(self, Ke):
        """(nelems, ndpe, ndpe) element matrices -> coefficient planes."""
        ny, nx, nd = self.ny, self.nx, self.nd
        ney, nex = ny - 1, nx - 1
        Kg = Ke.reshape(ney, nex, Ke.shape[-2], Ke.shape[-1])
        coeff = jnp.zeros((nd, nd, 3, 3, ny, nx), dtype=Ke.dtype)
        for (ca, cb, dy, dx, ay, ax, r, s) in self.plan:
            coeff = coeff.at[ca, cb, dy, dx, ay : ay + ney, ax : ax + nex].add(
                Kg[:, :, r, s]
            )
        return coeff

    def assemble_transposed(self, KeT):
        """(ndpe*ndpe, nelems) layout (Pallas kernels) -> planes."""
        ny, nx, nd = self.ny, self.nx, self.nd
        ney, nex = ny - 1, nx - 1
        ndpe = 4 * nd
        Kg = KeT.reshape(ndpe * ndpe, ney, nex)
        coeff = jnp.zeros((nd, nd, 3, 3, ny, nx), dtype=KeT.dtype)
        for (ca, cb, dy, dx, ay, ax, r, s) in self.plan:
            coeff = coeff.at[ca, cb, dy, dx, ay : ay + ney, ax : ax + nex].add(
                Kg[r * ndpe + s]
            )
        return coeff

    def assemble_uniform(self, Cq_grid, Kq):
        """Uniform-geometry assembly: Ke[e] = sum_q Cq[e,q] Kq[q].

        On a uniform structured grid every element has identical
        geometry, so the element matrices are material-weighted sums of
        the per-quadrature unit matrices Kq (nquads, ndpe, ndpe).  This
        skips materializing the (nelems, ndpe, ndpe) Ke array entirely
        (~134 MB at 1M dof).  Scatter-free: each coefficient plane is
        built once as a sum of zero-padded element planes (the chain of
        strided in-place adds the previous version used serializes into
        hundreds of read-modify-write passes over the full buffer —
        measured 78 ms for the 3D analogue at 0.8M dof).

        Args:
            Cq_grid: (nquads, ney, nex) material factor at quad points.
            Kq: (nquads, ndpe, ndpe) unit element matrices (concrete).
        """
        ny, nx, nd = self.ny, self.nx, self.nd
        ney, nex = ny - 1, nx - 1
        Kqh = np.asarray(Kq)
        nq = Cq_grid.shape[0]
        # per-plane contribution table: (ca,cb,dy,dx) -> {(ay,ax): w[q]}
        table = {}
        for (ca, cb, dy, dx, ay, ax, r, s) in self.plan:
            table.setdefault((ca, cb, dy, dx), {}).setdefault(
                (ay, ax), np.zeros(nq)
            )
            table[(ca, cb, dy, dx)][(ay, ax)] += Kqh[:, r, s]
        planes = []
        zero = None
        for ca in range(nd):
            for cb in range(nd):
                for dy in range(3):
                    for dx in range(3):
                        contribs = table.get((ca, cb, dy, dx))
                        if not contribs:
                            if zero is None:
                                zero = jnp.zeros((ny, nx), Cq_grid.dtype)
                            planes.append(zero)
                            continue
                        p = None
                        for (ay, ax), w in contribs.items():
                            t = None
                            for q in range(nq):
                                if w[q] == 0.0:
                                    continue
                                tq = float(w[q]) * Cq_grid[q]
                                t = tq if t is None else t + tq
                            tp = jnp.pad(
                                t, ((ay, 1 - ay), (ax, 1 - ax))
                            )
                            p = tp if p is None else p + tp
                        planes.append(p)
        return jnp.stack(planes).reshape(nd, nd, 3, 3, ny, nx)

    # -- operator ---------------------------------------------------------

    def matvec(self, coeff, u):
        """u: (nd, ny, nx) -> y: (nd, ny, nx)."""
        nd, ny, nx = self.nd, self.ny, self.nx
        up = jnp.pad(u, ((0, 0), (1, 1), (1, 1)))
        ys = []
        for c in range(nd):
            acc = None
            for cp in range(nd):
                for dy in range(3):
                    for dx in range(3):
                        t = coeff[c, cp, dy, dx] * up[
                            cp, dy : dy + ny, dx : dx + nx
                        ]
                        acc = t if acc is None else acc + t
            ys.append(acc)
        return jnp.stack(ys)

    def bc_matvec(self, coeff, mask, u):
        """Dirichlet mask semantics on (nd, ny, nx) fields."""
        uz = jnp.where(mask, 0.0, u)
        y = self.matvec(coeff, uz)
        return jnp.where(mask, u, y)

    def bc_eliminate(self, coeff, mask):
        """Fold Dirichlet elimination into the coefficients.

        Returns coeff' with masked rows/columns zeroed and a unit
        diagonal at masked dofs, so the *plain* ``matvec(coeff', u)``
        equals ``bc_matvec(coeff, mask, u)`` exactly — the stencil
        analogue of the reference's symmetric row+column elimination
        (pyfem.py:780-835).  Mask-free matvecs keep the smoother
        kernels (XLA and Pallas) free of select ops.
        """
        nd, ny, nx = self.nd, self.ny, self.nx
        mp = jnp.pad(mask, ((0, 0), (1, 1), (1, 1)))
        # colm[cb, dy, dx, iy, ix] = mask[cb, iy+dy-1, ix+dx-1]
        colm = jnp.stack(
            [
                jnp.stack(
                    [mp[:, dy : dy + ny, dx : dx + nx] for dx in range(3)],
                    axis=1,
                )
                for dy in range(3)
            ],
            axis=1,
        )  # (nd, 3, 3, ny, nx)
        rowm = mask[:, None, None, None]  # (nd, 1, 1, 1, ny, nx) rows
        ce = jnp.where(rowm | colm[None], 0.0, coeff)
        one = jnp.ones((), coeff.dtype)
        for c in range(nd):
            ce = ce.at[c, c, 1, 1].set(
                jnp.where(mask[c], one, ce[c, c, 1, 1])
            )
        return ce

    def diagonal(self, coeff):
        return jnp.stack([coeff[c, c, 1, 1] for c in range(self.nd)])


# hex8 local node (dz, dy, dx) offsets (mesh._hex_conn ordering)
_HEX8_LOCAL = (
    (0, 0, 0), (0, 0, 1), (0, 1, 1), (0, 1, 0),
    (1, 0, 0), (1, 0, 1), (1, 1, 1), (1, 1, 0),
)


class Stencil3D:
    """Stencil form of a hex8-assembled operator on an (nz, ny, nx) grid.

    coeff layout: (nd, nd, 3, 3, 3, nz, ny, nx); state fields are
    (nd, nz, ny, nx) component volumes.
    """

    def __init__(self, nx: int, ny: int, nz: int, nd: int):
        self.nx, self.ny, self.nz, self.nd = int(nx), int(ny), int(nz), int(nd)
        ndpe = 8 * nd
        plan = []
        for r in range(ndpe):
            a, ca = divmod(r, nd)
            az, ay, ax = _HEX8_LOCAL[a]
            for s in range(ndpe):
                b, cb = divmod(s, nd)
                bz, by, bx = _HEX8_LOCAL[b]
                plan.append(
                    (ca, cb, bz - az + 1, by - ay + 1, bx - ax + 1,
                     az, ay, ax, r, s)
                )
        self.plan = tuple(plan)

    def assemble(self, Ke):
        """(nelems, ndpe, ndpe) element matrices -> coefficient volumes."""
        nz, ny, nx, nd = self.nz, self.ny, self.nx, self.nd
        nez, ney, nex = nz - 1, ny - 1, nx - 1
        Kg = Ke.reshape(nez, ney, nex, Ke.shape[-2], Ke.shape[-1])
        coeff = jnp.zeros((nd, nd, 3, 3, 3, nz, ny, nx), dtype=Ke.dtype)
        for (ca, cb, dz, dy, dx, az, ay, ax, r, s) in self.plan:
            coeff = coeff.at[
                ca, cb, dz, dy, dx,
                az : az + nez, ay : ay + ney, ax : ax + nex,
            ].add(Kg[:, :, :, r, s])
        return coeff

    def assemble_uniform(self, Cq_grid, Kq):
        """Uniform-geometry assembly (see Stencil2D.assemble_uniform).

        Scatter-free pad-and-sum per coefficient volume; the previous
        576-entry strided in-place-add chain cost 78 ms at 0.8M dof.

        Args:
            Cq_grid: (nquads, nez, ney, nex); Kq: (nquads, ndpe, ndpe,
            concrete).
        """
        nz, ny, nx, nd = self.nz, self.ny, self.nx, self.nd
        Kqh = np.asarray(Kq)
        nq = Cq_grid.shape[0]
        table = {}
        for (ca, cb, dz, dy, dx, az, ay, ax, r, s) in self.plan:
            table.setdefault((ca, cb, dz, dy, dx), {}).setdefault(
                (az, ay, ax), np.zeros(nq)
            )
            table[(ca, cb, dz, dy, dx)][(az, ay, ax)] += Kqh[:, r, s]
        planes = []
        zero = None
        for ca in range(nd):
            for cb in range(nd):
                for dz in range(3):
                    for dy in range(3):
                        for dx in range(3):
                            contribs = table.get((ca, cb, dz, dy, dx))
                            if not contribs:
                                if zero is None:
                                    zero = jnp.zeros(
                                        (nz, ny, nx), Cq_grid.dtype
                                    )
                                planes.append(zero)
                                continue
                            p = None
                            for (az, ay, ax), w in contribs.items():
                                t = None
                                for q in range(nq):
                                    if w[q] == 0.0:
                                        continue
                                    tq = float(w[q]) * Cq_grid[q]
                                    t = tq if t is None else t + tq
                                tp = jnp.pad(
                                    t,
                                    ((az, 1 - az), (ay, 1 - ay),
                                     (ax, 1 - ax)),
                                )
                                p = tp if p is None else p + tp
                            planes.append(p)
        return jnp.stack(planes).reshape(
            nd, nd, 3, 3, 3, nz, ny, nx
        )

    def matvec(self, coeff, u):
        """u: (nd, nz, ny, nx) -> y: (nd, nz, ny, nx)."""
        nd, nz, ny, nx = self.nd, self.nz, self.ny, self.nx
        up = jnp.pad(u, ((0, 0), (1, 1), (1, 1), (1, 1)))
        ys = []
        for c in range(nd):
            acc = None
            for cp in range(nd):
                for dz in range(3):
                    for dy in range(3):
                        for dx in range(3):
                            t = coeff[c, cp, dz, dy, dx] * up[
                                cp, dz : dz + nz, dy : dy + ny, dx : dx + nx
                            ]
                            acc = t if acc is None else acc + t
            ys.append(acc)
        return jnp.stack(ys)

    def bc_matvec(self, coeff, mask, u):
        uz = jnp.where(mask, 0.0, u)
        y = self.matvec(coeff, uz)
        return jnp.where(mask, u, y)

    def bc_eliminate(self, coeff, mask):
        """3D analogue of :meth:`Stencil2D.bc_eliminate`."""
        nd, nz, ny, nx = self.nd, self.nz, self.ny, self.nx
        mp = jnp.pad(mask, ((0, 0), (1, 1), (1, 1), (1, 1)))
        colm = jnp.stack(
            [
                jnp.stack(
                    [
                        jnp.stack(
                            [
                                mp[:, dz : dz + nz, dy : dy + ny,
                                   dx : dx + nx]
                                for dx in range(3)
                            ],
                            axis=1,
                        )
                        for dy in range(3)
                    ],
                    axis=1,
                )
                for dz in range(3)
            ],
            axis=1,
        )  # (nd, 3, 3, 3, nz, ny, nx)
        rowm = mask[:, None, None, None, None]
        ce = jnp.where(rowm | colm[None], 0.0, coeff)
        one = jnp.ones((), coeff.dtype)
        for c in range(nd):
            ce = ce.at[c, c, 1, 1, 1].set(
                jnp.where(mask[c], one, ce[c, c, 1, 1, 1])
            )
        return ce

    def diagonal(self, coeff):
        return jnp.stack([coeff[c, c, 1, 1, 1] for c in range(self.nd)])
