"""Dirichlet boundary conditions, functionally.

The reference mutates CSR storage in place (zero rows, optionally zero
columns, unit diagonal, rhs lift — pyfem.py:780-835).  The TPU-native
formulation is a *mask algebra* on vectors and on the static nonzero
pattern: the constrained operator is

    A_bc(u) = where(fixed, u, A(where(fixed, 0, u)))

which is exactly the symmetric-eliminated system

    [Krr 0; 0 I] [ur; u0] = [fr - Krb u0; u0]

when paired with ``constrain_rhs``.  Solutions agree with the reference's
``apply_dirichlet_bcs(..., enforce_symmetric_K=True)`` path to rounding.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["DirichletBC"]


class DirichletBC:
    """Container for fixed dofs and their values.

    Args:
        dof_fixed: indices of constrained dofs.
        dof_fixed_vals: values at constrained dofs, or None for zero.
        ndof_total: total number of dofs.
    """

    def __init__(self, dof_fixed, dof_fixed_vals, ndof_total: int):
        self.ndof_total = int(ndof_total)
        self.fixed = np.unique(np.asarray(dof_fixed, dtype=np.int64))
        mask = np.zeros(ndof_total, dtype=bool)
        mask[self.fixed] = True
        self.mask = jnp.asarray(mask)
        vals = np.zeros(ndof_total)
        if dof_fixed_vals is not None:
            # order corresponds to the user's dof_fixed list (pre-unique)
            vals[np.asarray(dof_fixed, dtype=np.int64)] = np.asarray(dof_fixed_vals)
        self.values = jnp.asarray(vals)
        self._has_vals = dof_fixed_vals is not None

    @property
    def nfixed(self) -> int:
        return int(self.fixed.shape[0])

    # -- operator-level (matrix-free) ------------------------------------

    def constrain_operator(self, apply_fn):
        """Wrap a matvec so fixed rows/cols act as the identity."""
        mask = self.mask

        def apply_bc(u):
            uz = jnp.where(mask, 0.0, u)
            return jnp.where(mask, u, apply_fn(uz))

        return apply_bc

    def constrain_rhs(self, rhs, apply_fn):
        """rhs -> [fr - Krb u0; u0] using one unconstrained matvec."""
        vals = self.values.astype(rhs.dtype)
        lift = apply_fn(jnp.where(self.mask, vals, 0.0))
        return jnp.where(self.mask, vals, rhs - lift)

    def zero_fixed(self, u):
        return jnp.where(self.mask, 0.0, u)

    # -- assembled-values level (for pattern-based / scipy export) -------

    def constrain_values(self, values, pattern):
        """Apply symmetric elimination directly to assembled nz values."""
        row_fixed = jnp.asarray(self.mask)[pattern.rows]
        col_fixed = jnp.asarray(self.mask)[pattern.cols]
        out = jnp.where(row_fixed | col_fixed, 0.0, values)
        diag_rows_fixed = self.mask  # diag entry i is fixed iff dof i is
        one = jnp.ones((), dtype=values.dtype)
        diag_vals = jnp.where(diag_rows_fixed, one, out[pattern.diag_pos])
        return out.at[pattern.diag_pos].set(diag_vals)

    # -- host scipy path ---------------------------------------------------

    def apply_scipy(self, K, rhs, enforce_symmetric_K=True):
        """Reference-equivalent BC application on a scipy CSR matrix.

        Mirrors pyfem.py:780-835 (row zeroing, optional column zeroing,
        unit diagonal, rhs lift).
        """
        rhs = np.array(rhs)
        free = np.setdiff1d(np.arange(self.ndof_total), self.fixed)
        Krb = K[free][:, self.fixed]
        diag = np.asarray(K.diagonal()).copy()
        K = K.tolil()
        K[self.fixed, :] = 0.0
        if enforce_symmetric_K:
            K[:, self.fixed] = 0.0
        K = K.tocsr()
        diag[self.fixed] = 1.0
        K.setdiag(diag)
        K.eliminate_zeros()
        vals = np.asarray(self.values)[self.fixed]
        rhs[self.fixed] = vals if self._has_vals else 0.0
        if self._has_vals and enforce_symmetric_K:
            rhs[free] -= Krb.dot(vals)
        return K, rhs
