"""DIA (diagonal / stencil) sparse operator — the TPU-fast SpMV path.

Scatter/gather of scalars is hostile to TPU memory (measured ~3 GB/s
effective for gather->element-matvec->segment_sum at 1M dof).  A mesh
with banded dof numbering (structured grids from ``ProblemCreator``, or
any mesh after bandwidth-reducing reordering) has a *small fixed set of
column-minus-row offsets* — 2D quad4 elasticity has 27.  Storing the
assembled matrix as dense diagonals turns SpMV into shifted contiguous
multiply-adds that XLA fuses into one VPU loop at HBM bandwidth:

    y = sum_k  dia[k, :] * u_padded[off_k : off_k + ndof]

Assembly into DIA is the same single ``segment_sum`` used for the CSR
pattern, just with slot ids ``off_idx * ndof + row``.

This is a *layout specialization* of the same operator algebra used by
``assembly.elem_matvec`` — numerically identical, pattern chosen at
setup time based on the offset count.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["DiaOperator", "build_dia"]


@functools.partial(jax.jit, static_argnames=("noffs", "ndof"))
def _assemble_dia(Ke, seg_ids, noffs, ndof):
    dia = jax.ops.segment_sum(
        Ke.reshape(-1), seg_ids, num_segments=noffs * ndof
    )
    return dia.reshape(noffs, ndof)


class DiaOperator:
    """Assembled-diagonal operator with BC mask semantics.

    Attributes:
        offsets: (noffs,) sorted int column-minus-row offsets.
        seg_ids: device int32 map from flattened element-matrix entries
            to ``off_idx * ndof + row`` slots.
    """

    def __init__(self, conn_dof: np.ndarray, ndof: int, max_offsets: int = 256):
        conn_dof = np.asarray(conn_dof, dtype=np.int64)
        ndpe = conn_dof.shape[1]
        rows = np.repeat(conn_dof, ndpe, axis=1).ravel()
        cols = np.tile(conn_dof, (1, ndpe)).ravel()
        offs = cols - rows
        offsets, off_idx = np.unique(offs, return_inverse=True)
        if offsets.size > max_offsets:
            raise ValueError(
                f"mesh numbering yields {offsets.size} diagonals "
                f"(> {max_offsets}); use the segment_sum path or reorder "
                f"the mesh"
            )
        self.ndof = int(ndof)
        self.offsets = offsets
        self.noffs = int(offsets.size)
        slots = off_idx * ndof + rows
        assert slots.max() < np.iinfo(np.int32).max
        # NOTE: large arrays are stored as explicit jit *arguments*
        # downstream (never closure constants — remote-compile setups ship
        # HLO constants with the program).
        self.seg_ids = jnp.asarray(slots.astype(np.int32))
        # padding so every shifted slice is in-bounds
        self.lo = int(-min(offsets.min(), 0))
        self.hi = int(max(offsets.max(), 0))
        self._matvec = self._make_matvec()

    def assemble(self, Ke):
        """(noffs, ndof) diagonal array from element matrices."""
        return _assemble_dia(Ke, self.seg_ids, self.noffs, self.ndof)

    def _make_matvec(self):
        offsets = tuple(int(o) for o in self.offsets)
        lo, hi, ndof = self.lo, self.hi, self.ndof

        def matvec(dia, u):
            up = jnp.pad(u, (lo, hi))
            acc = jnp.zeros_like(u)
            for k, off in enumerate(offsets):
                acc = acc + dia[k] * jax.lax.dynamic_slice(
                    up, (lo + off,), (ndof,)
                )
            return acc

        return matvec

    def matvec(self, dia, u):
        return self._matvec(dia, u)

    def bc_matvec(self, dia, mask, u):
        """Dirichlet-constrained matvec (same algebra as bcs.py)."""
        uz = jnp.where(mask, 0.0, u)
        y = self._matvec(dia, uz)
        return jnp.where(mask, u, y)

    def diagonal(self, dia):
        zero_idx = int(np.searchsorted(self.offsets, 0))
        assert self.offsets[zero_idx] == 0
        return dia[zero_idx]


def build_dia(conn_dof, ndof, Ke=None, max_offsets: int = 256):
    """Convenience: operator (+ assembled diagonals if Ke given)."""
    op = DiaOperator(conn_dof, ndof, max_offsets)
    if Ke is None:
        return op
    return op, op.assemble(Ke)
