"""Global assembly: dof numbering, sparsity patterns, scatter-add, SpMV.

TPU-first design:

* The reference assembles scipy COO matrices per call (pyfem.py:920-931)
  and relies on scipy's duplicate summation.  Here the scatter target is a
  *static, sorted, deduplicated* pattern computed once on the host; the
  per-call work is a single deterministic ``jax.ops.segment_sum`` — no
  data-dependent shapes ever enter ``jit``.
* The Krylov solve path never materializes the global matrix: the
  operator is applied matrix-free as gather -> batched element matvec ->
  segment_sum (the FLOPs land on the MXU, the scatter is one fused XLA
  op).  See ``elem_matvec``.
* scipy CSR export is retained for the host "direct" solver, which serves
  as the float64/complex test oracle (mirrors reference solver="direct").
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .ops.precision import einsum

__all__ = [
    "make_conn_dof",
    "SparsityPattern",
    "build_pattern",
    "assemble_values",
    "scipy_csr",
    "elem_matvec",
    "elem_diagonal",
    "assemble_vector",
]


def make_conn_dof(conn: np.ndarray, ndof_per_node: int) -> np.ndarray:
    """Element dof connectivity with interleaved components.

    dof = node * ndof_per_node + component (matches utils.py:268-298 of
    the reference).

    Args:
        conn: (nelems, nnodes_per_elem) int array.

    Returns:
        (nelems, nnodes_per_elem * ndof_per_node) int32 array.
    """
    conn = np.asarray(conn)
    if ndof_per_node == 1:
        return conn.astype(np.int32)
    nelems, nn = conn.shape
    conn_dof = np.empty((nelems, nn * ndof_per_node), dtype=np.int32)
    for axis in range(ndof_per_node):
        conn_dof[:, axis::ndof_per_node] = ndof_per_node * conn + axis
    return conn_dof


class SparsityPattern:
    """Static CSR-like pattern for the global sparse matrix.

    Built once per (mesh, ndof_per_node) on the host; ``seg_ids`` maps each
    flattened element-matrix entry to its unique nonzero slot so assembly
    is one ``segment_sum``.
    """

    def __init__(self, conn_dof: np.ndarray, ndof_total: int):
        from . import native

        conn_dof = np.asarray(conn_dof, dtype=np.int64)
        ndpe = conn_dof.shape[1]
        # (e, i, j) index pairs for every element-matrix entry, row-major
        # within each element like Ke.reshape(-1) — pyfem.py:838-858.
        # The expansion + sorted-unique run in the native C++ helper when
        # available (OpenMP; NumPy fallback otherwise).
        ii, jj = native.expand_pattern(conn_dof)
        keys = ii * ndof_total + jj
        unique_keys, seg_ids = native.unique_inverse(
            keys, rows=ii, nrows=ndof_total
        )
        # Guarantee every diagonal entry has a slot: meshes may leave grid
        # nodes unreferenced (e.g. brick20 super-cell centers — the
        # reference notes this at pyfem.py:683); those structural zeros
        # keep BC application and Jacobi preconditioning well-defined.
        diag_keys = np.arange(ndof_total, dtype=np.int64) * (ndof_total + 1)
        missing = np.setdiff1d(diag_keys, unique_keys, assume_unique=False)
        if missing.size:
            merged = np.concatenate([unique_keys, missing])
            order = np.argsort(merged, kind="stable")
            # remap seg ids to the merged ordering
            rank = np.empty_like(order)
            rank[order] = np.arange(merged.shape[0])
            seg_ids = rank[seg_ids]
            unique_keys = merged[order]
        self.ndof_total = int(ndof_total)
        self.nnz = int(unique_keys.shape[0])
        self.rows = (unique_keys // ndof_total).astype(np.int32)
        self.cols = (unique_keys % ndof_total).astype(np.int32)
        self.seg_ids = jnp.asarray(seg_ids.astype(np.int32))
        self.diag_pos = np.searchsorted(unique_keys, diag_keys).astype(np.int32)
        # CSR indptr (rows are sorted since keys are sorted)
        self.indptr = np.zeros(ndof_total + 1, dtype=np.int64)
        np.add.at(self.indptr, self.rows + 1, 1)
        self.indptr = np.cumsum(self.indptr)


def assemble_values(Ke, pattern: SparsityPattern):
    """Sum element matrices into the unique-nonzero value vector.

    Args:
        Ke: (nelems, ndpe, ndpe) element matrices (any float/complex dtype).

    Returns:
        (nnz,) values aligned with ``pattern.rows/cols``.
    """
    return jax.ops.segment_sum(
        Ke.reshape(-1),
        pattern.seg_ids,
        num_segments=pattern.nnz,
        indices_are_sorted=False,
    )


def scipy_csr(values, pattern: SparsityPattern):
    """Host scipy CSR matrix from assembled values (oracle/direct path)."""
    from scipy import sparse

    vals = np.asarray(values)
    return sparse.csr_matrix(
        (vals, pattern.cols, pattern.indptr),
        shape=(pattern.ndof_total, pattern.ndof_total),
    )


def elem_matvec(Ke, conn_dof, u, ndof_total: int):
    """Matrix-free SpMV: y = K u without forming K.

    gather -> batched element matvec (MXU) -> deterministic segment_sum.

    Args:
        Ke: (nelems, ndpe, ndpe).
        conn_dof: (nelems, ndpe) int32.
        u: (ndof_total,).
    """
    ue = jnp.take(u, conn_dof, axis=0)  # (nelems, ndpe)
    fe = einsum("eij,ej->ei", Ke, ue)
    return jax.ops.segment_sum(
        fe.reshape(-1), conn_dof.reshape(-1), num_segments=ndof_total
    )


def bc_elem_matvec(data, u):
    """Dirichlet-constrained matrix-free operator.

    ``data = (Ke, conn_dof, mask)``; fixed rows/cols act as identity
    (see bcs.py for the algebra).  Module-level so jit caches key on the
    function, not per-problem closures.
    """
    Ke, conn_dof, mask = data
    uz = jnp.where(mask, 0.0, u)
    y = elem_matvec(Ke, conn_dof, uz, u.shape[0])
    return jnp.where(mask, u, y)


def elem_diagonal(Ke, conn_dof, ndof_total: int):
    """Diagonal of the assembled matrix, computed matrix-free."""
    diag_e = jnp.diagonal(Ke, axis1=1, axis2=2)
    return jax.ops.segment_sum(
        diag_e.reshape(-1), conn_dof.reshape(-1), num_segments=ndof_total
    )


def assemble_vector(fe, conn_dof, ndof_total: int):
    """Scatter-add element vectors into the global vector.

    Deterministic replacement for the reference's ``np.add.at`` loop
    (pyfem.py:860-875) — and unlike the reference it scatters *all*
    element columns, which is correct for elements where
    nquads != nnodes_per_elem.
    """
    return jax.ops.segment_sum(
        fe.reshape(-1), conn_dof.reshape(-1), num_segments=ndof_total
    )
