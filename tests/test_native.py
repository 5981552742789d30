"""Native C++ host-setup helpers match their NumPy fallbacks."""

import numpy as np
import pytest

from pyfem_gpu_testflight_tpu import native


def test_expand_pattern_matches_numpy():
    rng = np.random.default_rng(0)
    cd = rng.integers(0, 99, size=(500, 8)).astype(np.int64)
    r1, c1 = native.expand_pattern(cd)
    r2 = np.repeat(cd, 8, axis=1).ravel()
    c2 = np.tile(cd, (1, 8)).ravel()
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_array_equal(c1, c2)


def test_unique_inverse_matches_numpy():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 5000, size=200000).astype(np.int64)
    u1, i1 = native.unique_inverse(keys)
    u2, i2 = np.unique(keys, return_inverse=True)
    np.testing.assert_array_equal(u1, u2)
    np.testing.assert_array_equal(i1, i2.astype(np.int32))


def test_bucketed_unique_inverse_matches_numpy():
    if native.get_lib() is None:
        pytest.skip("native library unavailable (no compiler)")
    rng = np.random.default_rng(2)
    nrows = 300
    rows = rng.integers(0, nrows, size=100000).astype(np.int64)
    cols = rng.integers(0, nrows, size=100000).astype(np.int64)
    keys = rows * nrows + cols
    u1, i1 = native.unique_inverse(keys, rows=rows, nrows=nrows)
    u2, i2 = np.unique(keys, return_inverse=True)
    np.testing.assert_array_equal(u1, u2)
    np.testing.assert_array_equal(i1, i2.astype(np.int32))


def test_sparsity_pattern_uses_native_and_matches_scipy():
    import pyfem_gpu_testflight_tpu as fem
    from pyfem_gpu_testflight_tpu.assembly import SparsityPattern, make_conn_dof
    from scipy import sparse

    creator = fem.ProblemCreator(nnodes_x=9, nnodes_y=7)
    conn, X, dof_fixed, nodal_force = creator.create_linear_elasticity_problem()
    cd = make_conn_dof(conn, 2)
    ndof = 2 * X.shape[0]
    pat = SparsityPattern(cd, ndof)
    # pattern equals scipy's coo dedup
    ii = np.repeat(cd, cd.shape[1], axis=1).ravel()
    jj = np.tile(cd, (1, cd.shape[1])).ravel()
    K = sparse.coo_matrix(
        (np.ones(ii.shape[0]), (ii, jj)), shape=(ndof, ndof)
    ).tocsr()
    K.sum_duplicates()
    assert pat.nnz == K.nnz
    np.testing.assert_array_equal(pat.indptr, K.indptr)
    np.testing.assert_array_equal(pat.cols, K.indices)
