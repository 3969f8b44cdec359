"""Assembled sparse-matrix SpMV baseline (device).

Reference analogue: ``cuda_sparse_matrix.h`` — a cuSPARSE CSR wrapper around
the assembled deal.II SparseMatrix, used both as the ``bmspmv`` benchmark
baseline and as an independent correctness oracle for the matrix-free path
(SURVEY.md §2, §4.3).

TPU-native form: the assembled operator in a *padded ELL* layout —
(n_rows, K) column indices + values — applied as dense gather + row-sum.
On TPU this vastly outperforms BCOO scatter-style SpMV and is the honest
"assembled" competitor for the matrix-free-vs-SpMV comparison (BASELINE
config 3): its memory traffic is O(nnz) = O(p^{2d}) per cell vs the
matrix-free path's O(p^d).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


@jax.jit
def ell_matvec(indices, values, x):
    """y = A x in ELL form: gather + row reduction (all dense ops).
    indices/values arrive as ARGUMENTS — never closure constants
    (platform rule, see MatrixFree.device_args)."""
    return jnp.sum(values * x[indices], axis=1)


class EllMatrix:
    """Padded-ELL sparse matrix for TPU SpMV."""

    def __init__(self, indices, values, n_cols: int):
        self.indices = indices  # (n_rows, K) int32, padded with n_rows slot
        self.values = values  # (n_rows, K) dtype, padded with 0
        self.n_cols = n_cols

    @classmethod
    def from_csr(cls, A: sp.csr_matrix, dtype=jnp.float64) -> "EllMatrix":
        A = A.tocsr()
        n, _ = A.shape
        counts = np.diff(A.indptr)
        K = int(counts.max())
        idx = np.zeros((n, K), dtype=np.int32)
        val = np.zeros((n, K), dtype=np.float64)
        for i in range(n):
            s, e = A.indptr[i], A.indptr[i + 1]
            idx[i, : e - s] = A.indices[s:e]
            val[i, : e - s] = A.data[s:e]
        return cls(
            jnp.asarray(idx), jnp.asarray(val, dtype), A.shape[1]
        )

    def matvec(self, x):
        """y = A x (jitted; index/value arrays passed as arguments)."""
        return ell_matvec(self.indices, self.values, x)

    @property
    def nnz_padded(self) -> int:
        return int(np.prod(self.values.shape))
