"""Pallas fused-kernel parity (interpret mode on CPU).

The compiled path is exercised on the real chip by bench.py / bmop; here
the kernel logic is validated bit-exactly against the XLA separable tier.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.ops.pallas_separable import PallasSeparable
from tpufem.ops.separable import global_1d_matrices, laplace_apply_separable


@pytest.mark.parametrize("dim,p,n,tile", [
    (2, 1, 8, 8), (2, 3, 8, 16), (3, 2, 4, 8), (3, 4, 4, 8),
])
def test_pallas_matches_separable(dim, p, n, tile):
    npts = n * p + 1
    K1u, M1u = global_1d_matrices(p, n, p + 1)
    h = 1.0 / n
    Ks_np = [np.asarray(K1u / h)] * dim
    Ms_np = [np.asarray(M1u * h)] * dim
    Ks = [jnp.asarray(K1u / h)] * dim
    Ms = [jnp.asarray(M1u * h)] * dim
    rng = np.random.default_rng(0)
    u = rng.standard_normal(npts**dim)
    y_ref = np.asarray(
        laplace_apply_separable(jnp.asarray(u), dim, npts, Ks, Ms)
    )
    pk = PallasSeparable(dim, npts, p, Ks_np, Ms_np, "float64", tile=tile,
                         interpret=True)
    y = np.asarray(pk(jnp.asarray(u)))
    assert np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref) < 1e-13


def test_pallas_matches_assembled_oracle():
    """Direct parity with the assembled matrix (independent of the XLA
    separable implementation)."""
    from tpufem.fem.assemble import assemble_laplace
    from tpufem.fem.dof_handler import DoFHandler
    from tpufem.fem.mesh import Mesh

    dim, p, r = 2, 2, 3
    n = 1 << r
    npts = n * p + 1
    mesh = Mesh.hyper_cube(dim, r)
    dofs = DoFHandler(mesh, p)
    K = assemble_laplace(dofs)
    K1u, M1u = global_1d_matrices(p, n, p + 1)
    h = 1.0 / n
    pk = PallasSeparable(dim, npts, p, [np.asarray(K1u / h)] * dim,
                         [np.asarray(M1u * h)] * dim, "float64", tile=16,
                         interpret=True)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(dofs.n_dofs)
    y = np.asarray(pk(jnp.asarray(x)))
    assert np.linalg.norm(y - K @ x) / np.linalg.norm(K @ x) < 1e-12
