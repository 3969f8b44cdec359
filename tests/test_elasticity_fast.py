"""Separable elasticity fast tier: block tensor-product factorization
vs the assembled oracle (exact to rounding — same Gauss rule), diagonal,
fused-kernel path, solve parity with the generic VectorOperator."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.fem.assemble import assemble_elasticity
from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh
from tpufem.operators.tensor_product import SeparableElasticityOperator
from tpufem.operators.vector import elasticity_operator
from tpufem.ops.matrix_free import MatrixFree
from tpufem.solvers.cg import cg_solve, make_jacobi
from tpufem.utils.config import FemConfig

RNG = np.random.default_rng(47)
MU, LAM = 0.8, 1.7


def build(dim, p, refine, **cfg_kw):
    mesh = Mesh.hyper_cube(dim, refine)
    dofs = DoFHandler(mesh, p)
    mf = MatrixFree.build(mesh, dofs,
                          FemConfig(dim, p, scatter="incidence", **cfg_kw))
    return dofs, mf


@pytest.mark.parametrize("dim,p,refine", [(2, 1, 3), (2, 3, 2), (3, 2, 2),
                                          (3, 4, 1)])
def test_separable_elasticity_oracle_parity(dim, p, refine):
    dofs, mf = build(dim, p, refine)
    K = assemble_elasticity(dofs, mu=MU, lam=LAM)
    op = SeparableElasticityOperator(mf, mu=MU, lam=LAM)
    x = RNG.standard_normal((dim, dofs.n_dofs))
    y = np.asarray(op.vmult_raw(jnp.asarray(x))).reshape(-1)
    y_ref = K @ x.reshape(-1)
    assert np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref) < 1e-12


def test_separable_elasticity_diagonal():
    dofs, mf = build(2, 2, 3)
    K = assemble_elasticity(dofs, mu=MU, lam=LAM).toarray()
    op = SeparableElasticityOperator(mf, mu=MU, lam=LAM)
    d = np.asarray(op.diagonal()).reshape(-1)
    mask = np.tile(np.asarray(mf.interior_mask, np.float64), 2)
    d_ref = np.diag(K) * mask + (1.0 - mask)
    assert np.allclose(d, d_ref, rtol=1e-12, atol=1e-12)


def test_separable_elasticity_kernel_path_interpret():
    """The per-block ResidentTerms path (interpret mode on CPU) matches
    the XLA contraction path."""
    dofs, mf = build(3, 2, 2, dtype="float32")
    op_x = SeparableElasticityOperator(mf, mu=MU, lam=LAM)
    op_k = SeparableElasticityOperator(mf, mu=MU, lam=LAM,
                                       use_pallas=True, interpret=True)
    assert op_k.kernels is not None
    x = jnp.asarray(RNG.standard_normal((3, dofs.n_dofs)), jnp.float32)
    y_x = np.asarray(op_x.vmult_raw(x))
    y_k = np.asarray(op_k.vmult_raw(x))
    rel = np.linalg.norm(y_k - y_x) / np.linalg.norm(y_x)
    assert rel < 1e-5  # f32 class


def test_separable_elasticity_solve_matches_generic():
    """Jacobi-CG through the fast tier == the generic VectorOperator
    solve (same operator, different evaluation path)."""
    dofs, mf = build(2, 2, 3)
    op_f = SeparableElasticityOperator(mf, mu=MU, lam=LAM)
    op_g = elasticity_operator(mf, mu=MU, lam=LAM)
    mask = np.asarray(mf.interior_mask)
    b = np.stack([mask * RNG.standard_normal(dofs.n_dofs)
                  for _ in range(2)]).reshape(-1)
    rf = cg_solve(op_f.vmult_flat, jnp.asarray(b),
                  M_inv=make_jacobi(op_f.diagonal().reshape(-1)),
                  rtol=1e-12, maxiter=2000)
    rg = cg_solve(op_g.vmult_flat, jnp.asarray(b),
                  M_inv=make_jacobi(jnp.asarray(op_g.diagonal()
                                                ).reshape(-1)),
                  rtol=1e-12, maxiter=2000)
    assert bool(rf.converged) and bool(rg.converged)
    xf, xg = np.asarray(rf.x), np.asarray(rg.x)
    assert np.linalg.norm(xf - xg) / np.linalg.norm(xg) < 1e-9
    assert abs(int(rf.iterations) - int(rg.iterations)) <= 1
