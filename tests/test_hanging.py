"""Hanging-node constraint tests (BASELINE config 4).

The verification set the reference lacks (SURVEY.md §4 "Implication" (e)):
adaptively refined meshes, constrained-operator parity vs the condensed
assembled oracle, solution continuity across subfaces, convergence.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from tpufem.apps.poisson import solve_poisson
from tpufem.fem.assemble import assemble_laplace
from tpufem.fem.constraints import make_hanging_node_constraints
from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh
from tpufem.operators.laplace import LaplaceOperator
from tpufem.ops.matrix_free import MatrixFree
from tpufem.utils.config import FemConfig

RNG = np.random.default_rng(7)


def adaptive_mesh(dim, base, steps, center=0.31):
    mesh = Mesh.hyper_cube(dim, base)
    for _ in range(steps):
        centers = (mesh.origins + mesh.sizes[:, None] * 0.5) / mesh.U
        mesh = mesh.refine(np.linalg.norm(centers - center, axis=1) < 0.35)
    return mesh


@pytest.mark.parametrize("dim,p", [(2, 1), (2, 2), (2, 4), (3, 1), (3, 2)])
def test_constrained_vmult_parity(dim, p):
    mesh = adaptive_mesh(dim, 2, 2 if dim == 2 else 1)
    dofs = DoFHandler(mesh, p)
    ac = make_hanging_node_constraints(dofs)
    assert len(ac.lines) > 0
    mf = MatrixFree.build(mesh, dofs, FemConfig(dim, p), constraints=ac)
    op = LaplaceOperator(mf)
    K = assemble_laplace(dofs)
    m = np.asarray(mf.interior_mask)
    x = RNG.standard_normal(dofs.n_dofs)
    xa = ac.distribute(m * x)
    y = ac.distribute_transpose(np.asarray(K @ xa))
    y_o = m * y + (1 - m) * x
    y_mf = np.asarray(op.vmult(jnp.asarray(x)))
    assert np.linalg.norm(y_mf - y_o) / np.linalg.norm(y_o) < 1e-12


def test_constraint_weights_interpolate_polynomials():
    """A polynomial of degree <= p must satisfy all hanging constraints
    exactly (the constraints encode trace continuity)."""
    for dim, p in [(2, 3), (3, 2)]:
        mesh = adaptive_mesh(dim, 1, 1)
        dofs = DoFHandler(mesh, p)
        ac = make_hanging_node_constraints(dofs)
        pts = dofs.dof_coords
        u = np.prod(pts**min(p, 2), axis=1) + pts[:, 0] ** min(p, 2)
        v = ac.distribute(u)
        assert np.allclose(v, u, atol=1e-12), (dim, p)


def test_adaptive_solve_matches_direct_oracle():
    dim, p = 2, 2
    r = solve_poisson(dim=dim, degree=p, refine=2, adaptive_steps=2)
    # rebuild the same problem and solve directly
    mesh = Mesh.hyper_cube(dim, 2)
    for _ in range(2):
        centers = (mesh.origins + mesh.sizes[:, None] * 0.5) / mesh.U
        mesh = mesh.refine(np.linalg.norm(centers - 0.5, axis=1) < 0.3)
    dofs = DoFHandler(mesh, p)
    assert dofs.n_dofs == r.n_dofs
    ac = make_hanging_node_constraints(dofs)
    from tpufem.fem.assemble import assemble_rhs
    from tpufem.apps.poisson import default_solution

    u_exact, f = default_solution(dim)
    K = assemble_laplace(dofs)
    Kc = ac.condense_matrix(K).tolil()
    b = ac.distribute_transpose(assemble_rhs(dofs, f))
    bd = np.nonzero(dofs.boundary_mask)[0]
    for i in bd:
        Kc.rows[i] = [i]
        Kc.data[i] = [1.0]
    Kc = Kc.tocsr()
    Kc = Kc.T.tolil()
    for i in bd:
        Kc.rows[i] = [i]
        Kc.data[i] = [1.0]
    Kc = Kc.tocsr().T.tocsr()
    b[bd] = 0.0
    b[list(ac.lines)] = 0.0
    u = spla.spsolve(Kc, b)
    u = ac.distribute(u)
    rel = np.linalg.norm(u - r.solution) / np.linalg.norm(u)
    assert rel < 1e-8, rel


def test_adaptive_convergence():
    errs = [
        solve_poisson(dim=2, degree=2, refine=r, adaptive_steps=1).l2_error
        for r in (2, 3, 4)
    ]
    rate = np.log2(errs[-2] / errs[-1])
    assert rate > 2.5, (errs, rate)


def test_solution_continuity_at_hanging_nodes():
    r = solve_poisson(dim=2, degree=3, refine=2, adaptive_steps=2)
    mesh = Mesh.hyper_cube(2, 2)
    for _ in range(2):
        centers = (mesh.origins + mesh.sizes[:, None] * 0.5) / mesh.U
        mesh = mesh.refine(np.linalg.norm(centers - 0.5, axis=1) < 0.3)
    dofs = DoFHandler(mesh, 3)
    ac = make_hanging_node_constraints(dofs)
    x = r.solution
    for d, ents in ac.lines.items():
        interp = sum(w * x[m] for m, w in ents)
        assert abs(x[d] - interp) < 1e-9


@pytest.mark.parametrize("dim,p", [(2, 2), (2, 3), (3, 1), (3, 2), (3, 4)])
def test_native_constraints_match_python(dim, p, monkeypatch):
    """The C++ constraint builder (csrc) must produce bit-for-bit the same
    AffineConstraints as the Python builder (round-2 native adaptive
    setup)."""
    from tpufem.utils import native

    if not native.available():
        pytest.skip("native library not built")
    mesh = adaptive_mesh(dim, 2, 2 if dim == 2 else 1)
    dofs = DoFHandler(mesh, p)
    ac_native = make_hanging_node_constraints(dofs)

    monkeypatch.setenv("TPUFEM_NO_NATIVE", "1")
    ac_py = make_hanging_node_constraints(dofs)
    assert len(ac_native.lines) > 0
    assert sorted(ac_native.lines) == sorted(ac_py.lines)
    for d in ac_py.lines:
        assert ac_native.lines[d] == ac_py.lines[d], d
