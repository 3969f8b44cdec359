"""Box-structured adaptive tier (tpufem.ops.boxes) parity tests.

The fast TPU path for BASELINE config 4 (adaptive + hanging nodes) must be
*exactly* the operator the generic incidence path implements: C^T A C with
identity on constrained rows, verified against the scipy-assembled oracle.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.fem.assemble import assemble_laplace
from tpufem.fem.constraints import make_hanging_node_constraints
from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh
from tpufem.ops.boxes import BoxLaplaceOperator, build_boxes

RNG = np.random.default_rng(11)


def adaptive_mesh(dim, base, steps, center=0.31):
    mesh = Mesh.hyper_cube(dim, base)
    for _ in range(steps):
        centers = (mesh.origins + mesh.sizes[:, None] * 0.5) / mesh.U
        mesh = mesh.refine(np.linalg.norm(centers - center, axis=1) < 0.35)
    return mesh


def _mesh_and_op(dim, p, steps=2, base=2, coefficient=None):
    mesh = adaptive_mesh(dim, base, steps)
    dofs = DoFHandler(mesh, p)
    ac = make_hanging_node_constraints(dofs)
    op = BoxLaplaceOperator(mesh, dofs, constraints=ac,
                            coefficient=coefficient, dtype="float64")
    return mesh, dofs, ac, op


def test_boxes_cover_every_cell_once():
    mesh = adaptive_mesh(3, 1, 2)
    dofs = DoFHandler(mesh, 2)
    boxes = build_boxes(mesh, dofs)
    seen = np.concatenate([b.cells for b in boxes])
    assert sorted(seen.tolist()) == list(range(mesh.n_cells))
    for b in boxes:
        assert int(b.active.sum()) == len(b.cells)


def test_patch_roundtrip_and_owner_dot():
    mesh, dofs, ac, op = _mesh_and_op(2, 3)
    u = RNG.standard_normal(dofs.n_dofs)
    v = RNG.standard_normal(dofs.n_dofs)
    up, vp = op.to_patch(u), op.to_patch(v)
    assert np.allclose(op.from_patch(up), u, atol=1e-14)
    assert np.isclose(float(op.dot(up, vp)), float(u @ v), atol=1e-10)


@pytest.mark.parametrize("dim,p", [(2, 1), (2, 2), (2, 3), (3, 1), (3, 2)])
def test_box_vmult_raw_parity(dim, p):
    """Raw apply (no constraints) == assembled K on conforming inputs.

    A_raw in patch space only agrees with the global assembled K when the
    input is a valid patch vector (duplicated copies consistent), which
    to_patch guarantees.
    """
    mesh, dofs, ac, op = _mesh_and_op(dim, p, steps=2 if dim == 2 else 1)
    K = assemble_laplace(dofs)
    x = RNG.standard_normal(dofs.n_dofs)
    y_o = np.asarray(K @ x)
    y = op.from_patch(op.vmult_raw(op.to_patch(x)))
    assert np.linalg.norm(y - y_o) / np.linalg.norm(y_o) < 1e-12


@pytest.mark.parametrize("dim,p", [(2, 1), (2, 2), (2, 4), (3, 1), (3, 2)])
def test_box_constrained_vmult_parity(dim, p):
    mesh, dofs, ac, op = _mesh_and_op(dim, p, steps=2 if dim == 2 else 1)
    assert len(ac.lines) > 0
    K = assemble_laplace(dofs)
    m_g = ~(dofs.boundary_mask | ac.constrained_mask())
    x = RNG.standard_normal(dofs.n_dofs)
    xa = ac.distribute(m_g * x)
    y = ac.distribute_transpose(np.asarray(K @ xa))
    y_o = m_g * y + (~m_g) * x
    y_box = op.from_patch(op.vmult(op.to_patch(x)))
    assert np.linalg.norm(y_box - y_o) / np.linalg.norm(y_o) < 1e-12


def test_box_vmult_variable_coefficient():
    coef = lambda x: 1.0 + 10.0 * np.sum(x**2, axis=1)
    mesh, dofs, ac, op = _mesh_and_op(2, 2, coefficient=coef)
    K = assemble_laplace(dofs, coefficient=coef)
    m_g = ~(dofs.boundary_mask | ac.constrained_mask())
    x = RNG.standard_normal(dofs.n_dofs)
    xa = ac.distribute(m_g * x)
    y = ac.distribute_transpose(np.asarray(K @ xa))
    y_o = m_g * y + (~m_g) * x
    y_box = op.from_patch(op.vmult(op.to_patch(x)))
    assert np.linalg.norm(y_box - y_o) / np.linalg.norm(y_o) < 1e-12


@pytest.mark.parametrize("dim,p", [(2, 2), (3, 2)])
def test_box_bf16_tier_parity(dim, p):
    """bf16 patch storage — the fast adaptive bench tier (1-pass MXU
    matmuls + halved transfer DMA; measured 0.57 -> 0.94 GDoF/s at the
    3.3M flagship, docs/ROOFLINE.md 'Adaptive box tier — the precision
    axis').  Constrained vmult must stay in the bf16 error class."""
    mesh, dofs, ac, op = _mesh_and_op(dim, p, steps=2 if dim == 2 else 1)
    op16 = BoxLaplaceOperator(mesh, dofs, constraints=ac,
                              dtype="bfloat16")
    x = RNG.standard_normal(dofs.n_dofs)
    y_ref = op.from_patch(op.vmult(op.to_patch(x)))
    x16 = op16.to_patch(x).astype(jnp.bfloat16)
    y16 = op16.from_patch(op16.vmult(x16))
    rel = np.linalg.norm(y16 - y_ref) / np.linalg.norm(y_ref)
    assert np.isfinite(rel) and rel < 5e-3, rel


def test_box_uniform_mesh_degenerates_to_structured():
    """On a uniform mesh the tier is one full box — parity still holds."""
    mesh = Mesh.hyper_cube(2, 3)
    dofs = DoFHandler(mesh, 2)
    op = BoxLaplaceOperator(mesh, dofs, dtype="float64")
    assert len(op.boxes) == 1
    K = assemble_laplace(dofs)
    x = RNG.standard_normal(dofs.n_dofs)
    y = op.from_patch(op.vmult_raw(op.to_patch(x)))
    y_o = np.asarray(K @ x)
    assert np.linalg.norm(y - y_o) / np.linalg.norm(y_o) < 1e-12


def test_box_cg_solve_matches_incidence_path():
    """Full Poisson solve in patch space == the generic-path solve."""
    from tpufem.fem.assemble import assemble_rhs
    from tpufem.apps.poisson import default_solution, dirichlet_setup
    from tpufem.operators.laplace import LaplaceOperator
    from tpufem.ops.matrix_free import MatrixFree
    from tpufem.solvers.cg import cg_solve, make_jacobi
    from tpufem.utils.config import FemConfig

    dim, p = 2, 2
    mesh, dofs, ac, op = _mesh_and_op(dim, p)
    u_exact, f = default_solution(dim)
    b = assemble_rhs(dofs, f)

    # reference: incidence path
    mf = MatrixFree.build(mesh, dofs, FemConfig(dim, p), constraints=ac)
    iop = LaplaceOperator(mf)
    g = np.zeros(dofs.n_dofs)
    b_con, x0 = dirichlet_setup(iop, b, g)
    res_i = cg_solve(iop.vmult, b_con,
                     M_inv=make_jacobi(iop.diagonal()), x0=x0, rtol=1e-12)
    x_i = np.asarray(mf.distribute(res_i.x))

    # box path: same constrained system in patch coordinates
    bp = op.to_patch(np.asarray(b_con))
    diag = op.diagonal()
    res_b = cg_solve(op.vmult, bp, M_inv=lambda r: r / diag,
                     x0=op.to_patch(np.asarray(x0)), rtol=1e-12,
                     dot=op.dot)
    x_b = op.from_patch(op.distribute(res_b.x))
    assert int(res_b.iterations) == int(res_i.iterations)
    assert np.linalg.norm(x_b - x_i) / np.linalg.norm(x_i) < 1e-9


def _curved_adaptive(dim, refinements):
    """Adaptively refined shell wedge — curved x hanging nodes (the
    reference's adaptive shell path, SURVEY.md §3.1)."""
    mesh = (Mesh.hyper_shell_2d(refinements) if dim == 2
            else Mesh.hyper_shell_3d(refinements))
    flags = np.zeros(mesh.n_cells, bool)
    flags[: mesh.n_cells // 3] = True
    return mesh.refine(flags)


@pytest.mark.parametrize("dim,p,r", [(2, 1, 3), (2, 3, 3), (3, 2, 2)])
def test_box_curved_adaptive_vmult_parity(dim, p, r):
    """Curved ADAPTIVE meshes ride the box tier's global-general cell
    loop (per-qpoint packed metric, dead cells G=0) — raw apply must
    match the assembled oracle to rounding."""
    mesh = _curved_adaptive(dim, r)
    dofs = DoFHandler(mesh, p)
    ac = make_hanging_node_constraints(dofs)
    op = BoxLaplaceOperator(mesh, dofs, constraints=ac, dtype="float64")
    assert op._cell_scheme == "global-general"
    x = RNG.standard_normal(dofs.n_dofs)
    K = assemble_laplace(dofs)
    y = op.from_patch(op.vmult_raw(op.to_patch(x)))
    ref = K @ x
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-10


def test_box_curved_adaptive_solve_converges():
    """u = x^2 - y^2 (harmonic) on adaptively refined shell wedges:
    the L2 error of the box-tier solve must decay under refinement
    (same Dirichlet setup as the incidence path, applied in patch
    space — the curved x hanging-node composition end-to-end)."""
    from tpufem.apps.poisson import dirichlet_setup
    from tpufem.fem.assemble import assemble_rhs, integrate_difference
    from tpufem.operators.laplace import LaplaceOperator
    from tpufem.ops.matrix_free import MatrixFree
    from tpufem.solvers.cg import cg_solve
    from tpufem.utils.config import FemConfig

    exact = lambda x: x[:, 0] ** 2 - x[:, 1] ** 2
    zero = lambda x: np.zeros(len(x))
    errs = []
    for r in (2, 3, 4):
        mesh = _curved_adaptive(2, r)
        dofs = DoFHandler(mesh, 2)
        ac = make_hanging_node_constraints(dofs)
        op = BoxLaplaceOperator(mesh, dofs, constraints=ac,
                                dtype="float64")
        mf = MatrixFree.build(mesh, dofs, FemConfig(2, 2),
                              constraints=ac)
        iop = LaplaceOperator(mf)
        b = assemble_rhs(dofs, zero)
        g = np.zeros(dofs.n_dofs)
        bm = dofs.boundary_mask
        g[bm] = exact(dofs.dof_coords[bm])
        b_con, x0 = dirichlet_setup(iop, b, g)
        diag = op.diagonal()
        res = cg_solve(op.vmult, op.to_patch(np.asarray(b_con)),
                       M_inv=lambda rr: rr / diag,
                       x0=op.to_patch(np.asarray(x0)), rtol=1e-12,
                       dot=op.dot)
        x = op.from_patch(op.distribute(res.x))
        errs.append(integrate_difference(dofs, x, exact))
    rate = np.log2(errs[-2] / errs[-1])
    assert rate > 1.8, (errs, rate)


@pytest.mark.parametrize("dim,p,steps,base", [(2, 2, 3, 3), (3, 1, 2, 2)])
def test_box_deep_level_chain_parity(dim, p, steps, base):
    """3-4 size groups: shared-copy chains span >= 2 pair sweeps and
    masters live on interior levels — the dense sweep-compress chain
    (box_pairs) end-to-end against the assembled oracle."""
    mesh, dofs, ac, op = _mesh_and_op(dim, p, steps=steps, base=base)
    assert len(op._pair_meta) >= 2
    K = assemble_laplace(dofs)
    x = RNG.standard_normal(dofs.n_dofs)
    y_raw = op.from_patch(op.vmult_raw(op.to_patch(x)))
    y_o = np.asarray(K @ x)
    assert np.linalg.norm(y_raw - y_o) / np.linalg.norm(y_o) < 1e-12
    m_g = ~(dofs.boundary_mask | ac.constrained_mask())
    xa = ac.distribute(m_g * x)
    y = ac.distribute_transpose(np.asarray(K @ xa))
    y_o = m_g * y + (~m_g) * x
    y_box = op.from_patch(op.vmult(op.to_patch(x)))
    assert np.linalg.norm(y_box - y_o) / np.linalg.norm(y_o) < 1e-12
