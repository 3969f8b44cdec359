"""Adaptive (box-tier) geometric multigrid — solvers/box_multigrid.py.

The global-coarsening V-cycle must (a) transfer nested fields exactly,
(b) precondition CG to O(10) iterations independent of mesh depth, and
(c) reproduce the Jacobi-CG solution on every mesh family the box tier
supports (uniform-coefficient, variable-coefficient, curved adaptive).
Reference analogue: poisson_mg.cu's GMG stack generalized to adaptive
meshes (SURVEY.md §3.5; deal.II global-coarsening transfer semantics).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.fem.constraints import make_hanging_node_constraints
from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh
from tpufem.ops.boxes import BoxLaplaceOperator
from tpufem.solvers.box_multigrid import BoxMultigrid

RNG = np.random.default_rng(7)


def adaptive_mesh(dim, base, steps, center=0.31):
    mesh = Mesh.hyper_cube(dim, base)
    for _ in range(steps):
        c = mesh.cell_vertices().mean(axis=1)
        flags = np.linalg.norm(c - center, axis=1) < 0.35
        mesh = mesh.refine(flags)
    return mesh


def _setup(mesh, p, coefficient=None):
    dofs = DoFHandler(mesh, p)
    ac = make_hanging_node_constraints(dofs)
    gop = BoxLaplaceOperator(mesh, dofs, constraints=ac,
                             coefficient=coefficient, dtype="float64")
    mg = BoxMultigrid(mesh, dofs, constraints=ac,
                      coefficient=coefficient, dtype="float64",
                      fine_op=gop)
    return dofs, gop, mg


def _canonical_rhs(gop, mg, seed=0):
    """Interior, non-hanging, copy-consistent random patch RHS."""
    rng = np.random.default_rng(seed)
    mask = np.asarray(gop.interior_mask, np.float64) * mg.fine.nh_mask
    b = np.asarray(gop.to_patch(rng.standard_normal(gop.n_dofs)))
    return jnp.asarray(mask * b, jnp.float64)


def _compare(gop, jac, res, iter_bound):
    assert bool(res.converged)
    assert int(res.iterations) <= iter_bound
    own = np.asarray(gop.w_owner) > 0
    xj, xg = np.asarray(jac.x), np.asarray(res.x)
    rel = np.linalg.norm((xg - xj)[own]) / np.linalg.norm(xj[own])
    assert rel < 1e-8


@pytest.mark.parametrize("dim,p,base,steps", [
    (2, 2, 2, 2), (3, 2, 1, 2), (2, 4, 2, 1),
])
def test_box_gmg_cg_matches_jacobi(dim, p, base, steps):
    mesh = adaptive_mesh(dim, base, steps)
    dofs, gop, mg = _setup(mesh, p)
    b = _canonical_rhs(gop, mg)
    jac = gop.cg_solve(b, gop.diagonal(), rtol=1e-10)
    res = mg.cg_solve(b, rtol=1e-10)
    assert int(res.iterations) < int(jac.iterations)
    _compare(gop, jac, res, iter_bound=12)


def test_box_gmg_mixed_precision_bf16_cycle():
    """f32 outer CG + bf16 V-cycle hierarchy (``solve_op=``): the fast
    adaptive tier as the smoother.  The preconditioner only steers the
    search — the f32 recurrence must still converge to the f32-cycle
    solution at rtol, in a comparable iteration count (measured: equal
    at the flagship)."""
    mesh = adaptive_mesh(3, 2, 1)
    dofs = DoFHandler(mesh, 2)
    ac = make_hanging_node_constraints(dofs)
    op = BoxLaplaceOperator(mesh, dofs, constraints=ac, dtype="float32")
    mg = BoxMultigrid(mesh, dofs, constraints=ac, dtype="float32",
                      fine_op=op, fine_diag=op.diagonal())
    mg16 = BoxMultigrid(mesh, dofs, constraints=ac, dtype="bfloat16",
                        solve_op=op)
    b = _canonical_rhs(op, mg).astype(jnp.float32)
    r32 = mg.cg_solve(b, rtol=1e-6)
    r16 = mg16.cg_solve(b, rtol=1e-6)
    assert bool(r16.converged)
    assert int(r16.iterations) <= int(r32.iterations) + 3
    x32 = np.asarray(r32.x, np.float64)
    x16 = np.asarray(r16.x, np.float64)
    assert np.linalg.norm(x16 - x32) / np.linalg.norm(x32) < 1e-4
    # true f32 residual honors the tolerance class (recurrence drift
    # from the rounded preconditioner stays within one digit)
    rr = b - op.vmult(jnp.asarray(x16, op.dt))
    rel = float(jnp.linalg.norm(rr)) / float(jnp.linalg.norm(b))
    assert rel < 1e-5

    # recast path: the zero-rebuild mixed hierarchy (shared host build
    # + f32-estimated Chebyshev scalars cast down) must deliver the
    # same mixed solve as the native bf16 build
    mgr = mg.recast("bfloat16")
    assert mgr.solve_op is op  # defaults to the f32 fine operator
    for lvl in mgr.levels:
        assert lvl.op.dt == jnp.bfloat16
        assert lvl.cheb.theta.dtype == jnp.bfloat16
    rc = mgr.cg_solve(b, rtol=1e-6)
    assert bool(rc.converged)
    assert abs(int(rc.iterations) - int(r16.iterations)) <= 2
    xc = np.asarray(rc.x, np.float64)
    assert np.linalg.norm(xc - x32) / np.linalg.norm(x32) < 1e-4
    # the originals are untouched (fresh caches, params dtypes intact)
    assert mg.levels[-1].op.dt == jnp.float32
    assert mg.device_args["levels"][-1]["pr"]["S"].dtype == jnp.float32


def test_box_operator_recast_parity():
    """BoxLaplaceOperator.recast(bf16) must equal a native bf16 build:
    init casts the same host arrays to the same dtype, so the applies
    agree to bf16 resolution (f64->f32->bf16 double rounding can move
    the last bit vs the direct f64->bf16 cast)."""
    mesh = adaptive_mesh(2, 2, 2)
    dofs = DoFHandler(mesh, 3)
    ac = make_hanging_node_constraints(dofs)
    op32 = BoxLaplaceOperator(mesh, dofs, constraints=ac,
                              dtype="float32")
    op16n = BoxLaplaceOperator(mesh, dofs, constraints=ac,
                               dtype="bfloat16")
    op16r = op32.recast("bfloat16")
    assert op16r.dt == jnp.bfloat16
    assert op16r.n_patch == op32.n_patch
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(op32.n_patch), jnp.bfloat16)
    yn = np.asarray(op16n.vmult(x), np.float64)
    yr = np.asarray(op16r.vmult(x), np.float64)
    scale = np.abs(yn).max()
    assert np.abs(yr - yn).max() < 2e-2 * scale  # bf16 resolution class
    # recast of the recast-source left the f32 operator untouched
    y32 = op32.vmult(jnp.asarray(rng.standard_normal(op32.n_patch),
                                 jnp.float32))
    assert y32.dtype == jnp.float32


def test_box_gmg_variable_coefficient():
    coef = lambda x: 1.0 + 10.0 * np.exp(
        -np.sum((x - 0.4) ** 2, axis=1) * 8)
    mesh = adaptive_mesh(3, 1, 2)
    dofs, gop, mg = _setup(mesh, 3, coefficient=coef)
    b = _canonical_rhs(gop, mg, seed=1)
    jac = gop.cg_solve(b, gop.diagonal(), rtol=1e-10)
    res = mg.cg_solve(b, rtol=1e-10)
    _compare(gop, jac, res, iter_bound=12)


def test_box_gmg_curved_adaptive():
    """Curved x adaptive: shell wedge with hanging nodes, per-level
    general metric."""
    mesh = Mesh.hyper_shell_2d(3)
    flags = np.zeros(mesh.n_cells, bool)
    flags[: mesh.n_cells // 3] = True
    mesh = mesh.refine(flags)
    dofs, gop, mg = _setup(mesh, 2)
    b = _canonical_rhs(gop, mg, seed=2)
    jac = gop.cg_solve(b, gop.diagonal(), rtol=1e-10)
    res = mg.cg_solve(b, rtol=1e-10)
    _compare(gop, jac, res, iter_bound=12)


def test_box_gmg_iteration_mesh_independence():
    """The GMG hallmark: iteration counts stay O(1) as the mesh deepens
    (Jacobi grows like h^-1)."""
    iters = []
    for base in (2, 3, 4):
        mesh = adaptive_mesh(2, base, 2)
        dofs, gop, mg = _setup(mesh, 2)
        b = _canonical_rhs(gop, mg, seed=3)
        res = mg.cg_solve(b, rtol=1e-10)
        assert bool(res.converged)
        iters.append(int(res.iterations))
    assert max(iters) <= 12
    assert max(iters) - min(iters) <= 3


def test_box_gmg_prolongation_nested_exact():
    """Prolongation must reproduce fields in the coarse FE space exactly
    at live fine nodes (nested spaces): check with a degree-p polynomial
    evaluated at level DoF coordinates."""
    p = 3
    mesh = adaptive_mesh(2, 2, 2)
    dofs, gop, mg = _setup(mesh, p)
    assert len(mg.levels) >= 3
    f = lambda x: (1.0 + x[:, 0]) ** p + 2.0 * x[:, 1] ** p - x[:, 0]
    gdp = mg.device_args
    for l in range(1, len(mg.levels)):
        lc, lf = mg.levels[l - 1], mg.levels[l]
        uc_g = f(lc.dofs.dof_coords)
        uc = lc.op.to_patch(uc_g)
        uc = lc.op.distribute_p(gdp["levels"][l - 1]["pr"], uc)
        uf = np.asarray(mg.prolongate_with(gdp, l, uc))
        uf_ref = np.asarray(lf.op.to_patch(f(lf.dofs.dof_coords)))
        own = np.asarray(lf.op.w_owner) > 0
        err = np.linalg.norm((uf - uf_ref)[own]) / np.linalg.norm(
            uf_ref[own])
        assert err < 1e-12, f"level {l}: prolongation not nested-exact"


def test_box_gmg_restriction_is_adjoint():
    """<P c, f>_fine == <c, R f>_coarse with owner-weighted dots (R must
    be the exact adjoint for a symmetric V-cycle)."""
    mesh = adaptive_mesh(2, 2, 2)
    dofs, gop, mg = _setup(mesh, 2)
    gdp = mg.device_args
    l = len(mg.levels) - 1
    lc, lf = mg.levels[l - 1], mg.levels[l]
    rng = np.random.default_rng(5)
    # c: consistent coarse patch field, hanging rows zero
    c = np.asarray(lc.op.to_patch(rng.standard_normal(lc.dofs.n_dofs)))
    c = jnp.asarray(c * lc.nh_mask * np.asarray(lc.op.interior_mask))
    # f: consistent fine patch field, hanging+boundary rows zero
    fv = np.asarray(lf.op.to_patch(rng.standard_normal(lf.dofs.n_dofs)))
    fv = jnp.asarray(fv * lf.nh_mask * np.asarray(lf.op.interior_mask))
    zc = lc.op.distribute_p(gdp["levels"][l - 1]["pr"], c)
    Pc = mg.prolongate_with(gdp, l, zc)
    Rf = mg.restrict_with(gdp, l, fv)
    lhs = float(lf.op.dot(jnp.asarray(Pc), fv))
    rhs = float(lc.op.dot(c, jnp.asarray(Rf)))
    assert abs(lhs - rhs) / max(abs(lhs), 1e-30) < 1e-12


def test_box_gmg_poisson_app():
    """End-to-end manufactured-solution solve through the app path:
    same L2 error as the Jacobi solve, far fewer iterations."""
    from tpufem.apps.poisson import solve_poisson

    rj = solve_poisson(dim=2, degree=3, refine=3, scatter="boxes",
                       adaptive_steps=2, dtype="float64")
    rg = solve_poisson(dim=2, degree=3, refine=3, scatter="boxes",
                       adaptive_steps=2, dtype="float64",
                       precond="gmg")
    assert rg.iterations <= 12
    assert rg.iterations < rj.iterations
    assert abs(rg.l2_error - rj.l2_error) / rj.l2_error < 1e-6
