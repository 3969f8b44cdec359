"""General-mesh partitioner tests: distributed apply/solve on ARBITRARY
cell partitions — adaptive meshes with hanging nodes — on 8 virtual CPU
devices (VERDICT r1 item 6: the ``GpuPartitioner`` model, SURVEY.md §2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.fem.constraints import make_hanging_node_constraints
from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh
from tpufem.operators.laplace import LaplaceOperator
from tpufem.ops.matrix_free import MatrixFree
from tpufem.parallel.general import (
    GeneralDistributedOperator,
    GeneralPartitioner,
)
from tpufem.solvers.cg import cg_solve, make_jacobi
from tpufem.utils.config import FemConfig


def adaptive_setup(dim, p, refine, steps, coefficient=None):
    mesh = Mesh.hyper_cube(dim, refine)
    for _ in range(steps):
        centers = (mesh.origins + mesh.sizes[:, None] * 0.5) / mesh.U
        mesh = mesh.refine(np.linalg.norm(centers - 0.3, axis=1) < 0.4)
    dofs = DoFHandler(mesh, p)
    ac = make_hanging_node_constraints(dofs)
    mf = MatrixFree.build(
        mesh,
        dofs,
        FemConfig(dim, p, scatter="incidence"),
        coefficient=coefficient,
        constraints=ac,
    )
    return mesh, dofs, mf


def test_roundtrip_and_ownership():
    _, dofs, mf = adaptive_setup(2, 2, 2, 1)
    part = GeneralPartitioner.build(mf, 4)
    # every dof owned exactly once
    owners = np.concatenate(
        [part.l2g[s, : part.own_counts[s]] for s in range(4)]
    )
    assert len(owners) == dofs.n_dofs
    assert len(np.unique(owners)) == dofs.n_dofs
    rng = np.random.default_rng(0)
    u = rng.standard_normal(dofs.n_dofs)
    loc = part.to_local(u)
    # ghosts consistent with owners
    live = part.l2g >= 0
    assert np.array_equal(loc[live], u[part.l2g[live]])
    assert np.array_equal(part.to_global(loc), u)


@pytest.mark.parametrize(
    "dim,p,refine,steps,n_shards",
    [(2, 2, 2, 1, 4), (2, 3, 2, 1, 8), (3, 2, 1, 1, 8)],
)
def test_distributed_adaptive_vmult_matches_single_device(
    dim, p, refine, steps, n_shards
):
    """The reference composes GpuPartitioner with its full operator
    (SURVEY.md §3.6); hanging-node C/C^T must distribute per shard."""
    _, dofs, mf = adaptive_setup(dim, p, refine, steps)
    op = LaplaceOperator(mf)
    part = GeneralPartitioner.build(mf, n_shards)
    dop = GeneralDistributedOperator(part)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(dofs.n_dofs)
    y_ref = np.asarray(op.vmult(jnp.asarray(x)))
    y_loc = dop.vmult(dop.put_vector(x))
    y = part.to_global(np.asarray(y_loc))
    assert np.linalg.norm(y - y_ref) <= 1e-11 * np.linalg.norm(y_ref)
    # consistency: ghost copies agree with owned values after the apply
    yl = np.asarray(y_loc)
    live = part.l2g >= 0
    assert np.allclose(yl[live], y[part.l2g[live]], rtol=0, atol=1e-12)


def test_distributed_adaptive_vmult_variable_coefficient():
    coef = lambda x: 1.0 + 0.5 * np.sin(3.0 * x[:, 0]) * x[:, 1]
    _, dofs, mf = adaptive_setup(2, 2, 2, 1, coefficient=coef)
    op = LaplaceOperator(mf)
    part = GeneralPartitioner.build(mf, 8)
    dop = GeneralDistributedOperator(part)
    rng = np.random.default_rng(2)
    x = rng.standard_normal(dofs.n_dofs)
    y_ref = np.asarray(op.vmult(jnp.asarray(x)))
    y = part.to_global(np.asarray(dop.vmult(dop.put_vector(x))))
    assert np.linalg.norm(y - y_ref) <= 1e-11 * np.linalg.norm(y_ref)


def test_distributed_adaptive_cg_matches_single_device():
    """Iteration-count parity: the distributed Jacobi-CG on 8 shards must
    walk the same trajectory as the single-device solve (f64)."""
    _, dofs, mf = adaptive_setup(2, 2, 3, 1)
    op = LaplaceOperator(mf)
    diag = np.asarray(op.diagonal())
    rng = np.random.default_rng(3)
    b = rng.standard_normal(dofs.n_dofs)
    b = np.asarray(mf.interior_mask) * b  # consistent constrained rhs

    res = cg_solve(
        op.vmult, jnp.asarray(b), M_inv=make_jacobi(jnp.asarray(diag)),
        rtol=1e-10, maxiter=500,
    )
    part = GeneralPartitioner.build(mf, 8)
    dop = GeneralDistributedOperator(part)
    x_d, iters_d, _ = dop.cg_solve(b, diag, rtol=1e-10, maxiter=500)

    assert iters_d == int(res.iterations)
    x_ref = np.asarray(res.x)
    assert np.linalg.norm(x_d - x_ref) <= 1e-9 * max(
        np.linalg.norm(x_ref), 1.0
    )


def test_distributed_adaptive_chebyshev_cg():
    """Chebyshev-preconditioned distributed CG (PreconditionChebyshev
    analogue on the general tier): with the SAME theta/delta the
    distributed solve must match the single-device trajectory exactly
    (iteration count) and the solution to 1e-9; it must also beat
    Jacobi's iteration count on this mesh."""
    from tpufem.solvers.chebyshev import ChebyshevParams, chebyshev_smooth

    _, dofs, mf = adaptive_setup(2, 2, 3, 1)
    op = LaplaceOperator(mf)
    diag = np.asarray(op.diagonal())
    rng = np.random.default_rng(3)
    b = np.asarray(mf.interior_mask) * rng.standard_normal(dofs.n_dofs)

    part = GeneralPartitioner.build(mf, 8)
    dop = GeneralDistributedOperator(part)
    cp = dop.cheb_params(diag, degree=4)
    x_d, iters_d, _ = dop.cg_solve(b, diag, rtol=1e-10, maxiter=500,
                                   precond="chebyshev", cheb_params=cp)

    inv_diag = jnp.where(jnp.asarray(diag) != 0, 1.0 / jnp.asarray(diag),
                         0.0)
    cps = ChebyshevParams(cp.theta, cp.delta, 4)
    res = cg_solve(
        op.vmult, jnp.asarray(b),
        M_inv=lambda r: chebyshev_smooth(op.vmult, inv_diag, cps, r),
        rtol=1e-10, maxiter=500,
    )
    assert iters_d == int(res.iterations)
    x_ref = np.asarray(res.x)
    assert np.linalg.norm(x_d - x_ref) <= 1e-9 * np.linalg.norm(x_ref)

    _, iters_j, _ = dop.cg_solve(b, diag, rtol=1e-10, maxiter=500)
    assert iters_d < iters_j


def test_distributed_generic_functor_operators():
    """The distributed FEEvaluation contract: a quad-point functor runs
    the per-shard cell loop, matching the single-device GenericOperator
    (mass and Helmholtz) on an adaptive mesh with hanging nodes."""
    from tpufem.operators.generic import helmholtz_operator, mass_operator

    _, dofs, mf = adaptive_setup(2, 2, 2, 1)
    part = GeneralPartitioner.build(mf, 8)
    rng = np.random.default_rng(7)
    x = rng.standard_normal(dofs.n_dofs)

    cases = [
        (mass_operator(mf),
         lambda vals, grads, ctx: (vals, None),
         dict(needs_gradients=False)),
        (helmholtz_operator(mf, alpha=1.0, beta=0.7),
         lambda vals, grads, ctx: (vals, 0.7 * grads),
         {}),
    ]
    for ref_op, qop, kw in cases:
        y_ref = np.asarray(ref_op.vmult(jnp.asarray(x)))
        dop = GeneralDistributedOperator(part, quad_op=qop, **kw)
        y = part.to_global(np.asarray(dop.vmult(dop.put_vector(x))))
        assert (np.linalg.norm(y - y_ref)
                <= 1e-11 * np.linalg.norm(y_ref)), kw


def test_distributed_generic_functor_curved_metric():
    """The functor path's GENERAL-metric branch (inv_jac/jxw transforms)
    on a curved shell mesh."""
    from tpufem.operators.generic import helmholtz_operator

    mesh = Mesh.hyper_shell_2d(3)
    dofs = DoFHandler(mesh, 2)
    mf = MatrixFree.build(mesh, dofs, FemConfig(2, 2, scatter="incidence"))
    part = GeneralPartitioner.build(mf, 8)
    assert part.metric_kind == "general"
    rng = np.random.default_rng(9)
    x = rng.standard_normal(dofs.n_dofs)
    y_ref = np.asarray(helmholtz_operator(mf, 1.0, 0.3).vmult(
        jnp.asarray(x)))
    dop = GeneralDistributedOperator(
        part, quad_op=lambda vals, grads, ctx: (vals, 0.3 * grads))
    y = part.to_global(np.asarray(dop.vmult(dop.put_vector(x))))
    assert np.linalg.norm(y - y_ref) <= 1e-11 * np.linalg.norm(y_ref)


def test_uniform_mesh_also_works():
    """The general partitioner subsumes the slab case (any mesh)."""
    mesh = Mesh.hyper_cube(2, 3)
    dofs = DoFHandler(mesh, 2)
    mf = MatrixFree.build(mesh, dofs, FemConfig(2, 2, scatter="incidence"))
    op = LaplaceOperator(mf)
    part = GeneralPartitioner.build(mf, 8)
    dop = GeneralDistributedOperator(part)
    rng = np.random.default_rng(4)
    x = rng.standard_normal(dofs.n_dofs)
    y_ref = np.asarray(op.vmult(jnp.asarray(x)))
    y = part.to_global(np.asarray(dop.vmult(dop.put_vector(x))))
    assert np.linalg.norm(y - y_ref) <= 1e-11 * np.linalg.norm(y_ref)


@pytest.mark.parametrize("exchange", ["gather", "a2a"])
def test_exchange_schemes_match(exchange):
    """The pairwise all_to_all exchange (ICI path) must match the
    all_gather import bit-for-bit."""
    _, dofs, mf = adaptive_setup(2, 2, 2, 1)
    op = LaplaceOperator(mf)
    part = GeneralPartitioner.build(mf, 8)
    dop = GeneralDistributedOperator(part, exchange=exchange)
    rng = np.random.default_rng(6)
    x = rng.standard_normal(dofs.n_dofs)
    y_ref = np.asarray(op.vmult(jnp.asarray(x)))
    y_loc = dop.vmult(dop.put_vector(x))
    y = part.to_global(np.asarray(y_loc))
    assert np.linalg.norm(y - y_ref) <= 1e-11 * np.linalg.norm(y_ref)
    # consistency of ghost copies after the apply
    yl = np.asarray(y_loc)
    live = part.l2g >= 0
    assert np.allclose(yl[live], y[part.l2g[live]], rtol=0, atol=1e-12)


def test_a2a_cg_matches_single_device():
    _, dofs, mf = adaptive_setup(2, 2, 3, 1)
    op = LaplaceOperator(mf)
    diag = np.asarray(op.diagonal())
    rng = np.random.default_rng(7)
    b = np.asarray(mf.interior_mask) * rng.standard_normal(dofs.n_dofs)
    res = cg_solve(
        op.vmult, jnp.asarray(b), M_inv=make_jacobi(jnp.asarray(diag)),
        rtol=1e-10, maxiter=500,
    )
    part = GeneralPartitioner.build(mf, 8)
    dop = GeneralDistributedOperator(part, exchange="a2a")
    x_d, iters_d, _ = dop.cg_solve(b, diag, rtol=1e-10, maxiter=500)
    assert iters_d == int(res.iterations)
    x_ref = np.asarray(res.x)
    assert np.linalg.norm(x_d - x_ref) <= 1e-9 * np.linalg.norm(x_ref)


def test_default_exchange_traffic_scales_with_halo_not_n():
    """VERDICT r3 item 4: the DEFAULT ghost exchange must ship O(halo)
    elements, not O(N).  Quadrupling the mesh (2D refine+1) roughly
    doubles the halo: the selected scheme's per-update traffic (counted
    from the PLAN arrays the collectives actually move) may ~double but
    must not ~quadruple, while the all_gather scheme it replaced grows
    with N."""
    traffic, ndofs = {}, {}
    for r in (3, 4):
        _, dofs, mf = adaptive_setup(2, 2, r, 0)
        part = GeneralPartitioner.build(mf, 8)
        dop = GeneralDistributedOperator(part)  # default exchange
        assert dop.exchange == "a2a", (
            "default exchange must be the scalable pairwise plan on a "
            "sparse neighbor graph")
        traffic[r] = dop.exchange_traffic()
        ndofs[r] = dofs.n_dofs
    assert ndofs[4] / ndofs[3] > 3.5  # the mesh really ~quadrupled
    a2a_ratio = traffic[4]["a2a"] / traffic[3]["a2a"]
    gather_ratio = traffic[4]["gather"] / traffic[3]["gather"]
    assert a2a_ratio <= 2.6, (
        f"default-exchange traffic grew {a2a_ratio:.2f}x for a 4x mesh "
        "— not halo-proportional")
    assert gather_ratio >= 3.0  # the O(N) path this default replaced
    # the padded plan stays within a small factor of the true halo
    assert traffic[4]["a2a"] <= 16 * traffic[4]["ghosts"]


def test_distributed_newton_matches_single_device():
    """Distributed Newton-Krylov (AD-linearized nonlinear functor inside
    shard_map) on an adaptive hanging-node mesh: Newton iteration count
    must EQUAL the single-device NonlinearOperator solve and the
    solutions must agree to 1e-9."""
    from tpufem.fem.assemble import assemble_rhs
    from tpufem.operators.generic import NonlinearOperator

    def qop(vals, grads, ctx):
        return None, (1.0 + vals**2)[:, None, :] * grads

    _, dofs, mf = adaptive_setup(2, 2, 3, 1)
    b = assemble_rhs(
        dofs,
        lambda pts: np.sin(np.pi * pts[:, 0]) * np.cos(np.pi * pts[:, 1]),
    )

    op_ref = NonlinearOperator(mf, qop)
    ref = op_ref.solve(jnp.asarray(b), rtol=1e-11)
    assert bool(ref.converged)

    part = GeneralPartitioner.build(mf, 8)
    dop = GeneralDistributedOperator(part, quad_op=qop, needs_values=True)
    res = dop.newton_solve(b, rtol=1e-11)
    assert bool(res.converged)
    assert int(res.iterations) == int(ref.iterations)
    xr, xd = np.asarray(ref.x), np.asarray(res.x)
    assert np.linalg.norm(xd - xr) <= 1e-9 * max(np.linalg.norm(xr), 1.0)


def test_distributed_newton_gmres_minimal_surface():
    """Distributed Newton with the GMRES inner solver on the minimal
    surface form + inhomogeneous Dirichlet data: Dirichlet rows preserved
    exactly, parity with single-device."""
    from tpufem.operators.generic import NonlinearOperator

    def qop(vals, grads, ctx):
        g2 = jnp.sum(grads * grads, axis=1)
        return None, grads / jnp.sqrt(1.0 + g2)[:, None, :]

    mesh = Mesh.hyper_cube(2, 3)
    dofs = DoFHandler(mesh, 2)
    mf = MatrixFree.build(mesh, dofs, FemConfig(2, 2, scatter="incidence"))
    g = np.sin(2 * np.pi * dofs.dof_coords[:, 0])
    u0 = np.where(dofs.boundary_mask, g, 0.0)
    b = np.zeros(dofs.n_dofs)

    op_ref = NonlinearOperator(mf, qop, needs_values=False)
    ref = op_ref.solve(jnp.asarray(b), u0=jnp.asarray(u0), rtol=1e-9,
                       atol=1e-12, linear="gmres")
    assert bool(ref.converged)

    part = GeneralPartitioner.build(mf, 8)
    dop = GeneralDistributedOperator(part, quad_op=qop, needs_values=False)
    res = dop.newton_solve(b, u0_global=u0, rtol=1e-9, atol=1e-12,
                           linear="gmres")
    assert bool(res.converged)
    xd = np.asarray(res.x)
    bd = dofs.boundary_mask
    assert np.array_equal(xd[bd], u0[bd])
    xr = np.asarray(ref.x)
    assert np.linalg.norm(xd - xr) <= 1e-8 * max(np.linalg.norm(xr), 1.0)


def test_distributed_mapping_q_perturbed_adaptive():
    """MappingQ x distributed composition (VERDICT r4 item 8): a
    perturbed-support-point ADAPTIVE mesh (discrete polynomial geometry,
    general per-qpoint metric) through GeneralDistributedOperator — CG
    iteration count equality + 1e-9 solution parity vs single-device.
    The metric arrays ride _args() like any other general metric."""

    def perturb(pts):
        bump = 0.04 * np.prod(np.sin(np.pi * pts), axis=1)
        out = pts.copy()
        for a in range(pts.shape[1]):
            out[:, a] = pts[:, a] + bump * (1.0 + 0.3 * a)
        return out

    mesh = Mesh.hyper_cube(2, 3)
    centers = (mesh.origins + mesh.sizes[:, None] * 0.5) / mesh.U
    mesh = mesh.refine(np.linalg.norm(centers - 0.3, axis=1) < 0.4)
    mesh = mesh.set_mapping_q(2, perturb=perturb)
    dofs = DoFHandler(mesh, 2)
    ac = make_hanging_node_constraints(dofs)
    assert len(ac.lines) > 0
    mf = MatrixFree.build(mesh, dofs, FemConfig(2, 2, scatter="incidence"),
                          constraints=ac)
    assert mf.metric_kind == "general"  # the MappingQ per-qpoint metric

    op = LaplaceOperator(mf)
    diag = np.asarray(op.diagonal())
    rng = np.random.default_rng(5)
    b = np.asarray(mf.interior_mask) * rng.standard_normal(dofs.n_dofs)
    ref = cg_solve(op.vmult, jnp.asarray(b),
                   M_inv=make_jacobi(jnp.asarray(diag)), rtol=1e-10,
                   maxiter=1000)
    assert bool(ref.converged)

    part = GeneralPartitioner.build(mf, 8)
    dop = GeneralDistributedOperator(part)
    x_d, iters, _ = dop.cg_solve(b, diag, rtol=1e-10, maxiter=1000)
    assert iters == int(ref.iterations)
    x_r = np.asarray(ref.x)
    assert np.linalg.norm(x_d - x_r) <= 1e-9 * np.linalg.norm(x_r)
