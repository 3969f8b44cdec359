"""Multi-chip tests on 8 virtual CPU devices (xla_force_host_platform_
device_count, set in conftest) — the distributed-test rig the reference
lacks (SURVEY.md §4.5, §4 "Implication" (d)).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh
from tpufem.operators.laplace import LaplaceOperator
from tpufem.ops.matrix_free import MatrixFree
from tpufem.parallel.distributed import (
    distributed_cg_solve,
    make_constrained,
    make_local_laplace,
)
from tpufem.parallel.partitioner import Partitioner
from tpufem.solvers.cg import cg_solve, make_jacobi
from tpufem.utils.config import FemConfig


def build(dim, p, refine):
    mesh = Mesh.hyper_cube(dim, refine)
    dofs = DoFHandler(mesh, p)
    mf = MatrixFree.build(mesh, dofs, FemConfig(dim, p))
    return mesh, dofs, mf


def test_partitioner_roundtrip():
    part = Partitioner(dim=2, n=8, p=2, n_shards=4)
    rng = np.random.default_rng(0)
    u = rng.standard_normal(part.npts**2)
    loc = part.to_local(u)
    assert loc.shape == (4, 5, 17)
    # interface planes duplicated consistently
    for k in range(3):
        assert np.array_equal(loc[k, -1], loc[k + 1, 0])
    assert np.array_equal(part.to_global(loc), u)


@pytest.mark.parametrize("dim,p,refine,n_shards", [
    (2, 2, 3, 4), (2, 3, 3, 8), (3, 2, 2, 4),
])
def test_distributed_vmult_matches_single_device(dim, p, refine, n_shards):
    mesh, dofs, mf = build(dim, p, refine)
    part = Partitioner(dim=dim, n=1 << refine, p=p, n_shards=n_shards)
    op = LaplaceOperator(mf)
    rng = np.random.default_rng(5)
    x = rng.standard_normal(dofs.n_dofs)
    y_single = np.asarray(op.vmult_raw(jnp.asarray(x)))

    dmesh = part.device_mesh()
    from functools import partial
    from jax.sharding import PartitionSpec as P

    vl = make_local_laplace(part, mf.S, mf.D_col, mf.struct_scale, mf.struct_w)

    @jax.jit
    @partial(jax.shard_map, mesh=dmesh,
             in_specs=P(part.axis_name), out_specs=P(part.axis_name))
    def dist_vmult(x_blk):
        return vl(x_blk[0])[None]

    x_loc = jax.device_put(jnp.asarray(part.to_local(x)),
                           part.sharding(dmesh))
    y_dist = part.to_global(np.asarray(dist_vmult(x_loc)))
    rel = np.linalg.norm(y_dist - y_single) / np.linalg.norm(y_single)
    assert rel < 1e-13, rel


def test_distributed_cg_matches_single_device():
    dim, p, refine, n_shards = 2, 2, 4, 8
    mesh, dofs, mf = build(dim, p, refine)
    op = LaplaceOperator(mf)
    diag = np.asarray(op.diagonal())
    mask = np.asarray(mf.interior_mask)
    rng = np.random.default_rng(11)
    b = mask * rng.standard_normal(dofs.n_dofs)

    res = cg_solve(op.vmult, jnp.asarray(b), M_inv=make_jacobi(jnp.asarray(diag)),
                   rtol=1e-10)
    part = Partitioner(dim=dim, n=1 << refine, p=p, n_shards=n_shards)
    x_dist, iters, resid = distributed_cg_solve(
        part, mf.S, mf.D_col, mf.struct_scale, mf.struct_w,
        mask, diag, b, rtol=1e-10,
    )
    rel = np.linalg.norm(x_dist - np.asarray(res.x)) / np.linalg.norm(
        np.asarray(res.x)
    )
    assert rel < 1e-9, rel
    # distributed iteration count should match single-device
    assert iters == int(res.iterations)


def test_distributed_vmult_2d_mesh_matches_single_device():
    """Two-axis (2 x 4) device-mesh decomposition of a 3D problem."""
    from tpufem.parallel.distributed import make_local_laplace_2d
    from tpufem.parallel.partitioner import Partitioner2D
    from functools import partial
    from jax.sharding import PartitionSpec as P

    dim, p, refine = 3, 2, 3
    mesh, dofs, mf = build(dim, p, refine)
    part = Partitioner2D(dim=dim, n=1 << refine, p=p, shards_z=2,
                         shards_y=4)
    op = LaplaceOperator(mf)
    rng = np.random.default_rng(13)
    x = rng.standard_normal(dofs.n_dofs)
    y_single = np.asarray(op.vmult_raw(jnp.asarray(x)))

    dmesh = part.device_mesh()
    vl = make_local_laplace_2d(part, mf.S, mf.D_col, mf.struct_scale,
                               mf.struct_w)

    @jax.jit
    @partial(jax.shard_map, mesh=dmesh,
             in_specs=P(part.axis_z, part.axis_y),
             out_specs=P(part.axis_z, part.axis_y))
    def dist_vmult(x_blk):
        return vl(x_blk[0, 0])[None, None]

    x_loc = jax.device_put(jnp.asarray(part.to_local(x)),
                           part.sharding(dmesh))
    y_dist = part.to_global(np.asarray(dist_vmult(x_loc)))
    rel = np.linalg.norm(y_dist - y_single) / np.linalg.norm(y_single)
    assert rel < 1e-13, rel

    # dot over the 2D mesh
    b = rng.standard_normal(dofs.n_dofs)

    @jax.jit
    @partial(jax.shard_map, mesh=dmesh,
             in_specs=(P(part.axis_z, part.axis_y),) * 2, out_specs=P())
    def ddot(a_blk, b_blk):
        return part.dot(a_blk[0, 0], b_blk[0, 0])

    al = jax.device_put(jnp.asarray(part.to_local(x)), part.sharding(dmesh))
    bl = jax.device_put(jnp.asarray(part.to_local(b)), part.sharding(dmesh))
    assert np.isclose(float(ddot(al, bl)), float(np.dot(x, b)), rtol=1e-12)


def test_distributed_cg_2d_mesh_matches_single_device():
    from tpufem.parallel.distributed import distributed_cg_solve_2d
    from tpufem.parallel.partitioner import Partitioner2D

    dim, p, refine = 3, 1, 3
    mesh, dofs, mf = build(dim, p, refine)
    op = LaplaceOperator(mf)
    diag = np.asarray(op.diagonal())
    mask = np.asarray(mf.interior_mask)
    rng = np.random.default_rng(17)
    b = mask * rng.standard_normal(dofs.n_dofs)
    res = cg_solve(op.vmult, jnp.asarray(b),
                   M_inv=make_jacobi(jnp.asarray(diag)), rtol=1e-10)
    part = Partitioner2D(dim=dim, n=1 << refine, p=p, shards_z=2,
                         shards_y=4)
    x_dist, iters, _ = distributed_cg_solve_2d(
        part, mf.S, mf.D_col, mf.struct_scale, mf.struct_w,
        mask, diag, b, rtol=1e-10,
    )
    rel = np.linalg.norm(x_dist - np.asarray(res.x)) / np.linalg.norm(
        np.asarray(res.x))
    assert rel < 1e-9, rel
    assert iters == int(res.iterations)


def test_distributed_dot_deterministic_and_correct():
    part = Partitioner(dim=2, n=8, p=1, n_shards=4)
    rng = np.random.default_rng(2)
    a = rng.standard_normal(part.npts**2)
    b = rng.standard_normal(part.npts**2)
    dmesh = part.device_mesh()
    from functools import partial
    from jax.sharding import PartitionSpec as P

    @jax.jit
    @partial(jax.shard_map, mesh=dmesh, in_specs=(P(part.axis_name),) * 2,
             out_specs=P())
    def ddot(a_blk, b_blk):
        return part.dot(a_blk[0], b_blk[0])

    sh = part.sharding(dmesh)
    al = jax.device_put(jnp.asarray(part.to_local(a)), sh)
    bl = jax.device_put(jnp.asarray(part.to_local(b)), sh)
    v1 = float(ddot(al, bl))
    v2 = float(ddot(al, bl))
    assert v1 == v2
    assert np.isclose(v1, float(np.dot(a, b)), rtol=1e-12)


def test_distributed_gmg_cg_matches_single_device():
    """Distributed GMG-CG (every level slab-sharded) reproduces the
    single-device GMG-CG iteration count and solution (VERDICT item 4)."""
    from tpufem.parallel.multigrid import distributed_gmg_cg_solve
    from tpufem.solvers.multigrid import GeometricMultigrid

    dim, p, refine, n_shards = 2, 2, 4, 4
    gmg = GeometricMultigrid(dim, p, refine, coarsest_refine=2)
    fine = gmg.fine
    mask = np.asarray(fine.mask)
    rng = np.random.default_rng(23)
    b = mask * rng.standard_normal(fine.mf.n_dofs)

    res = cg_solve(fine.op.vmult, jnp.asarray(b),
                   M_inv=gmg.preconditioner(), rtol=1e-10)
    x_dist, iters, resid = distributed_gmg_cg_solve(
        gmg, n_shards, b, rtol=1e-10)
    rel = np.linalg.norm(x_dist - np.asarray(res.x)) / np.linalg.norm(
        np.asarray(res.x))
    assert rel < 1e-9, rel
    assert iters == int(res.iterations)
    assert resid <= 1e-10 * np.linalg.norm(b) * 1.001


def test_distributed_gmg_cg_3d():
    from tpufem.parallel.multigrid import distributed_gmg_cg_solve
    from tpufem.solvers.multigrid import GeometricMultigrid

    # every level's cells-per-axis must divide the shard count: coarsest
    # refine=2 -> 4 cells/axis with 4 shards
    gmg = GeometricMultigrid(3, 2, 3, coarsest_refine=2)
    fine = gmg.fine
    mask = np.asarray(fine.mask)
    rng = np.random.default_rng(29)
    b = mask * rng.standard_normal(fine.mf.n_dofs)
    res = cg_solve(fine.op.vmult, jnp.asarray(b),
                   M_inv=gmg.preconditioner(), rtol=1e-10)
    x_dist, iters, _ = distributed_gmg_cg_solve(gmg, 4, b, rtol=1e-10)
    rel = np.linalg.norm(x_dist - np.asarray(res.x)) / np.linalg.norm(
        np.asarray(res.x))
    assert rel < 1e-9, rel
    assert iters == int(res.iterations)


def test_distributed_variable_coefficient_cg_matches_oracle():
    """Distributed Jacobi-CG with a variable coefficient: sharded
    struct_w, solution checked against the scipy-assembled oracle."""
    import scipy.sparse.linalg as spla

    from tpufem.fem.assemble import assemble_laplace

    dim, p, refine, n_shards = 2, 2, 4, 8
    coef = lambda x: 1.0 + 5.0 * np.sum(x**2, axis=1)
    mesh = Mesh.hyper_cube(dim, refine)
    dofs = DoFHandler(mesh, p)
    mf = MatrixFree.build(mesh, dofs, FemConfig(dim, p),
                          coefficient=coef)
    assert np.asarray(mf.struct_w).shape[0] > 1  # really sharded
    op = LaplaceOperator(mf)
    diag = np.asarray(op.diagonal())
    mask = np.asarray(mf.interior_mask)
    rng = np.random.default_rng(31)
    b = mask * rng.standard_normal(dofs.n_dofs)

    # single-device reference + iteration parity
    res = cg_solve(op.vmult, jnp.asarray(b),
                   M_inv=make_jacobi(jnp.asarray(diag)), rtol=1e-10)
    part = Partitioner(dim=dim, n=1 << refine, p=p, n_shards=n_shards)
    x_dist, iters, _ = distributed_cg_solve(
        part, mf.S, mf.D_col, mf.struct_scale, mf.struct_w,
        mask, diag, b, rtol=1e-10,
    )
    assert iters == int(res.iterations)
    rel = np.linalg.norm(x_dist - np.asarray(res.x)) / np.linalg.norm(
        np.asarray(res.x))
    assert rel < 1e-9, rel

    # oracle: assembled variable-coefficient operator, direct solve
    K = assemble_laplace(dofs, coefficient=coef).toarray()
    m = mask.astype(np.float64)
    Kc = m[:, None] * K * m[None, :] + np.diag(1.0 - m)
    x_oracle = np.linalg.solve(Kc, b)
    rel_o = np.linalg.norm(x_dist - x_oracle) / np.linalg.norm(x_oracle)
    assert rel_o < 1e-8, rel_o


# ---------------------------------------------------------------------
# ICI ghost-exchange primitive (VERDICT r2 weak item 5): the ppermute
# branch must LOWER to a collective-permute and execute with semantics
# identical to the all_gather rig.
# ---------------------------------------------------------------------
def test_ppermute_branch_lowers_and_matches_gather_rig():
    from jax.sharding import PartitionSpec as P

    part = Partitioner(dim=2, n=8, p=2, n_shards=4, use_ppermute=True)
    rig = Partitioner(dim=2, n=8, p=2, n_shards=4, use_ppermute=False)
    mesh = part.device_mesh()

    def make(p_):
        return jax.jit(jax.shard_map(
            lambda y: p_.compress_add(y[0])[None],
            mesh=mesh, in_specs=P(p_.axis_name),
            out_specs=P(p_.axis_name)))

    # 1. AOT lowering contains the collective (the ICI primitive on a
    #    real TPU mesh) — proves the branch lowers without N real chips
    arg = jax.ShapeDtypeStruct((4, part.local_npts_z, part.npts),
                               jnp.float64)
    txt = make(part).lower(arg).as_text()
    assert "collective_permute" in txt, "ppermute did not lower"

    # 2. execution parity with the all_gather+select rig
    rng = np.random.default_rng(11)
    x = rng.standard_normal((4, part.local_npts_z, part.npts))
    y_pp = np.asarray(make(part)(jnp.asarray(x)))
    y_ag = np.asarray(make(rig)(jnp.asarray(x)))
    assert np.array_equal(y_pp, y_ag)


def test_ppermute_is_default_exchange():
    """The distributed stack must exercise the ICI branch by default."""
    part = Partitioner(dim=2, n=8, p=1, n_shards=2)
    assert part.use_ppermute is None  # auto -> ppermute on every platform
