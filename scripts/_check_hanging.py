import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from tpufem.fem.assemble import assemble_laplace, assemble_rhs, integrate_difference
from tpufem.fem.constraints import make_hanging_node_constraints
from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh
from tpufem.operators.laplace import LaplaceOperator
from tpufem.ops.matrix_free import MatrixFree
from tpufem.utils.config import FemConfig

rng = np.random.default_rng(7)


def adaptive_mesh(dim, base, steps):
    mesh = Mesh.hyper_cube(dim, base)
    for _ in range(steps):
        centers = (mesh.origins + mesh.sizes[:, None] * 0.5) / mesh.U
        mesh = mesh.refine(np.linalg.norm(centers - 0.31, axis=1) < 0.35)
    return mesh


# 1) constrained-operator parity vs host oracle algebra
for dim, p in [(2, 1), (2, 2), (2, 3), (3, 1), (3, 2)]:
    mesh = adaptive_mesh(dim, 2, 2 if dim == 2 else 1)
    dofs = DoFHandler(mesh, p)
    ac = make_hanging_node_constraints(dofs)
    ncon = len(ac.lines)
    assert ncon > 0, "expected hanging nodes"
    mf = MatrixFree.build(mesh, dofs, FemConfig(dim, p), constraints=ac)
    op = LaplaceOperator(mf)
    K = assemble_laplace(dofs)
    m = np.asarray(mf.interior_mask)
    x = rng.standard_normal(dofs.n_dofs)
    # host oracle of the same mask/C algebra
    xa = ac.distribute(m * x)
    y = np.asarray(K @ xa)
    y = ac.distribute_transpose(y)
    y_o = m * y + (1 - m) * x
    y_mf = np.asarray(op.vmult(jnp.asarray(x)))
    rel = np.linalg.norm(y_mf - y_o) / np.linalg.norm(y_o)
    print(f"dim={dim} p={p}: ncon={ncon} constrained vmult rel={rel:.2e}",
          flush=True)
    assert rel < 1e-12
    # diagonal parity vs condensed matrix
    Kc = ac.condense_matrix(K)
    dg = np.asarray(op.diagonal())
    mask = m.astype(bool)
    reld = np.linalg.norm(dg[mask] - Kc.diagonal()[mask]) / np.linalg.norm(
        Kc.diagonal()[mask]
    )
    assert reld < 1e-12, reld

# 2) full adaptive Poisson solve vs direct condensed solve + continuity
from tpufem.apps.poisson import solve_poisson

for dim, p in [(2, 2), (3, 2)]:
    r = solve_poisson(dim=dim, degree=p, refine=2, adaptive_steps=2 if dim == 2 else 1)
    print(f"adaptive solve dim={dim} p={p}: dofs={r.n_dofs} iters={r.iterations} "
          f"L2={r.l2_error:.3e}", flush=True)
    assert r.residual < 1e-8
    # (the direct-solve oracle comparison lives in tests/test_hanging.py)

# 3) convergence under adaptive refinement (error must drop, rate sane)
errs = [solve_poisson(dim=2, degree=2, refine=rr, adaptive_steps=1).l2_error
        for rr in (2, 3, 4)]
rates = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
print("adaptive conv errs:", [f"{e:.2e}" for e in errs],
      "rates:", [f"{x:.2f}" for x in rates], flush=True)
assert rates[-1] > 2.5
print("hanging nodes OK")
